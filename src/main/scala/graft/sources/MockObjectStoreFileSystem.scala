package graft.sources

import java.net.URI
import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** A registered non-`file:` Hadoop FileSystem scheme backed by local
  * disk — the in-sandbox proof of the S4 object-store claim (ref
  * upload_to_s3.py:10-86, etl.py:25-50 put/get bronze objects).
  *
  * Spark never touches storage directly: every source/sink resolves
  * its path's scheme through `FileSystem.get`, so "runs against S3" is
  * exactly "the scheme's FileSystem implementation is on the
  * classpath and registered" (`fs.s3a.impl` → S3AFileSystem in
  * production; `fs.mocks3.impl` → this class here). Registering a
  * second scheme and driving the SAME `spark.read/write.parquet`
  * calls through `mocks3://bucket/...` URIs exercises that whole
  * resolution path — URI → FileSystem impl → object read/write —
  * with only the final byte transport swapped, which is the part this
  * sandbox cannot host (no object store, no egress).
  *
  * Bucket semantics: the URI authority is the bucket name; like S3A,
  * the bucket is namespace, not directory — it maps to a local root
  * (`/tmp/mocks3/<bucket>`) and keys become paths under it.
  */
class MockObjectStoreFileSystem extends RawLocalFileSystem {

  private var uri: URI = URI.create(s"${MockObjectStoreFileSystem.Scheme}:///")

  override def getScheme: String = MockObjectStoreFileSystem.Scheme

  override def getUri: URI = uri

  override def initialize(name: URI, conf: org.apache.hadoop.conf.Configuration): Unit = {
    // preserve the authority (bucket): FileSystem.get caches per
    // (scheme, authority), and paths must round-trip with their bucket
    val bucket = Option(name.getAuthority).getOrElse("")
    uri = URI.create(s"${MockObjectStoreFileSystem.Scheme}://$bucket")
    // the bucket exists a priori (S3 buckets are provisioned, not
    // mkdir'd by writers) — materialize its local root so single-level
    // java.io.File.mkdir calls against top-level keys succeed
    if (bucket.nonEmpty)
      new java.io.File(MockObjectStoreFileSystem.root, bucket).mkdirs()
    super.initialize(name, conf)
  }

  /** bucket/key → local file: /tmp/mocks3/<bucket>/<key>. */
  override def pathToFile(path: Path): java.io.File = {
    val q = makeQualified(path)
    val bucket = Option(q.toUri.getAuthority).getOrElse("default")
    new java.io.File(
      MockObjectStoreFileSystem.root, bucket + q.toUri.getPath)
  }

  /** The inverse of [[pathToFile]]: RawLocalFileSystem builds returned
    * FileStatus paths from the LOCAL java.io.File path (qualified with
    * this scheme), i.e. `mocks3://bucket/tmp/mocks3/bucket/key` — the
    * local root leaks into the external namespace and the next
    * pathToFile double-maps it. Strip the root+bucket prefix so every
    * status leaves with its external object URI. Idempotent: an
    * already-external path passes through unchanged.
    */
  private def toExternal(p: Path): Path = {
    val bucket = Option(p.toUri.getAuthority)
      .orElse(Option(uri.getAuthority)).getOrElse("default")
    val local = p.toUri.getPath
    val prefix = s"${MockObjectStoreFileSystem.root}/$bucket"
    val key =
      if (local.startsWith(prefix)) local.substring(prefix.length) else local
    new Path(s"${MockObjectStoreFileSystem.Scheme}://$bucket" +
      (if (key.isEmpty) "/" else key))
  }

  private def fix(st: org.apache.hadoop.fs.FileStatus): org.apache.hadoop.fs.FileStatus = {
    st.setPath(toExternal(st.getPath)); st
  }

  override def getFileStatus(f: Path): org.apache.hadoop.fs.FileStatus =
    fix(super.getFileStatus(f))

  override def listStatus(f: Path): Array[org.apache.hadoop.fs.FileStatus] =
    super.listStatus(f).map(fix)

  /** Null-safe: RawLocalFileSystem's CONSTRUCTOR calls
    * getInitialWorkingDirectory before this subclass's field
    * initializers have run, so `uri` can still be null here.
    */
  private def baseUri: String =
    Option(uri).map(_.toString)
      .getOrElse(s"${MockObjectStoreFileSystem.Scheme}://")

  override def getWorkingDirectory: Path = new Path(baseUri + "/")

  override def getInitialWorkingDirectory: Path = new Path(baseUri + "/")
}

object MockObjectStoreFileSystem {
  val Scheme = "mocks3"
  val root = "/tmp/mocks3"

  /** Register the scheme on a session (the `fs.s3a.impl` analog). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.hadoopConfiguration.set(
      s"fs.$Scheme.impl", classOf[MockObjectStoreFileSystem].getName)
}
