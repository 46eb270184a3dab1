package graft

import graft.sources.{MockObjectStoreFileSystem, Sources}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._
import java.net.URI

/** S4 (object get/put) exercised, not just documented: a registered
  * non-`file:` FileSystem scheme (`mocks3://bucket/key`) carries the
  * SAME `spark.read/write` calls the engine uses everywhere —
  * proving the sources/sinks are scheme-agnostic and "S3 support" is
  * the production `fs.s3a.impl` registration plus credentials, with
  * no engine change.
  */
class ObjectStoreSpec extends SparkSpec {

  test("parquet sink/scan round-trips through a registered object-store scheme") {
    MockObjectStoreFileSystem.register(spark)
    val url = "mocks3://bronze/landing/nation"

    // the path resolves to OUR FileSystem impl, not LocalFileSystem
    val fs = FileSystem.get(URI.create(url),
      spark.sparkContext.hadoopConfiguration)
    assert(fs.isInstanceOf[MockObjectStoreFileSystem],
      s"scheme resolution returned ${fs.getClass}")

    val nation = Tables.load(spark, sf0001, "nation")
    nation.write.mode("overwrite").parquet(url)
    val back = spark.read.parquet(url)
    assert(back.count() == nation.count())
    assert(back.schema == nation.schema)
    assert(back.exceptAll(nation).isEmpty && nation.exceptAll(back).isEmpty)

    // bucket is namespace, not directory: the object landed under the
    // bucket root, and a second bucket is a disjoint namespace reached
    // through its own FileSystem instance (per-(scheme, authority)
    // caching — same as S3A, where asking bucket A's client about
    // bucket B is a Wrong FS error)
    assert(fs.exists(new Path("mocks3://bronze/landing/nation")))
    intercept[IllegalArgumentException] {
      fs.exists(new Path("mocks3://silver/landing/nation"))
    }
    val silverFs = FileSystem.get(URI.create("mocks3://silver/"),
      spark.sparkContext.hadoopConfiguration)
    assert(!silverFs.exists(new Path("mocks3://silver/landing/nation")))
  }

  test("latest-object discovery works over the object-store scheme") {
    MockObjectStoreFileSystem.register(spark)
    val base = "mocks3://bronze/incoming"
    val fs = FileSystem.get(URI.create(base),
      spark.sparkContext.hadoopConfiguration)
    // two landed objects with distinct mtimes — discovery must pick the
    // newer, resolving through the registered scheme, not java.io.File
    val one = Tables.load(spark, sf0001, "region").limit(1)
    one.write.mode("overwrite").csv(s"$base/f1.csv")
    one.write.mode("overwrite").csv(s"$base/f2.csv")
    fs.setTimes(new Path(s"$base/f1.csv"), 1000L, -1L)
    fs.setTimes(new Path(s"$base/f2.csv"), 2000L, -1L)
    val latest = Sources.latestObject(spark, s"$base/f*.csv")
    assert(latest.exists(_.endsWith("f2.csv")), s"got $latest")
  }
}
