package graft.warehouse

import org.apache.spark.sql.SparkSession

/** Shared machinery for session-scoped materialized warehouse artifacts
  * ([[GraphStage]], [[GoldStage]]): content-fingerprinted naming,
  * write-once memoization, target hygiene, and build timing.
  *
  * Artifact names embed a fingerprint of the SOURCE DATA (per-file
  * size + mtime of the snapshot's parquet files), not just the dir
  * path: if the testdata under a path is re-encoded while a session is
  * alive — a documented occurrence in this repo — the tag changes, the
  * memo misses, and consumers rebuild against the fresh snapshot
  * instead of silently reading a stale artifact.
  *
  * Single-writer assumption: `freshTarget`'s drop-then-write is not
  * safe against two JVMs staging into the same spark-warehouse
  * concurrently. That matches how the repo runs (sbt holds a project
  * lock; bench and tests never share a CWD concurrently) and how a
  * production warehouse would gate builds (one writer per snapshot,
  * e.g. via a job scheduler); readers of a COMPLETED artifact are safe.
  */
object Staging {

  /** (session → set of built tags); memoizes only SUCCESSFUL builds so
    * a thrown build is retried on the next accessor call instead of
    * poisoning the session. WeakHashMap so ended sessions don't pin.
    */
  private val built = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Set[String]]())

  /** Wall-clock seconds of the last artifact build, keyed
    * `family:dir` — bench instrumentation (the build runs once in the
    * warmup pass, so per-query medians don't show it; this keeps the
    * amortized cost visible instead of silently free). Bench embeds it
    * in BENCH_DETAIL.json.
    */
  val lastBuildSecs: scala.collection.concurrent.TrieMap[String, Double] =
    scala.collection.concurrent.TrieMap.empty

  /** 8-hex tag over the dir path plus each source file's (name, size,
    * mtime). Listing a handful of file statuses is metadata-only
    * driver work — no data scan.
    */
  def tag(s: SparkSession, d: String, tables: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(d.getBytes("UTF-8"))
    val conf = s.sparkContext.hadoopConfiguration
    tables.foreach { t =>
      val p = new org.apache.hadoop.fs.Path(s"$d/$t.parquet")
      val fs = p.getFileSystem(conf)
      val stamp =
        if (fs.exists(p)) {
          val st = fs.getFileStatus(p)
          s"$t:${st.getLen}:${st.getModificationTime}"
        } else s"$t:absent"
      md.update(stamp.getBytes("UTF-8"))
    }
    md.digest().take(4).map("%02x".format(_)).mkString
  }

  /** Run `build` once per (session, tag); later calls no-op. */
  def ensure(s: SparkSession, family: String, d: String, tagged: String)(
      build: => Unit): Unit = {
    val tags = built.computeIfAbsent(s,
      _ => scala.collection.mutable.Set.empty[String])
    tags.synchronized {
      if (!tags.contains(tagged)) {
        val t0 = System.nanoTime()
        try build
        finally lastBuildSecs.put(s"$family:$d",
          (System.nanoTime() - t0) / 1e9)
        tags += tagged
      }
    }
  }

  /** A fresh JVM starts with an empty in-memory catalog but inherits
    * whatever managed-table directories earlier JVMs left under
    * spark-warehouse — and `saveAsTable` refuses a location that exists
    * without a catalog entry (LOCATION_ALREADY_EXISTS). Drop any
    * catalog entry AND the on-disk location before writing.
    */
  def freshTarget(s: SparkSession, table: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS `$table`")
    val p = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), table)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }
}
