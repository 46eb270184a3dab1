package graft.util

/** One session-scoped temp root for every throwaway table a registered
  * query materializes (commit-path gates publish real version dirs:
  * `q_gold_incremental`, `q_cdf_keyed`, `q_stream_upsert`, …). A bench
  * run invokes those queries dozens of times; per-invocation
  * `createTempDirectory` calls straight into `/tmp` accumulated
  * forever (r15 verdict finding). Routing them under ONE root that a
  * shutdown hook deletes bounds the leak to the JVM's lifetime: a full
  * Verify+Bench run leaves nothing behind.
  *
  * Cleanup is ordered AFTER Spark's context-stop hook (priority 25 <
  * Spark's 50 in [[org.apache.spark.GraftShutdown]]'s hook manager,
  * higher runs first), so no in-flight task can race a disappearing
  * file; at that point the data is unreachable by construction.
  */
object TempRoot {
  private lazy val root: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft-run")
    org.apache.spark.GraftShutdown.afterSparkStops()(deleteRecursively(p))
    p
  }

  /** A fresh directory under the session root — same contract as
    * `Files.createTempDirectory(prefix)`, but reclaimed at JVM exit.
    */
  def fresh(prefix: String): String = freshDir(prefix).toString

  /** Path-typed variant (drop-in for `Files.createTempDirectory`). */
  def freshDir(prefix: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(root, prefix)

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    import java.util.Comparator
    try {
      if (Files.exists(p)) {
        val walk = Files.walk(p)
        try
          walk.sorted(Comparator.reverseOrder[Path]())
            .forEach(f => try Files.deleteIfExists(f) catch {
              case _: java.io.IOException => ()
            })
        finally walk.close()
      }
    } catch { case scala.util.control.NonFatal(_) => () }
  }
}
