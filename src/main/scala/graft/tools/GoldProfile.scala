package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level attribution for `q_gold_incremental` (and the pca tail):
  * runs the query's exact shape once warmed, with wall timers around
  * each phase of every `GoldStage.refreshHourly` fold, and prints one
  * line per phase. Pair with SPARK_GRAFT_PUBLISH_TIMING=1 to split the
  * publish into write / footer-harvest / manifest-commit.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.GoldProfile"
  */
object GoldProfile {
  private def t[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    Console.out.println(f"[gold-profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("gold-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def runOnce(tag: String): Unit = {
      val ev = Tables.events(spark, sfDir)
      val path = graft.util.TempRoot.fresh(s"gold-prof-$tag") + "/hourly"
      (0 until 3).foreach { r =>
        t(s"$tag refresh[$r]") {
          graft.warehouse.GoldStage.refreshHourly(
            ev.filter(pmod(col("event_id"), lit(3)) === r), path)
        }
      }
      t(s"$tag final read+collect") {
        graft.warehouse.GoldStage.readHourly(spark, path).get.select(
          col("user_id"), col("event_type"), col("h"), col("n"),
          col("v_sum").cast("double").as("v_sum"), col("v_cnt"),
          col("q_sum").cast("double").as("q_sum"), col("q_cnt"))
          .collect()
        ()
      }
    }
    runOnce("warmup")
    (1 to 2).foreach(i => t(s"TOTAL iter$i")(runOnce(s"iter$i")))
    spark.stop()
  }
}
