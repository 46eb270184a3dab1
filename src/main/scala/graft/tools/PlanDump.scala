package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: run named queries from the registry and print each one's
  * EXECUTED physical plan (post-AQE) plus wall time — the generic
  * `.explain` audit loop the per-operator tuning passes use.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <query> [query ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <sfDir> <query> [query ...]")
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val t0 = System.nanoTime()
      df.collect() // materialize so AQE finalizes and codegen stages appear
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"== $name%s ($secs%.2f s, $dir%s) ==")
      println(df.queryExecution.executedPlan.toString)
      // checkpointRelease-based operators hand back a bare RDD scan;
      // their REAL pre-checkpoint plan is in the Staged recorder
      val staged = graft.util.Staged.plan(name)
      if (staged.nonEmpty) {
        println(s"== $name (pre-checkpoint plan from Staged) ==")
        println(staged)
      }
    }
    spark.stop()
  }
}
