package graft

import org.apache.spark.sql.SparkSession

/** Plan-shape sweep over every registered query: prints suspicious
  * physical operators (cartesian products, single-partition exchanges,
  * global-sort Exchanges) per query so plan regressions are visible at
  * a glance. Dev tool — the load-bearing assertions live in PlanSpec.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.collect()
        val p = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        val flags = Seq(
          "CartesianProduct" -> p.contains("CartesianProduct"),
          "SinglePartition" -> p.contains("Exchange SinglePartition"),
          "GlobalSort" -> p.contains("Exchange rangepartitioning"),
          "BNLJ" -> p.contains("BroadcastNestedLoopJoin"))
          .collect { case (k, true) => k }
        println(s"AUDIT $name: ${if (flags.isEmpty) "clean" else flags.mkString(",")}")
      } catch {
        case e: Throwable => println(s"AUDIT $name: ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
