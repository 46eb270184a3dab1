package graft.tools

import graft.queries.Graph
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: print the physical plans of the GraphStage build's
  * derived stages and the graph consumers, to audit that the bucketed
  * layout is exploited (no redundant Exchange after a bucketed scan).
  */
object ExplainGraphStage {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.warehouse.GraphStage.und(spark, dir) // force the build
    val rawT = spark.table(
      spark.catalog.listTables().collect().map(_.name)
        .find(n => n.startsWith("g_copurchase_") && !n.contains("capped")).get)
    println("== capDegree window over bucketed co-purchase scan ==")
    Graph.capDegree(rawT, "ck", "sk", 128).explain("formatted")
    val eT = spark.table(
      spark.catalog.listTables().collect()
        .map(_.name).find(_.startsWith("g_copurchase_capped")).get)
    println("== pair self-join over bucketed capped scan ==")
    eT.alias("a")
      .join(eT.alias("b"),
        col("a.ck") === col("b.ck") && col("a.sk") < col("b.sk"))
      .groupBy(col("a.sk").as("u"), col("b.sk").as("v"))
      .agg(count(lit(1)).as("common"))
      .explain("formatted")
    spark.stop()
  }
}
