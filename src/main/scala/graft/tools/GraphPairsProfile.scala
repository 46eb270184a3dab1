package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B profile of the graph build's `sim_pairs` stage shapes (r18
  * verdict #3: the steepest build stage in the fleet — 15.1 s of the
  * 26.7 s sf1 build; DuckDB does the same aggregation in 2.8 s on one
  * node, so the volume is NOT the bound, Spark's per-row join/agg
  * machinery is). Variants, all producing identical (u, v, common):
  *
  *   join    — the shipped shape: bucketed self-join on ck, then
  *             groupBy(u, v) (two-long key) with map-side combine
  *   packed  — same join, but the 125M-row partial agg keys on ONE
  *             packed long (u << 32 | v), unpacked after the agg
  *   arraygen— no join at all: collect_set(sk) per ck (bucketed, no
  *             exchange), generate the C(d,2) pair structs per row
  *             with nested transform/flatten, explode, aggregate
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> tools/run-main.sh
  *          graft.tools.GraphPairsProfile
  */
object GraphPairsProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/repo/target/scaledata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graph-pairs-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // capped edges, same construction as GraphStage.cap_degree, cached
    // so every variant reads identical in-memory input (isolates the
    // pair-generation cost from the scan)
    val raw = graft.Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
      .join(graft.Tables.lineitem(spark, sfDir).select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
      .dropDuplicates("ck", "sk")
    val eT = graft.queries.Graph.capDegree(raw, "ck", "sk", 128)
      .repartition(16, col("ck")).cache()
    Console.out.println(s"[pairs-profile] edges=${eT.count()}")

    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = df.count()
        Console.out.println(
          f"[pairs-profile] $label#$i ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      }
      System.gc()
    }

    time("join") {
      eT.alias("a")
        .join(eT.alias("b"),
          col("a.ck") === col("b.ck") && col("a.sk") < col("b.sk"))
        .groupBy(col("a.sk").as("u"), col("b.sk").as("v"))
        .agg(count(lit(1)).as("common"))
    }
    time("packed") {
      eT.alias("a")
        .join(eT.alias("b"),
          col("a.ck") === col("b.ck") && col("a.sk") < col("b.sk"))
        .select((shiftleft(col("a.sk"), 32).bitwiseOR(col("b.sk"))).as("uv"))
        .groupBy("uv").agg(count(lit(1)).as("common"))
        .select(shiftright(col("uv"), 32).as("u"),
          col("uv").bitwiseAND(lit(0xffffffffL)).as("v"), col("common"))
    }
    time("arraygen") {
      eT.groupBy("ck").agg(sort_array(collect_set(col("sk"))).as("sks"))
        .select(explode(expr(
          "flatten(transform(sks, (x, i) -> " +
            "transform(slice(sks, i + 2, size(sks) - i - 1), " +
            "y -> struct(x AS u, y AS v))))")).as("p"))
        .groupBy(col("p.u").as("u"), col("p.v").as("v"))
        .agg(count(lit(1)).as("common"))
    }
    eT.unpersist()
    spark.stop()
  }
}
