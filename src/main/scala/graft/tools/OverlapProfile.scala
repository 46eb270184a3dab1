package graft.tools

import graft.Tables
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level attribution for `q_source_overlap` (r17 verdict: the
  * sole unresolved driver-bench outlier — 1.42–1.64 s quiet but
  * spread-flagged under load). Replays the query's exact shape
  * (queries/Text.scala `sourceOverlap`) with wall timers around each
  * candidate stage, under BOTH staging disciplines:
  *
  *   cache     — the pre-r18 shape: the distinct (source, shingle)
  *               relation is `.cache()`d and materializes LAZILY inside
  *               the one result action, so the per-source totals agg,
  *               the broadcast-exchange build thread, and the two scan
  *               legs of the self-join all race to populate (and then
  *               contend on block locks for) the same InMemoryRelation
  *               partitions mid-query.
  *   staged    — the r18 shape: the reduced relation is materialized
  *               EAGERLY (localCheckpoint) in its own job first; every
  *               consumer then reads settled executor-local blocks.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.OverlapProfile"
  */
object OverlapProfile {
  private def t[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    Console.out.println(
      f"[overlap-profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("overlap-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def distinctShingles() = Tables.documents(spark, sfDir)
      .select(col("source"), explode(TF.shingleHashes(col("text"), 3)).as("sh"))
      .distinct()

    def pairTopK(st: org.apache.spark.sql.DataFrame) = {
      val ns = st.groupBy("source").agg(count(lit(1)).as("n"))
      st.alias("a")
        .join(st.alias("b"),
          col("a.sh") === col("b.sh") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg(count(lit(1)).as("common"))
        .join(ns.select(col("source").as("src_a"), col("n").as("n_a")), "src_a")
        .join(ns.select(col("source").as("src_b"), col("n").as("n_b")), "src_b")
        .select(col("src_a"), col("src_b"), col("common"),
          col("n_a"), col("n_b"),
          round(col("common").cast("double") /
            (col("n_a") + col("n_b") - col("common")), 6).as("jaccard"))
        .orderBy(desc("jaccard"), asc("src_a"), asc("src_b"))
        .limit(20)
    }

    (1 to 6).foreach { iter =>
      Console.out.println(s"--- iteration $iter ---")
      // variant A: the pre-r18 lazy cache (everything in one action)
      val cached = distinctShingles().cache()
      t("cache: full query") {
        graft.util.Staged
          .checkpointRelease("overlap_profile_cache", pairTopK(cached), cached)
          .count()
      }
      // variant B: eager stage, then consume settled blocks
      val staged = t("staged: materialize") {
        distinctShingles().transform(graft.util.Staged.materialize)
      }
      t("staged: pair join + topk") {
        graft.util.Staged
          .checkpointRelease("overlap_profile_staged", pairTopK(staged))
          .count()
      }
      staged.unpersist()
      System.gc()
    }
    spark.stop()
  }
}
