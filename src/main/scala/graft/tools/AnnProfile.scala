package graft.tools

import graft.Tables
import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Phase-level attribution for `q_ann_recall` (r15 verdict: 4.17 s
  * driver median vs 1.47 s committed quiet — slowest query in the
  * driver's suite, untouched by r15 code). Replays the query's exact
  * shape with wall timers around each candidate stage, repeated so
  * warm-in separates from the steady state, and prints one line per
  * phase. The suspects, in the verdict's order: the brute-force
  * ground-truth recompute (a corpus×20 crossJoin re-scored per
  * invocation), the ADC re-rank joins, and the final checkpoint.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.AnnProfile"
  */
object AnnProfile {
  private def t[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    Console.out.println(
      f"[ann-profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("ann-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // stage the index artifacts once, off the clock — Bench's warmup
    // does the same, so per-iteration cost excludes these builds
    t("stage: lsh")(graft.warehouse.VectorStage.lsh(spark, sfDir).count())
    t("stage: ivf")(graft.warehouse.VectorStage.ivf(spark, sfDir).count())
    t("stage: pq")(graft.warehouse.VectorStage.pqCodes(spark, sfDir).count())
    t("stage: truth")(graft.warehouse.VectorStage.annTruth(spark, sfDir).count())

    // the SHARED audit geometry — if it changes, this tool must keep
    // profiling the same query shape q_ann_recall runs
    val NQ = graft.queries.Vectors.AuditNQ
    val TopK = graft.queries.Vectors.AuditTopK
    (1 to 4).foreach { iter =>
      Console.out.println(s"--- iteration $iter ---")
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.embeddings(spark, sfDir)
      val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("nid"))
      def topk(cand: DataFrame) =
        cand.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= TopK).select("qid", "nid")
      def score(pairs: DataFrame) = pairs
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("nid"),
          round(VF.cosineSpark("embedding", "q_emb"), 6).as("cos"))
      val truth = t("truth: staged read") {
        val df = broadcast(graft.warehouse.VectorStage.annTruth(spark, sfDir))
        df.count(); df
      }
      val bucketed = graft.warehouse.VectorStage.lsh(spark, sfDir)
        .select(col("vec_id"), col("embedding"), col("bucket"))
      val lshCand = t("lsh: candidates+cache") {
        val df = score(bucketed.join(broadcast(
          bucketed.filter(col("vec_id") < NQ)
            .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
              col("bucket"))), Seq("bucket"))).cache()
        df.count(); df
      }
      val assigned = graft.warehouse.VectorStage.ivf(spark, sfDir)
      val ivfCand = t("ivf: candidates+cache") {
        val df = score(assigned.join(broadcast(
          assigned.filter(col("vec_id") < NQ)
            .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
              col("cell"))), Seq("cell"))).cache()
        df.count(); df
      }
      val cbDf = graft.warehouse.VectorStage.pqCodebook(spark, sfDir)
      val codes = graft.warehouse.VectorStage.pqCodes(spark, sfDir)
        .select(col("vec_id").as("nid"), col("m"), col("code"))
      val qsv = graft.queries.Vectors.pqSubvectors(
        emb.filter(col("vec_id") < NQ))
        .select(col("vec_id").as("qid"), col("m"), col("svec"))
      val adc = t("adc: join+agg+cache") {
        val df = ivfCand.select("qid", "nid")
          .join(qsv, Seq("qid"))
          .join(codes, Seq("nid", "m"))
          .join(broadcast(cbDf), Seq("m", "code"))
          .groupBy("qid", "nid")
          .agg(sum(round(VF.d2Spark(col("svec"), col("cvec")), 9)
            .cast(DecimalType(28, 12))).cast("double").as("approx"))
          .cache()
        df.count(); df
      }
      val wPq = Window.partitionBy("qid").orderBy(asc("approx"), asc("nid"))
      val pqRetrieved = adc.withColumn("rn", row_number().over(wPq))
        .filter(col("rn") <= TopK).select("qid", "nid")
      def audit(method: String, cand: DataFrame, retrieved: DataFrame) =
        cand.agg(count(lit(1)).as("n_cand"))
          .crossJoin(broadcast(retrieved.join(truth, Seq("qid", "nid"))
            .agg(count(lit(1)).as("n_hit"))))
          .select(lit(method).as("method"), lit(NQ).as("n_queries"),
            round(col("n_hit").cast("double") / (NQ * TopK), 6)
              .as("recall_at_10"),
            round(col("n_cand").cast("double") / NQ, 2).as("avg_candidates"))
      val out = audit("ivf", ivfCand, topk(ivfCand))
        .unionByName(audit("ivfpq", adc, pqRetrieved))
        .unionByName(audit("lsh", lshCand, topk(lshCand)))
      t("audit: checkpointRelease")(graft.util.Staged.checkpointRelease(
        "ann-profile", out, lshCand, ivfCand, adc).count())
    }
    spark.stop()
  }
}
