package graft.tools

import graft.Tables
import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Phase-level attribution for `q_auc` (r16 verdict: the sole
  * unresolved quiet-bench outlier — median 1.31 s, min 0.93, a 1.4×
  * spread the adjudicator couldn't attribute; reproduced SOLO on a
  * quiet box this round, so it is intrinsic to the query, not suite
  * residue). Replays the query's exact shape (queries/Ml.scala `auc`)
  * with wall timers around each candidate stage: the ×64-dim centroid
  * explode/agg, the broadcast ×10-label scoring fan-out, the per-label
  * rank window (the query's one sort), and the KS cumulative windows.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.AucProfile"
  */
object AucProfile {
  private def t[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    Console.out.println(
      f"[auc-profile] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("auc-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    (1 to 6).foreach { iter =>
      Console.out.println(s"--- iteration $iter ---")
      val e = Tables.embeddings(spark, sfDir)
      val cents = e
        .select(col("label").as("clabel"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("clabel", "pos")
        .agg(round(sum(col("v").cast("double").cast(DecimalType(28, 20)))
          .cast("double") / count(lit(1)), 8).as("c"))
        .groupBy("clabel")
        .agg(expr("transform(array_sort(collect_list(struct(pos, c))), x -> x.c)")
          .as("cv"))
      t("centroids")(cents.count())
      val scored = e.crossJoin(broadcast(cents))
        .select(col("clabel"), col("vec_id"),
          (col("label") === col("clabel")).cast("long").as("p"),
          round(VF.cosineSpark("embedding", "cv"), 6).as("sc"))
      t("score fan-out")(scored.count())
      val ranked = scored
        .withColumn("rmin",
          rank().over(Window.partitionBy("clabel").orderBy("sc")).cast("long"))
        .withColumn("cnt",
          count(lit(1)).over(Window.partitionBy("clabel", "sc")))
      val aucDf = ranked.groupBy("clabel")
        .agg(sum(col("p")).as("n_pos"),
          (count(lit(1)) - sum(col("p"))).as("n_neg"),
          sum(when(col("p") === 1, lit(2) * col("rmin") + col("cnt") - 1)
            .otherwise(0)).as("s2"))
        .select(col("clabel"), col("n_pos"), col("n_neg"),
          round((col("s2") - col("n_pos") * (col("n_pos") + 1)).cast("double") /
            (lit(2) * col("n_pos") * col("n_neg")).cast("double"), 6).as("auc"))
      t("rank window + agg")(aucDf.count())
      val bounds = scored.groupBy("clabel", "sc")
        .agg(sum(col("p")).as("bp"), (count(lit(1)) - sum(col("p"))).as("bn"))
      val wCum = Window.partitionBy("clabel").orderBy(desc("sc"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ks = bounds
        .withColumn("cp", sum(col("bp")).over(wCum))
        .withColumn("cn", sum(col("bn")).over(wCum))
        .join(broadcast(aucDf.select(col("clabel"), col("n_pos"), col("n_neg"))),
          Seq("clabel"))
        .groupBy("clabel")
        .agg(round(max(abs(col("cp").cast("double") / col("n_pos").cast("double")
          - col("cn").cast("double") / col("n_neg").cast("double"))), 6).as("ks"))
      t("ks windows")(ks.count())
      t("FULL q_auc")(graft.SparkEntry.queries("q_auc")(spark, sfDir).count())
      System.gc()
    }
    spark.stop()
  }
}
