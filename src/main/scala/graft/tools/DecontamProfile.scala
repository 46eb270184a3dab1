package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase attribution for q_semantic_decontaminate (r18 verdict #2: its
  * quiet-min moved 1.21 → 2.55 s across rounds with UNCHANGED code —
  * ×2.10 against a ×1.19 host factor — and the "spread + host" claim
  * was unproven). The query is a chain of driver-interactive phases,
  * each a separate Spark job, so a whole-query number can't say which
  * one drifted; this tool times them separately, repeated `REPS`
  * times in-process, and prints per-phase min/median/max so warm-in
  * (first-iteration codegen/JIT) separates from steady-state cost:
  *
  *   count        — emb.count() sizing the cell quantizer
  *   seed         — Lloyd seed collect (k lowest vec_ids)
  *   fit_update   — 1 Lloyd update pass + k×dim decimal collect
  *   assign+split — withCellDists + eval/train band split (no action
  *                  of its own; folded into join)
  *   join+argmax  — the cell equi-join, exact cosines, per-train
  *                  argmax: the query's only shuffle, counted to force
  *                  execution
  *   full         — the whole SparkEntry query end-to-end (the bench's
  *                  view), for cross-checking the phase sum
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *          tools/run-main.sh graft.tools.DecontamProfile
  */
object DecontamProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("decontam-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val times = scala.collection.mutable.Map
      .empty[String, Vector[Double]].withDefaultValue(Vector.empty)
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      times(label) = times(label) :+ (System.nanoTime() - t0) / 1e9
      r
    }

    val emb = graft.Tables.embeddings(spark, sfDir)
    (1 to reps).foreach { rep =>
      // phase decomposition mirroring Vectors.semanticDecontaminate
      val n = t("count")(emb.count())
      val k = graft.queries.Vectors.cellCount(n)
      val fit = t("fit(seed+update)")(
        graft.queries.Vectors.lloyd(emb, k = k, iters = 2))
      val bkt = expr(
        "cast(conv(substring(md5(concat(cast(vec_id as string), '#split')), 1, 8), 16, 10) as bigint) % 100")
      val e = graft.queries.Vectors
        .withCellDists(emb.withColumn("bkt", bkt), fit.cents)
      val ev = e.filter(col("bkt") >= 90)
        .select(col("vec_id").as("eval_id"), col("embedding").as("ev_emb"),
          element_at(col("ds"), 1).getField("id").as("cell"))
      val tr = e.filter(col("bkt") < 90)
        .select(col("vec_id"), col("embedding"),
          explode(array(element_at(col("ds"), 1).getField("id"),
            element_at(col("ds"), 2).getField("id"))).as("cell"))
      val best = max(struct(col("cos"),
        (col("partner") * -1).as("neg_id")))
      t("join+argmax") {
        tr.join(ev, Seq("cell"), "left")
          .select(col("vec_id"),
            coalesce(round(graft.functions.VectorFunctions
              .cosineSpark("embedding", "ev_emb"), 6), lit(-1.0)).as("cos"),
            coalesce(col("eval_id"), lit(-1L)).as("partner"))
          .groupBy("vec_id")
          .agg(best.as("b"))
          .select(col("vec_id"), col("b.cos").as("max_cos"))
          .count()
      }
      // the bench's whole-query view through the registered entry
      t("full_query") {
        graft.SparkEntry.queries("q_semantic_decontaminate")(spark, sfDir)
          .count()
      }
      System.gc()
      Console.out.println(s"[decontam-profile] rep $rep done")
    }
    Console.out.println(f"[decontam-profile] sf=$sfDir reps=$reps cpus=$cpus")
    times.toSeq.sortBy(_._1).foreach { case (label, ts) =>
      val s = ts.sorted
      Console.out.println(
        f"[decontam-profile] $label%-16s min=${s.head}%.3f " +
          f"med=${s(s.size / 2)}%.3f max=${s.last}%.3f " +
          s"all=${s.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
