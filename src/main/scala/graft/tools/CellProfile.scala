package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cell-skew diagnostic for the Lloyd-cell-blocked vector family
  * (q_semantic_dedup / q_semantic_decontaminate): prints the cell-size
  * distribution, the implied within-cell pair volume Σ C(cell, 2), and
  * the wall time of each phase (fit, assign, pair join) at a given SF
  * dir. The SemDeDup linearity claim is E[cell] ≤ TargetCell ⇒ pair
  * volume ≈ n·TargetCell; this tool measures how far the REAL cell
  * distribution (2 Lloyd rounds, lowest-id seeds) sits from that
  * expectation — the r18 sweep found exponent 2.4 at sf1, i.e. skew.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.CellProfile"
  */
object CellProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("cell-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      Console.out.println(
        f"[cell-profile] $label%-18s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val emb = graft.Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val k = graft.queries.Vectors.cellCount(n)
    Console.out.println(s"[cell-profile] n=$n k=$k expected_cell=${n / k}")
    // A/B the two assignment paths at THIS k (the fit is 2 assigns +
    // 1 exact-decimal update; if one path's assign dominates, the fit
    // exponent is that path's codegen/eval cost, not data volume)
    locally {
      val seed = emb.filter(col("vec_id") < k)
        .select(col("vec_id").cast("int").as("cluster"),
          transform(col("embedding"), x => x.cast("double")).as("cvec"))
        .collect().toSeq
        .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1)
      (1 to 2).foreach { i =>
        t(s"assign lit#$i") {
          val best = graft.functions.VectorFunctions.nearestLit(
            col("embedding"), seed.map { case (id, c) => (lit(id), c) })
          emb.select(best.getField("id").as("cluster")).count()
        }
        t(s"assign join#$i") {
          graft.queries.Vectors.withCellDistsJoin(emb, seed)
            .select(element_at(col("ds"), 1).getField("id").as("cluster"))
            .count()
        }
      }
      // decompose the fit: the update (decimal centroid recompute) on
      // top of a full assign, then the collect of k×64 decimals
      import org.apache.spark.sql.types.DecimalType
      val best = graft.functions.VectorFunctions.nearestLit(
        col("embedding"), seed.map { case (id, c) => (lit(id), c) })
      val assigned = emb.select(col("vec_id"), col("embedding"),
        best.getField("id").as("cluster"), best.getField("d2").as("d2"))
      val upd = assigned
        .select(col("cluster"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("cluster", "pos")
        .agg(round(sum(col("v").cast("double").cast(DecimalType(28, 20)))
          .cast("double") / count(lit(1)), 8).as("c"))
        .groupBy("cluster")
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("c")))),
          e => e.getField("c")).as("cvec"))
      (1 to 2).foreach { i => t(s"update-collect#$i")(upd.collect().length) }
    }
    val asg = t("fit+assign") {
      val a = graft.queries.Vectors
        .lloyd(emb, k = k, iters = 2).assigned
        .select(col("vec_id"), col("cluster")).cache()
      a.count(); a
    }
    val sizes = asg.groupBy("cluster").agg(count(lit(1)).as("m"))
      .select(col("m")).as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted.reverse
    val pairs = sizes.map(m => m * (m - 1) / 2).sum
    Console.out.println(
      s"[cell-profile] cells=${sizes.length} max=${sizes.head} " +
        s"p99=${sizes(math.max(0, sizes.length / 100 - 1))} " +
        s"top10=${sizes.take(10).mkString(",")}")
    Console.out.println(
      s"[cell-profile] pair_volume=$pairs linear_budget=${n * graft.queries.Vectors.TargetCell}")
    asg.unpersist()
    spark.stop()
  }
}
