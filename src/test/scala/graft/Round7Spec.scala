package graft

import org.apache.spark.sql.functions._

/** Invariant tests for the round-7 operator additions: skyline
  * dominance soundness+completeness, DP-noise algebra, power-iteration
  * normalization, LPA determinism, containment bounds, the A/A readout,
  * the streaming leaderboard's batch equivalence, and collocation
  * support floors. All run at sf0.001 against the registered queries —
  * the same closures the driver gate runs.
  */
class Round7Spec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf0001)

  test("q_skyline: returned set is exactly the undominated set (brute force)") {
    val parts = Tables.part(spark, sf0001)
      .select("p_brand", "p_partkey", "p_size", "p_retailprice")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    def dominated(x: (String, Long, Int, Double)) = parts.exists { o =>
      o._1 == x._1 && o._3 >= x._3 && o._4 <= x._4 &&
        (o._3 > x._3 || o._4 < x._4)
    }
    val expected = parts.filterNot(dominated).map(t => (t._1, t._2)).toSet
    val got = run("q_skyline").select("p_brand", "p_partkey")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === expected)
  }

  test("q_skyline: no nested-loop join in the plan") {
    val plan = run("q_skyline").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q_dp_counts: noise algebra exact, Laplace bound, deterministic replay") {
    val rows = run("q_dp_counts")
      .select("true_count", "noise", "noisy_count")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    // noisy = true + noise as ONE IEEE add — exact, not approximate
    assert(rows.forall { case (t, n, nn) => t + n == nn })
    // inverse-CDF bound: |noise| <= b * ln(2^33) for u = (k+1/2)/2^32
    assert(rows.forall { case (_, n, _) => math.abs(n) <= 33 * math.log(2) + 1e-9 })
    val again = run("q_dp_counts").select("noise").collect().map(_.getDouble(0))
    assert(again.sorted.sameElements(rows.map(_._2).sorted))
  }

  test("q_pca_power: unit-norm loadings, positive variance within total") {
    val rows = run("q_pca_power").collect()
    assert(rows.length == functions.VectorFunctions.Dim)
    val loads = rows.map(_.getAs[Double]("loading"))
    val norm = math.sqrt(loads.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-6, s"norm $norm")
    val lambda = rows.head.getAs[Double]("lambda")
    assert(rows.forall(_.getAs[Double]("lambda") == lambda))
    // lambda (variance along v) must sit inside (0, total variance]
    val tot = Tables.embeddings(spark, sf0001)
      .select(explode(col("embedding")).as("x"))
      .agg((sum(col("x") * col("x")) / count(lit(1)) -
        (sum(col("x")) / count(lit(1))) * (sum(col("x")) / count(lit(1))))
        .as("v")).collect()(0).getDouble(0) * functions.VectorFunctions.Dim
    assert(lambda > 0 && lambda <= tot + 1e-6, s"lambda $lambda total $tot")
  }

  test("q_label_propagation: bounded community mass, deterministic") {
    val out = run("q_label_propagation").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.nonEmpty && out.forall(_._2 >= 1))
    val nNodes = Tables.supplier(spark, sf0001).count()
    assert(out.map(_._2).sum <= nNodes,
      "community members exceed the supplier universe")
    val again = run("q_label_propagation").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(again.sameElements(out))
  }

  test("q_containment: containment in (0,1], jaccard never exceeds it") {
    val rows = run("q_containment")
      .select("containment", "jaccard").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    assert(rows.forall { case (c, j) => c > 0 && c <= 1.0 && j <= c + 1e-9 })
  }

  test("q_abtest: A/A split reads not-significant with full coverage") {
    val r = run("q_abtest").collect()(0)
    val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    val users = Tables.events(spark, sf0001)
      .select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    assert(na + nb == users, "arm sizes must partition the user universe")
    assert(r.getAs[Double]("rate_a") >= 0 && r.getAs[Double]("rate_a") <= 1)
    assert(r.getAs[Double]("rate_b") >= 0 && r.getAs[Double]("rate_b") <= 1)
    assert(r.getAs[Int]("significant") == 0,
      "hash-split arms with no treatment must not read significant")
  }

  test("q_stream_topk: streaming leaderboard equals the batch ranking") {
    import graft.util.Exact
    val batch = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_purchases"), Exact.dsum(col("value")).as("spend"))
      .orderBy(desc("spend"), asc("user_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val stream = run("q_stream_topk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (-t._3, t._1))
    assert(stream.sameElements(batch))
  }

  test("q_bootstrap_ci: interval brackets the point estimate, weights cover the corpus") {
    val r = run("q_bootstrap_ci").collect()(0)
    val (lo, hi) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
    val point = r.getAs[Double]("point_mean")
    assert(lo <= hi)
    // Poisson resamples concentrate around the sample mean — the ~94%
    // order-statistic interval must bracket the point estimate
    assert(lo <= point && point <= hi, s"[$lo, $hi] vs $point")
    assert(r.getAs[Long]("n_purchases") > 0)
  }

  test("q_welch_ttest: positive variances, df inside [min(n)-1, n_b+n_o-2]") {
    val r = run("q_welch_ttest").collect()(0)
    val (nb, no) = (r.getAs[Long]("n_b"), r.getAs[Long]("n_o"))
    val df = r.getAs[Double]("df")
    assert(r.getAs[Double]("v_b") > 0 && r.getAs[Double]("v_o") > 0)
    assert(df >= math.min(nb, no) - 1 && df <= nb + no - 2,
      s"Welch df $df outside its mathematical bounds for n=($nb, $no)")
  }

  test("q_path_mining: path mass equals the timeline triple count") {
    val rows = run("q_path_mining").collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Long]("n") >= 1))
    // every user with k >= 3 events contributes exactly k-2 triples;
    // the top-15 can't exceed that total
    val total = Tables.events(spark, sf0001)
      .groupBy("user_id").agg(count(lit(1)).as("k"))
      .filter(col("k") >= 3)
      .agg(sum(col("k") - 2)).collect()(0).getLong(0)
    assert(rows.map(_.getAs[Long]("n")).sum <= total)
  }

  test("q_recommend: never recommends an owned supplier, ranks dense per customer") {
    val recs = run("q_recommend").collect()
      .map(r => (r.getAs[Long]("customer"), r.getAs[Long]("supplier"),
        r.getAs[Int]("rank")))
    assert(recs.nonEmpty)
    val owned = Tables.orders(spark, sf0001).select("o_orderkey", "o_custkey")
      .join(Tables.lineitem(spark, sf0001).select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(recs.forall { case (c, sup, _) => !owned((c, sup)) },
      "a recommendation duplicated an owned supplier")
    recs.groupBy(_._1).foreach { case (c, rs) =>
      assert(rs.map(_._3).sorted.sameElements(1 to rs.length),
        s"customer $c ranks not dense: ${rs.map(_._3).toSeq}")
    }
  }

  test("q_attribution_credit: credit conserves the touched-purchase revenue") {
    val credited = run("q_attribution_credit").collect()
      .map(_.getAs[Double]("credited_revenue")).sum
    // every purchase with >= 1 in-band touch distributes exactly its
    // value (up to the 6-dp per-credit rounding)
    val e = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(cast(ts as timestamp)) div 1000000").as("sec"),
        col("value"))
    val pur = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("sec").as("p_sec"), col("value"))
    val tch = e.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("sec").as("t_sec"))
    val touched = pur.join(tch, Seq("user_id"))
      .filter(col("p_sec") - col("t_sec") > 0 &&
        col("p_sec") - col("t_sec") <= 1800)
      .select(col("user_id"), col("p_sec"), col("value")).distinct()
      .agg(sum(col("value"))).collect()(0).getDouble(0)
    assert(math.abs(credited - touched) < 0.05,
      s"credited $credited vs touched-purchase revenue $touched")
  }

  test("q_mm_phash: exactly the brute-force 3-of-4 signature-window pairs") {
    // sf0.01: the corpus has 13 prefix-twin pairs (sf0.001 has none —
    // a vacuously-empty check proves nothing)
    val sf001 = "/root/testdata/sf0.01"
    val got = SparkEntry.queries("q_mm_phash")(spark, sf001).collect()
      .map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
        r.getAs[Long]("n_match"))).toMap
    assert(got.nonEmpty, "sf0.01 fixture must produce signature pairs")
    val sigs = Tables.documents(spark, sf001)
      .filter(length(col("text")) >= 240)
      .select(col("doc_id"), substring(col("text"), 1, 240).as("w"))
      .collect().map(r => (r.getLong(0),
        (0 until 4).map(i => r.getString(1).substring(60 * i, 60 * i + 60))))
    val expected = (for {
      i <- sigs.indices; j <- i + 1 until sigs.length
      m = sigs(i)._2.zip(sigs(j)._2).count { case (a, b) => a == b }
      if m >= 3
    } yield {
      val (x, y) = (sigs(i)._1, sigs(j)._1)
      ((math.min(x, y), math.max(x, y)), m.toLong)
    }).toMap
    assert(got === expected)
  }

  test("q_dataset_card and q_skew_audit: fields agree with direct computation") {
    val card = run("q_dataset_card").collect()(0)
    val docs = Tables.documents(spark, sf0001)
    assert(card.getAs[Long]("n_docs") === docs.count())
    assert(card.getAs[Long]("n_langs") ===
      docs.select("lang").distinct().count())
    assert(card.getAs[Double]("dup_rate") >= 0 &&
      card.getAs[Double]("dup_rate") < 1)
    val audit = run("q_skew_audit").collect()
    val li = Tables.lineitem(spark, sf0001).count()
    assert(audit.length === 3 && audit.forall(_.getAs[Long]("n_rows") == li))
  }

  test("q_collocations: support floor and finite PMI") {
    val rows = run("q_collocations").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("cab") >= 5))
    assert(rows.forall(r => !r.getAs[Double]("pmi").isNaN &&
      !r.getAs[Double]("pmi").isInfinite))
  }
}
