package graft

/** Non-vacuity proof for q_embed_norm_audit's outlier gate (the
  * round-7 verdict's red row). Two labels on a perturbed fixture:
  *
  *  - label 0: norms differ only in the 7th decimal, so the per-label
  *    variance rounds to 0 at 9 dp and std_norm is 0. The old 3σ gate
  *    (|nm − μ| > 3·0) flagged EVERY row here — the degenerate-audit
  *    failure mode. The fixed gate (std_norm > 0) must report 0.
  *  - label 1: a real spread (28 norms at 1.0, 2 at 2.0;
  *    σ ≈ 0.2494, 3σ ≈ 0.748) where exactly the two norm-2 rows sit
  *    outside the band — the gate must report 0 < n_outliers < n.
  *
  * Also asserts no std_norm carries an IEEE −0.0 sign bit (the
  * DuckDB-side GREATEST→SQRT→ROUND sign leak that hash-failed the
  * driver gate is killed by ABS on both engines).
  */
class EmbedNormAuditSpec extends SparkSpec {

  test("q_embed_norm_audit: gate is non-vacuous and zero-variance labels report 0") {
    import spark.implicits._
    val dir = graft.util.TempRoot.freshDir("graft-embaudit").toString
    def vec(x: Double): Array[Float] = Array(x.toFloat, 0f, 0f, 0f)
    val rows =
      (0 until 10).map(i =>
        (i.toLong, vec(if (i % 2 == 0) 1.0 else 1.0000001), 0)) ++
      (10 until 40).map(i =>
        (i.toLong, vec(if (i < 12) 2.0 else 1.0), 1))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val out = SparkEntry.queries("q_embed_norm_audit")(spark, dir).collect()
    assert(out.length == 2)
    val byLabel = out.map(r => r.getAs[Int]("label") ->
      ((r.getAs[Long]("n"), r.getAs[Double]("std_norm"),
        r.getAs[Long]("n_outliers")))).toMap

    val (n0, sd0, o0) = byLabel(0)
    assert(n0 == 10 && sd0 == 0.0,
      s"label 0 must be the zero-variance case, got n=$n0 sd=$sd0")
    assert(o0 == 0, s"zero-variance label must report 0 outliers, got $o0")

    val (n1, sd1, o1) = byLabel(1)
    assert(sd1 > 0.0, s"label 1 must have real variance, got $sd1")
    assert(o1 > 0 && o1 < n1, s"gate must be non-vacuous: 0 < $o1 < $n1")
    assert(o1 == 2, s"exactly the two norm-2 rows are outliers, got $o1")

    // no −0.0 may survive on the engine side
    out.foreach { r =>
      val bits = java.lang.Double.doubleToRawLongBits(r.getAs[Double]("std_norm"))
      assert(bits >= 0L, s"std_norm carries a -0.0 sign bit: $r")
    }
  }
}
