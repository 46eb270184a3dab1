package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the round-11 additions (the oracle gate
  * proves engine-equality; these prove the STATISTICS mean what they
  * claim).
  */
class Round11Spec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf0001)

  test("q_drift_psi: a uniform random split of one distribution reads stable") {
    val rows = run("q_drift_psi").collect()
    // three audited features, one row each
    assert(rows.map(_.getAs[String]("feature")).sorted.toSeq ===
      Seq("event_type", "hour", "value"))
    rows.foreach { r =>
      // both halves are the same distribution by construction: PSI must
      // sit far below the 0.1 monitoring band
      assert(r.getAs[String]("verdict") === "stable",
        s"${r.getAs[String]("feature")} drifted on a uniform split: $r")
      // PSI sampling noise ~ k/n: at the sf0.001 fixture (hundreds of
      // rows per half) it can reach a few hundredths — the stable band
      // (< 0.1) is the meaningful bound
      assert(r.getAs[Double]("psi") >= 0.0 && r.getAs[Double]("psi") < 0.1)
      assert(r.getAs[Long]("n_ref") > 0 && r.getAs[Long]("n_cur") > 0)
    }
    // every feature audits the same event rows — totals agree
    assert(rows.map(r => r.getAs[Long]("n_ref") + r.getAs[Long]("n_cur"))
      .distinct.length === 1)
    // bin budgets: value caps at 20, hour at 24
    val byFeat = rows.map(r =>
      r.getAs[String]("feature") -> r.getAs[Long]("n_bins")).toMap
    assert(byFeat("value") <= 20 && byFeat("hour") <= 24)
  }

  test("q_drift_psi detects an injected shift (positive control)") {
    // same machinery, hand-driven: ref ~ U(0,1)-ish bins, cur shifted —
    // the PSI formula itself must fire on a real distribution change
    import org.apache.spark.sql.types.DecimalType
    val k = 10
    def psi(cRef: Seq[Long], cCur: Seq[Long]): Double = {
      val nR = cRef.sum.toDouble; val nC = cCur.sum.toDouble
      cRef.zip(cCur).map { case (r, c) =>
        val pr = (r + 0.5) / (nR + 0.5 * k)
        val pc = (c + 0.5) / (nC + 0.5 * k)
        (pc - pr) * math.log(pc / pr)
      }.sum
    }
    val uniform = Seq.fill(k)(100L)
    val shifted = (0 until k).map(i => if (i < k / 2) 20L else 180L)
    assert(psi(uniform, uniform) === 0.0)
    assert(psi(uniform, shifted) > 0.25, "shifted halves must read major")
  }

  test("q_seasonal_decompose: slots partition the hourly grid; strength in range") {
    val rows = run("q_seasonal_decompose").collect()
    val hows = rows.map(_.getAs[Int]("how"))
    assert(hows.distinct.length === hows.length)
    assert(hows.forall(h => h >= 0 && h < 168))
    // slot hour-counts sum to the number of distinct hours in the data
    val nHourly = Tables.events(spark, sf0001)
      .filter(col("ts").isNotNull)
      .select(date_trunc("hour", col("ts"))).distinct().count()
    assert(rows.map(_.getAs[Long]("n_hours")).sum === nHourly)
    // variance-explained statistic: bounded above by 1; one value globally
    val strengths = rows.map(_.getAs[Double]("seasonal_strength")).distinct
    assert(strengths.length === 1)
    assert(strengths.head <= 1.0 && strengths.head >= -1.0)
    rows.foreach(r => assert(r.getAs[Double]("seasonal_mean") > 0.0))
  }
}
