package graft

import org.apache.spark.sql.types.DoubleType

/** IEEE −0.0 hardening sweep (round-7 verdict item 7). The driver's
  * correctness gate hashes CANONICAL values, where −0.0 != +0.0 — a
  * divergence invisible to numeric comparison (−0.0 == 0.0) and thus
  * to any tolerance-based local check. q_embed_norm_audit hash-failed
  * round 7 exactly this way: DuckDB propagated −0.0 through
  * GREATEST→SQRT→ROUND while Spark emitted +0.0.
  *
  * The oracle side is guarded by `tools/check.py`, which is now
  * signbit-strict across the whole suite at both SFs. This spec guards
  * the ENGINE side: every query in the rounds-a-possibly-tiny-negative
  * class (z-scores, variances, correlations, PMI, changepoints,
  * bootstrap CIs) must emit no double with the sign bit set and
  * magnitude zero. Spark's `round` goes through BigDecimal (−0E-6
  * → −0.0), so this is a real engine-side risk, not just DuckDB's.
  */
class NegZeroSpec extends SparkSpec {

  private val varianceFamily = Seq(
    "q_zscore", "q_mad_outliers", "q_hourly_corr", "q_corr_matrix",
    "q_abtest", "q_welch_ttest", "q_bootstrap_ci", "q_ml_scaled_stats",
    "q_global_stats", "q_collocations", "q_changepoint", "q_silhouette",
    "q_pca_power", "q_embed_norm_audit", "q_agg_group_stats")

  test("variance-family queries emit no -0.0 in any double column") {
    varianceFamily.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf0001)
      val doubleCols = df.schema.fields.collect {
        case f if f.dataType == DoubleType => f.name
      }
      if (doubleCols.nonEmpty) {
        val negZeros = df.collect().flatMap { r =>
          doubleCols.filter { c =>
            !r.isNullAt(r.fieldIndex(c)) && {
              val bits = java.lang.Double.doubleToRawLongBits(
                r.getAs[Double](c))
              bits == java.lang.Double.doubleToRawLongBits(-0.0)
            }
          }.map(c => s"$name.$c")
        }
        assert(negZeros.isEmpty,
          s"-0.0 leaked from: ${negZeros.distinct.mkString(", ")}")
      }
    }
  }
}
