package graft

import graft.validate.{ValidationRule, Validator}
import org.apache.spark.sql.functions._

class ValidationSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, 50.0, 0.9), (2L, -200.0, 0.5), (3L, 20000.0, 1.5), (4L, 10.0, 0.2))
    .toDF("id", "value", "quality")

  private val rules = Seq(
    ValidationRule("value_range", "error",
      col("value") < -100 || col("value") > 10000,
      "value < -100 OR value > 10000"),
    ValidationRule("quality_range", "critical",
      col("quality") < 0 || col("quality") > 1,
      "quality < 0 OR quality > 1"),
    ValidationRule("low_quality", "warning",
      col("quality") < 0.3, "quality < 0.3"))

  test("report counts violations per rule in a single pass") {
    val rpt = Validator.report(df, rules)
      .select("rule_name", "n_violations", "passed")
      .as[(String, Long, Int)].collect().map { case (n, v, _) => n -> v }.toMap
    assert(rpt === Map("value_range" -> 2L, "quality_range" -> 1L,
      "low_quality" -> 1L))
  }

  test("score is severity-weighted and inside [0,1]") {
    val s = Validator.score(df, rules).select("overall_score")
      .collect()(0).getDouble(0)
    assert(s >= 0.0 && s <= 1.0)
    // hand computation: rates 0.5, 0.25, 0.25; weights 1, 2, 0.5
    val expected = 1.0 - (1.0 * 0.5 + 2.0 * 0.25 + 0.5 * 0.25) / (1.0 + 2.0 + 0.5)
    assert(math.abs(s - expected) < 1e-6)
  }

  test("clean data scores 1.0") {
    val clean = Seq((1L, 10.0, 0.9)).toDF("id", "value", "quality")
    val s = Validator.score(clean, rules).select("overall_score")
      .collect()(0).getDouble(0)
    assert(s === 1.0)
  }

  test("EventRules catalog covers all 5 reference layers with >= 20 rules") {
    val names = graft.validate.EventRules.all.map(_.name)
    assert(names.size >= 20, names)
    assert(names.distinct.size === names.size, "duplicate rule names")
    // one representative per layer: schema, business, quality,
    // cross-field, statistical (+ dup-rate and freshness decay)
    for (r <- Seq("value_not_null", "value_range", "k_range",
      "purchase_value_floor", "value_z_outlier_3s", "dup_user_ts", "stale_24h"))
      assert(names.contains(r), s"missing $r")
    // severities must all carry defined weights
    assert(graft.validate.EventRules.all
      .forall(r => graft.validate.Severity.weights.contains(r.severity)))
  }
}
