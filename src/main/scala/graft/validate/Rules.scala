package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-validation rule engine (ref: data_validator.py:121-511 — 5
  * layers, 28 rule kinds; F4/F5 in SURVEY §2.10).
  *
  * A rule is a named Column predicate that flags a VIOLATING row. All
  * rules evaluate in ONE aggregation pass (`sum(when(pred,1))` per
  * rule) — a single scan regardless of rule count; at 100 TB this is
  * the only viable shape (the reference runs 5 sequential pandas
  * passes).
  *
  * Severity weights for the overall score follow the reference
  * (data_validator.py:513-536): info 0.1, warning 0.5, error 1.0,
  * critical 2.0; score = 1 - weighted mean violation rate.
  */
final case class ValidationRule(
    name: String,
    severity: String,
    predicate: Column,
    /** DuckDB-dialect predicate for the oracle (same semantics). */
    sqlPredicate: String)

object Severity {
  val weights: Map[String, Double] =
    Map("info" -> 0.1, "warning" -> 0.5, "error" -> 1.0, "critical" -> 2.0)
}

object Validator {

  /** Per-rule violation counts + rates in one pass, exploded back to
    * one row per rule (rule_name, severity, n_violations, violation_rate,
    * passed).
    */
  def report(df: DataFrame, rules: Seq[ValidationRule]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      rules.zipWithIndex.map { case (r, i) =>
        sum(when(r.predicate, 1).otherwise(0)).as(s"v_$i")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val ruleRows = rules.zipWithIndex.map { case (r, i) =>
      struct(
        lit(r.name).as("rule_name"),
        lit(r.severity).as("severity"),
        col(s"v_$i").cast("long").as("n_violations"),
        round(col(s"v_$i") / col("n_rows"), 6).as("violation_rate"))
    }
    one.select(explode(array(ruleRows: _*)).as("r"), col("n_rows"))
      .select(col("r.rule_name"), col("r.severity"), col("r.n_violations"),
        col("r.violation_rate"), col("n_rows"),
        (col("r.n_violations") === 0).cast("int").as("passed"))
  }

  /** Severity-weighted overall quality score in [0,1] + per-severity
    * breakdown (one row).
    */
  def score(df: DataFrame, rules: Seq[ValidationRule]): DataFrame = {
    val rpt = report(df, rules)
      .withColumn("w", Severity.weights.foldLeft(lit(0.0)) { case (acc, (s, w)) =>
        when(col("severity") === s, w).otherwise(acc)
      })
    rpt.agg(
      round(lit(1.0) - sum(col("w") * col("violation_rate")) / sum(col("w")), 6)
        .as("overall_score"),
      count(lit(1)).as("n_rules"),
      sum(lit(1) - col("passed")).as("n_failed_rules"),
      sum(when(col("severity") === "critical", lit(1) - col("passed")).otherwise(0))
        .as("n_critical_failures"))
  }

  /** DuckDB oracle for [[report]]: one SELECT per rule, UNION ALL. */
  def reportSqlDuck(rel: String, rules: Seq[ValidationRule]): String =
    rules.map { r =>
      s"""SELECT '${r.name}' AS rule_name, '${r.severity}' AS severity,
          CAST(SUM(CASE WHEN ${r.sqlPredicate} THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
          ROUND(SUM(CASE WHEN ${r.sqlPredicate} THEN 1 ELSE 0 END) * 1.0
                / COUNT(*), 6) AS violation_rate,
          COUNT(*) AS n_rows,
          CASE WHEN SUM(CASE WHEN ${r.sqlPredicate} THEN 1 ELSE 0 END) = 0
               THEN 1 ELSE 0 END AS passed
          FROM $rel"""
    }.mkString("\nUNION ALL\n")

  def scoreSqlDuck(rel: String, rules: Seq[ValidationRule]): String = {
    val w = Severity.weights.map { case (s, wt) => s"WHEN severity = '$s' THEN $wt" }
      .mkString("CASE ", " ", " ELSE 0.0 END")
    s"""SELECT ROUND(1.0 - SUM($w * violation_rate) / SUM($w), 6) AS overall_score,
        COUNT(*) AS n_rules,
        CAST(SUM(1 - passed) AS BIGINT) AS n_failed_rules,
        CAST(SUM(CASE WHEN severity = 'critical' THEN 1 - passed ELSE 0 END)
          AS BIGINT) AS n_critical_failures
        FROM (${reportSqlDuck(rel, rules)})"""
  }
}

/** The concrete rule set for the `events` table — mirrors the
  * reference's 5 layers (schema / business / quality / cross-field /
  * statistical) on the testdata schema.
  */
object EventRules {
  import org.apache.spark.sql.functions.{col => c}

  val all: Seq[ValidationRule] = Seq(
    ValidationRule("value_not_null", "critical",
      c("value").isNull, "value IS NULL"),
    ValidationRule("event_type_enum", "error",
      !c("event_type").isin("click", "view", "purchase", "signup", "error"),
      "event_type NOT IN ('click','view','purchase','signup','error')"),
    ValidationRule("value_range", "error",
      c("value") < -100.0 || c("value") > 10000.0,
      "(value < -100.0 OR value > 10000.0)"),
    ValidationRule("user_id_nonneg", "error",
      c("user_id") < 0, "user_id < 0"),
    ValidationRule("props_json_shape", "warning",
      !c("props").rlike("^\\{.*\\}$"), "NOT regexp_matches(props, '^\\{.*\\}$')"),
    ValidationRule("value_suspicious_zero", "info",
      c("value") === 0.0, "value = 0.0"),
    ValidationRule("purchase_value_floor", "warning",
      c("event_type") === "purchase" && c("value") < 1.0,
      "(event_type = 'purchase' AND value < 1.0)"))
}
