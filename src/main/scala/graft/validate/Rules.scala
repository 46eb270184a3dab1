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
  * reference's 5 layers (data_validator.py:121-511) on the testdata
  * schema: schema (:192-315), business (:317-385), quality (:387-431),
  * cross-field (:433-472), statistical (:474-511), plus the dup-rate
  * rule (:406-415) and freshness decay (:608-627).
  *
  * Statistical / freshness / duplicate rules need context a bare row
  * doesn't carry: [[enrich]] attaches it — ONE broadcast cross join of
  * a 1-row exact global-stats agg (mean/std/max-ts), one window count
  * for the dup key, and the parsed quality field. That keeps the whole
  * 28-rule catalog a single scan + one tiny broadcast + one hash
  * shuffle — at 100 TB the stats row is a second scan of one column,
  * not a pandas pass per layer like the reference.
  */
object EventRules {
  import org.apache.spark.sql.functions.{col => c}
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.expressions.Window

  /** Context columns for statistical/freshness/dup rules: g_mean,
    * g_std, g_max_ts (exact decimal moments — bit-identical in the
    * oracle), dup_n over (user_id, ts), parsed quality k.
    */
  def enrich(df: DataFrame): DataFrame = {
    val stats = df.agg(
      graft.util.Exact.davg(c("value")).as("g_mean"),
      graft.util.Exact.dstddev(c("value")).as("g_std"),
      max(c("ts")).as("g_max_ts"))
    df.crossJoin(broadcast(stats))
      .withColumn("dup_n", count(lit(1)).over(Window.partitionBy("user_id", "ts")))
      .withColumn("k", expr("cast(get_json_object(props, '$.k') as double)"))
  }

  /** DuckDB twin of [[enrich]] — rules' SQL predicates run FROM
    * `enriched`.
    */
  val enrichDuck: String =
    s"""stats AS (SELECT ${graft.util.Sql.AVGD("value")} AS g_mean,
                        ${graft.util.Sql.STDDEVD("value")} AS g_std,
                        MAX(CAST(ts AS TIMESTAMP)) AS g_max_ts
                 FROM events),
       enriched AS (SELECT event_id, user_id, event_type, value, props,
                           CAST(ts AS TIMESTAMP) AS ts,
                           g_mean, g_std, g_max_ts,
                           COUNT(*) OVER (PARTITION BY user_id, ts) AS dup_n,
                           CAST(json_extract_string(props, '$$.k') AS DOUBLE) AS k
                    FROM events CROSS JOIN stats)"""

  val all: Seq[ValidationRule] = Seq(
    // ---- layer 1: schema (data_validator.py:192-315) ----
    ValidationRule("value_not_null", "critical",
      c("value").isNull, "value IS NULL"),
    ValidationRule("ts_not_null", "critical",
      c("ts").isNull, "ts IS NULL"),
    ValidationRule("event_id_not_null", "critical",
      c("event_id").isNull, "event_id IS NULL"),
    ValidationRule("event_id_nonneg", "error",
      c("event_id") < 0, "event_id < 0"),
    ValidationRule("user_id_nonneg", "error",
      c("user_id") < 0, "user_id < 0"),
    ValidationRule("event_type_enum", "error",
      !c("event_type").isin("click", "view", "purchase", "signup", "error"),
      "event_type NOT IN ('click','view','purchase','signup','error')"),
    ValidationRule("props_not_null", "warning",
      c("props").isNull, "props IS NULL"),
    ValidationRule("props_json_shape", "warning",
      !c("props").rlike("^\\{.*\\}$"), "NOT regexp_matches(props, '^\\{.*\\}$')"),
    // ---- layer 2: business (data_validator.py:317-385) ----
    ValidationRule("value_range", "error",
      c("value") < -100.0 || c("value") > 10000.0,
      "(value < -100.0 OR value > 10000.0)"),
    ValidationRule("value_suspicious_zero", "info",
      c("value") === 0.0, "value = 0.0"),
    ValidationRule("ts_sane_lower", "error",
      c("ts") < expr("timestamp_ntz'2000-01-01 00:00:00'"),
      "ts < TIMESTAMP '2000-01-01'"),
    ValidationRule("ts_not_future", "error",
      c("ts") > expr("timestamp_ntz'2030-01-01 00:00:00'"),
      "ts > TIMESTAMP '2030-01-01'"),
    // ---- layer 3: quality (data_validator.py:387-431) ----
    ValidationRule("k_present", "warning",
      c("k").isNull, "k IS NULL"),
    ValidationRule("k_range", "error",
      c("k") < 0.0 || c("k") > 100.0, "(k < 0.0 OR k > 100.0)"),
    ValidationRule("k_integer", "info",
      c("k") =!= floor(c("k")), "k <> FLOOR(k)"),
    ValidationRule("dup_user_ts", "warning",
      c("dup_n") > 1, "dup_n > 1"),
    ValidationRule("dup_burst", "critical",
      c("dup_n") > 3, "dup_n > 3"),
    // ---- layer 4: cross-field (data_validator.py:433-472) ----
    ValidationRule("purchase_value_floor", "warning",
      c("event_type") === "purchase" && c("value") < 1.0,
      "(event_type = 'purchase' AND value < 1.0)"),
    ValidationRule("error_k_present", "warning",
      c("event_type") === "error" && c("k").isNull,
      "(event_type = 'error' AND k IS NULL)"),
    ValidationRule("purchase_low_quality", "info",
      c("event_type") === "purchase" && c("value") > 100.0 && c("k") < 10.0,
      "(event_type = 'purchase' AND value > 100.0 AND k < 10.0)"),
    ValidationRule("signup_value_range", "warning",
      c("event_type") === "signup" && (c("value") < 0.0 || c("value") > 1000.0),
      "(event_type = 'signup' AND (value < 0.0 OR value > 1000.0))"),
    ValidationRule("click_value_cap", "info",
      c("event_type") === "click" && c("value") > 5000.0,
      "(event_type = 'click' AND value > 5000.0)"),
    ValidationRule("view_value_nonneg", "warning",
      c("event_type") === "view" && c("value") < 0.0,
      "(event_type = 'view' AND value < 0.0)"),
    // ---- layer 5: statistical (data_validator.py:474-511) ----
    ValidationRule("value_z_mild_2s", "info",
      abs(c("value") - c("g_mean")) > c("g_std") * 2.0,
      "ABS(value - g_mean) > g_std * 2.0"),
    ValidationRule("value_z_outlier_3s", "warning",
      abs(c("value") - c("g_mean")) > c("g_std") * 3.0,
      "ABS(value - g_mean) > g_std * 3.0"),
    ValidationRule("value_z_extreme_5s", "error",
      abs(c("value") - c("g_mean")) > c("g_std") * 5.0,
      "ABS(value - g_mean) > g_std * 5.0"),
    // ---- freshness decay (data_validator.py:608-627) ----
    ValidationRule("stale_24h", "info",
      c("ts") < c("g_max_ts") - expr("INTERVAL 24 HOURS"),
      "ts < g_max_ts - INTERVAL 24 HOUR"),
    ValidationRule("stale_7d", "warning",
      c("ts") < c("g_max_ts") - expr("INTERVAL 7 DAYS"),
      "ts < g_max_ts - INTERVAL 7 DAY"))
}
