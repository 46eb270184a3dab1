package graft.queries

import graft.QueryDef
import graft.util.Sql
import graft.warehouse.GoldStage
import org.apache.spark.sql.functions._

/** The remaining dashboard API queries (SURVEY §3.3; app.py routes).
  * q_dash_metrics and q_dash_alerts live in Events; these four complete
  * the 6-query surface. events maps to the reading stream (user_id ~
  * sensor, event_type ~ sensor_type, props.k/100 ~ quality_score,
  * event_type='error' ~ anomaly).
  *
  * All six SERVE FROM THE GOLD LAYER ([[GoldStage]]) — the reference's
  * architecture: its dashboard answers from an indexed star schema of
  * pre-aggregated facts (/root/reference/sql/enhanced_data_schema.sql:
  * 279-322, 440-464; app.py:26-196), never from raw readings. The
  * DuckDB oracles still compute from the RAW tables, so every green
  * row is also a proof that the staged rollup re-aggregates exactly
  * (decimal partial sums are associative; distinct-counted keys stay
  * in the rollup grain).
  */
object Dashboard {

  /** /api/sensors (app.py:103-133): per-sensor reliability = avg
    * quality × (1 − anomaly rate), CASE grade, 7-day window, ordered.
    *
    * Serves from `gold_events_recent` — the trailing-7-day slice is
    * materialized at snapshot grain because the cutoff is relative to
    * the row-level MAX(ts) (an hourly rollup can't reproduce a
    * mid-hour cutoff). The rollup is bucketed by user_id, so this
    * group-by runs with NO exchange: scan → partial agg → final agg,
    * all user-local.
    */
  val dashSensors = QueryDef(
    "q_dash_sensors",
    (s, d) => {
      val g = GoldStage.recent(s, d)
      val avgQ = GoldStage.davgOf("q_sum", "q_cnt")
      val nerr = sum(when(col("event_type") === "error", col("n")).otherwise(lit(0L)))
      val n = sum(col("n"))
      g.groupBy("user_id")
        .agg(
          n.as("n_readings"),
          round(avgQ, 6).as("avg_quality"),
          nerr.as("n_errors"),
          round(avgQ * (lit(1.0) - nerr.cast("double") / n), 6).as("reliability"),
          when(avgQ > 0.7, "Excellent")
            .when(avgQ > 0.55, "Good")
            .when(avgQ > 0.4, "Fair")
            .otherwise("Poor").as("grade"))
    },
    Some(s"""WITH e AS (SELECT user_id, event_type,
                          CAST(json_extract_string(props, '$$.k') AS DOUBLE) / 100.0 AS q,
                          CAST(ts AS TIMESTAMP) AS ts
                   FROM events)
        SELECT user_id,
               COUNT(*) AS n_readings,
               ROUND(${Sql.AVGD("q")}, 6) AS avg_quality,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
               ROUND(${Sql.AVGD("q")} *
                 (1.0 - CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE)
                        / COUNT(*)), 6) AS reliability,
               CASE WHEN ${Sql.AVGD("q")} > 0.7 THEN 'Excellent'
                    WHEN ${Sql.AVGD("q")} > 0.55 THEN 'Good'
                    WHEN ${Sql.AVGD("q")} > 0.4 THEN 'Fair'
                    ELSE 'Poor' END AS grade
        FROM e
        WHERE ts >= (SELECT MAX(CAST(ts AS TIMESTAMP)) FROM events) - INTERVAL 7 DAY
        GROUP BY user_id"""))

  /** /api/patterns (app.py:135-157): hourly profile of one type —
    * re-aggregated from `gold_events_hourly` (type filter prunes at
    * the rollup scan; hour-of-day collapses the staged hours 24:1).
    */
  val dashPatterns = QueryDef(
    "q_dash_patterns",
    (s, d) =>
      GoldStage.hourly(s, d)
        .filter(col("event_type") === "view")
        .groupBy(hour(col("h")).as("hod"))
        .agg(sum(col("n")).as("n"),
          round(GoldStage.davgOf("v_sum", "v_cnt"), 6).as("avg_value")),
    Some(s"""SELECT EXTRACT(HOUR FROM CAST(ts AS TIMESTAMP)) AS hod,
             COUNT(*) AS n, ROUND(${Sql.AVGD("value")}, 6) AS avg_value
             FROM events WHERE event_type = 'view' GROUP BY 1"""))

  /** /api/sensor-types (app.py:159-176): distinct sensors per type —
    * from `gold_events_hourly`; user_id is in the rollup grain, so the
    * distinct count re-derives exactly.
    */
  val dashSensorTypes = QueryDef(
    "q_dash_sensor_types",
    (s, d) =>
      GoldStage.hourly(s, d)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_sensors"),
          sum(col("n")).as("n_readings"),
          round(GoldStage.davgOf("v_sum", "v_cnt"), 6).as("avg_value")),
    Some(s"""SELECT event_type, COUNT(DISTINCT user_id) AS n_sensors,
             COUNT(*) AS n_readings, ROUND(${Sql.AVGD("value")}, 6) AS avg_value
             FROM events GROUP BY event_type"""))

  /** /api/districts (app.py:75-101): 2-dim star rollup ordered by
    * activity — served from `gold_star_segment` (the customer-grain
    * reduction of the orders star; both distinct-counted keys are in
    * the grain). This was the one dashboard query whose cold path had
    * to recompute the whole star join per request.
    */
  val dashDistricts = QueryDef(
    "q_dash_districts",
    (s, d) => {
      val g = GoldStage.starSegment(s, d)
      g.groupBy("segment")
        .agg(sum(col("n")).as("n_orders"),
          countDistinct(col("customer_key")).as("n_customers"),
          round(GoldStage.davgOf("p_sum", "p_cnt"), 4).as("avg_price"),
          round(GoldStage.dsumOf("p_sum"), 4).as("total_volume"),
          countDistinct(col("priority_key")).as("n_priorities"))
    },
    Some(s"""WITH fact AS (${Warehouse.starFact.oracle.get})
             SELECT segment, COUNT(*) AS n_orders,
                    COUNT(DISTINCT customer_key) AS n_customers,
                    ROUND(${Sql.AVGD("total_price")}, 4) AS avg_price,
                    ROUND(${Sql.SUMD("total_price")}, 4) AS total_volume,
                    COUNT(DISTINCT priority_key) AS n_priorities
             FROM fact GROUP BY segment"""))

  def all: Seq[QueryDef] = Seq(dashSensors, dashPatterns, dashSensorTypes, dashDistricts)
}
