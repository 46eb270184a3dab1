package graft.queries

import graft.{QueryDef, Tables}
import graft.util.Sql
import org.apache.spark.sql.functions._

/** The remaining dashboard API queries (SURVEY §3.3; app.py routes).
  * q_dash_metrics and q_dash_alerts live in Events; these four complete
  * the 6-query surface. events maps to the reading stream (user_id ~
  * sensor, event_type ~ sensor_type, props.k/100 ~ quality_score,
  * event_type='error' ~ anomaly).
  */
object Dashboard {

  /** /api/sensors (app.py:103-133): per-sensor reliability = avg
    * quality × (1 − anomaly rate), CASE grade, 7-day window, ordered.
    *
    * The 7-day cutoff uses a SCALAR SUBQUERY (like q_dash_metrics,
    * Events.dashMetrics), NOT `max(ts) OVER ()`: an empty-partition
    * global window funnels the whole events table through ONE task
    * before the filter, which is the first thing to die at 100× scale.
    * Spark plans the subquery as a tiny separate agg whose result is
    * folded into a pushable filter.
    */
  val dashSensors = QueryDef(
    "q_dash_sensors",
    (s, d) => {
      Tables.registerViews(s, d)
      s.sql(s"""
        WITH e AS (SELECT user_id, event_type,
                          cast(get_json_object(props, '$$.k') as double) / 100.0 AS q,
                          ts
                   FROM events)
        SELECT user_id,
               COUNT(*) AS n_readings,
               ROUND(${Sql.AVGD("q")}, 6) AS avg_quality,
               SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_errors,
               ROUND(${Sql.AVGD("q")} *
                 (1.0 - CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE)
                        / COUNT(*)), 6) AS reliability,
               CASE WHEN ${Sql.AVGD("q")} > 0.7 THEN 'Excellent'
                    WHEN ${Sql.AVGD("q")} > 0.55 THEN 'Good'
                    WHEN ${Sql.AVGD("q")} > 0.4 THEN 'Fair'
                    ELSE 'Poor' END AS grade
        FROM e
        WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 7 DAYS
        GROUP BY user_id""")
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

  /** /api/patterns (app.py:135-157): hourly profile of one type. */
  val dashPatterns = QueryDef(
    "q_dash_patterns",
    (s, d) =>
      Tables.events(s, d)
        .filter(col("event_type") === "view")
        .groupBy(hour(col("ts")).as("hod"))
        .agg(count(lit(1)).as("n"),
          round(graft.util.Exact.davg(col("value")), 6).as("avg_value")),
    Some(s"""SELECT EXTRACT(HOUR FROM CAST(ts AS TIMESTAMP)) AS hod,
             COUNT(*) AS n, ROUND(${Sql.AVGD("value")}, 6) AS avg_value
             FROM events WHERE event_type = 'view' GROUP BY 1"""))

  /** /api/sensor-types (app.py:159-176): distinct sensors per type. */
  val dashSensorTypes = QueryDef(
    "q_dash_sensor_types",
    (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_sensors"),
          count(lit(1)).as("n_readings"),
          round(graft.util.Exact.davg(col("value")), 6).as("avg_value")),
    Some(s"""SELECT event_type, COUNT(DISTINCT user_id) AS n_sensors,
             COUNT(*) AS n_readings, ROUND(${Sql.AVGD("value")}, 6) AS avg_value
             FROM events GROUP BY event_type"""))

  /** /api/districts (app.py:75-101): 2-dim star rollup ordered by
    * activity — run over the orders star (segment × priority play the
    * district × type roles).
    */
  val dashDistricts = QueryDef(
    "q_dash_districts",
    (s, d) => {
      val fact = Warehouse.starFact.fn(s, d)
      fact.groupBy("segment")
        .agg(count(lit(1)).as("n_orders"),
          countDistinct(col("customer_key")).as("n_customers"),
          round(graft.util.Exact.davg(col("total_price")), 4).as("avg_price"),
          round(graft.util.Exact.dsum(col("total_price")), 4).as("total_volume"),
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
