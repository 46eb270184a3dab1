package graft.queries

import graft.QueryDef
import graft.sql.SqlGateway

/** The six dashboard queries AS SQL TEXT through the engine's front
  * door ([[SqlGateway]]) — the reference's actual product surface
  * re-run `spark.sql`-verbatim (ref: src/app.py:26-196; each text below
  * keeps the reference query's clause structure — the joins collapse
  * because the landing schema already carries the dimension attributes
  * the reference normalizes out: user_id ~ sensor, event_type ~
  * sensor_type, props.k/100 ~ quality_score, event_type='error' ~
  * anomaly_flag, and `CURRENT_DATE - INTERVAL '7 days'` becomes the
  * deterministic `MAX(ts) - INTERVAL 7 DAY`).
  *
  * Each twin is gated against the SAME DuckDB oracle as its DataFrame
  * builder (q_dash_*), so a green row here is a bit-for-bit proof that
  * the SQL text and the DataFrame plan compute the identical result —
  * the "SQL front door and query library agree" contract. Exactness
  * uses the same DECIMAL(18,4)-sum recipe in the Spark dialect
  * ([[graft.util.Sql]] documents why double sums can't cross engines).
  *
  * Scale: these compile to the same Catalyst plans as any DataFrame —
  * aggregation over events with map-side partials; the scalar
  * `MAX(ts)` subquery is one 1-row broadcast, never a driver loop.
  */
object SqlDash {

  /** Spark-dialect twin of [[graft.util.Sql.AVGD]]/[[graft.util.Sql.SUMD]]
    * (identical text modulo nothing — both engines parse it).
    */
  private def SUMD(x: String) = s"CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DOUBLE)"
  private def AVGD(x: String) = s"(${SUMD(x)} / COUNT($x))"

  private def q(name: String, sql: String, oracle: String): QueryDef =
    QueryDef(name, (s, d) => {
      SqlGateway.registerAll(s, d)
      SqlGateway.runSql(s, sql, maxRows = 0)
    }, Some(oracle))

  /** /api/metrics (ref app.py:26-73): the four summary KPIs in one
    * pass instead of the reference's four round trips.
    */
  val sqlDashMetrics = q(
    "q_sql_dash_metrics",
    """SELECT COUNT(*) AS n_recent,
              COUNT(DISTINCT user_id) AS n_users,
              ROUND(CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE)
                    * 100.0 / COUNT(*), 6) AS error_rate_pct,
              SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_purchases
       FROM events
       WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 7 DAY""",
    Events.dashMetrics.oracle.get)

  /** /api/sensors (ref app.py:103-133): per-sensor reliability + CASE
    * grade over the trailing 7 days.
    */
  val sqlDashSensors = q(
    "q_sql_dash_sensors",
    s"""WITH e AS (SELECT user_id, event_type, ts,
                     CAST(get_json_object(props, '$$.k') AS DOUBLE) / 100.0 AS q
                   FROM events)
        SELECT user_id,
               COUNT(*) AS n_readings,
               ROUND(${AVGD("q")}, 6) AS avg_quality,
               SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_errors,
               ROUND(${AVGD("q")} *
                 (1.0 - CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE)
                        / COUNT(*)), 6) AS reliability,
               CASE WHEN ${AVGD("q")} > 0.7 THEN 'Excellent'
                    WHEN ${AVGD("q")} > 0.55 THEN 'Good'
                    WHEN ${AVGD("q")} > 0.4 THEN 'Fair'
                    ELSE 'Poor' END AS grade
        FROM e
        WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 7 DAY
        GROUP BY user_id""",
    Dashboard.dashSensors.oracle.get)

  /** /api/alerts (ref app.py:178-229): HAVING-filtered per-sensor
    * error rates with the severity CASE folded in.
    */
  val sqlDashAlerts = q(
    "q_sql_dash_alerts",
    """SELECT user_id, n, n_errors, error_rate_pct,
              CASE WHEN error_rate_pct > 40.0 THEN 'critical'
                   WHEN error_rate_pct > 32.0 THEN 'high'
                   ELSE 'medium' END AS severity
       FROM (SELECT user_id, COUNT(*) AS n,
                    SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_errors,
                    ROUND(CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE)
                          * 100.0 / COUNT(*), 6) AS error_rate_pct
             FROM events GROUP BY user_id)
       WHERE error_rate_pct > 25.0""",
    Events.dashAlerts.oracle.get)

  /** /api/patterns (ref app.py:135-157): hour-of-day profile of one
    * type — EXTRACT(HOUR …) exactly as the reference writes it.
    */
  val sqlDashPatterns = q(
    "q_sql_dash_patterns",
    s"""SELECT EXTRACT(HOUR FROM ts) AS hod,
               COUNT(*) AS n,
               ROUND(${AVGD("value")}, 6) AS avg_value
        FROM events WHERE event_type = 'view' GROUP BY 1""",
    Dashboard.dashPatterns.oracle.get)

  /** /api/sensor-types (ref app.py:159-176): distinct sensors per type. */
  val sqlDashSensorTypes = q(
    "q_sql_dash_sensor_types",
    s"""SELECT event_type,
               COUNT(DISTINCT user_id) AS n_sensors,
               COUNT(*) AS n_readings,
               ROUND(${AVGD("value")}, 6) AS avg_value
        FROM events GROUP BY event_type""",
    Dashboard.dashSensorTypes.oracle.get)

  /** /api/districts (ref app.py:75-101): the 2-dim star rollup, served
    * from the registered `star_fact` view (the reference's
    * fact-join-dims collapses to one view scan).
    */
  val sqlDashDistricts = q(
    "q_sql_dash_districts",
    s"""SELECT segment,
               COUNT(*) AS n_orders,
               COUNT(DISTINCT customer_key) AS n_customers,
               ROUND(${AVGD("total_price")}, 4) AS avg_price,
               ROUND(${SUMD("total_price")}, 4) AS total_volume,
               COUNT(DISTINCT priority_key) AS n_priorities
        FROM star_fact GROUP BY segment""",
    Dashboard.dashDistricts.oracle.get)

  /** An AD-HOC analytics text through the same front door — proof the
    * gateway is a general SQL surface, not six special-cased strings:
    * a 5-table star join + exact revenue + a ranking window, the shape
    * a reference user types into an ad-hoc console. Runs guarded and
    * uncapped exactly as `/api/sql` would serve it; the DuckDB oracle
    * is the SAME text (the exact-sum recipe and the window are
    * engine-portable), so the gate proves text-level portability, not
    * just result agreement.
    *
    * Scale: identical Catalyst plan to the DataFrame builders —
    * lineitem⋈orders shuffles on the fact keys, customer joins
    * size-based, nation/region broadcast by stats; the rank window
    * runs on the ≤|regions|×4 aggregate, never the fact.
    */
  val sqlAdhocRegion = q(
    "q_sql_adhoc_region",
    s"""WITH rev AS (
          SELECT r_name AS region, QUARTER(o_orderdate) AS qtr,
                 ${SUMD2("l_extendedprice", "1.0 - l_discount")} AS revenue,
                 COUNT(DISTINCT o_orderkey) AS n_orders
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY 1, 2)
        SELECT region, qtr, ROUND(revenue, 4) AS revenue, n_orders,
               RANK() OVER (PARTITION BY region ORDER BY revenue DESC) AS rev_rank
        FROM rev""",
    s"""WITH rev AS (
          SELECT r_name AS region, QUARTER(o_orderdate) AS qtr,
                 ${SUMD2("l_extendedprice", "1.0 - l_discount")} AS revenue,
                 COUNT(DISTINCT o_orderkey) AS n_orders
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY 1, 2)
        SELECT region, qtr, ROUND(revenue, 4) AS revenue, n_orders,
               RANK() OVER (PARTITION BY region ORDER BY revenue DESC) AS rev_rank
        FROM rev""")

  private def SUMD2(x: String, y: String) =
    s"CAST(SUM(CAST($x AS DECIMAL(18,4)) * CAST($y AS DECIMAL(18,4))) AS DOUBLE)"

  /** The reference's four analytic VIEWS (ref: sql/real_data_schema
    * .sql:181-258), registered by [[SqlGateway]] under the reference's
    * own names and gated here by `SELECT * FROM v_*` through the front
    * door — proof the view layer computes what it claims, not just
    * that it parses. Each oracle restates the view body over the raw
    * parquet in DuckDB (DuckDB has no access to the Spark views).
    */
  val viewSensorStatus = q(
    "q_view_sensor_status",
    "SELECT * FROM v_sensor_status",
    """SELECT e.user_id AS sensor_id,
              e.event_type AS sensor_type,
              MAX(c.c_mktsegment) AS district_name,
              COUNT(*) AS n_readings,
              CASE e.event_type WHEN 'view' THEN 'm'
                   WHEN 'click' THEN 'l/s' WHEN 'purchase' THEN 'bar'
                   WHEN 'signup' THEN 'celsius' WHEN 'error' THEN 'ph'
                   ELSE 'units' END AS measurement_unit,
              MIN(e.value) AS normal_min_value,
              MAX(e.value) AS normal_max_value,
              MIN(CAST(CAST(e.ts AS TIMESTAMP) AS DATE)) AS effective_date,
              MAX(CAST(e.ts AS TIMESTAMP)) >=
                (SELECT MAX(CAST(ts AS TIMESTAMP)) FROM events)
                  - INTERVAL 7 DAY AS is_current,
              CASE WHEN MAX(CAST(e.ts AS TIMESTAMP)) >=
                    (SELECT MAX(CAST(ts AS TIMESTAMP)) FROM events)
                      - INTERVAL 7 DAY
                   THEN 'active' ELSE 'inactive' END AS status,
              'events' AS data_source_name,
              'synthetic-generator' AS provider
       FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
       GROUP BY 1, 2""")

  val viewDistrictPerformance = q(
    "q_view_district_performance",
    "SELECT * FROM v_district_performance",
    s"""SELECT c.c_mktsegment AS district_name,
              e.event_type AS sensor_type,
              'events' AS data_source_name,
              CAST(CAST(e.ts AS TIMESTAMP) AS DATE) AS date_actual,
              ROUND(CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE)
                / COUNT(e.value), 6) AS avg_reading,
              COUNT(*) AS total_readings,
              CAST(SUM(${SqlGateway.anomalyFlagSql("e.")})
                AS BIGINT) AS anomaly_count,
              ROUND(CAST(SUM(${SqlGateway.anomalyFlagSql("e.")})
                  AS DOUBLE) * 100.0 / COUNT(*), 6) AS anomaly_rate_percent,
              ROUND(CAST(SUM(CAST(CAST(json_extract_string(e.props, '$$.k')
                  AS DOUBLE) / 100.0 AS DECIMAL(18,4))) AS DOUBLE)
                / COUNT(json_extract_string(e.props, '$$.k')), 6)
                AS avg_quality_score,
              COUNT(DISTINCT e.user_id) AS unique_stations,
              COUNT(DISTINCT c.c_nationkey) AS unique_catchments
       FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
       GROUP BY 1, 2, 4""")

  val viewThamesMonitoring = q(
    "q_view_thames_monitoring",
    "SELECT * FROM v_thames_monitoring",
    """SELECT e.user_id AS station_id,
              n.n_name AS catchment,
              c.c_mktsegment AS district_name,
              e.value AS water_level,
              CAST(e.ts AS TIMESTAMP) AS reading_timestamp,
              CAST(json_extract_string(e.props, '$.k') AS DOUBLE) / 100.0
                AS quality_score,
              CASE WHEN e.value < -1 THEN 'Low'
                   WHEN e.value > 5 THEN 'High'
                   ELSE 'Normal' END AS water_level_status
       FROM events e
       LEFT JOIN customer c ON e.user_id = c.c_custkey
       LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
       WHERE e.event_type = 'view'""")

  val viewDataLineage = q(
    "q_view_data_lineage",
    "SELECT * FROM v_data_lineage",
    s"""SELECT 'batch_' || CAST(batch_day AS VARCHAR) AS unified_batch_id,
              '1.0' AS pipeline_version,
              batch_day, data_source_name, provider, record_count,
              avg_quality, anomaly_count, first_ingested, last_ingested
       FROM (
         SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS batch_day,
                'events' AS data_source_name,
                'synthetic-generator' AS provider,
                COUNT(*) AS record_count,
                ROUND((CAST(SUM(CAST(
                    CAST(json_extract_string(props, '$$.k') AS DOUBLE) / 100.0
                    AS DECIMAL(18,4))) AS DOUBLE)
                  / COUNT(json_extract_string(props, '$$.k'))), 6) AS avg_quality,
                CAST(SUM(${SqlGateway.anomalyFlagSql("")})
                  AS BIGINT) AS anomaly_count,
                MIN(CAST(ts AS TIMESTAMP)) AS first_ingested,
                MAX(CAST(ts AS TIMESTAMP)) AS last_ingested
         FROM events GROUP BY 1)""")

  def all: Seq[QueryDef] = Seq(
    sqlDashMetrics, sqlDashSensors, sqlDashAlerts,
    sqlDashPatterns, sqlDashSensorTypes, sqlDashDistricts,
    sqlAdhocRegion, viewSensorStatus, viewDistrictPerformance,
    viewThamesMonitoring, viewDataLineage)
}
