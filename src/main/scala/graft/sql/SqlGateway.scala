package graft.sql

import graft.Tables
import graft.plans.GraftExtensions
import graft.warehouse.GoldStage
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{ExpressionWithUnresolvedIdentifier, PlanWithUnresolvedIdentifier, UnresolvedExecuteImmediate, UnresolvedFunction, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.CallMethodViaReflection
import org.apache.spark.sql.catalyst.plans.logical.{Command, DeleteFromTable, InsertIntoStatement, LogicalPlan, MergeIntoTable, UpdateTable, UnresolvedWith}

/** The engine's SQL front door — the missing piece between "a library
  * of named queries" and "an analytics engine": the reference's product
  * query surface IS ad-hoc SQL text over its warehouse schema
  * (ref: src/app.py:26-196 issues SQL per dashboard route; views in
  * sql/real_data_schema.sql:181-258), and SURVEY §3.3 planned the same
  * texts running through `spark.sql` over registered views.
  *
  * [[registerAll]] publishes the queryable surface under stable names:
  * the ten raw landing tables (via [[Tables.registerViews]]), the gold
  * rollups (`gold_events_hourly` / `gold_events_recent` /
  * `gold_star_segment` — the tag-suffixed warehouse artifacts behind
  * session-stable aliases), the orders star fact (`star_fact`), and the
  * engine's native SQL functions (`vec_dot`, `vec_d2`, `shingle_hash`
  * via [[GraftExtensions.register]]). A user of the reference can point
  * the same SELECT at the same logical tables.
  *
  * [[runSql]] is the GUARDED entry point the HTTP route serves: it
  * admits exactly one read-only statement over the registered surface.
  * The guard runs on the PARSED plan (never on string heuristics —
  * comments/casing/newlines can't smuggle anything past a syntax tree):
  *
  *  1. no commands — any `Command` node (DDL, DML, SET, CACHE, …)
  *     anywhere in the tree, including subqueries, is rejected;
  *  2. no out-of-surface relations — every table reference must be a
  *     single-part name that is either a registered view or a CTE the
  *     statement itself defines. This also closes the path-read hole
  *     (`parquet.`/etc/anything``) a naive "SELECT-only" filter leaves
  *     open: multipart identifiers are rejected outright;
  *  3. bounded result — the plan is wrapped in `LIMIT maxRows` so an
  *     ad-hoc `SELECT * FROM lineitem` returns a page, not the table.
  *     The limit composes with Spark's own pushdown (a global limit
  *     over a scan plans as CollectLimit — no full materialization).
  *
  * Scale: the front door adds NO execution machinery — text → Catalyst
  * → the same optimized plans the DataFrame builders produce (the
  * q_sql_dash_* gate twins prove bit-equality). On a cluster the same
  * object sits behind Spark Connect / Thrift with this guard unchanged.
  */
object SqlGateway {

  /** Stable view names this gateway exposes beyond the raw tables. */
  val GoldViews: Seq[String] =
    Seq("gold_events_hourly", "gold_events_recent", "gold_star_segment")
  val StarViews: Seq[String] = Seq("star_fact")

  /** Out-of-band threshold of the ROW-level anomaly flag (an 'error'
    * event, or a value above the distribution's far tail). ONE
    * constant: the predicate is stated in six SQL strings across two
    * engines (these views + their DuckDB oracles in queries/SqlDash),
    * and the oracle gate hash-compares the results — editing the
    * threshold in one string and not the others would fail the gate.
    */
  val AnomalyBand = 200

  /** The anomaly flag as a SQL CASE term, `prefix` qualifying the
    * event columns (`"e."` or empty) — interpolated into BOTH engines'
    * texts so they cannot drift.
    */
  def anomalyFlagSql(prefix: String): String =
    s"CASE WHEN ${prefix}event_type = 'error' OR ${prefix}value > " +
      s"$AnomalyBand THEN 1 ELSE 0 END"

  /** The reference's four ANALYTIC VIEWS (ref: sql/real_data_schema
    * .sql:181-258) re-expressed over the registered surface with the
    * same schema translation the dashboard texts use (sensor ~
    * user_id, sensor_type ~ event_type, quality ~ props.k/100,
    * anomaly ~ event_type='error', district ~ star segment, the
    * `water_level` sensor type ~ the 'view' event type). Registered
    * under the reference's own view NAMES, so a reference user's
    * `SELECT ... FROM v_*` texts run through `/api/sql` unchanged.
    * Each is a plain Catalyst view — same optimized plans as the
    * equivalent DataFrame, no materialization.
    */
  val RefViews: Seq[(String, String)] = Seq(
    // ref:181-199 — the sensor catalog: per (sensor, type) observed
    // range, first-seen date, a 7-day currency flag, the derived
    // status, and the sensor's district (its customer's segment —
    // LEFT, so a sensor without a dim row still catalogs).
    // measurement_unit (ref:187, from dim_sensor_types) is keyed on
    // the established type analogies (view ~ water_level → m, click ~
    // flow → l/s, …); provider (ref:193, from dim_data_sources) — the
    // landing tables have ONE source, the synthetic generator, so the
    // dim collapses to a constant, like data_source_name.
    "v_sensor_status" ->
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
                MIN(CAST(e.ts AS DATE)) AS effective_date,
                MAX(e.ts) >= (SELECT MAX(ts) FROM events) - INTERVAL 7 DAY
                  AS is_current,
                CASE WHEN MAX(e.ts) >=
                      (SELECT MAX(ts) FROM events) - INTERVAL 7 DAY
                     THEN 'active' ELSE 'inactive' END AS status,
                'events' AS data_source_name,
                'synthetic-generator' AS provider
         FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
         GROUP BY e.user_id, e.event_type""",
    // ref:202-220 — the READINGS rollup the reference states: district
    // × sensor type × source × day with reading/anomaly/quality
    // metrics (incl. anomaly_rate_percent, ref:211-212) and station/
    // catchment cardinalities. Translation: district ~ the sensor's
    // customer segment, catchment ~ the customer's nation. The anomaly
    // flag is ROW-level, like the reference's (its ETL sets
    // anomaly_flag per reading against the sensor type's normal band):
    // type-level 'error' events OR an out-of-band value (> 200, the
    // observed distribution's far tail — ~20% of rows) — so the rate
    // varies WITHIN a (type, day) group instead of degenerating to
    // 0-or-100 as the earlier type-only mapping did. CAST AS DOUBLE
    // before the *100.0 — a bare decimal literal would type the column
    // decimal(31,6) and break hash parity with the oracle (the r12
    // lesson, SqlDash.scala).
    "v_district_performance" ->
      s"""SELECT c.c_mktsegment AS district_name,
                e.event_type AS sensor_type,
                'events' AS data_source_name,
                CAST(e.ts AS DATE) AS date_actual,
                ROUND(CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE)
                  / COUNT(e.value), 6) AS avg_reading,
                COUNT(*) AS total_readings,
                SUM(${anomalyFlagSql("e.")}) AS anomaly_count,
                ROUND(CAST(SUM(${anomalyFlagSql("e.")})
                    AS DOUBLE) * 100.0 / COUNT(*), 6) AS anomaly_rate_percent,
                ROUND(CAST(SUM(CAST(CAST(get_json_object(e.props, '$$.k') AS DOUBLE)
                    / 100.0 AS DECIMAL(18,4))) AS DOUBLE)
                  / COUNT(get_json_object(e.props, '$$.k')), 6)
                  AS avg_quality_score,
                COUNT(DISTINCT e.user_id) AS unique_stations,
                COUNT(DISTINCT c.c_nationkey) AS unique_catchments
         FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
         GROUP BY c.c_mktsegment, e.event_type, CAST(e.ts AS DATE)""",
    // ref:223-242 — level banding over one sensor type's readings,
    // with the reference's station/catchment/district/quality columns
    // (catchment ~ the customer's nation name)
    "v_thames_monitoring" ->
      """SELECT e.user_id AS station_id,
                n.n_name AS catchment,
                c.c_mktsegment AS district_name,
                e.value AS water_level,
                e.ts AS reading_timestamp,
                CAST(get_json_object(e.props, '$.k') AS DOUBLE) / 100.0
                  AS quality_score,
                CASE WHEN e.value < -1 THEN 'Low'
                     WHEN e.value > 5 THEN 'High'
                     ELSE 'Normal' END AS water_level_status
         FROM events e
         LEFT JOIN customer c ON e.user_id = c.c_custkey
         LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
         WHERE e.event_type = 'view'""",
    // ref:245-258 — per-ingest-batch lineage and quality. Batch grain:
    // the landing data records no ingest batches, so the DAY is the
    // batch (the generator emits day-grain files) and
    // unified_batch_id/pipeline_version (ref:246-247) are synthesized
    // deterministically from it — one id per batch-day, one constant
    // version for the one pipeline that produced the fixture. provider
    // (ref:249) collapses to the same constant as v_sensor_status. The
    // anomaly flag matches v_district_performance (row-level).
    "v_data_lineage" ->
      s"""SELECT CONCAT('batch_', CAST(batch_day AS STRING)) AS unified_batch_id,
                '1.0' AS pipeline_version,
                batch_day, data_source_name, provider, record_count,
                avg_quality, anomaly_count, first_ingested, last_ingested
         FROM (
           SELECT CAST(ts AS DATE) AS batch_day,
                  'events' AS data_source_name,
                  'synthetic-generator' AS provider,
                  COUNT(*) AS record_count,
                  ROUND((CAST(SUM(CAST(CAST(get_json_object(props, '$$.k') AS DOUBLE)
                      / 100.0 AS DECIMAL(18,4))) AS DOUBLE)
                    / COUNT(get_json_object(props, '$$.k'))), 6) AS avg_quality,
                  SUM(${anomalyFlagSql("")}) AS anomaly_count,
                  MIN(ts) AS first_ingested,
                  MAX(ts) AS last_ingested
           FROM events GROUP BY CAST(ts AS DATE))""")

  /** Every relation name [[runSql]] admits (lowercase). */
  def allowedTables: Set[String] =
    (Tables.names ++ GoldViews ++ StarViews ++ RefViews.map(_._1))
      .map(_.toLowerCase).toSet

  /** Memoized per (session, dir), like [[Tables.registerViews]]: gold
    * accessors stat source files to resolve the artifact tag, and the
    * star fact re-derives its dims — cheap, but not free per request.
    */
  private val registered = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())

  def registerAll(spark: SparkSession, dir: String): Unit =
    registered.synchronized {
      if (registered.get(spark) != dir) {
        Tables.registerViews(spark, dir)
        GoldStage.hourly(spark, dir).createOrReplaceTempView("gold_events_hourly")
        GoldStage.recent(spark, dir).createOrReplaceTempView("gold_events_recent")
        GoldStage.starSegment(spark, dir).createOrReplaceTempView("gold_star_segment")
        graft.queries.Warehouse.starFact.fn(spark, dir)
          .createOrReplaceTempView("star_fact")
        // the reference's analytic views resolve against the tables
        // registered above — define them last
        RefViews.foreach { case (name, text) =>
          spark.sql(text).createOrReplaceTempView(name)
        }
        GraftExtensions.register(spark)
        // memoize only a COMPLETED registration: marking first would
        // turn one transient failure into permanent
        // TABLE_OR_VIEW_NOT_FOUND for every later request
        registered.put(spark, dir)
      }
    }

  final class SqlDeniedException(msg: String)
    extends IllegalArgumentException(msg)

  private def deny(msg: String): Nothing = throw new SqlDeniedException(msg)

  /** Reject anything but a single read-only statement over the
    * registered surface. Runs on the parser output, BEFORE analysis —
    * nothing is resolved (and nothing can execute) until the statement
    * has passed.
    */
  private[graft] def validate(plan: LogicalPlan): Unit = {
    // CTE names the statement itself defines are legal relation targets
    val ctes = scala.collection.mutable.Set.empty[String]
    plan.collectWithSubqueries {
      case w: UnresolvedWith =>
        w.cteRelations.foreach { case (name, _, _) => ctes += name.toLowerCase }
    }
    plan.collectWithSubqueries {
      case c: Command =>
        deny(s"read-only gateway: statement kind '${c.nodeName}' is not allowed")
      // DML parses as plain logical nodes (not Command) in Spark 4 —
      // INSERT/DELETE/UPDATE/MERGE must be denied by type, not superclass.
      case w @ (_: InsertIntoStatement | _: DeleteFromTable | _: UpdateTable |
                _: MergeIntoTable) =>
        deny(s"read-only gateway: statement kind '${w.nodeName}' is not allowed")
      // deferred-construction escapes: these two build their statement /
      // relation during ANALYSIS, after this guard has run — EXECUTE
      // IMMEDIATE would re-parse an embedded string (smuggling DDL or a
      // parquet.`path` read), IDENTIFIER() would conjure a relation
      // from a string. Deny the deferral itself.
      case _: UnresolvedExecuteImmediate =>
        deny("read-only gateway: EXECUTE IMMEDIATE is not allowed")
      case _: PlanWithUnresolvedIdentifier =>
        deny("read-only gateway: IDENTIFIER() relations are not allowed")
      case r: UnresolvedRelation =>
        val id = r.multipartIdentifier
        val ok = id.size == 1 &&
          (allowedTables(id.head.toLowerCase) || ctes(id.head.toLowerCase))
        if (!ok) deny(s"unknown or out-of-surface table: ${id.mkString(".")} " +
          s"(allowed: ${allowedTables.toSeq.sorted.mkString(", ")})")
    }
    // Expression-level escapes: IDENTIFIER() in expression position
    // (it can name a FUNCTION from a string, sidestepping the name
    // check below) and the JVM reflection builtins, which execute
    // arbitrary public static methods — System.getenv through a
    // "read-only" surface. Walked on the parse tree, same as above.
    plan.collectWithSubqueries { case node =>
      node.expressions.foreach(_.foreach {
        case _: ExpressionWithUnresolvedIdentifier =>
          deny("read-only gateway: IDENTIFIER() expressions are not allowed")
        case f: UnresolvedFunction
            if DeniedFunctions(f.nameParts.last.toLowerCase) =>
          deny(s"read-only gateway: function " +
            s"'${f.nameParts.mkString(".")}' is not allowed")
        case _ => ()
      })
    }
  }

  /** JVM-reflection builtins (arbitrary static method calls) — never
    * legitimate on an analytics surface.
    */
  private val DeniedFunctions = Set("reflect", "java_method")

  /** Parse + guard + run one read-only statement; the result is capped
    * at `maxRows` (non-positive = uncapped, for trusted in-process
    * callers like the gate twins).
    */
  def runSql(spark: SparkSession, sql: String, maxRows: Int = 1000): DataFrame = {
    val plan =
      try spark.sessionState.sqlParser.parsePlan(sql)
      catch {
        case e: org.apache.spark.sql.catalyst.parser.ParseException =>
          deny(s"parse error: ${e.getMessage}")
      }
    validate(plan)
    val df = spark.sql(sql)
    // Belt-and-braces: re-check the ANALYZED tree, where anything the
    // parse-level name check could miss (a reflection builtin reached
    // through an alias or future parser sugar) appears as its typed
    // expression. Analysis only — nothing has executed yet.
    df.queryExecution.analyzed.collectWithSubqueries { case node =>
      node.expressions.foreach(_.foreach {
        case _: CallMethodViaReflection =>
          deny("read-only gateway: reflection functions are not allowed")
        case _ => ()
      })
    }
    if (maxRows > 0) df.limit(maxRows) else df
  }

  /** Parse + guard + EXPLAIN one read-only statement — the formatted
    * physical plan (scans with ReadSchema/PushedFilters, exchanges,
    * codegen stages), NEVER executed. The introspection half of an
    * engine's front door: a user tuning an ad-hoc text sees whether
    * their filter reached the parquet reader the same way the
    * engine's own plan audits do. The same guard applies — `EXPLAIN`
    * as SQL text would parse as a Command and be denied; this is the
    * sanctioned path.
    */
  def explainSql(spark: SparkSession, sql: String): String =
    runSql(spark, sql, maxRows = 0).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
}
