package graft.queries

import graft.{QueryDef, Tables}
import graft.util.Sql
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** True EMA + trend/volatility classification (SURVEY §2.5 W7, §2.10
  * F-custom / §7.3): the reference fakes EMA as a plain rolling mean
  * (enhanced_spark_etl.py:293-295); this is the real recursive EMA.
  */
object TimeSeries {

  private val D = DecimalType(18, 4)

  /** Per-user exponential moving average (α = 0.2), final value.
    *
    * EMA is inherently sequential (ema_t = α·x_t + (1-α)·ema_{t-1}),
    * so it cannot be a plain window aggregate; it IS expressible as a
    * left fold over the time-ordered values — `aggregate` over
    * `array_sort(collect_list(...))`. Both engines fold left-to-right
    * with the same constants → bit-identical. Scale: state per user is
    * one array of its events — bounded by per-user history, which a
    * 100 TB deployment would cap with a time window (here the testdata
    * is already bounded); the shuffle is one hash partition by user.
    */
  val ema = QueryDef(
    "q_ema",
    (s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(collect_list(struct(col("ts"), col("event_id"), col("value"))).as("evs"))
        .select(col("user_id"),
          expr("""round(aggregate(
                    slice(transform(array_sort(evs), e -> e.value), 2, size(evs) - 1),
                    transform(array_sort(evs), e -> e.value)[0],
                    (acc, x) -> acc * cast(0.8 as double) + x * cast(0.2 as double)
                  ), 6)""").as("ema"),
          size(col("evs")).as("n_events")),
    Some("""SELECT user_id,
                   ROUND(list_reduce(
                     array_agg(value ORDER BY CAST(ts AS TIMESTAMP), event_id),
                     (acc, x) -> acc * CAST(0.8 AS DOUBLE) + x * CAST(0.2 AS DOUBLE)
                   ), 6) AS ema,
                   COUNT(*) AS n_events
            FROM events GROUP BY user_id"""))

  /** W7 — rolling trend strength + volatility classification
    * (enhanced_spark_etl.py:297-308; spark_etl.py:168-169): deviation
    * vs ±1σ/2σ of the trailing 24 readings → 5-way label; std/avg
    * ratio → volatility band. Exact decimal moments keep every
    * comparison identical across engines.
    */
  val trendClassify = QueryDef(
    "q_trend_classify",
    (s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id")).rowsBetween(-23, 0)
      val sw  = sum(col("value").cast(D)).over(w).cast("double")
      val ssq = sum(col("value").cast(D) * col("value").cast(D)).over(w).cast("double")
      val n   = count(lit(1)).over(w).cast("double")
      val avg = sw / n
      val std = when(n > 1,
        sqrt(greatest((ssq - sw * sw / n) / (n - lit(1.0)), lit(0.0)))).otherwise(0.0)
      val diff = col("value") - avg
      Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        when(std > 0 && diff > std * 2, "rising_strong")
          .when(std > 0 && diff > std, "rising")
          .when(std > 0 && diff < std * -2, "falling_strong")
          .when(std > 0 && diff < -std, "falling")
          .otherwise("stable").as("trend"),
        when(avg =!= 0.0 && std / abs(avg) > 0.5, "high")
          .when(avg =!= 0.0 && std / abs(avg) > 0.2, "medium")
          .otherwise("low").as("volatility"))
    },
    Some("""WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
                       FROM events),
            st AS (SELECT event_id, user_id, value,
                     CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sw,
                     CAST(SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS ssq,
                     CAST(COUNT(*) OVER w AS DOUBLE) AS n
                   FROM e
                   WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)),
            m AS (SELECT event_id, user_id, value, sw / n AS avg,
                    CASE WHEN n > 1
                         THEN SQRT(GREATEST((ssq - sw * sw / n) / (n - 1.0), 0.0))
                         ELSE 0.0 END AS std
                  FROM st)
            SELECT event_id, user_id,
              CASE WHEN std > 0 AND value - avg > std * 2 THEN 'rising_strong'
                   WHEN std > 0 AND value - avg > std THEN 'rising'
                   WHEN std > 0 AND value - avg < std * -2 THEN 'falling_strong'
                   WHEN std > 0 AND value - avg < -std THEN 'falling'
                   ELSE 'stable' END AS trend,
              CASE WHEN avg <> 0.0 AND std / ABS(avg) > 0.5 THEN 'high'
                   WHEN avg <> 0.0 AND std / ABS(avg) > 0.2 THEN 'medium'
                   ELSE 'low' END AS volatility
            FROM m"""))

  /** §3.1 full-pipeline replay on the S11 generator — the BASELINE
    * throughput workload (14,400 rows → gold rollup). The run lands the
    * generated fixture to parquet first (Replay.FixturePath), so the
    * oracle replays the same chain (features → rolling 24-row stats →
    * z-score spikes → district-hourly gold) over byte-identical input.
    */
  val pipelineReplay = QueryDef(
    "q_pipeline_replay",
    (s, _) => graft.pipeline.Replay.run(s),
    Some(s"""WITH r AS (SELECT * FROM read_parquet('${graft.pipeline.Replay.FixturePath}/*.parquet')),
            f AS (SELECT district, sensor_type, value, quality_score, anomaly_flag,
                         sensor_id, timestamp,
                         CAST(EXTRACT(YEAR FROM timestamp) AS INT) AS year,
                         CAST(EXTRACT(MONTH FROM timestamp) AS INT) AS month,
                         CAST(EXTRACT(DAY FROM timestamp) AS INT) AS day,
                         CAST(EXTRACT(HOUR FROM timestamp) AS INT) AS hour,
                         CASE WHEN EXTRACT(HOUR FROM timestamp) BETWEEN 6 AND 9
                                OR EXTRACT(HOUR FROM timestamp) BETWEEN 18 AND 21
                              THEN 1 ELSE 0 END AS is_peak_hour
                  FROM r),
            w AS (SELECT *,
                    CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER win AS DOUBLE) AS sw,
                    CAST(SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) OVER win AS DOUBLE) AS ssq,
                    CAST(COUNT(*) OVER win AS DOUBLE) AS n
                  FROM f
                  WINDOW win AS (PARTITION BY sensor_id ORDER BY timestamp
                                 ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)),
            z AS (SELECT *, sw / n AS rolling_avg,
                    CASE WHEN n > 1 THEN SQRT(GREATEST((ssq - sw * sw / n) / (n - 1.0), 0.0))
                         ELSE 0.0 END AS rolling_std
                  FROM w),
            s AS (SELECT *,
                    CASE WHEN rolling_std > 0 THEN (value - rolling_avg) / rolling_std
                         ELSE 0.0 END AS z_score
                  FROM z)
            SELECT district, sensor_type, year, month, day, hour,
                   COUNT(*) AS n_readings,
                   ROUND(${Sql.AVGD("value")}, 6) AS avg_value,
                   MIN(value) AS min_value,
                   MAX(value) AS max_value,
                   ROUND(${Sql.STDDEVD("value")}, 6) AS std_value,
                   CAST(SUM(anomaly_flag) AS BIGINT) AS n_anomalies,
                   CAST(SUM(CASE WHEN ABS(z_score) > 2.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_spikes,
                   ROUND(${Sql.AVGD("quality_score")}, 6) AS avg_quality,
                   ROUND(CAST(SUM(CASE WHEN is_peak_hour = 1 THEN CAST(value AS DECIMAL(18,4))
                                       ELSE CAST(0.0 AS DECIMAL(18,4)) END) AS DOUBLE), 4) AS peak_volume
            FROM s
            GROUP BY district, sensor_type, year, month, day, hour"""))

  /** Anomaly EVENTS (fact_anomaly_events, enhanced_data_schema.sql:
    * 325-360): contiguous runs of anomalous readings per sensor rolled
    * up to one row with start/end/duration/peak/severity. Gaps-and-
    * islands: island id = rn_all − rn_anomalous, constant within a run.
    * Batch twin of the streaming sessionizer; one shuffle by user.
    */
  val anomalyEvents = QueryDef(
    "q_anomaly_events",
    (s, d) => {
      val wAll = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val anom = Tables.events(s, d)
        .withColumn("rn_all", row_number().over(wAll))
        .filter(col("value") > 75.0)
        .withColumn("rn_anom", row_number().over(wAll))
        .withColumn("island", col("rn_all") - col("rn_anom"))
      anom.groupBy("user_id", "island")
        .agg(
          min(col("ts")).as("event_start"),
          max(col("ts")).as("event_end"),
          count(lit(1)).as("n_readings"),
          max(col("value")).as("peak_value"),
          (expr("unix_micros(cast(max(ts) as timestamp))") -
            expr("unix_micros(cast(min(ts) as timestamp))")).as("duration_us"))
        .withColumn("severity",
          when(col("peak_value") > 95, "critical")
            .when(col("peak_value") > 88, "high")
            .when(col("peak_value") > 80, "medium").otherwise("low"))
        .drop("island")
    },
    Some("""WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn_all
                 FROM events),
            a AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn_anom
                  FROM e WHERE value > 75.0),
            g AS (SELECT user_id, rn_all - rn_anom AS island,
                         MIN(ts) AS event_start, MAX(ts) AS event_end,
                         COUNT(*) AS n_readings, MAX(value) AS peak_value,
                         epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
                  FROM a GROUP BY user_id, rn_all - rn_anom)
            SELECT user_id, event_start, event_end, n_readings, peak_value,
                   duration_us,
                   CASE WHEN peak_value > 95 THEN 'critical'
                        WHEN peak_value > 88 THEN 'high'
                        WHEN peak_value > 80 THEN 'medium'
                        ELSE 'low' END AS severity
            FROM g"""))

  /** Hourly gap-fill with forward-fill imputation: each user's series
    * is resampled onto its own min..max hourly grid; hours with no
    * reading inherit the last observed value (`last(ignoreNulls)`) and
    * are flagged. This is the missing-data imputation step the
    * reference does with pandas `fillna` — done as a declarative plan.
    *
    * Scale shape: the grid is generated per user with `sequence` +
    * `explode` (narrow; output rows = Σ user spans, never a cross
    * join), the grid↔observation join is an equi-join on (user, hour),
    * and the fill is a window partitioned by user. At 100 TB the grid
    * generation stays proportional to entities × horizon — the same
    * cost any resampler pays — and nothing is ever single-partition.
    */
  val gapFill = QueryDef(
    "q_gap_fill",
    (s, d) => {
      val ev = Tables.events(s, d)
      val hourly = ev
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
        .agg(max_by(col("value"), struct(col("ts"), col("event_id"))).as("obs"))
      val grid = hourly.groupBy("user_id")
        .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
        .select(col("user_id"),
          explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR")))
            .as("hour"))
      val wFill = Window.partitionBy("user_id").orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(hourly, Seq("user_id", "hour"), "left")
        .select(col("user_id"), col("hour"),
          last(col("obs"), ignoreNulls = true).over(wFill).as("value_filled"),
          col("obs").isNull.as("is_imputed"))
    },
    Some("""WITH hourly AS (
              SELECT user_id, hour, value AS obs FROM (
                SELECT user_id,
                       date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
                       value,
                       ROW_NUMBER() OVER (
                         PARTITION BY user_id,
                                      date_trunc('hour', CAST(ts AS TIMESTAMP))
                         ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
                FROM events) WHERE rn = 1),
            grid AS (
              SELECT user_id,
                     unnest(generate_series(MIN(hour), MAX(hour),
                                            INTERVAL 1 HOUR)) AS hour
              FROM hourly GROUP BY user_id)
            SELECT g.user_id, g.hour,
                   last_value(h.obs IGNORE NULLS) OVER (
                     PARTITION BY g.user_id ORDER BY g.hour
                     ROWS UNBOUNDED PRECEDING) AS value_filled,
                   h.obs IS NULL AS is_imputed
            FROM grid g LEFT JOIN hourly h
              ON g.user_id = h.user_id AND g.hour = h.hour""")
  )

  /** Time-weighted average per user-day: Σ vᵢ·Δtᵢ / Σ Δtᵢ with Δtᵢ =
    * gap to the next reading (the sensor-correct mean when sampling is
    * irregular — a plain AVG over-weights bursts). Single-reading days
    * have zero weighted span and are excluded.
    *
    * Determinism: each vᵢ·Δtᵢ is DECIMAL × integer-seconds, summed as
    * DECIMAL (order-free); only the final division is a double.
    * Scale: one window (user, day) + one hash agg — same key, so the
    * agg reuses the window's partitioning.
    */
  val twa = QueryDef(
    "q_twa",
    (s, d) => {
      val sec = expr("unix_micros(cast(ts as timestamp)) div 1000000")
      val w = Window.partitionBy(col("user_id"), col("day"))
        .orderBy(col("sec"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"),
          sec.as("sec"), col("event_id"), col("value"))
        .withColumn("dt", lead(col("sec"), 1).over(w) - col("sec"))
        .filter(col("dt").isNotNull)
        .groupBy("user_id", "day")
        .agg(
          round(sum(col("value").cast(D) * col("dt")).cast("double") /
            sum(col("dt")), 6).as("twa"),
          sum(col("dt")).as("span_sec"),
          (count(lit(1)) + 1).as("n_readings"))
        .filter(col("span_sec") > 0)
    },
    Some("""WITH e AS (SELECT user_id,
                              CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                              epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS sec,
                              event_id, value
                       FROM events),
            g AS (SELECT *, LEAD(sec) OVER (PARTITION BY user_id, day
                    ORDER BY sec, event_id) - sec AS dt FROM e)
            SELECT user_id, day,
                   ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4)) * dt) AS DOUBLE)
                     / SUM(dt), 6) AS twa,
                   CAST(SUM(dt) AS BIGINT) AS span_sec,
                   COUNT(*) + 1 AS n_readings
            FROM g WHERE dt IS NOT NULL
            GROUP BY user_id, day
            HAVING SUM(dt) > 0""")
  )

  /** Changepoint detection: sliding two-sample mean-shift scan over the
    * hourly mean series of each event type — at every hour, Welch-style
    * z between the 6 hours BEFORE and the 6 hours FROM that point; the
    * top-20 |z| rows are the level-shift candidates (deploy broke the
    * error rate, pricing change moved purchase values). The two-window
    * scan is the streaming-friendly changepoint recipe: unlike CUSUM it
    * has no unbounded recursion, so it is ONE window pass.
    *
    * Determinism across engines: the hourly means ride DECIMAL partials
    * and are rounded to 9 dp BEFORE the windows. The window-mean divide
    * is the subtle part: a sum of six 9-dp values divided by 6 lands on
    * an EXACT half at the 9th decimal whenever the scaled sum ≡ 3
    * (mod 6) — one row in six — and `round(double, 9)` then resolves
    * the tie from the double's representation error, which the two
    * engines build differently (Spark's double→DECIMAL cast is
    * shortest-repr-based, DuckDB's is binary-value-based; measured
    * 1-ulp split at sf0.1). So the window means ride scaled BIGINTs
    * (m·1e9, exact in both engines) with the half-up division done in
    * integer space, and the squared sums ride exact DECIMAL(19,9)²
    * products — every input to the z formula is bit-identical before
    * any double math happens. The ε=1e-9 under the sqrt guards the
    * constant-series case.
    *
    * Scale shape: one corpus-sized shuffle (the hourly agg, keyed by
    * (type, hour)); the window pass re-shuffles only the hourly series —
    * |types| × |hours| rows, thousands per year per series — partitioned
    * BY SERIES KEY, so a million-sensor deployment spreads across the
    * cluster and per-partition state is one series. TakeOrdered keeps
    * the top-20 without a global sort.
    */
  val changepoint = QueryDef(
    "q_changepoint",
    (s, d) => {
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
        .agg(round(sum(col("value").cast(DecimalType(28, 20))).cast("double") /
          count(lit(1)), 9).as("m"))
        .withColumn("msc", round(col("m") * lit(1e9)).cast("long"))
        .withColumn("m9", col("m").cast(DecimalType(19, 9)))
      val left = Window.partitionBy("event_type").orderBy("hr").rowsBetween(-6, -1)
      val right = Window.partitionBy("event_type").orderBy("hr").rowsBetween(0, 5)
      // half-up mean of six scaled-BIGINT values: integer-space tie-break,
      // then /1e9 (both operands exact in double → correctly rounded)
      def meanInt(w: org.apache.spark.sql.expressions.WindowSpec) = {
        val sc = sum(col("msc")).over(w)
        when(sc >= 0, floor((sc + lit(3)) / lit(6)))
          .otherwise(-floor((-sc + lit(3)) / lit(6)))
          .cast("double") / lit(1e9)
      }
      def sqsum(w: org.apache.spark.sql.expressions.WindowSpec) =
        sum(col("m9") * col("m9")).over(w).cast("double")
      val win = hourly
        .withColumn("nl", count(lit(1)).over(left))
        .withColumn("nr", count(lit(1)).over(right))
        .withColumn("ml", meanInt(left))
        .withColumn("mr", meanInt(right))
        .withColumn("sql_", sqsum(left))
        .withColumn("sqr_", sqsum(right))
      win.filter(col("nl") === 6 && col("nr") === 6)
        .select(col("event_type"), col("hr"),
          col("ml").as("mean_before"), col("mr").as("mean_after"),
          round((col("mr") - col("ml")) /
            sqrt((round((col("sql_") - col("ml") * col("ml") * lit(6)) / 5, 9) +
                  round((col("sqr_") - col("mr") * col("mr") * lit(6)) / 5, 9)) / 6
              + lit(0.000000001)), 6).as("shift_z"))
        .orderBy(abs(col("shift_z")).desc, col("event_type"), col("hr"))
        .limit(20)
    },
    Some("""WITH hourly AS (
              SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
                     ROUND(CAST(SUM(CAST(value AS DECIMAL(28,20))) AS DOUBLE)
                       / COUNT(*), 9) AS m
              FROM events GROUP BY 1, 2),
            scaled AS (
              SELECT event_type, hr, m,
                     CAST(ROUND(m * 1e9) AS BIGINT) AS msc,
                     CAST(m AS DECIMAL(19,9)) AS m9
              FROM hourly),
            win AS (
              SELECT event_type, hr,
                COUNT(*) OVER (PARTITION BY event_type ORDER BY hr
                  ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING) AS nl,
                COUNT(*) OVER (PARTITION BY event_type ORDER BY hr
                  ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING) AS nr,
                SUM(msc) OVER (PARTITION BY event_type ORDER BY hr
                  ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING) AS sl,
                SUM(msc) OVER (PARTITION BY event_type ORDER BY hr
                  ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING) AS sr,
                CAST(SUM(m9 * m9) OVER (
                  PARTITION BY event_type ORDER BY hr
                  ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING) AS DOUBLE) AS sql_,
                CAST(SUM(m9 * m9) OVER (
                  PARTITION BY event_type ORDER BY hr
                  ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING) AS DOUBLE) AS sqr_
              FROM scaled),
            mw AS (
              SELECT *,
                CASE WHEN sl >= 0 THEN FLOOR((sl + 3) / 6)
                     ELSE -FLOOR((-sl + 3) / 6) END / 1e9 AS ml,
                CASE WHEN sr >= 0 THEN FLOOR((sr + 3) / 6)
                     ELSE -FLOOR((-sr + 3) / 6) END / 1e9 AS mr
              FROM win)
            SELECT event_type, hr, ml AS mean_before, mr AS mean_after,
                   ROUND((mr - ml) / SQRT(
                     (ROUND((sql_ - ml * ml * 6) / 5, 9)
                      + ROUND((sqr_ - mr * mr * 6) / 5, 9)) / 6
                     + 0.000000001), 6) AS shift_z
            FROM mw WHERE nl = 6 AND nr = 6
            ORDER BY ABS(shift_z) DESC, event_type, hr
            LIMIT 20""")
  )

  /** Holt double exponential smoothing (level + trend) per user, with
    * 1-step and 3-step-ahead forecasts — the trend-aware upgrade of
    * [[ema]] (plain EMA lags any trending series; Holt's second
    * recurrence tracks the slope). α = 0.3, β = 0.2, init l₀ = x₀,
    * b₀ = 0.
    *
    * Like EMA, the recurrence is inherently sequential, so it is a
    * left fold over each user's time-ordered values — here with a
    * TWO-component accumulator (`aggregate` with a named_struct
    * state). Determinism is the EMA recipe: NO per-step rounding —
    * textually identical update expressions execute the same IEEE op
    * sequence in both engines, so the folds are bit-identical; only
    * the outputs round (6 dp). Two traps measured while building this:
    * per-step decimal rounding is actively WRONG (rounded state ×
    * 1-dp coefficients lands exactly on decimal rounding-boundary
    * ties, where the engines' double-round implementations differ by
    * 1 ulp), and DuckDB's `list_reduce` with a STRUCT accumulator
    * evaluates the result fields sequentially against a mutated
    * accumulator (the second field sees the first field's NEW value) —
    * so the oracle folds via a recursive CTE instead, whose semantics
    * are clean. Scale: state per user is one sorted array of its
    * history (the q_ema posture — a production deployment caps the
    * window); one hash shuffle by user.
    */
  val holtForecast = QueryDef(
    "q_holt_forecast",
    (s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(collect_list(struct(col("ts"), col("event_id"), col("value"))).as("evs"))
        .select(col("user_id"),
          expr("""aggregate(
                    slice(transform(array_sort(evs), e -> e.value), 2, size(evs) - 1),
                    named_struct('l', transform(array_sort(evs), e -> e.value)[0],
                                 'b', cast(0 as double)),
                    (acc, x) -> named_struct(
                      'l', x * cast(0.3 as double)
                             + (acc.l + acc.b) * cast(0.7 as double),
                      'b', ((x * cast(0.3 as double)
                               + (acc.l + acc.b) * cast(0.7 as double)) - acc.l)
                             * cast(0.2 as double)
                             + acc.b * cast(0.8 as double))
                  )""").as("st"),
          size(col("evs")).as("n_events"))
        .select(col("user_id"),
          expr("round(st.l, 6)").as("level"),
          expr("round(st.b, 6)").as("trend"),
          expr("round(st.l + st.b, 6)").as("fc_1"),
          expr("round(st.l + st.b * 3, 6)").as("fc_3"),
          col("n_events")),
    Some("""WITH RECURSIVE seq AS (
              SELECT user_id, value,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP), event_id) AS i
              FROM events),
            cnt AS (SELECT user_id, MAX(i) AS n,
                           CAST(COUNT(*) AS BIGINT) AS n_events
                    FROM seq GROUP BY user_id),
            rec AS (
              SELECT user_id, CAST(1 AS BIGINT) AS i, value AS l,
                     CAST(0 AS DOUBLE) AS b
              FROM seq WHERE i = 1
              UNION ALL
              SELECT r.user_id, r.i + 1,
                     s.value * CAST(0.3 AS DOUBLE)
                       + (r.l + r.b) * CAST(0.7 AS DOUBLE),
                     ((s.value * CAST(0.3 AS DOUBLE)
                         + (r.l + r.b) * CAST(0.7 AS DOUBLE)) - r.l)
                       * CAST(0.2 AS DOUBLE) + r.b * CAST(0.8 AS DOUBLE)
              FROM rec r JOIN seq s ON s.user_id = r.user_id AND s.i = r.i + 1)
            SELECT r.user_id, ROUND(r.l, 6) AS level, ROUND(r.b, 6) AS trend,
                   ROUND(r.l + r.b, 6) AS fc_1,
                   ROUND(r.l + r.b * 3, 6) AS fc_3,
                   c.n_events
            FROM rec r JOIN cnt c ON c.user_id = r.user_id AND r.i = c.n""")
  )

  /** Seasonal decomposition on the hour-of-week grid (STL-lite): the
    * hourly event-count series is decomposed into a 168-slot seasonal
    * profile (mean count per hour-of-week — the periodic component a
    * capacity planner or anomaly baseline uses) and a remainder, with
    * the VARIANCE-EXPLAINED seasonal strength
    * `1 − SS_resid / SS_tot` (Hyndman's seasonal-strength statistic)
    * attached to every row.
    *
    * Exactness without a second pass: per hour-of-week slot, ONE hash
    * agg collects (count, Σn, Σn²) as exact BIGINTs off the hourly
    * grain; within-group and total sums of squares then derive
    * closed-form (SS_tot = Σn² − (Σn)²/N, SS_resid = Σ_how within-
    * group SS), so the decomposition costs one agg + a 168-row
    * re-reduction. The 168-row second stage rides DECIMAL partials —
    * merge-order-free, oracle hash-matches. Scale: the corpus reduces
    * to hourly grain before anything else; the seasonal grid is O(168)
    * regardless of SF.
    */
  val seasonalDecompose = QueryDef(
    "q_seasonal_decompose",
    (s, d) => {
      val hourly = Tables.events(s, d)
        .filter(col("ts").isNotNull)
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("n"))
      val how = ((dayofweek(col("h")) - 1) * 24 + hour(col("h"))).as("how")
      val slots = hourly.select(how, col("n"))
        .groupBy("how")
        .agg(count(lit(1)).as("n_hours"),
          sum(col("n")).as("sn"),
          sum(col("n") * col("n")).as("snn"))
      // within-slot SS as a DECIMAL partial; totals re-derived from the
      // exact slot sums (168 rows)
      val tot = slots.agg(
        sum(col("n_hours")).as("nh"),
        sum(col("sn")).as("tsn"),
        sum(col("snn")).as("tsnn"),
        sum((col("snn").cast("double") -
          col("sn").cast("double") * col("sn").cast("double") /
            col("n_hours").cast("double")).cast(DecimalType(28, 12)))
          .as("ss_resid"))
      val ssTot = col("tsnn").cast("double") -
        col("tsn").cast("double") * col("tsn").cast("double") /
          col("nh").cast("double")
      val strength = tot.select(
        round(lit(1.0) - col("ss_resid").cast("double") / ssTot, 6)
          .as("seasonal_strength"))
      slots.crossJoin(broadcast(strength))
        .select(col("how").cast("int").as("how"), col("n_hours"),
          round(col("sn").cast("double") / col("n_hours").cast("double"), 6)
            .as("seasonal_mean"),
          col("seasonal_strength"))
    },
    Some("""WITH hourly AS (
              SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM events WHERE ts IS NOT NULL GROUP BY 1),
            slots AS (
              SELECT CAST(dayofweek(h) * 24 + EXTRACT(HOUR FROM h) AS BIGINT)
                       AS how,
                     CAST(COUNT(*) AS BIGINT) AS n_hours,
                     CAST(SUM(n) AS BIGINT) AS sn,
                     CAST(SUM(n * n) AS BIGINT) AS snn
              FROM hourly GROUP BY 1),
            tot AS (
              SELECT CAST(SUM(n_hours) AS BIGINT) AS nh,
                     CAST(SUM(sn) AS BIGINT) AS tsn,
                     CAST(SUM(snn) AS BIGINT) AS tsnn,
                     SUM(CAST(CAST(snn AS DOUBLE)
                           - CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE)
                             / CAST(n_hours AS DOUBLE)
                         AS DECIMAL(28,12))) AS ss_resid
              FROM slots),
            st AS (
              SELECT ROUND(1.0 - CAST(ss_resid AS DOUBLE)
                       / (CAST(tsnn AS DOUBLE)
                          - CAST(tsn AS DOUBLE) * CAST(tsn AS DOUBLE)
                            / CAST(nh AS DOUBLE)), 6) AS seasonal_strength
              FROM tot)
            SELECT CAST(how AS INT) AS how, n_hours,
                   ROUND(CAST(sn AS DOUBLE) / CAST(n_hours AS DOUBLE), 6)
                     AS seasonal_mean,
                   seasonal_strength
            FROM slots CROSS JOIN st""")
  )

  /** Autocorrelation function (lags 1..6) of each event type's hourly
    * count series, with the Ljung–Box portmanteau statistic — the
    * standard "is this series white noise / how much memory does it
    * carry" diagnostic that sits upstream of every forecasting choice
    * (an ACF that dies at lag 1 says plain EMA is enough; a spike at
    * 24 says the seasonal term in [[seasonalDecompose]] is doing real
    * work).
    *
    * Lag alignment runs on the DENSE hour grid (global span sequence-
    * exploded per type, missing hours fill 0) — lagging observed rows
    * would silently compare non-adjacent hours wherever an hour has no
    * events (sf0.01 has ~40 such holes per type).
    *
    * Exactness: every sufficient statistic is an integer. With S = Σx,
    * A/B the head/tail sums of each lag's pair window,
    * n²·Σ(x_t−x̄)(x_{t+k}−x̄) = n²·Σx_t·x_{t+k} − nS(A+B) + (n−k)S²
    * and n²·Σ(x−x̄)² = n²Σx² − nS², so acf_k is ONE double division of
    * two exact BIGINTs (round 6) — no float accumulation anywhere.
    * Ljung–Box reduces the 6 ROUNDED acf values through
    * DECIMAL(38,24) terms (merge-order-free) with the integer factor
    * n(n+2) applied last.
    *
    * Scale shape: one hash-agg to (type, hour) grain, a |types|-row
    * broadcast span, per-type windows on the bounded hourly grain
    * (never the corpus), and the lag unpivot is a 6× expansion of that
    * grain. At 100 TB the corpus reduces before anything sorts.
    */
  val acf = QueryDef(
    "q_acf",
    (s, d) => {
      val K = 6
      val ev = Tables.events(s, d).filter(col("ts").isNotNull)
      val hourly = ev
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("n"))
      val span = ev.agg(date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      val dense = hourly.select("event_type").distinct()
        .crossJoin(broadcast(span))
        .select(col("event_type"),
          explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("h"))
        .join(hourly, Seq("event_type", "h"), "left")
        .select(col("event_type"), col("h"),
          coalesce(col("n"), lit(0L)).as("x"))
      val w = Window.partitionBy("event_type").orderBy("h")
      val lagged = dense.select(
        Seq(col("event_type"), col("x")) ++
          (1 to K).map(k => lag(col("x"), k).over(w).as(s"x$k")): _*)
      val pairs = lagged.selectExpr("event_type", "x",
        s"stack($K, ${(1 to K).map(k => s"${k}L, x$k").mkString(", ")}) AS (lag_k, xl)")
      val byLag = pairs.filter(col("xl").isNotNull)
        .groupBy("event_type", "lag_k")
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("x") * col("xl")).as("sxy"),
          sum(col("xl")).as("sa"),
          sum(col("x")).as("sb"))
      val tot = dense.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sg"),
          sum(col("x") * col("x")).as("sxx"))
      val num = (col("n") * col("n") * col("sxy")
        - col("n") * col("sg") * (col("sa") + col("sb"))
        + (col("n") - col("lag_k")) * col("sg") * col("sg")).cast("double")
      val den = (col("n") * col("n") * col("sxx")
        - col("n") * col("sg") * col("sg")).cast("double")
      val scored = byLag.join(broadcast(tot), Seq("event_type"))
        .withColumn("acf", round(num / den, 6))
      val lb = scored
        .select(col("event_type"), col("n"),
          (col("acf") * col("acf") /
            (col("n") - col("lag_k")).cast("double"))
            .cast(DecimalType(38, 24)).as("term"))
        .groupBy("event_type")
        .agg(round((first(col("n")) * (first(col("n")) + 2)).cast("double") *
          sum(col("term")).cast("double"), 4).as("lb_q"))
      scored.join(broadcast(lb), Seq("event_type"))
        .select(col("event_type"), col("lag_k"), col("n_pairs"),
          col("acf"), col("lb_q"))
    },
    Some("""WITH ev AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts
                        FROM events WHERE ts IS NOT NULL),
            hourly AS (SELECT event_type, date_trunc('hour', ts) AS h,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM ev GROUP BY 1, 2),
            span AS (SELECT date_trunc('hour', MIN(ts)) AS h0,
                            date_trunc('hour', MAX(ts)) AS h1 FROM ev),
            grid AS (SELECT t.event_type,
                            unnest(generate_series(span.h0, span.h1,
                                                   INTERVAL 1 HOUR)) AS h
                     FROM (SELECT DISTINCT event_type FROM hourly) t
                     CROSS JOIN span),
            dense AS (SELECT g.event_type, g.h, COALESCE(hourly.n, 0) AS x
                      FROM grid g LEFT JOIN hourly
                        ON hourly.event_type = g.event_type AND hourly.h = g.h),
            lagged AS (SELECT event_type, x,
                              lag(x, 1) OVER w AS x1, lag(x, 2) OVER w AS x2,
                              lag(x, 3) OVER w AS x3, lag(x, 4) OVER w AS x4,
                              lag(x, 5) OVER w AS x5, lag(x, 6) OVER w AS x6
                       FROM dense
                       WINDOW w AS (PARTITION BY event_type ORDER BY h)),
            pairs AS (
              SELECT event_type, CAST(1 AS BIGINT) AS lag_k, x, x1 AS xl FROM lagged
              UNION ALL SELECT event_type, 2, x, x2 FROM lagged
              UNION ALL SELECT event_type, 3, x, x3 FROM lagged
              UNION ALL SELECT event_type, 4, x, x4 FROM lagged
              UNION ALL SELECT event_type, 5, x, x5 FROM lagged
              UNION ALL SELECT event_type, 6, x, x6 FROM lagged),
            bylag AS (SELECT event_type, lag_k,
                             CAST(COUNT(*) AS BIGINT) AS n_pairs,
                             CAST(SUM(x * xl) AS BIGINT) AS sxy,
                             CAST(SUM(xl) AS BIGINT) AS sa,
                             CAST(SUM(x) AS BIGINT) AS sb
                      FROM pairs WHERE xl IS NOT NULL GROUP BY 1, 2),
            tot AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                           CAST(SUM(x) AS BIGINT) AS sg,
                           CAST(SUM(x * x) AS BIGINT) AS sxx
                    FROM dense GROUP BY 1),
            scored AS (SELECT b.event_type, b.lag_k, b.n_pairs, t.n,
                              ROUND(CAST(t.n * t.n * b.sxy
                                         - t.n * t.sg * (b.sa + b.sb)
                                         + (t.n - b.lag_k) * t.sg * t.sg
                                    AS DOUBLE)
                                    / CAST(t.n * t.n * t.sxx
                                           - t.n * t.sg * t.sg AS DOUBLE),
                                    6) AS acf
                       FROM bylag b JOIN tot t USING (event_type)),
            lb AS (SELECT event_type,
                          ROUND(CAST(MIN(n) * (MIN(n) + 2) AS DOUBLE) *
                            CAST(SUM(CAST(acf * acf / CAST(n - lag_k AS DOUBLE)
                                     AS DECIMAL(38,24))) AS DOUBLE), 4) AS lb_q
                   FROM scored GROUP BY 1)
            SELECT s.event_type, s.lag_k, s.n_pairs, s.acf, l.lb_q
            FROM scored s JOIN lb l USING (event_type)""")
  )

  def all: Seq[QueryDef] =
    Seq(ema, trendClassify, pipelineReplay, anomalyEvents, gapFill, twa,
      changepoint, holtForecast, seasonalDecompose, acf)
}
