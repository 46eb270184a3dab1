package graft.queries

import graft.{QueryDef, Tables}
import graft.util.{Exact, Sql}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series / window-function inventory over the `events` table
  * (SURVEY.md §2.5 W1–W7, §2.4 time-bucket aggs, §2.9 sessionization,
  * §3.3 dashboard surface).
  *
  * events(event_id, ts, user_id, event_type, value, props) stands in for
  * the reference's sensor-reading stream: user_id ~ sensor_id,
  * event_type ~ sensor_type, value ~ reading.
  *
  * Determinism notes:
  *  - window order is always (ts, event_id) — event_id breaks µs ties;
  *  - all window sums/avgs go through DECIMAL(18,4) (order-independent);
  *  - the oracle casts ts ns→µs to match Spark's truncation.
  *
  * Scale notes: every window here partitions by user_id — at 100 TB that
  * is one shuffle keyed by user, then in-partition sorts; range frames
  * order by a numeric epoch-seconds key (SURVEY §7.4 risk 1).
  */
object Events {

  private val D = Exact.D

  /** Per-user window ordered by time (event_id tiebreak). */
  private def wUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))

  /** Oracle-side: ts truncated to µs exactly like Tables.events. */
  private val OTS = "CAST(ts AS TIMESTAMP)"
  /** Oracle-side epoch seconds (floor), = Spark's `div 1000000`. */
  private val OSEC = s"epoch_us($OTS) // 1000000"
  private val OWIN = s"PARTITION BY user_id ORDER BY $OTS, event_id"

  /** Spark-side epoch seconds as long (floor division, exact). */
  private def sec: Column = expr("unix_micros(cast(ts as timestamp)) div 1000000")

  /** W1 — rolling 24-row stats per user (avg/min/max/count).
    * Ref: spark_etl.py:109-116.
    */
  val windowRolling = QueryDef(
    "q_window_rolling",
    (s, d) => {
      val w = wUser.rowsBetween(-23, 0)
      Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        (sum(col("value").cast(D)).over(w).cast("double") /
          count(lit(1)).over(w)).as("rolling_avg"),
        min(col("value")).over(w).as("rolling_min"),
        max(col("value")).over(w).as("rolling_max"),
        count(lit(1)).over(w).as("rolling_n"))
    },
    Some(s"""SELECT event_id, user_id,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
               / COUNT(*) OVER w AS rolling_avg,
             MIN(value) OVER w AS rolling_min,
             MAX(value) OVER w AS rolling_max,
             COUNT(*) OVER w AS rolling_n
             FROM events
             WINDOW w AS ($OWIN ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)""")
  )

  /** W2 — multi-horizon RANGE windows over epoch seconds, FULL reference
    * breadth: 5 horizons (1h/6h/24h/7d/30d) × 5 stats (count/avg/std/
    * min/max) = 25 window columns (enhanced_spark_etl.py:259-278).
    * SURVEY §7.4 risk 1 — range frames need a numeric order key, so we
    * order by epoch seconds. All 5 frames share ONE partitioning and
    * ONE sort: Spark plans 5 Window operators back-to-back over a
    * single Exchange + Sort (PlanSpec locks this in) — the 25 columns
    * cost one shuffle, not five.
    */
  private val rangeHorizons =
    Seq("1h" -> 3600L, "6h" -> 21600L, "24h" -> 86400L,
      "7d" -> 604800L, "30d" -> 2592000L)

  val windowRange = QueryDef(
    "q_window_range",
    (s, d) => {
      val base = Tables.events(s, d).withColumn("sec", sec)
      val cols = rangeHorizons.flatMap { case (label, secs) =>
        val w = Window.partitionBy("user_id").orderBy(col("sec"))
          .rangeBetween(-secs, 0)
        val n   = count(lit(1)).over(w)
        val nd  = n.cast("double")
        val sw  = sum(col("value").cast(D)).over(w).cast("double")
        val ssq = sum(col("value").cast(D) * col("value").cast(D)).over(w).cast("double")
        Seq(
          n.as(s"n_$label"),
          (sw / n).as(s"avg_$label"),
          when(n > 1, sqrt(greatest((ssq - sw * sw / nd) / (nd - lit(1.0)), lit(0.0))))
            .as(s"std_$label"),
          min(col("value")).over(w).as(s"min_$label"),
          max(col("value")).over(w).as(s"max_$label"))
      }
      base.select(col("event_id") +: col("user_id") +: cols: _*)
    },
    Some {
      val duckCols = rangeHorizons.map { case (label, _) =>
        val over = s"OVER w_$label"
        val n    = s"COUNT(*) $over"
        val nd   = s"CAST($n AS DOUBLE)"
        val sw   = s"CAST(SUM(CAST(value AS DECIMAL(18,4))) $over AS DOUBLE)"
        val ssq  = s"CAST(SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) $over AS DOUBLE)"
        s"""$n AS n_$label,
           $sw / $n AS avg_$label,
           CASE WHEN $n > 1
                THEN SQRT(GREATEST(($ssq - $sw * $sw / $nd) / ($nd - 1.0), 0.0))
                END AS std_$label,
           MIN(value) $over AS min_$label,
           MAX(value) $over AS max_$label"""
      }.mkString(",\n")
      val duckWins = rangeHorizons.map { case (label, secs) =>
        s"""w_$label AS (PARTITION BY user_id ORDER BY sec
                         RANGE BETWEEN $secs PRECEDING AND CURRENT ROW)"""
      }.mkString(",\n")
      s"""WITH e AS (SELECT event_id, user_id, value, $OSEC AS sec FROM events)
          SELECT event_id, user_id,
          $duckCols
          FROM e
          WINDOW $duckWins"""
    }
  )

  /** W3/W4 — lag/lead features + diff + pct_change.
    * Ref: spark_etl.py:119-124; enhanced_spark_etl.py:280-287,466-468.
    */
  val windowLagLead = QueryDef(
    "q_window_lag_lead",
    (s, d) =>
      Tables.events(s, d).select(
        col("event_id"), col("user_id"), col("value"),
        lag(col("value"), 1).over(wUser).as("prev_value"),
        lag(col("value"), 6).over(wUser).as("prev6_value"),
        lag(col("value"), 24).over(wUser).as("prev24_value"),
        lag(col("value"), 168).over(wUser).as("prev168_value"),
        lead(col("value"), 1).over(wUser).as("next_value"),
        (col("value") - lag(col("value"), 1).over(wUser)).as("diff_1"),
        round(
          when(lag(col("value"), 1).over(wUser) =!= 0.0,
            (col("value") - lag(col("value"), 1).over(wUser)) * 100.0 /
              lag(col("value"), 1).over(wUser)), 6).as("pct_change")),
    Some(s"""SELECT event_id, user_id, value,
             LAG(value, 1) OVER w AS prev_value,
             LAG(value, 6) OVER w AS prev6_value,
             LAG(value, 24) OVER w AS prev24_value,
             LAG(value, 168) OVER w AS prev168_value,
             LEAD(value, 1) OVER w AS next_value,
             value - LAG(value, 1) OVER w AS diff_1,
             ROUND(CASE WHEN LAG(value, 1) OVER w <> 0.0
                   THEN (value - LAG(value, 1) OVER w) * 100.0 / LAG(value, 1) OVER w
                   END, 6) AS pct_change
             FROM events WINDOW w AS ($OWIN)""")
  )

  /** W5 — z-score against per-type global stats (broadcast join back).
    * Ref: spark_etl.py:87-99,126-133. The stats side is tiny → broadcast;
    * at 100 TB the fact side never shuffles for this join.
    */
  val zscore = QueryDef(
    "q_zscore",
    (s, d) => {
      val e = Tables.events(s, d)
      val stats = e.groupBy("event_type")
        .agg(Exact.davg(col("value")).as("mean_val"),
          Exact.dstddev(col("value")).as("std_val"))
      e.join(broadcast(stats), "event_type")
        .select(
          col("event_id"), col("event_type"),
          round(when(col("std_val") > 0.0,
            (col("value") - col("mean_val")) / col("std_val")).otherwise(0.0), 6)
            .as("z_score"))
        .withColumn("is_outlier", (abs(col("z_score")) > 2.0).cast("int"))
    },
    Some(s"""WITH stats AS (
               SELECT event_type, ${Sql.AVGD("value")} AS mean_val,
                      ${Sql.STDDEVD("value")} AS std_val
               FROM events GROUP BY event_type)
             SELECT event_id, e.event_type,
                    ROUND(CASE WHEN std_val > 0.0
                          THEN (value - mean_val) / std_val ELSE 0.0 END, 6) AS z_score,
                    CASE WHEN ABS(ROUND(CASE WHEN std_val > 0.0
                         THEN (value - mean_val) / std_val ELSE 0.0 END, 6)) > 2.0
                         THEN 1 ELSE 0 END AS is_outlier
             FROM events e JOIN stats USING (event_type)""")
  )

  /** W6 — last value per group via max_by (decorrelated LATERAL).
    * Ref: enhanced_data_schema.sql:421-433 (J6/W6).
    */
  val lastPerGroup = QueryDef(
    "q_last_per_group",
    (s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(
          max_by(col("value"),
            format_string("%020d-%010d",
              expr("unix_micros(cast(ts as timestamp))"), col("event_id"))).as("last_value"),
          max(col("ts")).as("last_ts"),
          min(col("ts")).as("first_ts"),
          count(lit(1)).as("n_events")),
    Some(s"""SELECT user_id,
             arg_max(value, printf('%020d-%010d', epoch_us($OTS), event_id)) AS last_value,
             MAX($OTS) AS last_ts, MIN($OTS) AS first_ts,
             COUNT(*) AS n_events
             FROM events GROUP BY user_id""")
  )

  /** P11 keyed dedup — keep latest full row per user via row_number.
    * Ref: data_validator.py:406-415 (dedup key), made deterministic.
    */
  val dedupLatest = QueryDef(
    "q_dedup_latest",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_id", "event_type", "value")
    },
    Some(s"""SELECT user_id, event_id, event_type, value FROM events
             QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY $OTS DESC, event_id DESC) = 1""")
  )

  /** Ranking — top-3 values per event_type (row_number + rank + dense_rank). */
  val rankTop3 = QueryDef(
    "q_rank_top3",
    (s, d) => {
      val w = Window.partitionBy("event_type").orderBy(desc("value"), asc("event_id"))
      Tables.events(s, d)
        .select(
          col("event_type"), col("event_id"), col("value"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rk"),
          dense_rank().over(w).as("drk"))
        .filter(col("rn") <= 3)
    },
    Some("""SELECT event_type, event_id, value,
            ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rk, DENSE_RANK() OVER w AS drk
            FROM events
            WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id ASC)
            QUALIFY ROW_NUMBER() OVER w <= 3""")
  )

  /** A2/A24 — time-bucket aggregation (hourly per type).
    * Ref: spark_etl.py:149-161; app.py:140-151.
    */
  val hourlyAgg = QueryDef(
    "q_hourly_agg",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(
          date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour_start"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          Exact.dsum(col("value")).as("sum_value"),
          Exact.davg(col("value")).as("avg_value"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value")),
    Some(s"""SELECT DATE_TRUNC('hour', $OTS) AS hour_start, event_type,
             COUNT(*) AS n, ${Sql.SUMD("value")} AS sum_value,
             ${Sql.AVGD("value")} AS avg_value,
             MIN(value) AS min_value, MAX(value) AS max_value
             FROM events GROUP BY 1, 2""")
  )

  /** A10 — exact percentiles per group (reference uses percentile_approx;
    * exact `percentile` here so the oracle matches — at 100 TB swap to
    * approx_percentile). Ref: enhanced_spark_etl.py:548-557.
    */
  val percentiles = QueryDef(
    "q_percentiles",
    (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          round(expr("percentile(value, 0.25)"), 6).as("p25"),
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.75)"), 6).as("p75"),
          round(expr("percentile(value, 0.95)"), 6).as("p95")),
    Some("""SELECT event_type,
            ROUND(quantile_cont(value, 0.25), 6) AS p25,
            ROUND(quantile_cont(value, 0.5), 6) AS p50,
            ROUND(quantile_cont(value, 0.75), 6) AS p75,
            ROUND(quantile_cont(value, 0.95), 6) AS p95
            FROM events GROUP BY event_type""")
  )

  /** A10 at scale — quantile SKETCH per group. Exact `percentile`
    * buffers every value per group; at 100 TB the answer should come
    * from a fixed-size merge-able summary. Spark's `approx_percentile`
    * (KLL-ish) can't be oracle-matched (engine-specific internals), so
    * this demonstrates the same posture with a PORTABLE sketch: a
    * 64-bin equi-width histogram. State per group is ≤ 64 (bin, count)
    * pairs — counts merge associatively across partitions (map-side
    * partial agg reduces each partition before the shuffle) — and the
    * quantile is read off the cumulative histogram with linear
    * interpolation inside the containing bin. Two corpus passes
    * (min/max bounds, then binning) is the honest batch cost; a
    * production stream would fold bounds into the same pass with a
    * fixed domain. All arithmetic is integer counts + one final
    * per-row double expression evaluated in the same order by both
    * engines, so results are bit-identical with no DECIMAL machinery.
    */
  val quantileSketch = QueryDef(
    "q_quantile_sketch",
    (s, d) => {
      val B = 64
      val ev = Tables.events(s, d).select(col("event_type"), col("value"))
      val bounds = ev.groupBy("event_type")
        .agg(min(col("value")).as("mn"), max(col("value")).as("mx"),
          count(lit(1)).as("n"))
      val hist = ev.join(broadcast(bounds), Seq("event_type"))
        .select(col("event_type"), col("mn"), col("mx"), col("n"),
          least(lit(B - 1),
            floor((col("value") - col("mn")) / (col("mx") - col("mn")) * B))
            .cast("int").as("bin"))
        .groupBy("event_type", "mn", "mx", "n", "bin")
        .agg(count(lit(1)).as("c"))
      val cum = hist.withColumn("cumc",
        sum(col("c")).over(Window.partitionBy("event_type").orderBy("bin")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // target rank q*n lands in the first bin whose cumulative count
      // reaches it; interpolate within that bin
      val target = col("q") * col("n")
      cum
        .select(col("*"),
          explode(array(lit(0.5), lit(0.9), lit(0.99))).as("q"))
        .filter(col("cumc") >= target && (col("cumc") - col("c")) < target)
        .select(col("event_type"), col("q"),
          round(col("mn") +
            (col("bin") + (target - (col("cumc") - col("c"))) / col("c")) *
              (col("mx") - col("mn")) / B, 6).as("est"))
    },
    Some("""WITH ev AS (SELECT event_type, value FROM events),
            b AS (SELECT event_type, MIN(value) AS mn, MAX(value) AS mx,
                         COUNT(*) AS n
                  FROM ev GROUP BY 1),
            hist AS (SELECT event_type, mn, mx, n,
                            LEAST(63, CAST(FLOOR((value - mn)/(mx - mn) * 64)
                                           AS INT)) AS bin,
                            COUNT(*) AS c
                     FROM ev JOIN b USING (event_type)
                     GROUP BY 1, 2, 3, 4, 5),
            cum AS (SELECT *, SUM(c) OVER (PARTITION BY event_type ORDER BY bin
                      ROWS UNBOUNDED PRECEDING) AS cumc
                    FROM hist)
            SELECT event_type, q,
                   ROUND(mn + (bin + (q*n - (cumc - c))/c) * (mx - mn)/64, 6)
                     AS est
            FROM cum CROSS JOIN (SELECT CAST(uq AS DOUBLE) AS q
                                 FROM (VALUES (0.5),(0.9),(0.99)) v(uq)) qs
            WHERE cumc >= q*n AND (cumc - c) < q*n""")
  )

  /** Winsorized aggregation: per-type p05/p95 bounds, values clamped
    * into [lo, hi], then the robust mean — outlier-resistant KPIs
    * without dropping rows. Bounds come from exact `percentile` here
    * (oracle-matched; `q_quantile_sketch` is the documented sketch path
    * for the same bounds at 100 TB), broadcast back so the clamp pass
    * is map-only; clamp values are exact decimal sums.
    */
  val winsorize = QueryDef(
    "q_winsorize",
    (s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"), col("value"))
      val bounds = ev.groupBy("event_type").agg(
        round(expr("percentile(value, 0.05)"), 2).as("lo"),
        round(expr("percentile(value, 0.95)"), 2).as("hi"))
      val clipped = greatest(col("lo"), least(col("hi"), col("value")))
      ev.join(broadcast(bounds), Seq("event_type"))
        .groupBy("event_type", "lo", "hi")
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("value") < col("lo"), 1L).otherwise(0L)).as("n_clip_lo"),
          sum(when(col("value") > col("hi"), 1L).otherwise(0L)).as("n_clip_hi"),
          round(Exact.dsum(clipped) / count(lit(1)), 6).as("wins_mean"))
    },
    Some(s"""WITH b AS (SELECT event_type,
                               ROUND(quantile_cont(value, 0.05), 2) AS lo,
                               ROUND(quantile_cont(value, 0.95), 2) AS hi
                        FROM events GROUP BY 1)
             SELECT e.event_type, lo, hi, COUNT(*) AS n,
                    CAST(SUM(CASE WHEN value < lo THEN 1 ELSE 0 END) AS BIGINT)
                      AS n_clip_lo,
                    CAST(SUM(CASE WHEN value > hi THEN 1 ELSE 0 END) AS BIGINT)
                      AS n_clip_hi,
                    ROUND(${Sql.SUMD("GREATEST(lo, LEAST(hi, value))")}
                      / COUNT(*), 6) AS wins_mean
             FROM events e JOIN b USING (event_type)
             GROUP BY 1, 2, 3""")
  )

  /** Median/MAD robust outlier summary per type: med = p50, MAD = p50
    * of |v − med|, outlier ⇔ |v − med| > 3·1.4826·MAD. The
    * mean/stddev z-score (`q_zscore`) breaks when outliers inflate σ;
    * MAD has a 50% breakdown point — this is the statistically honest
    * version of the reference's outlier rule. Two percentile passes
    * with the tiny per-type stats broadcast back between them; the
    * flagging pass is map-only.
    */
  val madOutliers = QueryDef(
    "q_mad_outliers",
    (s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"), col("value"))
      val med = ev.groupBy("event_type")
        .agg(round(expr("percentile(value, 0.5)"), 2).as("med"))
      val mad = ev.join(broadcast(med), Seq("event_type"))
        .groupBy("event_type", "med")
        .agg(round(expr("percentile(abs(value - med), 0.5)"), 2).as("mad"))
      ev.join(broadcast(mad), Seq("event_type"))
        .groupBy("event_type", "med", "mad")
        .agg(count(lit(1)).as("n"),
          sum(when(abs(col("value") - col("med")) >
            lit(3.0) * lit(1.4826) * col("mad"), 1L).otherwise(0L))
            .as("n_outliers"))
        .select(col("event_type"), col("med"), col("mad"), col("n"),
          col("n_outliers"),
          round(col("n_outliers").cast("double") / col("n"), 6)
            .as("outlier_frac"))
    },
    Some("""WITH med AS (SELECT event_type,
                                ROUND(quantile_cont(value, 0.5), 2) AS med
                         FROM events GROUP BY 1),
            mad AS (SELECT e.event_type, med,
                           ROUND(quantile_cont(abs(value - med), 0.5), 2) AS mad
                    FROM events e JOIN med USING (event_type)
                    GROUP BY 1, 2)
            SELECT e.event_type, med, mad, COUNT(*) AS n,
                   CAST(SUM(CASE WHEN abs(value - med) > 3.0 * 1.4826 * mad
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
                   ROUND(CAST(SUM(CASE WHEN abs(value - med) > 3.0 * 1.4826 * mad
                                       THEN 1 ELSE 0 END) AS DOUBLE)
                     / COUNT(*), 6) AS outlier_frac
            FROM events e JOIN mad USING (event_type)
            GROUP BY 1, 2, 3""")
  )

  /** Seasonal adjustment: subtract each type's hour-of-day profile
    * mean from every reading — the deseasonalized residual feeding any
    * anomaly detector. Profile means are exact DECIMAL averages over a
    * ≤ types×24-row table broadcast back; the residual pass is
    * map-only.
    */
  val seasonalAdjust = QueryDef(
    "q_seasonal_adjust",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("event_type"),
          hour(col("ts")).as("hod"), col("value"))
      val profile = ev.groupBy("event_type", "hod")
        .agg(round(Exact.davg(col("value")), 6).as("s_mean"))
      ev.join(broadcast(profile), Seq("event_type", "hod"))
        .select(col("event_id"), col("event_type"), col("hod"), col("value"),
          col("s_mean"), round(col("value") - col("s_mean"), 6).as("resid"))
    },
    Some(s"""WITH e AS (SELECT event_id, event_type,
                               EXTRACT(hour FROM $OTS) AS hod, value
                        FROM events),
             p AS (SELECT event_type, hod,
                          ROUND(${Sql.AVGD("value")}, 6) AS s_mean
                   FROM e GROUP BY 1, 2)
             SELECT event_id, e.event_type, e.hod, value, s_mean,
                    ROUND(value - s_mean, 6) AS resid
             FROM e JOIN p USING (event_type, hod)""")
  )

  /** Cohort retention: users grouped by first-activity day, activity
    * counted per (cohort, day-offset) — the classic retention triangle.
    * Scale: one (user, day) dedup agg, one min-day agg, one join on
    * user_id (both sides already reduced to user granularity), one
    * final agg. All integers.
    */
  val cohortRetention = QueryDef(
    "q_cohort_retention",
    (s, d) => {
      val activity = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val cohort = activity.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
      activity.join(cohort, Seq("user_id"))
        .groupBy(col("cohort_day"), datediff(col("day"), col("cohort_day")).as("offset_days"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    },
    Some("""WITH activity AS (SELECT DISTINCT user_id,
                                     CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
                              FROM events),
            cohort AS (SELECT user_id, MIN(day) AS cohort_day
                       FROM activity GROUP BY 1)
            SELECT cohort_day, day - cohort_day AS offset_days,
                   COUNT(DISTINCT user_id) AS n_users
            FROM activity JOIN cohort USING (user_id)
            GROUP BY 1, 2""")
  )

  /** NTILE decile banding per event type (order ties broken by
    * event_id so both engines see one total order), re-aggregated to
    * per-decile bounds — the value-distribution profile behind
    * quality-score banding. One window + one hash agg on the same keys.
    */
  val ntileDeciles = QueryDef(
    "q_ntile_deciles",
    (s, d) => {
      val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
      Tables.events(s, d)
        .select(col("event_type"), col("value"), col("event_id"))
        .withColumn("decile", ntile(10).over(w))
        .groupBy("event_type", "decile")
        .agg(count(lit(1)).as("n"),
          min(col("value")).as("lo"), max(col("value")).as("hi"))
    },
    Some("""SELECT event_type, decile, COUNT(*) AS n,
                   MIN(value) AS lo, MAX(value) AS hi
            FROM (SELECT event_type, value,
                         NTILE(10) OVER (PARTITION BY event_type
                                         ORDER BY value, event_id) AS decile
                  FROM events)
            GROUP BY 1, 2""")
  )

  /** Ordered funnel: view → click → purchase, each stage's timestamp
    * constrained to follow the previous stage's first occurrence.
    * Stage tables reduce to one row per user before each join, so the
    * chain is three user-keyed joins of shrinking sets + three scalar
    * counts — no pair blowup, no global ordering.
    */
  val funnel = QueryDef(
    "q_funnel",
    (s, d) => {
      val e = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), sec.as("sec"))
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("sec")).as("v_sec"))
      val c = e.filter(col("event_type") === "click").join(v, Seq("user_id"))
        .filter(col("sec") >= col("v_sec"))
        .groupBy("user_id").agg(min(col("sec")).as("c_sec"))
      val p = e.filter(col("event_type") === "purchase").join(c, Seq("user_id"))
        .filter(col("sec") >= col("c_sec"))
        .groupBy("user_id").agg(min(col("sec")).as("p_sec"))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_click")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchase")))
        .select(col("n_view"), col("n_click"), col("n_purchase"),
          round(col("n_click").cast("double") / col("n_view"), 6).as("view_to_click"),
          round(col("n_purchase").cast("double") / col("n_click"), 6).as("click_to_purchase"))
    },
    Some(s"""WITH e AS (SELECT user_id, event_type, $OSEC AS sec FROM events),
             v AS (SELECT user_id, MIN(sec) AS v_sec FROM e
                   WHERE event_type = 'view' GROUP BY 1),
             c AS (SELECT e.user_id, MIN(sec) AS c_sec
                   FROM e JOIN v USING (user_id)
                   WHERE event_type = 'click' AND sec >= v_sec GROUP BY 1),
             p AS (SELECT e.user_id, MIN(sec) AS p_sec
                   FROM e JOIN c USING (user_id)
                   WHERE event_type = 'purchase' AND sec >= c_sec GROUP BY 1)
             SELECT (SELECT COUNT(*) FROM v) AS n_view,
                    (SELECT COUNT(*) FROM c) AS n_click,
                    (SELECT COUNT(*) FROM p) AS n_purchase,
                    ROUND(CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
                      / (SELECT COUNT(*) FROM v), 6) AS view_to_click,
                    ROUND(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
                      / (SELECT COUNT(*) FROM c), 6) AS click_to_purchase""")
  )

  /** §2.9 — batch sessionization: 30-min-gap sessions per user with
    * start/end/duration (the fact_anomaly_events shape,
    * enhanced_data_schema.sql:325-360). Streaming variant lives in
    * graft.streaming (flatMapGroupsWithState).
    */
  val sessionize = QueryDef(
    "q_sessionize",
    (s, d) => {
      val gap = 1800L
      val base = Tables.events(s, d).withColumn("sec", sec)
      val brk = when(col("sec") - lag(col("sec"), 1).over(wUser) > gap, 1).otherwise(0)
      base
        .withColumn("brk", brk)
        .withColumn("session_idx",
          sum(col("brk")).over(wUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_idx")
        .agg(
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"),
          (max(col("sec")) - min(col("sec"))).as("duration_sec"))
    },
    Some(s"""WITH e AS (SELECT user_id, event_id, $OTS AS ts, $OSEC AS sec FROM events),
             g AS (SELECT *, CASE WHEN sec - LAG(sec) OVER w > 1800 THEN 1 ELSE 0 END AS brk
                   FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             sx AS (SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx FROM g)
             SELECT user_id, session_idx, MIN(ts) AS session_start, MAX(ts) AS session_end,
                    COUNT(*) AS n_events, MAX(sec) - MIN(sec) AS duration_sec
             FROM sx GROUP BY user_id, session_idx""")
  )

  /** Interval-overlap join: user sessions (gap-1800 s, the
    * `q_sessionize` derivation) × daily 02:00–04:00 maintenance
    * windows — which sessions were exposed to maintenance, and for how
    * long. The genuinely-interval join family (both sides are ranges),
    * done the scale-correct way: each session explodes into the DAYS
    * it covers (≤ span, typically 1–2), the join is pure EQUI on day
    * with the exact half-open overlap predicate inside, and overlap
    * seconds are min(ends) − max(starts). The quadratic
    * session×window theta join never runs; DuckDB's oracle IS that
    * theta join, proving the bucketed plan equivalent.
    */
  val intervalOverlap = QueryDef(
    "q_interval_overlap",
    (s, d) => {
      val gap = 1800L
      val base = Tables.events(s, d).withColumn("sec", sec)
      val brk = when(col("sec") - lag(col("sec"), 1).over(wUser) > gap, 1).otherwise(0)
      val sess = base
        .withColumn("brk", brk)
        .withColumn("session_idx",
          sum(col("brk")).over(wUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_idx")
        .agg(min(col("sec")).as("s0"), max(col("sec")).as("s1"))
      val dayLen = 86400L
      val exploded = sess.select(col("*"),
        explode(sequence(expr(s"s0 div $dayLen"),
          expr(s"s1 div $dayLen"))).as("day"))
      val w0 = col("day") * dayLen + 7200L   // 02:00
      val w1 = col("day") * dayLen + 14400L  // 04:00
      exploded
        .filter(col("s0") < w1 && w0 <= col("s1"))
        .select(col("day"), col("user_id"), col("session_idx"),
          (least(col("s1"), w1 - 1) - greatest(col("s0"), w0) + 1)
            .as("overlap_sec"))
        .groupBy("day")
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("overlap_sec")).as("overlap_sec_total"))
    },
    Some(s"""WITH e AS (SELECT user_id, event_id, $OTS AS ts, $OSEC AS sec FROM events),
             g AS (SELECT *, CASE WHEN sec - LAG(sec) OVER w > 1800 THEN 1 ELSE 0 END AS brk
                   FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             sx AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                             ROWS UNBOUNDED PRECEDING) AS session_idx FROM g),
             sess AS (SELECT user_id, session_idx, MIN(sec) AS s0, MAX(sec) AS s1
                      FROM sx GROUP BY user_id, session_idx),
             days AS (SELECT DISTINCT sec // 86400 AS day FROM e),
             win AS (SELECT day, day*86400 + 7200 AS w0, day*86400 + 14400 AS w1
                     FROM days)
             SELECT day, COUNT(*) AS n_sessions,
                    CAST(SUM(LEAST(s1, w1 - 1) - GREATEST(s0, w0) + 1) AS BIGINT)
                      AS overlap_sec_total
             FROM sess JOIN win ON s0 < w1 AND w0 <= s1
             GROUP BY day""")
  )

  /** A8 — freshness/staleness vs dataset max ts (scalar subquery).
    * Ref: enhanced_spark_etl.py:172-183; data_validator freshness decay.
    */
  val freshness = QueryDef(
    "q_freshness",
    (s, d) => {
      Tables.registerViews(s, d)
      s.sql(s"""SELECT event_type,
                ROUND(AVG((asof_us - unix_micros(cast(ts as timestamp))) / 3600e6), 6) AS avg_age_h,
                ROUND(MAX((asof_us - unix_micros(cast(ts as timestamp))) / 3600e6), 6) AS max_age_h,
                SUM(CASE WHEN asof_us - unix_micros(cast(ts as timestamp)) > 86400e6 * 7
                    THEN 1 ELSE 0 END) AS n_stale
                FROM events
                CROSS JOIN (SELECT MAX(unix_micros(cast(ts as timestamp))) AS asof_us FROM events)
                GROUP BY event_type""")
    },
    Some(s"""SELECT event_type,
             ROUND(AVG((asof_us - epoch_us($OTS)) / 3600e6), 6) AS avg_age_h,
             ROUND(MAX((asof_us - epoch_us($OTS)) / 3600e6), 6) AS max_age_h,
             CAST(SUM(CASE WHEN asof_us - epoch_us($OTS) > 86400e6 * 7
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_stale
             FROM events
             CROSS JOIN (SELECT MAX(epoch_us($OTS)) AS asof_us FROM events)
             GROUP BY event_type""")
  )

  /** §3.3 /api/metrics — dashboard scalar KPIs over the trailing 7 days
    * (relative to data max, so deterministic). Ref: app.py:21-73.
    * Serves from the gold layer's materialized 7-day slice
    * ([[graft.warehouse.GoldStage.recent]]); user_id is in the rollup
    * grain, so the distinct count re-derives exactly.
    */
  val dashMetrics = QueryDef(
    "q_dash_metrics",
    (s, d) => {
      val g = graft.warehouse.GoldStage.recent(s, d)
      val n = sum(col("n"))
      val nerr = sum(when(col("event_type") === "error", col("n")).otherwise(lit(0L)))
      g.agg(
        n.as("n_recent"),
        countDistinct(col("user_id")).as("n_users"),
        round(nerr * lit(100.0) / n, 6).as("error_rate_pct"),
        sum(when(col("event_type") === "purchase", col("n")).otherwise(lit(0L)))
          .as("n_purchases"))
    },
    Some(s"""SELECT COUNT(*) AS n_recent,
             COUNT(DISTINCT user_id) AS n_users,
             ROUND(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 100.0
                   / COUNT(*), 6) AS error_rate_pct,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases
             FROM events
             WHERE $OTS >= (SELECT MAX($OTS) FROM events) - INTERVAL 7 DAY""")
  )

  /** §3.3 /api/alerts — HAVING-filtered per-user error rates + severity.
    * Ref: app.py:178-229 (severity mapping folded into SQL).
    * Re-aggregates `gold_events_hourly`, whose user_id bucketing makes
    * the group-by exchange-free.
    */
  val dashAlerts = QueryDef(
    "q_dash_alerts",
    (s, d) =>
      graft.warehouse.GoldStage.hourly(s, d)
        .groupBy("user_id")
        .agg(
          sum(col("n")).as("n"),
          sum(when(col("event_type") === "error", col("n")).otherwise(lit(0L)))
            .as("n_errors"))
        .withColumn("error_rate_pct", round(col("n_errors") * 100.0 / col("n"), 6))
        .filter(col("error_rate_pct") > 25.0)
        .withColumn("severity",
          when(col("error_rate_pct") > 40.0, "critical")
            .when(col("error_rate_pct") > 32.0, "high")
            .otherwise("medium")),
    Some("""SELECT user_id, n, n_errors, error_rate_pct,
            CASE WHEN error_rate_pct > 40.0 THEN 'critical'
                 WHEN error_rate_pct > 32.0 THEN 'high'
                 ELSE 'medium' END AS severity
            FROM (SELECT user_id, COUNT(*) AS n,
                         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
                         ROUND(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 100.0
                               / COUNT(*), 6) AS error_rate_pct
                  FROM events GROUP BY user_id)
            WHERE error_rate_pct > 25.0""")
  )

  /** M7 — Pearson correlation matrix over pivoted hourly series,
    * from exact moments. Ref: enhanced_spark_etl.py:607-648.
    */
  val hourlyCorr = QueryDef(
    "q_hourly_corr",
    (s, d) => {
      val hourly = Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(
          sum(when(col("event_type") === "click", 1).otherwise(0)).as("clicks"),
          sum(when(col("event_type") === "view", 1).otherwise(0)).as("views"),
          sum(when(col("event_type") === "error", 1).otherwise(0)).as("errors"))
      hourly.agg(
        round(Exact.dcorr(col("clicks"), col("views")), 6).as("corr_click_view"),
        round(Exact.dcorr(col("clicks"), col("errors")), 6).as("corr_click_error"),
        round(Exact.dcorr(col("views"), col("errors")), 6).as("corr_view_error"))
    },
    Some(s"""WITH hourly AS (
               SELECT DATE_TRUNC('hour', $OTS) AS h,
                      SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicks,
                      SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS views,
                      SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS errors
               FROM events GROUP BY 1)
             SELECT ROUND(${Sql.CORRD("clicks", "views")}, 6) AS corr_click_view,
                    ROUND(${Sql.CORRD("clicks", "errors")}, 6) AS corr_click_error,
                    ROUND(${Sql.CORRD("views", "errors")}, 6) AS corr_view_error
             FROM hourly""")
  )

  /** M7 full matrix — Pearson correlation over a DYNAMIC pivot
    * (A16 + M7 composed, enhanced_spark_etl.py:607-648): hourly avg
    * value per event_type pivoted to columns, all C(5,2) pairs
    * correlated from exact moments, emitted long-form. Complete-case
    * rows only (the reference dropna()s before Correlation.corr).
    */
  val corrMatrix = QueryDef(
    "q_corr_matrix", {
      val types = Seq("click", "view", "purchase", "signup", "error")
      val pairs = for {
        i <- types.indices
        j <- i + 1 until types.size
      } yield (types(i), types(j))
      (s: SparkSession, d: String) => {
        val pv = Tables.events(s, d)
          .groupBy(date_trunc("hour", col("ts")).as("h"))
          .pivot("event_type", types)
          .agg(Exact.davg(col("value")))
          .na.drop(types)
        val aggs = pairs.map { case (a, b) =>
          round(Exact.dcorr(col(a), col(b)), 6).as(s"c_${a}_$b")
        }
        val one = pv.agg(aggs.head, aggs.tail: _*)
        val rows = pairs.map { case (a, b) =>
          struct(lit(a).as("type_a"), lit(b).as("type_b"),
            col(s"c_${a}_$b").as("corr"))
        }
        one.select(explode(array(rows: _*)).as("r"))
          .select(col("r.type_a"), col("r.type_b"), col("r.corr"))
      }
    },
    Some {
      val types = Seq("click", "view", "purchase", "signup", "error")
      val cells = types.map { t =>
        s"""(CAST(SUM(CASE WHEN event_type = '$t' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE)
            / COUNT(CASE WHEN event_type = '$t' THEN value END)) AS $t"""
      }.mkString(",\n")
      val complete = types.map(t => s"$t IS NOT NULL").mkString(" AND ")
      val pairRows = (for {
        i <- types.indices
        j <- i + 1 until types.size
      } yield {
        val (a, b) = (types(i), types(j))
        s"""SELECT '$a' AS type_a, '$b' AS type_b,
            ROUND(${Sql.CORRD(a, b)}, 6) AS corr FROM cpl"""
      }).mkString("\nUNION ALL\n")
      s"""WITH pv AS (SELECT DATE_TRUNC('hour', $OTS) AS h,
            $cells
            FROM events GROUP BY 1),
          cpl AS (SELECT * FROM pv WHERE $complete)
          $pairRows"""
    }
  )

  /** JSONB analog — extract a typed field from the JSON props column.
    * Ref: enhanced_data_schema.sql:128 (manufacturer_specs JSONB);
    * SURVEY §1.5 maps JSONB → get_json_object.
    */
  val jsonExtract = QueryDef(
    "q_json_extract",
    (s, d) =>
      Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(
          count(col("k")).as("n_with_k"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k")),
    Some("""SELECT event_type,
            COUNT(k) AS n_with_k, CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k
            FROM (SELECT event_type,
                         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
                  FROM events)
            GROUP BY event_type""")
  )

  /** A16 on events — hour-of-day × event_type pivot (pinned columns).
    * Ref: enhanced_spark_etl.py:612, 705-714.
    */
  val pivotHourType = QueryDef(
    "q_pivot_hour_type",
    (s, d) =>
      Tables.events(s, d)
        .withColumn("hod", hour(col("ts")))
        .groupBy("hod")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .withColumnRenamed("click", "n_click")
        .withColumnRenamed("view", "n_view")
        .withColumnRenamed("purchase", "n_purchase")
        .withColumnRenamed("signup", "n_signup")
        .withColumnRenamed("error", "n_error"),
    Some(s"""SELECT EXTRACT(HOUR FROM $OTS) AS hod,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
             CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
             FROM events GROUP BY 1""")
  )

  /** A/B experiment readout: users are assigned to arms by a
    * deterministic hash of their id (the industry-standard sticky
    * bucketing — no assignment table to join, any engine recomputes the
    * same split), the metric is per-user high-value conversion (any
    * purchase over 150 — plain "ever purchased" saturates at 100% on
    * this corpus and degenerates the variance), and the readout is the
    * two-proportion z-test with pooled variance — |z| > 1.96 is the
    * 95% significance gate. On hash-split arms with no real treatment
    * the expected readout is "not significant": this doubles as the
    * pipeline's A/A sanity check. The zero-variance case (both rates
    * 0 or 1) reports z = NULL / not significant rather than tripping
    * ANSI division-by-zero.
    *
    * Scale shape: one user-keyed partial agg (per-user conversion bit),
    * a map-only arm assignment on the REDUCED per-user table, and a
    * 1-row rollup — the corpus shuffles once, on user_id. Determinism:
    * counts are exact, the z chain is textually identical double math
    * in both engines, rounded at 6 dp.
    */
  val abTest = QueryDef(
    "q_abtest",
    (s, d) => {
      import graft.functions.PortableHash
      val h = "md5(concat(cast(user_id as string), '#ab'))"
      val perUser = Tables.events(s, d)
        .groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase" && col("value") > 150,
          1).otherwise(0)).as("conv"))
        .withColumn("arm",
          when(expr(PortableHash.laneSpark(h, 0)) % 2 === 0, "A")
            .otherwise("B"))
      val row = perUser.agg(
        sum(when(col("arm") === "A", 1).otherwise(0)).as("n_a"),
        sum(when(col("arm") === "B", 1).otherwise(0)).as("n_b"),
        sum(when(col("arm") === "A", col("conv")).otherwise(0)).as("c_a"),
        sum(when(col("arm") === "B", col("conv")).otherwise(0)).as("c_b"))
      val pa = col("c_a").cast("double") / col("n_a")
      val pb = col("c_b").cast("double") / col("n_b")
      val pool = (col("c_a") + col("c_b")).cast("double") /
        (col("n_a") + col("n_b"))
      val den = sqrt(pool * (lit(1.0) - pool) *
        (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
      val z = when(den > 0, round((pa - pb) / den, 6))
      row.select(col("n_a"), col("n_b"), col("c_a"), col("c_b"),
        round(pa, 6).as("rate_a"), round(pb, 6).as("rate_b"),
        z.as("z"),
        (coalesce(abs(z), lit(0.0)) > 1.96).cast("int").as("significant"))
    },
    Some {
      import graft.functions.PortableHash
      val h = "md5(CAST(user_id AS VARCHAR) || '#ab')"
      s"""WITH pu AS (
            SELECT user_id,
                   MAX(CASE WHEN event_type = 'purchase' AND value > 150
                       THEN 1 ELSE 0 END) AS conv
            FROM events GROUP BY user_id),
          arms AS (
            SELECT CASE WHEN ${PortableHash.laneDuck(h, 0)} % 2 = 0
                        THEN 'A' ELSE 'B' END AS arm, conv
            FROM pu),
          agg AS (
            SELECT CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                   CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
                   CAST(SUM(CASE WHEN arm = 'A' THEN conv ELSE 0 END) AS BIGINT) AS c_a,
                   CAST(SUM(CASE WHEN arm = 'B' THEN conv ELSE 0 END) AS BIGINT) AS c_b
            FROM arms),
          zc AS (
            SELECT *,
                   SQRT((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                     * (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                     * (1.0 / n_a + 1.0 / n_b)) AS den
            FROM agg)
          SELECT n_a, n_b, c_a, c_b,
                 ROUND(CAST(c_a AS DOUBLE) / n_a, 6) AS rate_a,
                 ROUND(CAST(c_b AS DOUBLE) / n_b, 6) AS rate_b,
                 CASE WHEN den > 0 THEN ROUND((CAST(c_a AS DOUBLE) / n_a
                   - CAST(c_b AS DOUBLE) / n_b) / den, 6) END AS z,
                 CASE WHEN den > 0 AND ABS(ROUND((CAST(c_a AS DOUBLE) / n_a
                     - CAST(c_b AS DOUBLE) / n_b) / den, 6)) > 1.96
                   THEN 1 ELSE 0 END AS significant
          FROM zc"""
    })

  /** Sequential-pattern mining, the clickstream complement to
    * [[funnel]]: the funnel checks ONE prescribed path; this discovers
    * which 3-step event-type paths actually happen — the top
    * consecutive (e₁ → e₂ → e₃) transitions per user timeline, ranked
    * by frequency. What a product team reads to find the real journeys
    * (and what a next-event model would train on).
    *
    * Scale shape: one shuffle on user_id for the ordered window (two
    * LEADs ride a single Sort+Window pass), then a vocabulary-sized
    * count agg (≤ |types|³ keys, map-side combined) and a
    * TakeOrderedAndProject. Ordering ties break on event_id — the
    * repo-wide (ts, event_id) total order, so both engines walk
    * identical timelines.
    */
  val pathMining = QueryDef(
    "q_path_mining",
    (s, d) => {
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("e1"))
        .withColumn("e2", lead(col("e1"), 1).over(wUser))
        .withColumn("e3", lead(col("e1"), 2).over(wUser))
        .filter(col("e2").isNotNull && col("e3").isNotNull)
        .groupBy("e1", "e2", "e3")
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("e1"), asc("e2"), asc("e3"))
        .limit(15)
    },
    Some(s"""WITH p AS (
              SELECT event_type AS e1,
                     LEAD(event_type, 1) OVER w AS e2,
                     LEAD(event_type, 2) OVER w AS e3
              FROM events
              WINDOW w AS ($OWIN))
            SELECT e1, e2, e3, COUNT(*) AS n
            FROM p WHERE e2 IS NOT NULL AND e3 IS NOT NULL
            GROUP BY 1, 2, 3
            ORDER BY n DESC, e1, e2, e3 LIMIT 15""")
  )

  /** Multi-touch channel attribution with time-decay credit — the
    * marketing-analytics standard: every purchase splits its value
    * across the user's touches (any non-purchase event) in the 30 min
    * before it, weighted by recency with a 10-minute half-life
    * (w = 0.5^(Δt/600)) and normalized per purchase; the report rolls
    * credited revenue up per channel. Last-touch and linear are the
    * λ→0 / λ→∞ degenerate cases of this one operator.
    *
    * Scale shape: the purchase↔touch band join is the BUCKETED range
    * join (probe side explodes 2 half-hour buckets — the q_range_join
    * recipe, never a theta join); per-purchase normalization is one
    * window over that purchase's touches (purchase-keyed partitions);
    * the channel rollup is a 4-row agg. Determinism: the 0.5^x
    * transcendental rounds at 9 dp, weights and credits ride
    * DECIMAL partials (both exactly representable post-rounding), the
    * oracle states the band as the equivalent theta join.
    */
  val attributionCredit = QueryDef(
    "q_attribution_credit",
    (s, d) => {
      import org.apache.spark.sql.types.DecimalType
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("event_id"),
          sec.as("sec"), col("value"))
      val pur = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"),
          col("sec").as("p_sec"), col("value"))
      val tch = ev.filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("event_type").as("channel"),
          (col("sec") / 1800).cast("long").as("bkt"), col("sec").as("t_sec"))
      val pairs = pur
        .withColumn("bkt", explode(array((col("p_sec") / 1800).cast("long"),
          (col("p_sec") / 1800).cast("long") - 1)))
        .join(tch, Seq("user_id", "bkt"))
        .filter(col("p_sec") - col("t_sec") > 0 &&
          col("p_sec") - col("t_sec") <= 1800)
        .select(col("p_id"), col("value"), col("channel"),
          round(pow(lit(0.5), (col("p_sec") - col("t_sec")) / lit(600.0)), 9)
            .as("w"))
      val wsum = sum(col("w").cast(DecimalType(18, 9)))
        .over(Window.partitionBy("p_id")).cast("double")
      pairs.withColumn("credit",
          round(col("value") * col("w") / wsum, 6))
        .groupBy("channel")
        .agg(count(lit(1)).as("n_touches"),
          round(sum(col("credit").cast(DecimalType(18, 6))).cast("double"), 4)
            .as("credited_revenue"))
        .orderBy("channel")
    },
    Some(s"""WITH ev AS (
              SELECT user_id, event_type, event_id, $OSEC AS sec, value
              FROM events),
            pur AS (SELECT user_id, event_id AS p_id, sec AS p_sec, value
                    FROM ev WHERE event_type = 'purchase'),
            tch AS (SELECT user_id, event_type AS channel, sec AS t_sec
                    FROM ev WHERE event_type <> 'purchase'),
            pairs AS (
              SELECT p.p_id, p.value, t.channel,
                     ROUND(POWER(0.5, (p.p_sec - t.t_sec) / 600.0), 9) AS w
              FROM pur p JOIN tch t
                ON p.user_id = t.user_id
               AND p.p_sec - t.t_sec > 0 AND p.p_sec - t.t_sec <= 1800),
            cr AS (
              SELECT channel, ROUND(value * w / wsum, 6) AS credit FROM (
                SELECT *, CAST(SUM(CAST(w AS DECIMAL(18,9)))
                  OVER (PARTITION BY p_id) AS DOUBLE) AS wsum
                FROM pairs))
            SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_touches,
                   ROUND(CAST(SUM(CAST(credit AS DECIMAL(18,6))) AS DOUBLE), 4)
                     AS credited_revenue
            FROM cr GROUP BY channel ORDER BY channel""")
  )

  /** Power analysis for the two-proportion experiment — the planning
    * half of [[abTest]] (that query READS an experiment; this one
    * SIZES the next one): for the measured baseline purchase share
    * (purchase events / all events, ~0.2 here — a proportion safely
    * inside (0,1), unlike ever-purchased-per-user which saturates)
    * and a grid of minimal detectable effects, the required
    * observations per arm at 80% and 90% power, α = 0.05 two-sided —
    * the standard normal-approximation formula
    * n = (z_{α/2}·√(2p̄q̄) + z_β·√(p₁q₁ + p₂q₂))² / Δ².
    *
    * Exactness: the baseline is an exact integer ratio (rounded 6
    * BEFORE entering the formula, so both engines start from the
    * identical double); z quantiles are shared literals; the two
    * sqrts round to 9 dp and the final n is one CEIL — every op
    * sequence is textually identical across engines. Scale shape: ONE
    * distinct-ish agg to (n_users, n_converted), then a 10-row grid
    * cross join — the corpus reduces before any math.
    */
  val powerAnalysis = QueryDef(
    "q_power_analysis",
    (s, d) => {
      val za = 1.959964 // z_{0.025}
      val ev = Tables.events(s, d)
      val base = ev
        .agg(count(lit(1)).as("n_events"),
          sum((col("event_type") === "purchase").cast("long"))
            .as("n_purchases"))
        .withColumn("p1", round(col("n_purchases").cast("double") /
          col("n_events").cast("double"), 6))
      import s.implicits._
      val grid = s.range(1, 6)
        .select((col("id").cast("double") / 100).as("mde"))
        .crossJoin(Seq((0.8, 0.841621), (0.9, 1.281552)).toDF("power", "zb"))
      def nArm(p1: Column, mde: Column, zb: Column): Column = {
        val p2 = p1 + mde
        val pbar = (p1 + p2) / 2
        val a = round(sqrt(lit(2) * pbar * (lit(1) - pbar)), 9)
        val b = round(sqrt(p1 * (lit(1) - p1) + p2 * (lit(1) - p2)), 9)
        ceil((lit(za) * a + zb * b) * (lit(za) * a + zb * b) /
          (mde * mde)).cast("long")
      }
      base.crossJoin(broadcast(grid))
        .select(col("n_events"), col("n_purchases"), col("p1").as("baseline"),
          col("mde"), col("power"),
          nArm(col("p1"), col("mde"), col("zb")).as("n_per_arm"))
    },
    Some("""WITH base AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
                     CAST(SUM(CASE WHEN event_type = 'purchase'
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases
              FROM events),
            bp AS (SELECT *, ROUND(CAST(n_purchases AS DOUBLE)
                                   / CAST(n_events AS DOUBLE), 6) AS p1
                   FROM base),
            grid AS (SELECT CAST(g.i AS DOUBLE) / 100 AS mde, pw.power, pw.zb
                     FROM generate_series(1, 5) AS g(i)
                     CROSS JOIN (VALUES (CAST(0.8 AS DOUBLE),
                                         CAST(0.841621 AS DOUBLE)),
                                        (CAST(0.9 AS DOUBLE),
                                         CAST(1.281552 AS DOUBLE)))
                       pw(power, zb))
            SELECT n_events, n_purchases, p1 AS baseline, mde, power,
                   CAST(CEIL((1.959964 * ROUND(SQRT(2 * ((p1 + p1 + mde) / 2)
                            * (1 - (p1 + p1 + mde) / 2)), 9)
                          + zb * ROUND(SQRT(p1 * (1 - p1)
                            + (p1 + mde) * (1 - (p1 + mde))), 9))
                         * (1.959964 * ROUND(SQRT(2 * ((p1 + p1 + mde) / 2)
                            * (1 - (p1 + p1 + mde) / 2)), 9)
                          + zb * ROUND(SQRT(p1 * (1 - p1)
                            + (p1 + mde) * (1 - (p1 + mde))), 9))
                         / (mde * mde)) AS BIGINT) AS n_per_arm
            FROM bp CROSS JOIN grid"""))

  /** Kaplan–Meier survival curve over user lifetimes — the right-
    * censoring-aware answer to "how long do users stay active" that a
    * plain avg(lifetime) gets WRONG (users still active at the end of
    * the observation window haven't finished their lifetime; dropping
    * or truncating them biases the estimate — the product-limit
    * estimator is the standard fix). Lifetime = whole days between a
    * user's first and last event; a user whose last event falls in the
    * final 24 h of the stream is censored (still alive). One row per
    * EVENT time t: the at-risk count, events, censored-at-t, and the
    * running survival probability S(t) = Π(1 − d/n).
    *
    * Exactness: d/c/n are integers; the product runs as
    * exp(Σ ln((n−d)/n)) with each ln-of-exact-integer-ratio rounded to
    * 9 dp and DECIMAL-summed (merge-order-free), one exp at the end
    * (round 6); a risk set that empties (n = d) would be ln 0, so the
    * collapse is flagged integer-side and pins S = 0 exactly.
    *
    * Scale shape: ONE hash-agg to per-user (first, last) — the only
    * corpus shuffle; everything after runs on the ≤|distinct lifetimes|
    * grain (≤ observation days), where the two windows (reverse
    * cumulative risk, forward cumulative product) are bounded by the
    * calendar, not the data.
    */
  val survival = QueryDef(
    "q_survival",
    (s, d) => {
      import org.apache.spark.sql.types.DecimalType
      val us = expr("unix_micros(cast(ts as timestamp))")
      val dayUs = 86400000000L
      val ev = Tables.events(s, d).filter(col("ts").isNotNull)
      val gmax = ev.agg(max(us).as("gm"))
      val users = ev.groupBy("user_id")
        .agg(min(us).as("first_us"), max(us).as("last_us"))
        .crossJoin(broadcast(gmax))
        .select(
          floor((col("last_us") - col("first_us")) / dayUs).cast("long").as("t"),
          (col("last_us") <= col("gm") - dayUs).cast("long").as("churn"))
      val byT = users.groupBy("t").agg(
        sum(col("churn")).as("d"),
        (count(lit(1)) - sum(col("churn"))).as("c"),
        count(lit(1)).as("n_at"))
      val wDesc = Window.orderBy(desc("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAsc = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byT.withColumn("n_risk", sum(col("n_at")).over(wDesc))
        .filter(col("d") > 0)
        .withColumn("term",
          when(col("n_risk") > col("d"),
            round(log((col("n_risk") - col("d")).cast("double") /
              col("n_risk").cast("double")), 9))
            .otherwise(0.0).cast(DecimalType(28, 18)))
        .withColumn("collapsed",
          max((col("n_risk") === col("d")).cast("long")).over(wAsc))
        .withColumn("survival",
          when(col("collapsed") === 1, 0.0)
            .otherwise(round(exp(sum(col("term")).over(wAsc).cast("double")), 6)))
        .select(col("t"), col("n_risk"), col("d").as("n_events"),
          col("c").as("n_censored"), col("survival"))
    },
    Some("""WITH ev AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
                        FROM events WHERE ts IS NOT NULL),
            gm AS (SELECT MAX(us) AS gm FROM ev),
            users AS (
              SELECT CAST(FLOOR((MAX(us) - MIN(us)) / 86400000000)
                          AS BIGINT) AS t,
                     CASE WHEN MAX(us) <= (SELECT gm FROM gm) - 86400000000
                          THEN 1 ELSE 0 END AS churn
              FROM ev GROUP BY user_id),
            byt AS (SELECT t, CAST(SUM(churn) AS BIGINT) AS d,
                           CAST(COUNT(*) - SUM(churn) AS BIGINT) AS c,
                           CAST(COUNT(*) AS BIGINT) AS n_at
                    FROM users GROUP BY t),
            risk AS (SELECT *,
                       CAST(SUM(n_at) OVER (ORDER BY t DESC
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_risk
                     FROM byt),
            steps AS (
              SELECT t, d, c, n_risk,
                     CAST(CASE WHEN n_risk > d
                          THEN ROUND(LN(CAST(n_risk - d AS DOUBLE)
                                        / CAST(n_risk AS DOUBLE)), 9)
                          ELSE 0.0 END AS DECIMAL(28,18)) AS term,
                     MAX(CASE WHEN n_risk = d THEN 1 ELSE 0 END)
                       OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS collapsed
              FROM risk WHERE d > 0)
            SELECT t, n_risk, d AS n_events, c AS n_censored,
                   CASE WHEN collapsed = 1 THEN 0.0
                        ELSE ROUND(EXP(CAST(SUM(term)
                          OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                          AS DOUBLE)), 6) END AS survival
            FROM steps""")
  )

  /** Mutual information between categorical feature pairs — the
    * model-free dependence screen a feature-selection / leakage audit
    * runs before training ([[hourlyCorr]] sees only LINEAR relations
    * between numeric columns; MI sees any relation between discrete
    * ones). Three event-table pairs: type×hour-of-day, type×day-of-
    * week, type×value-bucket (fixed 50-wide buckets capped at 10 — a
    * data-independent binning, so no quantile pass). Reported in nats
    * with both marginal entropies and the min-entropy-normalized
    * NMI ∈ [0,1].
    *
    * Exactness: the contingency table is all BIGINT counts; each MI
    * term is (c/n)·ln(c·n / (ra·cb)) — the LN argument is a ratio of
    * EXACT integer products, so one LN + one multiply per cell, rounded
    * to 9 dp and DECIMAL-summed (the transcendental-exact recipe);
    * entropies follow the same shape on the marginals.
    *
    * Scale shape: one map-only feature projection, one hash-agg to the
    * contingency grain (|types|×24-ish cells), marginals re-aggregate
    * THAT (never the corpus), and every join below the first agg is on
    * k-row frames. The three pairs union at the cell grain, so the
    * corpus is scanned once per pair with no shuffle beyond the
    * contingency agg — at 100 TB this is three map-side-combined
    * passes.
    */
  val mutualInformation = QueryDef(
    "q_mutual_information",
    (s, d) => {
      import org.apache.spark.sql.types.DecimalType
      val ev = Tables.events(s, d).filter(col("ts").isNotNull)
      // ONE corpus scan: the three feature pairs ride a 3-way explode
      // into a single contingency hash-agg (the q_drift_psi shape) —
      // three separate scans would read the fact table three times
      def f(name: String, a: Column, b: Column): Column =
        struct(lit(name).as("pair"), a.cast("string").as("a"),
          b.cast("string").as("b"))
      val cells = ev.select(explode(array(
          f("type_hour", col("event_type"), hour(col("ts"))),
          f("type_dow", col("event_type"), dayofweek(col("ts"))),
          f("type_vbucket", col("event_type"),
            least(floor(col("value") / 50), lit(9)).cast("long")))).as("e"))
        .select(col("e.pair").as("pair"), col("e.a").as("a"),
          col("e.b").as("b"))
        .groupBy("pair", "a", "b").agg(count(lit(1)).as("c"))
      // r20 note: measured, then deliberately NOT checkpointed — the
      // four consumers (ra, cb, n, MI terms) share the contingency
      // exchange via ReusedExchange already (verified in the executed
      // plan), so a localCheckpoint only added materialization cost
      // (same-box A/B: 1.42 s checkpointed vs 1.07 s reused).
      val ra = cells.groupBy("pair", "a").agg(sum(col("c")).as("ra"))
      val cb = cells.groupBy("pair", "b").agg(sum(col("c")).as("cb"))
      val n = cells.groupBy("pair").agg(sum(col("c")).as("n"))
      val term = round((col("c").cast("double") / col("n").cast("double")) *
        log(col("c").cast("double") * col("n").cast("double") /
          (col("ra").cast("double") * col("cb").cast("double"))), 9)
      val mi = cells.join(ra, Seq("pair", "a")).join(cb, Seq("pair", "b"))
        .join(broadcast(n), Seq("pair"))
        .select(col("pair"), term.cast(DecimalType(28, 12)).as("t"))
        .groupBy("pair")
        .agg(round(sum(col("t")).cast("double"), 6).as("mi"))
      def entropy(marg: DataFrame, cnt: String, out: String): DataFrame =
        marg.join(broadcast(n), Seq("pair"))
          .select(col("pair"),
            round(-(col(cnt).cast("double") / col("n").cast("double")) *
              log(col(cnt).cast("double") / col("n").cast("double")), 9)
              .cast(DecimalType(28, 12)).as("t"))
          .groupBy("pair")
          .agg(round(sum(col("t")).cast("double"), 6).as(out))
      mi.join(entropy(ra, "ra", "h_a"), Seq("pair"))
        .join(entropy(cb, "cb", "h_b"), Seq("pair"))
        .join(broadcast(n), Seq("pair"))
        .select(col("pair"), col("n"), col("h_a"), col("h_b"), col("mi"),
          round(col("mi") / least(col("h_a"), col("h_b")), 6).as("nmi"))
    },
    Some("""WITH ev AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, value
                        FROM events WHERE ts IS NOT NULL),
            feat AS (
              SELECT 'type_hour' AS pair, event_type AS a,
                     CAST(hour(ts) AS VARCHAR) AS b FROM ev
              UNION ALL
              SELECT 'type_dow', event_type,
                     CAST(dayofweek(ts) + 1 AS VARCHAR) FROM ev
              UNION ALL
              SELECT 'type_vbucket', event_type,
                     CAST(CAST(LEAST(FLOOR(value / 50), 9) AS BIGINT)
                          AS VARCHAR) FROM ev),
            cells AS (SELECT pair, a, b, CAST(COUNT(*) AS BIGINT) AS c
                      FROM feat GROUP BY 1, 2, 3),
            ra AS (SELECT pair, a, CAST(SUM(c) AS BIGINT) AS ra
                   FROM cells GROUP BY 1, 2),
            cb AS (SELECT pair, b, CAST(SUM(c) AS BIGINT) AS cb
                   FROM cells GROUP BY 1, 2),
            nn AS (SELECT pair, CAST(SUM(c) AS BIGINT) AS n
                   FROM cells GROUP BY 1),
            mi AS (
              SELECT pair,
                     ROUND(CAST(SUM(CAST(
                       ROUND((CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) *
                         LN(CAST(c AS DOUBLE) * CAST(n AS DOUBLE)
                            / (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE))), 9)
                       AS DECIMAL(28,12))) AS DOUBLE), 6) AS mi
              FROM cells JOIN ra USING (pair, a) JOIN cb USING (pair, b)
              JOIN nn USING (pair)
              GROUP BY pair),
            ha AS (
              SELECT pair,
                     ROUND(CAST(SUM(CAST(
                       ROUND(-(CAST(ra AS DOUBLE) / CAST(n AS DOUBLE)) *
                         LN(CAST(ra AS DOUBLE) / CAST(n AS DOUBLE)), 9)
                       AS DECIMAL(28,12))) AS DOUBLE), 6) AS h_a
              FROM ra JOIN nn USING (pair) GROUP BY pair),
            hb AS (
              SELECT pair,
                     ROUND(CAST(SUM(CAST(
                       ROUND(-(CAST(cb AS DOUBLE) / CAST(n AS DOUBLE)) *
                         LN(CAST(cb AS DOUBLE) / CAST(n AS DOUBLE)), 9)
                       AS DECIMAL(28,12))) AS DOUBLE), 6) AS h_b
              FROM cb JOIN nn USING (pair) GROUP BY pair)
            SELECT pair, n, h_a, h_b, mi,
                   ROUND(mi / LEAST(h_a, h_b), 6) AS nmi
            FROM mi JOIN ha USING (pair) JOIN hb USING (pair)
            JOIN nn USING (pair)""")
  )

  def all: Seq[QueryDef] = Seq(
    windowRolling, windowRange, windowLagLead, zscore, lastPerGroup,
    dedupLatest, rankTop3, hourlyAgg, percentiles, quantileSketch,
    winsorize, madOutliers, seasonalAdjust, cohortRetention, ntileDeciles, funnel, sessionize, intervalOverlap, freshness,
    dashMetrics, dashAlerts, hourlyCorr, corrMatrix, jsonExtract, pivotHourType,
    abTest, pathMining, attributionCredit, mutualInformation, survival,
    powerAnalysis)
}
