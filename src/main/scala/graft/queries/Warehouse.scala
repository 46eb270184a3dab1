package graft.queries

import graft.{QueryDef, Tables}
import graft.util.{Exact, Sql}
import graft.warehouse.Star
import org.apache.spark.sql.functions._

/** Star-schema warehouse operators (SURVEY §1.2, §2.3 J4/J7, §7.1 pkg 7):
  * generated calendar dimension, surrogate-keyed star build, SCD2 merge.
  */
object Warehouse {

  /** Generated calendar dimension over the orders date span.
    * Ref: warehouse_loader.py:85-118 (Python loop → sequence+explode).
    */
  val dimDate = QueryDef(
    "q_dim_date",
    (s, d) => Star.buildDimDate(Tables.orders(s, d), "o_orderdate"),
    Some("""WITH span AS (SELECT MIN(CAST(o_orderdate AS DATE)) AS d0,
                                 MAX(CAST(o_orderdate AS DATE)) AS d1 FROM orders),
            days AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
                       AS date_actual FROM span)
            SELECT date_actual,
              EXTRACT(YEAR FROM date_actual) * 10000
                + EXTRACT(MONTH FROM date_actual) * 100
                + EXTRACT(DAY FROM date_actual) AS time_key,
              EXTRACT(YEAR FROM date_actual) AS y,
              EXTRACT(MONTH FROM date_actual) AS m,
              EXTRACT(DAY FROM date_actual) AS dom,
              EXTRACT(DOW FROM date_actual) + 1 AS dow_sun1,
              dayname(date_actual) AS day_name,
              monthname(date_actual) AS month_name,
              EXTRACT(WEEK FROM date_actual) AS iso_week,
              EXTRACT(QUARTER FROM date_actual) AS q,
              CASE WHEN EXTRACT(DOW FROM date_actual) IN (0, 6) THEN 1 ELSE 0 END
                AS is_weekend,
              CASE WHEN EXTRACT(MONTH FROM date_actual) IN (12, 1, 2) THEN 'Winter'
                   WHEN EXTRACT(MONTH FROM date_actual) IN (3, 4, 5) THEN 'Spring'
                   WHEN EXTRACT(MONTH FROM date_actual) IN (6, 7, 8) THEN 'Summer'
                   ELSE 'Autumn' END AS season,
              CASE WHEN EXTRACT(MONTH FROM date_actual) >= 4
                   THEN EXTRACT(YEAR FROM date_actual)
                   ELSE EXTRACT(YEAR FROM date_actual) - 1 END AS fiscal_year,
              ((EXTRACT(MONTH FROM date_actual) - 4 + 12) % 12) // 3 + 1
                AS fiscal_quarter
            FROM days""")
  )

  /** Star build: fact_orders with surrogate FKs resolved via broadcast
    * joins (the J7 rewrite — no row loops). customer_key is a
    * dense_rank surrogate; time_key is yyyymmdd.
    */
  val starFact = QueryDef(
    "q_star_fact",
    (s, d) => {
      val dimCustomer = Star.withSurrogateKey(
        Tables.customer(s, d).select("c_custkey", "c_mktsegment"),
        "customer_key", col("c_custkey"))
      val dimPriority = Star.withSurrogateKey(
        Tables.orders(s, d).select("o_orderpriority").distinct(),
        "priority_key", col("o_orderpriority"))
      Tables.orders(s, d)
        // customer dim scales with SF — broadcast stays Catalyst's
        // size-based call (fires here; a billion-row dim degrades to a
        // shuffle join, the correct big-dim star shape). The priority
        // dim is structurally k rows → hinted.
        .join(dimCustomer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(dimPriority), Seq("o_orderpriority"))
        .select(
          col("o_orderkey"),
          col("customer_key"),
          col("priority_key"),
          (year(col("o_orderdate")) * 10000 + month(col("o_orderdate")) * 100 +
            dayofmonth(col("o_orderdate"))).cast("long").as("time_key"),
          col("o_totalprice").as("total_price"),
          col("c_mktsegment").as("segment"))
    },
    Some("""WITH dim_customer AS (
              SELECT c_custkey, c_mktsegment,
                     DENSE_RANK() OVER (ORDER BY c_custkey) AS customer_key
              FROM customer),
            dim_priority AS (
              SELECT o_orderpriority,
                     DENSE_RANK() OVER (ORDER BY o_orderpriority) AS priority_key
              FROM (SELECT DISTINCT o_orderpriority FROM orders))
            SELECT o_orderkey, customer_key, priority_key,
                   EXTRACT(YEAR FROM o_orderdate) * 10000
                     + EXTRACT(MONTH FROM o_orderdate) * 100
                     + EXTRACT(DAY FROM o_orderdate) AS time_key,
                   o_totalprice AS total_price,
                   c_mktsegment AS segment
            FROM orders
            JOIN dim_customer ON o_custkey = c_custkey
            JOIN dim_priority USING (o_orderpriority)""")
  )

  /** Star query over the built fact (A25-style rollup by segment ×
    * fiscal-ish month bucket) — proves the star is queryable end-to-end.
    */
  val starRollup = QueryDef(
    "q_star_rollup",
    (s, d) => {
      val fact = starFact.fn(s, d)
      fact.groupBy((col("time_key") / 100).cast("long").as("month_key"), col("segment"))
        .agg(
          count(lit(1)).as("n_orders"),
          Exact.dsum(col("total_price")).as("revenue"),
          countDistinct(col("customer_key")).as("n_customers"))
    },
    Some(s"""WITH dim_customer AS (
              SELECT c_custkey, c_mktsegment,
                     DENSE_RANK() OVER (ORDER BY c_custkey) AS customer_key
              FROM customer),
            fact AS (
              SELECT o_orderkey, customer_key,
                     EXTRACT(YEAR FROM o_orderdate) * 10000
                       + EXTRACT(MONTH FROM o_orderdate) * 100
                       + EXTRACT(DAY FROM o_orderdate) AS time_key,
                     o_totalprice AS total_price,
                     c_mktsegment AS segment
              FROM orders JOIN dim_customer ON o_custkey = c_custkey)
            SELECT time_key // 100 AS month_key, segment,
                   COUNT(*) AS n_orders,
                   ${Sql.SUMD("total_price")} AS revenue,
                   COUNT(DISTINCT customer_key) AS n_customers
            FROM fact GROUP BY 1, 2""")
  )

  /** SCD Type 2 merge: customers with c_custkey % 100 = 0 get a new
    * segment version effective 2026-01-01; old rows closed out.
    * Ref: dimensional_schema.sql:29-49 (the reference declares but
    * never executes SCD2 — SURVEY §1.5).
    */
  val scd2 = QueryDef(
    "q_scd2_merge",
    (s, d) => {
      val current = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
        .withColumn("effective_date", lit("2020-01-01").cast("date"))
        .withColumn("end_date", lit(null).cast("date"))
        .withColumn("is_current", lit(1))
      val updates = Tables.customer(s, d)
        .filter(pmod(col("c_custkey"), lit(100)) === 0)
        .select(col("c_custkey"), lit("UPGRADED").as("c_mktsegment"))
      Star.scd2Merge(current, updates, "c_custkey", "2026-01-01")
    },
    Some("""WITH current AS (
              SELECT c_custkey, c_mktsegment,
                     CAST('2020-01-01' AS DATE) AS effective_date,
                     CAST(NULL AS DATE) AS end_date, 1 AS is_current
              FROM customer),
            upd_keys AS (SELECT c_custkey FROM customer WHERE c_custkey % 100 = 0)
            SELECT * FROM current WHERE c_custkey NOT IN (SELECT c_custkey FROM upd_keys)
            UNION ALL
            SELECT c_custkey, c_mktsegment, effective_date,
                   CAST('2026-01-01' AS DATE) AS end_date, 0 AS is_current
            FROM current WHERE c_custkey IN (SELECT c_custkey FROM upd_keys)
            UNION ALL
            SELECT c_custkey, 'UPGRADED' AS c_mktsegment,
                   CAST('2026-01-01' AS DATE) AS effective_date,
                   CAST(NULL AS DATE) AS end_date, 1 AS is_current
            FROM customer WHERE c_custkey % 100 = 0""")
  )

  /** The ~50-col enhanced denormalized fact
    * (sql/enhanced_data_schema.sql:223-267): one plan assembling time
    * parts, parsed quality, rolling 24-row measures, z-score anomaly
    * columns, lag/diff features, 1h/24h range-window measures,
    * per-type stats (broadcast join back, J1), and data-lineage
    * columns. 32 output columns.
    *
    * Shuffle budget: ONE hash exchange on user_id feeds all four
    * window families (rows-frame, lag, and both range frames — two
    * sort orders, one partitioning), plus one broadcast of the tiny
    * per-type stats agg. The fact itself never re-shuffles.
    */
  val factEnhanced = QueryDef(
    "q_fact_enhanced",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val D = Exact.D
      val e = Tables.events(s, d)
        .withColumn("sec", expr("unix_micros(cast(ts as timestamp)) div 1000000"))
        .withColumn("k", expr("cast(get_json_object(props, '$.k') as double)"))
      val typeStats = Tables.events(s, d).groupBy("event_type").agg(
        Exact.davg(col("value")).as("type_avg"),
        Exact.dstddev(col("value")).as("type_std"))
      val wRows = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id")).rowsBetween(-23, 0)
      val wLag = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val w1h = Window.partitionBy("user_id").orderBy(col("sec")).rangeBetween(-3600, 0)
      val w24h = Window.partitionBy("user_id").orderBy(col("sec")).rangeBetween(-86400, 0)

      val n24  = count(lit(1)).over(wRows)
      val nd24 = n24.cast("double")
      val sw24 = sum(col("value").cast(D)).over(wRows).cast("double")
      val sq24 = sum(col("value").cast(D) * col("value").cast(D)).over(wRows).cast("double")
      val rollingAvg = sw24 / n24
      val rollingStd = when(n24 > 1,
        sqrt(greatest((sq24 - sw24 * sw24 / nd24) / (nd24 - lit(1.0)), lit(0.0))))
        .otherwise(0.0)
      val prev = lag(col("value"), 1).over(wLag)

      e.join(broadcast(typeStats), "event_type")
        .select(
          col("event_id"), col("user_id"), col("event_type"), col("ts"), col("value"),
          year(col("ts")).as("year"), month(col("ts")).as("month"),
          dayofmonth(col("ts")).as("day"), hour(col("ts")).as("hour"),
          dayofweek(col("ts")).as("day_of_week"),
          dayofweek(col("ts")).isin(1, 7).cast("int").as("is_weekend"),
          col("k"), (col("k") / 100.0).as("q"),
          rollingAvg.as("rolling_avg_24"),
          rollingStd.as("rolling_std_24"),
          when(rollingStd > 0, (col("value") - rollingAvg) / rollingStd)
            .otherwise(0.0).as("z_score"),
          (abs(when(rollingStd > 0, (col("value") - rollingAvg) / rollingStd)
            .otherwise(0.0)) > 2.0).cast("int").as("is_spike"),
          prev.as("prev_value"),
          (col("value") - prev).as("diff_1"),
          round(when(prev =!= 0.0, (col("value") - prev) * 100.0 / prev), 6)
            .as("pct_change_1"),
          count(lit(1)).over(w1h).as("n_1h"),
          (sum(col("value").cast(D)).over(w1h).cast("double") /
            count(lit(1)).over(w1h)).as("avg_1h"),
          count(lit(1)).over(w24h).as("n_24h"),
          (sum(col("value").cast(D)).over(w24h).cast("double") /
            count(lit(1)).over(w24h)).as("avg_24h"),
          col("type_avg"), col("type_std"),
          when(col("type_std") > 0, (col("value") - col("type_avg")) / col("type_std"))
            .otherwise(0.0).as("type_z"),
          col("value").as("raw_value"),
          lit("identity").as("transformation_applied"),
          when(col("value").between(-100.0, 10000.0) && col("k").isNotNull, "valid")
            .otherwise("flagged").as("validation_status"),
          lit("3.0").as("pipeline_version"),
          lit("events").as("data_source"))
    },
    Some("""WITH ts_stats AS (
              SELECT event_type,
                     (CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(value)) AS type_avg,
                     CASE WHEN COUNT(value) > 1 THEN SQRT(GREATEST(
                       (CAST(SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                        - CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                          * CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                          / CAST(COUNT(value) AS DOUBLE))
                       / (CAST(COUNT(value) AS DOUBLE) - 1.0), 0.0)) END AS type_std
              FROM events GROUP BY event_type),
            e AS (SELECT event_id, user_id, event_type,
                         CAST(ts AS TIMESTAMP) AS ts, value, props,
                         epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS sec,
                         CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k
                  FROM events),
            w AS (SELECT e.*, type_avg, type_std,
                    COUNT(*) OVER w_rows AS n24,
                    CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w_rows AS DOUBLE) AS sw24,
                    CAST(SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) OVER w_rows AS DOUBLE) AS sq24,
                    LAG(value, 1) OVER w_lag AS prev_value,
                    COUNT(*) OVER w_1h AS n_1h,
                    CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w_1h AS DOUBLE) AS s_1h,
                    COUNT(*) OVER w_24h AS n_24h,
                    CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w_24h AS DOUBLE) AS s_24h
                  FROM e JOIN ts_stats USING (event_type)
                  WINDOW
                    w_rows AS (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW),
                    w_lag AS (PARTITION BY user_id ORDER BY ts, event_id),
                    w_1h AS (PARTITION BY user_id ORDER BY sec
                             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW),
                    w_24h AS (PARTITION BY user_id ORDER BY sec
                              RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW)),
            m AS (SELECT *,
                    sw24 / n24 AS rolling_avg_24,
                    CASE WHEN n24 > 1
                         THEN SQRT(GREATEST((sq24 - sw24 * sw24 / CAST(n24 AS DOUBLE))
                                            / (CAST(n24 AS DOUBLE) - 1.0), 0.0))
                         ELSE 0.0 END AS rolling_std_24
                  FROM w)
            SELECT event_id, user_id, event_type, ts, value,
                   EXTRACT(YEAR FROM ts) AS year, EXTRACT(MONTH FROM ts) AS month,
                   EXTRACT(DAY FROM ts) AS day, EXTRACT(HOUR FROM ts) AS hour,
                   dayofweek(ts) + 1 AS day_of_week,
                   CASE WHEN dayofweek(ts) + 1 IN (1, 7) THEN 1 ELSE 0 END AS is_weekend,
                   k, k / 100.0 AS q,
                   rolling_avg_24, rolling_std_24,
                   CASE WHEN rolling_std_24 > 0
                        THEN (value - rolling_avg_24) / rolling_std_24
                        ELSE 0.0 END AS z_score,
                   CASE WHEN ABS(CASE WHEN rolling_std_24 > 0
                                      THEN (value - rolling_avg_24) / rolling_std_24
                                      ELSE 0.0 END) > 2.0 THEN 1 ELSE 0 END AS is_spike,
                   prev_value,
                   value - prev_value AS diff_1,
                   ROUND(CASE WHEN prev_value <> 0.0
                         THEN (value - prev_value) * 100.0 / prev_value END, 6) AS pct_change_1,
                   n_1h, s_1h / n_1h AS avg_1h,
                   n_24h, s_24h / n_24h AS avg_24h,
                   type_avg, type_std,
                   CASE WHEN type_std > 0 THEN (value - type_avg) / type_std
                        ELSE 0.0 END AS type_z,
                   value AS raw_value,
                   'identity' AS transformation_applied,
                   CASE WHEN value BETWEEN -100.0 AND 10000.0 AND k IS NOT NULL
                        THEN 'valid' ELSE 'flagged' END AS validation_status,
                   '3.0' AS pipeline_version,
                   'events' AS data_source
            FROM m""")
  )

  /** Market-basket association mining: part pairs co-purchased within
    * an order, scored by support / confidence / lift — the classic
    * warehouse affinity analysis ("customers who bought A also bought
    * B"), top-20 by lift over a minimum co-occurrence of 3 baskets.
    *
    * Scale shape: baskets collapse to the distinct (order, part)
    * relation first; the pair self-join is ORDER-keyed, so pair volume
    * is Σ C(basket, 2) — baskets are domain-bounded (line counts), and
    * the [[Graph.capDegree]] guard (K = 64, deterministic md5 rank,
    * mirrored in the oracle) bounds a degenerate mega-basket BY
    * CONSTRUCTION, exactly the q_cooccur_similarity posture (free until
    * needed: max basket at the test SFs is 17). The basket total is a
    * 1-row broadcast relation (no eager cache + driver count: the
    * capped basket relation `b` feeds four plan branches and Catalyst's
    * ReuseExchange computes its distinct+window shuffle once — one job,
    * no pinned storage, no extra action); per-part frequencies attach
    * to the surviving pair table by joins on a |parts|-row relation
    * (size-based broadcast at any sane catalog).
    */
  val basketLift = QueryDef(
    "q_basket_lift",
    (s, d) => {
      val raw = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val b = Graph.capDegree(raw, "ok", "pk", 64)
      val nb = b.agg(countDistinct("ok").as("n")) // 1 row — broadcast scalar
      val freq = b.groupBy("pk").agg(count(lit(1)).as("f"))
      val pairs = b.alias("a")
        .join(b.alias("c"), col("a.ok") === col("c.ok") && col("a.pk") < col("c.pk"))
        .groupBy(col("a.pk").as("pa"), col("c.pk").as("pb"))
        .agg(count(lit(1)).as("both_n"))
        .filter(col("both_n") >= 3)
      pairs
        .join(freq.select(col("pk").as("pa"), col("f").as("n_a")), "pa")
        .join(freq.select(col("pk").as("pb"), col("f").as("n_b")), "pb")
        .crossJoin(broadcast(nb))
        .select(col("pa"), col("pb"), col("both_n"), col("n_a"), col("n_b"),
          round(col("both_n").cast("double") / col("n"), 6).as("support"),
          round(col("both_n").cast("double") / col("n_a"), 6).as("confidence"),
          round(col("both_n").cast("double") * col("n") /
            (col("n_a") * col("n_b")), 6).as("lift"))
        .orderBy(desc("lift"), asc("pa"), asc("pb"))
        .limit(20)
    },
    Some("""WITH raw AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                         FROM lineitem),
            b AS MATERIALIZED (SELECT ok, pk FROM (
                   SELECT ok, pk, ROW_NUMBER() OVER (PARTITION BY ok
                     ORDER BY md5(CAST(ok AS VARCHAR) || ':' ||
                                  CAST(pk AS VARCHAR)), pk) AS rn
                   FROM raw) WHERE rn <= 64),
            nb AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n FROM b),
            freq AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS f FROM b GROUP BY pk),
            pairs AS (SELECT a.pk AS pa, c.pk AS pb,
                             CAST(COUNT(*) AS BIGINT) AS both_n
                      FROM b a JOIN b c ON a.ok = c.ok AND a.pk < c.pk
                      GROUP BY 1, 2
                      HAVING COUNT(*) >= 3)
            SELECT pa, pb, both_n, fa.f AS n_a, fb.f AS n_b,
                   ROUND(CAST(both_n AS DOUBLE) / nb.n, 6) AS support,
                   ROUND(CAST(both_n AS DOUBLE) / fa.f, 6) AS confidence,
                   ROUND(CAST(both_n AS DOUBLE) * nb.n / (fa.f * fb.f), 6) AS lift
            FROM pairs
            JOIN freq fa ON fa.pk = pa
            JOIN freq fb ON fb.pk = pb
            CROSS JOIN nb
            ORDER BY lift DESC, pa, pb LIMIT 20""")
  )

  def all: Seq[QueryDef] = Seq(dimDate, starFact, starRollup, scd2, factEnhanced,
    basketLift)
}
