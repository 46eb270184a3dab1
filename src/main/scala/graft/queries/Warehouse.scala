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
        .join(broadcast(dimCustomer), col("o_custkey") === col("c_custkey"))
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

  def all: Seq[QueryDef] = Seq(dimDate, starFact, starRollup, scd2)
}
