package graft.queries

import graft.{QueryDef, Tables}
import graft.util.{Exact, Sql}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operator inventory over the TPC-H-ish testdata tables.
  *
  * Each query re-expresses one operator family from SURVEY.md §2
  * (reference sites cited per query). Spark-first: declarative
  * DataFrame plans, broadcast hints for dimension joins, decimal-exact
  * aggregation (see [[graft.util.Exact]]) so results hash-match the
  * DuckDB oracle bit-for-bit.
  */
object Relational {

  /** S1/P3/P5 — projected, filtered parquet scan with pushdown.
    * Ref: spark_etl.py:47-64 (schema'd scan), enhanced_spark_etl.py:421-424.
    * Filter + projection reach the parquet reader (PushedFilters/ReadSchema).
    */
  val scanProject = QueryDef(
    "q_scan_project",
    (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp_ntz"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
            FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-01-01'""")
  )

  /** P7/P12 — compound boolean predicate: between, isin, OR.
    * Ref: enhanced_spark_etl.py:735-737,761-764; spark_etl.py:76-77.
    */
  val filterCompound = QueryDef(
    "q_filter_compound",
    (s, d) =>
      Tables.orders(s, d)
        .filter(
          col("o_orderstatus").isin("O", "F") &&
            col("o_totalprice").between(1000.0, 200000.0) &&
            (col("o_orderpriority") === "1-URGENT" || col("o_orderpriority") === "2-HIGH"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
            FROM orders
            WHERE o_orderstatus IN ('O','F')
              AND o_totalprice BETWEEN 1000.0 AND 200000.0
              AND (o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH')""")
  )

  /** P11 — distinct (dedup on projected key columns).
    * Ref: etl.py:62 (drop_duplicates), data_validator.py:406-415.
    */
  val distinctKeys = QueryDef(
    "q_distinct",
    (s, d) =>
      Tables.lineitem(s, d).select("l_returnflag", "l_linestatus").distinct(),
    Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem")
  )

  /** A9 at scale — distinct-count SKETCH. Exact `COUNT(DISTINCT key)`
    * shuffles every distinct key; at 100 TB the answer should come from
    * a fixed-size sketch. Spark's `approx_count_distinct` (HLL++) can't
    * be oracle-matched (engine-specific hashing), so this demonstrates
    * the same posture with a PORTABLE sketch: 1024-bucket linear
    * counting over the cross-engine md5 hash — each row maps to one of
    * m buckets, the aggregate state is just the occupied-bucket count,
    * and estimate = -m·ln(empty/m). Deterministic, bit-identical in
    * both engines, and the query also emits the exact count so the
    * sketch error is visible (±3% here). Map-side partial aggregation
    * reduces each partition to ≤ m rows before the shuffle.
    *
    * Saturation: when all m buckets are occupied (cardinality ≫ m) the
    * linear-counting formula diverges (ln 0), so the estimate is NULL
    * with `saturated = true` — found by running the gate at sf0.1,
    * where 15k distinct keys fill all 1024 buckets. Production sizes m
    * to the expected cardinality or falls back to HLL; the flag makes
    * the failure mode explicit instead of erroring mid-query.
    */
  val distinctSketch = QueryDef(
    "q_distinct_sketch",
    (s, d) => {
      val m = 1024
      val h = "md5(concat(cast(o_custkey as string), '#lc'))"
      val bucket = expr(s"${graft.functions.PortableHash.laneSpark(h, 0)} % $m")
      Tables.orders(s, d)
        .select(col("o_custkey"), bucket.as("bucket"))
        .agg(
          countDistinct(col("o_custkey")).as("exact_distinct"),
          countDistinct(col("bucket")).as("occupied"))
        .select(col("exact_distinct"), col("occupied"),
          when(col("occupied") < m, round(-lit(m.toDouble) *
            log((lit(m.toDouble) - col("occupied")) / m.toDouble), 2))
            .as("estimate"),
          (col("occupied") >= m).as("saturated"))
    },
    Some {
      val m = 1024
      val h = "md5(CAST(o_custkey AS VARCHAR) || '#lc')"
      s"""SELECT exact_distinct, occupied,
          CASE WHEN occupied < $m
               THEN ROUND(-$m.0 * LN(($m.0 - occupied) / $m.0), 2) END AS estimate,
          occupied >= $m AS saturated
          FROM (SELECT COUNT(DISTINCT o_custkey) AS exact_distinct,
                       COUNT(DISTINCT ${graft.functions.PortableHash.laneDuck(h, 0)} % $m)
                         AS occupied
                FROM orders)"""
    }
  )

  /** A9/A15 at scale, grouped: distinct users per event type via the
    * same portable linear-counting sketch as `q_distinct_sketch`, one
    * sketch per GROUP — the shape `COUNT(DISTINCT x) GROUP BY g` takes
    * at 100 TB (per-group state is ≤ m buckets, partials merge
    * map-side; the exact count rides along to expose the error).
    */
  val groupDistinctSketch = QueryDef(
    "q_group_distinct_sketch",
    (s, d) => {
      val m = 1024
      val h = "md5(concat(cast(user_id as string), '#lcg'))"
      val bucket = expr(s"${graft.functions.PortableHash.laneSpark(h, 0)} % $m")
      Tables.events(s, d)
        .select(col("event_type"), col("user_id"), bucket.as("bucket"))
        .groupBy("event_type")
        .agg(
          countDistinct(col("user_id")).as("exact_distinct"),
          countDistinct(col("bucket")).as("occupied"))
        .select(col("event_type"), col("exact_distinct"), col("occupied"),
          when(col("occupied") < m, round(-lit(m.toDouble) *
            log((lit(m.toDouble) - col("occupied")) / m.toDouble), 2))
            .as("estimate"),
          (col("occupied") >= m).as("saturated"))
    },
    Some {
      val m = 1024
      val h = "md5(CAST(user_id AS VARCHAR) || '#lcg')"
      s"""SELECT event_type, exact_distinct, occupied,
          CASE WHEN occupied < $m
               THEN ROUND(-$m.0 * LN(($m.0 - occupied) / $m.0), 2) END AS estimate,
          occupied >= $m AS saturated
          FROM (SELECT event_type,
                       COUNT(DISTINCT user_id) AS exact_distinct,
                       COUNT(DISTINCT ${graft.functions.PortableHash.laneDuck(h, 0)} % $m)
                         AS occupied
                FROM events GROUP BY 1)"""
    }
  )

  /** A1/A2 — grouped stats: count / exact sum / exact avg / exact stddev.
    * Ref: spark_etl.py:87-89 (per-type stats), 149-161 (district hourly).
    */
  val aggGroupStats = QueryDef(
    "q_agg_group_stats",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          count(lit(1)).as("n"),
          Exact.dsum(col("l_quantity")).as("sum_qty"),
          Exact.davg(col("l_extendedprice")).as("avg_price"),
          Exact.dstddev(col("l_discount")).as("std_disc")),
    Some(s"""SELECT l_returnflag, l_linestatus,
             COUNT(*) AS n,
             ${Sql.SUMD("l_quantity")} AS sum_qty,
             ${Sql.AVGD("l_extendedprice")} AS avg_price,
             ${Sql.STDDEVD("l_discount")} AS std_disc
             FROM lineitem GROUP BY l_returnflag, l_linestatus""")
  )

  /** J1 — broadcast hash join: fact x small dim, grouped revenue.
    * Ref: spark_etl.py:87-92 (stats enrichment join). The explicit
    * hint IS the J1 operator surface (the reference broadcasts its
    * stats table by hand); it keeps the fact side shuffle-free while
    * `part` fits an executor (GBs at mid SFs — fine). A dim that has
    * outgrown every executor needs the hint removed — the size-based
    * pattern q_join_star/q_star_fact use for their SF-scaling dims.
    */
  val joinBroadcast = QueryDef(
    "q_join_broadcast",
    (s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(
          count(lit(1)).as("n"),
          Exact.dsum2(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("revenue")),
    Some(s"""SELECT p_brand, COUNT(*) AS n,
             ${Sql.SUMD2("l_extendedprice", "1.0 - l_discount")} AS revenue
             FROM lineitem JOIN part ON l_partkey = p_partkey
             GROUP BY p_brand""")
  )

  /** J4 — star join across 4 dims: fact->orders->customer->nation->region.
    * Ref: app.py:90-93, warehouse_loader.py:317-320. Dims broadcast; the
    * only shuffle left is the final small groupBy.
    */
  val joinStar = QueryDef(
    "q_join_star",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val o  = Tables.orders(s, d)
      val c  = Tables.customer(s, d)
      val n  = Tables.nation(s, d)
      val r  = Tables.region(s, d)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        // customer scales with SF → size-based broadcast (Catalyst);
        // nation/region are FIXED 25/5 rows → hinted
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
          count(lit(1)).as("n_lines"),
          Exact.dsum2(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("revenue"))
    },
    Some(s"""SELECT r_name, n_name, COUNT(*) AS n_lines,
             ${Sql.SUMD2("l_extendedprice", "1.0 - l_discount")} AS revenue
             FROM lineitem
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation ON c_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
             GROUP BY r_name, n_name""")
  )

  /** J2/J8 — left outer join + null-surviving aggregation.
    * Ref: enhanced_spark_etl.py:432-437, real_data_schema.sql:197-198.
    */
  val joinLeft = QueryDef(
    "q_join_left",
    (s, d) =>
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"), "left")
        .groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("l_orderkey")).as("n_matched"),
          Exact.dsum(col("l_quantity")).as("sum_qty")),
    Some(s"""SELECT o_orderstatus, COUNT(*) AS n_rows,
             COUNT(l_orderkey) AS n_matched,
             ${Sql.SUMD("l_quantity")} AS sum_qty
             FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
             GROUP BY o_orderstatus""")
  )

  /** Semi join (EXISTS). Ref: SURVEY §2.3 note — validation diffs use
    * semi/anti; Spark `left_semi` avoids materializing the right side.
    */
  val joinSemi = QueryDef(
    "q_join_semi",
    (s, d) =>
      Tables.customer(s, d)
        .join(
          Tables.orders(s, d).filter(col("o_totalprice") > 400000.0),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment"),
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)""")
  )

  /** Anti join (NOT EXISTS). */
  val joinAnti = QueryDef(
    "q_join_anti",
    (s, d) =>
      Tables.customer(s, d)
        .join(
          Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name"),
    Some("""SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderpriority = '1-URGENT')""")
  )

  /** Bloom-prefiltered selective semi join — the runtime-filter pattern
    * Spark's own `InjectRuntimeFilter` applies, made explicit for the
    * case where the build side's KEY SET exceeds the broadcast-join
    * budget but a few-MB Bloom sketch of it does not (~10% of orders
    * here). Native twin of [[bloomJoin]]: that query emulates the
    * sketch portably so the oracle can check the pruning itself; this
    * one uses the production machinery end-to-end, in the exact shape
    * `InjectRuntimeFilter` rewrites plans into: a `BloomFilterAggregate`
    * over the build side's keys as a SCALAR SUBQUERY feeding the native
    * codegen'd `BloomFilterMightContain` on the fact scan (both sides
    * hash through `XxHash64`, so the pairing is exact), and the
    * residual exact semi join removes the ≤fpp false positives.
    *
    * Scale shape: the prefilter is map-only and cuts the fact side's
    * shuffle to ~selectivity + fpp before the join; at 100 TB that is
    * the difference between shuffling the whole fact table and ~10% of
    * it. The subquery form keeps plan CONSTRUCTION free: nothing
    * executes until the query runs (plan tooling — PlanDump, PlanSpec —
    * pays zero jobs), and the sketch never rides the plan as a binary
    * literal; `executedPlan.toString` shows the ~200-byte subquery plan
    * instead of a megabyte of bloom bits. Sketch capacity comes from
    * the engine's own runtime-filter sizing default
    * (`spark.sql.optimizer.runtime.bloomFilter.expectedNumItems`),
    * the same knob that governs the injected filters this query makes
    * explicit.
    */
  val bloomSemijoin = QueryDef(
    "q_bloom_semijoin",
    (s, d) => {
      import org.apache.spark.sql.GraftSql
      import org.apache.spark.sql.catalyst.expressions.{Alias, BloomFilterMightContain, ScalarSubquery, XxHash64}
      import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
      import org.apache.spark.sql.catalyst.plans.logical.Aggregate
      def hiSide = Tables.orders(s, d)
        .filter(col("o_totalprice") > 450000.0)
        .select(col("o_orderkey").cast("long").as("o_orderkey"))
      // fresh instantiation for the subquery so its attribute ids never
      // collide with the semi join's build side
      val sub = {
        val plan = hiSide.queryExecution.analyzed
        val agg = Alias(new BloomFilterAggregate(new XxHash64(Seq(plan.output.head)))
          .toAggregateExpression(), "orderkey_bloom")()
        ScalarSubquery(Aggregate(Nil, Seq(agg), plan))
      }
      val mightContain = GraftSql.column(
        BloomFilterMightContain(sub,
          new XxHash64(Seq(GraftSql.expression(col("l_orderkey").cast("long"))))))
      val hi = hiSide
      Tables.lineitem(s, d)
        .filter(mightContain)
        .join(hi, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_items"),
          Exact.dsum(col("l_quantity")).as("sum_qty"))
    },
    Some(s"""SELECT l_returnflag, COUNT(*) AS n_items,
             ${Sql.SUMD("l_quantity")} AS sum_qty
             FROM lineitem l
             WHERE EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_orderkey = l.l_orderkey
                             AND o.o_totalprice > 450000.0)
             GROUP BY l_returnflag""")
  )

  /** O2/O3 — deterministic top-k (TakeOrderedAndProject).
    * Ref: enhanced_spark_etl.py:689-702. Ties broken by key so the
    * selected set is unique in both engines.
    */
  val topK = QueryDef(
    "q_topk_customers",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), Exact.dsum(col("o_totalprice")).as("total_spend"))
        .orderBy(desc("total_spend"), asc("o_custkey"))
        .limit(10),
    Some(s"""SELECT o_custkey, COUNT(*) AS n_orders,
             ${Sql.SUMD("o_totalprice")} AS total_spend
             FROM orders GROUP BY o_custkey
             ORDER BY total_spend DESC, o_custkey LIMIT 10""")
  )

  /** A22 — HAVING on an aggregate (subquery-in-FROM shape).
    * Ref: app.py:48-57,183-196.
    */
  val havingFilter = QueryDef(
    "q_having",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_suppkey")
        .agg(
          count(lit(1)).as("n"),
          Exact.dsum2(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("revenue"))
        .filter(col("n") > 500),
    Some(s"""SELECT l_suppkey, COUNT(*) AS n,
             ${Sql.SUMD2("l_extendedprice", "1.0 - l_discount")} AS revenue
             FROM lineitem GROUP BY l_suppkey HAVING COUNT(*) > 500""")
  )

  /** A23 — CASE grading over aggregates. Ref: app.py:115-120. */
  val caseGrade = QueryDef(
    "q_case_grade",
    (s, d) => {
      val avgBal = Exact.davg(col("c_acctbal"))
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_cust"), avgBal.as("avg_bal"))
        .withColumn("grade",
          when(col("avg_bal") > 5000.0, "Excellent")
            .when(col("avg_bal") > 2500.0, "Good")
            .when(col("avg_bal") > 0.0, "Fair")
            .otherwise("Poor"))
    },
    Some(s"""SELECT n_name, n_cust, avg_bal,
             CASE WHEN avg_bal > 5000.0 THEN 'Excellent'
                  WHEN avg_bal > 2500.0 THEN 'Good'
                  WHEN avg_bal > 0.0 THEN 'Fair'
                  ELSE 'Poor' END AS grade
             FROM (SELECT n_name, COUNT(*) AS n_cust,
                          ${Sql.AVGD("c_acctbal")} AS avg_bal
                   FROM customer JOIN nation ON c_nationkey = n_nationkey
                   GROUP BY n_name)""")
  )

  /** A3/A6 — conditional aggregation: sum(when), count_if, countDistinct.
    * Ref: spark_etl.py:172-187, enhanced_spark_etl.py:156-165.
    */
  val conditionalAgg = QueryDef(
    "q_conditional_agg",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("n"),
          Exact.dsum(when(col("o_orderpriority") === "1-URGENT", col("o_totalprice"))).as("urgent_total"),
          sum(when(col("o_totalprice") > 300000.0, 1).otherwise(0)).as("n_large"),
          countDistinct(col("o_custkey")).as("n_cust")),
    Some(s"""SELECT o_orderstatus, COUNT(*) AS n,
             ${Sql.SUMD("CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END")} AS urgent_total,
             CAST(SUM(CASE WHEN o_totalprice > 300000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_large,
             COUNT(DISTINCT o_custkey) AS n_cust
             FROM orders GROUP BY o_orderstatus""")
  )

  /** A7 — per-column null counts in one pass. Ref: enhanced_spark_etl.py:167-170. */
  val nullCounts = QueryDef(
    "q_null_counts",
    (s, d) => {
      val df = Tables.customer(s, d)
      df.select(df.columns.toSeq.map(c =>
        sum(col(c).isNull.cast("int")).as(s"nulls_$c")): _*)
    },
    Some("""SELECT CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_c_custkey,
            CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_c_name,
            CAST(SUM(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_c_nationkey,
            CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_c_acctbal,
            CAST(SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_c_mktsegment
            FROM customer""")
  )

  /** A9 — global min/max/count/countDistinct. Ref: spark_etl.py:274-276.
    * (At 100 TB the distinct count swaps to approx_count_distinct; exact
    * here because the oracle must match.)
    */
  val globalStats = QueryDef(
    "q_global_stats",
    (s, d) =>
      Tables.lineitem(s, d)
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          min(col("l_shipdate")).as("min_ship"),
          max(col("l_shipdate")).as("max_ship"),
          Exact.dsum(col("l_extendedprice")).as("total_price")),
    Some(s"""SELECT COUNT(*) AS n, COUNT(DISTINCT l_orderkey) AS n_orders,
             MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship,
             ${Sql.SUMD("l_extendedprice")} AS total_price
             FROM lineitem""")
  )

  /** A19 — re-aggregation of an aggregate + derived rate.
    * Ref: enhanced_spark_etl.py:682-691.
    */
  val reAgg = QueryDef(
    "q_reagg_rate",
    (s, d) => {
      val perOrder = Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_lines"),
          sum(when(col("l_returnflag") === "R", 1).otherwise(0)).as("n_returned"))
      perOrder
        .groupBy("n_lines")
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("n_returned")).as("returned_lines"))
        .withColumn("return_rate_pct",
          round(col("returned_lines") * 100.0 / (col("n_lines") * col("n_orders")), 6))
    },
    Some("""SELECT n_lines, COUNT(*) AS n_orders, CAST(SUM(n_returned) AS BIGINT) AS returned_lines,
            ROUND(SUM(n_returned) * 100.0 / (n_lines * COUNT(*)), 6) AS return_rate_pct
            FROM (SELECT l_orderkey, COUNT(*) AS n_lines,
                         SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS n_returned
                  FROM lineitem GROUP BY l_orderkey)
            GROUP BY n_lines""")
  )

  /** A16 — pivot with pinned column set (deterministic schema).
    * Ref: enhanced_spark_etl.py:612; SURVEY §7.4 risk 4.
    */
  val pivotStatus = QueryDef(
    "q_pivot_status",
    (s, d) =>
      Tables.orders(s, d)
        .withColumn("order_year", year(col("o_orderdate")))
        .groupBy("order_year")
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(Exact.dsum(col("o_totalprice")))
        .na.fill(0.0, Seq("O", "F", "P"))
        .withColumnRenamed("O", "total_open")
        .withColumnRenamed("F", "total_filled")
        .withColumnRenamed("P", "total_pending"),
    Some(s"""SELECT EXTRACT(YEAR FROM o_orderdate) AS order_year,
             COALESCE(${Sql.SUMD("CASE WHEN o_orderstatus='O' THEN o_totalprice END")}, 0.0) AS total_open,
             COALESCE(${Sql.SUMD("CASE WHEN o_orderstatus='F' THEN o_totalprice END")}, 0.0) AS total_filled,
             COALESCE(${Sql.SUMD("CASE WHEN o_orderstatus='P' THEN o_totalprice END")}, 0.0) AS total_pending
             FROM orders GROUP BY 1""")
  )

  /** U1/U2 — union with schema alignment (unionByName).
    * Ref: enhanced_spark_etl.py:427-430; enhanced_ingestion pd.concat.
    */
  val unionBranches = QueryDef(
    "q_union",
    (s, d) => {
      val o = Tables.orders(s, d)
      val a = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_totalprice"), lit("urgent").as("bucket"))
      val b = o.filter(col("o_totalprice") > 450000.0)
        .select(col("o_orderkey"), col("o_totalprice"), lit("large").as("bucket"))
      a.unionByName(b)
    },
    Some("""SELECT o_orderkey, o_totalprice, 'urgent' AS bucket FROM orders
            WHERE o_orderpriority = '1-URGENT'
            UNION ALL
            SELECT o_orderkey, o_totalprice, 'large' AS bucket FROM orders
            WHERE o_totalprice > 450000.0""")
  )

  /** §2.8 scalar functions — math: abs/sqrt/pow-as-mul/round/sin/cos,
    * rounded to 6 dp so libm last-ulp differences cannot surface.
    * Ref: spark_etl.py:95,136-139; enhanced_spark_etl.py:228-244.
    */
  val scalarMath = QueryDef(
    "q_scalar_math",
    (s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          abs(col("p_retailprice") - lit(1000.0)).as("abs_diff"),
          round(sqrt(col("p_retailprice")), 6).as("sqrt_price"),
          (col("p_size") * col("p_size")).as("size_sq"),
          round(sin(col("p_size")), 6).as("sin_size"),
          round(cos(col("p_size")), 6).as("cos_size"),
          pmod(col("p_partkey"), lit(7)).as("key_mod")),
    Some("""SELECT p_partkey,
            ABS(p_retailprice - 1000.0) AS abs_diff,
            ROUND(SQRT(p_retailprice), 6) AS sqrt_price,
            p_size * p_size AS size_sq,
            ROUND(SIN(p_size), 6) AS sin_size,
            ROUND(COS(p_size), 6) AS cos_size,
            p_partkey % 7 AS key_mod
            FROM part""")
  )

  /** §2.8 scalar functions — string: upper/lower/concat/length/substring/
    * regexp_replace/rlike. Ref: warehouse_loader.py:181,206;
    * data_validator.py:59 (pattern rules).
    */
  val scalarString = QueryDef(
    "q_scalar_string",
    (s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          lower(col("p_brand")).as("brand_lower"),
          length(col("p_name")).as("name_len"),
          substring(col("p_type"), 1, 3).as("type_prefix"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowel"),
          col("p_brand").rlike("^Brand#1[0-9]$").cast("int").as("is_brand_1x"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type")),
    Some("""SELECT p_partkey,
            UPPER(p_name) AS name_upper,
            LOWER(p_brand) AS brand_lower,
            LENGTH(p_name) AS name_len,
            SUBSTRING(p_type, 1, 3) AS type_prefix,
            REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS name_novowel,
            CASE WHEN REGEXP_MATCHES(p_brand, '^Brand#1[0-9]$') THEN 1 ELSE 0 END AS is_brand_1x,
            CONCAT_WS('|', p_brand, p_type) AS brand_type
            FROM part""")
  )

  /** §2.8 date functions — year/month/day/hour/dayofweek/week/quarter.
    * Spark dayofweek is Sunday=1; DuckDB dow is Sunday=0 (oracle adds 1).
    * Ref: spark_etl.py:71-76; enhanced_spark_etl.py:210-212; SURVEY §7.4 risk 7.
    */
  val dateParts = QueryDef(
    "q_date_parts",
    (s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          dayofweek(col("o_orderdate")).cast("long").as("dow_sun1"),
          weekofyear(col("o_orderdate")).cast("long").as("iso_week"),
          quarter(col("o_orderdate")).cast("long").as("q"),
          date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("month_start"),
          (dayofweek(col("o_orderdate")).isin(1, 7)).cast("int").as("is_weekend")),
    Some("""SELECT o_orderkey,
            EXTRACT(YEAR FROM o_orderdate) AS y,
            EXTRACT(MONTH FROM o_orderdate) AS m,
            EXTRACT(DAY FROM o_orderdate) AS dom,
            EXTRACT(DOW FROM o_orderdate) + 1 AS dow_sun1,
            EXTRACT(WEEK FROM o_orderdate) AS iso_week,
            EXTRACT(QUARTER FROM o_orderdate) AS q,
            DATE_TRUNC('month', o_orderdate) AS month_start,
            CASE WHEN EXTRACT(DOW FROM o_orderdate) IN (0, 6) THEN 1 ELSE 0 END AS is_weekend
            FROM orders""")
  )

  /** P10 — null-safe guards: when/otherwise + coalesce + nullif.
    * Ref: spark_etl.py:127-130; enhanced_spark_etl.py:311-322,445.
    */
  val nullGuards = QueryDef(
    "q_null_guards",
    (s, d) =>
      Tables.customer(s, d)
        .select(
          col("c_custkey"),
          when(col("c_acctbal") < 0.0, 0.0).otherwise(col("c_acctbal")).as("bal_clamped"),
          coalesce(nullif(col("c_mktsegment"), lit("MACHINERY")), lit("OTHER")).as("seg_masked"),
          greatest(col("c_acctbal"), lit(100.0)).as("bal_floor"),
          least(col("c_acctbal"), lit(5000.0)).as("bal_cap")),
    Some("""SELECT c_custkey,
            CASE WHEN c_acctbal < 0.0 THEN 0.0 ELSE c_acctbal END AS bal_clamped,
            COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg_masked,
            GREATEST(c_acctbal, 100.0) AS bal_floor,
            LEAST(c_acctbal, 5000.0) AS bal_cap
            FROM customer""")
  )

  /** ROLLUP hierarchy totals (beyond the reference's flat GROUP BYs —
    * the subtotal/grand-total shape every BI layer on the warehouse
    * expects). grouping_id disambiguates subtotal rows from genuine
    * NULL keys; both engines use the Postgres bit convention (leftmost
    * key = most significant bit). Same partial-aggregation shuffle
    * budget as a flat group-by: Spark expands grouping sets map-side.
    */
  val rollupTotals = QueryDef(
    "q_rollup_totals",
    (s, d) =>
      Tables.orders(s, d)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          grouping_id().as("gid"),
          count(lit(1)).as("n_orders"),
          round(graft.util.Exact.dsum(col("o_totalprice")), 4).as("revenue")),
    Some(s"""SELECT o_orderstatus, o_orderpriority,
             CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
             COUNT(*) AS n_orders,
             ROUND(${Sql.SUMD("o_totalprice")}, 4) AS revenue
             FROM orders
             GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""")
  )

  /** CUBE over both dimensions (all 4 grouping sets). */
  val cubeTotals = QueryDef(
    "q_cube_totals",
    (s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          grouping_id().as("gid"),
          count(lit(1)).as("n_orders"),
          round(graft.util.Exact.dsum(col("o_totalprice")), 4).as("revenue")),
    Some(s"""SELECT o_orderstatus, o_orderpriority,
             CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
             COUNT(*) AS n_orders,
             ROUND(${Sql.SUMD("o_totalprice")}, 4) AS revenue
             FROM orders
             GROUP BY CUBE (o_orderstatus, o_orderpriority)""")
  )

  /** Bloom-filter join pruning, portable: an m = 8192-bit / k = 2
    * Bloom filter built over a selective dim subset (BUILDING-segment
    * customers) pre-filters the fact before the exact join would run.
    * The query emits the exact-semi-join count, the bloom-pass count,
    * and the false-positive rate among true non-members — i.e. it
    * oracle-checks the PRUNING ITSELF, not just a final answer.
    *
    * This is the hand-rolled twin of Spark's runtime bloom filter
    * (spark.sql.optimizer.runtime.bloomFilter): at 100 TB the win is
    * shuffling only bloom-passing fact rows into a large join. Bit
    * membership is two broadcast semi-joins on the occupied-bit set
    * (≤ m rows) — the fact side stays map-only; bit positions come
    * from two portable md5 lanes so both engines agree bit-exactly.
    */
  val bloomJoin = QueryDef(
    "q_bloom_join", {
      val m = 8192
      def hx(c: String) = s"md5(concat(cast($c as string), '#bloom'))"
      (s, d) => {
        import graft.functions.PortableHash
        def lane(c: String, l: Int) =
          expr(s"${PortableHash.laneSpark(hx(c), l)} % $m")
        val dim = Tables.customer(s, d)
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        val bits = dim
          .select(explode(array(lane("c_custkey", 0), lane("c_custkey", 1)))
            .as("bit")).distinct()
        val orders = Tables.orders(s, d)
          .select(col("o_custkey"),
            lane("o_custkey", 0).as("b0"), lane("o_custkey", 1).as("b1"))
        // r20: the three counts previously ran as three separate passes
        // over orders (two semi-joins + a plain count) stitched by
        // crossJoins. Every membership side is broadcast and unique-
        // keyed, so LEFT joins with marker columns preserve row count
        // exactly and all three counts fold into ONE map-only pass +
        // one agg (guide §2.4 — same result, two fewer corpus scans).
        orders
          .join(broadcast(bits.withColumnRenamed("bit", "b0")
            .withColumn("m0", lit(1))), Seq("b0"), "left")
          .join(broadcast(bits.withColumnRenamed("bit", "b1")
            .withColumn("m1", lit(1))), Seq("b1"), "left")
          .join(broadcast(dim.withColumn("me", lit(1))),
            col("o_custkey") === col("c_custkey"), "left")
          .agg(count(lit(1)).as("n_orders"),
            sum(when(col("me").isNotNull, 1L).otherwise(0L)).as("n_exact"),
            sum(when(col("m0").isNotNull && col("m1").isNotNull, 1L)
              .otherwise(0L)).as("n_bloom_pass"))
          .select(col("n_orders"), col("n_exact"), col("n_bloom_pass"),
            (col("n_bloom_pass") - col("n_exact")).as("n_false_pos"),
            round((col("n_bloom_pass") - col("n_exact")).cast("double") /
              (col("n_orders") - col("n_exact")), 6).as("fp_rate"))
      }
    },
    Some {
      val m = 8192
      def hx(c: String) = s"md5(CAST($c AS VARCHAR) || '#bloom')"
      def lane(c: String, l: Int) =
        s"${graft.functions.PortableHash.laneDuck(hx(c), l)} % $m"
      s"""WITH dim AS (SELECT c_custkey FROM customer
                       WHERE c_mktsegment = 'BUILDING'),
          bits AS (SELECT DISTINCT bit FROM (
                     SELECT unnest([${lane("c_custkey", 0)},
                                    ${lane("c_custkey", 1)}]) AS bit FROM dim)),
          o AS (SELECT o_custkey, ${lane("o_custkey", 0)} AS b0,
                       ${lane("o_custkey", 1)} AS b1 FROM orders),
          agg AS (SELECT
            (SELECT COUNT(*) FROM o) AS n_orders,
            (SELECT COUNT(*) FROM o
             WHERE o_custkey IN (SELECT c_custkey FROM dim)) AS n_exact,
            (SELECT COUNT(*) FROM o
             WHERE b0 IN (SELECT bit FROM bits)
               AND b1 IN (SELECT bit FROM bits)) AS n_bloom_pass)
          SELECT n_orders, n_exact, n_bloom_pass,
                 n_bloom_pass - n_exact AS n_false_pos,
                 ROUND(CAST(n_bloom_pass - n_exact AS DOUBLE)
                   / (n_orders - n_exact), 6) AS fp_rate
          FROM agg"""
    }
  )

  /** U3/U4 — INTERSECT / EXCEPT: customer-set overlap between two
    * order periods (churn/retention set algebra). Spark plans these as
    * distinct + left-semi/anti hash joins — one shuffle each over
    * already-deduped keys; the five scalar counts then cross-join as
    * 1-row broadcasts.
    */
  val setOps = QueryDef(
    "q_setops",
    (s, d) => {
      def half(lo: String, hi: String) =
        Tables.orders(s, d)
          .filter(col("o_orderdate").between(lo, hi))
          .select(col("o_custkey")).distinct()
      val a = half("1995-01-01", "1995-06-30")
      val b = half("1995-07-01", "1995-12-31")
      a.agg(count(lit(1)).as("n_h1"))
        .crossJoin(b.agg(count(lit(1)).as("n_h2")))
        .crossJoin(a.intersect(b).agg(count(lit(1)).as("n_both")))
        .crossJoin(a.except(b).agg(count(lit(1)).as("n_only_h1")))
        .crossJoin(b.except(a).agg(count(lit(1)).as("n_only_h2")))
    },
    Some("""WITH a AS (SELECT DISTINCT o_custkey FROM orders
                       WHERE o_orderdate BETWEEN '1995-01-01' AND '1995-06-30'),
                 b AS (SELECT DISTINCT o_custkey FROM orders
                       WHERE o_orderdate BETWEEN '1995-07-01' AND '1995-12-31')
            SELECT (SELECT COUNT(*) FROM a) AS n_h1,
                   (SELECT COUNT(*) FROM b) AS n_h2,
                   (SELECT COUNT(*) FROM
                      (SELECT * FROM a INTERSECT SELECT * FROM b)) AS n_both,
                   (SELECT COUNT(*) FROM
                      (SELECT * FROM a EXCEPT SELECT * FROM b)) AS n_only_h1,
                   (SELECT COUNT(*) FROM
                      (SELECT * FROM b EXCEPT SELECT * FROM a)) AS n_only_h2""")
  )

  /** Percent-of-total (ratio_to_report): each (status, priority)
    * revenue as a share of its status total. The share denominator is
    * a window SUM over the GROUPED rows (≤ statuses × priorities), and
    * it sums the DECIMAL partials — exact, order-free — so the final
    * double division matches the oracle bit-exactly.
    */
  val shareOfTotal = QueryDef(
    "q_share",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_orderstatus")
      Tables.orders(s, d)
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(Exact.D)).as("rev_d"))
        .select(col("o_orderstatus"), col("o_orderpriority"), col("n_orders"),
          col("rev_d").cast("double").as("revenue"),
          round(col("rev_d").cast("double") /
            sum(col("rev_d")).over(w).cast("double"), 6).as("share_in_status"))
    },
    Some("""WITH g AS (SELECT o_orderstatus, o_orderpriority,
                              COUNT(*) AS n_orders,
                              SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev_d
                       FROM orders GROUP BY 1, 2)
            SELECT o_orderstatus, o_orderpriority, n_orders,
                   CAST(rev_d AS DOUBLE) AS revenue,
                   ROUND(CAST(rev_d AS DOUBLE) /
                     CAST(SUM(rev_d) OVER (PARTITION BY o_orderstatus)
                          AS DOUBLE), 6) AS share_in_status
            FROM g""")
  )

  /** The salted two-stage aggregation under the correctness gate: the
    * same per-(flag, status) count+sum as `q_agg_group_stats`, computed
    * via `Salt.saltedAgg` (hot keys spread over 8 reducers, DECIMAL
    * partials merged in a second tiny agg). The oracle is the PLAIN
    * group-by — proving the salted plan is bit-identical to the
    * unsalted answer on real data, for any salt distribution, which is
    * what makes it safe to deploy against a skewed 100 TB key.
    */
  val saltedAgg = QueryDef(
    "q_salted_agg",
    (s, d) =>
      graft.operators.Salt.saltedAgg(
        Tables.lineitem(s, d),
        Seq("l_returnflag", "l_linestatus"), "l_quantity", buckets = 8),
    Some(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
             ${Sql.SUMD("l_quantity")} AS sum_value
             FROM lineitem GROUP BY 1, 2""")
  )

  /** Per-brand skyline (Pareto frontier) of parts: the size/price
    * trade-off curve — a part is on the frontier iff no same-brand part
    * is at least as large AND at least as cheap with one strict. The
    * naive formulation is an O(n²) dominance self-join; the 2-D
    * skyline collapses to TWO window minima instead: a part is
    * dominated exactly when some STRICTLY larger part is no pricier
    * (running min of price over the larger-size range frame) or some
    * equal-size part is strictly cheaper (min over the size group).
    *
    * Scale shape: one shuffle on brand, windows ride the same
    * partitioning (PARTITION BY brand keeps every window partition
    * bounded by a brand's parts — no global sort, no single-partition
    * window); the range frame needs only the sort the window already
    * does. Dominance tests are exact integer/double comparisons — no
    * rounding anywhere, so the oracle matches bit-for-bit.
    */
  val skyline = QueryDef(
    "q_skyline",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val larger = Window.partitionBy("p_brand").orderBy(col("p_size").desc)
        .rangeBetween(Window.unboundedPreceding, -1)
      val sameSize = Window.partitionBy("p_brand", "p_size")
      Tables.part(s, d)
        .withColumn("min_larger", min(col("p_retailprice")).over(larger))
        .withColumn("min_same", min(col("p_retailprice")).over(sameSize))
        .filter((col("min_larger").isNull ||
          col("p_retailprice") < col("min_larger")) &&
          col("p_retailprice") === col("min_same"))
        .select(col("p_brand"), col("p_partkey"), col("p_size"),
          col("p_retailprice"))
        .orderBy(col("p_brand"), col("p_size"), col("p_partkey"))
    },
    Some("""WITH w AS (
              SELECT p_brand, p_partkey, p_size, p_retailprice,
                MIN(p_retailprice) OVER (PARTITION BY p_brand
                  ORDER BY p_size DESC
                  RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS min_larger,
                MIN(p_retailprice) OVER (PARTITION BY p_brand, p_size)
                  AS min_same
              FROM part)
            SELECT p_brand, p_partkey, p_size, p_retailprice
            FROM w
            WHERE (min_larger IS NULL OR p_retailprice < min_larger)
              AND p_retailprice = min_same
            ORDER BY p_brand, p_size, p_partkey""")
  )

  /** Join-key skew audit — the diagnostic a 100 TB operator runs
    * BEFORE picking a join strategy (and the trigger for reaching for
    * [[graft.operators.Salt]]): for each candidate join key of the fact
    * table, the key-frequency profile — distinct keys, rows, mean and
    * max rows per key, the hottest key's share, and a skew flag when
    * the hottest key carries > 10× the mean (the rule-of-thumb
    * threshold where one reducer becomes the straggler).
    *
    * Scale shape: the three key columns unpivot in ONE map pass
    * (explode of 3 (key_col, key) structs — no per-key extra scans),
    * the per-key counts are one partial agg keyed by (key_col, key),
    * and the profile re-aggregates the REDUCED count table — the
    * q_tfidf re-agg pattern. All integer counts; ratios round at 6 dp.
    */
  val skewAudit = QueryDef(
    "q_skew_audit",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val keyed = li.select(explode(array(
        struct(lit("l_orderkey").as("key_col"), col("l_orderkey").as("k")),
        struct(lit("l_partkey").as("key_col"), col("l_partkey").as("k")),
        struct(lit("l_suppkey").as("key_col"), col("l_suppkey").as("k"))))
        .as("e"))
        .select(col("e.key_col"), col("e.k"))
      keyed.groupBy("key_col", "k").agg(count(lit(1)).as("c"))
        .groupBy("key_col")
        .agg(count(lit(1)).as("n_distinct"),
          sum(col("c")).as("n_rows"),
          max(col("c")).as("max_per_key"))
        .select(col("key_col"), col("n_distinct"), col("n_rows"),
          round(col("n_rows").cast("double") / col("n_distinct"), 6)
            .as("avg_per_key"),
          col("max_per_key"),
          round(col("max_per_key").cast("double") / col("n_rows"), 6)
            .as("top1_share"),
          (col("max_per_key").cast("double") >
            lit(10.0) * (col("n_rows").cast("double") / col("n_distinct")))
            .cast("int").as("skew_flag"))
        .orderBy("key_col")
    },
    Some("""WITH keyed AS (
              SELECT 'l_orderkey' AS key_col, l_orderkey AS k FROM lineitem
              UNION ALL
              SELECT 'l_partkey', l_partkey FROM lineitem
              UNION ALL
              SELECT 'l_suppkey', l_suppkey FROM lineitem),
            cnt AS (SELECT key_col, k, COUNT(*) AS c FROM keyed GROUP BY 1, 2)
            SELECT key_col,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct,
                   CAST(SUM(c) AS BIGINT) AS n_rows,
                   ROUND(CAST(SUM(c) AS DOUBLE) / COUNT(*), 6) AS avg_per_key,
                   CAST(MAX(c) AS BIGINT) AS max_per_key,
                   ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS top1_share,
                   CASE WHEN CAST(MAX(c) AS DOUBLE) >
                     10.0 * (CAST(SUM(c) AS DOUBLE) / COUNT(*))
                     THEN 1 ELSE 0 END AS skew_flag
            FROM cnt GROUP BY key_col
            ORDER BY key_col""")
  )

  def all: Seq[QueryDef] = Seq(
    scanProject, filterCompound, distinctKeys, distinctSketch,
    groupDistinctSketch, aggGroupStats,
    joinBroadcast, bloomJoin, setOps, shareOfTotal, saltedAgg,
    joinStar, joinLeft, joinSemi, joinAnti, bloomSemijoin, topK,
    havingFilter, caseGrade,
    conditionalAgg, nullCounts, globalStats, reAgg, pivotStatus,
    unionBranches, scalarMath, scalarString, dateParts, nullGuards,
    rollupTotals, cubeTotals, skyline, skewAudit)
}
