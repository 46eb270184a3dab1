package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.AsOf
import org.apache.spark.sql.functions._

/** Temporal join operators over `events`: point-in-time (as-of) join
  * and windowed range (band) join — the two join shapes the reference's
  * relational surface lacks (SURVEY §2.3 "not present") but that any
  * event pipeline needs at scale (attribution, state lookup).
  *
  * Both are built to survive 100 TB: the as-of join is a union +
  * single-shuffle running-last window (see [[graft.operators.AsOf]]);
  * the range join buckets time so candidates come from an equi-join on
  * (key, bucket) — never a theta-join pair explosion.
  */
object Temporal {

  /** Oracle-side ts, truncated ns→µs exactly like Tables.events. */
  private val OTS = "CAST(ts AS TIMESTAMP)"

  /** J-asof — each click attached to the same user's most recent
    * purchase at or before it (classic last-touch attribution).
    * Purchases are pre-reduced to one row per (user, ts) so tie-breaks
    * are deterministic in both engines.
    */
  val asofJoin = QueryDef(
    "q_asof_join",
    (s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts")
        .agg(max(col("event_id")).as("p_event_id"),
          max_by(col("value"), col("event_id")).as("p_value"))
      AsOf.joinAsOf(clicks, purchases, key = "user_id", time = "ts",
        payload = Seq("p_event_id", "p_value"))
    },
    Some(s"""WITH c AS (SELECT event_id, user_id, $OTS AS ts FROM events
                        WHERE event_type = 'click'),
             p AS (SELECT user_id, $OTS AS ts, MAX(event_id) AS p_event_id,
                          ARG_MAX(value, event_id) AS p_value
                   FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
             SELECT c.event_id, c.user_id, c.ts,
                    p.p_event_id, p.p_value, p.ts AS asof_time
             FROM c ASOF LEFT JOIN p
               ON c.user_id = p.user_id AND c.ts >= p.ts""")
  )

  /** J-range — clicks within the 30 minutes before each purchase by the
    * same user (attribution-window count), as a BUCKETED band join: both
    * sides bucket time into window-width cells, each purchase probes its
    * own and the previous bucket (2 probe rows — a [t-W, t] range spans
    * at most 2 cells), the join is pure equi on (user, bucket), and the
    * exact band predicate filters inside the join. At 100 TB this is one
    * hash-partitioned shuffle; the naive theta join is quadratic per
    * user and never runs.
    */
  val rangeJoin = QueryDef(
    "q_range_join",
    (s, d) => {
      val W = 1800L * 1000000L // 30 min in microseconds
      val ev = Tables.events(s, d)
        .withColumn("us", expr("unix_micros(cast(ts as timestamp))"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("us").as("c_us"),
          expr(s"us div $W").as("c_bk"))
      val probes = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("us"))
        .withColumn("bk", explode(array(expr(s"us div $W"), expr(s"us div $W - 1"))))
      probes.join(clicks,
          probes("user_id") === clicks("c_user") && probes("bk") === clicks("c_bk") &&
            clicks("c_us") >= probes("us") - W && clicks("c_us") <= probes("us"),
          "left")
        .groupBy("event_id", "user_id")
        .agg(count(col("c_us")).as("n_clicks_30m"))
    },
    Some(s"""WITH e AS (SELECT event_id, user_id, event_type,
                               epoch_us($OTS) AS us FROM events)
             SELECT p.event_id, p.user_id, COUNT(c.us) AS n_clicks_30m
             FROM e p LEFT JOIN e c
               ON c.user_id = p.user_id AND c.event_type = 'click'
              AND c.us BETWEEN p.us - 1800000000 AND p.us
             WHERE p.event_type = 'purchase'
             GROUP BY 1, 2""")
  )

  /** Z-order key derivation under the correctness gate: the Morton
    * code `Sources.writeZOrdered` sorts by, computed over (user
    * bucket, minute-of-day bucket) for every event, plus the per-file
    * tile summary a layout job reports (events per z-tile of 256
    * codes). Pure integer shift/mask arithmetic — bit-identical in
    * both engines, so the oracle pins the exact interleave the layout
    * relies on. Map-only + one tiny hash-agg.
    */
  val zorderKey = QueryDef(
    "q_zorder_key",
    (s, d) => {
      val a = col("user_id") % 256
      val b = (hour(col("ts")) * 60 + minute(col("ts"))) % 256
      Tables.events(s, d)
        .select((graft.sources.Sources.mortonCode(a, b) / 256)
          .cast("long").as("z_tile"))
        .groupBy("z_tile")
        .agg(count(lit(1)).as("n_events"))
    },
    Some {
      val a = "(user_id % 256)"
      val b = "((hour(ts) * 60 + minute(ts)) % 256)"
      val z = (0 until 8).map { i =>
        s"((($a >> $i) & 1) << ${2 * i}) + ((($b >> $i) & 1) << ${2 * i + 1})"
      }.mkString("(", " + ", ")")
      s"""SELECT CAST($z // 256 AS BIGINT) AS z_tile,
                 CAST(COUNT(*) AS BIGINT) AS n_events
          FROM events GROUP BY 1"""
    }
  )

  /** Point-in-time-correct feature join against an SCD2 dimension —
    * the feature-store op that keeps training data honest: each order
    * (training example) must see the customer segment that was valid
    * ON ITS ORDER DATE, not today's row. The classic bug — joining the
    * CURRENT dim version — silently teaches the model tomorrow's
    * features; the output carries both the PIT value and the
    * current-version value with a `leaky` flag, so the query doubles
    * as the leakage audit (count leaky rows = how much training data a
    * naive join would corrupt).
    *
    * Dim versions: the q_scd2_merge scenario with the flip INSIDE the
    * fact's date range (custkey % 100 = 0 upgraded effective
    * 1998-01-01, orders span 1995–2001) — so both failure directions
    * exist: pre-1998 orders of upgraded customers are leaky under a
    * current-join, post-1998 ones are not.
    *
    * Scale shape: an EQUI-join on the surrogate key with the validity
    * interval as a residual predicate — per-key multiplicity is the
    * version count (≤ 2 here, bounded by dim churn, NOT by fact
    * volume), so this is a plain hash join, never a banded or theta
    * join; the dim is broadcastable after version explosion exactly
    * when the base dim was.
    */
  val pitFeatures = QueryDef(
    "q_pit_features",
    (s, d) => {
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
      val flip = pmod(col("c_custkey"), lit(100)) === 0
      val dim =
        cust.filter(!flip)
          .select(col("c_custkey"), col("c_mktsegment").as("segment"),
            lit("1990-01-01").cast("date").as("valid_from"),
            lit(null).cast("date").as("valid_to"))
        .unionByName(cust.filter(flip)
          .select(col("c_custkey"), col("c_mktsegment").as("segment"),
            lit("1990-01-01").cast("date").as("valid_from"),
            lit("1998-01-01").cast("date").as("valid_to")))
        .unionByName(cust.filter(flip)
          .select(col("c_custkey"), lit("UPGRADED").as("segment"),
            lit("1998-01-01").cast("date").as("valid_from"),
            lit(null).cast("date").as("valid_to")))
      val current = dim.filter(col("valid_to").isNull)
        .select(col("c_custkey").as("cur_custkey"),
          col("segment").as("current_segment"))
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          to_date(col("o_orderdate")).as("order_date"))
      o.join(broadcast(dim), col("o_custkey") === col("c_custkey") &&
          col("order_date") >= col("valid_from") &&
          (col("valid_to").isNull || col("order_date") < col("valid_to")))
        .join(broadcast(current), col("o_custkey") === col("cur_custkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("order_date"),
          col("segment").as("pit_segment"), col("current_segment"),
          (col("segment") =!= col("current_segment")).cast("long").as("leaky"))
    },
    Some("""WITH dim AS (
              SELECT c_custkey, c_mktsegment AS segment,
                     CAST('1990-01-01' AS DATE) AS valid_from,
                     CAST(NULL AS DATE) AS valid_to
              FROM customer WHERE c_custkey % 100 <> 0
              UNION ALL
              SELECT c_custkey, c_mktsegment,
                     CAST('1990-01-01' AS DATE), CAST('1998-01-01' AS DATE)
              FROM customer WHERE c_custkey % 100 = 0
              UNION ALL
              SELECT c_custkey, 'UPGRADED',
                     CAST('1998-01-01' AS DATE), CAST(NULL AS DATE)
              FROM customer WHERE c_custkey % 100 = 0),
            cur AS (SELECT c_custkey, segment AS current_segment
                    FROM dim WHERE valid_to IS NULL)
            SELECT o.o_orderkey, o.o_custkey,
                   CAST(o.o_orderdate AS DATE) AS order_date,
                   d.segment AS pit_segment, c.current_segment,
                   CAST(CASE WHEN d.segment <> c.current_segment
                        THEN 1 ELSE 0 END AS BIGINT) AS leaky
            FROM orders o
            JOIN dim d ON o.o_custkey = d.c_custkey
              AND CAST(o.o_orderdate AS DATE) >= d.valid_from
              AND (d.valid_to IS NULL OR CAST(o.o_orderdate AS DATE) < d.valid_to)
            JOIN cur c ON o.o_custkey = c.c_custkey""")
  )

  def all: Seq[QueryDef] = Seq(asofJoin, rangeJoin, zorderKey, pitFeatures)
}
