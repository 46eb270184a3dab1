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

  def all: Seq[QueryDef] = Seq(asofJoin, rangeJoin, zorderKey)
}
