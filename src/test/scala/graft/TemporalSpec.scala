package graft

import graft.operators.{AsOf, ConnectedComponents}
import org.apache.spark.sql.functions._

/** As-of join, bucketed range join, connected components: hand-computed
  * micro-cases plus an equivalence check against the naive plan.
  */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  test("joinAsOf: latest state at or before each probe, nulls before first state") {
    val left = Seq((1L, "k1", 10L), (2L, "k1", 25L), (3L, "k1", 5L), (4L, "k2", 50L))
      .toDF("id", "k", "t")
    val right = Seq(("k1", 10L, "a"), ("k1", 20L, "b"), ("k2", 60L, "c"))
      .toDF("k", "t", "v")
    val out = AsOf.joinAsOf(left, right, "k", "t", Seq("v"))
      .select("id", "v", "asof_time").as[(Long, Option[String], Option[Long])]
      .collect().sortBy(_._1)
    // id 1 @t=10: state "a" @10 matches inclusively; id 2 @25 -> "b"@20;
    // id 3 @5: before any state -> null; id 4 @50: k2 state is @60 -> null
    assert(out === Seq(
      (1L, Some("a"), Some(10L)), (2L, Some("b"), Some(20L)),
      (3L, None, None), (4L, None, None)))
  }

  test("joinAsOf plans one window over the union, no theta join") {
    val left = Seq((1L, "k1", 10L)).toDF("id", "k", "t")
    val right = Seq(("k1", 5L, "x")).toDF("k", "t", "v")
    val plan = AsOf.joinAsOf(left, right, "k", "t", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("connected components: min-label per component, chains and isolates") {
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (6L, 5L), (7L, 7L))
      .toDF("a", "b")
    val comps = ConnectedComponents.components(edges, "a", "b")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(comps === Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (5L, 5L), (6L, 5L), (7L, 7L)))
  }

  test("connected components: a 64-node chain converges in O(log n) rounds") {
    // worst case for plain propagation (diameter = n); pointer jumping
    // must finish well inside the default 20-round cap — without it,
    // components() would throw its non-convergence guard here
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("a", "b")
    val comps = ConnectedComponents.components(chain, "a", "b", maxIter = 12)
      .as[(Long, Long)].collect()
    assert(comps.length === 64 && comps.forall(_._2 === 0L))
  }

  test("bucketed range join equals the naive theta join on sf0.001") {
    val bucketed = queries.Temporal.rangeJoin.fn(spark, sf0001)
    val ev = Tables.events(spark, sf0001)
      .withColumn("us", expr("unix_micros(cast(ts as timestamp))"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("us").as("c_us"))
    val naive = ev.filter(col("event_type") === "purchase")
      .join(clicks,
        col("user_id") === col("c_user") &&
          col("c_us") >= col("us") - 1800000000L && col("c_us") <= col("us"),
        "left")
      .groupBy("event_id", "user_id")
      .agg(count(col("c_us")).as("n_clicks_30m"))
    assert(bucketed.exceptAll(naive).isEmpty && naive.exceptAll(bucketed).isEmpty)
  }

  test("joinAsOf equals the naive per-row latest-state scan on random data") {
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val left = (1 to 60).map(i =>
        (i.toLong, s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong))
      val right = (1 to 40).map(i =>
        (s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong, i.toLong))
        // unique per (key, time) — the operator's documented requirement
        .groupBy(t => (t._1, t._2)).map(_._2.maxBy(_._3)).toSeq
      val out = AsOf.joinAsOf(
        left.toDF("id", "k", "t"), right.toDF("k", "t", "v"), "k", "t", Seq("v"))
        .select("id", "v").as[(Long, Option[Long])].collect().toMap
      val expected = left.map { case (id, k, t) =>
        val matches = right.filter(r => r._1 == k && r._2 <= t)
        id -> (if (matches.isEmpty) None
               else Some(matches.maxBy(r => (r._2, r._3))._3))
      }.toMap
      assert(out === expected, s"seed $seed")
      assert(out.size === left.size, "as-of must preserve left cardinality")
    }
  }

  test("sample split is deterministic and ~80/10/10") {
    val out = queries.Sampling.sampleSplit.fn(spark, sf0001)
    val counts = out.groupBy("split").count().as[(String, Long)].collect().toMap
    val n = counts.values.sum
    assert(counts("train") > n / 2, counts)
    assert(out.exceptAll(queries.Sampling.sampleSplit.fn(spark, sf0001)).isEmpty)
  }

  test("q_changepoint: ranked by |z|, full windows only, finite scores") {
    val rows = SparkEntry.queries("q_changepoint")(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val zs = rows.map(_.getDouble(4))
    assert(zs.forall(z => !z.isNaN && !z.isInfinite))
    assert(zs.map(math.abs).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
      "not sorted by |shift_z| desc")
    rows.foreach { r =>
      // a full 6-before window means the flagged hour sits at least 6
      // series points past the start — never the series head itself
      assert(r.getDouble(2) > 0.0 && r.getDouble(3) > 0.0,
        s"hourly means must be positive for this value domain: $r")
    }
  }
}
