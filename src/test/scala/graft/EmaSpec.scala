package graft

import org.apache.spark.sql.functions._

/** Hand-computed check of the q_ema fold (α = 0.2): the oracle proves
  * cross-engine equality, this proves the recurrence itself.
  */
class EmaSpec extends SparkSpec {
  import spark.implicits._

  test("EMA left fold matches the recurrence by hand") {
    // values 1, 2, 3 in time order:
    // e0 = 1; e1 = 0.8*1 + 0.2*2 = 1.2; e2 = 0.8*1.2 + 0.2*3 = 1.56
    val df = Seq((1L, 1L, 1.0), (1L, 2L, 2.0), (1L, 3L, 3.0))
      .toDF("user_id", "event_id", "value")
      .withColumn("ts", timestamp_seconds(col("event_id") * 60))
    val ema = df.groupBy("user_id")
      .agg(collect_list(struct(col("ts"), col("event_id"), col("value"))).as("evs"))
      .select(expr("""aggregate(
          slice(transform(array_sort(evs), e -> e.value), 2, size(evs) - 1),
          transform(array_sort(evs), e -> e.value)[0],
          (acc, x) -> acc * cast(0.8 as double) + x * cast(0.2 as double))""")
        .as("ema"))
      .collect()(0).getDouble(0)
    assert(math.abs(ema - 1.56) < 1e-12)
  }

  test("single-event user: EMA is the value itself") {
    val df = Seq((9L, 1L, 42.5)).toDF("user_id", "event_id", "value")
      .withColumn("ts", timestamp_seconds(col("event_id")))
    val ema = df.groupBy("user_id")
      .agg(collect_list(struct(col("ts"), col("event_id"), col("value"))).as("evs"))
      .select(expr("""aggregate(
          slice(transform(array_sort(evs), e -> e.value), 2, size(evs) - 1),
          transform(array_sort(evs), e -> e.value)[0],
          (acc, x) -> acc * cast(0.8 as double) + x * cast(0.2 as double))""")
        .as("ema"))
      .collect()(0).getDouble(0)
    assert(ema === 42.5)
  }

  test("q_holt_forecast matches a driver-side reference fold per user") {
    val out = SparkEntry.queries("q_holt_forecast")(spark, sf0001).collect()
      .map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val series = Tables.events(spark, sf0001)
      .select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.keySet === series.keySet)
    series.foreach { case (uid, rows) =>
      val vals = rows.sortBy(t =>
        (t._2.toEpochSecond(java.time.ZoneOffset.UTC), t._2.getNano, t._3))
        .map(_._4)
      var l = vals.head; var b = 0.0
      vals.tail.foreach { x =>
        val nl = x * 0.3 + (l + b) * 0.7
        val nb = (nl - l) * 0.2 + b * 0.8
        l = nl; b = nb
      }
      val (lv, tr, f1, f3) = out(uid)
      assert(lv === r6(l), s"user $uid level")
      assert(tr === r6(b), s"user $uid trend")
      assert(f1 === r6(l + b), s"user $uid fc_1")
      assert(f3 === r6(l + b * 3), s"user $uid fc_3")
    }
  }
}
