package graft

import graft.sources.{Generator, Sources}
import graft.pipeline.Replay
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    graft.util.TempRoot.freshDir("graft-src").toString

  test("S1/S2: CSV round-trip, explicit schema beats inference") {
    val dir = tmp()
    Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "v")
      .write.option("header", "true").csv(s"$dir/csv")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("v", DoubleType)))
    val exp = Sources.readCsv(spark, s"$dir/csv", schema)
    assert(exp.schema === schema)
    assert(exp.count() === 2)
    val inf = Sources.readCsvInferred(spark, s"$dir/csv")
    assert(inf.count() === 2)
  }

  test("S1 hardened: malformed CSV rows quarantine, clean rows load") {
    val dir = tmp()
    // 3 parseable rows + 2 malformed (bad long, wrong arity)
    val lines = Seq(
      "id,name,v",
      "1,a,1.5",
      "not_a_long,b,2.5",
      "2,c,3.5",
      "3,d",
      "4,e,4.5")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/in.csv"),
      String.join("\n", lines: _*).getBytes)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("v", DoubleType)))
    val good = Sources.readCsvQuarantine(
      spark, s"$dir/in.csv", schema, s"$dir/quarantine", "b1")
    assert(good.count() === 3)
    assert(good.columns.toSeq === Seq("id", "name", "v"))
    val q = spark.read.parquet(s"$dir/quarantine")
    assert(q.count() === 2)
    // raw lines survive verbatim for replay after the upstream fix
    val rawLines = q.select("raw_line").as[String].collect().toSet
    assert(rawLines === Set("not_a_long,b,2.5", "3,d"))
    assert(q.select("load_batch").distinct().as[String].collect().toSeq === Seq("b1"))
  }

  test("range-sorted write: files cover disjoint key ranges (file-skipping layout)") {
    val dir = tmp()
    val ev = Tables.events(spark, sf0001).select("event_id", "ts", "value")
    Sources.writeRangeSorted(ev, s"$dir/sorted", "ts", 4)
    val parts = new java.io.File(s"$dir/sorted").listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts.length === 4)
    // per-file (min, max) of the sort key must be pairwise disjoint —
    // that is the property parquet footer stats turn into file skipping
    // TIMESTAMP_NTZ: compare as ISO strings (lexicographic == temporal)
    val ranges = parts.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .select(min("ts").cast("string"), max("ts").cast("string")).head
      (r.getString(0), r.getString(1))
    }.sortBy(_._1)
    assert(ev.count() === spark.read.parquet(s"$dir/sorted").count())
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"file ranges overlap: $hi1 > $lo2")
      case _ =>
    }
  }

  test("z-ordered write: files cover rectangles in BOTH dims, not stripes") {
    val dir = tmp()
    // the full 256x256 grid, uniform: the ideal layout splits it into
    // 16 64x64 tiles (Morton's recursive quadrant structure)
    val grid = spark.range(65536)
      .select((col("id") % 256).as("a"), (col("id") / 256).cast("long").as("b"))
    Sources.writeZOrdered(grid, s"$dir/z", col("a"), col("b"), 16)
    def spans(path: String): Array[(Long, Long)] =
      new java.io.File(path).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .map { f =>
          val r = spark.read.parquet(f.getAbsolutePath)
            .select(max("a") - min("a"), max("b") - min("b")).head
          (r.getLong(0), r.getLong(1))
        }
    val z = spans(s"$dir/z")
    assert(z.length === 16)
    assert(spark.read.parquet(s"$dir/z").count() === 65536)
    // range-partition boundaries are sampled, so a file may straddle a
    // quadrant edge — but most files must be near-tiles, bounded in
    // BOTH dimensions
    assert(z.count { case (sa, sb) => sa <= 128 && sb <= 128 } >= 12,
      z.mkString(","))
    // contrast: single-key sort gives thin stripes — every file spans
    // (nearly) the full b range; that is the layout z-ordering replaces
    Sources.writeRangeSorted(
      grid.select(col("a"), col("b")), s"$dir/stripe", "a", 16)
    val s = spans(s"$dir/stripe")
    assert(s.count { case (_, sb) => sb >= 192 } >= 12, s.mkString(","))
  }

  test("schema evolution: mergeSchema unions additive columns, nulls the gap") {
    val dir = tmp()
    // v1 batch: 3 columns; v2 batch (post-evolution): adds quality
    Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "name", "v")
      .write.parquet(s"$dir/t/batch=1")
    Seq((3L, "c", 3.0, 0.9)).toDF("id", "name", "v", "quality")
      .write.parquet(s"$dir/t/batch=2")
    val merged = Sources.readParquetEvolved(spark, s"$dir/t")
    assert(merged.columns.toSet === Set("id", "name", "v", "quality", "batch"))
    assert(merged.count() === 3)
    // pre-evolution rows surface the new column as null
    assert(merged.filter(col("quality").isNull).count() === 2)
    assert(merged.filter(col("quality") === 0.9).select("id").head.getLong(0) === 3L)
  }

  test("S5/S6: partitioned write prunes partitions on read") {
    val dir = tmp()
    val df = Seq(
      ("2025-05-01 10:00:00", 1.0), ("2025-05-02 11:00:00", 2.0),
      ("2025-06-01 12:00:00", 3.0))
      .toDF("t", "v").select(to_timestamp(col("t")).as("timestamp"), col("v"))
    Sources.writePartitioned(df, s"$dir/part")
    val back = spark.read.parquet(s"$dir/part")
    assert(back.count() === 3)
    val pruned = back.filter(col("month") === 5)
    assert(pruned.count() === 2)
    // partition filter must reach the scan, not a post-scan Filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("month"), plan)
  }

  test("S7/S13: coalesced parquet and JSON report sinks") {
    val dir = tmp()
    val df = (1 to 100).toDF("n").repartition(8)
    Sources.writeCoalesced(df, s"$dir/coal", n = 2)
    val files = new java.io.File(s"$dir/coal").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length === 2)
    Sources.writeJsonReport(df.agg(sum("n").as("total")), s"$dir/report")
    assert(spark.read.json(s"$dir/report").collect()(0).getLong(0) === 5050L)
  }

  test("compaction: many tiny files -> byte-sized file count, same rows") {
    val dir = tmp()
    // a streaming-style landing dir: 40 tiny files
    (1 to 4000).toDF("n").repartition(40).write.parquet(s"$dir/landing")
    val landed = new java.io.File(s"$dir/landing").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(landed.length === 40)
    val totalBytes = landed.map(_.length()).sum
    // target = ~half the data -> expect 2 output files
    val n = Sources.compact(spark, s"$dir/landing", s"$dir/compacted",
      targetBytes = (totalBytes + 1) / 2)
    assert(n === 2)
    val out = new java.io.File(s"$dir/compacted").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(out.length === 2)
    // repartition (not coalesce) -> uniform files; and no rows lost
    assert(spark.read.parquet(s"$dir/compacted").count() === 4000)
    val sizes = out.map(_.length()).sorted
    assert(sizes.last < sizes.head * 2, sizes.mkString(","))
    // the original landing dir is untouched (swap is the caller's job)
    assert(new java.io.File(s"$dir/landing").listFiles()
      .count(_.getName.endsWith(".parquet")) === 40)
  }

  test("S3: latest-file discovery picks newest by mtime") {
    val dir = tmp()
    val f1 = new java.io.File(dir, "data_1.csv")
    val f2 = new java.io.File(dir, "data_2.csv")
    java.nio.file.Files.writeString(f1.toPath, "a")
    java.nio.file.Files.writeString(f2.toPath, "b")
    f1.setLastModified(1000000L)
    f2.setLastModified(2000000L)
    assert(Sources.latestFile(dir, "data_").get.endsWith("data_2.csv"))
  }

  test("S11: generator is deterministic, 14,400 rows, sane ranges") {
    val g1 = Generator.readings(spark)
    assert(g1.count() === 14400L)
    val stats = g1.agg(
      countDistinct(col("sensor_id")).as("sensors"),
      countDistinct(col("district")).as("districts"),
      countDistinct(col("sensor_type")).as("types"),
      avg(col("anomaly_flag")).as("anomaly_rate"),
      min(col("quality_score")).as("min_q"),
      max(col("quality_score")).as("max_q")).collect()(0)
    assert(stats.getLong(0) === 20L)
    assert(stats.getLong(1) === 5L)
    assert(stats.getLong(2) === 4L)
    assert(stats.getDouble(3) > 0.005 && stats.getDouble(3) < 0.05)
    assert(stats.getDouble(4) >= 0.8 && stats.getDouble(5) <= 1.0)
    // deterministic across runs
    val h1 = g1.agg(sum(hash(g1.columns.map(col): _*))).collect()(0).getLong(0)
    val h2 = Generator.readings(spark)
      .agg(sum(hash(g1.columns.map(col): _*))).collect()(0).getLong(0)
    assert(h1 === h2)
  }

  test("S8/S9: JDBC sink + scan round-trip (embedded Derby)") {
    val dir = tmp()
    System.setProperty("derby.system.home", dir) // derby.log etc. out of the repo
    System.setProperty("derby.stream.error.file", s"$dir/derby.log")
    val url = s"jdbc:derby:$dir/wh;create=true"
    val driver = "org.apache.derby.jdbc.EmbeddedDriver"
    val dim = Seq((1L, "Central", 10.5), (2L, "North", 20.25), (3L, "South", 30.0))
      .toDF("district_key", "district_name", "avg_flow")
    Sources.writeJdbc(dim.coalesce(1), url, "dim_districts", driver)
    val back = Sources.readJdbc(spark, url, "dim_districts", driver)
    assert(back.count() === 3)
    assert(back.select("district_key", "district_name", "avg_flow")
      .as[(Long, String, Double)].collect().toSet ===
      Set((1L, "Central", 10.5), (2L, "North", 20.25), (3L, "South", 30.0)))
    // append mode grows the table (warehouse load semantics)
    Sources.writeJdbc(dim.coalesce(1), url, "dim_districts", driver,
      mode = org.apache.spark.sql.SaveMode.Append)
    assert(Sources.readJdbc(spark, url, "dim_districts", driver).count() === 6)
    // filters are pushed into the remote JDBC query, not post-scan
    val filtered = Sources.readJdbc(spark, url, "dim_districts", driver)
      .filter($"district_key" === 2L)
    assert(filtered.count() === 2)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("JDBCRelation") && plan.contains("PushedFilters"), plan)
  }

  test("bucketed tables join with zero exchanges (co-located join)") {
    // managed tables land in the session's default warehouse dir
    // (spark-warehouse/, gitignored); DROP TABLE below removes the data
    val facts = Tables.events(spark, sf0001).select("event_id", "user_id", "value")
    val other = Tables.events(spark, sf0001).select("user_id", "ts")
      .groupBy("user_id").count()
    Sources.writeBucketed(facts, "b_facts", "user_id", 4)
    Sources.writeBucketed(other, "b_users", "user_id", 4)
    try {
      // force the large-join path so a broadcast can't hide the shuffle
      val joined = spark.table("b_facts").hint("merge")
        .join(spark.table("b_users").hint("merge"), "user_id")
      assert(joined.count() > 0)
      val p = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      // matching bucket layouts on the join key: no Exchange on either
      // side — the write-time shuffle is amortized over every join
      assert(!p.contains("Exchange"), p)
      assert(p.contains("SortMergeJoin"), p)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_users")
    }
  }

  test("ORC sink/scan round-trip with predicate pushdown") {
    val dir = tmp()
    val df = Tables.events(spark, sf0001).select("event_id", "user_id", "value")
    Sources.writeOrc(df, s"$dir/orc")
    val back = Sources.readOrc(spark, s"$dir/orc").filter(col("user_id") === 3)
    assert(back.count() ===
      df.filter(col("user_id") === 3).count())
    val p = back.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("user_id"), p)
  }

  test("pipeline replay produces the gold rollup with pipeline invariants") {
    val gold = Replay.run(spark).cache()
    val n = gold.count()
    // 5 districts × 4 types co-occur per sensor slot; hours span 30×24
    assert(n > 0 && n <= 20L * 30 * 24)
    val agg = gold.agg(
      sum(col("n_readings")).as("total"),
      sum(col("n_anomalies")).as("anoms")).collect()(0)
    assert(agg.getLong(0) === 14400L) // every reading lands in one group
    assert(agg.getLong(1) > 0)
  }

  test("observed replay reports summary metrics on the single pipeline action") {
    val (gold, obs) = Replay.runObserved(spark)
    gold.count() // the one action; metrics ride along, no extra jobs
    val m = obs.get
    assert(m("n_rows") === 14400L)
    assert(m("n_anomalies").asInstanceOf[Long] > 0L)
    assert(m("n_spikes").asInstanceOf[Long] > 0L)
    val q = m("avg_quality").asInstanceOf[Double]
    assert(q >= 0.8 && q <= 1.0)
  }
}
