package graft.tools

import graft.streaming.Streams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Attribution of the bounded-run streaming "floor" (r15 verdict #6):
  * `q_stream_attrib` / `q_stream_attrib_outer` / `q_stream_upsert`
  * hold the top of the bench suite at ~2.0–2.5 s each. This runs each
  * one's exact stream shape at TWO scale factors and splits the wall
  * time into the micro-batch machinery's own phases from
  * `StreamingQueryProgress.durationMs` — trigger count × per-trigger
  * overhead (query planning, offset WAL, commit) vs actual data work
  * (addBatch, which contains the state-store IO) — so "machinery
  * floor, constant in data" is measured rather than asserted: if the
  * floor were data work, the sf0.01→sf0.1 wall ratio would track the
  * 10× data; if it is per-trigger overhead, wall time stays ~flat
  * while addBatch's share grows.
  *
  * Results merge into STREAM_BENCH.json under `bounded_floor` (the
  * sustained-throughput segments of tools/StreamBench stay untouched).
  *
  * Usage: `sbt "runMain graft.tools.StreamFloor"`.
  */
object StreamFloor {

  private final case class Run(
      wallSecs: Double, batches: Int, durations: Map[String, Long])

  private def capture(q: org.apache.spark.sql.streaming.StreamingQuery,
      t0: Long): Run = {
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9
    val ps = q.recentProgress.toSeq
    val keys = ps.flatMap(p =>
      scala.jdk.CollectionConverters.MapHasAsScala(p.durationMs)
        .asScala.keys).distinct
    val sums = keys.map { k =>
      k -> ps.map(p => Option(p.durationMs.get(k)).map(_.longValue)
        .getOrElse(0L)).sum
    }.toMap
    Run(wall, ps.length, sums)
  }

  private def runOnce(spark: SparkSession, name: String, d: String): Run = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val t0 = System.nanoTime()
      val q = name match {
        case "q_stream_attrib" =>
          Streams.attributionJoin(Streams.readEvents(spark, d))
            .writeStream.format("memory").queryName("floor_attrib")
            .outputMode("append").trigger(Trigger.AvailableNow()).start()
        case "q_stream_attrib_outer" =>
          Streams.attributionJoinOuter(Streams.readEvents(spark, d))
            .writeStream.format("memory").queryName("floor_attrib_outer")
            .outputMode("append").trigger(Trigger.AvailableNow()).start()
        case "q_stream_upsert" =>
          val statusPath = graft.util.TempRoot.fresh("floor_upsert") + "/status"
          Streams.readEvents(spark, d).writeStream
            .foreachBatch((b: DataFrame, _: Long) =>
              Streams.statusUpsert(b, statusPath))
            .trigger(Trigger.AvailableNow()).start()
      }
      capture(q, t0)
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      try spark.sql("DROP TABLE IF EXISTS floor_attrib") catch {
        case scala.util.control.NonFatal(_) => ()
      }
      try spark.sql("DROP TABLE IF EXISTS floor_attrib_outer") catch {
        case scala.util.control.NonFatal(_) => ()
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("stream-floor")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names = Seq("q_stream_attrib", "q_stream_attrib_outer", "q_stream_upsert")
    val sfs = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    // one untimed warm run per query (JIT + state-store init off the clock)
    names.foreach(n => runOnce(spark, n, sfs.head))

    def j(v: Double) = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val perQuery = names.map { n =>
      val bySf = sfs.map { d =>
        val runs = (1 to 3).map(_ => runOnce(spark, n, d))
        val best = runs.minBy(_.wallSecs)
        val sf = d.stripPrefix("/root/testdata/")
        Console.err.println(f"[stream-floor] $n $sf wall=${best.wallSecs}%.2f " +
          s"batches=${best.batches} durations=${best.durations}")
        val durJson = best.durations.toSeq.sortBy(_._1)
          .map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
        s"""\"$sf\":{"wall_secs":${j(best.wallSecs)},"batches":${best.batches},"duration_ms_sums":$durJson}"""
      }.mkString(",")
      s"\"$n\":{$bySf}"
    }.mkString(",")

    val floor =
      s"""{"queries":{$perQuery},"cpus":"$cpus",""" +
        """"note":"bounded AvailableNow replay of the three slowest stream-family gate queries at two SFs, best of 3 after an untimed warm run. duration_ms_sums are summed across micro-batches from StreamingQueryProgress: triggerExecution is the whole trigger; addBatch is the data+state work inside it; the rest (queryPlanning, walCommit, commitOffsets, getBatch, latestOffset) is per-trigger machinery. A wall time ~flat across the 10x SF step with machinery dominating duration_ms_sums = trigger-count floor, constant in data."}"""

    // merge under "bounded_floor", preserving StreamBench's segments
    val path = java.nio.file.Paths.get("/root/repo/STREAM_BENCH.json")
    val prev = new String(java.nio.file.Files.readAllBytes(path),
      java.nio.charset.StandardCharsets.UTF_8).trim
    // bounded_floor is always the LAST key this tool appends — truncate
    // any previous copy at its start instead of regex-matching nested
    // braces
    val base = {
      val i = prev.indexOf(",\"bounded_floor\":")
      if (i >= 0) prev.substring(0, i) + "}" else prev
    }
    val merged = base.stripSuffix("}") + s""","bounded_floor":$floor}"""
    java.nio.file.Files.writeString(path, merged)
    println(s"""{"metric":"stream_floor","detail":"STREAM_BENCH.json#bounded_floor"}""")
    spark.stop()
  }
}
