package graft.tools

import graft.streaming.Streams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

/** Attribution of the bounded-run streaming "floor" (r15 verdict #6,
  * deepened r17 per verdict #1): `q_stream_attrib` /
  * `q_stream_attrib_outer` / `q_stream_upsert` hold the top of the
  * bench suite at ~2.0–2.5 s each. This runs each one's exact stream
  * shape at TWO scale factors and splits the wall time into the
  * micro-batch machinery's own phases from
  * `StreamingQueryProgress.durationMs` — trigger count × per-trigger
  * overhead (query planning, offset WAL, commit) vs actual data work
  * (addBatch) — so "machinery floor, constant in data" is measured
  * rather than asserted.
  *
  * r17 deepening — the r16 verdict observed that ~76% of the floor
  * sits INSIDE addBatch, which the note lumped as "data+state work".
  * Two additions split it one level further:
  *
  *   - `state_ms` from `StreamingQueryProgress.stateOperators`:
  *     allUpdatesTimeMs + allRemovalsTimeMs + commitTimeMs summed
  *     across batches — the state-store put/evict/commit share.
  *   - a stateless CONTROL (`control_scan`): the same source read
  *     twice through the same click/purchase filters, unioned into the
  *     same memory sink with no stateful operator. Its addBatch bounds
  *     the scan + sink + per-batch task-scheduling share.
  *
  * addBatch − state_ms − control_addBatch ≈ the join operator's own
  * row work + incremental-plan execution residue. The split lands in
  * STREAM_BENCH.json#bounded_floor as `addBatch_split` per query/SF.
  *
  * Results merge into STREAM_BENCH.json under `bounded_floor` (the
  * sustained-throughput segments of tools/StreamBench stay untouched).
  *
  * Usage: `sbt "runMain graft.tools.StreamFloor"`.
  * `SPARK_GRAFT_FLOOR_PARTS` (default 2 — the volume-sized posture the
  * gate queries adopted after the r17 8/4/2/1 sweep; set 8 to
  * reproduce the pre-r17 baseline) sweeps the state-partition count
  * for the experiment in SCALING.md.
  */
object StreamFloor {

  private final case class Run(
      wallSecs: Double, batches: Int, durations: Map[String, Long],
      stateUpdatesMs: Long, stateRemovalsMs: Long, stateCommitMs: Long,
      stateRowsTotal: Long, phasesMs: Map[String, Long] = Map.empty)

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
    val ops = ps.flatMap(_.stateOperators.toSeq)
    Run(wall, ps.length, sums,
      stateUpdatesMs = ops.map(_.allUpdatesTimeMs).sum,
      stateRemovalsMs = ops.map(_.allRemovalsTimeMs).sum,
      stateCommitMs = ops.map(_.commitTimeMs).sum,
      stateRowsTotal = if (ops.isEmpty) 0L else ops.map(_.numRowsTotal).max)
  }

  private def parts: String = sys.env.getOrElse("SPARK_GRAFT_FLOOR_PARTS", "2")

  /** A/B knob for the checkpoint-placement experiment: default is the
    * engine posture (RAM-backed ephemeral checkpoint for bounded runs,
    * [[graft.util.TempRoot.ephemeral]]); SPARK_GRAFT_FLOOR_DISK_CKPT=1
    * reproduces the pre-r17 disk-backed temp checkpoint.
    */
  private def ckpt(name: String): String =
    if (sys.env.get("SPARK_GRAFT_FLOOR_DISK_CKPT").contains("1"))
      graft.util.TempRoot.fresh(s"ckpt_$name")
    else graft.util.TempRoot.ephemeral(s"ckpt_$name")

  /** r18 verdict #4: the state-store provider A/B. "rocksdb" swaps in
    * Spark's RocksDBStateStoreProvider (bundled rocksdbjni) for the
    * run; anything else keeps the default HDFS-backed in-memory map.
    * Set per run, before the query starts, against a fresh checkpoint
    * (the provider is pinned into a checkpoint at first start).
    */
  private val RocksCls = "org.apache.spark.sql.execution.streaming." +
    "state.RocksDBStateStoreProvider"

  private def runOnce(spark: SparkSession, name: String, d: String,
      provider: String = "hdfs"): Run = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    val prevProv = try Some(spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass"))
      catch { case scala.util.control.NonFatal(_) => None }
    if (provider == "rocksdb")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", RocksCls)
    // the upsert's foreachBatch interior (layout read, touched-bucket
    // probe, Commit.publish write/harvest/manifest) is invisible to
    // StreamingQueryProgress — it all lands in addBatch. PhaseTimer's
    // in-process sink captures those phases per run.
    if (name == "q_stream_upsert") graft.util.PhaseTimer.accumulate(true)
    try {
      val t0 = System.nanoTime()
      val q = name match {
        case "q_stream_attrib" =>
          Streams.attributionJoin(Streams.readEvents(spark, d))
            .writeStream.format("memory").queryName("floor_attrib")
            .option("checkpointLocation", ckpt("floor_attrib"))
            .outputMode("append").trigger(Trigger.AvailableNow()).start()
        case "q_stream_attrib_outer" =>
          Streams.attributionJoinOuter(Streams.readEvents(spark, d))
            .writeStream.format("memory").queryName("floor_attrib_outer")
            .option("checkpointLocation", ckpt("floor_attrib_outer"))
            .outputMode("append").trigger(Trigger.AvailableNow()).start()
        case "q_stream_upsert" =>
          val statusPath = graft.util.TempRoot.fresh("floor_upsert") + "/status"
          Streams.readEvents(spark, d).writeStream
            .foreachBatch((b: DataFrame, _: Long) =>
              Streams.statusUpsert(b, statusPath))
            .option("checkpointLocation", ckpt("floor_upsert"))
            .trigger(Trigger.AvailableNow()).start()
        case "control_scan" =>
          // stateless twin of the attrib source shape: the same stream
          // scanned twice through the same two filters, unioned, same
          // sink — everything the join pays EXCEPT state + shuffle
          val ev = Streams.readEvents(spark, d)
          val clicks = ev.filter(col("event_type") === "click")
            .select(col("user_id"), col("ts"), col("event_id"))
          val purchases = ev.filter(col("event_type") === "purchase")
            .select(col("user_id"), col("ts"), col("event_id"))
          purchases.unionByName(clicks)
            .writeStream.format("memory").queryName("floor_control_scan")
            // same checkpoint routing as the queries it controls for —
            // otherwise the DISK_CKPT A/B would switch the stateful
            // arms' medium while the control stayed on the default
            // disk temp path, biasing the addBatch_split attribution
            .option("checkpointLocation", ckpt("floor_control_scan"))
            .outputMode("append").trigger(Trigger.AvailableNow()).start()
      }
      val run = capture(q, t0)
      if (name == "q_stream_upsert")
        run.copy(phasesMs = graft.util.PhaseTimer.totalsMs)
      else run
    } finally {
      graft.util.PhaseTimer.accumulate(false)
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      prevProv match {
        case Some(c) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", c)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
      org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      Seq("floor_attrib", "floor_attrib_outer", "floor_control_scan")
        .foreach { t =>
          try spark.sql(s"DROP TABLE IF EXISTS $t") catch {
            case scala.util.control.NonFatal(_) => ()
          }
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

    val names = Seq("q_stream_attrib", "q_stream_attrib_outer",
      "q_stream_upsert", "control_scan")
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
          s"batches=${best.batches} durations=${best.durations} " +
          s"state(upd=${best.stateUpdatesMs},rm=${best.stateRemovalsMs}," +
          s"commit=${best.stateCommitMs},rows=${best.stateRowsTotal})")
        val durJson = best.durations.toSeq.sortBy(_._1)
          .map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
        val addBatch = best.durations.getOrElse("addBatch", 0L)
        val stateMs = best.stateUpdatesMs + best.stateRemovalsMs +
          best.stateCommitMs
        // r18: the upsert's addBatch residual names its interior — the
        // PhaseTimer sink's per-phase totals from inside foreachBatch
        // (upsert.total covers statusUpsert; publish.* are the Commit
        // write/harvest/manifest phases within it; addBatch −
        // upsert.total is the foreachBatch sink machinery itself)
        val phasesJson =
          if (best.phasesMs.isEmpty) ""
          else best.phasesMs.toSeq.sortBy(_._1)
            .map { case (k, v) => s"\"$k\":$v" }
            .mkString(""","upsert_phases_ms":{""", ",", "}")
        val split =
          s"""{"state_updates_ms":${best.stateUpdatesMs},""" +
            s""""state_removals_ms":${best.stateRemovalsMs},""" +
            s""""state_commit_ms":${best.stateCommitMs},""" +
            s""""state_rows_total":${best.stateRowsTotal},""" +
            s""""residual_ms":${math.max(0L, addBatch - stateMs)}""" +
            phasesJson + "}"
        s"""\"$sf\":{"wall_secs":${j(best.wallSecs)},"batches":${best.batches},""" +
          s""""duration_ms_sums":$durJson,"addBatch_split":$split}"""
      }.mkString(",")
      s"\"$n\":{$bySf}"
    }.mkString(",")

    // ---- state-store provider A/B (r18 verdict #4) ----------------
    // Same bounded replay, both providers, fresh checkpoints, one
    // untimed warm per (query, provider) so RocksDB's JNI/library init
    // is off the clock. The joins are where the floor lives (4 stores
    // per partition); the A/B answers whether the default HDFS-backed
    // map is the right resident for state volumes the gate sees.
    val abQueries = Seq("q_stream_attrib", "q_stream_attrib_outer")
    val providers = Seq("hdfs", "rocksdb")
    val providerAb = providers.map { prov =>
      abQueries.foreach(n => runOnce(spark, n, sfs.head, prov)) // warm
      val byQuery = abQueries.map { n =>
        val bySf = sfs.map { d =>
          val best = (1 to 3).map(_ => runOnce(spark, n, d, prov))
            .minBy(_.wallSecs)
          val sf = d.stripPrefix("/root/testdata/")
          val stateMs = best.stateUpdatesMs + best.stateRemovalsMs +
            best.stateCommitMs
          Console.err.println(
            f"[stream-floor] AB $prov $n $sf wall=${best.wallSecs}%.2f " +
              s"state_ms=$stateMs rows=${best.stateRowsTotal}")
          s"""\"$sf\":{"wall_secs":${j(best.wallSecs)},""" +
            s""""addBatch_ms":${best.durations.getOrElse("addBatch", 0L)},""" +
            s""""state_updates_ms":${best.stateUpdatesMs},""" +
            s""""state_removals_ms":${best.stateRemovalsMs},""" +
            s""""state_commit_ms":${best.stateCommitMs},""" +
            s""""state_rows_total":${best.stateRowsTotal}}"""
        }.mkString(",")
        s"\"$n\":{$bySf}"
      }.mkString(",")
      s"\"$prov\":{$byQuery}"
    }.mkString(",")

    val floor =
      s"""{"queries":{$perQuery},"provider_ab":{$providerAb},""" +
        s""""cpus":"$cpus","state_partitions":$parts,""" +
        """"note":"bounded AvailableNow replay of the three slowest stream-family gate queries at two SFs, best of 3 after an untimed warm run. duration_ms_sums sum across micro-batches from StreamingQueryProgress; addBatch_split divides addBatch into the state-store share (allUpdatesTimeMs/allRemovalsTimeMs/commitTimeMs from stateOperators, summed TASK time) and the residual. control_scan is the STATELESS twin of the attrib source shape (same double scan + filters + memory sink, no join): its addBatch bounds the scan/sink/task-machinery share. r17 findings: (a) state-operator task time dominates addBatch and is ROW-COUNT-INDEPENDENT — a fixed cost per (task, store, micro-batch) unit (~70ms each; a stream-stream join runs 4 stores/partition); (b) checkpoint medium is irrelevant (ext4 vs tmpfs A/B flat) — the floor is NOT checkpoint I/O; (c) the partition sweep (SPARK_GRAFT_FLOOR_PARTS 8/4/2/1) gave wall 2.5/2.1/2.0/2.0s — the gate queries now run 2 state partitions, sized to state volume per the runToTable contract. The remaining ~1.9s floor = 2 batches x (state machinery ~270ms + scan ~130-260ms + incremental planning ~210ms + offset/WAL ~190ms). r18 finding (upsert_phases_ms, the PhaseTimer split of the foreachBatch interior): the q_stream_upsert residual is NOT the commit path — manifest write 14-19ms and footer harvest ~90ms are flat and small; it is the two per-epoch Spark jobs: the touched-bucket probe and the merge write. Re-pointing the probe at the raw key column (pruned scan + partial distinct, no max_by reduction, no cache) cut it 662->261ms and addBatch 1344->1143ms at sf0.1; the dominant remaining term is the merge-write job itself (~740ms), i.e. Spark job scheduling + the one bounded aggregation+parquet write per epoch — the actual floor of a transactional per-epoch MERGE. r19 finding (provider_ab): RocksDB vs the default HDFS-backed map at the gate state volumes (4k/40k rows) — RocksDB is uniformly SLOWER (attrib sf0.1 wall 2.39->2.86s, outer 2.30->3.12s; state task-ms ~2x, the commit leg worst: RocksDB pays checkpoint/snapshot machinery per store per epoch while 40k rows cost the in-memory map nothing). The DEFAULT STAYS: RocksDB's regime is state that outgrows executor memory (multi-GB per partition, where the map OOMs); at 100 TB the operator sizing rule is state_rows x row_width vs executor heap — switch providers per query there, not globally."}"""

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
