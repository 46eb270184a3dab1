package graft.warehouse

import graft.Tables
import graft.util.Exact
import graft.sources.Sources
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The dashboard's gold layer as MATERIALIZED warehouse artifacts —
  * the reference serves its <100 ms dashboard from an indexed Postgres
  * star schema of PRE-AGGREGATED facts (hourly fact
  * /root/reference/sql/enhanced_data_schema.sql:279-322, daily MV
  * :440-464; the app queries them, /root/reference/src/app.py:26-196),
  * not from raw readings. The Spark-native equivalent: stage the
  * rollups once per source snapshot as bucketed warehouse tables and
  * make every `q_dash_*` a CONSUMER. At 100 TB the rollup build is one
  * ETL job per snapshot; the dashboard then scans tables that are
  * smaller than the raw facts by the rollup ratio (hours × users vs
  * raw readings) and arrive pre-partitioned on the serving key.
  *
  * Three artifacts, each the coarsest grain that still answers its
  * consumers EXACTLY (the DuckDB oracles keep running against the raw
  * tables, so staged-path results must hash-match the raw-path ones):
  *
  *  - `gold_events_hourly` at (user_id, event_type, hour): COUNT plus
  *    DECIMAL(18,4) partial sums ([[Exact.D]]). Decimal sums are
  *    associative, so re-aggregating partials to any coarser grain
  *    (per-user alerts, per-type rollups, hour-of-day profiles) gives
  *    bit-identical doubles to a raw scan. The distinct-counted
  *    columns (user_id) stay IN the grain, so countDistinct re-derives
  *    exactly.
  *  - `gold_events_recent` at (user_id, event_type) over the trailing
  *    7 days: the dashboard's "recent" window is relative to the
  *    row-level MAX(ts), which almost never falls on an hour boundary —
  *    an hourly rollup cannot reproduce it exactly (the cutoff hour is
  *    partial). Materializing the windowed slice at snapshot grain is
  *    exact, and is precisely the reference's "current KPIs" MV shape.
  *  - `gold_star_segment` at (segment, customer_key, priority_key):
  *    the orders star fact reduced to customer grain — the two
  *    distinct-counted keys stay in the grain; price mass is decimal.
  *
  * The per-row JSON quality extraction (props → q) happens ONCE here
  * at build time instead of per dashboard refresh.
  */
object GoldStage {

  private val SrcTables = Seq("events", "orders", "customer")

  private def hourlyName(t: String) = s"gold_events_hourly_$t"
  private def recentName(t: String) = s"gold_events_recent_$t"
  private def starName(t: String)   = s"gold_star_segment_$t"

  /** (user_id, event_type, h) + n, v_sum/v_cnt, q_sum/q_cnt —
    * bucketed by user_id.
    */
  def hourly(s: SparkSession, d: String): DataFrame =
    { val t = ensure(s, d); s.table(hourlyName(t)) }

  /** Trailing-7-day slice at (user_id, event_type) + n, q_sum/q_cnt —
    * bucketed by user_id.
    */
  def recent(s: SparkSession, d: String): DataFrame =
    { val t = ensure(s, d); s.table(recentName(t)) }

  /** (segment, customer_key, priority_key) + n, p_sum/p_cnt —
    * bucketed by segment.
    */
  def starSegment(s: SparkSession, d: String): DataFrame =
    { val t = ensure(s, d); s.table(starName(t)) }

  private def ensure(s: SparkSession, d: String): String = {
    val t = Staging.tag(s, d, SrcTables)
    Staging.ensure(s, "gold", d, s"gold_$t")(build(s, d, t))
    t
  }

  /** The per-row quality extraction the gold layer pays once at build
    * time (props JSON → q).
    */
  private[graft] def withQuality(ev: DataFrame): DataFrame =
    ev.withColumn("q",
      expr("cast(get_json_object(props, '$.k') as double) / 100.0"))

  /** The hourly fact's partial aggregation at (user_id, event_type, h)
    * grain — COUNTs plus DECIMAL sums, all associative, shared by the
    * snapshot build and [[refreshHourly]] so the two paths can never
    * drift in grain or measure definitions.
    */
  private[graft] def hourlyPartials(ev: DataFrame): DataFrame = ev
    .groupBy(col("user_id"), col("event_type"),
      date_trunc("hour", col("ts")).as("h"))
    .agg(
      count(lit(1)).as("n"),
      sum(col("value").cast(Exact.D)).as("v_sum"),
      count(col("value")).as("v_cnt"),
      sum(col("q").cast(Exact.D)).as("q_sum"),
      count(col("q")).as("q_cnt"))

  private def build(s: SparkSession, d: String, t: String): Unit = {
    Seq(hourlyName(t), recentName(t), starName(t))
      .foreach(Staging.freshTarget(s, _))

    // snapshot-sized bucket width (rollups REDUCE, so expansion is
    // just decompression; min 8 holds at every local fixture)
    val b = Staging.bucketsFor(s, d, SrcTables, expansion = 8)
    Staging.withShuffleWidth(s, b) {
    // one scan of events serves both event-side rollups
    val ev = withQuality(Tables.events(s, d))

    val hourly0 = hourlyPartials(ev)
      .repartition(b, col("user_id"))
    Sources.writeBucketed(hourly0, hourlyName(t), "user_id", b)

    // 7-day window relative to the ROW-LEVEL max(ts): the 1-row max is
    // broadcast and the comparison stays distributed (no driver pull)
    val mx = ev.agg(max(col("ts")).as("gold_max_ts"))
    val recent0 = ev.join(broadcast(mx))
      .filter(col("ts") >= col("gold_max_ts") - expr("INTERVAL 7 DAYS"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("q").cast(Exact.D)).as("q_sum"),
        count(col("q")).as("q_cnt"))
      .repartition(b, col("user_id"))
    Sources.writeBucketed(recent0, recentName(t), "user_id", b)

    val fact = graft.queries.Warehouse.starFact.fn(s, d)
    val star0 = fact
      .groupBy(col("segment"), col("customer_key"), col("priority_key"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("total_price").cast(Exact.D)).as("p_sum"),
        count(col("total_price")).as("p_cnt"))
      .repartition(b, col("segment"))
    Sources.writeBucketed(star0, starName(t), "segment", b)
    }
  }

  /** Incremental maintenance of the hourly gold fact — the refresh
    * model a continuously-ingesting 100 TB warehouse needs. The
    * snapshot-keyed [[hourly]] build above rescans events per
    * snapshot, which is right for immutable test fixtures but wrong
    * for a table that accretes a few million rows an hour: production
    * MV maintenance folds ONLY the new batch in (the reference
    * refreshes its daily MV on a schedule for the same reason —
    * enhanced_data_schema.sql:440-464).
    *
    * Every hourly measure is an ASSOCIATIVE partial (counts + DECIMAL
    * sums), so the fold is: partial-aggregate the batch at the same
    * grain ([[hourlyPartials]] — shared with the snapshot build, so
    * the two paths cannot drift), merge-sum with the current partials
    * at the keys, and rewrite ONLY the user-buckets the batch touched
    * (dynamic partition overwrite — the same bounded-write-
    * amplification pattern as `Streams.statusUpsert`; at production
    * scale the identical shape is one Delta/Iceberg MERGE). A batch
    * touching one user costs one bucket of IO however large the
    * accumulated fact grows.
    *
    * Exactness: decimal addition is associative-commutative, so the
    * incrementally-maintained table is BIT-IDENTICAL to a from-scratch
    * rebuild over the union of all batches (GoldIncrementalSpec
    * proves equality on real splits, including re-summed partial
    * types). The re-sum widens decimal precision; it is cast back to
    * the partial's declared type — exact while the per-key value mass
    * stays under 10^24, which a (user, type, hour) grain cannot
    * approach.
    *
    * Publication goes through [[graft.sources.Commit]]: the merged
    * touched-bucket slices land in a NEW version dir and become
    * visible in one atomic pointer swap, with untouched buckets
    * carried forward by manifest entry (no IO). A job killed mid-write
    * leaves readers on the previous complete snapshot (CommitSpec
    * kills one and proves it) — the crash-safety the reference gets
    * from Postgres transactions on its MV refresh
    * (enhanced_data_schema.sql:440-467). Because the merge now reads
    * committed version dirs and writes a fresh one, no
    * read-what-you-overwrite materialization barrier is needed.
    * Unlike statusUpsert's last-writer-wins, an additive merge is NOT
    * idempotent under batch replay: exactly-once batch delivery is
    * the CALLER's contract (foreachBatch batchId dedup, or a MERGE
    * keyed on a batch id column in production).
    */
  def refreshHourly(batch: DataFrame, path: String, buckets: Int = 16): Unit = {
    val spark = batch.sparkSession
    def bucketed(df: DataFrame) = df.withColumn("bucket",
      pmod(col("user_id"), lit(buckets)).cast("int"))
    val incoming = hourlyPartials(withQuality(batch))
    val sumType = incoming.schema("v_sum").dataType
    // cache the partials: the touched-bucket probe below and the merge
    // write both consume them, and WITHOUT the cache each refresh pays
    // the full batch aggregation twice (measured: the dominant cost of
    // the gold replay). Partial rows are key-cardinality-bounded —
    // safe to pin for the publish's duration.
    val inc0 = bucketed(incoming).cache()
    try {
    // ≤ `buckets` driver values — which partitions this batch touches
    val touched = inc0.select("bucket").distinct()
      .collect().map(r => Int.box(r.getInt(0))).toSeq
    // manifest-level skipping: untouched buckets' version dirs are
    // pruned by entry key before any scan is planned (readWhere also
    // re-applies the filter row-side, so this stays exact)
    val existingTouched =
      if (touched.isEmpty) None
      else graft.sources.Commit.readWhere(spark, path,
        s"bucket in (${touched.mkString(",")})")
    val merged = existingTouched match {
      case None => inc0
      case Some(existing) =>
        val inc = inc0
        bucketed(existing
          .drop("bucket")
          .unionByName(inc.drop("bucket"))
          .groupBy("user_id", "event_type", "h")
          .agg(
            sum(col("n")).as("n"),
            sum(col("v_sum")).cast(sumType).as("v_sum"),
            sum(col("v_cnt")).as("v_cnt"),
            sum(col("q_sum")).cast(sumType).as("q_sum"),
            sum(col("q_cnt")).as("q_cnt")))
    }
    // bucket-align the merge output: without it every writer partition
    // emits a file into every touched bucket (parallelism × buckets
    // small files per version — fragmentation the readers, the footer
    // harvest, and eventually optimizeBuckets all pay for). One
    // shuffle keyed on the bucket gives exactly one file per touched
    // bucket; a micro-batch's per-bucket volume is bounded by the
    // batch, so the narrowed write parallelism costs nothing.
    graft.sources.Commit.publishBuckets(
      merged.repartition(col("bucket")), path)
    } finally { inc0.unpersist(); () }
  }

  /** Reader for the incrementally-maintained hourly fact — resolves
    * through the manifest pointer (None before the first refresh).
    */
  def readHourly(spark: SparkSession, path: String): Option[DataFrame] =
    graft.sources.Commit.read(spark, path)

  /** Exact AVG over staged partials: Σ(decimal partial sums) cast to
    * double, over Σ(partial counts) — the re-aggregated twin of
    * [[Exact.davg]]; identical IEEE-754 result.
    */
  def davgOf(sumCol: String, cntCol: String) =
    sum(col(sumCol)).cast("double") / sum(col(cntCol))

  /** Exact SUM over staged partials (re-aggregated [[Exact.dsum]]). */
  def dsumOf(sumCol: String) = sum(col(sumCol)).cast("double")
}
