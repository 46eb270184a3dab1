package graft.sources

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets

/** Crash-safe publication for maintained parquet tables: a
  * manifest-pointer commit in the Iceberg/Delta spirit, without
  * adopting a table-format dependency.
  *
  * The reference keeps its maintained tables (status upserts, MV
  * refreshes) in Postgres, where publication is a transaction
  * (ref: sql/enhanced_data_schema.sql:440-467,566-591). Plain
  * dynamic-partition-overwrite parquet has no such boundary: a job
  * killed mid-rewrite leaves a half-replaced partition that readers
  * see immediately. This module restores the boundary with three
  * invariants:
  *
  *  1. data is IMMUTABLE once referenced — writers only ever create
  *     NEW version directories (`<root>/v=<n>/…`), never touch files a
  *     reader could be scanning;
  *  2. a commit is ONE atomic pointer swap — the version's manifest
  *     (a file listing `bucket → data dir`) is fully written and
  *     synced first, then `<root>/_POINTER` is atomically renamed over
  *     (HDFS rename and POSIX rename are atomic; object stores with
  *     atomic rename — or a conditional-PUT pointer object — slot in
  *     behind the same two calls);
  *  3. readers resolve through the pointer — they see the previous
  *     complete snapshot until the instant of the swap, and the new
  *     complete snapshot after. A crash at ANY point before the swap
  *     leaves only unreferenced garbage (cleaned by [[vacuum]]).
  *
  * Incremental writers keep their bounded write amplification: a
  * refresh writes only the buckets its batch touched into the new
  * version dir, and the new manifest CARRIES the untouched buckets'
  * entries forward (still pointing into older version dirs) — exactly
  * a table format's "new snapshot references old data files". A batch
  * touching one user still costs one bucket of IO however large the
  * accumulated table grows, and crash safety is no longer traded away
  * for it.
  *
  * Layout:
  * {{{
  *   <root>/_POINTER            one line: current manifest file name
  *   <root>/manifest-<v>.txt    line 1 = version; "#parent=<v>",
  *                              "#schema=<StructType JSON>", "#rows=<n>";
  *                              then "<bucket>\t<dir>" entries
  *   <root>/v=<v>/bucket=<b>/…  parquet data (or v=<v>/… for whole dirs)
  * }}}
  *
  * The `#parent=` line records committed lineage: [[history]] walks it
  * from the pointer, [[readAt]] time-travels to any retained link, and
  * [[vacuum]]'s `retain` bound decides how much of the chain stays
  * reconstructable — the Iceberg snapshot-log / Delta time-travel
  * contract, one text line instead of a format dependency.
  */
object Commit {

  /** One manifest entry: bucket id → data dir relative to the root.
    * Whole-directory (unbucketed) snapshots use key = -1.
    */
  final case class Entry(key: Int, dir: String)

  /** A bucketed table's key→bucket discipline, recorded per version:
    * `bucket = pmod(<keyExprSql>, buckets)` cast to int, where
    * `keyExprSql` is an integral SQL expression over the snapshot's
    * data columns (`"user_id"`, `"hash(k1, k2)"`, …). Recording it in
    * the manifest is what makes bucket-count EVOLUTION engine behavior
    * instead of writer folklore: a maintainer reads the table's
    * current layout and buckets with it ([[layout]]), and
    * [[optimizeBuckets]] can re-bucket — recompute the column from the
    * recorded expression at a new modulus — without knowing anything
    * about the writer (the Iceberg bucket-transform / Delta
    * clustered-by analog, one manifest line instead of a format
    * dependency).
    */
  final case class Layout(buckets: Int, keyExprSql: String) {
    require(buckets > 0, s"layout bucket count must be positive: $buckets")
    require(!keyExprSql.contains("\n") && !keyExprSql.contains("\t"),
      "layout key expression must be a single manifest-line-safe token")
    /** The bucket column this layout assigns. */
    def bucketExpr: org.apache.spark.sql.Column =
      pmod(expr(keyExprSql), lit(buckets)).cast("int")
  }

  private val Pointer = "_POINTER"

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Parsed manifest: version, parent version (0 = none / pre-lineage
    * manifest), the snapshot's schema + row count, entries. Lines
    * starting with '#' are metadata: `#parent=<v>` (committed lineage,
    * what time travel walks), `#schema=<StructType JSON>` (the snapshot
    * OWNS its schema — reads select/cast through it, so a maintained
    * table can evolve additively and old versions time-travel with the
    * columns they had, not whatever parquet footer merging improvises),
    * and `#rows=<n>` (rows written INTO this version — audit lineage,
    * not snapshot size). Manifests written before a line existed parse
    * with it absent and keep their old behavior.
    */
  private final case class Manifest(v: Long, parent: Long,
      schema: Option[org.apache.spark.sql.types.StructType],
      rows: Option[Long], entries: Seq[Entry],
      stats: Map[String, Skipping.EntryStats] = Map.empty,
      fileStats: Map[String, Seq[(String, Skipping.EntryStats)]] = Map.empty,
      layout: Option[Layout] = None,
      txns: Map[String, Long] = Map.empty)

  private def parseManifest(text: String): Manifest = {
    val lines = text.split("\n").toSeq.filter(_.nonEmpty)
    val v = lines.head.toLong
    val parent = lines.tail.collectFirst {
      case l if l.startsWith("#parent=") => l.stripPrefix("#parent=").toLong
    }.getOrElse(0L)
    val schema = lines.tail.collectFirst {
      case l if l.startsWith("#schema=") =>
        org.apache.spark.sql.types.DataType.fromJson(l.stripPrefix("#schema="))
          .asInstanceOf[org.apache.spark.sql.types.StructType]
    }
    val rows = lines.tail.collectFirst {
      case l if l.startsWith("#rows=") => l.stripPrefix("#rows=").toLong
    }
    // `#stats=<entry dir>\t<encoded zone map>`: one line per entry
    // that has footer statistics; a malformed line degrades to "no
    // stats for that entry" (pruning declines), never to a read error
    val stats = lines.tail.filter(_.startsWith("#stats=")).flatMap { l =>
      try {
        val Array(dir, body) = l.stripPrefix("#stats=").split("\t", 2)
        Some(dir -> Skipping.decode(body))
      } catch { case scala.util.control.NonFatal(_) => None }
    }.toMap
    // `#fstats=<entry dir>\t<file rel path>\t<encoded zone map>`: one
    // line per FILE of an entry whose per-file boxes are narrower than
    // the entry box (range-sorted / z-ordered buckets). A parsed file
    // list is treated as COMPLETE by the pruner (files absent from it
    // are never scanned), so one malformed line must invalidate the
    // whole entry's file grain — not silently drop a file from reads.
    val rawF = lines.tail.filter(_.startsWith("#fstats=")).map { l =>
      val parts = l.stripPrefix("#fstats=").split("\t", 3)
      val parsed =
        if (parts.length != 3) None
        else try Some(Skipping.decode(parts(2)))
        catch { case scala.util.control.NonFatal(_) => None }
      (parts(0), parts.lift(1), parsed)
    }
    val badDirs = rawF.collect { case (d, f, p) if f.isEmpty || p.isEmpty => d }.toSet
    val fileStats = rawF
      .collect { case (d, Some(f), Some(p)) if !badDirs.contains(d) => (d, f, p) }
      .groupBy(_._1).map { case (d, xs) => d -> xs.toSeq.map(x => (x._2, x._3)) }
    // `#layout=<buckets>\t<keyExprSql>`: the snapshot's bucketing
    // discipline. A malformed line degrades to "layout unknown" (the
    // pre-r17 state: writers own their modulus), never a read error.
    val layout = lines.tail.collectFirst {
      case l if l.startsWith("#layout=") =>
        try {
          val Array(n, k) = l.stripPrefix("#layout=").split("\t", 2)
          Some(Layout(n.toInt, k))
        } catch { case scala.util.control.NonFatal(_) => None }
    }.flatten
    // `#txn=<appId>\t<version>`: the idempotent-writer watermark (the
    // Delta txnAppId/txnVersion analog) — one line per app that has
    // ever published with a txn; carried forward and max-merged by
    // publish, so an at-least-once replayed micro-batch can ask "did
    // my epoch already land?" through the SAME atomic pointer swap
    // that made its data visible. A malformed line degrades to "no
    // watermark for that app" (the writer re-applies — at-least-once,
    // never silent loss).
    val txns = lines.tail.filter(_.startsWith("#txn=")).flatMap { l =>
      try {
        val Array(app, ver) = l.stripPrefix("#txn=").split("\t", 2)
        Some(app -> ver.toLong)
      } catch { case scala.util.control.NonFatal(_) => None }
    }.toMap
    val entries = lines.tail.filterNot(_.startsWith("#")).map { l =>
      val Array(k, dir) = l.split("\t", 2)
      Entry(k.toInt, dir)
    }
    Manifest(v, parent, schema, rows, entries, stats, fileStats, layout, txns)
  }

  /** The manifest header-order CONTRACT shared by [[commitManifest]]
    * (the writer) and the streamed header readers ([[layout]],
    * [[parentAt]]): light meta lines (`#parent`, `#schema`, `#rows`,
    * `#layout`) are written BEFORE the heavy ones (`#stats`,
    * `#fstats`), which precede the entry lines. The streamed readers
    * may therefore stop at the first heavy-meta or entry line and
    * still have seen every light line — that early stop is what keeps
    * the lineage walk O(1) bytes per manifest when the stats tail is
    * megabytes. Both sides reference THIS predicate (the writer via
    * the order assertion in [[commitManifest]], the readers as their
    * stop condition), and CommitSpec("streamed header readers agree
    * with parseManifest") pins agreement on a freshly committed
    * manifest, so a future reordering of meta lines fails loudly
    * instead of making the readers silently return None/Some(0).
    */
  private[graft] val HeavyMetaPrefixes = Seq("#stats=", "#fstats=")
  private def pastLightMeta(line: String): Boolean =
    HeavyMetaPrefixes.exists(line.startsWith) || !line.startsWith("#")

  /** The current snapshot's recorded bucketing discipline, if any —
    * what a layout-aware maintainer ([[graft.streaming.Streams
    * .statusUpsert]], [[graft.warehouse.GoldStage.refreshHourly]])
    * buckets NEW batches with, so its modulus always matches the
    * table's even after [[optimizeBuckets]] re-buckets it. None for
    * whole-dir tables, pre-layout manifests, and tables that never
    * declared one (those writers keep owning their modulus, the
    * pre-r17 contract).
    */
  def layout(spark: SparkSession, root: String): Option[Layout] = {
    // streamed header read, not a currentManifest parse: maintainers
    // call this once per MICRO-BATCH (statusUpsert, refreshHourly), and
    // a full parse decodes every zone-map stats line — O(stats volume)
    // on the streaming commit critical path. `#layout=` is written in
    // the meta block BEFORE the stats lines (commitManifest), so the
    // scan stops at the first stats or entry line.
    val f = fs(spark, root)
    val ptr = new Path(root, Pointer)
    if (!f.exists(ptr)) None
    else {
      val mf = new Path(root, readSmall(f, ptr).trim)
      if (!f.exists(mf)) None
      else {
        val in = f.open(mf)
        try {
          val br = new java.io.BufferedReader(
            new java.io.InputStreamReader(in, StandardCharsets.UTF_8))
          br.readLine() // the version line
          var line = br.readLine()
          var out: Option[Layout] = None
          var done = false
          while (!done && line != null) {
            if (line.startsWith("#layout=")) {
              out = try {
                val Array(n, k) = line.stripPrefix("#layout=").split("\t", 2)
                Some(Layout(n.toInt, k))
              } catch { case scala.util.control.NonFatal(_) => None }
              done = true
            } else if (pastLightMeta(line)) done = true
            else line = br.readLine()
          }
          out
        } finally in.close()
      }
    }
  }

  /** The idempotent-writer watermark for `appId`: the highest epoch id
    * this app has ever committed into the table (the Delta
    * txnAppId/txnVersion analog). An at-least-once replayed
    * micro-batch whose epoch is ≤ this watermark already landed — its
    * publish was made durable by the SAME pointer swap that recorded
    * the watermark, so skipping the re-apply is exact, not heuristic.
    * None = this app never published with a txn (or the table is
    * empty): the writer applies. Streamed header read, same contract
    * and cost as [[layout]] — once per micro-batch, O(1) bytes.
    */
  def lastTxn(spark: SparkSession, root: String,
      appId: String): Option[Long] = {
    val f = fs(spark, root)
    val ptr = new Path(root, Pointer)
    if (!f.exists(ptr)) None
    else {
      val mf = new Path(root, readSmall(f, ptr).trim)
      if (!f.exists(mf)) None
      else {
        val prefix = s"#txn=$appId\t"
        val in = f.open(mf)
        try {
          val br = new java.io.BufferedReader(
            new java.io.InputStreamReader(in, StandardCharsets.UTF_8))
          br.readLine() // the version line
          var line = br.readLine()
          var out: Option[Long] = None
          var done = false
          while (!done && line != null) {
            if (line.startsWith(prefix)) {
              out = try Some(line.stripPrefix(prefix).toLong)
              catch { case scala.util.control.NonFatal(_) => None }
              done = true
            } else if (pastLightMeta(line)) done = true
            else line = br.readLine()
          }
          out
        } finally in.close()
      }
    }
  }

  private def manifestAt(spark: SparkSession, root: String,
      v: Long): Option[Manifest] = {
    val f = fs(spark, root)
    val mf = new Path(root, s"manifest-$v.txt")
    if (f.exists(mf)) Some(parseManifest(readSmall(f, mf))) else None
  }

  /** Current (version, entries), resolved through the pointer; None if
    * nothing has ever been committed (a partially-written first
    * version without a pointer swap reads as None — correct).
    */
  def current(spark: SparkSession, root: String): Option[(Long, Seq[Entry])] =
    currentManifest(spark, root).map(m => (m.v, m.entries))

  /** The manifest the pointer currently resolves to — the single
    * pointer-follow both [[current]] and [[read]] share.
    */
  private def currentManifest(spark: SparkSession, root: String): Option[Manifest] = {
    val f = fs(spark, root)
    val ptr = new Path(root, Pointer)
    if (!f.exists(ptr)) None
    else Some(parseManifest(readSmall(f, new Path(root, readSmall(f, ptr).trim))))
  }

  /** The `#parent=` pointer of manifest `v` WITHOUT decoding the rest
    * of the file (schema JSON, zone-map stats — the expensive lines):
    * the chain walk's unit cost. A 100 TB table accumulates thousands
    * of versions whose manifests each carry per-bucket and per-file
    * stats; walking lineage through [[parseManifest]] would make every
    * history/CDF-membership question O(versions × stats volume), so
    * the walk reads headers only. None = manifest missing (vacuumed or
    * never committed); Some(0) = pre-lineage manifest (chain ends).
    */
  private[graft] def parentAt(f: org.apache.hadoop.fs.FileSystem, root: String,
      v: Long): Option[Long] = {
    val mf = new Path(root, s"manifest-$v.txt")
    if (!f.exists(mf)) None
    else {
      // STREAMED, not slurped: `#parent=` is the first metadata line
      // ([[commitManifest]]), so this reads one buffer of a file whose
      // tail may hold megabytes of stats — the walk is O(1) bytes per
      // step, not just O(1) decode. Legacy pre-lineage manifests have
      // no #parent line; the scan stops at the first entry line.
      val in = f.open(mf)
      try {
        val br = new java.io.BufferedReader(
          new java.io.InputStreamReader(in, StandardCharsets.UTF_8))
        br.readLine() // the version line
        var line = br.readLine()
        var out: Option[Long] = Some(0L)
        var done = false
        while (!done && line != null) {
          if (line.startsWith("#parent=")) {
            out = Some(line.stripPrefix("#parent=").toLong); done = true
          } else if (pastLightMeta(line)) done = true
          else line = br.readLine()
        }
        out
      } finally in.close()
    }
  }

  /** The version the pointer currently names, WITHOUT reading the head
    * manifest at all: the pointer's one-line content is the manifest
    * FILE NAME, which encodes it. [[chainContains]]/[[history]] start
    * here so a membership question never pays the head manifest's
    * schema-JSON + stats parse (the callers that need the parsed head
    * already hold it).
    */
  private def headVersion(f: org.apache.hadoop.fs.FileSystem,
      root: String): Option[Long] = {
    val ptr = new Path(root, Pointer)
    if (!f.exists(ptr)) None
    else {
      val name = readSmall(f, ptr).trim
      try Some(name.stripPrefix("manifest-").stripSuffix(".txt").toLong)
        .filter(_ => f.exists(new Path(root, name)))
      catch { case _: NumberFormatException => None }
    }
  }

  /** Is version `v` on the committed chain and still reconstructable?
    * The membership question [[changesSinceKeyed]]/[[changesSince]]/
    * [[readAt]] ask per call — answered by walking parent HEADERS from
    * the current pointer and STOPPING at the first version ≤ `v`
    * (versions strictly decrease down the chain, so nothing below the
    * cursor needs visiting): O(distance(head, v)) header reads, never
    * O(full history), and none of them decode stats. This is what
    * keeps CDF cost flat in CHAIN DEPTH (the differ itself only ever
    * reads the two endpoint manifests) — measured in
    * SCALING_CURVE.json's commit_cdf.versions_deep segment.
    */
  private def chainContains(spark: SparkSession, root: String,
      v: Long): Boolean = {
    val f = fs(spark, root)
    var at = headVersion(f, root) // invariant: manifest exists
    var found = false
    while (!found && at.exists(_ >= v)) {
      if (at.get == v) found = true
      else at = parentAt(f, root, at.get).filter(p =>
        p > 0 && f.exists(new Path(root, s"manifest-$p.txt")))
    }
    found
  }

  /** COMMITTED versions still reconstructable on disk, newest first:
    * the `#parent=` chain walked from the current pointer until a
    * vacuumed-away (or pre-lineage) manifest ends it. A manifest that
    * never got its pointer swap is NOT in any chain — a crashed
    * publish can never resurface as "history". Header-only parses
    * ([[parentAt]]): O(history) small reads, no stats decode.
    */
  def history(spark: SparkSession, root: String): Seq[Long] = {
    val f = fs(spark, root)
    val head = headVersion(f, root)
    Iterator.iterate(head) {
      case Some(v) => parentAt(f, root, v)
        .filter(p => p > 0 && f.exists(new Path(root, s"manifest-$p.txt")))
      case None => None
    }.takeWhile(_.nonEmpty).map(_.get).toSeq
  }

  /** Time travel: read snapshot `v` exactly as readers saw it when it
    * was current. Only versions on the committed chain resolve
    * ([[history]]); asking for a crashed or vacuumed version returns
    * None rather than a half-readable guess. Same scan shape as
    * [[read]] — data dirs are immutable once referenced, so an old
    * manifest's entries are as scannable as the day they committed
    * (until [[vacuum]] reclaims them).
    */
  def readAt(spark: SparkSession, root: String, v: Long,
      bucketCol: String = "bucket"): Option[DataFrame] =
    if (!chainContains(spark, root, v)) None
    else manifestAt(spark, root, v).map(m =>
      applySchema(assemble(spark, root, m.entries, bucketCol), m.schema,
        if (m.entries.exists(_.key >= 0)) bucketCol else "bucket"))

  /** Read the current snapshot. Bucketed entries come back with the
    * bucket id as an int column named `bucketCol`; whole-dir entries
    * (key -1) come back as-is. One parquet scan per distinct VERSION
    * dir (entries sharing a version are listed into a single scan with
    * that version as basePath, so `bucket=<b>` partition pruning and
    * parallel listing still apply) — versions outstanding are bounded
    * by vacuum cadence, not by table size. Returns None before any
    * commit.
    */
  def read(spark: SparkSession, root: String,
      bucketCol: String = "bucket"): Option[DataFrame] =
    currentManifest(spark, root).map(m =>
      applySchema(assemble(spark, root, m.entries, bucketCol), m.schema,
        // the rename concerns the PARTITION column; a whole-dir
        // snapshot has none, and a data column that happens to be
        // named "bucket" must not be touched
        if (m.entries.exists(_.key >= 0)) bucketCol else "bucket"))

  /** Read the current snapshot with manifest-level data skipping:
    * entries whose zone maps ([[Skipping]], harvested from parquet
    * footers at publish time) prove the predicate can match no row
    * are never scanned — the scan is planned over the surviving
    * entries only, so at scale a narrow time-range or key-range read
    * of a large maintained table costs IO proportional to the
    * MATCHING data, not the table. The bucket partition column prunes
    * too (each bucketed entry's key is its exact value). The FULL
    * predicate is still applied to the surviving rows: pruning is an
    * IO optimization, never a correctness dependency, and a predicate
    * shape or column the evaluator does not understand simply keeps
    * every entry. `predicateSql` is one SQL boolean expression over
    * the snapshot's columns.
    */
  def readWhere(spark: SparkSession, root: String, predicateSql: String,
      bucketCol: String = "bucket"): Option[DataFrame] =
    currentManifest(spark, root).map { m =>
      val (keptSel, _) = splitEntriesFiles(spark, m, predicateSql, bucketCol)
      val kept = keptSel.map(_._1)
      val fileSel = keptSel.collect { case (e, Some(fs)) => e.dir -> fs }.toMap
      val bc = if (m.entries.exists(_.key >= 0)) bucketCol else "bucket"
      val base =
        if (kept.nonEmpty)
          applySchema(assemble(spark, root, kept, bc, fileSel), m.schema, bc)
        else m.schema match {
          // fully pruned: an empty relation with the committed schema
          // (stats-bearing manifests always carry one)
          case Some(st) =>
            val renamed = org.apache.spark.sql.types.StructType(
              st.fields.map(f => if (f.name == "bucket") f.copy(name = bc) else f))
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], renamed)
          case None =>
            applySchema(assemble(spark, root, m.entries, bc), m.schema, bc)
        }
      base.filter(expr(predicateSql))
    }

  /** Change feed at bucket grain: the rows of every entry the current
    * snapshot does NOT share with committed version `since` — i.e.
    * the buckets rewritten (or added) by any publish after `since`,
    * read from their current data dirs. An incremental consumer polls
    * this instead of re-scanning the snapshot: the IO bound is the
    * CHANGED buckets, not the table (the Delta CDF / Iceberg
    * incremental-scan contract at bucket granularity — a rewritten
    * bucket re-delivers its full bucket content, which
    * last-writer-wins or merge-keyed consumers fold idempotently;
    * this protocol does not record row-level deletes).
    *
    * Returns None when `since` is not a reconstructable committed
    * version (never committed, or vacuumed away) — the consumer's
    * cursor is stale and it must fall back to a full [[read]]. An
    * up-to-date cursor gets an EMPTY relation with the current
    * schema, not None.
    *
    * Across a re-bucket boundary ([[optimizeBuckets]] layout
    * evolution) every entry is fresh, so this feed redelivers the
    * whole table once — correct for the idempotent fold consumers
    * this grain contracts for; row-level consumers should use
    * [[changesSinceKeyed]], which stays exact (and empty for a pure
    * re-bucket) across the boundary.
    */
  def changesSince(spark: SparkSession, root: String, since: Long,
      bucketCol: String = "bucket"): Option[DataFrame] =
    for {
      cur <- currentManifest(spark, root)
      if chainContains(spark, root, since)
      base <- manifestAt(spark, root, since)
    } yield {
      val baseline = base.entries.toSet
      val changed = cur.entries.filterNot(baseline.contains)
      val bc = if (cur.entries.exists(_.key >= 0)) bucketCol else "bucket"
      if (changed.isEmpty) {
        val st = cur.schema.getOrElse(
          applySchema(assemble(spark, root, cur.entries, bc), cur.schema, bc).schema)
        val renamed = org.apache.spark.sql.types.StructType(
          st.fields.map(f => if (f.name == "bucket") f.copy(name = bc) else f))
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], renamed)
      } else applySchema(assemble(spark, root, changed, bc), cur.schema, bc)
    }

  /** Row-level change feed over the bucket-grain [[changesSince]]: the
    * upserts and deletes that transform committed version `since` into
    * the current snapshot, for consumers keyed by `keyCols` (the
    * table's merge key — one row per key per snapshot, the contract
    * every upsert writer here maintains). Emitted rows carry a
    * `_change` column: "upsert" rows are the CURRENT row for keys that
    * are new or whose row changed; "delete" rows are the `since`
    * version's row for keys that no longer exist. Applying them to a
    * consumer's copy of `since` (delete, then upsert) reproduces the
    * current snapshot exactly — the Delta CDF contract, computed by
    * diffing only the REWRITTEN buckets of the two snapshots, so IO is
    * proportional to changed buckets × 2, never the table.
    *
    * Scale: both diff sides are the changed buckets only; the
    * comparison is one equi-join on the key columns (hash-partitioned
    * on the same key both sides). Returns None exactly when
    * [[changesSince]] does: `since` is not reconstructable and the
    * consumer must fall back to a full read ([[fullAsUpserts]] is that
    * fallback in this feed's own row shape).
    *
    * PRECONDITION (stable bucketing): diffing only rewritten buckets
    * assumes a key's bucket assignment did not change between the two
    * snapshots — the same invariant every carry-forward merge here
    * already relies on (a publish that rewrote bucket 3 must have
    * folded ALL of bucket 3's keys, which is only true if keys don't
    * migrate). A writer that changes its bucket count (the pmod
    * modulus) must publish a full rewrite (all buckets fresh), which
    * this diff handles correctly since nothing is carried.
    *
    * RE-BUCKET BOUNDARY (layout evolution, r17): when the two
    * manifests record DIFFERENT [[Layout]] moduli (the cursor predates
    * an [[optimizeBuckets]] re-bucket), bucket identity means nothing
    * across the boundary, so the diff degrades to a WHOLE-TABLE keyed
    * diff — chosen over a fullAsUpserts fallback because it stays
    * EXACT: a pure re-bucket moves rows between buckets without
    * changing any (key → row), so the feed across it is EMPTY, and a
    * re-bucket plus later incremental publishes yields exactly those
    * publishes' row changes. The cost is one read of both endpoint
    * snapshots (table × 2 IO) for THAT poll only — the price of
    * crossing a layout epoch; consumers that would rather resync than
    * pay it can detect the boundary themselves (compare [[layout]]
    * across their cursor) and use [[fullAsUpserts]]. Re-bucket is a
    * full rewrite, so the natural all-entries-changed path already
    * takes this shape; the explicit layout check below is defense
    * against any future publish shape that carries entries across a
    * modulus change (publish refuses those today). Unknown layouts
    * (legacy manifests) assume stable bucketing, the pre-r17 contract.
    */
  def changesSinceKeyed(spark: SparkSession, root: String, since: Long,
      keyCols: Seq[String], bucketCol: String = "bucket"): Option[DataFrame] =
    for {
      cur <- currentManifest(spark, root)
      if chainContains(spark, root, since)
      base <- manifestAt(spark, root, since)
    } yield {
      val bc = if (cur.entries.exists(_.key >= 0)) bucketCol else "bucket"
      val baseline = base.entries.toSet
      val changed = cur.entries.filterNot(baseline.contains)
      // buckets present at `since` that were rewritten or dropped: the
      // delete side must scan their OLD content. A changed whole-dir
      // entry (key -1) replaces the whole table. A legacy schema-less
      // manifest (cur.schema None) gives the diff no committed column
      // set to conform the OLD side to — fall back to a whole-table
      // diff under the current read's own merged columns.
      // whole-Layout inequality, not just the modulus: a key-expression
      // change re-assigns buckets at the same modulus, and trusting
      // bucket identity across it would diff the wrong content
      val layoutBoundary = (for (b <- base.layout; c <- cur.layout)
        yield b != c).getOrElse(false)
      val wholeDir = changed.exists(_.key < 0) ||
        base.entries.exists(_.key < 0) != cur.entries.exists(_.key < 0) ||
        cur.schema.isEmpty || layoutBoundary
      val changedKeys = changed.map(_.key).toSet
      val oldSide = base.entries.filter(e =>
        wholeDir || changedKeys.contains(e.key) ||
          !cur.entries.exists(_.key == e.key))
      def readEntries(m: Manifest, es: Seq[Entry]): DataFrame =
        if (es.isEmpty) {
          val st = m.schema.getOrElse(
            applySchema(assemble(spark, root, m.entries, bc), m.schema, bc).schema)
          val renamed = org.apache.spark.sql.types.StructType(
            st.fields.map(f => if (f.name == "bucket") f.copy(name = bc) else f))
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], renamed)
        } else applySchema(assemble(spark, root, es, bc), m.schema, bc)
      // compare under the CURRENT schema so a schema evolution between
      // the snapshots diffs by value, not by column-set accident. The
      // schema-less path's applySchema is an identity, so the old side
      // is conformed to the current read's columns EXPLICITLY: additive
      // evolution null-fills (at the current column's type), dropped
      // columns are projected away — the same contract applySchema
      // gives schema-bearing manifests.
      val curRows = readEntries(cur, if (wholeDir) cur.entries else changed)
      val cols = curRows.columns.toSeq
      val oldRows = {
        // the old side is read under ITS OWN committed schema, then
        // conformed to the current read COLUMN-WISE: missing columns
        // null-fill at the current type; same-named columns whose TYPE
        // evolved (int→long, …) cast to the current type so the
        // null-safe struct compare doesn't misclassify unchanged rows
        // — but ONLY when the cast is VALUE-lossless. Spark's
        // Cast.canUpCast is necessary but not sufficient: it follows
        // numeric PRECEDENCE (long ≤ double), which blesses long→
        // double and int/long→float casts that lose integer precision
        // above 2^53 / 2^24 — a conform through those would suppress
        // exactly the changes this feed must never drop (caught by
        // CommitFuzzSpec's long→double 2^53 case). A blanket
        // applySchema(cur.schema) here would be worse still: under
        // NARROWING evolution it throws on overflow (ANSI) or wraps
        // (non-ANSI). Non-lossless pairs keep the raw column and
        // compare through evolvedEq below.
        def lossless(from: org.apache.spark.sql.types.DataType,
            to: org.apache.spark.sql.types.DataType): Boolean = {
          import org.apache.spark.sql.types._
          (from, to) match {
            case (LongType, DoubleType | FloatType) => false
            case (IntegerType, FloatType) => false
            case _ =>
              org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(from, to)
          }
        }
        val o0 = readEntries(base, oldSide)
        val have = o0.columns.toSet
        o0.select(cols.map(x =>
          if (!have.contains(x))
            lit(null).cast(curRows.schema(x).dataType).as(x)
          else {
            val from = o0.schema(x).dataType
            val to = curRows.schema(x).dataType
            if (from != to && lossless(from, to)) col(x).cast(to).as(x)
            else col(x)
          }): _*)
      }
      // columns whose type evolved in a NON-upcast way (the conform step
      // above left them in the old type): their row-equality below must
      // not ride Spark's binary-comparison coercion, which for e.g. a
      // string-vs-long pair compares through DOUBLE and would classify
      // two values above 2^53 that round to the same double as
      // "unchanged" — a suppressed change, the one failure mode a CDF
      // must never have. Tiered exact equality instead:
      //  (a) both sides atomic and mutually castable: ROUND-TRIP
      //      compare — the old value cast to the current type must
      //      equal the new value AND cast back to itself, proving the
      //      conversion lossless for THIS value. Exact both ways: a
      //      value the current type cannot represent fails the round
      //      trip (2^53+1 as double, 2^32+5 as int) and reports
      //      changed, while value-equal pairs (20L vs 20.0 under a
      //      long→double evolution, "20" vs 20L) compare unchanged —
      //      no per-poll full-table churn after the evolution;
      //  (b) nested or not mutually castable: exact JSON rendering of
      //      the single-field struct (injective per type — unlike raw
      //      string casts, where array<string> ["1, 2"] and array<int>
      //      [1, 2] both render "[1, 2]"; JSON quotes strings). Any
      //      cross-type ambiguity errs as a spurious upsert, which
      //      consumers apply idempotently — never as a suppression.
      val nonUpcastCols = cols.filter { x =>
        oldRows.schema(x).dataType != curRows.schema(x).dataType
      }.toSet
      def evolvedEq(x: String): org.apache.spark.sql.Column = {
        val from = oldRows.schema(x).dataType
        val to = curRows.schema(x).dataType
        def atomic(dt: org.apache.spark.sql.types.DataType) = dt match {
          case _: org.apache.spark.sql.types.StructType |
               _: org.apache.spark.sql.types.ArrayType |
               _: org.apache.spark.sql.types.MapType => false
          case _ => true
        }
        val castable = {
          import org.apache.spark.sql.catalyst.expressions.Cast
          Cast.canCast(from, to) && Cast.canCast(to, from)
        }
        if (atomic(from) && atomic(to) && castable) {
          // try_cast, not cast: ANSI mode (Spark 4 default) THROWS on
          // a narrowing overflow, failing the whole feed over one
          // historical out-of-range value. try_cast nulls it instead,
          // and a nulled conversion can never claim equality with a
          // non-null old value — the round-trip conjunct compares the
          // null back-cast against the non-null original and fails.
          val conv = col(s"_o_$x").try_cast(to)
          (conv <=> col(x)) && (conv.try_cast(from) <=> col(s"_o_$x"))
        } else
          to_json(struct(col(x))) <=> to_json(struct(col(s"_o_$x").as(x)))
      }
      require(keyCols.nonEmpty && keyCols.forall(cols.contains),
        s"keyCols ${keyCols.mkString(",")} must be columns of the snapshot")
      // the diff's internal marker/prefixed names must not collide with
      // a data column, or the join would silently read data where it
      // means bookkeeping — refuse loudly instead (ref analog: Delta
      // reserves its _change_type CDF column the same way)
      require(cols.forall(x =>
        x != "_change" && !x.startsWith("_m_") && !x.startsWith("_o_")),
        s"snapshot columns ${cols.filter(x => x == "_change" ||
          x.startsWith("_m_") || x.startsWith("_o_")).mkString(",")} " +
          "collide with the change feed's reserved names " +
          "(_change, _m_*, _o_*)")
      // presence markers: data columns may be legitimately null, so a
      // full-outer miss is detected by a non-nullable literal, never by
      // a data column. The key join is null-safe (a null key is a key);
      // row change is null-safe struct equality over the full row.
      val c = curRows.withColumn("_m_cur", lit(1))
      val o = oldRows.select(cols.map(x => col(x).as(s"_o_$x")): _*)
        .withColumn("_m_old", lit(1))
      // key identity under non-upcast key evolution uses the same
      // tiered exact compare as row equality (same 2^53 hazard), and
      // reads naturally: old key "42" and evolved key 42L are the SAME
      // logical key (round trip holds), so the feed upserts it rather
      // than delete+reinsert, while old 2^53+1 and new 2^53 stay
      // DISTINCT keys. The equi conjunct keeps the join hashable; the
      // round-trip conjunct planes as a join filter.
      val keyExpr = keyCols.map { k =>
        if (nonUpcastCols.contains(k)) evolvedEq(k)
        else col(k) <=> col(s"_o_$k")
      }.reduce(_ && _)
      val joined = c.join(o, keyExpr, "full_outer")
      // row change is a CONJUNCTION of per-column null-safe equalities
      // (identical to the struct <=> it replaces when types match —
      // struct() operands are never null themselves): scalar <=>
      // coerces an int/long type-evolution pair to the wider type,
      // while struct <=> refuses mismatched field types outright,
      // which is exactly the non-upcast-evolution case the conform
      // step above deliberately leaves uncast.
      // The bucket PARTITION column is physical layout, not logical
      // content — it is a function of the key and the table's current
      // modulus, recomputable by any consumer from [[layout]] — so a
      // bucketed snapshot's row comparison excludes it: within a
      // layout epoch a row's bucket cannot change anyway (stable
      // bucketing), and across a re-bucket boundary excluding it is
      // what keeps a PURE re-bucket's feed empty instead of
      // re-upserting the whole table. (Whole-dir snapshots have no
      // partition column; a data column named "bucket" there stays
      // compared.)
      val cmpCols =
        if (cur.entries.exists(_.key >= 0)) cols.filterNot(_ == bc) else cols
      val rowEq = cmpCols.map { x =>
        if (nonUpcastCols.contains(x)) evolvedEq(x)
        else col(x) <=> col(s"_o_$x")
      }.reduceOption(_ && _).getOrElse(lit(true))
      // OUTPUT column shape per evolved pair: unionByName widens the
      // two sides to their least common type, which is EXACT for
      // integral and string widenings but goes through DOUBLE when one
      // side is float/double and the other an exact numeric — a long
      // delete key 2^53+1 would come out as 2^53.0, addressing the
      // WRONG row in the consumer's copy (a suppressed delete). Such
      // pairs are delivered as their exact STRING rendering on BOTH
      // sides instead; every other pair keeps its native types.
      def lossyUnion(x: String): Boolean = {
        import org.apache.spark.sql.types._
        def fb(dt: DataType) = dt == DoubleType || dt == FloatType
        def exact(dt: DataType) = dt match {
          case ByteType | ShortType | IntegerType | LongType |
               _: DecimalType => true
          case _ => false
        }
        val from = oldRows.schema(x).dataType
        val to = curRows.schema(x).dataType
        (fb(from) && exact(to)) || (exact(from) && fb(to))
      }
      val stringOut = cols.filter(x =>
        nonUpcastCols.contains(x) && lossyUnion(x)).toSet
      def outCol(c: org.apache.spark.sql.Column, x: String) =
        if (stringOut.contains(x)) c.cast("string").as(x) else c.as(x)
      val upserts = joined
        .filter(col("_m_cur").isNotNull && (col("_m_old").isNull || !rowEq))
        .select(cols.map(x => outCol(col(x), x)) :+
          lit("upsert").as("_change"): _*)
      val deletes = joined.filter(col("_m_cur").isNull)
        .select(cols.map(x => outCol(col(s"_o_$x"), x)) :+
          lit("delete").as("_change"): _*)
      // OUTPUT TYPES (documented contract): upserts carry the CURRENT
      // snapshot's types; deletes carry the `since` snapshot's types
      // for any column whose evolution was not a lossless upcast —
      // deliberately, because a delete row addresses a key in the
      // CONSUMER'S copy of `since`, and force-casting it to the current
      // type could null or corrupt exactly the key it must delete
      // (long key 2^35 under long->int narrowing has no current-type
      // representation). unionByName therefore widens such a column to
      // the least common type of the two sides (int+long -> long,
      // long+string -> string) — wider than the current snapshot's
      // column, exact for both sides; the one widening that would NOT
      // be exact (integral/decimal vs float/double goes through
      // double) is delivered as the exact string rendering instead
      // (stringOut above). Consumers that conform the feed to the
      // current schema should do so AFTER applying deletes.
      upserts.unionByName(deletes)
    }

  /** The consumer's fallback when [[changesSinceKeyed]] returns None
    * (cursor vacuumed away or never committed): the CURRENT snapshot
    * re-expressed in the change feed's own row shape — every row an
    * `_change = "upsert"`, no deletes. A keyed consumer that clears its
    * state and applies this batch converges to the current snapshot
    * through the SAME apply path it uses for incremental batches, so a
    * vacuum never forces a second code path (the Delta CDF
    * initial-snapshot semantics: a fresh read delivers inserts only).
    *
    * Scale: one snapshot scan — exactly the full [[read]] the stale
    * consumer would have had to do anyway, plus a constant column.
    * `keyCols` is validated against the snapshot like the incremental
    * feed does, so a mis-keyed consumer fails here, not at apply time.
    * Returns None before any commit.
    */
  def fullAsUpserts(spark: SparkSession, root: String, keyCols: Seq[String],
      bucketCol: String = "bucket"): Option[DataFrame] =
    read(spark, root, bucketCol).map { snap =>
      val cols = snap.columns.toSeq
      require(keyCols.nonEmpty && keyCols.forall(cols.contains),
        s"keyCols ${keyCols.mkString(",")} must be columns of the snapshot")
      require(cols.forall(x =>
        x != "_change" && !x.startsWith("_m_") && !x.startsWith("_o_")),
        "snapshot columns collide with the change feed's reserved names " +
          "(_change, _m_*, _o_*)")
      snap.select(cols.map(col) :+ lit("upsert").as("_change"): _*)
    }

  /** (kept, pruned) under the predicate — the skipping plan at ENTRY
    * grain, for audits and specs, without scanning anything. An entry
    * all of whose files are individually pruned counts as pruned even
    * when its folded entry box intersects the predicate (two files
    * [0,10] and [20,30] fold to [0,30], which "contains" 15).
    */
  private[graft] def planWhere(spark: SparkSession, root: String,
      predicateSql: String, bucketCol: String = "bucket"): (Seq[Entry], Seq[Entry]) = {
    val (kept, pruned) = planWhereFiles(spark, root, predicateSql, bucketCol)
    (kept.map(_._1), pruned)
  }

  /** The full skipping plan: kept entries with their surviving file
    * subset (None = read the whole entry dir), plus pruned entries.
    */
  private[graft] def planWhereFiles(spark: SparkSession, root: String,
      predicateSql: String, bucketCol: String = "bucket")
      : (Seq[(Entry, Option[Seq[String]])], Seq[Entry]) =
    currentManifest(spark, root)
      .map(splitEntriesFiles(spark, _, predicateSql, bucketCol))
      .getOrElse((Nil, Nil))

  private def splitEntriesFiles(spark: SparkSession, m: Manifest,
      predicateSql: String, bucketCol: String)
      : (Seq[(Entry, Option[Seq[String]])], Seq[Entry]) = {
    val pred =
      try Some(spark.sessionState.sqlParser.parseExpression(predicateSql))
      catch { case scala.util.control.NonFatal(_) => None }
    pred match {
      case None => (m.entries.map(e => (e, Option.empty[Seq[String]])), Nil)
      case Some(p) =>
        // a bucketed entry's key IS the bucket column's value — let
        // the evaluator prune on it like any other zone map. Stats are
        // filtered through Skipping.trusted first: reads cast carried
        // buckets to the CURRENT schema, and a stat a lossy cast could
        // have invalidated must not prune (the bucket key itself is
        // cast-free — the partition value is the manifest's own int).
        def withKey(e: Entry, base: Option[Skipping.EntryStats])
            : Option[Skipping.EntryStats] = {
          val t = base.map(Skipping.trusted(_, m.schema))
          if (e.key < 0) t
          else {
            val b = Skipping.ColStat("l", e.key.toString, e.key.toString, 0L)
            Some(t.fold(Skipping.EntryStats(0L, Map(bucketCol -> b)))(s =>
              s.copy(cols = s.cols + (bucketCol -> b))))
          }
        }
        def may(st: Option[Skipping.EntryStats]): Boolean =
          st.forall(s =>
            try Skipping.mayMatch(p, s)
            catch { case scala.util.control.NonFatal(_) => true })

        val kept = Seq.newBuilder[(Entry, Option[Seq[String]])]
        val pruned = Seq.newBuilder[Entry]
        m.entries.foreach { e =>
          if (!may(withKey(e, m.stats.get(e.dir)))) pruned += e
          else m.fileStats.get(e.dir).filter(_.nonEmpty) match {
            case None => kept += ((e, None))
            case Some(files) =>
              val survivors = files.collect {
                case (f, st) if may(withKey(e, Some(st))) => f
              }
              if (survivors.isEmpty) pruned += e
              else if (survivors.size == files.size) kept += ((e, None))
              else kept += ((e, Some(survivors)))
          }
        }
        (kept.result(), pruned.result())
    }
  }

  /** Project the assembled scan through the manifest's committed
    * schema: exactly its columns, in its order, cast to its types — a
    * carried bucket written before an additive column existed reads as
    * null for it (the standard additive-evolution contract), and a
    * column dropped later never leaks back into an old snapshot.
    * Pre-schema manifests read as the files merge (legacy behavior).
    */
  /** Nested nullability widened to the read-side reality: parquet
    * cannot enforce Catalyst's strict nested nullability round-trip,
    * so a snapshot whose writer carried e.g. `array<int, containsNull
    * = false>` (any Seq[Int] encoder) must not record a cast target
    * ANSI cast refuses from the scan's nullable reading — that made
    * the table unreadable after its own publish. Top-level field
    * nullability is untouched (column-level casts ignore it).
    */
  private def widenNullability(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    dt match {
      case s: StructType => StructType(s.fields.map(f =>
        f.copy(dataType = widenNullability(f.dataType), nullable = true)))
      case a: ArrayType =>
        ArrayType(widenNullability(a.elementType), containsNull = true)
      case m: MapType => MapType(widenNullability(m.keyType),
        widenNullability(m.valueType), valueContainsNull = true)
      case other => other
    }
  }

  private def applySchema(df: DataFrame,
      schema: Option[org.apache.spark.sql.types.StructType],
      bucketCol: String): DataFrame =
    schema.fold(df) { st =>
      df.select(st.fields.toSeq.map { fld =>
        // the manifest records the partition column under its on-disk
        // name ("bucket" — the dir layout is fixed); a caller-renamed
        // bucketCol must keep resolving to it, or the rename silently
        // null-fills the column
        val name = if (fld.name == "bucket") bucketCol else fld.name
        (if (df.columns.contains(name)) col(name)
         else lit(null)).cast(widenNullability(fld.dataType)).as(name)
      }: _*)
    }

  private def assemble(spark: SparkSession, root: String,
      entries: Seq[Entry], bucketCol: String,
      fileSel: Map[String, Seq[String]] = Map.empty): DataFrame = {
    // fileSel: entry dir → surviving file subset (file-grain skipping).
    // The scan is planned over those leaf files with the same basePath,
    // so partition discovery still derives the bucket column.
    def paths(e: Entry): Seq[String] = fileSel.get(e.dir) match {
      case Some(files) => files.map(f => s"$root/${e.dir}/$f")
      case None => Seq(s"$root/${e.dir}")
    }
    val whole = entries.filter(_.key < 0)
    val byVersion = entries.filter(_.key >= 0)
      .groupBy(e => e.dir.takeWhile(_ != '/'))
    val parts =
      whole.map(e => spark.read.option("basePath", s"$root/${e.dir}")
        .parquet(paths(e): _*)) ++
        byVersion.toSeq.sortBy(_._1).map { case (vdir, es) =>
          // partition discovery names the column by the dir layout
          // ("bucket=<b>"); cast first, then rename to the caller's
          // bucketCol (no-op for the default). A bucketCol colliding
          // with a DATA column would make the rename ambiguous — fail
          // loudly rather than emit two same-named columns.
          val scan = spark.read.option("basePath", s"$root/$vdir")
            .parquet(es.flatMap(paths): _*)
          require(bucketCol == "bucket" ||
            !scan.columns.contains(bucketCol),
            s"bucketCol '$bucketCol' collides with a data column")
          scan.withColumn("bucket", col("bucket").cast("int"))
            .withColumnRenamed("bucket", bucketCol)
        }
    // allowMissingColumns: version dirs written before an additive
    // column appeared union with it null; the manifest schema then
    // fixes column order/types in applySchema
    parts.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  private def readSmall(f: org.apache.hadoop.fs.FileSystem, p: Path): String = {
    val in = f.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192, false)
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** One root listing → (max version number in use, live claim-file
    * versions). "In use" spans manifests, v-dirs (a crashed publish may
    * have left either above the committed version — never reuse), and
    * [[ClaimPrefix]] claim files (an IN-FLIGHT writer's version
    * reservation — see the claim block in [[publishLocked]]).
    */
  private def scanVersions(f: org.apache.hadoop.fs.FileSystem,
      root: String): (Long, Seq[Long]) = {
    val r = new Path(root)
    if (!f.exists(r)) (0L, Nil)
    else {
      val names = f.listStatus(r).map(_.getPath.getName)
      val used = names.collect {
        case n if n.startsWith("v=") => n.drop(2).toLong
        case n if n.startsWith("manifest-") =>
          n.stripPrefix("manifest-").stripSuffix(".txt").toLong
        case n if n.startsWith(ClaimPrefix) =>
          n.stripPrefix(ClaimPrefix).toLong
      }
      (used.foldLeft(0L)(math.max),
        names.collect {
          case n if n.startsWith(ClaimPrefix) =>
            n.stripPrefix(ClaimPrefix).toLong
        }.toSeq)
    }
  }

  private def nextVersion(spark: SparkSession, root: String,
      committed: Long): Long =
    math.max(committed, scanVersions(fs(spark, root), root)._1) + 1

  /** Version-claim files (`.claim-v=<n>`): a writer's exclusive
    * reservation of its version number, created BEFORE any data is
    * written and removed when the publish decides (commit or abort).
    * Dot-prefixed so no reader's file listing ever sees one.
    */
  private[graft] val ClaimPrefix = ".claim-v="

  /** The committed head version, from the pointer file name alone —
    * O(1) bytes, no manifest parse. 0 = nothing committed.
    */
  private def committedVersion(f: org.apache.hadoop.fs.FileSystem,
      root: String): Long = {
    val ptr = new Path(root, Pointer)
    if (!f.exists(ptr)) 0L
    else readSmall(f, ptr).trim
      .stripPrefix("manifest-").stripSuffix(".txt").toLong
  }

  /** Publish a new version whose data was just written by `write`
    * (given the fresh version dir). The manifest's entries are the
    * version dir's `bucket=<b>` children (plus carried entries for
    * buckets this version did not rewrite), or a single whole-dir
    * entry when the writer produced no bucket dirs.
    */
  /** SPARK_GRAFT_PUBLISH_TIMING=1 → one stderr line per publish with
    * phase wall times (write / footer harvest / manifest commit) — the
    * measurement knob behind the gold-refresh latency work; zero cost
    * when unset.
    */
  private val timing = sys.env.get("SPARK_GRAFT_PUBLISH_TIMING").contains("1")
  @inline private def timed[T](enabled: Boolean)(body: => T): (T, Long) =
    if (!enabled) (body, 0L)
    else { val t0 = System.nanoTime(); val r = body; (r, System.nanoTime() - t0) }

  /** Per-root writer serialization (r18). A publish is
    * read-prev → write-data → claim-version → swap-pointer; two
    * writers on the SAME table interleaving between another's
    * manifest create and pointer swap could carry forward from a
    * stale prev (silently dropping the other's bucket rewrite) and
    * then race the last-rename-wins pointer. Same-version claims
    * already lose loudly (exclusive manifest create); this lock closes
    * the cross-version window for every writer in THIS driver — which
    * is the deployment posture: a table's maintainers (statusUpsert,
    * refreshHourly, optimizeBuckets, vacuum) all run in the table's
    * one writer JVM. Writers in DIFFERENT JVMs remain governed by the
    * single-writer-per-table contract and need external coordination —
    * the same boundary Delta's S3 LogStore draws (HDFS gets atomic
    * exclusive create; object stores need a coordinator).
    */
  private val writerLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def withWriterLock[T](spark: SparkSession, root: String)
      (body: => T): T = {
    // the lock key is the FS-qualified URI, not the raw string: two
    // spellings of one table root (trailing slash, file:/ vs bare,
    // relative vs absolute) must share one lock object, or aliases
    // bypass the serialization and reopen the stale-carry-forward
    // window this lock exists to close (r18 advice)
    val key = fs(spark, root).makeQualified(new Path(root)).toString
    val lock = writerLocks.computeIfAbsent(key, _ => new Object)
    lock.synchronized(body)
  }

  private def publish(spark: SparkSession, root: String,
      expectBuckets: Option[Set[Int]] = None,
      bucketedWriter: Boolean = false,
      declaredLayout: Option[Layout] = None,
      fullRewrite: Boolean = false,
      appTxn: Option[(String, Long)] = None)
      (write: String => Unit): Long = withWriterLock(spark, root) {
    val prev = currentManifest(spark, root) // ONE manifest read per publish
    // Exactly-once under concurrent in-driver writers (r18 advice):
    // the replay check and the commit are ONE critical section. Two
    // writers sharing an appId that check lastTxn OUTSIDE the lock can
    // both read the same watermark, both pass, and double-apply a
    // non-idempotent fold — the lock would serialize only their
    // publishes, not their skip decisions. Callers keep a cheap
    // unlocked pre-check as a fast path (skip planning the batch at
    // all), but THIS check is the authoritative one: it reads the
    // watermark from the same manifest snapshot the commit extends,
    // under the same lock — Delta's in-transaction txnVersion check.
    // A replayed epoch returns the current version as a no-op.
    val replayed = for {
      (app, ver) <- appTxn
      p <- prev
      last <- p.txns.get(app)
      if ver <= last
    } yield p.v
    replayed.getOrElse(publishLocked(spark, root, expectBuckets,
      bucketedWriter, declaredLayout, fullRewrite, appTxn, prev)(write))
  }

  /** The publish body; runs only under [[withWriterLock]] with the
    * replay watermark already cleared. `prev` is the manifest snapshot
    * read inside the lock — everything downstream (carry-forward,
    * layout rules, version claim, txn fold) derives from it.
    */
  private def publishLocked(spark: SparkSession, root: String,
      expectBuckets: Option[Set[Int]],
      bucketedWriter: Boolean,
      declaredLayout: Option[Layout],
      fullRewrite: Boolean,
      appTxn: Option[(String, Long)],
      prev: Option[Manifest])
      (write: String => Unit): Long = {
    val f = fs(spark, root)
    // timing is wanted when either the env knob prints stderr lines OR
    // a measurement main turned on PhaseTimer's in-process sink
    // (tools/StreamFloor attributing the foreachBatch interior)
    val tEn = timing || graft.util.PhaseTimer.accEnabled
    // ---- cross-JVM version claim (r19) ----------------------------
    // The in-driver writer lock cannot see writers in OTHER JVMs. Two
    // of those racing used to collide only at the exclusive manifest
    // create — AFTER both had already written data into the SAME
    // `v=N` dir (overwrite-mode writers deleting each other's files:
    // the winner could commit a manifest over a dir the loser was
    // still mutating). The claim file moves the collision to BEFORE
    // any data write: a writer exclusively creates `.claim-v=<n>` for
    // its version, so the loser refuses cleanly with ZERO bytes
    // written. Two guards after the claim close the observable
    // stale-carry-forward interleaves:
    //   (a) the committed head must still be the snapshot this
    //       publish read (a writer that committed in between would
    //       have its bucket rewrites dropped by our carry-forward);
    //   (b) no OTHER live claim may sit in (head, v) — that is an
    //       in-flight writer built on the same snapshot that will
    //       commit below us; exactly one of us may proceed, and the
    //       lower claim wins deterministically.
    // The claim is removed when the publish DECIDES (commit or any
    // abort — the try/finally below), so a live claim marks exactly
    // one in-flight publish. A writer killed -9 mid-publish leaves a
    // stale claim that blocks later writers LOUDLY (fail-stop over
    // liveness): [[vacuum]] reclaims decided claims (≤ head) and
    // [[releaseClaims]] is the operator override for a crashed
    // writer's. This is the same boundary Delta draws on S3 (no
    // mutual-exclusion primitive ⇒ external coordination — the
    // S3SingleDriverLogStore contract); with claims the failure mode
    // is DETECTED refusal, never silent loss.
    val prevV = prev.map(_.v).getOrElse(0L)
    val (maxUsed, liveClaims) = scanVersions(f, root)
    val v = math.max(prevV, maxUsed) + 1
    val claimPath = new Path(root, s"$ClaimPrefix$v")
    exclusiveCreate(f, claimPath, v).close()
    faultPoint("after-claim")
    def abortClaim(reason: String): Nothing = {
      try f.delete(claimPath, false)
      catch { case scala.util.control.NonFatal(_) => () }
      throw new ConcurrentCommitException(v,
        new java.io.IOException(reason), reason)
    }
    val head = committedVersion(f, root)
    if (head != prevV)
      abortClaim(s"table advanced to v=$head after this publish " +
        s"snapshotted v=$prevV; committing would carry forward stale " +
        "state over the newer writer's changes")
    val inFlight = liveClaims.filter(c => c > head && c < v)
    if (inFlight.nonEmpty)
      abortClaim(s"writer(s) with claim(s) v=${inFlight.sorted.mkString(",")} " +
        "are in flight below this publish's version; their commits would " +
        "be dropped by our carry-forward — the lower claim wins")
    try {
    val vdir = s"v=$v"
    val (_, tWrite) = timed(tEn)(write(s"$root/$vdir"))
    faultPoint("after-write")
    val newBuckets = f.listStatus(new Path(root, vdir))
      .map(_.getPath.getName).filter(_.startsWith("bucket="))
      .map(_.stripPrefix("bucket=").toInt).sorted.toSeq
    // an EMPTY bucketed write against an existing table must abort, not
    // commit: partitionBy writes no dirs for an empty DataFrame, and the
    // no-bucket-dirs fallback below would publish a whole-dir (empty)
    // snapshot that REPLACES the table outright — an empty upsert batch
    // silently wiping the accumulated state (found by the r16 scaled-
    // bucket sweep review; incremental callers now no-op before publish,
    // this guard is the backstop for any other bucketed writer). A
    // caller that truly means "replace the table with nothing" states
    // it with publishDir. The fresh vdir is unreferenced garbage for
    // [[vacuum]]; readers stay on the previous snapshot.
    require(!(bucketedWriter && newBuckets.isEmpty && prev.nonEmpty),
      s"bucketed publish to $root wrote no bucket dirs (empty input?) — " +
        "committing would replace the existing snapshot with an empty " +
        "whole-dir version; skip empty batches, or use publishDir for " +
        "an intentional whole-table replace")
    // a caller that pre-read existing state for a PROBED bucket set
    // (GoldStage.refreshHourly) hands that set in: if the input's
    // re-evaluation at write time produced a bucket the probe never
    // saw, its existing state was NOT folded in — committing would
    // silently replace that bucket with batch-only rows. Abort BEFORE
    // the pointer swap instead: readers stay on the old snapshot and
    // the fresh dir is unreferenced garbage for [[vacuum]].
    expectBuckets.foreach { exp =>
      val surprise = newBuckets.filterNot(exp)
      require(surprise.isEmpty,
        s"publish wrote buckets ${surprise.mkString(",")} outside the " +
          s"caller's probed set ${exp.toSeq.sorted.mkString(",")} — the " +
          "input re-evaluated differently between probe and write " +
          "(non-deterministic batch? source mutated mid-refresh?); " +
          "aborting before the pointer swap, no state was lost")
    }
    val fresh =
      if (newBuckets.isEmpty) Seq(Entry(-1, vdir))
      else newBuckets.map(b => Entry(b, s"$vdir/bucket=$b"))
    val parent = prev.map(_.v).getOrElse(0L)
    val carried =
      // whole-dir snapshots replace outright; a declared FULL rewrite
      // carries nothing even when some old bucket ids are absent from
      // the fresh write — under a modulus change an old bucket whose
      // keys all landed on new residues writes no dir with its old id,
      // and carrying that old dir would DUPLICATE its rows beside
      // their re-bucketed copies
      if (newBuckets.isEmpty || fullRewrite) Nil
      else prev.map(_.entries).getOrElse(Nil)
        .filter(e => e.key >= 0 && !newBuckets.contains(e.key))
    // Layout rules. (1) A bucketed snapshot keeps the table's recorded
    // layout unless the writer declares a new one; a whole-dir snapshot
    // has no buckets, so no layout. (2) CHANGING the modulus outside a
    // declared full rewrite is refused outright: keys assigned under
    // the old modulus would survive (carried or co-resident) beside
    // the new assignment — the exact carry-forward-merge corruption
    // the stable-bucketing precondition (changesSinceKeyed scaladoc)
    // exists to prevent. (3) A declared modulus must actually bound
    // the written bucket ids — a writer whose column disagrees with
    // its declaration is a bug worth failing loudly on.
    val prevLayout = prev.flatMap(_.layout)
    val layout =
      if (newBuckets.isEmpty) None
      else declaredLayout.orElse(prevLayout)
    // the WHOLE layout, not just the modulus: a same-modulus change of
    // the KEY EXPRESSION ("user_id" → "hash(user_id)") migrates keys
    // between buckets exactly like a modulus change does — carried
    // entries would hold rows beside their re-assigned copies, and the
    // bucket-grain diff would keep trusting bucket identity
    for (dl <- declaredLayout; pl <- prevLayout)
      require(dl == pl || fullRewrite,
        s"layout change $pl→$dl on an incremental publish: keys " +
          "assigned under the old discipline would survive beside the " +
          "new assignment. Re-assigning buckets requires a full " +
          "rewrite (Commit.optimizeBuckets with maxBucketBytes, or " +
          "publishBuckets(fullRewrite = true)).")
    for (l <- layout if newBuckets.nonEmpty) {
      require(newBuckets.max < l.buckets,
        s"written bucket ids ${newBuckets.filter(_ >= l.buckets).mkString(",")} " +
          s"fall outside the declared layout of ${l.buckets} buckets")
      // a FIRST-TIME declaration over a legacy (layout-less) table must
      // bound the CARRIED entries too: declaring 8 buckets over a
      // 16-bucket table on an incremental publish would leave carried
      // ids the declared modulus says cannot exist
      require(fullRewrite || carried.forall(_.key < l.buckets),
        s"carried bucket ids ${carried.map(_.key).filter(_ >= l.buckets)
          .mkString(",")} fall outside the declared layout of " +
          s"${l.buckets} buckets — the declaration does not describe " +
          "this table; re-bucket with a full rewrite instead")
    }
    // Schema, row count, per-entry AND per-file zone maps all come
    // from the fresh files' FOOTERS, read once driver-side — publish
    // is on the streaming commit critical path (one call per
    // micro-batch), and both a Spark job and a second directory
    // listing (spark.read.parquet partition discovery) there would
    // re-scan the fresh version every epoch for audit metadata.
    val conf = spark.sessionState.newHadoopConf()
    // one flat pool batch across ALL fresh entry dirs (an incremental
    // publish's fresh version is one dir per touched bucket — a
    // per-dir harvest loop would serialize their footer opens)
    val (harvests, tHarvest) = timed(tEn)(Skipping.harvestMany(conf,
      fresh.map(e => e.dir -> new Path(s"$root/${e.dir}"))))
    val freshStats = harvests.view.mapValues(_.entry).toMap
    // single-file entries: the entry box IS the file box — no #fstats
    val freshFileStats = harvests.collect {
      case (dir, h) if h.files.size > 1 => dir -> h.files
    }
    // bucketed version dirs are exactly bucket=<b>/files (publish
    // controls the write), so footer schema + the int partition column
    // reproduces what partition discovery would infer. Whole-dir
    // writers may nest their own partition dirs the footers don't
    // know about — those keep the spark.read inference.
    val footerSchema: Option[org.apache.spark.sql.types.StructType] =
      if (newBuckets.isEmpty || harvests.size != fresh.size) None
      else harvests.values.flatMap(_.schema).headOption.flatMap { mt =>
        try {
          val st = new org.apache.spark.sql.execution.datasources.parquet
            .ParquetToSparkSchemaConverter(spark.sessionState.conf).convert(mt)
          Some(org.apache.spark.sql.types.StructType(st.fields :+
            org.apache.spark.sql.types.StructField("bucket",
              org.apache.spark.sql.types.IntegerType, nullable = true)))
        } catch { case scala.util.control.NonFatal(_) => None }
      }
    val snapSchema = footerSchema.orElse(
      try Some(spark.read.parquet(s"$root/$vdir").schema)
      catch { case scala.util.control.NonFatal(_) => None })
    // untouched buckets keep the zone maps recorded when THEIR data
    // was written — immutable data, immutable stats
    val carriedDirs = carried.map(_.dir).toSet
    val carriedStats = prev.map(_.stats).getOrElse(Map.empty)
      .filter { case (dir, _) => carriedDirs.contains(dir) }
    val carriedFileStats = prev.map(_.fileStats).getOrElse(Map.empty)
      .filter { case (dir, _) => carriedDirs.contains(dir) }
    val rows =
      if (freshStats.size == fresh.size) Some(freshStats.values.map(_.rows).sum)
      else footerRows(spark, s"$root/$vdir")
    // idempotent-writer watermarks survive EVERY publish path (an
    // optimizeBuckets compaction or an unrelated writer's publish must
    // not wipe another app's replay cursor); a writer's own watermark
    // only ever advances
    val prevTxns = prev.map(_.txns).getOrElse(Map.empty)
    val txns = appTxn.fold(prevTxns) { case (app, ver) =>
      prevTxns.updated(app,
        math.max(prevTxns.getOrElse(app, Long.MinValue), ver))
    }
    val (_, tCommit) = timed(tEn)(commitManifest(spark, root, v, parent,
      (carried ++ fresh).sortBy(_.key),
      snapSchema, rows, carriedStats ++ freshStats,
      carriedFileStats ++ freshFileStats, layout, txns))
    if (tEn) {
      graft.util.PhaseTimer.record("publish.write", tWrite)
      graft.util.PhaseTimer.record("publish.harvest", tHarvest)
      graft.util.PhaseTimer.record("publish.manifest", tCommit)
    }
    if (timing) Console.err.println(
      f"[publish-timing] v=$v files=${fresh.size} " +
        f"write=${tWrite / 1e9}%.3f harvest=${tHarvest / 1e9}%.3f " +
        f"manifest=${tCommit / 1e9}%.3f")
    v
    } finally {
      // the publish DECIDED (committed, refused a rail, or lost the
      // manifest race): the claim's job is done either way
      try f.delete(claimPath, false)
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  /** Remove ALL claim files under `root` — the operator override for a
    * writer killed mid-publish (its claim blocks later writers loudly;
    * see the claim block in [[publishLocked]]). Only safe when no
    * writer is actually in flight — the same out-of-band judgment
    * Delta asks of S3 users clearing a stuck lock.
    */
  def releaseClaims(spark: SparkSession, root: String): Int = {
    val f = fs(spark, root)
    val r = new Path(root)
    if (!f.exists(r)) 0
    else {
      val claims = f.listStatus(r).map(_.getPath)
        .filter(_.getName.startsWith(ClaimPrefix))
      claims.foreach(p => f.delete(p, false))
      claims.length
    }
  }

  /** Rows written into a version dir, from parquet footer metadata
    * only (no Spark job, no column IO). None on any read problem —
    * `#rows=` is audit lineage, never worth failing a commit over.
    */
  private def footerRows(spark: SparkSession, dir: String): Option[Long] =
    try {
      val conf = spark.sessionState.newHadoopConf()
      val it = new Path(dir).getFileSystem(conf)
        .listFiles(new Path(dir), true)
      var n = 0L
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && st.getPath.getName.endsWith(".parquet")) {
          val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf))
          try n += rd.getRecordCount finally rd.close()
        }
      }
      Some(n)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Two writers raced to the same version number: the second one's
    * exclusive manifest create failed. The losing commit wrote only
    * unreferenced garbage (its version dir) — readers never saw it;
    * the caller retries the whole publish, which will claim the next
    * free version (the Delta/Iceberg optimistic-concurrency contract).
    */
  final class ConcurrentCommitException(v: Long, cause: Throwable,
      detail: String = "")
    extends RuntimeException(
      s"version $v was claimed by a concurrent writer; retry the publish" +
        (if (detail.isEmpty) "" else s" — $detail"),
      cause)

  /** Write + sync the manifest file, then atomically swap the pointer.
    * Everything before the final rename is invisible to readers. The
    * manifest create is EXCLUSIVE (no overwrite): the manifest file IS
    * the version claim, so two racing writers can never both commit
    * the same version — the loser gets [[ConcurrentCommitException]]
    * while its data dir stays unreferenced garbage for [[vacuum]].
    */
  private[graft] def commitManifest(spark: SparkSession, root: String, v: Long,
      parent: Long, entries: Seq[Entry],
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      rows: Option[Long] = None,
      stats: Map[String, Skipping.EntryStats] = Map.empty,
      fileStats: Map[String, Seq[(String, Skipping.EntryStats)]] = Map.empty,
      layout: Option[Layout] = None,
      txns: Map[String, Long] = Map.empty): Unit = {
    val f = fs(spark, root)
    val name = s"manifest-$v.txt"
    val meta = Seq(s"#parent=$parent") ++
      schema.map(st => s"#schema=${st.json}") ++ rows.map(n => s"#rows=$n") ++
      layout.map(l => s"#layout=${l.buckets}\t${l.keyExprSql}") ++
      txns.toSeq.sortBy(_._1).map { case (app, ver) => s"#txn=$app\t$ver" } ++
      stats.toSeq.sortBy(_._1).map { case (dir, es) =>
        s"#stats=$dir\t${Skipping.encode(es)}"
      } ++
      fileStats.toSeq.sortBy(_._1).flatMap { case (dir, files) =>
        files.sortBy(_._1).map { case (file, es) =>
          s"#fstats=$dir\t$file\t${Skipping.encode(es)}"
        }
      }
    // Writer-side enforcement of the header-order contract
    // ([[HeavyMetaPrefixes]]): no line a streamed header reader needs
    // (#parent, #layout) may follow the first heavy stats line, or
    // layout()/parentAt() would stop before seeing it.
    require(!meta
      .dropWhile(l => !HeavyMetaPrefixes.exists(l.startsWith))
      .exists(l => l.startsWith("#parent=") || l.startsWith("#layout=") ||
        l.startsWith("#txn=")),
      "manifest meta order violated: light header line after heavy stats lines")
    val body = (v.toString +: meta ++: entries.map(e => s"${e.key}\t${e.dir}"))
      .mkString("\n")
    val mf = new Path(root, name)
    val out = exclusiveCreate(f, mf, v)
    try {
      out.write(body.getBytes(StandardCharsets.UTF_8))
      out match {
        case h: org.apache.hadoop.fs.FSDataOutputStream => h.hflush(); h.hsync()
        case l: java.io.FileOutputStream => l.flush(); l.getFD.sync()
        case o => o.flush()
      }
    } finally out.close()
    // stage the new pointer content beside the target, then rename
    val tmp = new Path(root, s".$Pointer.tmp-$v")
    val pout = f.create(tmp, true)
    try {
      pout.write(name.getBytes(StandardCharsets.UTF_8))
      pout.hflush(); pout.hsync()
    } finally pout.close()
    atomicRename(spark, tmp, new Path(root, Pointer))
  }

  /** Crash-fault injection point for the forked SIGKILL tests
    * (CommitCrashSpec): when `SPARK_GRAFT_FAULT` names this point, drop
    * the marker file `SPARK_GRAFT_FAULT_MARK` so the parent test knows
    * the process is parked exactly here, then sleep until the parent
    * SIGKILLs the JVM — the crash itself is a REAL kill of a real
    * process mid-publish, only its POSITION is injected. A no-op in
    * every other process (the env vars are only set on the forked
    * writer's ProcessBuilder).
    */
  private def faultPoint(name: String): Unit =
    if (sys.env.get("SPARK_GRAFT_FAULT").contains(name)) {
      sys.env.get("SPARK_GRAFT_FAULT_MARK").foreach { m =>
        java.nio.file.Files.writeString(java.nio.file.Path.of(m), name)
      }
      while (true) Thread.sleep(1000L)
    }

  /** Exclusively create `p` — the mutual-exclusion primitive both the
    * version claim and the manifest rely on. Hadoop's
    * RawLocalFileSystem implements `create(p, overwrite=false)` as a
    * non-atomic exists()-then-open (no O_EXCL), so on file:// two
    * racing JVMs can BOTH win in the TOCTOU window; local paths
    * therefore go through `java.nio.file.Files.createFile`
    * (O_CREAT|O_EXCL, atomic on POSIX — the same local special-case
    * [[atomicRename]] has), everything else through
    * `FileSystem.create(p, false)` which IS atomic on HDFS.
    *
    * Only a lost race surfaces as [[ConcurrentCommitException]]
    * (hadoop/nio FileAlreadyExistsException); any other IO failure —
    * disk full, permissions, transient FS — propagates as-is so
    * callers don't misdiagnose infrastructure as contention and retry
    * futilely. Returns the created file's content writer (empty for
    * marker files; the manifest writes its body through it).
    */
  private def exclusiveCreate(f: org.apache.hadoop.fs.FileSystem, p: Path,
      v: Long)
      : java.io.OutputStream = {
    if (f.getUri.getScheme == "file") {
      val local = java.nio.file.Paths.get(p.toUri.getPath)
      // hadoop's create() makes parent dirs implicitly; match that
      // (first publish to a fresh root claims before any dir exists)
      java.nio.file.Files.createDirectories(local.getParent)
      // createFile is the atomic exclusion point; once we own the
      // file, reopening it for write is race-free (losers never open)
      try java.nio.file.Files.createFile(local)
      catch {
        case e: java.nio.file.FileAlreadyExistsException =>
          throw new ConcurrentCommitException(v, e)
      }
      new java.io.FileOutputStream(local.toFile)
    } else {
      try f.create(p, false)
      catch {
        case e: org.apache.hadoop.fs.FileAlreadyExistsException =>
          throw new ConcurrentCommitException(v, e)
        // some FileSystems signal the exists-conflict as a plain
        // IOException whose message names the path; translate only
        // that shape, let real infrastructure errors propagate
        case e: java.io.IOException
            if e.getMessage != null &&
              e.getMessage.contains("already exists") =>
          throw new ConcurrentCommitException(v, e)
      }
    }
  }

  /** Atomic replace of `dst` by `src`. Local paths go through POSIX
    * rename (atomic, replaces); everything else through FileContext
    * rename with OVERWRITE (atomic on HDFS — the same primitive HBase
    * and Delta-on-HDFS commit with).
    */
  private def atomicRename(spark: SparkSession, src: Path, dst: Path): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val uri = src.getFileSystem(conf).getUri
    if (uri.getScheme == "file") {
      java.nio.file.Files.move(
        java.nio.file.Paths.get(src.toUri.getPath),
        java.nio.file.Paths.get(dst.toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else {
      FileContext.getFileContext(uri, conf)
        .rename(src, dst, Options.Rename.OVERWRITE)
    }
  }

  /** Commit `df` partitioned by `bucketCol`: only the buckets present
    * in `df` are written; the rest carry forward from the current
    * manifest. This is the incremental-upsert publication: bounded
    * write amplification AND a transactional boundary.
    *
    * Contract edges: a rewritten bucket carries ALL its surviving keys
    * (bucket-wholesale, like a Delta partition overwrite), and a
    * bucket cannot be published EMPTY — partitionBy writes no dir for
    * an empty input, so "present but empty" is not expressible here.
    * An empty `df` against an existing table is therefore refused
    * (it would otherwise commit a whole-dir empty snapshot replacing
    * the table); retiring a bucket's last row takes a full rewrite or
    * [[publishDir]], and incremental maintainers should no-op on
    * empty batches (refreshHourly/statusUpsert do).
    *
    * `layout` declares the bucketing discipline this write used
    * `txn = Some((appId, epoch))` records the idempotent-writer
    * watermark atomically with the data (the Delta txnAppId/txnVersion
    * analog): an at-least-once caller (foreachBatch) checks
    * [[lastTxn]] before applying and skips epochs ≤ the watermark —
    * the exactly-once contract a NON-idempotent merge (additive fold)
    * needs under micro-batch replay.
    *
    * ([[Layout]]) — recorded in the manifest so maintainers and
    * [[optimizeBuckets]] can evolve the bucket count; when absent the
    * table's recorded layout carries forward. `fullRewrite = true`
    * states `df` IS the whole table: nothing carries forward, even
    * buckets absent from the write (required for a modulus change;
    * also the way to retire a bucket's last row without going
    * whole-dir).
    */
  def publishBuckets(df: DataFrame, root: String,
      bucketCol: String = "bucket",
      expectBuckets: Option[Set[Int]] = None,
      layout: Option[Layout] = None,
      fullRewrite: Boolean = false,
      txn: Option[(String, Long)] = None): Long = {
    txn.foreach { case (app, _) =>
      require(app.nonEmpty && !app.contains("\n") && !app.contains("\t"),
        s"txn appId must be a single manifest-line-safe token: '$app'")
    }
    // the on-disk layout is ALWAYS `bucket=<b>` — publish() scans for
    // that prefix to enumerate fresh entries, and the read side
    // renames back to the caller's bucketCol. Writing `<bucketCol>=`
    // dirs would silently degrade the table to one whole-dir entry
    // (no bucket keys, no carry-forward, no key pruning).
    val onDisk =
      if (bucketCol == "bucket") df
      else {
        require(!df.columns.contains("bucket"),
          s"bucketCol '$bucketCol' cannot be renamed to the on-disk " +
            "'bucket': the DataFrame already has a 'bucket' column")
        df.withColumnRenamed(bucketCol, "bucket")
      }
    publish(df.sparkSession, root, expectBuckets, bucketedWriter = true,
      declaredLayout = layout, fullRewrite = fullRewrite,
      appTxn = txn) { vdir =>
      onDisk.write.mode("overwrite").partitionBy("bucket").parquet(vdir)
    }
  }

  /** Commit a whole-snapshot rewrite (compaction, full MV rebuild):
    * the writer fills the fresh version dir, the manifest replaces all
    * previous entries.
    */
  def publishDir(spark: SparkSession, root: String)
      (write: String => Unit): Long =
    publish(spark, root)(write)

  /** Compact the current snapshot's buckets to ONE file each and
    * publish the result as a new version — the Delta `OPTIMIZE` /
    * Iceberg `rewrite_data_files` maintenance op. Why it's needed:
    * every incremental publish writes its touched buckets with the
    * writer's parallelism, so a bucket fed by thousands of
    * micro-batches accumulates that many small files and reads pay
    * per-file open cost (the classic streaming small-file problem).
    * Data immutability makes compaction just another publish: the
    * rewrite lands in a fresh version dir, readers stay on the old
    * complete snapshot until the pointer swap, and [[vacuum]]
    * reclaims superseded files after the grace period. Zone maps are
    * re-harvested from the compacted footers (same bounds, fewer
    * files). The one-partition-per-bucket repartition is correct at
    * scale because bucket count, not data volume, bounds parallelism
    * here — callers with very large buckets raise the bucket count,
    * not the file count. No-op (None) when the table is missing or
    * has no bucketed entries (whole-dir snapshots recompact through
    * [[Sources.compactCommit]]).
    *
    * RE-BUCKET MODE (`maxBucketBytes`): when the manifest records a
    * [[Layout]] and any bucket's on-disk bytes exceed the threshold,
    * the rewrite also EVOLVES the bucket count — the modulus doubles
    * until the table's projected per-bucket bytes (total/n, the
    * near-uniform-hash estimate; a single hot KEY stays hot under any
    * modulus, the standard hash-bucketing caveat) fit the threshold
    * (capped at 4096, [[graft.warehouse.Staging.bucketsFor]]'s max),
    * and every row's bucket is recomputed from the recorded key
    * expression. This is how the measured scaled-bucket cap
    * (SCALING_CURVE.json commit_cdf: publish exponent ~0 when
    * per-bucket bytes are held constant) becomes ENGINE behavior on a
    * table that cannot be regenerated: run this on the maintenance
    * schedule and per-bucket bytes stay bounded as the table grows.
    * The re-bucket is a FULL rewrite in one new version (the only
    * sound shape for a modulus change — [[publish]]'s layout guard),
    * committed with the new `#layout`, after which layout-aware
    * maintainers pick up the new modulus automatically. Cost: one
    * table scan + rewrite — same as the compaction this op already is;
    * the trigger check itself is a driver-side directory summary per
    * bucket (≤ bucket-count listing calls, no data IO).
    *
    * Change feeds across the boundary stay EXACT: all entries are
    * fresh, so [[changesSinceKeyed]] degrades to a whole-table keyed
    * diff — a pure re-bucket (same rows, new buckets) yields an EMPTY
    * feed (see its scaladoc).
    */
  /** Total on-disk bytes of the CURRENT snapshot's entries (live data
    * only — superseded versions' garbage excluded): the sizing input a
    * caller needs to pick an [[optimizeBuckets]] `maxBucketBytes`
    * threshold, resolved through the same Hadoop FileSystem every
    * other Commit path uses. None before any commit.
    */
  def liveDataBytes(spark: SparkSession, root: String): Option[Long] =
    currentManifest(spark, root).map { m =>
      val f = fs(spark, root)
      m.entries.map(e =>
        f.getContentSummary(new Path(s"$root/${e.dir}")).getLength).sum
    }

  def optimizeBuckets(spark: SparkSession, root: String,
      bucketCol: String = "bucket",
      maxBucketBytes: Option[Long] = None): Option[Long] =
    currentManifest(spark, root)
      .filter(_.entries.exists(_.key >= 0))
      .map { m =>
        val df = applySchema(assemble(spark, root, m.entries, bucketCol),
          m.schema, bucketCol)
        val evolved: Option[Layout] =
          for {
            thr <- maxBucketBytes
            l <- m.layout
            f0 = fs(spark, root)
            sizes = m.entries.filter(_.key >= 0).map(e =>
              f0.getContentSummary(new Path(s"$root/${e.dir}")).getLength)
            if sizes.nonEmpty && sizes.max > thr
            total = sizes.sum
          } yield {
            var n = l.buckets.toLong
            while (n < 4096L && total / n > thr) n *= 2
            Layout(math.min(n, 4096L).toInt, l.keyExprSql)
          }
        evolved match {
          case Some(nl) if nl.buckets != m.layout.map(_.buckets).getOrElse(0) =>
            // full rewrite under the NEW modulus: recompute the bucket
            // column from the recorded key expression, one partition
            // per new bucket → one file per bucket
            val rebucketed = df.withColumn(bucketCol, nl.bucketExpr)
            publishBuckets(rebucketed.repartition(col(bucketCol)), root,
              bucketCol, layout = Some(nl), fullRewrite = true)
          case _ =>
            // plain compaction: each bucket collapses into exactly one
            // input partition, so partitionBy writes one file per
            // bucket; the recorded layout carries forward
            publishBuckets(df.repartition(col(bucketCol)), root, bucketCol)
        }
      }

  /** Delete versions and manifests outside the retained history —
    * crashed-publish garbage and superseded snapshots. `retain` is the
    * number of committed chain versions (newest first, always
    * including current) whose snapshots stay time-travel-readable;
    * live data dirs are the UNION of the retained manifests' entries,
    * so a bucket carried forward since v=1 survives every vacuum that
    * retains any manifest referencing it. NOT called automatically:
    * in-flight readers may still be scanning a superseded version, so
    * production runs this on a grace-period schedule (the standard
    * table-format vacuum contract).
    */
  def vacuum(spark: SparkSession, root: String, retain: Int = 1): Unit = {
    require(retain >= 1, s"vacuum must retain the current version; got $retain")
    withWriterLock(spark, root) {
    val f = fs(spark, root)
    if (current(spark, root).nonEmpty) {
      val keep = history(spark, root).take(retain)
      val live = keep.flatMap(v => manifestAt(spark, root, v))
        .flatMap(_.entries.map(_.dir.takeWhile(_ != '/'))).toSet
      f.listStatus(new Path(root)).map(_.getPath).foreach { p =>
        val n = p.getName
        val stale =
          (n.startsWith("v=") && !live.contains(n)) ||
            (n.startsWith("manifest-") && !keep.contains(
              n.stripPrefix("manifest-").stripSuffix(".txt").toLong)) ||
            n.startsWith(s".$Pointer.tmp-") ||
            // DECIDED claims (≤ committed head) are leftovers of a
            // publish that lost its own cleanup race; claims ABOVE the
            // head may mark a live in-flight writer and stay
            // ([[releaseClaims]] is the operator override)
            (n.startsWith(ClaimPrefix) &&
              n.stripPrefix(ClaimPrefix).toLong <= keep.max)
        if (stale) f.delete(p, true)
      }
    }
    }
  }
}
