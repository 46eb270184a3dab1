package graft.operators

import graft.functions.{PortableHash, TextFunctions => TF, TextSql => TS}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection (training-data dedup).
  *
  * Signature: 16 minhash values per document — 4 md5 invocations per
  * shingle (seed suffix #0..#3), each yielding 4 independent 32-bit
  * lanes (see [[graft.functions.PortableHash]]). Banding: 4 bands of 4
  * values; documents sharing any band hash are candidate pairs.
  *
  * Scale path (the reason this beats pairwise Jaccard at 100 TB):
  * signatures are a narrow per-row transform; candidate generation is
  * an equi-join on (band_idx, band_hash) — a hash-partitioned shuffle
  * whose size is the number of *colliding* docs, never the n² pairs.
  */
object MinHashDedup {
  val NumSeeds = 4
  val NumLanes = 4
  val NumHashes: Int = NumSeeds * NumLanes // 16
  val BandSize = 4
  val NumBands: Int = NumHashes / BandSize // 4
  val ShingleK = 3

  /** doc_id + mh_0..mh_15 + band_0..band_3.
    *
    * Shape: explode shingles → per-shingle md5s + lanes → hash-agg
    * `min` per doc. One traversal of each doc's shingles, map-side
    * partial aggregation, whole-stage codegen throughout — the shape
    * that survives 100 TB (the earlier nested-transform version
    * re-inlined the shingle array into all 16 lane expressions).
    */
  def signatures(docs: DataFrame): DataFrame = {
    val exploded = docs.select(col("doc_id"),
      explode(TF.shingles(col("text"), ShingleK)).as("x"))
    val hashed = exploded.select(col("doc_id") +:
      (0 until NumSeeds).map(s2 =>
        md5(concat(col("x"), lit(s"#$s2"))).as(s"h_$s2")): _*)
    val mins = (for (s2 <- 0 until NumSeeds; l <- 0 until NumLanes) yield
      min(expr(PortableHash.laneSpark(s"h_$s2", l)))
        .as(s"mh_${s2 * NumLanes + l}"))
    val sig = hashed.groupBy("doc_id").agg(mins.head, mins.tail: _*)
    sig.select(col("doc_id") +:
      (0 until NumHashes).map(i => col(s"mh_$i")) ++:
      (0 until NumBands).map { b =>
        val cols = (0 until BandSize).map(i => col(s"mh_${b * BandSize + i}"))
        md5(concat_ws(",", cols: _*)).as(s"band_$b")
      }: _*)
  }

  /** DuckDB SQL producing the identical signature relation. */
  def signaturesSqlDuck(docsRel: String = "documents"): String = {
    val sh = TS.shingles("text", ShingleK)
    val md5s = (0 until NumSeeds).map { s2 =>
      s"list_transform($sh, x -> md5(x || '#$s2')) AS md5_$s2"
    }.mkString(", ")
    val sigs = (for (s2 <- 0 until NumSeeds; l <- 0 until NumLanes) yield
      s"list_min(list_transform(md5_$s2, h -> ${PortableHash.laneDuck("h", l)})) AS mh_${s2 * NumLanes + l}")
      .mkString(", ")
    val bands = (0 until NumBands).map { b =>
      val cols = (0 until BandSize).map(i => s"mh_${b * BandSize + i}")
      s"md5(concat_ws(',', ${cols.mkString(", ")})) AS band_$b"
    }.mkString(", ")
    s"""SELECT doc_id, ${(0 until NumHashes).map(i => s"mh_$i").mkString(", ")},
               $bands
        FROM (SELECT doc_id, $sigs
              FROM (SELECT doc_id, $md5s FROM $docsRel))"""
  }

  /** Candidate near-dup pairs with estimated Jaccard.
    *
    * Scalable shape: signatures are STAGED ONCE (cached here; at real
    * scale they persist as a table — the same relation is exposed as
    * q_minhash_signatures), then (1) band explode carries ONLY
    * (doc_id, band_idx, band_hash) into the candidate equi-join,
    * (2) `distinct()` dedups the narrow (doc_a, doc_b) pairs — not
    * 16-wide signature rows, (3) the two signature re-attaches for
    * scoring are hash joins against the staged relation. No OR-join,
    * no broadcast of the full corpus, no signature recompute per use.
    */
  /** Narrow banded view of a signature relation: one (doc_id, band_idx,
    * band_hash) row per band, extra columns preserved — the LSH bucket
    * key relation both batch and incremental dedup equi-join on.
    */
  def banded(sigs: DataFrame, extraCols: String*): DataFrame =
    sigs.select(col("doc_id") +: extraCols.map(col) :+
      explode(array((0 until NumBands).map(b =>
        struct(lit(b).as("band_idx"), col(s"band_$b").as("band_hash"))): _*)).as("bd"): _*)
      .select(col("doc_id") +: extraCols.map(col) :+
        col("bd.band_idx") :+ col("bd.band_hash"): _*)

  def candidatePairs(sigs0: DataFrame, minSim: Double): DataFrame = {
    val sigs = sigs0.cache()
    val bandedView = banded(sigs)
    val a = bandedView.alias("a")
    val b = bandedView.alias("b")
    val pairs = a.join(b,
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val sa = sigs.select(col("doc_id").as("doc_a") +:
      (0 until NumHashes).map(i => col(s"mh_$i").as(s"a_mh_$i")): _*)
    val sb = sigs.select(col("doc_id").as("doc_b") +:
      (0 until NumHashes).map(i => col(s"mh_$i").as(s"b_mh_$i")): _*)
    val matches = (0 until NumHashes)
      .map(i => (col(s"a_mh_$i") === col(s"b_mh_$i")).cast("int"))
      .reduce(_ + _)
    // materialize the (narrow, collision-bounded) pair list, then
    // release the staged signatures — in a long-lived shared session
    // the cache must not stay pinned past the operator (the
    // PageRank.ranks pattern)
    val out = pairs.join(sa, "doc_a").join(sb, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (matches.cast("double") / NumHashes).as("est_jaccard"))
      .filter(col("est_jaccard") >= minSim)
      .transform(graft.util.Staged.materialize)
    sigs.unpersist()
    out
  }

  /** DuckDB SQL for [[candidatePairs]] (small-scale OR-join is fine for
    * the oracle).
    */
  def candidatePairsSqlDuck(minSim: Double, docsRel: String = "documents"): String = {
    val matches = (0 until NumHashes).map(i =>
      s"CASE WHEN a.mh_$i = b.mh_$i THEN 1 ELSE 0 END").mkString(" + ")
    val bandMatch = (0 until NumBands).map(b => s"a.band_$b = b.band_$b").mkString(" OR ")
    s"""WITH sig AS (${signaturesSqlDuck(docsRel)})
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST($matches AS DOUBLE) / $NumHashes AS est_jaccard
        FROM sig a JOIN sig b
          ON a.doc_id < b.doc_id AND ($bandMatch)
        WHERE CAST($matches AS DOUBLE) / $NumHashes >= $minSim"""
  }
}

/** SimHash document fingerprinting: 60-bit signature from token-hash
  * bit votes (two 32-bit md5 lanes supply 60 independent bit votes).
  * Near-dup docs differ in few bits (Hamming distance).
  *
  * 60 bits splits evenly into 4 × 15-bit bands: by pigeonhole, any pair
  * at Hamming distance ≤ 3 agrees exactly on at least one band, so
  * near-dup candidate generation is an equi-join on (band_idx,
  * band_val) — the classic web-scale design (no O(n²) pair join).
  */
object SimHash {
  val Bits = 60
  val BandBits = 15
  val NumBands: Int = Bits / BandBits // 4 bands => pigeonhole for Hamming <= NumBands-1

  /** doc_id, simhash (long; bits 0..59).
    *
    * r21 measured-and-rejected (kept for the record, guide §1 measure
    * first): two restructurings of this aggregation were tried solo at
    * sf0.1 and BOTH lost to this shape — (a) carrying (lang, source)
    * through the group keys to kill the consumer's join-back was ~12%
    * slower (two string keys hashed per token row in a 500k-row agg
    * outweigh a 5k-row broadcast join), and (b) branch-free set-bit
    * counting (`sum(shiftright(h,b) & 1)` + one shared row count,
    * testing 2·cnt > n) was ~18% slower than the signed ±1 votes below
    * (1.45 → 1.72 s solo medians, quiet box, alternating A/B runs).
    */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = docs.select(
      col("doc_id"),
      explode(array_distinct(TF.tokens(col("text")))).as("tok"))
    val hashed = toks
      .withColumn("hx", md5(concat(col("tok"), lit("#0"))))
      .withColumn("h0", expr(PortableHash.laneSpark("hx", 0)))
      .withColumn("h1", expr(PortableHash.laneSpark("hx", 1)))
    val votes = (0 until Bits).map { i =>
      val (h, b) = if (i < 32) ("h0", i) else ("h1", i - 32)
      sum(when(expr(s"($h div ${1L << b}) % 2") === 1, 1).otherwise(-1)).as(s"v_$i")
    }
    val agg = hashed.groupBy("doc_id").agg(votes.head, votes.tail: _*)
    val sig = (0 until Bits).map(i =>
      when(col(s"v_$i") > 0, lit(1L << i)).otherwise(0L)).reduce(_ + _)
    agg.select(col("doc_id"), sig.as("simhash"))
  }

  def simhashSqlDuck(docsRel: String = "documents"): String = {
    val votes = (0 until Bits).map { i =>
      val (h, b) = if (i < 32) ("h0", i) else ("h1", i - 32)
      s"SUM(CASE WHEN ($h // ${1L << b}) % 2 = 1 THEN 1 ELSE -1 END) AS v_$i"
    }.mkString(", ")
    val sig = (0 until Bits).map(i =>
      s"CASE WHEN v_$i > 0 THEN ${1L << i} ELSE 0 END").mkString(" + ")
    s"""SELECT doc_id, CAST($sig AS BIGINT) AS simhash
        FROM (SELECT doc_id, $votes
              FROM (SELECT doc_id, ${PortableHash.laneDuck("hx", 0)} AS h0,
                           ${PortableHash.laneDuck("hx", 1)} AS h1
                    FROM (SELECT doc_id, md5(tok || '#0') AS hx
                          FROM (SELECT doc_id, unnest(list_distinct(${TS.tokens("text")})) AS tok
                                FROM $docsRel)))
              GROUP BY doc_id)"""
  }

  /** The 15-bit band value of `sigCol` for band `b` (Spark dialect). */
  def bandSpark(sigCol: String, b: Int): String =
    s"($sigCol div ${1L << (b * BandBits)}) % ${1 << BandBits}"
}
