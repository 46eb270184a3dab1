package graft.warehouse

import graft.Tables
import graft.operators.MinHashDedup
import graft.sources.Sources
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The MinHash signature/candidate-pair tables as MATERIALIZED
  * warehouse artifacts — the dedup twin of [[GraphStage]].
  *
  * Five analyses (q_minhash_lsh_pairs, q_minhash_est_quality,
  * q_dedup_clusters, q_dedup_survivors, q_dedup_incremental — plus
  * q_minhash_signatures itself) consume the same two relations: the
  * 16-lane MinHash signature table and the banded LSH candidate pairs
  * at est ≥ 0.5. Rebuilding signatures+bands per query paid the
  * shingle explode + 4 md5s/shingle + band self-join up to five times
  * over. A production dedup pipeline persists the signature table next
  * to the corpus and pairs AGAINST it per ingest (the
  * q_dedup_incremental story); here both relations are staged once per
  * source snapshot:
  *
  *  - `dd_minhash_sig` — doc_id, mh_0..15, band_0..3, bucketed by
  *    doc_id: the three signature re-attaches (scoring joins) become
  *    bucketed scans instead of recomputes.
  *  - `dd_minhash_pairs` — (doc_a, doc_b, est_jaccard ≥ 0.5),
  *    bucketed by doc_a: clusters/survivors/est-quality start from the
  *    collision-bounded pair list directly.
  *
  * Results are bit-identical to the inline builds these replaced: the
  * staging chain is the same expression DAG, parquet round-trips the
  * int lanes / hex band strings exactly, and est_jaccard (k/16) is
  * dyadic. The DuckDB oracles still recompute everything from raw
  * `documents`, so every green row re-proves the staged path.
  */
object DedupStage {

  private val SrcTables = Seq("documents")
  val PairThreshold = 0.5

  private def sigName(t: String)  = s"dd_minhash_sig_$t"
  private def pairName(t: String) = s"dd_minhash_pairs_$t"
  private def shName(t: String)   = s"dd_simhash_sig_$t"

  /** doc_id, mh_0..15, band_0..3 — bucketed by doc_id. */
  def signatures(s: SparkSession, d: String): DataFrame =
    { val t = ensure(s, d); s.table(sigName(t)) }

  /** LSH candidate pairs (doc_a < doc_b, est_jaccard ≥ 0.5) —
    * bucketed by doc_a.
    */
  def pairs(s: SparkSession, d: String): DataFrame =
    { val t = ensure(s, d); s.table(pairName(t)) }

  /** doc_id, simhash (60-bit long) — bucketed by doc_id. Staged r21:
    * the SimHash signature table is the same persist-next-to-the-corpus
    * artifact as the MinHash signatures above (a production near-dup
    * pipeline writes both once per snapshot and pairs against them per
    * ingest); q_simhash and q_simhash_neardup re-derived it from the
    * raw corpus per invocation — the 60-vote aggregation over the
    * md5'd distinct-token stream was ~0.8 s of each run at sf0.1.
    * Parquet round-trips the long exactly; the DuckDB oracles still
    * recompute from raw `documents`, so every green gate run re-proves
    * the staged copy (the DedupStageSpec bit-identity test proves it
    * in-engine too).
    */
  def simhashSigs(s: SparkSession, d: String): DataFrame =
    { val t = ensure(s, d); s.table(shName(t)) }

  private def ensure(s: SparkSession, d: String): String = {
    val t = Staging.tag(s, d, SrcTables)
    Staging.ensure(s, "dedup", d, s"dedup_$t")(build(s, d, t))
    t
  }

  private def build(s: SparkSession, d: String, t: String): Unit = {
    Seq(sigName(t), pairName(t), shName(t)).foreach(Staging.freshTarget(s, _))
    // snapshot-sized width: the shingle explode multiplies source
    // bytes ~50x and the band self-join runs at this parallelism
    // (see Staging.bucketsFor — a pinned 8 measured super-linear)
    val b = Staging.bucketsFor(s, d, SrcTables, expansion = 256)
    Staging.withShuffleWidth(s, b) {
    val sig0 = MinHashDedup.signatures(Tables.documents(s, d))
      .repartition(b, col("doc_id"))
    Sources.writeBucketed(sig0, sigName(t), "doc_id", b)
    // pair generation reads the just-written signature table, so the
    // shingle explode is never recomputed; candidatePairs' internal
    // stage/release then operates on cheap bucketed scans
    val pairs0 = MinHashDedup
      .candidatePairs(s.table(sigName(t)), PairThreshold)
      .repartition(b, col("doc_a"))
    Sources.writeBucketed(pairs0, pairName(t), "doc_a", b)
    val sh0 = graft.operators.SimHash.simhash(Tables.documents(s, d))
      .repartition(b, col("doc_id"))
    Sources.writeBucketed(sh0, shName(t), "doc_id", b)
    }
  }
}
