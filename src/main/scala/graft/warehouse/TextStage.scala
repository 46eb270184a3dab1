package graft.warehouse

import graft.Tables
import graft.functions.{TextFunctions => TF}
import graft.sources.Sources
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reduced token/bigram count tables as MATERIALIZED warehouse
  * artifacts — the text-family twin of [[DedupStage]]/[[GraphStage]].
  *
  * Four analyses re-exploded the corpus into per-doc counts each run:
  * q_tfidf and q_bm25_topk over the lowercased token stream, q_lm_score
  * and q_dsir_weights over the char-bigram stream. A production corpus
  * pipeline materializes these inverted-index-shaped relations next to
  * the corpus once per snapshot (they are the input to scoring, mixing
  * and model-building passes alike); here both are staged:
  *
  *  - `tx_tok` — (doc_id, token, tf) from `tokens(lower(text))`,
  *    bucketed by doc_id: per-doc rollups (doc length, per-doc top-k
  *    windows) and (doc_id, token) re-aggregations are exchange-free
  *    (HashPartitioning(doc_id) satisfies the clustered distribution
  *    of any grouping that includes doc_id).
  *  - `tx_bg` — (doc_id, lang, b, n) char-bigram counts over
  *    `regexp_replace(lower(text), '[^a-z0-9 ]', '_')`, same
  *    bucketing: both LM builds re-aggregate this reduced side
  *    (≤ 38² distinct bigrams), and the per-doc scoring rollup rides
  *    the bucket partitioning.
  *
  * Results are bit-identical to the inline builds these replaced: the
  * staging chain is the same expression DAG and parquet round-trips
  * longs/strings exactly. The DuckDB oracles still recompute from raw
  * `documents`, so every green row re-proves the staged path.
  */
object TextStage {

  private val SrcTables = Seq("documents")

  private def tokName(t: String) = s"tx_tok_$t"
  private def bgName(t: String)  = s"tx_bg_$t"

  /** (doc_id, token, tf) over tokens(lower(text)) — bucketed by doc_id. */
  def tok(s: SparkSession, d: String): DataFrame =
    { val t = ensure(s, d); s.table(tokName(t)) }

  /** (doc_id, lang, b, n) char-bigram counts — bucketed by doc_id.
    * Docs shorter than 2 chars are absent (they have no bigrams; the
    * explicit filter also keeps `sequence(1, len-1)` ascending).
    */
  def bg(s: SparkSession, d: String): DataFrame =
    { val t = ensure(s, d); s.table(bgName(t)) }

  private def ensure(s: SparkSession, d: String): String = {
    val t = Staging.tag(s, d, SrcTables)
    Staging.ensure(s, "text", d, s"text_$t")(build(s, d, t))
    t
  }

  private def build(s: SparkSession, d: String, t: String): Unit = {
    Seq(tokName(t), bgName(t)).foreach(Staging.freshTarget(s, _))
    // token/bigram explode multiplies source bytes ~8× before the
    // count reduction; size the build width to the snapshot
    val b = Staging.bucketsFor(s, d, SrcTables, expansion = 8)
    Staging.withShuffleWidth(s, b) {
      val docs = Tables.documents(s, d)
      val tok0 = docs
        .select(col("doc_id"), explode(TF.tokens(lower(col("text")))).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
        .repartition(b, col("doc_id"))
      Sources.writeBucketed(tok0, tokName(t), "doc_id", b)
      val bg0 = docs
        .filter(length(col("text")) >= 2)
        .select(col("doc_id"), col("lang"),
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", "_").as("t"))
        .select(col("doc_id"), col("lang"), explode(
          expr("transform(sequence(1, length(t) - 1), i -> substring(t, i, 2))")).as("b"))
        .groupBy("doc_id", "lang", "b").agg(count(lit(1)).as("n"))
        .repartition(b, col("doc_id"))
      Sources.writeBucketed(bg0, bgName(t), "doc_id", b)
    }
  }
}
