package graft

import graft.functions.{TextFunctions => TF}
import graft.warehouse.TextStage
import org.apache.spark.sql.functions._

/** The staged token/bigram counts ([[graft.warehouse.TextStage]]) must
  * be a pure materialization: each artifact bit-identical to the inline
  * explode+agg it replaced (parquet round-trips longs/strings exactly —
  * load-bearing because the DuckDB oracles recompute from raw
  * `documents`), and the consumers must SCAN the artifacts instead of
  * re-exploding the corpus.
  */
class TextStageSpec extends SparkSpec {

  test("staged token counts are bit-identical to the inline derivation") {
    val staged = TextStage.tok(spark, sf0001)
      .orderBy("doc_id", "token").collect().toSeq
    val inline = Tables.documents(spark, sf0001)
      .select(col("doc_id"), explode(TF.tokens(lower(col("text")))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .orderBy("doc_id", "token").collect().toSeq
    assert(staged == inline)
  }

  test("staged bigram counts are bit-identical to the inline derivation") {
    val staged = TextStage.bg(spark, sf0001)
      .orderBy("doc_id", "b").collect().toSeq
    val inline = Tables.documents(spark, sf0001)
      .filter(length(col("text")) >= 2)
      .select(col("doc_id"), col("lang"),
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", "_").as("t"))
      .select(col("doc_id"), col("lang"), explode(
        expr("transform(sequence(1, length(t) - 1), i -> substring(t, i, 2))")).as("b"))
      .groupBy("doc_id", "lang", "b").agg(count(lit(1)).as("n"))
      .orderBy("doc_id", "b").collect().toSeq
    assert(staged == inline)
  }

  test("per-doc rollup of the bucketed artifact adds no exchange") {
    // HashPartitioning(doc_id) from the bucketed scan satisfies the
    // clustered distribution of any grouping that includes doc_id —
    // the reason the artifact buckets by doc_id
    val agg = TextStage.tok(spark, sf0001)
      .groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    agg.collect()
    val p = agg.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"), p)
  }
}
