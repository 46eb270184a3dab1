package graft

import graft.queries.Vectors
import graft.warehouse.VectorStage
import org.apache.spark.sql.functions._

/** The staged ANN index ([[graft.warehouse.VectorStage]]) must be a
  * pure materialization: every artifact bit-identical to the inline
  * derivation it replaced (parquet round-trip exactness is load-bearing
  * for the DuckDB oracles, which still recompute from raw embeddings),
  * and the consumers must actually SCAN the artifacts instead of
  * re-deriving the index.
  */
class VectorStageSpec extends SparkSpec {

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("vec_id").collect().toSeq

  test("staged LSH index rows are bit-identical to the inline derivation") {
    val emb = Tables.embeddings(spark, sf0001)
    val staged = sortedRows(VectorStage.lsh(spark, sf0001)
      .select("vec_id", "label", "embedding", "nrm", "bucket"))
    val inline = sortedRows(Vectors.lshIndexRows(emb))
    assert(staged == inline)
  }

  test("staged IVF assignments are bit-identical to the inline derivation") {
    val emb = Tables.embeddings(spark, sf0001)
    val staged = sortedRows(VectorStage.ivf(spark, sf0001)
      .select("vec_id", "embedding", "cell"))
    val inline = sortedRows(Vectors.ivfAssigned(emb))
    assert(staged == inline)
  }

  test("staged PQ codes + codebook are bit-identical to the inline model build") {
    val emb = Tables.embeddings(spark, sf0001)
    val sv = Vectors.pqSubvectors(emb).cache()
    try {
      val cb = Vectors.pqCodebook(sv)
      val inlineCodes = Vectors.pqAssign(sv, cb)
        .select(col("vec_id"), col("m"), col("code"), col("d2"))
        .orderBy("vec_id", "m").collect().toSeq
      val stagedCodes = VectorStage.pqCodes(spark, sf0001)
        .select("vec_id", "m", "code", "d2")
        .orderBy("vec_id", "m").collect().toSeq
      assert(stagedCodes == inlineCodes)
      val stagedCb = VectorStage.pqCodebook(spark, sf0001)
        .orderBy("m", "code").collect().toSeq
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
      assert(stagedCb == cb)
    } finally sv.unpersist()
  }

  test("band keys unpacked from the stored bucket equal the inline band signatures") {
    // q_embed_neardup_lsh's 2x4-band scheme reads (bucket >> 4b) & 15;
    // prove it against the direct per-plane band computation
    import graft.functions.{VectorFunctions => VF}
    val emb = Tables.embeddings(spark, sf0001)
    val inlineBands = (0 until 2).map { bi =>
      (0 until 4).map { p =>
        when(VF.planeDotSpark("embedding", bi * 4 + p) > 0.0,
          lit(1L << p)).otherwise(0L)
      }.reduce(_ + _).as(s"band_$bi")
    }
    val expect = sortedRows(emb.select(col("vec_id") +: inlineBands: _*))
    val got = sortedRows(VectorStage.lsh(spark, sf0001).select(
      col("vec_id"),
      shiftright(col("bucket"), 0).bitwiseAND(lit(15L)).as("band_0"),
      shiftright(col("bucket"), 4).bitwiseAND(lit(15L)).as("band_1")))
    assert(got == expect)
  }

  test("q_ann_upsert: frozen-quantizer insert covers the whole new batch, cells from the base fit") {
    val rows = SparkEntry.queries("q_ann_upsert")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val isNew = expr(graft.functions.PortableHash.laneSpark(
      "md5(concat(cast(vec_id as string), '#batch'))", 0)) % 100 >= 90
    val emb = Tables.embeddings(spark, sf0001).withColumn("is_new", isNew)
    val nNew = emb.filter(col("is_new")).count()
    assert(rows.map(_.getLong(rows.head.fieldIndex("n_inserted"))).sum == nNew,
      "every new vector must land in exactly one cell")
    // frozen quantizer: every insert cell must be a BASE label (cells
    // are never created by the insert path)
    val baseLabels = emb.filter(!col("is_new"))
      .select("label").distinct().collect().map(_.getInt(0)).toSet
    val cells = rows.map(_.getInt(rows.head.fieldIndex("cell"))).toSet
    assert(cells.subsetOf(baseLabels))
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("avg_d2")) >= 0.0)
      assert(r.getLong(r.fieldIndex("n_buckets")) <=
        r.getLong(r.fieldIndex("n_inserted")))
    }
  }

  test("ANN consumers scan the staged artifacts, not the raw corpus index path") {
    def plan(name: String): String = {
      val df = SparkEntry.queries(name)(spark, sf0001)
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    val ivfPlan = plan("q_ann_ivf")
    assert(ivfPlan.contains("vx_ivf_"), ivfPlan)
    val pqPlan = plan("q_pq_encode")
    assert(pqPlan.contains("vx_pq_codes_"), pqPlan)
    // pure consumer: one scan + one hash-agg, join-free
    assert(!pqPlan.contains("Join"), pqPlan)
    val lshPlan = plan("q_ann_lsh_topk")
    assert(lshPlan.contains("vx_lsh_"), lshPlan)
  }
}
