package graft

import graft.tools.ScaleUp
import org.apache.spark.sql.functions._

/** The scaled fixtures feed the scaling-curve measurement
  * (tools/ScaleBench); a broken scale-up would silently bend every
  * exponent, so the properties the curve depends on are pinned here:
  * exact kx row growth, referential integrity across replicas, and
  * content decorrelation that keeps similarity work linear in k.
  */
class ScaleUpSpec extends SparkSpec {

  private lazy val outDir = {
    val d = graft.util.TempRoot.freshDir("graft-scaleup").toString
    ScaleUp.build(spark, sf0001, d, 2)
    d
  }
  private def t(name: String) = Tables.table(spark, outDir, name)
  private def src(name: String) = Tables.table(spark, sf0001, name)

  test("k=1 is the identity: same rows, untouched content") {
    val d1 = graft.util.TempRoot.freshDir("graft-scaleup1").toString
    ScaleUp.build(spark, sf0001, d1, 1)
    assert(Tables.table(spark, d1, "lineitem").count() ===
      src("lineitem").count())
    // text byte-identical per doc_id (replica 0 never mutates)
    val diff = Tables.table(spark, d1, "documents")
      .select(col("doc_id"), col("text").as("t1"))
      .join(src("documents").select(col("doc_id"), col("text").as("t0")),
        "doc_id")
      .filter(col("t1") =!= col("t0")).count()
    assert(diff === 0L)
  }

  test("facts replicate kx, dims copy through, loaders read the layout") {
    assert(t("lineitem").count() === 2 * src("lineitem").count())
    assert(t("orders").count() === 2 * src("orders").count())
    assert(t("documents").count() === 2 * src("documents").count())
    assert(t("embeddings").count() === 2 * src("embeddings").count())
    assert(t("region").count() === src("region").count())
    assert(t("nation").count() === src("nation").count())
    // schema identical to the source layout (loaders are shared)
    assert(t("lineitem").schema === src("lineitem").schema)
    assert(t("events").schema === src("events").schema)
  }

  test("referential integrity holds across replicas") {
    val orphanOrders = t("orders").join(t("customer"),
      col("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(orphanOrders === 0L)
    val orphanLines = t("lineitem").join(t("part"),
      col("l_partkey") === col("p_partkey"), "left_anti").count()
    assert(orphanLines === 0L)
    // keys never collide between replicas: distinct count also doubles
    assert(t("orders").select("o_orderkey").distinct.count() ===
      2 * src("orders").select("o_orderkey").distinct.count())
  }

  test("documents decorrelate across replicas but keep per-replica structure") {
    val docCap = src("documents").agg(max("doc_id")).head.getLong(0) + 1
    val joined = t("documents").filter(col("doc_id") < docCap).alias("a")
      .join(t("documents").filter(col("doc_id") >= docCap).alias("b"),
        col("a.doc_id") === col("b.doc_id") - lit(docCap))
      .select(col("a.text").as("ta"), col("b.text").as("tb"))
    // same length (translate is length-preserving) but different bytes,
    // so replica shingle spaces are disjoint and near-dup pair volume
    // scales linearly in k instead of k^2
    assert(joined.filter(length(col("ta")) =!= length(col("tb"))).count() === 0L)
    // letterless docs (if any) are unchanged by the alphabet rotation
    assert(joined.filter(col("ta").rlike("[A-Za-z]"))
      .filter(col("ta") === col("tb")).count() === 0L)
  }

  test("embedding rotation preserves norms exactly (orthogonal transform)") {
    val vecCap = src("embeddings").agg(max("vec_id")).head.getLong(0) + 1
    val norm = expr(
      "aggregate(embedding, cast(0.0 as double), (s, x) -> s + x * x)")
    val pairs = t("embeddings").filter(col("vec_id") < vecCap)
      .select(col("vec_id"), norm.as("na")).alias("a")
      .join(t("embeddings").filter(col("vec_id") >= vecCap)
        .select((col("vec_id") - lit(vecCap)).as("vec_id"), norm.as("nb"))
        .alias("b"), "vec_id")
    assert(pairs.filter(abs(col("na") - col("nb")) > 1e-6).count() === 0L)
    // but the vectors themselves differ (rotation actually applied)
    val same = t("embeddings").filter(col("vec_id") < vecCap)
      .select(col("vec_id"), col("embedding").as("ea"))
      .join(t("embeddings").filter(col("vec_id") >= vecCap)
        .select((col("vec_id") - lit(vecCap)).as("vec_id"),
          col("embedding").as("eb")), "vec_id")
      .filter(col("ea") === col("eb")).count()
    assert(same === 0L)
  }
}
