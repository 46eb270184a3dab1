package graft

import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.functions._

/** graft.plans.VecDot — the native codegen'd dot-product expression.
  * Contract: bit-identical to the left-to-right
  * `aggregate(zip_with(...))` fold it replaced (same IEEE-754 op
  * order), null on length mismatch / null array / null element.
  */
class VecDotSpec extends SparkSpec {
  import spark.implicits._

  private def foldDot(a: String, b: String) =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)), " +
      s"cast(0.0 as double), (acc, v) -> acc + v)")

  test("bit-identical to the HOF fold on real embeddings") {
    val e = Tables.embeddings(spark, sf0001).limit(50)
    val q = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val both = e.crossJoin(broadcast(q))
      .select(VF.dotSpark("embedding", "qv").as("native"),
        foldDot("embedding", "qv").as("fold"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("hand-computed values, float and double element types") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    assert(df.select(VF.dotSpark("a", "b")).collect()(0).getDouble(0) === 32.0)
    // float × double (the hyperplane case)
    val mixed = df.select(
      graft.functions.VectorFunctions.dotSpark("a", "cast(array(0.5, 0.5, 0.5) as array<double>)"))
    assert(mixed.collect()(0).getDouble(0) === 3.0)
  }

  test("null semantics: null array, length mismatch, null element") {
    val rows = spark.sql("""
      SELECT a, b FROM (
        SELECT CASE WHEN id = 0 THEN NULL
                    WHEN id = 1 THEN array(1.0F, 2.0F)
                    WHEN id = 2 THEN array(1.0F, 2.0F, 3.0F)
                    ELSE array(1.0F, CAST(NULL AS FLOAT), 3.0F) END AS a,
               array(1.0F, 1.0F, 1.0F) AS b
        FROM range(4))""")
    val out = rows.select(VF.dotSpark("a", "b").as("d")).collect()
    assert(out(0).isNullAt(0)) // null array
    assert(out(1).isNullAt(0)) // length mismatch
    assert(out(2).getDouble(0) === 6.0)
    assert(out(3).isNullAt(0)) // null element
  }

  test("interpreted eval agrees with codegen") {
    val df = Tables.embeddings(spark, sf0001).limit(10)
      .select(col("vec_id"), VF.dotSpark("embedding", "embedding").as("d"))
    // codegen path (normal execution)
    val gen = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // interpreted path
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = Tables.embeddings(spark, sf0001).limit(10)
        .select(col("vec_id"), VF.dotSpark("embedding", "embedding").as("d"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(gen === interp)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("vec_d2: bit-identical to the HOF fold; nearestLit ties break on id") {
    // same contract as vec_dot: identical IEEE-754 chain as the
    // aggregate(zip_with) fold the k-means/PQ assigns used before
    val foldD2 = expr(
      "aggregate(zip_with(embedding, qv, (x, c) -> (cast(x as double) - c) * (cast(x as double) - c)), " +
        "cast(0.0 as double), (acc, v) -> acc + v)")
    val e = Tables.embeddings(spark, sf0001).limit(50)
    val q = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") === 0)
      .select(transform(col("embedding"), x => x.cast("double")).as("qv"))
    val qlit = q.collect().head.getSeq[Double](0)
    val both = e.crossJoin(broadcast(q))
      .select(VF.d2ToLit(col("embedding"), qlit).as("native"),
        foldD2.as("fold"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    // argmin tie-break: two centroids at the same distance → lower id
    val tied = Seq(Tuple1(Array(0.0f, 0.0f))).toDF("v")
      .select(VF.nearestLit(col("v"),
        Seq((lit(7), Seq(1.0, 0.0)), (lit(3), Seq(0.0, 1.0)))).as("best"))
      .select(col("best.id"), col("best.d2")).collect().head
    assert(tied.getInt(0) === 3 && tied.getDouble(1) === 1.0)
  }

  test("GraftExtensions exposes vec_dot to spark.sql") {
    graft.plans.GraftExtensions.register(spark)
    val d = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect().head.getDouble(0)
    assert(d === 11.0)
    val d2 = spark.sql(
      "SELECT vec_d2(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect().head.getDouble(0)
    assert(d2 === 8.0)
    // shingle_hash: must match the Column-API path exactly, and reject
    // a non-literal k (it shapes codegen)
    val viaSql = spark.sql(
      "SELECT shingle_hash('a b c d', 3) AS h").collect().head.getSeq[Long](0)
    val viaCol = Seq(Tuple1("a b c d")).toDF("t")
      .select(org.apache.spark.sql.GraftSql.column(
        graft.plans.ShingleHash(
          org.apache.spark.sql.GraftSql.expression(col("t")), 3)).as("h"))
      .collect().head.getSeq[Long](0)
    assert(viaSql === viaCol && viaSql.length === 2)
    intercept[Exception] {
      spark.sql("SELECT shingle_hash('a b c', cast(rand() * 3 as int))").collect()
    }
    // the extensions class itself must accept an injection pass (the
    // spark.sql.extensions=graft.plans.GraftExtensions cluster path)
    new graft.plans.GraftExtensions()(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
