package graft

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.functions._

/** graft.plans.ShingleHash — the native one-pass shingle-hash kernel.
  * Contract: the hash SET is a faithful image of the distinct shingle
  * TEXT set from the built-in chain it replaces (`TF.shingles`):
  * same cardinality per doc, and equal texts ⇔ equal hashes across
  * docs (what the jaccard / decontaminate joins rely on).
  */
class ShingleHashSpec extends SparkSpec {
  import spark.implicits._

  test("cardinality matches TF.shingles(array_distinct) on real docs") {
    val rows = Tables.documents(spark, sf0001)
      .select(size(TF.shingles(col("text"), 3)).as("n_text"),
        size(TF.shingleHashes(col("text"), 3)).as("n_hash"),
        size(TF.shingles(col("text"), 8)).as("n_text8"),
        size(TF.shingleHashes(col("text"), 8)).as("n_hash8"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(0) === r.getInt(1))
      assert(r.getInt(2) === r.getInt(3))
    }
  }

  test("cross-doc identity: equal texts <-> equal hashes (pair intersections)") {
    // For every doc pair within a (lang, source) block, the size of the
    // text-shingle intersection must equal the hash-shingle
    // intersection — the exact quantity q_jaccard_pairs aggregates.
    val docs = Tables.documents(spark, sf0001).limit(200)
      .select(col("doc_id"), TF.shingles(col("text"), 3).as("st"),
        TF.shingleHashes(col("text"), 3).as("sh"))
    val a = docs.alias("a"); val b = docs.alias("b")
    val pairs = a.crossJoin(b)
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(
        size(array_intersect(col("a.st"), col("b.st"))).as("ni_text"),
        size(array_intersect(col("a.sh"), col("b.sh"))).as("ni_hash"))
      .filter(col("ni_text") > 0 || col("ni_hash") > 0)
      .collect()
    assert(pairs.nonEmpty) // the synthetic corpus repeats sentences
    pairs.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("edges: empty text, blanks-only, short doc, repeated separators") {
    val df = Seq("", "   ", "one", "one two", "a  b   c", "x x x x")
      .toDF("text")
      .select(col("text"), TF.shingleHashes(col("text"), 3).as("sh"),
        TF.shingles(col("text"), 3).as("st"))
      .collect()
    df.foreach { r =>
      assert(r.getSeq[Long](1).size === r.getSeq[String](2).distinct.size,
        s"text='${r.getString(0)}'")
    }
    // repeated separators: "a  b   c" tokenizes to (a, b, c) → ONE
    // 3-window; "x x x x" has 2 windows but both are "x x x" → 1 distinct
    val bySize = df.map(r => r.getString(0) -> r.getSeq[Long](1).size).toMap
    assert(bySize("a  b   c") === 1)
    assert(bySize("x x x x") === 1)
  }

  test("interpreted eval agrees with codegen") {
    val gen = Tables.documents(spark, sf0001).limit(20)
      .select(col("doc_id"), TF.shingleHashes(col("text"), 5).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = Tables.documents(spark, sf0001).limit(20)
        .select(col("doc_id"), TF.shingleHashes(col("text"), 5).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(gen === interp)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("null text -> null result") {
    val out = spark.sql("SELECT CAST(NULL AS STRING) AS text")
      .select(TF.shingleHashes(col("text"), 3).as("sh")).collect()
    assert(out.head.isNullAt(0))
  }
}
