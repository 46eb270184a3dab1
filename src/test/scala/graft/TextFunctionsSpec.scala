package graft

import graft.functions.{PortableHash, TextFunctions}
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("t").select(c.as("r")).collect()(0).get(0)

  test("tokens drops empty strings from repeated whitespace") {
    assert(one(TextFunctions.tokenCount(col("t")), "a  b   c") === 3)
    assert(one(TextFunctions.tokenCount(col("t")), "") === 0)
  }

  test("fingerprint is whitespace/case insensitive") {
    val a = one(TextFunctions.fingerprint(col("t")), "  Hello   World ")
    val b = one(TextFunctions.fingerprint(col("t")), "hello world")
    assert(a === b)
  }

  test("shingles produce distinct k-grams; short docs fall back to whole doc") {
    val s = one(TextFunctions.shingles(col("t"), 3), "a b c d")
      .asInstanceOf[collection.Seq[String]]
    assert(s.toSet === Set("a b c", "b c d"))
    val short = one(TextFunctions.shingles(col("t"), 3), "a b")
      .asInstanceOf[collection.Seq[String]]
    assert(short.toSet === Set("a b"))
  }

  test("avgTokenLen is null-safe and exact") {
    assert(one(TextFunctions.avgTokenLen(col("t")), "ab cdef") === 3.0)
    assert(one(TextFunctions.avgTokenLen(col("t")), "") === null)
  }

  test("PortableHash SQL lane matches the driver-side reference") {
    for (seed <- Seq(0, 7); lane <- 0 until 4) {
      val sparkVal = spark.sql(
        s"SELECT ${PortableHash.laneSpark(s"md5(concat('doc', '#', '$seed'))", lane)} AS h")
        .collect()(0).getLong(0)
      assert(sparkVal === PortableHash.hash32("doc", seed, lane),
        s"seed=$seed lane=$lane")
    }
  }
}
