package graft

import graft.operators.Salt
import graft.util.Exact
import org.apache.spark.sql.functions._

/** Salted skew tooling: results must be bit-identical to the unsalted
  * plans on heavily skewed data, for any bucket count.
  */
class SaltSpec extends SparkSpec {
  import spark.implicits._

  // 10k rows, 90% on one hot key, 2-dp values like the testdata
  private def skewed = spark.range(10000)
    .select(
      when(col("id") % 10 < 9, "hot").otherwise(concat(lit("k"), col("id") % 7))
        .as("k"),
      (round(col("id") % 997 * 0.37, 2)).as("v"))

  test("saltedAgg == plain groupBy (count and exact sum) on skewed keys") {
    for (buckets <- Seq(1, 4, 16)) {
      val salted = Salt.saltedAgg(skewed, Seq("k"), "v", buckets)
        .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
      val plain = skewed.groupBy("k")
        .agg(count(lit(1)).as("n"), Exact.dsum(col("v")).as("sum_value"))
        .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
      assert(salted.keySet === plain.keySet)
      plain.foreach { case (k, (n, s)) =>
        assert(salted(k)._1 === n, s"count for $k, buckets=$buckets")
        assert(java.lang.Double.doubleToLongBits(salted(k)._2) ===
          java.lang.Double.doubleToLongBits(s), s"sum for $k, buckets=$buckets")
      }
    }
  }

  test("saltedJoin == plain join on a hot-keyed large side") {
    val small = Seq(("hot", 1.5), ("k0", 2.0), ("k3", 3.0)).toDF("k", "w")
    val plain = skewed.join(small, Seq("k"))
      .agg(count(lit(1)), Exact.dsum(col("v") * col("w"))).collect()(0)
    val salted = Salt.saltedJoin(skewed, small, Seq("k"), 8)
      .agg(count(lit(1)), Exact.dsum(col("v") * col("w"))).collect()(0)
    assert(salted.getLong(0) === plain.getLong(0))
    assert(java.lang.Double.doubleToLongBits(salted.getDouble(1)) ===
      java.lang.Double.doubleToLongBits(plain.getDouble(1)))
  }

  test("salt actually spreads the hot key across buckets") {
    val salted = skewed
      .withColumn("_salt", pmod(xxhash64(monotonically_increasing_id()), lit(8L)))
      .filter(col("k") === "hot")
      .groupBy("_salt").count().collect()
    assert(salted.length === 8) // all 8 buckets hit
    val counts = salted.map(_.getLong(1))
    assert(counts.max < counts.sum) // no bucket holds everything
  }
}
