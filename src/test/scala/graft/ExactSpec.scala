package graft

import graft.util.Exact
import org.apache.spark.sql.functions._

/** Exact (order-independent) aggregation — the property that makes the
  * whole oracle gate deterministic, and partial aggregation safe at
  * 100 TB (decimal sums are associative+commutative). Property-style
  * tests over seeded random inputs (≤2 decimal digits, like the
  * testdata's value columns).
  */
class ExactSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private def sample(n: Int): List[Double] =
    List.fill(n)((rnd.nextLong() % 100000L) / 100.0)

  test("dsum equals BigDecimal sum regardless of row order / partitioning") {
    for (_ <- 1 to 5) {
      val xs = sample(40)
      val expected = xs.map(BigDecimal(_)).sum.toDouble
      for (order <- Seq(xs, xs.reverse, rnd.shuffle(xs))) {
        val got = order.toDF("v").repartition(4)
          .agg(Exact.dsum(col("v"))).collect()(0).getDouble(0)
        assert(got === expected)
      }
    }
  }

  test("dstddev is non-negative and matches two-pass stddev closely") {
    for (_ <- 1 to 5) {
      val xs = sample(40)
      val got = xs.toDF("v").agg(Exact.dstddev(col("v")))
        .collect()(0).getDouble(0)
      val m = xs.sum / xs.size
      val twoPass = math.sqrt(xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1))
      assert(got >= 0.0)
      assert(math.abs(got - twoPass) <= 1e-9 * (1 + twoPass))
    }
  }

  test("dcorr of a perfectly linear relation is 1") {
    val df = (1 to 50).map(i => (i.toDouble, 2.0 * i + 3.0)).toDF("x", "y")
    val r = df.agg(Exact.dcorr(col("x"), col("y"))).collect()(0).getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }
}
