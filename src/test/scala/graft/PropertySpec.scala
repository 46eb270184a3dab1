package graft

import graft.functions.{PortableHash, VectorFunctions}
import graft.sources.Rest
import graft.util.Exact
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based tests (SURVEY §5): invariants that must hold for ALL
  * inputs, not just the fixtures — dedup idempotence, validation-score
  * bounds, EMA containment, decimal-sum order-independence (the 100 TB
  * correctness argument for partial aggregation), breaker safety.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("EMA recurrence stays within [min, max] of its inputs for any series") {
    val series = Gen.nonEmptyListOf(Gen.chooseNum(-1e6, 1e6))
    check(Prop.forAll(series) { xs =>
      val ema = xs.tail.foldLeft(xs.head)((acc, x) => acc * 0.8 + x * 0.2)
      ema >= xs.min - 1e-6 && ema <= xs.max + 1e-6
    })
  }

  test("portable hash lanes are deterministic and 32-bit-bounded") {
    val strs = Gen.alphaNumStr
    check(Prop.forAll(strs, Gen.choose(0, 3), Gen.choose(0, 3)) { (s, seed, lane) =>
      val a = PortableHash.hash32(s, seed, lane)
      val b = PortableHash.hash32(s, seed, lane)
      a == b && a >= 0L && a < (1L << 32)
    })
  }

  test("hyperplane weights are deterministic and inside [-1, 1]") {
    check(Prop.forAll(Gen.choose(0, 15)) { p =>
      val w = VectorFunctions.hyperplane(p)
      w == VectorFunctions.hyperplane(p) &&
        w.forall(x => x >= -1.0 && x <= 1.0) && w.size == VectorFunctions.Dim
    })
  }

  test("circuit breaker: N>=threshold consecutive failures always opens; success always closes") {
    val ops = Gen.listOf(Gen.oneOf(true, false)) // true = success
    check(Prop.forAll(ops, Gen.choose(1, 5)) { (seq, th) =>
      val br = new Rest.CircuitBreaker(failureThreshold = th,
        recoveryMillis = Long.MaxValue, clock = () => 0L)
      seq.foreach(ok => if (ok) br.onSuccess() else br.onFailure())
      val trailingFailures = seq.reverse.takeWhile(!_).size
      if (seq.nonEmpty && seq.last) br.state == Rest.Closed
      else if (trailingFailures >= th) br.state == Rest.Open
      else true
    })
  }

  test("validation score is always within [0, 1] (random frames, random thresholds)") {
    val rows = Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(-100.0, 100.0), Gen.chooseNum(0.0, 1.0)))
    check(Prop.forAll(rows, Gen.chooseNum(-50.0, 50.0)) { (xs, cut) =>
      val df = xs.toDF("value", "quality")
      val rules = Seq(
        graft.validate.ValidationRule("v_cut", "error", col("value") > cut, "-"),
        graft.validate.ValidationRule("q_low", "warning", col("quality") < 0.5, "-"),
        graft.validate.ValidationRule("never", "critical", lit(false), "-"))
      val s = graft.validate.Validator.score(df, rules)
        .select("overall_score").collect()(0).getDouble(0)
      s >= 0.0 && s <= 1.0
    }, n = 10)
  }

  test("exact dedup is idempotent and order-insensitive") {
    val rows = Gen.listOfN(30, Gen.zip(Gen.choose(0, 5), Gen.choose(0, 3)))
    check(Prop.forAll(rows) { xs =>
      val df = xs.toDF("a", "b")
      val once = df.dropDuplicates("a", "b")
      val twice = once.dropDuplicates("a", "b")
      val shuffled = df.orderBy(rand(42)).dropDuplicates("a", "b")
      once.count() == twice.count() &&
        once.count() == shuffled.count() &&
        once.count() == xs.distinct.size
    }, n = 10)
  }

  test("decimal-exact sum is partition-order independent (partial-agg soundness)") {
    val rows = Gen.nonEmptyListOf(Gen.chooseNum(-1e4, 1e4)
      .map(v => math.rint(v * 100) / 100)) // 2-dp inputs like the testdata
    check(Prop.forAll(rows, Gen.choose(1, 8)) { (xs, parts) =>
      val df = xs.toDF("v")
      val one = df.coalesce(1).agg(Exact.dsum(col("v"))).collect()(0).getDouble(0)
      val many = df.repartition(parts).agg(Exact.dsum(col("v"))).collect()(0).getDouble(0)
      // bit-identical, not approximately equal — this is the invariant
      // that makes map-side partial aggregation safe for the oracle
      java.lang.Double.doubleToLongBits(one) == java.lang.Double.doubleToLongBits(many)
    }, n = 10)
  }
}
