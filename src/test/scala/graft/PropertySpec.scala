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

  test("quantile sketch estimate lands within one bin width of the same-rank order statistic") {
    // the distribution-free histogram guarantee: the bin selected for
    // rank ⌈q·n⌉ CONTAINS that order statistic, so the interpolated
    // estimate is within one bin width of it. (Comparing against an
    // interpolating `percentile` instead would be wrong: its rank
    // definition differs by up to one order statistic, and in a sparse
    // tail adjacent order statistics can straddle several bins.)
    val sketch = SparkEntry.queries("q_quantile_sketch")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val byType = spark.read.parquet(s"$sf0001/events.parquet")
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).map { case (t, rs) =>
        t -> rs.map(_.getDouble(1)).sorted
      }
    assert(byType.nonEmpty)
    for ((t, vs) <- byType; q <- Seq(0.5, 0.9, 0.99)) {
      val est  = sketch((t, q))
      val binw = (vs.last - vs.head) / 64
      val k    = math.min(vs.length, math.ceil(q * vs.length).toInt)
      val ord  = vs(k - 1)
      assert(math.abs(est - ord) <= binw + 1e-9,
        s"$t q=$q est=$est orderstat=$ord binw=$binw")
    }
  }

  test("bloom join pruning never drops a true member and stays selective") {
    val r = SparkEntry.queries("q_bloom_join")(spark, sf0001).collect()(0)
    val (nOrders, nExact, nPass, nFalse) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nPass >= nExact, s"false negatives: pass=$nPass < exact=$nExact")
    assert(nFalse == nPass - nExact)
    // 2 lanes over 8192 bits at this dim cardinality: fp among true
    // non-members must be well under 1%
    assert(nFalse.toDouble / (nOrders - nExact) < 0.01,
      s"fp_rate too high: $nFalse/${nOrders - nExact}")
  }

  test("linear-counting sketch merges: union of half-sketches == whole-data sketch") {
    // the mergeability claim behind replacing COUNT(DISTINCT) at scale:
    // occupied-bucket SETS union associatively, so sketching each half
    // and merging gives exactly the whole-corpus sketch (and estimate)
    import graft.functions.PortableHash
    val m = 1024
    val rnd = new scala.util.Random(7)
    val keys = Seq.fill(5000)(rnd.nextInt(2000))
    def occupied(ks: Seq[Int]): Set[Long] =
      ks.map(k => PortableHash.hash32(s"$k", 0, 0) % m).toSet
    val (h1, h2) = keys.splitAt(keys.length / 2)
    assert((occupied(h1) ++ occupied(h2)) === occupied(keys))
  }

  test("winsorized mean always lies inside the clamp bounds") {
    val rows = SparkEntry.queries("q_winsorize")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (lo, hi, m) = (r.getDouble(1), r.getDouble(2), r.getDouble(6))
      assert(m >= lo - 1e-9 && m <= hi + 1e-9, s"mean $m outside [$lo, $hi]")
    }
  }

  test("shingle-hash set is a faithful image of the text shingle set (random docs)") {
    // reference implementation of TF.shingles' semantics, driver-side
    def textShingles(text: String, k: Int): Set[Seq[String]] = {
      val ts = text.split(" ").filter(_.nonEmpty).toSeq
      val ws = if (ts.size >= k) ts.sliding(k).toSeq else Seq(ts)
      ws.toSet
    }
    val word = Gen.oneOf("a", "bb", "ccc", "dd", "e", "fff", "g1", "h")
    val doc = Gen.listOf(Gen.oneOf(word, Gen.const(""))) // "" → double spaces
      .map(_.mkString(" "))
    val docs = Gen.listOfN(20, doc)
    check(Prop.forAll(docs, Gen.choose(1, 5)) { (texts, k) =>
      val rows = texts.toDF("text")
        .select(graft.functions.TextFunctions.shingleHashes(col("text"), k).as("sh"))
        .collect().map(_.getSeq[Long](0))
      // per-doc cardinality matches, and cross-doc: equal hash sets
      // imply equal text shingle sets (pairwise, on a small vocab where
      // collisions in CONTENT are common — hash collisions would break
      // either check)
      val expected = texts.map(t => textShingles(t, k))
      val cardOk = rows.zip(expected).forall { case (h, t) => h.size == t.size }
      val pairOk = (for {
        i <- texts.indices; j <- texts.indices if i < j
      } yield {
        val hInter = rows(i).toSet.intersect(rows(j).toSet).size
        val tInter = expected(i).intersect(expected(j)).size
        hInter == tInter
      }).forall(identity)
      cardOk && pairOk
    }, n = 30)
  }

  test("count-min estimate never underestimates (random token streams)") {
    // the CMS guarantee behind q_heavy_hitters: min-over-lanes of
    // bucket counts >= the true count, for every token
    val W = 64
    val token = Gen.oneOf((1 to 30).map(i => s"t$i"))
    val stream = Gen.nonEmptyListOf(token)
    check(Prop.forAll(stream) { toks =>
      val exact = toks.groupBy(identity).view.mapValues(_.size).toMap
      val cells = Array.fill(2, W)(0L)
      toks.foreach { t =>
        (0 to 1).foreach { l =>
          val md = java.security.MessageDigest.getInstance("MD5")
          val hex = md.digest(s"$t#cms".getBytes("UTF-8"))
            .map(b => f"${b & 0xff}%02x").mkString
          val bucket = (java.lang.Long.parseLong(hex.substring(l * 8, l * 8 + 8), 16) % W).toInt
          cells(l)(bucket) += 1
        }
      }
      exact.forall { case (t, n) =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"$t#cms".getBytes("UTF-8"))
          .map(b => f"${b & 0xff}%02x").mkString
        val est = (0 to 1).map(l =>
          cells(l)((java.lang.Long.parseLong(hex.substring(l * 8, l * 8 + 8), 16) % W).toInt)).min
        est >= n
      }
    }, n = 50)
  }

  test("morton code is a bijection on the 8-bit grid with quadrant structure") {
    import org.apache.spark.sql.functions._
    val grid = spark.range(65536)
      .select((col("id") % 256).as("a"), (col("id") / 256).cast("long").as("b"))
      .select(col("a"), col("b"),
        graft.sources.Sources.mortonCode(col("a"), col("b")).as("z"))
      .cache()
    // bijective onto [0, 65536): file-layout tiles partition the space
    val stats = grid.agg(countDistinct("z"), min("z"), max("z")).head
    assert(stats.getLong(0) === 65536L)
    assert(stats.getLong(1) === 0L && stats.getLong(2) === 65535L)
    // recursive quadrant structure: the top two code bits are exactly
    // the top bits of (a, b) — each code quarter is one 128x128 block
    val bad = grid.filter(
      (col("z") / 16384).cast("long") =!=
        shiftleft((col("b") / 128).cast("long"), 1) + (col("a") / 128).cast("long"))
    assert(bad.count() === 0)
    grid.unpersist()
  }

  test("TopKPerKey partial + finish window == plain window top-k (random data)") {
    import org.apache.spark.sql.expressions.Window
    val gen = for {
      n <- Gen.chooseNum(1, 400)
      rows <- Gen.listOfN(n, for {
        key <- Gen.chooseNum(0L, 7L)
        score <- Gen.oneOf(Gen.chooseNum(-100, 100).map(_ / 10.0), Gen.const(1.5))
        id <- Gen.chooseNum(0L, 1000L)
      } yield (key, score, id))
    } yield rows
    check(Prop.forAll(gen) { rows =>
      val df = rows.toDF("k", "score", "id").repartition(7) // force multi-partition heaps
      val w = Window.partitionBy("k").orderBy(desc("score"), asc("id"))
      def finish(d: org.apache.spark.sql.DataFrame) =
        d.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
          .drop("rn").collect().map(_.toString).sorted.toSeq
      val plain = finish(df)
      val reduced = finish(graft.operators.TopKPerKey.partial(df, "k", "score", "id", 3))
      plain == reduced
    }, n = 30)
  }

  test("Morton interleave is a bijection on the 16x16 grid with 2x2-tile bins") {
    // the q_zorder_layout kernel: 4-bit interleave must be injective
    // (distinct cells -> distinct z) and its z>>2 bins must bound both
    // dims to a 2-cell range — the zone-map guarantee the audit measures
    val cells = for (a <- 0 until 16; b <- 0 until 16) yield (a, b)
    def z(a: Int, b: Int) = (0 until 4).map(i =>
      (((a >> i) & 1) << (2 * i + 1)) | (((b >> i) & 1) << (2 * i))).reduce(_ | _)
    val zs = cells.map { case (a, b) => z(a, b) }
    assert(zs.distinct.size == 256 && zs.min == 0 && zs.max == 255)
    cells.groupBy { case (a, b) => z(a, b) >> 2 }.foreach { case (bin, cs) =>
      assert(cs.map(_._1).max - cs.map(_._1).min <= 1, s"bin $bin pk span")
      assert(cs.map(_._2).max - cs.map(_._2).min <= 1, s"bin $bin sk span")
    }
  }

  test("ACF integer formula: periodic signals peak at their period, noise reads flat") {
    // the q_acf kernel as pure integer arithmetic (same closed form)
    def acf(xs: Seq[Long], k: Int): Double = {
      val n = xs.length.toLong; val s = xs.sum
      val sxy = xs.dropRight(k).zip(xs.drop(k)).map { case (a, b) => a * b }.sum
      val head = xs.dropRight(k).sum; val tail = xs.drop(k).sum
      val sxx = xs.map(x => x * x).sum
      (n * n * sxy - n * s * (head + tail) + (n - k) * s * s).toDouble /
        (n * n * sxx - n * s * s)
    }
    val alternating = Seq.tabulate(200)(i => (i % 2).toLong * 10)
    assert(acf(alternating, 1) < -0.95 && acf(alternating, 2) > 0.95)
    val period3 = Seq.tabulate(300)(i => Seq(1L, 5L, 9L)(i % 3))
    assert(acf(period3, 3) > 0.95 && acf(period3, 1) < 0)
    // hash-noise: every small lag stays near zero
    val noise = Seq.tabulate(500)(i =>
      (graft.functions.PortableHash.hash32(s"acf-$i", 0, 0) % 100).toLong)
    (1 to 6).foreach(k => assert(math.abs(acf(noise, k)) < 0.15, s"lag $k"))
  }

  test("tie-corrected AUC: separation=1, anti-separation=0, all-ties exactly 0.5") {
    // the q_auc rank-sum kernel as pure integer arithmetic
    def auc(scored: Seq[(Double, Int)]): Double = {
      val sorted = scored.sortBy(_._1)
      val n = sorted.length
      // rank_min per tie group + group size, as the window pair computes
      val byScore = sorted.zipWithIndex.groupBy(_._1._1)
      val s2 = byScore.values.flatMap { grp =>
        val rmin = grp.map(_._2).min + 1L; val cnt = grp.length.toLong
        grp.collect { case ((_, 1), _) => 2 * rmin + cnt - 1 }
      }.sum
      val nPos = scored.count(_._2 == 1).toLong
      val nNeg = n - nPos
      (s2 - nPos * (nPos + 1)).toDouble / (2 * nPos * nNeg)
    }
    val sep = (1 to 50).map(i => (i / 100.0, 0)) ++
      (1 to 50).map(i => (1 + i / 100.0, 1))
    assert(auc(sep) == 1.0 && auc(sep.map { case (s, y) => (-s, y) }) == 0.0)
    val ties = (1 to 40).map(_ => (0.7, 0)) ++ (1 to 25).map(_ => (0.7, 1))
    assert(auc(ties) == 0.5) // exact, not approximate — the tie correction
    val noisy = (0 until 400).map { i =>
      val y = (graft.functions.PortableHash.hash32(s"y-$i", 0, 0) % 2).toInt
      val sc = (graft.functions.PortableHash.hash32(s"s-$i", 0, 0) % 1000) / 1000.0
      (sc, y)
    }
    assert(math.abs(auc(noisy) - 0.5) < 0.1) // independent score ≈ coin flip
  }
}
