package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the round-11 additions (the oracle gate
  * proves engine-equality; these prove the STATISTICS mean what they
  * claim).
  */
class Round11Spec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf0001)

  test("q_drift_psi: a uniform random split of one distribution reads stable") {
    val rows = run("q_drift_psi").collect()
    // three audited features, one row each
    assert(rows.map(_.getAs[String]("feature")).sorted.toSeq ===
      Seq("event_type", "hour", "value"))
    rows.foreach { r =>
      // both halves are the same distribution by construction: PSI must
      // sit far below the 0.1 monitoring band
      assert(r.getAs[String]("verdict") === "stable",
        s"${r.getAs[String]("feature")} drifted on a uniform split: $r")
      // PSI sampling noise ~ k/n: at the sf0.001 fixture (hundreds of
      // rows per half) it can reach a few hundredths — the stable band
      // (< 0.1) is the meaningful bound
      assert(r.getAs[Double]("psi") >= 0.0 && r.getAs[Double]("psi") < 0.1)
      assert(r.getAs[Long]("n_ref") > 0 && r.getAs[Long]("n_cur") > 0)
    }
    // every feature audits the same event rows — totals agree
    assert(rows.map(r => r.getAs[Long]("n_ref") + r.getAs[Long]("n_cur"))
      .distinct.length === 1)
    // bin budgets: value caps at 20, hour at 24
    val byFeat = rows.map(r =>
      r.getAs[String]("feature") -> r.getAs[Long]("n_bins")).toMap
    assert(byFeat("value") <= 20 && byFeat("hour") <= 24)
  }

  test("q_drift_psi detects an injected shift (positive control)") {
    // same machinery, hand-driven: ref ~ U(0,1)-ish bins, cur shifted —
    // the PSI formula itself must fire on a real distribution change
    import org.apache.spark.sql.types.DecimalType
    val k = 10
    def psi(cRef: Seq[Long], cCur: Seq[Long]): Double = {
      val nR = cRef.sum.toDouble; val nC = cCur.sum.toDouble
      cRef.zip(cCur).map { case (r, c) =>
        val pr = (r + 0.5) / (nR + 0.5 * k)
        val pc = (c + 0.5) / (nC + 0.5 * k)
        (pc - pr) * math.log(pc / pr)
      }.sum
    }
    val uniform = Seq.fill(k)(100L)
    val shifted = (0 until k).map(i => if (i < k / 2) 20L else 180L)
    assert(psi(uniform, uniform) === 0.0)
    assert(psi(uniform, shifted) > 0.25, "shifted halves must read major")
  }

  test("q_seasonal_decompose: slots partition the hourly grid; strength in range") {
    val rows = run("q_seasonal_decompose").collect()
    val hows = rows.map(_.getAs[Int]("how"))
    assert(hows.distinct.length === hows.length)
    assert(hows.forall(h => h >= 0 && h < 168))
    // slot hour-counts sum to the number of distinct hours in the data
    val nHourly = Tables.events(spark, sf0001)
      .filter(col("ts").isNotNull)
      .select(date_trunc("hour", col("ts"))).distinct().count()
    assert(rows.map(_.getAs[Long]("n_hours")).sum === nHourly)
    // variance-explained statistic: bounded above by 1; one value globally
    val strengths = rows.map(_.getAs[Double]("seasonal_strength")).distinct
    assert(strengths.length === 1)
    assert(strengths.head <= 1.0 && strengths.head >= -1.0)
    rows.foreach(r => assert(r.getAs[Double]("seasonal_mean") > 0.0))
  }

  test("q_acf: correlations bounded, pair counts consistent, Ljung-Box sane") {
    val rows = run("q_acf").collect()
    val types = rows.map(_.getAs[String]("event_type")).distinct
    // 6 lags per type, every lag present
    assert(rows.length === types.length * 6)
    types.foreach { t =>
      val mine = rows.filter(_.getAs[String]("event_type") == t)
      assert(mine.map(_.getAs[Long]("lag_k")).sorted.toSeq === (1L to 6L))
      // n_pairs decreases by exactly 1 per extra lag (dense grid)
      val byLag = mine.map(r =>
        r.getAs[Long]("lag_k") -> r.getAs[Long]("n_pairs")).toMap
      assert((2L to 6L).forall(k => byLag(k) === byLag(k - 1) - 1))
      // one Q statistic per series, non-negative (sum of squares)
      val qs = mine.map(_.getAs[Double]("lb_q")).distinct
      assert(qs.length === 1 && qs.head >= 0.0)
    }
    // Cauchy–Schwarz: every autocorrelation sits in [-1, 1]
    rows.foreach(r => assert(math.abs(r.getAs[Double]("acf")) <= 1.0))
  }

  test("q_forecast_conformal: interval covers held-out hours near target") {
    val r = run("q_forecast_conformal").collect()
    assert(r.length === 1)
    val row = r.head
    val (nTest, nCov) =
      (row.getAs[Long]("n_test"), row.getAs[Long]("n_covered"))
    assert(row.getAs[Long]("n_fit") > 0 && row.getAs[Long]("n_cal") > 0 &&
      nTest > 0)
    assert(row.getAs[Double]("qhat") >= 0.0)
    // coverage is the exact integer ratio it claims to be
    assert(math.abs(row.getAs[Double]("coverage") -
      nCov.toDouble / nTest) < 1e-6)
    // split-conformal targets 0.9 under exchangeability; an hourly
    // series is NOT exchangeable, so assert the loose validity band a
    // drifting-but-stationary-ish series should still clear
    assert(row.getAs[Double]("coverage") >= 0.6 &&
      row.getAs[Double]("coverage") <= 1.0)
  }

  test("q_auc: per-label metrics bounded and internally consistent") {
    val rows = run("q_auc").collect()
    val total = Tables.embeddings(spark, sf0001).count()
    // every label audited, each against the same corpus
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pos") + r.getAs[Long]("n_neg") === total)
      val auc = r.getAs[Double]("auc")
      assert(auc >= 0.0 && auc <= 1.0)
      assert(math.abs(r.getAs[Double]("gini") - (2 * auc - 1)) < 1e-6)
      val ks = r.getAs[Double]("ks")
      assert(ks >= 0.0 && ks <= 1.0)
    }
    assert(rows.map(_.getAs[Long]("n_pos")).sum === total)
    // the own-centroid scorer must beat coin-flip ON AVERAGE (per-label
    // values are noisy at the 50-vector fixture)
    val meanAuc = rows.map(_.getAs[Double]("auc")).sum / rows.length
    assert(meanAuc > 0.5, s"mean one-vs-rest AUC $meanAuc <= 0.5")
  }

  test("q_hybrid_rrf: fusion arithmetic and rank discipline") {
    val rows = run("q_hybrid_rrf").collect()
    val probes = rows.map(_.getAs[Long]("probe")).distinct.sorted.toSeq
    assert(probes === Seq(0L, 17L, 42L))
    probes.foreach { p =>
      val mine = rows.filter(_.getAs[Long]("probe") == p)
        .sortBy(_.getAs[Long]("rrf_rank"))
      // contiguous fused ranking, nobody retrieves themselves
      assert(mine.map(_.getAs[Long]("rrf_rank")).toSeq ===
        (1L to mine.length))
      assert(mine.forall(_.getAs[Long]("doc_id") != p))
      // rrf recomputes from the two ranks exactly (missing side = 0)
      mine.foreach { r =>
        def side(c: String): Double = r.getAs[java.lang.Long](c) match {
          case null => 0.0
          case rk => assert(rk >= 1L && rk <= 20L); 1.0 / (60 + rk)
        }
        assert(math.abs(r.getAs[Double]("rrf") -
          (side("rank_sparse") + side("rank_dense"))) < 1e-6)
      }
      // fused score non-increasing down the ranking
      val fs = mine.map(_.getAs[Double]("rrf"))
      assert(fs.zip(fs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q_mutual_information: information inequalities hold") {
    val rows = run("q_mutual_information").collect()
    assert(rows.map(_.getAs[String]("pair")).sorted.toSeq ===
      Seq("type_dow", "type_hour", "type_vbucket"))
    rows.foreach { r =>
      val (mi, ha, hb) = (r.getAs[Double]("mi"), r.getAs[Double]("h_a"),
        r.getAs[Double]("h_b"))
      // MI >= 0 and MI <= min(H) up to the 9-dp per-cell rounding
      assert(mi >= -1e-5, s"negative MI: $r")
      assert(ha > 0 && hb > 0)
      assert(mi <= math.min(ha, hb) + 1e-5)
      val nmi = r.getAs[Double]("nmi")
      assert(nmi >= -1e-5 && nmi <= 1 + 1e-5)
      assert(r.getAs[Long]("n") > 0)
    }
  }

  test("q_mutual_information positive control: MI(X,X) = H(X)") {
    // the formula must saturate on a perfectly dependent pair
    def miOf(cells: Seq[((Int, Int), Long)]): (Double, Double) = {
      val n = cells.map(_._2).sum.toDouble
      val ra = cells.groupBy(_._1._1).map { case (k, v) => k -> v.map(_._2).sum }
      val cb = cells.groupBy(_._1._2).map { case (k, v) => k -> v.map(_._2).sum }
      val mi = cells.map { case ((a, b), c) =>
        c / n * math.log(c * n / (ra(a).toDouble * cb(b)))
      }.sum
      val h = ra.values.map(r => -(r / n) * math.log(r / n)).sum
      (mi, h)
    }
    val diag = (0 until 4).map(i => ((i, i), 25L))
    val (mi, h) = miOf(diag)
    assert(math.abs(mi - h) < 1e-12 && h > 1.38) // ln 4
    val indep = for (i <- 0 until 4; j <- 0 until 4) yield ((i, j), 25L)
    assert(math.abs(miOf(indep)._1) < 1e-12)
  }

  test("q_calibration: bins partition the corpus; ECE recomputes") {
    val rows = run("q_calibration").collect()
    val total = Tables.embeddings(spark, sf0001).count()
    assert(rows.map(_.getAs[Long]("n_bin")).sum === total)
    val bins = rows.map(_.getAs[Long]("bin"))
    assert(bins.distinct.length === bins.length)
    assert(bins.forall(b => b >= 0 && b <= 9))
    rows.foreach { r =>
      val (nb, np) = (r.getAs[Long]("n_bin"), r.getAs[Long]("n_pos"))
      assert(np >= 0 && np <= nb)
      assert(math.abs(r.getAs[Double]("acc") - np.toDouble / nb) < 1e-6)
      // mean confidence lands inside its own bin's score range
      val conf = r.getAs[Double]("conf")
      val b = r.getAs[Long]("bin")
      assert(conf >= b / 10.0 - 1e-6 &&
        (conf <= (b + 1) / 10.0 + 1e-6 || b == 9))
    }
    // one ECE globally, equal to its definition over the bins
    val eces = rows.map(_.getAs[Double]("ece")).distinct
    assert(eces.length === 1)
    val n = rows.map(_.getAs[Long]("n_bin")).sum.toDouble
    val recomputed = rows.map(r =>
      math.abs(r.getAs[Double]("acc") - r.getAs[Double]("conf")) *
        r.getAs[Long]("n_bin") / n).sum
    assert(math.abs(eces.head - recomputed) < 1e-5)
  }

  test("q_ndcg: bounded metrics, ideal normalization, probe discipline") {
    val rows = run("q_ndcg").collect()
    val nProbes = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") % 25 === 0).count()
    assert(rows.length === nProbes)
    rows.foreach { r =>
      val (dcg, idcg, ndcg) = (r.getAs[Double]("dcg"),
        r.getAs[Double]("idcg"), r.getAs[Double]("ndcg"))
      // DCG can never exceed the ideal; ndcg is their ratio in [0, 1]
      assert(dcg >= 0 && dcg <= idcg + 1e-9)
      assert(ndcg >= 0 && ndcg <= 1 + 1e-6)
      assert(math.abs(ndcg - dcg / idcg) < 1e-5)
      val rel10 = r.getAs[Long]("rel_at_10")
      assert(rel10 >= 0 && rel10 <= math.min(10L, r.getAs[Long]("n_rel")))
      assert(math.abs(r.getAs[Double]("p_at_10") - rel10 / 10.0) < 1e-9)
    }
  }

  test("q_survival: monotone non-increasing curve, risk-set accounting") {
    val rows = run("q_survival").collect().sortBy(_.getAs[Long]("t"))
    assert(rows.nonEmpty)
    // survival starts at <= 1 and never rises
    val s = rows.map(_.getAs[Double]("survival"))
    assert(s.forall(v => v >= 0.0 && v <= 1.0))
    assert(s.zip(s.tail).forall { case (a, b) => b <= a + 1e-9 })
    // the at-risk count shrinks by at least the events+censored at each step
    val triples = rows.map(r => (r.getAs[Long]("n_risk"),
      r.getAs[Long]("n_events"), r.getAs[Long]("n_censored")))
    triples.zip(triples.tail).foreach { case ((n0, d0, c0), (n1, _, _)) =>
      assert(n1 <= n0 - d0 - c0)
    }
    // KM recomputes from the counts (product-limit definition)
    var prod = 1.0
    rows.foreach { r =>
      val (n, d) = (r.getAs[Long]("n_risk"), r.getAs[Long]("n_events"))
      prod *= (n - d).toDouble / n
      assert(math.abs(r.getAs[Double]("survival") - prod) < 1e-4,
        s"KM mismatch at t=${r.getAs[Long]("t")}")
    }
  }

  test("q_stream_drift: one verdict per post-cutoff day, stable on i.i.d. data") {
    // sf0.01, not the sf0.001 fixture: PSI sampling noise ~ k/n, and a
    // ~30-event day legitimately wanders past every verdict band — the
    // homogeneity invariant needs the ~300-event days
    val rows = SparkEntry.queries("q_stream_drift")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.nonEmpty)
    val days = rows.map(_.getAs[java.time.LocalDateTime]("day"))
    assert(days.distinct.length === days.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_ref") > 0 && r.getAs[Long]("n_cur") > 0)
      val psi = r.getAs[Double]("psi")
      assert(psi >= 0.0, s"negative PSI: $r")
      // the synthetic stream is time-homogeneous: at this sample size
      // (~300 events/day over 5 types, noise E[PSI] ≈ k/n ≈ 0.02)
      // every day must read inside the stable band (the formula's
      // positive control lives in the q_drift_psi spec above)
      assert(r.getAs[String]("verdict") === "stable", r.toString)
    }
  }

  test("q_corpus_funnel: stages are monotone and in declared order") {
    val rows = run("q_corpus_funnel").collect().sortBy(_.getAs[Long]("stage"))
    assert(rows.map(_.getAs[String]("stage_name")).toSeq ===
      Seq("raw", "length_gate", "exact_dedup", "decontaminate",
        "budget_sample"))
    // every gate can only shrink the corpus, in docs AND tokens
    val docs = rows.map(_.getAs[Long]("n_docs"))
    val toks = rows.map(_.getAs[Long]("n_tokens"))
    assert(docs.zip(docs.tail).forall { case (a, b) => b <= a }, docs.toSeq)
    assert(toks.zip(toks.tail).forall { case (a, b) => b <= a }, toks.toSeq)
    // raw matches the source table; the held-out bands guarantee a
    // strict drop at the decontamination stage
    assert(docs.head === Tables.documents(spark, sf0001).count())
    assert(docs(3) < docs(2))
    assert(docs.last > 0)
  }

  test("q_pit_features: leaky rows are exactly the pre-flip orders of flipped keys") {
    val rows = run("q_pit_features").collect()
    val total = Tables.orders(spark, sf0001).count()
    assert(rows.length === total) // every order gets exactly one PIT row
    val flip = java.time.LocalDate.parse("1998-01-01")
    rows.foreach { r =>
      val flipped = r.getAs[Long]("o_custkey") % 100 == 0
      val pre = r.getAs[java.sql.Date]("order_date").toLocalDate.isBefore(flip)
      val expectLeaky = flipped && pre
      assert(r.getAs[Long]("leaky") === (if (expectLeaky) 1L else 0L), r.toString)
      // PIT semantics: the pre-flip version for pre-flip orders of
      // flipped keys, UPGRADED after; everyone else sees one version
      if (flipped && !pre)
        assert(r.getAs[String]("pit_segment") === "UPGRADED")
      if (!flipped)
        assert(r.getAs[String]("pit_segment") ===
          r.getAs[String]("current_segment"))
    }
  }
}
