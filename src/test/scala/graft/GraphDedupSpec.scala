package graft

import org.apache.spark.sql.functions._

/** Behavioral invariants for the round-5 additions: dedup survivorship,
  * BPE merge induction, and PageRank power iteration. Oracle equality is
  * the driver's DuckDB gate; these tests pin the algebraic properties
  * that must hold at ANY scale.
  */
class GraphDedupSpec extends SparkSpec {

  test("q_dedup_survivors: one survivor per component, all docs covered") {
    val out = SparkEntry.queries("q_dedup_survivors")(spark, sf0001).cache()
    val nDocs = Tables.documents(spark, sf0001).count()
    assert(out.count() === nDocs) // every doc gets a verdict
    // exactly one survivor per component, and it is the component id
    val perComp = out.groupBy("component_id")
      .agg(sum("is_survivor").as("n_surv"), count(lit(1)).as("n"),
        max("cluster_size").as("sz"))
    assert(perComp.filter(col("n_surv") =!= 1).count() === 0)
    // the recorded cluster_size matches the actual member count
    assert(perComp.filter(col("n") =!= col("sz")).count() === 0)
    // survivors are their own canonical
    assert(out.filter(col("is_survivor") === 1 &&
      col("doc_id") =!= col("component_id")).count() === 0)
    out.unpersist()
  }

  test("q_bpe_merges: 10 candidates per round, merge-1 dominates round 2") {
    val out = SparkEntry.queries("q_bpe_merges")(spark, sf0001).cache()
    assert(out.filter(col("merge_round") === 1).count() === 10)
    assert(out.filter(col("merge_round") === 2).count() === 10)
    // merging can only remove or relabel pair occurrences, never add:
    // round-2's best count is bounded by round-1's best count
    val m1 = out.filter(col("merge_round") === 1)
      .agg(max("merge_count")).head.getLong(0)
    val m2 = out.filter(col("merge_round") === 2)
      .agg(max("merge_count")).head.getLong(0)
    assert(m2 <= m1, s"round-2 max $m2 exceeds round-1 max $m1")
    // every reported pair is two symbols: two chars, or one char plus
    // the rendered "[pair]" merge symbol
    val pairOk = out.filter(
      length(col("pair")) === 2 || col("pair").rlike("^(\\[..\\].|.\\[..\\]|\\[..\\]\\[..\\])$"))
    assert(pairOk.count() === 20, out.collect().mkString("\n"))
    out.unpersist()
  }

  test("q_cooccur_similarity: symmetric-canonical pairs, jaccard bounds") {
    val rows = SparkEntry.queries("q_cooccur_similarity")(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (common, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val j = r.getDouble(5)
      assert(a < b, s"pair not canonical: $a,$b")
      assert(common <= math.min(na, nb), r.toString) // |∩| ≤ min set size
      assert(j > 0.0 && j <= 1.0, r.toString)
    }
  }

  test("capDegree: hot key bounded at K, cold keys untouched, deterministic") {
    import spark.implicits._
    // one hot customer with 500 items, two cold ones with 3 and 1
    val hot = (1 to 500).map(i => (1L, i.toLong))
    val cold = Seq((2L, 7L), (2L, 8L), (2L, 9L), (3L, 42L))
    val e = (hot ++ cold).toDF("ck", "sk")
    val k = 16
    val capped = queries.Graph.capDegree(e, "ck", "sk", k).cache()
    val perKey = capped.groupBy("ck").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perKey(1L) === k.toLong, perKey)        // hot key capped
    assert(perKey(2L) === 3L && perKey(3L) === 1L) // cold keys intact
    // pair volume after the cap is Σ C(min(deg,K),2) — the self-join
    // on the capped set can never exceed it, no matter the input skew
    val pairs = capped.alias("a")
      .join(capped.alias("b"),
        col("a.ck") === col("b.ck") && col("a.sk") < col("b.sk"))
      .count()
    val bound = Seq(k, 3, 1).map(d => d.toLong * (d - 1) / 2).sum
    assert(pairs === bound, s"pair volume $pairs != Σ C(min(deg,K),2) $bound")
    // deterministic: a second run keeps the identical survivor set
    val again = queries.Graph.capDegree(e, "ck", "sk", k)
    assert(capped.exceptAll(again).count() === 0)
    assert(again.exceptAll(capped).count() === 0)
    capped.unpersist()
  }

  test("PageRank operator: uniform on regular graphs, mass conserved") {
    import spark.implicits._
    // K3 (symmetric triangle): regular graph → PageRank is exactly
    // uniform at every iteration
    val k3 = Seq((0L, 1L), (1L, 0L), (0L, 2L), (2L, 0L), (1L, 2L), (2L, 1L))
      .toDF("src", "dst")
    val r = graft.operators.PageRank.ranks(k3, iters = 3).collect()
    assert(r.length === 3)
    r.foreach(row => assert(math.abs(row.getDouble(1) - 1.0 / 3) < 1e-9, row))
    // in-degree-0 node: 3 links to 2 but nobody links to 3 — it must
    // keep the bare teleport rank, not vanish (and not leak its mass)
    val spur = Seq((1L, 2L), (2L, 1L), (3L, 2L)).toDF("src", "dst")
    val rs = graft.operators.PageRank.ranks(spur, iters = 2).collect()
    assert(rs.length === 3, rs.mkString(","))
    val m = rs.map(row => row.getLong(0) -> row.getDouble(1)).toMap
    assert(math.abs(m(3L) - 0.05) < 1e-9, m) // teleport-only: 0.15/3
    assert(math.abs(rs.map(_.getDouble(1)).sum - 1.0) < 1e-9, m)
    // the real graph: no dangling nodes (symmetrized), so total rank
    // mass stays 1 up to the per-round 12-dp rounding
    val e0 = Tables.orders(spark, sf0001).select("o_orderkey", "o_custkey")
      .join(Tables.lineitem(spark, sf0001).select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
    val edges = e0.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(e0.select(col("b").as("src"), col("a").as("dst")))
    val mass = graft.operators.PageRank.ranks(edges, iters = 2)
      .agg(sum("r")).head.getDouble(0)
    assert(math.abs(mass - 1.0) < 1e-6, s"rank mass $mass leaked")
  }

  test("q_pagerank: scores in (0,1], monotone list, stable top node") {
    val rows = SparkEntry.queries("q_pagerank")(spark, sf0001).collect()
    assert(rows.length === 20)
    val scores = rows.map(_.getDouble(1))
    assert(scores.forall(s => s > 0.0 && s <= 1.0))
    assert(scores.sliding(2).forall(p => p(0) >= p(1)), "not sorted desc")
    // symmetrized bipartite graph: the high-degree side (suppliers are
    // ~100x fewer than customers in TPC-H) accumulates authority — the
    // top node must be a supplier
    assert(rows.head.getString(0).startsWith("s"), rows.head.toString)
  }

  test("q_hits: 10 per role, L1-normalized positive scores, sorted desc") {
    val rows = SparkEntry.queries("q_hits")(spark, sf0001).collect()
    val byRole = rows.groupBy(_.getString(0))
    assert(byRole.keySet === Set("authority", "hub"))
    byRole.foreach { case (role, rs) =>
      assert(rs.length === 10, s"$role: ${rs.length}")
      val scores = rs.map(_.getDouble(2))
      assert(scores.forall(x => x > 0.0 && x <= 1.0), role)
      // top-10 of an L1-normalized distribution can't exceed the mass
      assert(scores.sum <= 1.0 + 1e-9, s"$role mass ${scores.sum}")
      assert(scores.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
        s"$role not sorted")
      val prefix = if (role == "authority") "s" else "c"
      assert(rs.forall(_.getString(1).startsWith(prefix)), role)
    }
  }

  test("q_source_overlap: canonical pairs, intersection and jaccard bounds") {
    val rows = SparkEntry.queries("q_source_overlap")(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (common, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val j = r.getDouble(5)
      assert(a < b, s"pair not canonical: $a,$b")
      assert(common >= 1 && common <= math.min(na, nb), r.toString)
      assert(j > 0.0 && j <= 1.0, r.toString)
      assert(math.abs(j - common.toDouble / (na + nb - common)) < 1e-6, r.toString)
    }
  }

  test("q_triangles: census bounds and exact clustering coefficients") {
    val rows = SparkEntry.queries("q_triangles")(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val (tri, deg, cc) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      // a node in t triangles needs >= 2 neighbors, and at most
      // C(deg, 2) of its neighbor pairs can close
      assert(deg >= 2, r.toString)
      assert(tri >= 1 && tri <= deg * (deg - 1) / 2, r.toString)
      assert(cc > 0.0 && cc <= 1.0, r.toString)
      assert(math.abs(cc - 2.0 * tri / (deg * (deg - 1))) < 1e-6, r.toString)
      assert(r.getString(0).startsWith("s"), r.toString)
    }
    // deterministic: a rebuild yields the identical census
    val again = SparkEntry.queries("q_triangles")(spark, sf0001).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("q_split_leakage: conserves the pair count, canonical split order") {
    val rows = SparkEntry.queries("q_split_leakage")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val nPairs = graft.warehouse.DedupStage.pairs(spark, sf0001).count()
    assert(rows.map(_.getLong(rows.head.fieldIndex("n_pairs"))).sum == nPairs,
      "every candidate pair must land in exactly one split combination")
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a <= b, s"split combo not canonical: ($a, $b)")
      val (np, nd) = (r.getLong(r.fieldIndex("n_pairs")),
        r.getLong(r.fieldIndex("n_docs")))
      assert(nd >= 2 && nd <= 2 * np,
        s"distinct docs $nd out of bounds for $np pairs")
    }
  }
}
