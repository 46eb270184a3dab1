package graft

import org.apache.spark.sql.functions._

/** Scale contract of the cell-blocked vector operators (SemDeDup /
  * semantic decontamination): the cell-count policy keeps within-cell
  * pair volume LINEAR in the corpus, and the large-k broadcast-row
  * assignment path is value-identical to the literal-inline path the
  * oracles replay.
  */
class VectorCellSpec extends SparkSpec {

  test("cellCount: resolves to the oracle's k=10 at test sizes, grows linearly beyond") {
    import queries.Vectors.{cellCount, CellMax, TargetCell}
    // every test SF (embeddings: 500 / 500 / 2000 rows) pins the k the
    // DuckDB oracles hardcode
    for (n <- Seq(500L, 2000L)) assert(cellCount(n) === 10, s"n=$n")
    // linear regime: k tracks the corpus, expected cell ≤ TargetCell,
    // up to the driver-held quantizer's ceiling
    for (n <- Seq(10_000L, 1_000_000L, CellMax.toLong * TargetCell)) {
      val k = cellCount(n)
      assert((n + k - 1) / k <= TargetCell, s"n=$n k=$k expected cell too big")
    }
    assert(cellCount(1_000_000L) === 5000)
    // bounded regime (r18): k never outgrows what the driver can hold
    // and a row can be assigned against map-only — beyond the boundary
    // the expected cell grows and a hierarchical quantizer takes over
    // (the cellCount scaladoc's documented trade)
    for (n <- Seq(10_000_000L, 5_000_000_000L))
      assert(cellCount(n) === CellMax, s"n=$n must cap at CellMax")
  }

  test("semantic-dedup pair volume is bounded by n x TargetCell (the linear invariant)") {
    import queries.Vectors.{cellCount, lloyd, TargetCell}
    val emb = Tables.embeddings(spark, sf0001)
    val n = emb.count()
    val fit = lloyd(emb, k = cellCount(n), iters = 2)
    val sizes = fit.assigned.groupBy("cluster").agg(count(lit(1)).as("c"))
      .collect().map(_.getLong(1))
    assert(sizes.sum === n)
    // the within-cell pair count the SemDeDup equi-join generates
    val pairs = sizes.map(c => c * (c - 1) / 2).sum
    assert(pairs <= n * TargetCell,
      s"pair volume $pairs exceeds n*TargetCell = ${n * TargetCell} " +
        s"(cells: ${sizes.sorted.reverse.mkString(",")})")
  }

  test("broadcast-row cell distances match the literal-inline path bit-for-bit") {
    import queries.Vectors.{lloyd, withCellDistsLit, withCellDistsJoin}
    val emb = Tables.embeddings(spark, sf0001)
    val cents = lloyd(emb, k = 10, iters = 2).cents
    def flat(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), posexplode(col("ds")).as(Seq("i", "e")))
      .select(col("vec_id"), col("i"), col("e.d2"), col("e.id"))
    val lit0 = flat(withCellDistsLit(emb, cents))
    val join0 = flat(withCellDistsJoin(emb, cents))
    assert(lit0.exceptAll(join0).count() === 0)
    assert(join0.exceptAll(lit0).count() === 0)
  }

  test("lloyd dispatches to the broadcast-row path beyond NearestLitMax and stays correct") {
    import queries.Vectors.{lloyd, NearestLitMax}
    val k = NearestLitMax + 1 // forces the join path end-to-end
    val fit = lloyd(Tables.embeddings(spark, sf0001), k = k, iters = 1)
    val rows = fit.assigned.select("vec_id", "cluster", "d2").collect()
    assert(rows.length === Tables.embeddings(spark, sf0001).count())
    rows.foreach { r =>
      assert(r.getInt(1) >= 0 && r.getInt(1) < k, r.toString)
      assert(r.getDouble(2) >= 0.0, r.toString)
    }
    // a seed vector's nearest centroid is itself: d2 exactly 0
    rows.filter(_.getLong(0) < k).foreach { r =>
      assert(r.getInt(1) === r.getLong(0).toInt && r.getDouble(2) === 0.0,
        r.toString)
    }
  }

  test("q_ann_recall: sane audit numbers (3 methods, recall in [0,1], candidates < corpus)") {
    val rows = SparkEntry.queries("q_ann_recall")(spark, sf0001).collect()
    assert(rows.map(_.getAs[String]("method")).sorted.toSeq ===
      Seq("ivf", "ivfpq", "lsh"))
    val n = Tables.embeddings(spark, sf0001).count()
    rows.foreach { r =>
      val rec = r.getAs[Double]("recall_at_10")
      val cands = r.getAs[Double]("avg_candidates")
      assert(rec >= 0.0 && rec <= 1.0, r.toString)
      assert(cands > 0.0 && cands < n, r.toString) // cheaper than brute
    }
    val m = rows.map(r => r.getAs[String]("method") -> r).toMap
    // ivfpq ranks the SAME candidate set by the quantized distance:
    // identical cost, recall can only degrade vs the exact-cosine rank
    assert(m("ivfpq").getAs[Double]("avg_candidates") ===
      m("ivf").getAs[Double]("avg_candidates"))
    assert(m("ivfpq").getAs[Double]("recall_at_10") <=
      m("ivf").getAs[Double]("recall_at_10"))
  }
}
