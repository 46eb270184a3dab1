package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Similarity-search operators over the `embeddings` table
  * (vec_id, embedding array<float> dim-64, label).
  *
  * Brute-force cosine top-k is the correctness baseline; LSH bucketing
  * is the scale path (bucket key = 8 random-hyperplane sign bits →
  * candidates collide in buckets, turning O(n²) scoring into a
  * per-bucket join, exactly like the MinHash band trick).
  */
object Vectors {

  /** Brute-force cosine top-10 neighbors of vec_id=0. The query vector
    * is a 1-row broadcast cross join — at 100 TB this is a map-only
    * scan + TakeOrderedAndProject, no shuffle of the corpus.
    */
  val knnBrute = QueryDef(
    "q_knn_brute",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"), col("label"),
          round(VF.cosineSpark("embedding", "qv"), 6).as("cosine"))
        .orderBy(desc("cosine"), asc("vec_id"))
        .limit(10)
    },
    Some(s"""SELECT vec_id, label,
             ROUND(${VF.cosineDuck("embedding", "qv")}, 6) AS cosine
             FROM embeddings
             CROSS JOIN (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
             WHERE vec_id <> 0
             ORDER BY cosine DESC, vec_id ASC LIMIT 10""")
  )

  /** Per-label centroids, dimension-wise (posexplode → exact decimal
    * mean). The "IVF coarse quantizer" building block.
    */
  val centroids = QueryDef(
    "q_embed_centroids",
    (s, d) =>
      Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("label", "pos")
        .agg(
          // scale 20: a decimal rounding tie would need the float's exact
          // binary expansion to hit ...5000 at digit 21 — never in practice,
          // so both engines round identically (scale 12 was 1 ulp off once).
          // the DECIMAL(38,20)->double conversion itself differs across
          // engines by ~1 ulp (DuckDB divides hugeint by 1e20 in double);
          // round(8) absorbs it while the decimal sum keeps the result
          // independent of partition/merge order.
          round(sum(col("v").cast("double").cast(DecimalType(28, 20))).cast("double") /
            count(lit(1)), 8).as("centroid"),
          count(lit(1)).as("n")),
    Some("""SELECT label, g.i AS pos,
            ROUND(CAST(SUM(CAST(CAST(embedding[g.i + 1] AS DOUBLE) AS DECIMAL(28,20))) AS DOUBLE)
              / COUNT(*), 8) AS centroid,
            COUNT(*) AS n
            FROM embeddings, generate_series(0, 63) AS g(i)
            GROUP BY label, g.i""")
  )

  /** Embedding-cosine near-duplicate pairs, blocked by label (the
    * embedding analog of q_jaccard_pairs). Threshold 0.35 — the synthetic embeddings are near-orthogonal (max within-label cosine ~0.47), so this sits at ~p99.9 of the pair distribution.
    */
  val nearDupPairs = QueryDef(
    "q_embed_neardup",
    (s, d) => {
      // norms precomputed per vector (narrow, once) — each joined pair
      // then costs ONE dot product instead of three; IEEE-identical to
      // the oracle's inline sqrt(dot(a,a)) since it's the same op order.
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"), col("embedding"),
          VF.normSpark("embedding").as("nrm"))
      val a = e.alias("a")
      val b = e.alias("b")
      a.join(b, col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          col("a.label").as("label"),
          round(VF.dotSpark("a.embedding", "b.embedding") /
            (col("a.nrm") * col("b.nrm")), 6).as("cosine"))
        .filter(col("cosine") >= 0.35)
    },
    Some(s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
             ROUND(${VF.cosineDuck("a.embedding", "b.embedding")}, 6) AS cosine
             FROM embeddings a JOIN embeddings b
               ON a.label = b.label AND a.vec_id < b.vec_id
             WHERE ROUND(${VF.cosineDuck("a.embedding", "b.embedding")}, 6) >= 0.35""")
  )

  /** LSH bucketing: 8 deterministic random-hyperplane sign bits per
    * vector → bucket id. The ANN scale path: at query time only the
    * query's bucket (plus neighbors) is scored.
    */
  val annLshBuckets = QueryDef(
    "q_ann_lsh_buckets",
    (s, d) => {
      val sig = (0 until 8).map(p =>
        when(VF.planeDotSpark("embedding", p) > 0.0, lit(1L << p)).otherwise(0L))
        .reduce(_ + _)
      Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"), sig.as("bucket"))
    },
    Some {
      val sig = (0 until 8).map(p =>
        s"CASE WHEN ${VF.planeDotDuck("embedding", p)} > 0.0 THEN ${1L << p} ELSE 0 END")
        .mkString(" + ")
      s"SELECT vec_id, label, CAST($sig AS BIGINT) AS bucket FROM embeddings"
    }
  )

  /** ANN via LSH: top-3 neighbors per query restricted to the query's
    * bucket — candidate generation (equi-join on bucket) + per-bucket
    * brute scoring + windowed top-k. This is the full ANN pipeline in
    * one declarative plan.
    */
  val annLshTopk = QueryDef(
    "q_ann_lsh_topk",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val sig = (0 until 8).map(p =>
        when(VF.planeDotSpark("embedding", p) > 0.0, lit(1L << p)).otherwise(0L))
        .reduce(_ + _)
      val bucketed = Tables.embeddings(s, d)
        .filter(col("vec_id") < 50)
        .select(col("vec_id"), col("embedding"), sig.as("bucket"))
      val a = bucketed.alias("a")
      val b = bucketed.alias("b")
      val w = Window.partitionBy("qid").orderBy(desc("cosine"), asc("nid"))
      a.join(b, col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("qid"), col("b.vec_id").as("nid"),
          round(VF.cosineSpark("a.embedding", "b.embedding"), 6).as("cosine"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
    },
    Some {
      val sig = (0 until 8).map(p =>
        s"CASE WHEN ${VF.planeDotDuck("embedding", p)} > 0.0 THEN ${1L << p} ELSE 0 END")
        .mkString(" + ")
      s"""WITH bkt AS (SELECT vec_id, embedding, CAST($sig AS BIGINT) AS bucket
                       FROM embeddings WHERE vec_id < 50)
          SELECT a.vec_id AS qid, b.vec_id AS nid,
                 ROUND(${VF.cosineDuck("a.embedding", "b.embedding")}, 6) AS cosine,
                 ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                    ORDER BY ROUND(${VF.cosineDuck("a.embedding", "b.embedding")}, 6) DESC,
                                             b.vec_id ASC) AS rn
          FROM bkt a JOIN bkt b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
          QUALIFY rn <= 3"""
    }
  )

  /** IVF-style ANN (the second scale path next to LSH): coarse
    * quantizer = per-label centroids (exact decimal means, rounded to
    * 8 dp so both engines hold identical cell centers), every vector
    * assigned to its nearest centroid by L2², queries probe ONLY their
    * own cell and brute-score it. At 100 TB: centroids are a broadcast
    * (k × dim doubles), assignment is a map-only stage, and the probe
    * join shuffles each query to one cell instead of the whole corpus.
    */
  val annIvf = QueryDef(
    "q_ann_ivf",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.embeddings(s, d)
      val cent = emb
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("label", "pos")
        .agg(round(sum(col("v").cast("double").cast(DecimalType(28, 20)))
          .cast("double") / count(lit(1)), 8).as("c"))
        .groupBy(col("label").as("cell"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("c")))),
          e => e.getField("c")).as("cvec"))
      val dist2 = expr("""aggregate(
          zip_with(embedding, cvec, (x, c) -> (cast(x as double) - c) * (cast(x as double) - c)),
          cast(0.0 as double), (acc, t) -> acc + t)""")
      val wAssign = Window.partitionBy("vec_id").orderBy(col("d2"), col("cell"))
      val assigned = emb.crossJoin(broadcast(cent))
        .select(col("vec_id"), col("embedding"), col("cell"), dist2.as("d2"))
        .withColumn("rn", row_number().over(wAssign))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("embedding"), col("cell"))
      val a = assigned.filter(col("vec_id") < 20).alias("a")
      val b = assigned.alias("b")
      val wTop = Window.partitionBy("qid").orderBy(desc("cosine"), asc("nid"))
      a.join(b, col("a.cell") === col("b.cell") && col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("qid"), col("b.vec_id").as("nid"),
          col("a.cell").as("cell"),
          round(VF.cosineSpark("a.embedding", "b.embedding"), 6).as("cosine"))
        .withColumn("rn", row_number().over(wTop))
        .filter(col("rn") <= 3)
    },
    Some {
      val d2terms = (0 until VF.Dim).map(i =>
        s"(CAST(e.embedding[${i + 1}] AS DOUBLE) - cvec[${i + 1}]) * " +
          s"(CAST(e.embedding[${i + 1}] AS DOUBLE) - cvec[${i + 1}])")
        .mkString("(", " + ", ")")
      s"""WITH cent AS (
            SELECT label AS cell,
                   array_agg(c ORDER BY pos) AS cvec
            FROM (SELECT label, g.i AS pos,
                    ROUND(CAST(SUM(CAST(CAST(embedding[g.i + 1] AS DOUBLE) AS DECIMAL(28,20))) AS DOUBLE)
                      / COUNT(*), 8) AS c
                  FROM embeddings, generate_series(0, ${VF.Dim - 1}) AS g(i)
                  GROUP BY label, g.i)
            GROUP BY label),
          assigned AS (
            SELECT vec_id, embedding, cell FROM (
              SELECT e.vec_id, e.embedding, cent.cell,
                     ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                        ORDER BY $d2terms, cent.cell) AS rn
              FROM embeddings e CROSS JOIN cent)
            WHERE rn = 1)
          SELECT qid, nid, cell, cosine, rn FROM (
            SELECT a.vec_id AS qid, b.vec_id AS nid, a.cell AS cell,
                   ROUND(${VF.cosineDuck("a.embedding", "b.embedding")}, 6) AS cosine,
                   ROW_NUMBER() OVER (PARTITION BY a.vec_id
                     ORDER BY ROUND(${VF.cosineDuck("a.embedding", "b.embedding")}, 6) DESC,
                              b.vec_id ASC) AS rn
            FROM assigned a JOIN assigned b
              ON a.cell = b.cell AND a.vec_id <> b.vec_id
            WHERE a.vec_id < 20)
          WHERE rn <= 3"""
    })

  def all: Seq[QueryDef] = Seq(
    knnBrute, centroids, nearDupPairs, annLshBuckets, annLshTopk, annIvf)
}
