package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.PortableHash
import org.apache.spark.sql.functions._

/** Deterministic sampling / split assignment over `documents` — the
  * train/val/test plumbing of a training-data pipeline. Assignment is a
  * pure function of the stable document id (md5 bucket), so it is
  * reproducible across engines, runs, and cluster layouts: re-running
  * on 100 TB, or on a resharded copy of the corpus, yields the same
  * split — unlike `df.sample`/`randomSplit`, whose output depends on
  * partitioning. Map-only (no shuffle) except the tiny summary agg.
  */
object Sampling {

  /** Spark-side md5 bucket in [0, 100) from the doc id. Shared with the
    * decontamination query (Text.scala), whose eval set is the `test`
    * band of THIS split — contamination is defined relative to it.
    */
  private[queries] def bucketSpark = {
    val h = "md5(concat(cast(doc_id as string), '#split'))"
    expr(s"${PortableHash.laneSpark(h, 0)} % 100")
  }

  /** DuckDB-side identical bucket. */
  private[queries] val bucketDuck = {
    val h = "md5(CAST(doc_id AS VARCHAR) || '#split')"
    s"${PortableHash.laneDuck(h, 0)} % 100"
  }

  /** Per-document deterministic 80/10/10 split assignment. */
  val sampleSplit = QueryDef(
    "q_sample_split",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), bucketSpark.as("bucket"))
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "valid")
            .otherwise("test")),
    Some(s"""SELECT doc_id, bucket,
             CASE WHEN bucket < 80 THEN 'train'
                  WHEN bucket < 90 THEN 'valid'
                  ELSE 'test' END AS split
             FROM (SELECT doc_id, $bucketDuck AS bucket FROM documents)""")
  )

  /** Stratified-sample accounting: per (lang, source) stratum, corpus
    * size vs the deterministic 20% subsample — the coverage report a
    * data-mixture pipeline checks before training.
    */
  val sampleStratified = QueryDef(
    "q_sample_stratified",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("lang"), col("source"), bucketSpark.as("bucket"))
        .groupBy("lang", "source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("bucket") < 20, 1).otherwise(0)).as("n_sampled")),
    Some(s"""SELECT lang, source, COUNT(*) AS n_docs,
             CAST(SUM(CASE WHEN bucket < 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
             FROM (SELECT lang, source, $bucketDuck AS bucket FROM documents)
             GROUP BY lang, source""")
  )

  /** Weighted domain mixing to a token budget — the data-mixture step
    * of a pretraining pipeline: upweight preferred sources, downweight
    * the rest, and sample each source at a rate that lands the total
    * sampled token count on a target budget (30% of the corpus here).
    *
    * Everything is deterministic and integer-exact so it reproduces
    * bit-identically across engines and cluster layouts:
    *
    *  - per-source token mass T_s and the global budget B = 3·ΣT_s/10
    *    are integer aggregates;
    *  - source s is sampled at rate r_s = B·w_s / Σ(w_s·T_s), which
    *    makes the expected sampled tokens Σ T_s·r_s = B exactly;
    *  - a doc is kept iff h·W < B·w_s·2³², where h is its 32-bit
    *    portable hash and W = Σ(w_s·T_s) — the comparison is all-integer
    *    (DECIMAL/HUGEINT, no float rate), so there is no boundary
    *    ambiguity. Rates > 1 degrade to keep-everything naturally
    *    (h < 2³² always).
    *
    * Two passes over the corpus (one for the per-source masses, one for
    * the sampling scan); at 100 TB the doc-level stats relation is the
    * thing to persist between them. The per-source join is a broadcast
    * (source cardinality ≈ domains, tiny); the output is the mixture
    * accounting report a data-mixture pipeline reviews before training.
    */
  val mixSample = QueryDef(
    "q_mix_sample",
    (s, d) => {
      import graft.functions.{TextFunctions => TF}
      // r20: the doc-level stats relation is read by BOTH passes (the
      // per-source mass agg and the sampling scan) — previously each
      // re-ran the tokenization + md5 over the corpus. Materialize it
      // once, exactly the "persist between the two passes" shape the
      // scale note below already prescribed.
      val docs = graft.util.Staged.checkpointRelease("q_mix_sample",
        Tables.documents(s, d).select(
          col("doc_id"), col("source"),
          TF.tokenCount(col("text")).cast("long").as("n_tok"),
          expr(PortableHash.laneSpark(
            "md5(concat(cast(doc_id as string), '#mix'))", 0)).as("h")))
      val srcw = docs.groupBy("source")
        .agg(sum(col("n_tok")).as("src_tokens"))
        .withColumn("w",
          when(expr("cast(substring(source, 4, 10) as int) % 2") === 0, 3L)
            .otherwise(1L))
      val glob = srcw.agg(
        sum(col("w") * col("src_tokens")).as("wsum"),
        expr("(sum(src_tokens) * 3) div 10").as("budget"))
      val keep = col("h").cast("decimal(20,0)") * col("wsum").cast("decimal(20,0)") <
        col("budget").cast("decimal(20,0)") * col("w") * lit(4294967296L)
      docs.join(broadcast(srcw.select(col("source"), col("w"))), Seq("source"))
        .crossJoin(broadcast(glob))
        .groupBy("source")
        .agg(
          max(col("w")).as("weight"),
          count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("n_tokens"),
          sum(when(keep, 1L).otherwise(0L)).as("n_kept"),
          sum(when(keep, col("n_tok")).otherwise(0L)).as("kept_tokens"),
          round(max(col("budget") * col("w")).cast("double") / max(col("wsum")), 6)
            .as("rate"))
    },
    Some {
      val nTok = graft.functions.TextSql.tokenCount("text")
      val h = PortableHash.laneDuck("md5(CAST(doc_id AS VARCHAR) || '#mix')", 0)
      s"""WITH docs AS (SELECT doc_id, source, $nTok AS n_tok, $h AS h FROM documents),
          srcw AS (SELECT source, CAST(SUM(n_tok) AS BIGINT) AS src_tokens,
                          CASE WHEN CAST(substring(source, 4) AS INT) % 2 = 0
                               THEN 3 ELSE 1 END AS w
                   FROM docs GROUP BY source),
          tot AS (SELECT CAST(SUM(w * src_tokens) AS BIGINT) AS wsum,
                          CAST((SUM(src_tokens) * 3) // 10 AS BIGINT) AS budget
                   FROM srcw),
          j AS (SELECT d.source, d.n_tok, sw.w, g.wsum, g.budget,
                  CASE WHEN CAST(d.h AS HUGEINT) * g.wsum
                       < CAST(g.budget AS HUGEINT) * sw.w * 4294967296
                       THEN 1 ELSE 0 END AS keep
                FROM docs d JOIN srcw sw USING (source) CROSS JOIN tot g)
          SELECT source,
                 CAST(MAX(w) AS BIGINT) AS weight,
                 COUNT(*) AS n_docs,
                 CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
                 CAST(SUM(keep) AS BIGINT) AS n_kept,
                 CAST(SUM(CASE WHEN keep = 1 THEN n_tok ELSE 0 END) AS BIGINT)
                   AS kept_tokens,
                 ROUND(CAST(MAX(budget * w) AS DOUBLE) / MAX(wsum), 6) AS rate
          FROM j GROUP BY source"""
    }
  )

  /** Per-domain document caps — the Common-Crawl-style frequency cap:
    * no source (domain) may contribute more than N documents, and
    * which N survive is a deterministic function of the doc id (md5
    * priority, doc_id tiebreak), not of arrival order. Output is the
    * per-domain accounting report (kept / dropped / surviving token
    * mass) a corpus-composition review reads.
    *
    * Scale shape: ONE shuffle on source, then a per-domain top-N.
    * row_number over (source) is safe because domains bound partition
    * size in practice; a pathological mega-domain is exactly what the
    * cap deletes, and an extreme-skew variant would pre-prune with an
    * approximate h-threshold (every doc with h above N·2³²/n_s is
    * droppable map-side) before the exact rank — same two-stage trick
    * as `operators/Salt`.
    */
  val domainCaps = QueryDef(
    "q_domain_caps",
    (s, d) => {
      import graft.functions.{TextFunctions => TF}
      import org.apache.spark.sql.expressions.Window
      val N = 15
      val h = expr(PortableHash.laneSpark(
        "md5(concat(cast(doc_id as string), '#cap'))", 0))
      val w = Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          TF.tokenCount(col("text")).cast("long").as("n_tok"), h.as("h"))
        .withColumn("rn", row_number().over(w))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("rn") <= N, 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("rn") > N, 1L).otherwise(0L)).as("n_dropped"),
          sum(when(col("rn") <= N, col("n_tok")).otherwise(0L)).as("kept_tokens"))
    },
    Some {
      val N = 15
      val h = PortableHash.laneDuck(
        "md5(CAST(doc_id AS VARCHAR) || '#cap')", 0)
      s"""WITH r AS (SELECT source,
                  ${graft.functions.TextSql.tokenCount("text")} AS n_tok,
                  ROW_NUMBER() OVER (PARTITION BY source
                                     ORDER BY $h, doc_id) AS rn
                FROM documents)
          SELECT source, COUNT(*) AS n_docs,
                 CAST(SUM(CASE WHEN rn <= $N THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                 CAST(SUM(CASE WHEN rn > $N THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
                 CAST(SUM(CASE WHEN rn <= $N THEN n_tok ELSE 0 END) AS BIGINT) AS kept_tokens
          FROM r GROUP BY source"""
    }
  )

  /** Weighted sampling WITHOUT replacement, exact size k = 50 — the
    * Efraimidis–Spirakis reservoir as a distributed one-pass: each doc
    * gets priority ln(u)/w (u = its deterministic md5-uniform in (0,1),
    * w = its weight — here n_chars, i.e. longer docs proportionally
    * more likely), and the sample is the top k by priority. This is the
    * exact-size complement of q_mix_sample's Bernoulli rates: a mixture
    * builder that must hit a token budget uses THIS, not a rate.
    *
    * Scale shape: priorities are map-only (one md5 + one ln per row);
    * selection is TakeOrderedAndProject (per-partition top-k then a
    * k-row merge on the driver) — no sort, no shuffle of the corpus.
    * Determinism: u is a pure function of doc_id, priorities round to
    * 9 dp, ties break on doc_id — identical sample on any layout, and
    * bit-identical in DuckDB.
    */
  val weightedSample = QueryDef(
    "q_weighted_sample",
    (s, d) => {
      val h = "md5(concat(cast(doc_id as string), '#wsample'))"
      val u = (expr(PortableHash.laneSpark(h, 0)).cast("double") + lit(0.5)) /
        lit(4294967296.0)
      Tables.documents(s, d)
        .filter(col("n_chars") > 0)
        .select(col("doc_id"), col("lang"), col("n_chars").as("weight"),
          round(log(u) / col("n_chars").cast("double"), 9).as("priority"))
        .orderBy(desc("priority"), asc("doc_id"))
        .limit(50)
    },
    Some {
      val h = "md5(CAST(doc_id AS VARCHAR) || '#wsample')"
      s"""SELECT doc_id, lang, n_chars AS weight,
                 ROUND(LN((CAST(${PortableHash.laneDuck(h, 0)} AS DOUBLE) + 0.5)
                   / 4294967296.0) / CAST(n_chars AS DOUBLE), 9) AS priority
          FROM documents WHERE n_chars > 0
          ORDER BY priority DESC, doc_id LIMIT 50"""
    })

  /** Class-balance audit over the labeled corpus (the dataset-card
    * check before training a classifier or weighting a mixture): per
    * label its share of the corpus, plus one summary row carrying the
    * chi-square uniformity statistic Σ(nᵢ−E)²/E, the max/min share
    * imbalance ratio, and a balance verdict (ratio ≤ 1.5 ⇒
    * 'balanced' — the rule of thumb below which per-class reweighting
    * is unnecessary).
    *
    * Scale shape: one hash-agg to |labels| rows; the summary
    * re-aggregates that reduced side and every downstream number is
    * arithmetic on exact integers (counts), so both engines emit
    * identical doubles after the final rounded divisions.
    */
  val labelBalance = QueryDef(
    "q_label_balance",
    (s, d) => {
      val counts = Tables.embeddings(s, d)
        .groupBy("label").agg(count(lit(1)).as("n"))
      val tot = counts.agg(
        sum(col("n")).as("total"), count(lit(1)).as("k"),
        max(col("n")).as("mx"), min(col("n")).as("mn"),
        // chi-square vs uniform: Σ n² · k / N − N, an integer-exact
        // rearrangement of Σ(n−N/k)²/(N/k) — no per-class float error
        sum(col("n") * col("n")).as("ssq"))
      counts.crossJoin(broadcast(tot))
        .select(col("label"), col("n"),
          round(col("n").cast("double") / col("total"), 6).as("share"),
          round(col("ssq").cast("double") * col("k") / col("total")
            - col("total"), 6).as("chi2"),
          round(col("mx").cast("double") / col("mn"), 6).as("imbalance_ratio"))
        .withColumn("verdict",
          when(col("imbalance_ratio") <= 1.5, "balanced").otherwise("skewed"))
    },
    Some("""WITH c AS (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS total, COUNT(*) AS k,
                         MAX(n) AS mx, MIN(n) AS mn,
                         CAST(SUM(n * n) AS BIGINT) AS ssq
                  FROM c)
            SELECT label, n,
                   ROUND(CAST(n AS DOUBLE) / total, 6) AS share,
                   ROUND(CAST(ssq AS DOUBLE) * k / total - total, 6) AS chi2,
                   ROUND(CAST(mx AS DOUBLE) / mn, 6) AS imbalance_ratio,
                   CASE WHEN ROUND(CAST(mx AS DOUBLE) / mn, 6) <= 1.5
                        THEN 'balanced' ELSE 'skewed' END AS verdict
            FROM c CROSS JOIN t""")
  )

  /** Temperature-based mixture reweighting (α = 0.5) — the
    * multilingual/multi-domain sampling standard (XLM-R §3.1, mT5):
    * raw proportions p_i = n_i/N are flattened to q_i ∝ p_i^α so
    * low-resource sources are upsampled without letting any single
    * head domain dominate. Per source: the raw share, the tempered
    * share, the resulting boost factor, and the token allocation under
    * a 30% total budget — the table a mixture builder feeds into
    * [[mixSample]]-style rate gates or [[weightedSample]]-style
    * exact-size draws.
    *
    * Exactness: n_i are exact token counts; p^α reduces to
    * √n_i / Σ√n_j (N^α cancels), so the only transcendental is ONE
    * sqrt per source, rounded to 9 dp with the rounded values
    * DECIMAL-summed (merge-order-free); shares round to 6, the boost
    * ratio of the two ROUNDED shares to 4. Scale shape: one map-side-
    * combined corpus agg to |sources| rows; everything after is k-row
    * broadcast math.
    */
  val mixTemperature = QueryDef(
    "q_mix_temperature",
    (s, d) => {
      import graft.functions.{TextFunctions => TF}
      import org.apache.spark.sql.types.DecimalType
      val src = Tables.documents(s, d)
        .select(col("source"), TF.tokenCount(col("text")).cast("long").as("n_tok"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
        .withColumn("sq", round(sqrt(col("n_tokens").cast("double")), 9))
      val tot = src.agg(sum(col("n_tokens")).as("nn"),
        sum(col("sq").cast(DecimalType(28, 12))).cast("double").as("sqsum"))
      src.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          round(col("n_tokens").cast("double") / col("nn").cast("double"), 6)
            .as("p_raw"),
          round(col("sq") / col("sqsum"), 6).as("q_temp"))
        .withColumn("boost", round(col("q_temp") / col("p_raw"), 4))
        .crossJoin(broadcast(tot.select(expr("(nn * 3) div 10").as("budget"))))
        .withColumn("target_tokens",
          round(col("q_temp") * col("budget").cast("double"), 0).cast("long"))
        .drop("budget")
    },
    Some(s"""WITH src AS (
              SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(${graft.functions.TextSql.tokenCount("text")})
                          AS BIGINT) AS n_tokens
              FROM documents GROUP BY source),
            sq AS (SELECT *, ROUND(SQRT(CAST(n_tokens AS DOUBLE)), 9) AS sq
                   FROM src),
            tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS nn,
                           CAST(SUM(CAST(sq AS DECIMAL(28,12))) AS DOUBLE)
                             AS sqsum
                    FROM sq)
            SELECT source, n_docs, n_tokens,
                   ROUND(CAST(n_tokens AS DOUBLE) / CAST(nn AS DOUBLE), 6)
                     AS p_raw,
                   ROUND(sq / sqsum, 6) AS q_temp,
                   ROUND(ROUND(sq / sqsum, 6)
                         / ROUND(CAST(n_tokens AS DOUBLE)
                                 / CAST(nn AS DOUBLE), 6), 4) AS boost,
                   CAST(ROUND(ROUND(sq / sqsum, 6)
                              * CAST((nn * 3) // 10 AS DOUBLE), 0) AS BIGINT)
                     AS target_tokens
            FROM sq CROSS JOIN tot"""))

  def all: Seq[QueryDef] = Seq(sampleSplit, sampleStratified, mixSample,
    domainCaps, weightedSample, labelBalance, mixTemperature)
}
