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

  /** Spark-side md5 bucket in [0, 100) from the doc id. */
  private def bucketSpark = {
    val h = "md5(concat(cast(doc_id as string), '#split'))"
    expr(s"${PortableHash.laneSpark(h, 0)} % 100")
  }

  /** DuckDB-side identical bucket. */
  private val bucketDuck = {
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

  def all: Seq[QueryDef] = Seq(sampleSplit, sampleStratified)
}
