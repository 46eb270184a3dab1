package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided deterministic testdata tables
  * (see TESTDATA.md). Explicit single-parquet-per-table layout;
  * at cluster scale these would be partitioned directories — the
  * reader API is identical (`spark.read.parquet(dir)`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` is written as parquet INT64 TIMESTAMP(NANOS) which the
    * vectorized reader rejects; read nanos as long and truncate to
    * microseconds (`ts div 1000` — exact integer division, matching
    * DuckDB's `CAST(ts AS TIMESTAMP)` ns→us truncation). Exposed as
    * TIMESTAMP_NTZ so the wall-clock value is timezone-independent.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts",
        org.apache.spark.sql.functions
          .expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Table accessor routing through per-table fixups (events nanos). */
  def table(s: SparkSession, d: String, name: String): DataFrame =
    if (name == "events") events(s, d) else load(s, d, name)

  /** Register all tables as temp views so operators can also be expressed
    * as `spark.sql` texts (the reference's dashboard queries are SQL —
    * see SURVEY.md §3.3).
    */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
