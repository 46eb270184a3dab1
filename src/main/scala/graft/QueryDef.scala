package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query: the Spark implementation plus (when
  * SQL-expressible) an equivalent ANSI SQL text for the DuckDB oracle.
  *
  * The driver compares the Spark result and the DuckDB result after
  * sorting columns by name, so `fn` and `oracle` MUST produce the same
  * column names (alias every computed column on both sides).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object QueryRegistry {
  def all: Seq[QueryDef] =
    queries.Relational.all ++
      queries.Events.all ++
      queries.Text.all ++
      queries.Dedup.all ++
      queries.Vectors.all ++
      queries.Warehouse.all ++
      queries.Validation.all ++
      queries.Ml.all ++
      queries.Multimodal.all ++
      queries.Streaming.all ++
      queries.TimeSeries.all ++
      queries.Dashboard.all ++
      queries.SqlDash.all ++
      queries.Temporal.all ++
      queries.Sampling.all ++
      queries.Privacy.all ++
      queries.Graph.all

  def asMap: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracles: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
