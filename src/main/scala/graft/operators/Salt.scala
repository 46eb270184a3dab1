package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Explicit skew tooling: salted two-stage aggregation and salted
  * replicate-join.
  *
  * AQE's skew-join handling splits oversized sort-merge partitions
  * automatically, but two shapes still need explicit salt at 100 TB:
  * (a) hash AGGREGATION with a hot key — one reducer receives the hot
  * key's entire partial stream; (b) a hot-keyed shuffle join where the
  * small side is too big to broadcast. Salting trades one extra narrow
  * stage for bounded reducer fan-in: the hot key spreads across
  * `buckets` reducers and a second (tiny) aggregation merges the
  * partials.
  *
  * Exactness: partial sums stay DECIMAL(18,4) until the final merge,
  * so the salted result is bit-identical to the unsalted one for any
  * bucket count and any row distribution (PropertySpec-style
  * invariant, proven in SaltSpec).
  */
object Salt {
  private val D = DecimalType(18, 4)

  /** Two-stage salted count+sum: groupBy(keys :+ salt) partial →
    * groupBy(keys) merge. The salt is a deterministic hash of the
    * row's id — uniform, no RNG.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], valueCol: String,
      buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val salted = df.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(buckets.toLong)))
    val partial = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(count(lit(1)).as("_n"), sum(col(valueCol).cast(D)).as("_s"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_n")).as("n"),
        sum(col("_s")).cast("double").as("sum_value"))
  }

  /** Salted equi-join: the large side gets a hashed salt, the small
    * side is replicated `buckets` ways — the hot key's rows land on
    * `buckets` different reducers instead of one. Use when the small
    * side exceeds the broadcast threshold but replication ×buckets is
    * still cheap.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
      buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val l = large.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(buckets.toLong)))
    val s = small.withColumn("_salt",
      explode(array((0 until buckets).map(b => lit(b.toLong)): _*)))
    l.join(s, keys :+ "_salt").drop("_salt")
  }
}
