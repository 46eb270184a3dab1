package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Bit-exact cross-engine aggregation helpers.
  *
  * Summing doubles is order-dependent, so a Spark `sum(double)` will not
  * hash-match a DuckDB `SUM(double)` at 60k rows. The input data carries
  * at most 2 decimal digits, so we sum in DECIMAL(18,4) — exact and
  * order-independent — and cast the exact result back to double. Both
  * engines then produce the identical IEEE-754 value.
  *
  * The matching SQL fragments for the oracle side are in [[Sql]].
  *
  * At 100 TB this strategy also holds: decimal sums are associative, so
  * partial (map-side) aggregation and any merge order give the same
  * result; precision 38 accommodates ~1e24 row-value mass.
  */
object Exact {
  val D: DecimalType = DecimalType(18, 4)

  /** Exact SUM(x) as double. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast(DoubleType)

  /** Exact AVG(x) (null-skipping, like SQL AVG) as double. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Exact SUM(x*y) as double (e.g. revenue = price * (1 - discount)). */
  def dsum2(x: Column, y: Column): Column =
    sum(x.cast(D) * y.cast(D)).cast(DoubleType)

  /** Sample stddev from exact decimal moments; identical in both engines
    * because the inputs to the final double arithmetic are exact.
    */
  def dstddev(c: Column): Column = {
    val s   = dsum(c)
    val ssq = sum(c.cast(D) * c.cast(D)).cast(DoubleType)
    val n   = count(c).cast(DoubleType)
    when(n > 1, sqrt(greatest((ssq - s * s / n) / (n - lit(1.0)), lit(0.0))))
  }

  /** Population variance from exact moments. */
  def dvarPop(c: Column): Column = {
    val s   = dsum(c)
    val ssq = sum(c.cast(D) * c.cast(D)).cast(DoubleType)
    val n   = count(c).cast(DoubleType)
    when(n > 0, greatest((ssq - s * s / n) / n, lit(0.0)))
  }

  /** Pearson correlation from exact decimal moments (ref M7,
    * enhanced_spark_etl.py:626-648): every sum is exact, the final
    * double arithmetic is identical IEEE-754 in both engines.
    */
  def dcorr(x: Column, y: Column): Column = {
    val n   = count(lit(1)).cast(DoubleType)
    val sx  = dsum(x)
    val sy  = dsum(y)
    val sxy = sum(x.cast(D) * y.cast(D)).cast(DoubleType)
    val sxx = sum(x.cast(D) * x.cast(D)).cast(DoubleType)
    val syy = sum(y.cast(D) * y.cast(D)).cast(DoubleType)
    (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
  }
}

/** DuckDB-oracle SQL fragments matching [[Exact]]. */
object Sql {
  def SUMD(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DOUBLE)"
  def AVGD(x: String): String =
    s"(${SUMD(x)} / COUNT($x))"
  def SUMD2(x: String, y: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,4)) * CAST($y AS DECIMAL(18,4))) AS DOUBLE)"
  def STDDEVD(x: String): String = {
    val s   = SUMD(x)
    val ssq = s"CAST(SUM(CAST($x AS DECIMAL(18,4)) * CAST($x AS DECIMAL(18,4))) AS DOUBLE)"
    val n   = s"CAST(COUNT($x) AS DOUBLE)"
    s"CASE WHEN COUNT($x) > 1 THEN SQRT(GREATEST(($ssq - $s * $s / $n) / ($n - 1.0), 0.0)) END"
  }
  def VARPOPD(x: String): String = {
    val s   = SUMD(x)
    val ssq = s"CAST(SUM(CAST($x AS DECIMAL(18,4)) * CAST($x AS DECIMAL(18,4))) AS DOUBLE)"
    val n   = s"CAST(COUNT($x) AS DOUBLE)"
    s"CASE WHEN COUNT($x) > 0 THEN GREATEST(($ssq - $s * $s / $n) / $n, 0.0) END"
  }
  def CORRD(x: String, y: String): String = {
    def p(a: String, b: String) =
      s"CAST(SUM(CAST($a AS DECIMAL(18,4)) * CAST($b AS DECIMAL(18,4))) AS DOUBLE)"
    val n = "CAST(COUNT(*) AS DOUBLE)"
    s"(($n * ${p(x, y)} - ${SUMD(x)} * ${SUMD(y)}) / " +
      s"(SQRT($n * ${p(x, x)} - ${SUMD(x)} * ${SUMD(x)}) * " +
      s"SQRT($n * ${p(y, y)} - ${SUMD(y)} * ${SUMD(y)})))"
  }
}
