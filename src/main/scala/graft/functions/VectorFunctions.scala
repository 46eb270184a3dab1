package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector similarity primitives over `array<float>` embedding columns.
  *
  * Determinism across engines: double addition is order-dependent, so
  * both sides must use the same IEEE-754 operation sequence. The DuckDB
  * oracle uses an explicit left-to-right 64-term chain; the Spark side
  * uses the native [[graft.plans.VecDot]] Catalyst expression, whose
  * codegen'd loop performs the identical addition sequence
  * (0+p0 ≡ p0) — bit-identical results with a tight primitive loop
  * instead of the interpreted `aggregate(zip_with(...))` lambda fold
  * this replaced.
  */
object VectorFunctions {
  val Dim = 64

  private def vecDot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSql.column(
      graft.plans.VecDot(
        org.apache.spark.sql.GraftSql.expression(a),
        org.apache.spark.sql.GraftSql.expression(b)))

  /** Spark Column: dot(a, b), natively codegen'd, left-to-right order. */
  def dotSpark(a: String, b: String): Column = vecDot(expr(a), expr(b))

  def normSpark(a: String): Column = sqrt(dotSpark(a, a))

  def cosineSpark(a: String, b: String): Column =
    dotSpark(a, b) / (normSpark(a) * normSpark(b))

  /** DuckDB fragment: same chain, 1-indexed lists. */
  def dotDuck(a: String, b: String): String =
    (0 until Dim).map(i =>
      s"CAST($a[${i + 1}] AS DOUBLE) * CAST($b[${i + 1}] AS DOUBLE)")
      .mkString("(", " + ", ")")

  def normDuck(a: String): String = s"SQRT(${dotDuck(a, a)})"

  def cosineDuck(a: String, b: String): String =
    s"(${dotDuck(a, b)} / (${normDuck(a)} * ${normDuck(b)}))"

  /** Deterministic random-hyperplane weights for LSH: derived from
    * [[PortableHash]] (public md5 arithmetic, no RNG), values in
    * [-1, 1] with exactly 3 decimals so the literals parse to identical
    * doubles in both engines.
    */
  def hyperplane(p: Int): IndexedSeq[Double] =
    (0 until Dim).map { i =>
      (PortableHash.hash32(s"plane-$p-$i", 0, 0) % 2001) / 1000.0 - 1.0
    }

  def hyperplaneLiteral(p: Int): IndexedSeq[String] =
    hyperplane(p).map(w => f"$w%.3f")

  /** Spark: dot(embedding, plane_p) with inline literal weights — same
    * left-to-right order as [[dotSpark]] via the native expression
    * (float array × double-literal array).
    */
  def planeDotSpark(a: String, p: Int): Column = {
    val ws = hyperplaneLiteral(p).mkString("array(", ", ", ")")
    vecDot(expr(a), expr(s"cast($ws as array<double>)"))
  }

  def planeDotDuck(a: String, p: Int): String = {
    val ws = hyperplaneLiteral(p)
    (0 until Dim).map(i =>
      s"CAST($a[${i + 1}] AS DOUBLE) * ${ws(i)}").mkString("(", " + ", ")")
  }
}
