package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector similarity primitives over `array<float>` embedding columns.
  *
  * Determinism across engines: double addition is order-dependent, so
  * both the Spark side and the DuckDB oracle evaluate dot products as an
  * explicit left-to-right 64-term chain (generated below) — identical
  * IEEE-754 operation sequences, bit-identical results.
  *
  * The idiomatic Spark form (`aggregate(zip_with(...))`) folds
  * left-to-right too and equals the explicit chain; we keep the explicit
  * generator as the single source of truth for both dialects.
  */
object VectorFunctions {
  val Dim = 64

  /** Spark Column: dot(a, b) as a left-assoc 64-term sum (codegen'd). */
  def dotSpark(a: String, b: String): Column =
    expr((0 until Dim).map(i =>
      s"cast($a[$i] as double) * cast($b[$i] as double)").mkString("(", " + ", ")"))

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

  /** Spark: dot(embedding, plane_p) with inline literal weights. */
  def planeDotSpark(a: String, p: Int): Column = {
    val ws = hyperplaneLiteral(p)
    expr((0 until Dim).map(i =>
      s"cast($a[$i] as double) * ${ws(i)}").mkString("(", " + ", ")"))
  }

  def planeDotDuck(a: String, p: Int): String = {
    val ws = hyperplaneLiteral(p)
    (0 until Dim).map(i =>
      s"CAST($a[${i + 1}] AS DOUBLE) * ${ws(i)}").mkString("(", " + ", ")")
  }
}
