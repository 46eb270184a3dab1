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

  private def vecD2(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSql.column(
      graft.plans.VecD2(
        org.apache.spark.sql.GraftSql.expression(a),
        org.apache.spark.sql.GraftSql.expression(b)))

  /** Spark Column: dot(a, b), natively codegen'd, left-to-right order. */
  def dotSpark(a: String, b: String): Column = vecDot(expr(a), expr(b))

  /** Squared-L2 distance between two Columns (works inside higher-order
    * lambdas too — the broadcast-row centroid form uses it to score a
    * transform() over an array of centroid structs).
    */
  def d2Spark(a: Column, b: Column): Column = vecD2(a, b)

  /** Squared-L2 distance to a DRIVER-SIDE centroid vector, embedded as
    * an `array<double>` literal — natively codegen'd, same chain as the
    * oracle's explicit term sum.
    */
  def d2ToLit(vec: Column, centroid: Seq[Double]): Column =
    vecD2(vec, array(centroid.map(lit): _*))

  /** Map-only nearest-centroid assignment: the centroid set (a handful
    * of rows — k-means k, IVF cell count, PQ M×K) is collected to the
    * driver by the caller and embedded as literals, so the argmin is a
    * per-row `least()` over `struct(d2, id)` — NO shuffle, NO join.
    * This is how MLlib runs Lloyd iterations too (centroids live on
    * the driver between passes); at 100 TB the corpus stays put and
    * only k×dim doubles move.
    *
    * Struct comparison is lexicographic, so ties on d2 break on the
    * smaller id — identical to the `ROW_NUMBER() OVER (ORDER BY d2,
    * id)` the oracle uses. Returns struct(d2, id); read fields with
    * `.getField`. Guarded: literal plans grow with k, so refuse
    * centroid sets too big to inline (use a broadcast join instead).
    */
  def nearestLit(vec: Column, centroids: Seq[(Column, Seq[Double])]): Column = {
    require(centroids.size >= 2 && centroids.size <= 256,
      s"nearestLit inlines centroids as literals; got ${centroids.size}, " +
        "expected 2..256 (bigger sets should use a broadcast join)")
    least(centroids.map { case (id, c) =>
      struct(d2ToLit(vec, c).as("d2"), id.as("id"))
    }: _*)
  }

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
