package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `SparkSessionExtensions` entry point for the engine's native
  * expressions, so plain `spark.sql` texts can call them:
  *
  *   spark-submit --conf spark.sql.extensions=graft.plans.GraftExtensions …
  *   spark.sql("SELECT vec_dot(embedding, query_vec) FROM t")
  *
  * For an already-running session (tests, notebooks) use
  * [[GraftExtensions.register]], which installs the same descriptors
  * into the live `FunctionRegistry`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.vecDot)
    ext.injectFunction(GraftExtensions.vecD2)
    ext.injectFunction(GraftExtensions.shingleHash)
  }
}

object GraftExtensions {

  /** vec_dot(array<float|double>, array<float|double>) → double —
    * the codegen'd [[VecDot]] kernel as a SQL-callable function.
    */
  val vecDot: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[VecDot].getCanonicalName, null, "vec_dot",
      "vec_dot(a, b) - IEEE-754 left-to-right dot product of two numeric arrays; null on length mismatch or null element.",
      ""),
    args => {
      require(args.length == 2, "vec_dot(a, b) takes exactly 2 arguments")
      VecDot(args.head, args(1))
    })

  /** vec_d2(array<float|double>, array<float|double>) → double —
    * the codegen'd [[VecD2]] squared-L2 kernel as a SQL function.
    */
  val vecD2: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_d2"),
    new ExpressionInfo(classOf[VecD2].getCanonicalName, null, "vec_d2",
      "vec_d2(a, b) - IEEE-754 left-to-right squared L2 distance of two numeric arrays; null on length mismatch or null element.",
      ""),
    args => {
      require(args.length == 2, "vec_d2(a, b) takes exactly 2 arguments")
      VecD2(args.head, args(1))
    })

  /** shingle_hash(text, k) → array<bigint> — the one-pass codegen'd
    * [[ShingleHash]] k-token shingle fingerprinter as a SQL function.
    * `k` must be a foldable integer literal (it shapes codegen).
    */
  val shingleHash: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("shingle_hash"),
    new ExpressionInfo(classOf[ShingleHash].getCanonicalName, null, "shingle_hash",
      "shingle_hash(text, k) - 64-bit rolling hashes of the k-token shingles of text; k a positive integer literal.",
      ""),
    args => {
      require(args.length == 2, "shingle_hash(text, k) takes exactly 2 arguments")
      val k = args(1) match {
        case e if e.foldable => e.eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"shingle_hash k must be an integer literal, got $other")
        }
        case _ => throw new IllegalArgumentException(
          "shingle_hash k must be a foldable integer literal")
      }
      ShingleHash(args.head, k)
    })

  /** Install the function set into a live session (same descriptors the
    * `spark.sql.extensions` path injects at session build).
    */
  def register(spark: SparkSession): Unit =
    Seq(vecDot, vecD2, shingleHash).foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
