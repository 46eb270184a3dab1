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

  /** Install the function set into a live session (same descriptors the
    * `spark.sql.extensions` path injects at session build).
    */
  def register(spark: SparkSession): Unit =
    Seq(vecDot, vecD2).foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
