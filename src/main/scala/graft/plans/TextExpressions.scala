package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native k-token shingle hashing: `shingle_hash(text, k)` → the
  * DISTINCT set of 64-bit shingle hashes, in one pass over the UTF8
  * bytes, with no intermediate strings.
  *
  * Why a custom Expression (same rationale as [[VecDot]]): the
  * equivalent built-in chain —
  *   array_distinct(transform(sequence(...), i ->
  *     concat_ws(" ", slice(filter(split(text, " "), ...), i+1, k))))
  * — materializes every token string, every shingle string, and runs
  * interpreted lambdas per element; measured ~4.7 µs per shingle, it
  * dominates the whole dedup/decontamination family. Web-scale dedup
  * is CPU-bound on exactly this kernel, so it earns the native
  * treatment. This expression tokenizes (split on ' ', empty tokens
  * skipped — `filter(split(text, " "), t -> t <> "")` semantics),
  * hashes each token's bytes with xxhash64, and combines each length-k
  * window by chaining token hashes through `XXH64.hashLong` — the same
  * combiner `xxhash64(col1, col2, …)` uses. Tokens cannot contain the
  * separator, so token-sequence identity ≡ the joined-string identity
  * the built-in chain compared: two shingles hash equal iff their
  * texts are equal (modulo 64-bit collisions — the same accepted
  * posture as joining on `xxhash64(shingle_text)`, and the DuckDB
  * oracles still compare real text, so a collision would surface as a
  * gate failure).
  *
  * Shorter-than-k documents produce ONE shingle of all tokens
  * (`shingles()` fallback branch); the output set is sorted (callers
  * explode / size / join it — order-free).
  */
case class ShingleHash(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash"

  override def nullSafeEval(t: Any): Any =
    ShingleHash.compute(t.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.ShingleHash.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash =
    copy(child = newChild)
}

object ShingleHash {
  /** Same default seed as Spark's `xxhash64(...)` function. */
  private val Seed = 42L

  def compute(text: UTF8String, k: Int): ArrayData = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val n = text.numBytes
    // Pass 1: hash each non-empty space-separated token in place.
    var tokenHashes = new Array[Long](math.max(8, n / 5))
    var nTok = 0
    var i = 0
    while (i <= n) {
      var j = i
      while (j < n && text.getByte(j) != ' ') j += 1
      if (j > i) { // non-empty token [i, j)
        if (nTok == tokenHashes.length)
          tokenHashes = java.util.Arrays.copyOf(tokenHashes, nTok * 2)
        tokenHashes(nTok) = XXH64.hashUnsafeBytes(base, off + i, j - i, Seed)
        nTok += 1
      }
      i = j + 1
    }
    // Pass 2: combine each k-window by chaining through hashLong.
    val m = if (nTok >= k) nTok - k + 1 else 1
    val out = new Array[Long](m)
    var w = 0
    while (w < m) {
      var acc = Seed
      var j = w
      val end = math.min(w + k, nTok)
      while (j < end) { acc = XXH64.hashLong(tokenHashes(j), acc); j += 1 }
      out(w) = acc
      w += 1
    }
    // Distinct (sorted): callers treat the result as a set.
    java.util.Arrays.sort(out)
    var uniq = 1
    var r = 1
    while (r < m) {
      if (out(r) != out(r - 1)) { out(uniq) = out(r); uniq += 1 }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (uniq == m) out else java.util.Arrays.copyOf(out, uniq))
  }
}
