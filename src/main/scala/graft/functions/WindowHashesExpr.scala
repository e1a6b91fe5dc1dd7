package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Rolling 64-bit hashes of every `n`-token window of a token array — the
  * CANDIDATE-generation kernel of the exact-substring dedup family
  * ([[graft.operators.ExactSubstr]]): position `p` (0-based here; callers
  * publish 1-based) gets the polynomial hash
  * `Σ_{i<n} tokenHash(p+i) · B^{n-1-i} (mod 2⁶⁴)`, advanced in O(1) per
  * position — O(corpus tokens) total, versus the O(corpus · n) bytes the
  * string-window spelling materializes and ships. Token hashes are the
  * same [[ShingleHashing.hashRange]] 64-bit function the sketch family
  * uses, over each token's UTF-8 bytes.
  *
  * Collisions are candidate-side noise only: every downstream consumer
  * re-verifies candidates on exact token content, so a collision costs
  * one extra verified row, never a wrong answer (the kernel itself is
  * engine-internal and appears in no oracle-checked column). */
object WindowHashUtil {
  /** Odd multiplier (the FNV-1a 64-bit prime) — invertible mod 2⁶⁴, so
    * rolling subtraction cannot systematically cancel. */
  private val B = 0x100000001b3L

  def hashes(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    val total = len - n + 1
    if (total <= 0) return ArrayData.toArrayData(Array.emptyLongArray)
    val th = new Array[Long](len)
    var i = 0
    while (i < len) {
      // a null token cannot occur in the tokenizer's output; hash it as an
      // empty byte string rather than crashing the scan
      th(i) = if (tokens.isNullAt(i)) ShingleHashing.hashRange(Array.emptyByteArray, 0, 0)
      else {
        val b = tokens.getUTF8String(i).getBytes
        ShingleHashing.hashRange(b, 0, b.length)
      }
      i += 1
    }
    // B^(n-1) mod 2^64 for the rolling subtraction
    var bTop = 1L
    i = 1
    while (i < n) { bTop *= B; i += 1 }
    val out = new Array[Long](total)
    var h = 0L
    i = 0
    while (i < n) { h = h * B + th(i); i += 1 }
    out(0) = h
    var p = 1
    while (p < total) {
      h = (h - th(p - 1) * bTop) * B + th(p + n - 1)
      out(p) = h
      p += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** Catalyst expression wrapping [[WindowHashUtil.hashes]]; codegen emits
  * one static call per row (the [[RpProject]] pattern). */
case class WindowHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"window length n=$n must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_window_hashes expects array<string>, got ${other.simpleString}")
  }

  override def prettyName: String = "graft_window_hashes"

  override protected def nullSafeEval(input: Any): Any =
    WindowHashUtil.hashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WindowHashUtil.hashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WindowHashes =
    copy(child = newChild)
}
