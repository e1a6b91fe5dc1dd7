package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, Lower, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass byte-scan trim of non-`[a-z]` runs from both string ends —
  * the hot half of the portable token normalizer
  * `regexp_replace(lower(t), '^[^a-z]+|[^a-z]+$', '')`.
  *
  * Lowercasing deliberately stays with Spark's own `Lower` expression
  * (compose via [[TrimNonAlpha.normalized]]): `lower()` is context-
  * sensitive (e.g. Greek final sigma), and re-implementing it would
  * silently diverge — the property suite compares against the regex form
  * to enforce this.
  *
  * Byte-level trimming is UTF-8-safe: `[a-z]` are single-byte codepoints
  * and multi-byte sequences never contain ASCII bytes, so a prefix/suffix
  * cut at an ASCII boundary cannot split a character. */
object NormalizeUtil {
  def trimNonAlpha(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var j = n - 1
    while (i <= j && !isAlpha(s.getByte(i))) i += 1
    while (j >= i && !isAlpha(s.getByte(j))) j -= 1
    if (i > j) UTF8String.EMPTY_UTF8
    else if (i == 0 && j == n - 1) s
    else copyRange(s, i, j)
  }

  @inline private def isAlpha(b: Byte): Boolean = b >= 'a' && b <= 'z'

  private def copyRange(s: UTF8String, i: Int, j: Int): UTF8String = {
    val len = j - i + 1
    val out = new Array[Byte](len)
    var k = 0
    while (k < len) { out(k) = s.getByte(i + k); k += 1 }
    UTF8String.fromBytes(out)
  }
}

/** Catalyst expression wrapping [[NormalizeUtil.trimNonAlpha]], with
  * codegen (`doGenCode` emits a direct static call — stays inside
  * WholeStageCodegen, no interpreted fallback). The full normalizer is
  * `TrimNonAlpha(Lower(child))`, registered as SQL function
  * `graft_normalize` by [[graft.GraftExtensions]]. */
case class TrimNonAlpha(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "trim_non_alpha"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeUtil.trimNonAlpha(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeUtil.trimNonAlpha($c)")

  override protected def withNewChildInternal(newChild: Expression): TrimNonAlpha =
    copy(child = newChild)
}

object TrimNonAlpha {
  /** The complete portable normalizer: Spark-native lowercase, then the
    * single-pass trim. */
  def normalized(child: Expression): Expression = TrimNonAlpha(Lower(child))
}
