package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Johnson–Lindenstrauss ±1 projection kernel — the tight-loop form of
  * the oracle-portable spelling
  * `round(CAST(Σ_j DECIMAL(28,9)(round(v_j·s_jk, 9)) AS DOUBLE) / √outDim, 9)`.
  *
  * Exactness argument (why a long loop can replace the decimal fold):
  * each element's `round(v_j·s, 9)` is reproduced with the SAME
  * `BigDecimal.valueOf(double).setScale(9, HALF_UP)` call Spark's `Round`
  * uses, held as a ×10⁹ scaled long (exact for |v_j| < 9.2·10⁹); the sign
  * flip commutes with HALF_UP rounding (it rounds away from zero), so one
  * BigDecimal per INPUT element serves all `outDim` components, and the
  * per-component sum is exact long arithmetic — identical to the
  * DECIMAL(28,9) sum. The final `(double) sum / 1e9` is the correctly-
  * rounded IEEE division of two exactly-representable doubles, which is
  * precisely what casting the exact decimal to DOUBLE yields. The
  * interpreted higher-order-function fold this replaces allocated a
  * Decimal per (element × component) and ran ~30 s on 5k vectors; this is
  * one codegen'd static call per row. */
object RpUtil {
  def project(v: ArrayData, masks: Array[Long], outDim: Int, dim: Int): ArrayData = {
    val n = math.min(dim, v.numElements())
    val words = (dim + 63) / 64
    val r = new Array[Long](n)
    var j = 0
    while (j < n) {
      r(j) = java.math.BigDecimal.valueOf(v.getDouble(j))
        .setScale(9, java.math.RoundingMode.HALF_UP)
        .movePointRight(9).longValueExact()
      j += 1
    }
    val out = new Array[Double](outDim)
    val sqrtK = math.sqrt(outDim.toDouble)
    var k = 0
    while (k < outDim) {
      var s = 0L
      var jj = 0
      while (jj < n) {
        val bit = (masks(k * words + (jj >> 6)) >>> (jj & 63)) & 1L
        s += (if (bit == 1L) r(jj) else -r(jj))
        jj += 1
      }
      out(k) = java.math.BigDecimal.valueOf((s.toDouble / 1e9) / sqrtK)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
      k += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** Catalyst expression wrapping [[RpUtil.project]]; the sign-mask words
  * ride along as a plan reference object (not a literal array node), and
  * codegen emits one static call — the [[SignBits]] lesson applied. */
case class RpProject(child: Expression, masks: Array[Long], outDim: Int,
    dim: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_rp_project expects array<double>, got ${other.simpleString}")
  }

  override def prettyName: String = "graft_rp_project"

  override protected def nullSafeEval(input: Any): Any =
    RpUtil.project(input.asInstanceOf[ArrayData], masks, outDim, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val masksRef = ctx.addReferenceObj("rpMasks", masks, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RpUtil.project($c, $masksRef, $outDim, $dim)")
  }

  override protected def withNewChildInternal(newChild: Expression): RpProject =
    copy(child = newChild)
}
