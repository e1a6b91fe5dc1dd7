package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Johnson–Lindenstrauss ±1 projection kernel — the tight-loop form of
  * the oracle-portable spelling
  * `round(CAST(Σ_j DECIMAL(28,9)(round(v_j·s_jk, 9)) AS DOUBLE) / √outDim, 9)`.
  *
  * Exactness argument (why a long loop can replace the decimal fold):
  * each element's `round(v_j·s, 9)` is reproduced with the SAME
  * `BigDecimal.valueOf(double).setScale(9, HALF_UP)` call Spark's `Round`
  * uses, held as a ×10⁹ scaled long; the sign flip commutes with HALF_UP
  * rounding (it rounds away from zero), so one BigDecimal per INPUT
  * element serves all `outDim` components, and the per-component sum is
  * exact long arithmetic — identical to the DECIMAL(28,9) sum. The fast
  * long path runs only when `n·max|scaled|` stays under 2⁵³, so the sum
  * can neither overflow the long nor lose bits in `(double) sum / 1e9`,
  * which is then the correctly-rounded IEEE division of two
  * exactly-representable doubles — precisely what casting the exact
  * decimal to DOUBLE yields. The interpreted higher-order-function fold
  * this replaces allocated a Decimal per (element × component) and ran
  * ~30 s on 5k vectors; this is one codegen'd static call per row.
  *
  * Degenerate inputs follow the HOF/oracle spelling instead of throwing
  * (a single broken-encoder NaN must not crash the job):
  *  - a NULL, NaN, or ±Infinity element, or one whose 9-rounded value
  *    overflows DECIMAL(28,9): Spark's `Round` passes non-finites through
  *    and the DECIMAL cast yields NULL, which the `acc + x` fold then
  *    propagates to the end — every component is NULL (all components sum
  *    over all elements), so the kernel returns an all-null array;
  *  - a component SUM that leaves DECIMAL(28,9) range mid-fold: NULL from
  *    that element onward — sticky, order-dependent exactly like the
  *    fold, reproduced element-by-element on the BigDecimal slow path;
  *  - a vector SHORTER than `dim` (a truncated/broken encoder row): the
  *    fold's `element_at` past the array end yields NULL, which the
  *    sticky accumulator propagates to every component — so short
  *    vectors are degenerate (all-null output), same as a NULL element.
  *    Vectors LONGER than `dim` project their first `dim` elements, the
  *    exact elements the fold's `sequence(0, dim-1)` reads. */
object RpUtil {
  /** DECIMAL(28,9) range bound: |x| above this casts to NULL in Spark. */
  private val DecMax = new java.math.BigDecimal("9999999999999999999.999999999")
  /** Largest n·max|scaled| product for which the long fast path is exact. */
  private val ExactSumBound = (1L << 53) - 1

  def project(v: ArrayData, masks: Array[Long], outDim: Int, dim: Int): ArrayData = {
    // a vector shorter than dim is degenerate: the fold reads elements
    // 1..dim, and element_at past the end nulls the sticky accumulator
    if (v.numElements() < dim) return new GenericArrayData(new Array[Any](outDim))
    val n = dim
    val dec = new Array[java.math.BigDecimal](n)
    var degenerate = false
    var j = 0
    while (j < n && !degenerate) {
      if (v.isNullAt(j)) degenerate = true
      else {
        val x = v.getDouble(j)
        if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) degenerate = true
        else {
          val d = java.math.BigDecimal.valueOf(x)
            .setScale(9, java.math.RoundingMode.HALF_UP)
          if (d.abs().compareTo(DecMax) > 0) degenerate = true else dec(j) = d
        }
      }
      j += 1
    }
    if (degenerate) return new GenericArrayData(new Array[Any](outDim))
    // fast path iff every scaled element fits a long AND the worst-case
    // sum magnitude stays exactly representable in a double
    var fast = true
    var maxScaled = 0L
    j = 0
    while (j < n && fast) {
      val unscaled = dec(j).movePointRight(9).toBigIntegerExact
      if (unscaled.bitLength() > 62) fast = false
      else {
        val a = unscaled.abs().longValueExact()
        if (a > maxScaled) maxScaled = a
      }
      j += 1
    }
    if (fast && (n == 0 || maxScaled <= ExactSumBound / math.max(n, 1)))
      projectLongs(dec, masks, outDim, n, dim)
    else projectDecimals(dec, masks, outDim, n, dim)
  }

  private def projectLongs(dec: Array[java.math.BigDecimal], masks: Array[Long],
      outDim: Int, n: Int, dim: Int): ArrayData = {
    val words = (dim + 63) / 64
    val r = new Array[Long](n)
    var j = 0
    while (j < n) {
      r(j) = dec(j).movePointRight(9).longValueExact()
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

  /** Exact-decimal fallback for magnitudes past the long fast path; a sum
    * stepping outside DECIMAL(28,9) goes NULL and stays NULL, matching the
    * fold's overflow-to-null cast element by element. */
  private def projectDecimals(dec: Array[java.math.BigDecimal], masks: Array[Long],
      outDim: Int, n: Int, dim: Int): ArrayData = {
    val words = (dim + 63) / 64
    val out = new Array[Any](outDim)
    val sqrtK = math.sqrt(outDim.toDouble)
    var k = 0
    while (k < outDim) {
      var s = java.math.BigDecimal.ZERO
      var overflow = false
      var jj = 0
      while (jj < n && !overflow) {
        val bit = (masks(k * words + (jj >> 6)) >>> (jj & 63)) & 1L
        s = if (bit == 1L) s.add(dec(jj)) else s.subtract(dec(jj))
        if (s.abs().compareTo(DecMax) > 0) overflow = true
        jj += 1
      }
      if (!overflow)
        out(k) = java.math.BigDecimal.valueOf(s.doubleValue() / sqrtK)
          .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** Catalyst expression wrapping [[RpUtil.project]]; the sign-mask words
  * ride along as a plan reference object (not a literal array node), and
  * codegen emits one static call — the [[SignBits]] lesson applied. */
case class RpProject(child: Expression, masks: Array[Long], outDim: Int,
    dim: Int) extends UnaryExpression {

  // null components are real outputs: a NaN/Infinity/overflow element
  // nulls the fold exactly as the oracle's DECIMAL cast does
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

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
