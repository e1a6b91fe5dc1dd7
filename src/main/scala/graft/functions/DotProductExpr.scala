package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, LongType}

/** Tight-loop dot product over two double arrays. Index-ordered summation —
  * bit-identical to the `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, +)`
  * fold it replaces, but as one codegen'd static call instead of an
  * interpreted higher-order-function chain per row. This is the inner loop
  * of every similarity operator (kNN, ANN, embedding near-dup). */
object VectorUtil {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  def sqDist(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { val d = a.getDouble(i) - b.getDouble(i); s += d * d; i += 1 }
    s
  }

  /** Symmetric scalar int8 quantization of a double vector against a
    * precomputed per-vector scale (max |x|): code_i = floor(x_i·127/scale
    * + 0.5), clamped to [−127, 127] — EXACTLY the
    * [[graft.operators.Similarity.int8QuantizeStats]] codec, packed as one
    * byte per dimension so a shuffle moves dim bytes instead of dim·8. */
  def i8Encode(a: ArrayData, scale: Double): Array[Byte] = {
    val n = a.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val c = if (scale == 0.0) 0.0
        else math.floor(a.getDouble(i) * 127.0 / scale + 0.5)
      out(i) = math.max(-127.0, math.min(127.0, c)).toByte
      i += 1
    }
    out
  }

  /** Integer dot product over two int8 code vectors (as binary columns) —
    * the coded pair test's inner loop: exact int arithmetic, no float
    * rounding, 8× narrower shuffle rows than the double-array dot. */
  def i8Dot(a: Array[Byte], b: Array[Byte]): Long = {
    val n = math.min(a.length, b.length)
    var s = 0L
    var i = 0
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }
}

/** Fraction of component-wise equal elements between two equal-length
  * bigint arrays — the MinHash signature-agreement Jaccard estimator,
  * as one codegen'd loop instead of an interpreted
  * `size(filter(zip_with(...)))` chain per candidate pair. */
object SigMatchUtil {
  def agreement(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    if (n == 0) return 0.0
    var eq = 0
    var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) eq += 1; i += 1 }
    eq.toDouble / n
  }
}

/** Catalyst expression for [[SigMatchUtil.agreement]]; SQL function
  * `graft_sig_match`, registered by [[graft.GraftExtensions]]. */
case class SigAgreement(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sig_match expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sig_match"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SigMatchUtil.agreement(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SigMatchUtil.agreement($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigAgreement =
    copy(left = newLeft, right = newRight)
}

/** Catalyst expression for [[VectorUtil.dot]]; SQL function `graft_dot`
  * (usable inside SQL lambdas, e.g. the LSH plane-signature transform),
  * registered by [[graft.GraftExtensions]]. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorUtil.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorUtil.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Catalyst expression for [[VectorUtil.i8Encode]]; SQL function
  * `graft_i8_encode(vector, scale) -> binary` — the int8 codec of the
  * coded SemDeDup pair test, registered by [[graft.GraftExtensions]]. */
case class I8Encode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_i8_encode expects (array<double>, double), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_i8_encode"

  override protected def nullSafeEval(a: Any, s: Any): Any =
    VectorUtil.i8Encode(a.asInstanceOf[ArrayData], s.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, s) => s"graft.functions.VectorUtil.i8Encode($a, $s)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): I8Encode =
    copy(left = newLeft, right = newRight)
}

/** Catalyst expression for [[VectorUtil.i8Dot]]; SQL function
  * `graft_i8_dot(binary, binary) -> bigint`, registered by
  * [[graft.GraftExtensions]]. */
case class I8Dot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_i8_dot expects (binary, binary), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_i8_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorUtil.i8Dot(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorUtil.i8Dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): I8Dot =
    copy(left = newLeft, right = newRight)
}

/** Catalyst expression for [[VectorUtil.sqDist]]; SQL function
  * `graft_sqdist` — the codegen'd k-means/PQ assignment kernel (the
  * `aggregate(zip_with(...))` fold it replaces is interpreted per row and
  * dominated PQ codebook training). */
case class SquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sqdist expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sqdist"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorUtil.sqDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorUtil.sqDist($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredDistance =
    copy(left = newLeft, right = newRight)
}
