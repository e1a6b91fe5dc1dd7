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

  /** B^i mod 2⁶⁴ for the combine's shift — bands cap probe lengths in
    * the hundreds, so a fixed table covers every caller; anything longer
    * falls back to the loop. */
  private val BPOW: Array[Long] = {
    val a = new Array[Long](1025)
    a(0) = 1L
    var i = 1
    while (i < a.length) { a(i) = a(i - 1) * B; i += 1 }
    a
  }

  private def bPow(m: Int): Long =
    if (m < BPOW.length) BPOW(m)
    else {
      // square-and-multiply for the tail beyond the table — O(log m), so
      // a cascade configured past the table size degrades gracefully
      // instead of paying an O(m) loop per candidate per probe round
      var r = BPOW(BPOW.length - 1)
      var e = m - (BPOW.length - 1)
      var base = B
      while (e > 0) {
        if ((e & 1) == 1) r *= base
        base *= base
        e >>= 1
      }
      r
    }

  /** Prefix polynomial hashes `P(k) = Σ_{i<k} tokenHash(i)·B^(k−1−i)
    * (mod 2⁶⁴)` for `k = 0..len` (len+1 entries, `P(0) = 0`) — the
    * COMBINABLE form of [[hashes]]: any window hash at any length
    * derives in O(1) as `H(p, n) = P(p+n) − P(p)·B^n` ([[combine]]),
    * bit-identical to the rolling kernel's value (same token hash, same
    * polynomial, same 2⁶⁴ wrap). One pass stores this array per
    * document and every probe length afterwards is a per-candidate
    * combine — the match-length bisection's per-round corpus passes
    * collapse to candidate-count work. */
  def prefixHashes(tokens: ArrayData): ArrayData = {
    val len = tokens.numElements()
    val out = new Array[Long](len + 1)
    var h = 0L
    var i = 0
    while (i < len) {
      val th = if (tokens.isNullAt(i))
        ShingleHashing.hashRange(Array.emptyByteArray, 0, 0)
      else {
        val b = tokens.getUTF8String(i).getBytes
        ShingleHashing.hashRange(b, 0, b.length)
      }
      h = h * B + th
      out(i + 1) = h
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  /** `H(pos, m)` from a [[prefixHashes]] array — `pos` is the callers'
    * 1-based window start; wrap-around Long arithmetic IS the mod-2⁶⁴
    * polynomial algebra (kept in the JVM: ANSI SQL would refuse the
    * overflow a rolling hash lives on).
    *
    * `graft_prefix_window_hash` is in the session catalog, so arbitrary
    * user SQL reaches here — validate the window against the prefix
    * array (len+1 entries for a len-token document) and fail loudly
    * rather than read out-of-bounds UnsafeArrayData memory, which
    * returns nondeterministic garbage. Internal bisection callers always
    * pass in-range (the candidate pool's tail-mark test implies it), so
    * the branch never fires on the hot path. */
  def combine(pre: ArrayData, pos: Long, m: Long): Long = {
    val len = pre.numElements() - 1L
    // subtraction-only bound: `pos + m` would wrap for adversarial longs
    // and slip past an addition-based check
    if (pos < 1L || pos > len || m < 1L || m > len - pos + 1L)
      throw new IllegalArgumentException(
        s"graft_prefix_window_hash: window (pos=$pos, m=$m) out of range for a " +
          s"$len-token document (need 1 <= pos and pos + m - 1 <= $len)")
    pre.getLong((pos + m - 1L).toInt) - pre.getLong((pos - 1L).toInt) * bPow(m.toInt)
  }

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

/** Catalyst expression wrapping [[WindowHashUtil.prefixHashes]] — the
  * one-pass combinable-hash kernel (`graft_prefix_hashes`). */
case class PrefixHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_prefix_hashes expects array<string>, got ${other.simpleString}")
  }

  override def prettyName: String = "graft_prefix_hashes"

  override protected def nullSafeEval(input: Any): Any =
    WindowHashUtil.prefixHashes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WindowHashUtil.prefixHashes($c)")

  override protected def withNewChildInternal(newChild: Expression): PrefixHashes =
    copy(child = newChild)
}

/** `graft_prefix_window_hash(pre, pos, m)` — O(1) window hash from a
  * stored [[PrefixHashes]] array (1-based `pos`, window length `m`);
  * resolvable inside SQL lambda bodies (the `graft_dot` pattern), which
  * is where the bisection's per-candidate probe runs. Values are
  * bit-identical to `graft_window_hashes(tokens, m)[pos]`; an
  * out-of-range (pos, m) raises a named error rather than reading
  * out-of-bounds array memory (internal bisection callers are always
  * in-range — the candidate pool's tail-mark test implies it). */
case class PrefixWindowHash(pre: Expression, pos: Expression, m: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def first: Expression = pre
  override def second: Expression = pos
  override def third: Expression = m

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (pre.dataType, pos.dataType, m.dataType) match {
      case (ArrayType(LongType, _), LongType, LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_prefix_window_hash expects (array<bigint>, bigint, bigint), got $other")
    }

  override def prettyName: String = "graft_prefix_window_hash"

  override protected def nullSafeEval(a: Any, p: Any, mm: Any): Any =
    WindowHashUtil.combine(a.asInstanceOf[ArrayData],
      p.asInstanceOf[Long], mm.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, p, mm) =>
      s"graft.functions.WindowHashUtil.combine($a, $p, $mm)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): PrefixWindowHash =
    copy(pre = newFirst, pos = newSecond, m = newThird)
}
