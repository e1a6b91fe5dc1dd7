package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass surface statistics over a document's raw text — the shared
  * kernel behind the quality scorer and the Gopher-style rule flags.
  *
  * The regex formulation those operators started from re-scans the full
  * text once per signal (four `regexp_replace` passes, a whitespace
  * `split`, and a 20-way stopword alternation with `\b` boundaries — the
  * dominant cost of a corpus-wide quality pass; at sf1 the quality scan
  * was the worst entry in the scale rehearsal at 11.5x). This expression
  * computes every signal in a single UTF-8 byte scan with no allocation
  * beyond the 9-field result row, and is property-tested byte-for-byte
  * against the original regex chain ([[graft.TextSurfaceStatsSpec]]) so
  * the DuckDB oracle rows are unchanged.
  *
  * Field semantics replicate the java.util.regex forms exactly:
  *
  *  - `n_chars`     = `length(text)` — codepoints (UTF-8 non-continuation
  *                    bytes).
  *  - `n_alpha`     = chars matching `[a-zA-Z]` (ASCII; multi-byte UTF-8
  *                    sequences never contain ASCII bytes).
  *  - `n_digit`     = chars matching `[0-9]`.
  *  - `n_punct`     = chars matching `[.,;:!?'"()-]`.
  *  - `n_ws`        = chars in `[ \t\n]` (the quality scorer's class —
  *                    deliberately narrower than Java `\s`).
  *  - `n_tokens`    = `size(split(text, "\\s+"))`: Java split with
  *                    limit=-1 keeps leading/trailing empties, so the
  *                    count is (maximal `\s` runs) + 1; Java `\s` is
  *                    `[ \t\n\x0B\f\r]`.
  *  - `sum_word_len`= total codepoints across split segments (= codepoints
  *                    not consumed by `\s` runs) — the Gopher mean-word-
  *                    length numerator.
  *  - `n_alpha_words` = split segments containing at least one ASCII
  *                    letter (`w rlike "[a-zA-Z]"`).
  *  - `n_stop_hits` = matches of `\b(the|a|...)\b` over
  *                    [[TextFunctions.EnglishStopwords]]. Java's `\b` is
  *                    NOT `\w`-based: without flags its word predicate is
  *                    `ch == '_' || Character.isLetterOrDigit(ch)` —
  *                    Unicode-aware (java.util.regex `Pattern.Bound`), so
  *                    `theé` is ONE run and does not match. Because every
  *                    stopword is pure lowercase ASCII and a run has no
  *                    interior boundaries, a match is exactly a maximal
  *                    boundary-word-char run equal (case-sensitively) to a
  *                    stopword.
  */
object TextStatsUtil {

  /** Stopwords packed big-endian into an int (all are ≤ 4 ASCII bytes;
    * ASCII bytes are nonzero, so packs of different lengths cannot
    * collide). Sorted for binary search. */
  private val StopPacked: Array[Int] = {
    val packs = TextFunctions.EnglishStopwords.map { w =>
      require(w.length <= 4 && w.forall(c => c >= 'a' && c <= 'z'),
        s"stopword '$w' not packable — update TextStatsUtil")
      w.foldLeft(0)((a, c) => (a << 8) | (c & 0xFF))
    }
    packs.sorted.toArray
  }

  @inline private def isPunct(cp: Int): Boolean = cp match {
    case '.' | ',' | ';' | ':' | '!' | '?' | '\'' | '"' | '(' | ')' | '-' => true
    case _ => false
  }

  def compute(s: UTF8String): InternalRow = {
    val nBytes = s.numBytes()
    var nChars = 0L; var alpha = 0L; var digit = 0L; var punct = 0L; var ws3 = 0L
    var wsRuns = 0L; var sumWordLen = 0L; var alphaWords = 0L; var stopHits = 0L
    var prevWs = false       // previous char was Java-\s (run tracking)
    var segHasAlpha = false  // current split segment has an ASCII letter
    var wordLen = 0          // current boundary-word run length in chars
    var runAscii = true      // run so far is pure ASCII (stopword candidate)
    var packed = 0           // first ≤4 bytes of the current run
    var i = 0
    while (i < nBytes) {
      // decode one codepoint (UTF8String content is valid UTF-8; clamp
      // defensively so a torn tail can't read past the buffer)
      val b0 = s.getByte(i)
      var cp = 0
      var clen = 1
      if (b0 >= 0) cp = b0
      else if ((b0 & 0xE0) == 0xC0) { cp = b0 & 0x1F; clen = 2 }
      else if ((b0 & 0xF0) == 0xE0) { cp = b0 & 0x0F; clen = 3 }
      else { cp = b0 & 0x07; clen = 4 }
      if (i + clen > nBytes) clen = nBytes - i
      var k = 1
      while (k < clen) { cp = (cp << 6) | (s.getByte(i + k) & 0x3F); k += 1 }
      nChars += 1
      val jws = cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
        cp == '\f' || cp == '\r'
      if (jws) {
        if (!prevWs) {
          wsRuns += 1
          if (segHasAlpha) alphaWords += 1
          segHasAlpha = false
        }
        prevWs = true
        if (cp == ' ' || cp == '\t' || cp == '\n') ws3 += 1
      } else {
        prevWs = false
        sumWordLen += 1
        if ((cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z')) {
          alpha += 1; segHasAlpha = true
        } else if (cp >= '0' && cp <= '9') digit += 1
        else if (isPunct(cp)) punct += 1
      }
      // Java \b word predicate: '_' or Unicode letter-or-digit
      if (cp == '_' || Character.isLetterOrDigit(cp)) {
        wordLen += 1
        if (cp >= 128) runAscii = false
        else if (wordLen <= 4) packed = (packed << 8) | cp
      } else if (wordLen > 0) {
        if (runAscii && wordLen <= 4 &&
          java.util.Arrays.binarySearch(StopPacked, packed) >= 0) stopHits += 1
        wordLen = 0; packed = 0; runAscii = true
      }
      i += clen
    }
    if (wordLen > 0 && runAscii && wordLen <= 4 &&
      java.util.Arrays.binarySearch(StopPacked, packed) >= 0) stopHits += 1
    if (!prevWs && segHasAlpha) alphaWords += 1
    new GenericInternalRow(Array[Any](
      nChars, alpha, digit, punct, ws3, wsRuns + 1L, sumWordLen, alphaWords,
      stopHits))
  }
}

/** Catalyst expression wrapping [[TextStatsUtil.compute]]; codegen emits a
  * direct static call, so the scan stays inside WholeStageCodegen. SQL
  * surface: `graft_text_stats(text)` via [[graft.GraftExtensions]]. */
case class TextSurfaceStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextSurfaceStats.schema

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_text_stats expects a string, got ${child.dataType.simpleString}")

  override def prettyName: String = "graft_text_stats"

  override protected def nullSafeEval(input: Any): Any =
    TextStatsUtil.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatsUtil.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TextSurfaceStats =
    copy(child = newChild)
}

object TextSurfaceStats {
  val schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_digit", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_ws", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("sum_word_len", LongType, nullable = false),
    StructField("n_alpha_words", LongType, nullable = false),
    StructField("n_stop_hits", LongType, nullable = false)))
}
