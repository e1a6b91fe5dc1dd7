package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar text-normalization functions, expressed as pure built-in Catalyst
  * expression chains (no UDFs — everything stays inside WholeStageCodegen).
  *
  * Two tokenizer variants exist on purpose (SURVEY.md §7.3 point 4):
  *
  *  - [[standardizeToken]] replicates the reference normalizer
  *    (`/root/reference/src/WordCount.java:61-85`) bit-for-bit: Spark's
  *    `regexp_replace` uses java.util.regex, the same engine as the
  *    reference's `String.replaceAll`, so `\pP` classes match identically.
  *    Used by the flagship pipeline (smoke-checked).
  *  - [[portableNormalize]] is the oracle-portable variant spelled
  *    identically in Java regex (Spark) and RE2 (DuckDB) — used by every
  *    DuckDB-oracle-checked query, because `\pP` semantics differ across
  *    regex engines.
  */
object TextFunctions {

  /** HTML entities decoded by the reference, in its exact order
    * (`WordCount.java:65-71`). */
  val HtmlEntities: Seq[(String, String)] = Seq(
    "&amp;"  -> "&",
    "&lt;"   -> "<",
    "&gt;"   -> ">",
    "&quot;" -> "\"",
    "&apos;" -> "'",
    "&nbsp;" -> " ",
  )

  /** Reference normalizer chain (`WordCount.java:61-85`), order-faithful:
    * digit-word drop → entity decode → tag strip → edge punctuation trim →
    * lowercase. The caller must re-split on whitespace afterwards
    * (`&nbsp;` decode can introduce interior spaces) and drop empties —
    * see [[graft.operators.Tfidf.tokenize]].
    */
  def standardizeToken(t: Column): Column = {
    val noDigits = regexp_replace(t, ".*\\d.*", "")
    val decoded = HtmlEntities.foldLeft(noDigits) { case (c, (ent, repl)) =>
      replace(c, lit(ent), lit(repl))
    }
    val noTags = regexp_replace(decoded, "<[^>]+>", "")
    val trimmedHead = regexp_replace(noTags, "^[\\pP\\$\\+\\-\\=\\<\\>]+", "")
    val trimmed = regexp_replace(trimmedHead, "[\\pP\\$\\+\\-\\=\\<\\>]+$", "")
    lower(trimmed)
  }

  /** Oracle-portable normalizer (FIXTURES.md §4): lowercase then trim
    * non-`[a-z]` runs from both ends. The digit-token drop happens before
    * this (on the raw token), and empty results are filtered after.
    * DuckDB spelling: `regexp_replace(lower(t), '^[^a-z]+|[^a-z]+$', '', 'g')`.
    * Implemented by the native codegen'd [[PortableNormalize]] expression
    * (single byte-scan pass instead of a regex engine pass per token). */
  def portableNormalize(t: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(TrimNonAlpha.normalized(GraftColumnBridge.expression(t)))
  }

  /** Regex reference implementation of [[portableNormalize]] — the
    * specification the native expression is property-tested against. */
  def portableNormalizeRegex(t: Column): Column =
    regexp_replace(lower(t), "^[^a-z]+|[^a-z]+$", "")

  /** Stable content fingerprint: md5 over whitespace-collapsed, trimmed,
    * lowercased text. md5 is bit-identical across Spark and DuckDB, unlike
    * xxhash64, so it doubles as the oracle-checkable exact-dedup key.
    * For pure engine-internal keys prefer [[org.apache.spark.sql.functions.xxhash64]]
    * (cheaper, 64-bit, codegen'd).
    */
  def contentFingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")).cast("binary"))

  /** DEFLATE-compressed length of `text` in bytes (see [[DeflateLen]]).
    * Engine-internal (no oracle: DuckDB exposes no SQL deflate), fixed
    * `level` so the value is deterministic for a given zlib. */
  def deflateLen(text: Column, level: Int = 6): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(DeflateLen(GraftColumnBridge.expression(text), level))
  }

  /** One-pass surface statistics over raw text (see [[TextSurfaceStats]]):
    * a 9-field struct of counters replacing the per-signal regex passes in
    * the quality scorer and the Gopher rules. Reference the struct ONCE in
    * a projection and read fields off it — codegen subexpression
    * elimination keeps it a single scan. */
  def surfaceStats(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(TextSurfaceStats(GraftColumnBridge.expression(text)))
  }

  /** Small English stopword list used by the language-ID heuristic and the
    * quality scorer. Deliberately tiny and fixed so the DuckDB oracle can
    * spell the identical list. */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "be", "this", "are",
  )
}
