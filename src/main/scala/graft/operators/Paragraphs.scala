package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Paragraph-level corpus deduplication — the CCNet/ RefinedWeb-style
  * middle ground between document-exact dedup ([[Dedup.exact]]) and
  * substring dedup ([[ExactSubstr]]): the corpus is cut into paragraphs,
  * every paragraph CONTENT keeps exactly its first occurrence corpus-wide
  * (min `(doc_id, para_idx)`), and later occurrences are stripped out of
  * their documents while the surrounding novel text survives. This is the
  * filter that removes boilerplate (headers, footers, license blocks,
  * navigation chrome) which document-level dedup can't touch — the
  * wrapping documents differ — and which is cheaper than the rolling-hash
  * substring index when paragraph granularity is enough.
  *
  * Paragraph model: the fixture corpus is single-line text, so the
  * paragraph cut is FIXED-WIDTH — `paraTokens` consecutive raw whitespace
  * tokens per paragraph, last one ragged (a real corpus would split on
  * blank lines first and apply the same operators; the dedup/strip logic
  * is agnostic to how `(doc_id, para_idx, fp)` rows were cut). Tokens are
  * the RAW `split(text, "\\s+")` stream — paragraphs must round-trip
  * verbatim content, so no normalization (unlike the tf-idf tokenizer).
  *
  * Scale shape (the 100 TB contract):
  *  - paragraph rows carry a 16-byte md5 fingerprint, doc_id, and index —
  *    paragraph TEXT never shuffles; the keeper election is one
  *    `min(struct(doc_id, para_idx))` aggregate keyed by fingerprint
  *    (narrow rows, collision-bound like every hash-keyed dedup here);
  *  - the strip touches only documents that LOST at least one paragraph:
  *    loser keys aggregate to a per-doc int array (narrow), inner-join the
  *    corpus for the rewrite, and untouched documents pass through via
  *    anti-join with their text verbatim — corpus text moves only for the
  *    duplicated fraction;
  *  - the boilerplate report is a bounded heap top-k, never a full sort.
  */
object Paragraphs {

  /** Raw whitespace token array — Java split semantics (keeps leading
    * empties; `\s` = `[ \t\n\x0B\f\r]`), spelled identically in the
    * DuckDB oracle via `regexp_split_to_array`. */
  private def rawToks = split(col("text"), "\\s+")

  /** Paragraph rows `(doc_id[, carry...], para_idx, n_paras, fp)` — the
    * corpus cut into `paraTokens`-token blocks, each fingerprinted with
    * the portable md5 of its single-space re-joined content. Text does
    * not leave this projection. */
  def paragraphs(docs: DataFrame, paraTokens: Int = 16,
      carry: Seq[String] = Nil): DataFrame = {
    require(paraTokens > 0, s"paraTokens must be positive, got $paraTokens")
    val p = paraTokens
    docs.select((col("doc_id") +: carry.map(col)) :+ rawToks.as("a"): _*)
      .withColumn("n_paras",
        ceil(size(col("a")) / lit(p.toDouble)).cast("long"))
      .select((col("doc_id") +: carry.map(col)) ++ Seq(col("n_paras"),
        posexplode(expr(
          s"transform(sequence(0, n_paras - 1), i -> array_join(slice(a, CAST(i * $p + 1 AS INT), $p), ' '))"))
          .as(Seq("para_idx", "para"))): _*)
      .select((col("doc_id") +: carry.map(col)) ++ Seq(
        col("para_idx").cast("long").as("para_idx"), col("n_paras"),
        md5(col("para").cast("binary")).as("fp")): _*)
  }

  /** Per-block 64-bit hash array of `text` — xxhash64 over each
    * paragraph's single-space re-join. This is the SHARED batch/stream
    * spelling for the ingest Bloom gate
    * ([[graft.streaming.Streams.streamingParagraphFlag]]): the corpus
    * index and the arriving row must cut, join, and hash identically or
    * the Bloom silently loses its no-false-negative guarantee. */
  def paragraphHashesExpr(paraTokens: Int): org.apache.spark.sql.Column = {
    require(paraTokens > 0, s"paraTokens must be positive, got $paraTokens")
    val p = paraTokens
    expr(
      s"transform(sequence(0, CAST(ceil(size(split(text, '\\\\s+')) / $p.0) AS INT) - 1), " +
        s"i -> xxhash64(array_join(slice(split(text, '\\\\s+'), CAST(i * $p + 1 AS INT), $p), ' ')))")
  }

  /** First-occurrence keeper per distinct paragraph content: the minimum
    * `(doc_id, para_idx)` over its occurrences — deterministic,
    * engine-portable, and the convention every dedup operator here uses. */
  private def keepers(paras: DataFrame): DataFrame =
    paras.groupBy("fp")
      .agg(min(struct(col("doc_id").as("d"), col("para_idx").as("p"))).as("k"))

  /** LOSER occurrences `(doc_id[, carry...], para_idx)`: every paragraph
    * occurrence whose content's first occurrence is elsewhere. */
  def duplicateParagraphs(paras: DataFrame, carry: Seq[String] = Nil): DataFrame =
    paras.join(keepers(paras.select("fp", "doc_id", "para_idx")), "fp")
      .where(col("doc_id") =!= col("k.d") || col("para_idx") =!= col("k.p"))
      .select((col("doc_id") +: carry.map(col)) :+ col("para_idx"): _*)

  /** The dedup STRIP: drop every repeated paragraph occurrence, keep the
    * rest of each document. Output per input document: `(doc_id, source,
    * n_paras, n_dropped, text_clean)` — documents losing nothing pass
    * through with their text verbatim; rewritten documents re-join kept
    * tokens with single spaces; a fully-duplicated document survives as a
    * row with empty `text_clean` (callers decide whether to drop it). */
  def paragraphDedupStrip(docs: DataFrame, paraTokens: Int = 16): DataFrame = {
    val p = paraTokens
    val paras = paragraphs(docs, p)
    val dropped = duplicateParagraphs(paras)
      .groupBy("doc_id").agg(collect_set(col("para_idx")).as("dropped"))
    val nParas = ceil(size(rawToks) / lit(p.toDouble)).cast("long").as("n_paras")
    // rewrite only the touched documents: kept tokens = those whose
    // 0-based block index is not in the dropped set, one map pass
    val touched = docs.join(dropped, "doc_id")
      .select(col("doc_id"), col("source"), nParas,
        size(col("dropped")).cast("long").as("n_dropped"),
        expr(s"array_join(filter(split(text, '\\\\s+'), (t, i) -> " +
          s"NOT array_contains(dropped, CAST(i div $p AS BIGINT))), ' ')")
          .as("text_clean"))
    val untouched = docs.join(dropped.select("doc_id"), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"), nParas,
        lit(0L).as("n_dropped"), col("text").as("text_clean"))
    touched.unionByName(untouched)
  }

  /** The paragraph KEEPER STORE `(fp, doc_id, para_idx)` — one row per
    * distinct paragraph content with its first corpus occurrence; the
    * stored index [[paragraphDedupIncremental]] maintains. Narrow
    * (16-byte key + position), collision-bound like every hash-keyed
    * store here. */
  def paragraphKeepers(docs: DataFrame, paraTokens: Int = 16): DataFrame =
    keepers(paragraphs(docs, paraTokens).select("fp", "doc_id", "para_idx"))
      .select(col("fp"), col("k.d").as("doc_id"), col("k.p").as("para_idx"))

  /** INCREMENTAL paragraph-dedup maintenance for an append-only corpus —
    * the paragraph-granularity member of the incremental index family
    * (document level: [[Dedup]] incremental; window level:
    * [[ExactSubstr]] merges). Keeper convention is FIRST-ARRIVED — the
    * streaming ingest store's semantics, deliberately NOT a corpus-min
    * re-election: a stored keeper never moves, so strip outputs written
    * for earlier batches are IMMUTABLE and an append touches ONLY the new
    * batch. (Re-electing by corpus-min would let a new low-id document
    * steal keeperships and retroactively strip ALREADY-SERVED text — the
    * exact-substring index must re-verify occurrences because occ counts
    * change meaning; a keeper store does not.)
    *
    * Returns `(mergedKeepers, strippedNew)`:
    *  - mergedKeepers = `storedKeepers` ∪ the batch-first occurrences of
    *    never-stored fingerprints;
    *  - strippedNew = the strip output for the NEW documents only — a new
    *    paragraph drops iff its content is stored, or an earlier batch
    *    row (min `(doc_id, para_idx)` within the batch) owns it.
    *
    * Scale shape: the batch's fingerprints probe the store with one
    * fp-keyed join of narrow rows; old corpus text never moves — only new
    * documents rewrite, through the same shared strip tail as the batch
    * dedup. */
  def paragraphDedupIncremental(storedKeepers: DataFrame, newDocs: DataFrame,
      paraTokens: Int = 16): (DataFrame, DataFrame) = {
    require(paraTokens > 0, s"paraTokens must be positive, got $paraTokens")
    paragraphDedupIncrementalBy(storedKeepers, newDocs,
      fixedParas(paraTokens), " ")
  }

  /** [[paragraphDedupIncremental]] over REAL (delimiter-cut) paragraph
    * boundaries — same FIRST-ARRIVED keeper-store semantics, same shared
    * strip tail; only the cut differs (the store must have been built
    * with the SAME `delim`, or content keys can't match —
    * [[paragraphKeepersByDelimiter]] is the matching builder). */
  def paragraphDedupIncrementalByDelimiter(storedKeepers: DataFrame,
      newDocs: DataFrame, delim: String,
      joiner: String = "\n\n"): (DataFrame, DataFrame) = {
    require(delim.nonEmpty, "delimiter regex must be non-empty")
    paragraphDedupIncrementalBy(storedKeepers, newDocs, delimParas(delim), joiner)
  }

  /** The cut-agnostic incremental core both registered cuts share. */
  private def paragraphDedupIncrementalBy(storedKeepers: DataFrame,
      newDocs: DataFrame, parr: Column,
      joiner: String): (DataFrame, DataFrame) = {
    val paras = parasFromArray(newDocs, parr, Nil)
    val storedFps = storedKeepers.select("fp")
    val batchFirst = keepers(paras.select("fp", "doc_id", "para_idx"))
    val droppedOccs = paras
      .join(storedFps.withColumn("stored", lit(1L)), Seq("fp"), "left")
      .join(batchFirst, "fp")
      .where(col("stored").isNotNull ||
        col("doc_id") =!= col("k.d") || col("para_idx") =!= col("k.p"))
      .select("doc_id", "para_idx")
    val dropped = droppedOccs.groupBy("doc_id")
      .agg(collect_set(col("para_idx")).as("dropped"))
    val newKeepers = batchFirst.join(storedFps, Seq("fp"), "left_anti")
      .select(col("fp"), col("k.d").as("doc_id"), col("k.p").as("para_idx"))
    val merged = storedKeepers.select("fp", "doc_id", "para_idx")
      .unionByName(newKeepers)
    (merged, stripByDropped(newDocs, parr, joiner, dropped))
  }

  /** Paragraph rows `(doc_id, para_idx, n_paras, fp)` over a DELIMITER
    * cut — the occurrence table [[paragraphKeepersByDelimiter]] elects
    * keepers from, public so audit consumers (the refresh-impact family)
    * can probe a stored keeper set with a batch's occurrences without
    * re-deriving the cut. Same spelling as the keeper builder: content
    * keys can only match when cut + hash agree. */
  def paragraphsByDelimiter(docs: DataFrame, delim: String): DataFrame = {
    require(delim.nonEmpty, "delimiter regex must be non-empty")
    parasFromArray(docs, delimParas(delim), Nil)
  }

  /** The delimiter-cut keeper store — [[paragraphKeepers]]' sibling for
    * [[paragraphDedupIncrementalByDelimiter]]. */
  def paragraphKeepersByDelimiter(docs: DataFrame, delim: String): DataFrame = {
    require(delim.nonEmpty, "delimiter regex must be non-empty")
    keepers(parasFromArray(docs, delimParas(delim), Nil)
        .select("fp", "doc_id", "para_idx"))
      .select(col("fp"), col("k.d").as("doc_id"), col("k.p").as("para_idx"))
  }

  /** Per-source duplication report `(source, n_paras, n_dup, dup_rate)` —
    * how much of each source is corpus-repeated boilerplate at paragraph
    * granularity. One pass over the paragraph rows: the keeper join marks
    * each occurrence, the aggregate is narrow. */
  def paragraphDupStats(docs: DataFrame, paraTokens: Int = 16): DataFrame =
    dupStatsFrom(paragraphs(docs, paraTokens, carry = Seq("source")))

  /** Per-DOCUMENT duplication profile `(doc_id, n_paras, n_dup)` over the
    * whole corpus — every document appears (each has ≥ 1 paragraph, the
    * empty-text block included), `n_dup` counting its paragraph
    * occurrences whose content first appeared elsewhere. The redundancy
    * input to [[Dedup.softDedupWeights]]; same narrow fp-keyed keeper
    * election as the strip, text never shuffles. */
  def paragraphDupPerDoc(docs: DataFrame, paraTokens: Int = 16): DataFrame = {
    val paras = paragraphs(docs, paraTokens)
    paras.join(keepers(paras.select("fp", "doc_id", "para_idx")), "fp")
      .select(col("doc_id"), col("n_paras"),
        (col("doc_id") =!= col("k.d") || col("para_idx") =!= col("k.p"))
          .cast("long").as("dup"))
      .groupBy("doc_id", "n_paras").agg(sum("dup").as("n_dup"))
  }

  /** Per-source duplication report over any paragraph-row frame carrying
    * `source` — shared by the fixed-width and delimiter cuts. */
  private def dupStatsFrom(paras: DataFrame): DataFrame =
    paras.join(keepers(paras.select("fp", "doc_id", "para_idx")), "fp")
      .select(col("source"),
        (col("doc_id") =!= col("k.d") || col("para_idx") =!= col("k.p"))
          .cast("long").as("dup"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_paras"), sum("dup").as("n_dup"))
      .select(col("source"), col("n_paras"), col("n_dup"),
        round(col("n_dup").cast("double") / col("n_paras"), 9).as("dup_rate"))
      .orderBy("source")

  // --------------------------------------------------------------------
  // Delimiter-cut paragraphs (real paragraph boundaries) + paragraph-
  // level decontamination. The dedup/strip tail is IDENTICAL to the
  // fixed-width family — only the cut differs — so both route through
  // the shared array-cut internals below.
  // --------------------------------------------------------------------

  /** Paragraph ARRAY cut by a delimiter regex (blank line `\n{2,}`,
    * single newline `\n`, or any separator pattern a corpus uses).
    * Empty paragraphs — leading/trailing/adjacent delimiters — carry no
    * content and are filtered at cut time, so they can neither "dedup"
    * against each other nor survive a rewrite. */
  private def delimParas(delim: String): Column =
    filter(split(col("text"), delim), (p: Column) => p =!= lit(""))

  /** Fixed-width paragraph ARRAY — the same `paraTokens`-token blocks as
    * [[paragraphs]], as one array column (the generic-cut spelling the
    * decontaminator shares with the delimiter family). */
  private def fixedParas(p: Int): Column = expr(
    s"transform(sequence(0, CAST(ceil(size(split(text, '\\\\s+')) / $p.0) AS INT) - 1), " +
      s"i -> array_join(slice(split(text, '\\\\s+'), CAST(i * $p + 1 AS INT), $p), ' '))")

  /** Paragraph rows `(doc_id[, carry...], para_idx, n_paras, fp)` from an
    * arbitrary paragraph-array cut — text never leaves the projection,
    * only the 16-byte md5 content key rides the shuffle. */
  private def parasFromArray(docs: DataFrame, parr: Column,
      carry: Seq[String]): DataFrame =
    docs.select((col("doc_id") +: carry.map(col)) :+ parr.as("ps"): _*)
      .select((col("doc_id") +: carry.map(col)) ++ Seq(
        size(col("ps")).cast("long").as("n_paras"),
        posexplode(col("ps")).as(Seq("para_idx", "para"))): _*)
      .select((col("doc_id") +: carry.map(col)) ++ Seq(
        col("para_idx").cast("long").as("para_idx"), col("n_paras"),
        md5(col("para").cast("binary")).as("fp")): _*)

  /** Shared rewrite: drop each document's `dropped` paragraph indexes
    * (a per-doc long array, the only state that joins the corpus) and
    * re-join the kept paragraphs with `joiner`; documents losing nothing
    * pass through with their text VERBATIM (original delimiters intact —
    * only touched documents normalize to the canonical joiner). */
  private def stripByDropped(docs: DataFrame, parr: Column, joiner: String,
      dropped: DataFrame): DataFrame = {
    val nParas = size(parr).cast("long").as("n_paras")
    val touched = docs.join(dropped, "doc_id")
      .select(col("doc_id"), col("source"), nParas,
        size(col("dropped")).cast("long").as("n_dropped"),
        array_join(filter(parr, (_: Column, i: Column) =>
          not(array_contains(col("dropped"), i.cast("long")))), joiner)
          .as("text_clean"))
    val untouched = docs.join(dropped.select("doc_id"), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"), nParas,
        lit(0L).as("n_dropped"), col("text").as("text_clean"))
    touched.unionByName(untouched)
  }

  /** Paragraph rows over REAL paragraph boundaries: `delim` is the
    * separator regex (`\n{2,}` for blank-line paragraphs, `\n` for
    * line-granularity). Same output shape as [[paragraphs]] — every
    * downstream operator (keeper election, dup stats, strip) is cut-
    * agnostic. */
  def paragraphsByDelimiter(docs: DataFrame, delim: String,
      carry: Seq[String] = Nil): DataFrame = {
    require(delim.nonEmpty, "delimiter regex must be non-empty")
    parasFromArray(docs, delimParas(delim), carry)
  }

  /** [[paragraphDedupStrip]] over delimiter-cut paragraphs: every
    * paragraph content keeps its corpus-first occurrence, later
    * occurrences strip, and rewritten documents re-join with `joiner`
    * (the canonical paragraph separator — `"\n\n"` restores blank-line
    * form; untouched documents keep their original text verbatim). */
  def paragraphDedupStripByDelimiter(docs: DataFrame, delim: String,
      joiner: String = "\n\n"): DataFrame = {
    require(delim.nonEmpty, "delimiter regex must be non-empty")
    val parr = delimParas(delim)
    val dropped = duplicateParagraphs(parasFromArray(docs, parr, Nil))
      .groupBy("doc_id").agg(collect_set(col("para_idx")).as("dropped"))
    stripByDropped(docs, parr, joiner, dropped)
  }

  /** [[paragraphDupStats]] over delimiter-cut paragraphs. */
  def paragraphDupStatsByDelimiter(docs: DataFrame, delim: String): DataFrame =
    dupStatsFrom(parasFromArray(docs, delimParas(delim), Seq("source")))

  /** WITHIN-DOCUMENT paragraph dedup — the CONSERVATIVE paragraph-dedup
    * policy: each document keeps the FIRST occurrence of every distinct
    * paragraph it contains and drops only its OWN later repeats (the
    * same nav bar / footer repeating inside one crawled page), while
    * cross-document sharing — legitimate quotes, citations, license
    * headers a curation owner may want every page to keep — is left
    * entirely alone. The corpus-wide strip
    * ([[paragraphDedupStripByDelimiter]]) subsumes this cut (its keeper
    * is the corpus-first `(doc_id, para_idx)`, so a doc's own later
    * repeats strip there too); this is the policy knob BETWEEN no
    * paragraph dedup and the corpus-wide cut, and composing it before
    * the corpus pass yields exactly the corpus pass (spec-pinned
    * equivalence), so the two-stage spelling is always safe.
    *
    * Scale shape: ZERO shuffle — the keeper test is per-row array work
    * (first-occurrence index via `array_position`, exact string equality
    * inside the row, so not even a hash collision is possible), and
    * untouched documents keep their text verbatim via a map-side CASE.
    * The one spelling every engine replays: keep `ps[i]` iff
    * `array_position(ps, ps[i]) == i+1`. */
  def paragraphDedupStripWithinDoc(docs: DataFrame, delim: String,
      joiner: String = "\n\n"): DataFrame = {
    require(delim.nonEmpty, "delimiter regex must be non-empty")
    stripWithinDocBy(docs, delimParas(delim), joiner)
  }

  /** [[paragraphDedupStripWithinDoc]] over the fixed-width cut (the
    * single-line fixture's paragraph model); rewrites re-join with single
    * spaces like the rest of the fixed-width family. */
  def paragraphDedupStripWithinDocFixed(docs: DataFrame,
      paraTokens: Int): DataFrame = {
    require(paraTokens > 0, s"paraTokens must be positive, got $paraTokens")
    stripWithinDocBy(docs, fixedParas(paraTokens), " ")
  }

  private def stripWithinDocBy(docs: DataFrame, parr: Column,
      joiner: String): DataFrame =
    docs
      .select(col("doc_id"), col("source"), col("text"), parr.as("ps"))
      .withColumn("kept", expr(
        "filter(ps, (x, i) -> array_position(ps, x) = CAST(i + 1 AS BIGINT))"))
      .select(col("doc_id"), col("source"),
        size(col("ps")).cast("long").as("n_paras"),
        (size(col("ps")) - size(col("kept"))).cast("long").as("n_dropped"),
        when(size(col("kept")) === size(col("ps")), col("text"))
          .otherwise(array_join(col("kept"), joiner)).as("text_clean"))

  /** Paragraph-level DECONTAMINATION: strip every corpus paragraph whose
    * content appears anywhere in the benchmark suite — the third
    * granularity of the benchmark-leak family (doc-drop:
    * [[Curation.decontaminate]]; token-span:
    * [[Curation.decontaminateStripSpans]]; paragraph: here). The
    * benchmark side reduces to its DISTINCT paragraph fingerprints — a
    * bounded eval-suite artifact, broadcast — so the corpus scan is one
    * map-side semi-join; only contaminated documents rewrite. */
  def paragraphDecontaminateBy(corpus: DataFrame, parr: Column,
      joiner: String, benchFps: DataFrame): DataFrame = {
    val paras = parasFromArray(corpus, parr, Nil)
    val dropped = paras
      .join(broadcast(benchFps.select("fp").distinct()), "fp")
      .groupBy("doc_id").agg(collect_set(col("para_idx")).as("dropped"))
    stripByDropped(corpus, parr, joiner, dropped)
  }

  /** Fixed-width paragraph decontamination — corpus and benchmark cut
    * with the same `paraTokens` blocks (the cuts MUST match or leaked
    * text hides across block boundaries; for sub-block leakage use the
    * token-span family). */
  def paragraphDecontaminate(corpus: DataFrame, bench: DataFrame,
      paraTokens: Int = 16): DataFrame = {
    require(paraTokens > 0, s"paraTokens must be positive, got $paraTokens")
    paragraphDecontaminateBy(corpus, fixedParas(paraTokens), " ",
      paragraphs(bench, paraTokens).select("fp"))
  }

  /** Delimiter-cut paragraph decontamination. */
  def paragraphDecontaminateByDelimiter(corpus: DataFrame, bench: DataFrame,
      delim: String, joiner: String = "\n\n"): DataFrame = {
    require(delim.nonEmpty, "delimiter regex must be non-empty")
    paragraphDecontaminateBy(corpus, delimParas(delim), joiner,
      parasFromArray(bench, delimParas(delim), Nil).select("fp"))
  }

  /** The boilerplate worklist: the `k` most-repeated paragraph contents
    * `(fp, n_occurrences, first_doc, first_para_idx)` — what a curation
    * owner reads to decide whether a template should be stripped at the
    * source. Bounded: heap top-k on the occurrence count (TakeOrdered,
    * no full sort), deterministic ties by fingerprint. */
  def boilerplateParagraphs(docs: DataFrame, paraTokens: Int = 16,
      k: Int = 50): DataFrame =
    paragraphs(docs, paraTokens)
      .groupBy("fp")
      .agg(count(lit(1)).as("n_occurrences"),
        min(struct(col("doc_id").as("d"), col("para_idx").as("p"))).as("kmin"))
      .where(col("n_occurrences") > 1L)
      .select(col("fp"), col("n_occurrences"),
        col("kmin.d").as("first_doc"), col("kmin.p").as("first_para_idx"))
      .orderBy(col("n_occurrences").desc, col("fp").asc)
      .limit(k)
}
