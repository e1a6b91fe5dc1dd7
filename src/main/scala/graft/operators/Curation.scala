package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators for a training-data pipeline: benchmark
  * decontamination, repetition-based quality rules, and corpus-wide
  * boilerplate detection. All three are oracle-checkable (pure relational +
  * higher-order-function plans) and shuffle only narrow derived rows —
  * never full text.
  *
  * Reference scope note: the reference engine (NZJ-Jimmy/TF-IDF_MapReduce)
  * stops at TF-IDF; these extend the same tokenize→aggregate machinery to
  * the curation steps an LLM data pipeline runs beside it.
  */
object Curation {

  /** Position-preserving portable token array (same chain as
    * [[Dedup.ngramJaccardExact]], spelled identically in the DuckDB
    * oracle). */
  private[operators] def tokenArray = expr(
    "filter(transform(filter(split(text, '\\\\s+'), t -> NOT t RLIKE '[0-9]'), " +
      "t -> regexp_replace(lower(t), '^[^a-z]+|[^a-z]+$', '')), t -> t <> '')")

  /** Distinct token `n`-grams per document: (doc_id, gram). Dedup happens
    * in the ARRAY domain (`array_distinct` inside the row) — per-doc
    * distinct equals global (doc_id, gram) distinct, so this is the same
    * result as explode-then-distinct WITHOUT the corpus-wide string
    * shuffle that a post-explode `.distinct()` would plan. */
  private def gramRows(docs: DataFrame, n: Int): DataFrame =
    gramRowsOver(docs.select(col("doc_id"), tokenArray.as("a")), n)

  /** [[gramRows]] over prebuilt token arrays `(doc_id, tokens)` — the
    * shared token-array corpus asset; gram slicing is identical, the
    * regex-heavy tokenize is skipped. */
  private[graft] def gramRowsFromTokens(toks: DataFrame, n: Int): DataFrame =
    gramRowsOver(toks.select(col("doc_id"), col("tokens").as("a")), n)

  /** The portable token-array expression over raw `text`, for callers
    * outside this package (the streaming gate binds it to a column once,
    * then grams over that column). */
  private[graft] def textTokenArray: Column = tokenArray

  /** Per-row distinct `n`-gram ARRAY over a bound token-array column `a`
    * (no explode, no shuffle) — the array-domain spelling of
    * [[gramRows]]' slicing that the stateless streaming decontamination
    * gate maps over each arriving document. */
  private[graft] def gramArrayOf(a: Column, n: Int): Column =
    when(size(a) >= n,
      array_distinct(transform(sequence(lit(1), size(a) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(a, i + lit(j))): _*))))
      .otherwise(array().cast("array<string>"))

  /** Benchmark gram Bloom bitset (driver-collected literal — the
    * trained-model broadcast idiom of [[decontaminateBloom]], shared with
    * the streaming gate). Null when the benchmark is empty. */
  private[graft] def benchBloomBytes(benchToks: DataFrame, n: Int,
      expectedItems: Long): Array[Byte] =
    gramRowsFromTokens(benchToks, n).select("gram").distinct()
      .agg(expr(s"graft_bloom_agg(xxhash64(gram), ${expectedItems}L)").as("bf"))
      .head().getAs[Array[Byte]](0)

  private def gramRowsOver(rows: DataFrame, n: Int): DataFrame = {
    val mk = (1 to n).map(j => s"element_at(a, i + ${j - 1})").mkString("concat_ws(' ', ", ", ", ")")
    rows
      .where(size(col("a")) >= n)
      .select(col("doc_id"),
        explode(expr(
          s"array_distinct(transform(sequence(1, size(a) - ${n - 1}), i -> $mk))")).as("gram"))
  }

  /** Benchmark decontamination: per training document, the count and
    * fraction of its distinct `n`-grams that also appear in ANY benchmark
    * document — the standard "eval-set leakage" gate run before training.
    *
    * Scale shape: the benchmark side is small by nature (an eval set), so
    * its distinct grams BROADCAST; the training side then counts hits
    * map-side (partial agg before the one per-doc exchange). The corpus is
    * never shuffled by gram.
    *
    * `n` = 3 here because the synthetic corpus' vocabulary is tiny; real
    * pipelines use 8-13-gram windows — only the constant changes. */
  def decontaminate(
      training: DataFrame,
      benchmark: DataFrame,
      n: Int = 3,
      flagRatio: Double = 0.05): DataFrame =
    decontaminateGrams(gramRows(training, n),
      gramRows(benchmark, n).select("gram").distinct(), flagRatio)

  /** [[decontaminate]] with both sides supplied as prebuilt token arrays
    * `(doc_id, tokens)` — e.g. filtered slices of the shared token-array
    * corpus asset; neither side re-tokenizes. */
  def decontaminateFromTokens(
      trainToks: DataFrame,
      benchToks: DataFrame,
      n: Int = 3,
      flagRatio: Double = 0.05): DataFrame =
    decontaminateGrams(gramRowsFromTokens(trainToks, n),
      gramRowsFromTokens(benchToks, n).select("gram").distinct(), flagRatio)

  /** [[decontaminateFromTokens]] with the benchmark side supplied as a
    * STORED gram set `(gram)` — the incremental-maintenance shape: a
    * snapshot's benchmark grams persist as an index, an append batch
    * unions in only its own new benchmark grams, and the arriving train
    * documents score against the merged store at O(batch). Duplicate
    * grams across store and update are deduplicated here (the overlap
    * counter is a sum of hits — a doubled gram row would double-count). */
  def decontaminateAgainstGramStore(
      trainToks: DataFrame,
      benchGramStore: DataFrame,
      n: Int = 3,
      flagRatio: Double = 0.05): DataFrame =
    decontaminateGrams(gramRowsFromTokens(trainToks, n),
      benchGramStore.select("gram").distinct(), flagRatio)

  private def decontaminateGrams(
      trainGrams: DataFrame,
      benchGrams: DataFrame,
      flagRatio: Double): DataFrame = {
    trainGrams
      .join(broadcast(benchGrams.withColumn("_hit", lit(1L))), Seq("gram"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("_hit"), lit(0L))).as("n_overlap"))
      .withColumn("contamination",
        round(col("n_overlap").cast("double") / col("n_grams"), 9))
      .withColumn("contaminated",
        (col("contamination") >= flagRatio).cast("int"))
      .select("doc_id", "n_overlap", "n_grams", "contamination", "contaminated")
      .orderBy("doc_id")
  }

  /** [[decontaminate]] with a Bloom-filter prefilter — the 100 TB staging
    * of the same check. The benchmark grams aggregate into ONE compact
    * bitset (`bloom_filter_agg` over the 64-bit gram hashes) that
    * broadcasts as a single row; the corpus-side membership test is then
    * a codegen'd `might_contain` per gram — no join at all for the ~all
    * of the corpus that misses. Only BLOOM-POSITIVE grams (true hits +
    * the fpp share of false positives) reach the exact gram join that
    * confirms overlap. Bloom filters have no false negatives, so the
    * output is IDENTICAL to [[decontaminate]] — the registered query
    * shares its oracle — while the exact join's probe side shrinks from
    * |corpus grams| to |hits| + fpp·|corpus grams|.
    *
    * `expectedItems` sizes the bitset (overestimating costs bits, not
    * correctness; underestimating raises the false-positive rate, which
    * costs exact-join work, never answers).
    *
    * EAGER NOTE: building the bitset runs two jobs at DataFrame-
    * CONSTRUCTION time (the `head()` below) — the returned frame is not a
    * fully lazy plan. The blob also embeds in the plan as a literal, which
    * is fine at eval-set scale (~1 byte/item, capped below) but NOT the
    * shape for a billions-of-items filter — that path should ship the
    * bitset as a broadcast variable consumed by a custom predicate, not a
    * plan literal. The cap makes the limit explicit instead of letting a
    * huge `expectedItems` degrade into a multi-GB plan. */
  def decontaminateBloom(
      training: DataFrame,
      benchmark: DataFrame,
      n: Int = 3,
      flagRatio: Double = 0.05,
      expectedItems: Long = 100000L): DataFrame =
    decontaminateBloomGrams(gramRows(training, n), gramRows(benchmark, n),
      flagRatio, expectedItems)

  /** [[decontaminateBloom]] over prebuilt token arrays (both sides). */
  def decontaminateBloomFromTokens(
      trainToks: DataFrame,
      benchToks: DataFrame,
      n: Int = 3,
      flagRatio: Double = 0.05,
      expectedItems: Long = 100000L): DataFrame =
    decontaminateBloomGrams(gramRowsFromTokens(trainToks, n),
      gramRowsFromTokens(benchToks, n), flagRatio, expectedItems)

  private def decontaminateBloomGrams(
      trainGramRows: DataFrame,
      benchGramRows: DataFrame,
      flagRatio: Double,
      expectedItems: Long): DataFrame = {
    // ~1.2 bytes/item at the default fpp — 64M items ≈ 80 MB literal,
    // already generous for an eval set; beyond that the plan-literal
    // design itself is wrong (see scaladoc), so fail with the real reason
    require(expectedItems > 0 && expectedItems <= 64000000L,
      s"expectedItems=$expectedItems out of range (1, 64M]: eval-set Bloom " +
        "filters embed in the plan; a filter this large needs the broadcast-" +
        "variable path, not a plan literal")
    // both gram tables feed two consumers each (bench: bitset build + exact
    // join; train: candidates branch + per-doc totals) — persist so the
    // corpus tokenizes/explodes ONCE, same rationale as duplicateSpans
    val benchGrams = benchGramRows.select("gram").distinct().scopedPersist()
    // the bitset collects to the driver and ships as a LITERAL — the same
    // trained-model broadcast as the PQ codebooks (might_contain requires a
    // constant bloom, and the blob is ~1 byte/item); an empty benchmark
    // aggregates to null → no candidates, zeros from the left join below
    val bfBytes = benchGrams
      .agg(expr(s"graft_bloom_agg(xxhash64(gram), ${expectedItems}L)").as("bf"))
      .head().getAs[Array[Byte]](0)
    val trainGrams = trainGramRows.scopedPersist()
    val candidates =
      if (bfBytes == null) trainGrams.where(lit(false)).select("doc_id", "gram")
      else trainGrams
        .where(call_function("graft_bloom_contains", lit(bfBytes), xxhash64(col("gram"))))
        .select("doc_id", "gram")
    val exactHits = candidates
      .join(broadcast(benchGrams.withColumn("_hit", lit(1L))), Seq("gram"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    trainGrams.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
      .join(exactHits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        col("n_grams"),
        round(coalesce(col("n_overlap"), lit(0L)).cast("double") / col("n_grams"), 9)
          .as("contamination"))
      .withColumn("contaminated", (col("contamination") >= flagRatio).cast("int"))
      .select("doc_id", "n_overlap", "n_grams", "contamination", "contaminated")
      .orderBy("doc_id")
  }

  /** Multi-benchmark decontamination in ONE corpus pass: per training
    * document, the distinct-gram overlap against EACH named benchmark set.
    * All benchmark gram tables union into one broadcast (they are small by
    * nature), and per-set hits fall out of one conditional-distinct
    * aggregation — adding an eval set costs a column, not a corpus scan. */
  def decontaminateMulti(
      training: DataFrame,
      benchmarks: Map[String, DataFrame],
      n: Int = 3): DataFrame =
    decontaminateMultiGrams(gramRows(training, n),
      benchmarks.view.mapValues(gramRows(_, n)).toMap)

  /** [[decontaminateMulti]] over prebuilt token arrays (all sides). */
  def decontaminateMultiFromTokens(
      trainToks: DataFrame,
      benchmarks: Map[String, DataFrame],
      n: Int = 3): DataFrame =
    decontaminateMultiGrams(gramRowsFromTokens(trainToks, n),
      benchmarks.view.mapValues(gramRowsFromTokens(_, n)).toMap)

  private def decontaminateMultiGrams(
      trainGrams: DataFrame,
      benchmarkGrams: Map[String, DataFrame]): DataFrame = {
    require(benchmarkGrams.nonEmpty, "need at least one benchmark set")
    val names = benchmarkGrams.keys.toSeq.sorted
    val benchGrams = names.map { name =>
      benchmarkGrams(name).select("gram").distinct()
        .withColumn("set_name", lit(name))
    }.reduce(_ unionByName _)
    val overlapCols = names.map { name =>
      countDistinct(when(col("set_name") === name, col("gram")))
        .as(s"overlap_$name")
    }
    trainGrams
      .join(broadcast(benchGrams), Seq("gram"), "left")
      .groupBy("doc_id")
      .agg(countDistinct(col("gram")).as("n_grams"), overlapCols: _*)
      .orderBy("doc_id")
  }

  /** TOKEN-SPAN decontamination — the surgical form of [[decontaminate]]:
    * instead of dropping a contaminated document whole, strip ONLY the
    * token spans that verbatim-overlap a benchmark `n`-gram and keep the
    * rest of the document (what a production pipeline actually ships —
    * doc-drop decon throws away the 99 % of a long document that never
    * leaked). A training window is removable iff its n-gram appears among
    * the benchmark's distinct n-grams; removable windows expand to covered
    * token positions and the span family's shared re-assembly
    * ([[assembleStripped]]) rebuilds each document, so the output shape,
    * token domain, and edge cases (fully-stripped → (0, ""), token-free
    * docs) are identical to [[stripDuplicateSpans]].
    *
    * Scale shape: the benchmark side is eval-suite-sized and BROADCASTS
    * as distinct grams; marking is a per-window broadcast semi-join (no
    * corpus shuffle by gram), and the re-assembly is the family's linear
    * per-document collect. Nothing here scales with anything but the
    * corpus and the (fixed) benchmark. */
  def decontaminateStripSpans(
      training: DataFrame,
      benchmark: DataFrame,
      n: Int = 3): DataFrame =
    decontaminateStripSpansFromWindows(training,
      windowRows(training, n).scopedPersist(),
      gramRows(benchmark, n).select("gram").distinct(), n)

  /** [[decontaminateStripSpans]] over a prebuilt training window table
    * (e.g. the shared span-window asset) and a prebuilt distinct
    * benchmark-gram table. */
  def decontaminateStripSpansFromWindows(docs: DataFrame, wins: DataFrame,
      benchGrams: DataFrame, n: Int): DataFrame = {
    requireWindowN(wins, n)
    val rem = wins
      .join(broadcast(benchGrams.select("gram")), Seq("gram"), "left_semi")
      .select("doc_id", "pos")
    assembleStripped(docs, rem, n)
  }

  /** Contamination SEVERITY report — the one-pass per-source summary a
    * data-governance review reads before a training run: per corpus
    * `source`, the document count, how many documents carry ANY benchmark
    * n-gram overlap, how many are flagged at `flagRatio` (the
    * [[decontaminate]] doc-drop rule), and the token-level exposure (total
    * tokens, tokens covered by a leaked window, covered fraction — what
    * [[decontaminateStripSpans]] would remove). Doc-level and token-level
    * severity disagree in exactly the cases that make span-strip worth
    * shipping: a long document with one leaked line flags at the doc level
    * but loses almost nothing at the token level.
    *
    * Scale shape: two broadcast semi/left joins against the (fixed-size)
    * benchmark grams, one per-doc aggregate, one per-source aggregate —
    * the corpus is never shuffled by gram, and every exchange key is
    * doc_id or source. */
  def contaminationReport(
      training: DataFrame,
      benchmark: DataFrame,
      n: Int = 3,
      flagRatio: Double = 0.05): DataFrame = {
    val benchGrams = gramRows(benchmark, n).select("gram").distinct()
    val wins = windowRows(training, n).scopedPersist()
    // token-level exposure: positions covered by any leaked window
    val cov = wins
      .join(broadcast(benchGrams), Seq("gram"), "left_semi")
      .select(col("doc_id"),
        explode(expr(s"sequence(pos, pos + ${n - 1})")).as("tpos"))
      .distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("n_cov"))
    // doc-level overlap: the decontaminate() distinct-gram rule
    val docHits = wins.select("doc_id", "gram").distinct()
      .join(broadcast(benchGrams.withColumn("_hit", lit(1L))), Seq("gram"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("_hit"), lit(0L))).as("n_overlap"))
    val perDoc = training
      .select(col("doc_id"), col("source"), size(tokenArray).as("n_toks"))
      .join(docHits, Seq("doc_id"), "left")
      .join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        greatest(col("n_toks"), lit(0)).cast("long").as("n_toks"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_cov"), lit(0L)).as("n_cov"))
    perDoc.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum((col("n_overlap") > 0).cast("long")).as("n_docs_hit"),
        sum((col("n_grams") > 0 &&
          col("n_overlap").cast("double") >=
            col("n_grams").cast("double") * flagRatio).cast("long"))
          .as("n_docs_flagged"),
        sum(col("n_toks")).as("n_tokens"),
        sum(col("n_cov")).as("n_tokens_covered"))
      .withColumn("covered_frac",
        round(col("n_tokens_covered").cast("double") /
          greatest(col("n_tokens"), lit(1L)).cast("double"), 9))
      .orderBy("source")
  }

  /** SEMANTIC decontamination — the embedding-space sibling of the n-gram
    * overlap checks above: flag corpus documents whose embedding is
    * near-identical to a held-out benchmark document even when the surface
    * n-grams were paraphrased away (the leakage mode the gram joins cannot
    * see). For every non-benchmark vector: the max cosine against the
    * benchmark split, the benchmark id achieving it (smallest id on ties),
    * and a 1/0 BIGINT `contaminated` flag at `tau` — audit columns like
    * the rest of the family, never a filtered survivor list.
    *
    * Scale shape: a benchmark set is eval-suite-sized (thousands), so it
    * broadcasts whole; the corpus side is ONE map pass with a map-side
    * `max`/`max_by` partial — no shuffle of the corpus at all, unlike the
    * SemDeDup cluster self-join (corpus×corpus needs clustering; corpus×
    * benchmark does not). A benchmark too large to broadcast would reuse
    * the IVF machinery (assign both sides to coarse lists, compare within
    * list) — same shape as [[Dedup.semanticDedup]].
    *
    * Float parity: identical cosine spelling to the ANN/SemDeDup family —
    * codegen'd `graft_dot`, norms from exact DECIMAL sums on the oracle
    * side, cosine rounded to 6 before every comparison.
    *
    * Precondition: `isBenchmark` must select a non-empty, FIXED-size set
    * (an eval suite does not grow with the corpus — a split that scales
    * with it turns this map pass quadratic, the failure the sf1 rehearsal
    * caught). An empty benchmark yields an empty result (nothing to
    * compare), not an all-clean report. */
  def decontaminateSemantic(
      embeddings: DataFrame,
      isBenchmark: Column,
      tau: Double = 0.3): DataFrame = {
    val e = Similarity.prepared(embeddings, "embedding")
      .select("vec_id", "v", "norm")
    semanticLeakScores(e.where(!isBenchmark), e.where(isBenchmark), tau)
  }

  /** [[decontaminateSemantic]] with the benchmark as a SEPARATE TABLE —
    * the production API: eval suites live in their own store (here a
    * `benchmark_embeddings` parquet), not as a predicate over the corpus.
    * `benchmark` needs (vec_id, embedding); its ids are reported in
    * `nearest_bench` in the benchmark table's own id space. Same plan as
    * the split form (benchmark broadcast, one corpus map pass) — the two
    * produce identical rows when the external table equals the split,
    * which the registered query's shared oracle checks. An empty
    * benchmark yields an empty result, as in the split form. */
  def decontaminateSemanticExternal(
      corpus: DataFrame,
      benchmark: DataFrame,
      tau: Double = 0.3): DataFrame =
    semanticLeakScores(
      Similarity.prepared(corpus, "embedding").select("vec_id", "v", "norm"),
      Similarity.prepared(benchmark, "embedding").select("vec_id", "v", "norm"),
      tau)

  /** Shared scoring tail: max cosine of every corpus vector against the
    * broadcast benchmark, ties on the smallest benchmark id. Both sides
    * arrive prepared as (vec_id, v, norm). */
  private def semanticLeakScores(corpus: DataFrame, benchmark: DataFrame,
      tau: Double): DataFrame = {
    val bench = benchmark
      .select(col("vec_id").as("b_id"), col("v").as("bv"), col("norm").as("bnorm"))
    corpus
      .join(broadcast(bench))
      .withColumn("cos",
        round(expr("graft_dot(v, bv)") / (col("norm") * col("bnorm")), 6))
      .groupBy("vec_id")
      .agg(
        max(col("cos")).as("max_cos"),
        max_by(col("b_id"), struct(col("cos"), -col("b_id"))).as("nearest_bench"))
      .select(col("vec_id"), col("nearest_bench"), col("max_cos"),
        (col("max_cos") >= tau).cast("long").as("contaminated"))
      .orderBy("vec_id")
  }

  /** DSIR-style hashed importance weights (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score
    * every RAW-pool document by how much its hashed unigram features look
    * drawn from the TARGET distribution rather than the raw distribution.
    * The weight is the classic log importance ratio
    * `Σ_b n_b(d) · ln(p_target(b) / p_raw(b))` over `buckets` hashed
    * feature buckets with Laplace (+1) smoothing — the paper's bag-of-
    * hashed-ngrams model with unigram features.
    *
    * Inputs: the `(term, doc_id, cnt)` term-counts corpus asset plus a
    * doc_id predicate naming the target split (here the same held-out
    * benchmark slice the decontamination family uses, so "select raw data
    * that looks like the eval domain" composes with "flag raw data that
    * LEAKS the eval set" — the two sides of the same pipeline stage).
    *
    * Engine-portable: buckets come from the md5-prefix hash (the
    * [[graft.operators.TextAnalysis.stableSample]] idiom), the per-bucket
    * log-ratio is rounded to 9 decimals, and the per-doc sum routes
    * through DECIMAL so partition-order float drift cannot move a weight.
    *
    * Scale shape: one narrow (doc_id, bucket) aggregate over the counts
    * asset, a bucket-bounded (≤ `buckets` rows) λ table BROADCAST back,
    * then a per-doc aggregate — the corpus is never shuffled by term, and
    * the model side is constant-size no matter how large the corpus. */
  def dsirWeights(tc: DataFrame, isTarget: Column, buckets: Int = 4096): DataFrame = {
    val bucket = (conv(substring(md5(col("term").cast("binary")), 1, 8), 16, 10)
      .cast("long") % buckets).as("bucket")
    // one pass to per-(doc, bucket) counts; feeds BOTH the bucket model
    // aggregate and the per-doc scoring join
    val feat = tc.select(col("doc_id"), bucket, col("cnt"))
      .groupBy("doc_id", "bucket").agg(sum("cnt").as("n"))
      .scopedPersist()
    val byBucket = feat
      .groupBy("bucket")
      .agg(
        sum(when(isTarget, col("n")).otherwise(0L)).as("tgt_b"),
        sum(when(isTarget, 0L).otherwise(col("n"))).as("raw_b"))
    val totals = byBucket.agg(
      sum("tgt_b").as("tgt_tot"), sum("raw_b").as("raw_tot"))
    val lam = byBucket.crossJoin(broadcast(totals))
      .select(col("bucket"), round(log(
        ((col("tgt_b") + lit(1L)).cast("double") / (col("tgt_tot") + lit(buckets.toLong)).cast("double")) /
          ((col("raw_b") + lit(1L)).cast("double") / (col("raw_tot") + lit(buckets.toLong)).cast("double"))), 9)
        .as("lam"))
    feat.where(!isTarget)
      .join(broadcast(lam), Seq("bucket"))
      .groupBy("doc_id")
      .agg(
        sum("n").as("n_tokens"),
        sum(round(col("n") * col("lam"), 9).cast("decimal(28,9)")).as("w_sum"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("w_sum").cast("double"), 9).as("dsir_logratio"),
        // NO round on the per-token ratio: w_sum is a scale-9 DECIMAL, so
        // w_sum/n is a TERMINATING decimal that can land exactly on a
        // half-ulp of the 9th digit (sf0.01 doc 172: -2.0893699905) where
        // Spark's HALF_UP and another engine's binary half-even disagree.
        // IEEE division of identical doubles is bit-exact in every engine
        // — the file-level parity rule round(·,9) exists for
        // transcendental (nonterminating) outputs only.
        (col("w_sum").cast("double") / col("n_tokens")).as("per_token"))
  }

  /** Repetition quality stats (Gopher-style filter inputs), one row per
    * document with ≥1 token:
    *  - `top_word_ratio`: occurrences of the most frequent token / tokens
    *  - `adj_dup_pairs`: adjacent equal-token pairs (stutter runs)
    *  - `rep_3gram_frac`: fraction of 3-gram OCCURRENCES that are repeats
    *    of an earlier 3-gram in the same document
    *
    * All per-doc map work off one tokenized pass + one narrow (doc, term)
    * aggregation — no cross-document shuffle at all, so it runs at corpus
    * scan speed regardless of corpus size. */
  def repetitionStats(docs: DataFrame): DataFrame =
    repetitionStatsOver(docs.select(col("doc_id"), tokenArray.as("a")))

  /** [[repetitionStats]] over prebuilt token arrays `(doc_id, tokens)`. */
  def repetitionStatsFromTokens(toks: DataFrame): DataFrame =
    repetitionStatsOver(toks.select(col("doc_id"), col("tokens").as("a")))

  private def repetitionStatsOver(arrays: DataFrame): DataFrame = {
    // one array pass feeds both sides: the term counts explode the SAME
    // arrays the positional stats slice (no second tokenize)
    val arr = arrays.scopedPersist()
    val tf = arr.select(col("doc_id"), explode(col("a")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
    val byDoc = tf.groupBy("doc_id")
      .agg(sum("c").as("n_tokens"), max("c").as("max_c"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("max_c").cast("double") / col("n_tokens"), 9).as("top_word_ratio"))
    val arrStats = arr
      .where(size(col("a")) >= 1)
      .select(col("doc_id"),
        expr("size(filter(zip_with(slice(a, 1, size(a) - 1), slice(a, 2, size(a) - 1), " +
          "(x, y) -> x = y), b -> b))").cast("long").as("adj_dup_pairs"),
        expr("greatest(size(a) - 2, 0)").cast("long").as("grams_total"),
        expr("CASE WHEN size(a) >= 3 THEN size(array_distinct(" +
          "transform(sequence(1, size(a) - 2), i -> concat_ws(' ', element_at(a, i), " +
          "element_at(a, i + 1), element_at(a, i + 2))))) ELSE 0 END")
          .cast("long").as("grams_distinct"))
      .select(col("doc_id"), col("adj_dup_pairs"),
        when(col("grams_total") > 0,
          round(lit(1.0) - col("grams_distinct").cast("double") / col("grams_total"), 9))
          .otherwise(0.0).as("rep_3gram_frac"))
    byDoc.join(arrStats, "doc_id")
      .select("doc_id", "n_tokens", "top_word_ratio", "adj_dup_pairs", "rep_3gram_frac")
      .orderBy("doc_id")
  }

  /** Corpus-wide boilerplate detection: the top-`topK` distinct `n`-grams
    * by document frequency among those appearing in at least `minDocs`
    * documents — headers/footers/licenses at corpus scale. One narrow
    * (gram → count) aggregation with map-side partials, then a
    * TakeOrderedAndProject top-k (no global sort). */
  def boilerplateGrams(docs: DataFrame, n: Int = 3, minDocs: Int = 5,
      topK: Int = 100): DataFrame =
    boilerplateFromGramRows(gramRows(docs, n), minDocs, topK)

  /** [[boilerplateGrams]] over prebuilt token arrays `(doc_id, tokens)`. */
  def boilerplateGramsFromTokens(toks: DataFrame, n: Int = 3, minDocs: Int = 5,
      topK: Int = 100): DataFrame =
    boilerplateFromGramRows(gramRowsFromTokens(toks, n), minDocs, topK)

  private def boilerplateFromGramRows(grams: DataFrame, minDocs: Int,
      topK: Int): DataFrame =
    grams
      .groupBy("gram").agg(count(lit(1)).as("n_docs"))
      .where(col("n_docs") >= minDocs)
      .orderBy(desc("n_docs"), asc("gram"))
      .limit(topK)

  /** Every `n`-token window per document with its 1-based start position
    * over the portable token sequence: (doc_id, pos, gram). One row per
    * OCCURRENCE (no `array_distinct` — positions matter here), LINEAR in
    * corpus tokens. */
  private[graft] def windowRows(docs: DataFrame, n: Int,
      carry: Seq[String] = Nil): DataFrame =
    windowRowsOver(
      docs.select(col("doc_id") +: carry.map(col) :+ tokenArray.as("a"): _*),
      n, carry)

  /** [[windowRows]] with the tokenization already done — consumes the
    * shared token-array corpus asset `(doc_id, tokens)` instead of
    * re-tokenizing the corpus (the gram slicing itself is identical). */
  private[graft] def windowRowsFromTokens(toks: DataFrame, n: Int,
      carry: Seq[String] = Nil): DataFrame =
    windowRowsOver(
      toks.select(col("doc_id") +: carry.map(col) :+ col("tokens").as("a"): _*),
      n, carry)

  private def windowRowsOver(rows: DataFrame, n: Int,
      carry: Seq[String]): DataFrame = {
    val mk = (1 to n).map(j => s"element_at(a, i + ${j - 1})").mkString("concat_ws(' ', ", ", ", ")")
    val c = carry.map(col)
    // the window length rides the gram column as metadata (survives the
    // parquet round-trip of the span-window asset) so every *FromWindows
    // consumer can verify its n matches the table's instead of silently
    // mis-expanding coverage with a mismatched constant
    val gramMeta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft_window_n", n.toLong).build()
    rows
      .where(size(col("a")) >= n)
      .select(col("doc_id") +: c :+
        posexplode(expr(s"transform(sequence(1, size(a) - ${n - 1}), i -> $mk)")): _*)
      .select(col("doc_id") +: c :+
        (col("pos") + 1).cast("long").as("pos") :+ col("col").as("gram", gramMeta): _*)
  }

  /** Fail fast when a `*FromWindows` caller's `n` disagrees with the n the
    * window table was built at (known via [[windowRows]]' column
    * metadata); caller-built tables without the tag are trusted. */
  private def requireWindowN(wins: DataFrame, n: Int): Unit =
    wins.schema.fields.find(_.name == "gram")
      .filter(_.metadata.contains("graft_window_n"))
      .foreach { f =>
        val built = f.metadata.getLong("graft_window_n")
        require(built == n.toLong,
          s"window table was built at n=$built but the caller passed n=$n")
      }

  /** Duplicated-span detection — the exact-substring-dedup primitive from
    * "Deduplicating Training Data Makes Language Models Better" (Lee et
    * al., 2021): every `n`-token window whose exact token sequence occurs
    * more than once in the corpus (in another document, or repeated within
    * the same one). Output: (doc_id, pos, gram, occ) with `occ` the gram's
    * corpus-wide occurrence count.
    *
    * Scale shape: windows are narrow (doc_id, pos, gram) rows — LINEAR in
    * corpus tokens, never a document-pair join. The duplicated-gram set is
    * one map-side-partial `groupBy(gram)`, and the mark-back is an
    * equi-join on the same key, so a gram occurring d times contributes d
    * output rows — contrast the |pairs| = d² of a gram-keyed SELF-join
    * ([[Dedup.ngramJaccardExact]] needs its DF cap precisely because
    * pairing is quadratic; marking spans is not). */
  def duplicateSpans(docs: DataFrame, n: Int = 5): DataFrame =
    // windows feed both the occurrence count and the mark-back join; without
    // a persist Catalyst re-tokenizes and re-windows the corpus for each
    // (same rationale as Tfidf.pipeline's term-counts cache)
    duplicateSpansFromWindows(windowRows(docs, n).scopedPersist())

  /** [[duplicateSpans]] over a PREBUILT `(doc_id, pos, gram)` window table
    * — the materialized span-window intermediate the whole span family
    * shares (each consumer otherwise re-tokenizes and re-windows the
    * corpus). The caller owns the table's materialization; a parquet-
    * backed asset needs no persist (both consumers rescan narrow rows). */
  def duplicateSpansFromWindows(wins: DataFrame): DataFrame = {
    val occ = wins.groupBy("gram").agg(count(lit(1)).as("occ"))
      .where(col("occ") >= 2)
    wins.join(occ, "gram")
      .select(col("doc_id"), col("pos"), col("gram"), col("occ"))
  }

  /** [[duplicateSpans]] with the shuffle keyed by `xxhash64(gram)` instead
    * of the gram string — the 100 TB form. An `n`-token gram is ~8·n bytes;
    * hashing first shrinks every exchanged row to (doc_id, pos, gh), a ~5×
    * shuffle-volume cut at n=5 (this is also what Lee et al. ship: they
    * match on hashes and accept the 2⁻⁶⁴ birthday noise, which marks a
    * false span but never loses a true one). Output positions are identical
    * to the exact operator absent a collision — proven by spec; the
    * registered query keeps the string-keyed form because DuckDB cannot
    * reproduce xxhash64. */
  def duplicateSpansHashed(docs: DataFrame, n: Int = 5): DataFrame =
    duplicateSpansHashedFromWindows(
      windowRows(docs, n)
        .select(col("doc_id"), col("pos"), xxhash64(col("gram")).as("gh"))
        .scopedPersist())

  /** [[duplicateSpansHashed]] over prebuilt windows: accepts either the
    * exact `(doc_id, pos, gram)` table (hashes it here — the string never
    * crosses an exchange) or an already-hashed `(doc_id, pos, gh)` one. */
  def duplicateSpansHashedFromWindows(wins0: DataFrame): DataFrame = {
    val wins =
      if (wins0.columns.contains("gh")) wins0
      else wins0.select(col("doc_id"), col("pos"), xxhash64(col("gram")).as("gh"))
    val occ = wins.groupBy("gh").agg(count(lit(1)).as("occ"))
      .where(col("occ") >= 2)
    wins.join(occ, "gh")
      .select(col("doc_id"), col("pos"), col("gh"), col("occ"))
  }

  /** Per-document n-gram NOVELTY — the memorization/overlap profile of a
    * corpus in ingestion order: for each document, the fraction of its
    * `n`-token windows whose gram FIRST occurs in an earlier document
    * (corpus-first = lowest doc_id, the same canonical rule the span
    * stripper keeps). A low-novelty document is mostly restating content
    * the corpus already has — the doc-level signal behind dedup-aware
    * sampling and memorization audits.
    *
    * Scale shape: identical to [[duplicateSpansFromWindows]] — gram →
    * min(doc_id) is one narrow map-side-partial aggregate, the mark-back
    * is an equi-join on the gram key, and the per-doc rollup is a narrow
    * count. Linear in corpus tokens, no pair join. Documents with fewer
    * than `n` tokens have no windows and emit nothing (no score is the
    * honest answer). */
  def noveltyScoresFromWindows(wins: DataFrame): DataFrame = {
    val first = wins.groupBy("gram").agg(min("doc_id").as("first_doc"))
    wins.join(first, "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("first_doc") < col("doc_id"), 1L).otherwise(0L))
          .as("n_seen_before"))
      .withColumn("novelty", round(
        lit(1.0) - col("n_seen_before").cast("double") / col("n_windows"), 9))
      .orderBy("doc_id")
  }

  /** Driver-visible agreement gate for the hashed span path (THROW
    * contract, like the sketch precision gates): the exact string-keyed
    * and xxhash64-keyed span detectors must mark the SAME (doc_id, pos)
    * set. A position only the exact side marks means the hashed path LOST
    * a true duplicated window (impossible unless broken — hashing is
    * deterministic); a position only the hashed side marks is a hash
    * collision (2⁻⁶⁴ birthday noise — tolerated at corpus scale by Lee et
    * al., but at gate scale any occurrence is overwhelmingly a bug, so
    * both directions require ZERO). One summary row for the driver. */
  def spanHashAgreementGate(wins: DataFrame): DataFrame = {
    val exactSpans = duplicateSpansFromWindows(wins)
      .select(col("doc_id"), col("pos"), lit(1L).as("in_exact"))
    val hashedSpans = duplicateSpansHashedFromWindows(wins)
      .select(col("doc_id"), col("pos"), lit(1L).as("in_hashed"))
    val row = exactSpans.join(hashedSpans, Seq("doc_id", "pos"), "full_outer")
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("in_hashed").isNull, 1L).otherwise(0L)).as("n_only_exact"),
        sum(when(col("in_exact").isNull, 1L).otherwise(0L)).as("n_only_hashed"))
      .head()
    val (n, onlyExact, onlyHashed) = (row.getAs[Long]("n_spans"),
      row.getAs[Long]("n_only_exact"), row.getAs[Long]("n_only_hashed"))
    require(n > 0, "span-hash agreement gate is vacuous: no duplicated spans")
    require(onlyExact == 0L,
      s"hashed span path LOST $onlyExact/$n true duplicated windows")
    require(onlyHashed == 0L,
      s"hashed span path marked $onlyHashed collision-only positions")
    val s = wins.sparkSession
    import s.implicits._
    Seq((n, onlyExact, onlyHashed))
      .toDF("n_spans", "n_only_exact", "n_only_hashed")
  }

  /** Span-level dedup APPLY — rebuild each document with duplicated spans
    * removed, keeping each gram's canonical occurrence (the corpus-first:
    * lowest doc_id, then lowest position — Lee et al. likewise keep one
    * occurrence and cut the rest). A token is dropped if ANY removable
    * window covers it, even one overlapping a canonical window — the
    * simple deterministic rule, spelled identically in the oracle. Output
    * is in the token domain (normalized tokens re-joined with single
    * spaces; original whitespace/case are not reconstructed):
    * (doc_id, n_kept, clean_text), with fully-stripped or token-free
    * documents emitting (0, "").
    *
    * Scale shape: same linear mark-back as [[duplicateSpans]] plus one
    * (doc_id, tpos) anti-join and a per-document re-assembly — the
    * collect_list is bounded by ONE document's length. The canonical
    * occurrence rides the same `groupBy(gram)` that counts occurrences as
    * a `min(struct(doc_id, pos))` — lexicographic and overflow-free for
    * ANY Long doc_id (a packed `doc_id·2³² + pos` BIGINT would silently
    * wrap past doc_id ≥ 2³¹). */
  def stripDuplicateSpans(docs: DataFrame, n: Int = 5): DataFrame =
    stripDuplicateSpansFromWindows(docs, windowRows(docs, n).scopedPersist(), n)

  /** [[stripDuplicateSpans]] over a prebuilt window table (`docs` is still
    * needed for the token stream the re-assembly anti-joins — single
    * tokens are not derivable from n-gram windows). */
  def stripDuplicateSpansFromWindows(docs: DataFrame, wins: DataFrame, n: Int): DataFrame = {
    requireWindowN(wins, n)
    val occKey = struct(col("doc_id"), col("pos"))
    val occ = wins.groupBy("gram")
      .agg(count(lit(1)).as("occ"), min(occKey).as("canon"))
      .where(col("occ") >= 2)
    val rem = wins.join(occ, "gram")
      .where(occKey =!= col("canon"))
      .select("doc_id", "pos")
    assembleStripped(docs, rem, n)
  }

  /** Shared strip tail: expand removable windows to covered token
    * positions, anti-join the token stream, and re-assemble each document
    * (the collect_list is bounded by ONE document's length). Shared with
    * [[ExactSubstr.stripFromTokens]] — one spelling of the re-assembly for
    * the whole span family. */
  private[operators] def assembleStripped(docs: DataFrame, rem: DataFrame, n: Int): DataFrame = {
    val cov = rem
      .select(col("doc_id"), explode(expr(s"sequence(pos, pos + ${n - 1})")).as("tpos"))
      .distinct()
    val toks = docs.select(col("doc_id"), tokenArray.as("a"))
      .select(col("doc_id"), posexplode(col("a")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("tpos"), col("col").as("term"))
    val kept = toks.join(cov, Seq("doc_id", "tpos"), "left_anti")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_kept"),
        expr("concat_ws(' ', transform(array_sort(collect_list(struct(tpos, term))), s -> s.term))")
          .as("clean_text"))
    docs.select("doc_id").join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy("doc_id")
  }

  /** [[stripDuplicateSpans]] with every gram-keyed exchange carrying
    * `xxhash64(gram)` instead of the gram string — the same ~5× shuffle cut
    * as [[duplicateSpansHashed]], applied to the full strip pipeline (the
    * occurrence count, the canonical `min(struct(doc_id, pos))`, and the
    * mark-back join all key on the 8-byte hash). A 2⁻⁶⁴ collision would
    * merge two distinct grams' occurrence sets — cutting a span that the
    * exact operator keeps — but never loses a marked duplicate, which is
    * the trade Lee et al. ship at corpus scale. Output columns and (absent
    * a collision) values are IDENTICAL to the exact form, so the registered
    * query shares its DuckDB oracle. */
  def stripDuplicateSpansHashed(docs: DataFrame, n: Int = 5): DataFrame =
    stripDuplicateSpansHashedFromWindows(docs,
      windowRows(docs, n)
        .select(col("doc_id"), col("pos"), xxhash64(col("gram")).as("gh"))
        .scopedPersist(), n)

  /** [[stripDuplicateSpansHashed]] over prebuilt windows (exact or
    * already-hashed, as in [[duplicateSpansHashedFromWindows]]). */
  def stripDuplicateSpansHashedFromWindows(docs: DataFrame, wins0: DataFrame,
      n: Int): DataFrame = {
    requireWindowN(wins0, n)
    val wins =
      if (wins0.columns.contains("gh")) wins0
      else wins0.select(col("doc_id"), col("pos"), xxhash64(col("gram")).as("gh"))
    val occKey = struct(col("doc_id"), col("pos"))
    val occ = wins.groupBy("gh")
      .agg(count(lit(1)).as("occ"), min(occKey).as("canon"))
      .where(col("occ") >= 2)
    val rem = wins.join(occ, "gh")
      .where(occKey =!= col("canon"))
      .select("doc_id", "pos")
    assembleStripped(docs, rem, n)
  }

  /** Per-document duplicated-span coverage — the "how much of this document
    * is duplicated text" statistic that drives span-level dedup policy:
    * token count, window count, duplicated-window count, the number of
    * DISTINCT token positions covered by at least one duplicated window
    * (overlapping windows don't double-count), and that coverage as a
    * fraction of the document. Documents with no duplicated span (or fewer
    * than `n` tokens) report zeros via the left join. */
  def spanDupStats(docs: DataFrame, n: Int = 5): DataFrame =
    spanDupStatsFromWindows(docs, windowRows(docs, n).scopedPersist(), n)

  /** [[spanDupStats]] over a prebuilt window table. */
  def spanDupStatsFromWindows(docs: DataFrame, wins: DataFrame, n: Int): DataFrame = {
    requireWindowN(wins, n)
    val cov = duplicateSpansFromWindows(wins)
      .select(col("doc_id"), col("pos"),
        explode(expr(s"sequence(pos, pos + ${n - 1})")).as("tok"))
      .groupBy("doc_id")
      .agg(countDistinct("pos").as("n_dup_windows"),
        countDistinct("tok").as("n_dup_tokens"))
    docs.select(col("doc_id"), size(tokenArray).cast("long").as("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        greatest(col("n_tokens") - lit(n - 1), lit(0)).cast("long").as("n_windows"))
      .join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"),
        when(col("n_tokens") > 0,
          round(coalesce(col("n_dup_tokens"), lit(0L)).cast("double") / col("n_tokens"), 9))
          .otherwise(lit(0.0)).as("dup_token_frac"))
      .orderBy("doc_id")
  }

  // --------------------------------------------------------------------
  // Token-budget corpus selection
  // --------------------------------------------------------------------

  /** Greedy token-budget selection, EXACT spelling: order documents by
    * `(score DESC, doc_id ASC)` and keep the maximal prefix whose running
    * token total stays within `budgetTokens` (the doc that would cross
    * the budget — and everything after it — drops; greedy prefix, not a
    * knapsack). `scored` is any `(doc_id, score, n_tokens)` frame with
    * non-null scores.
    *
    * This spelling ranks the WHOLE corpus through one unpartitioned
    * running-sum window — a single-reducer funnel that does not survive
    * 100 TB. It exists as the semantic contract and the oracle shape;
    * the scale path is [[tokenBudgetSelectBucketed]], which selects the
    * IDENTICAL document set (shared oracle) without the global sort. */
  def tokenBudgetSelect(scored: DataFrame, budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 0, s"budgetTokens must be >= 0, got $budgetTokens")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("doc_id").asc)
      .rowsBetween(Long.MinValue, 0)
    scored.select(col("doc_id"), col("score"), col("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .where(col("cum_tokens") <= budgetTokens)
      .select("doc_id", "score", "n_tokens")
      .orderBy("doc_id")
  }

  /** [[tokenBudgetSelect]] without the global sort — the 100 TB path.
    * Scores histogram into `floor(score / bucketWidth)` buckets; the
    * per-bucket token totals are a BOUNDED driver artifact (the
    * PQ-codebook collect pattern — a [0, 1] quality score at the default
    * width yields ~1001 rows; the hard cap enforced is 65536 buckets, so
    * unbounded-range scores at a too-narrow width fail loudly instead of
    * collecting the corpus). The driver walks buckets best-first to find
    * the single BOUNDARY bucket where the running total crosses the
    * budget: buckets above it keep entirely (a broadcast-literal map
    * filter), buckets below drop, and only the boundary bucket's rows —
    * one bucket, not the corpus — run the exact `(score DESC, doc_id)`
    * running-sum window against the budget remainder.
    *
    * Bucket cuts respect the global order (`floor` is monotone: a higher
    * bucket strictly outscores a lower one, and the within-bucket window
    * re-applies the exact order), so the selected set is IDENTICAL to
    * [[tokenBudgetSelect]] — the two registry queries share one oracle.
    *
    * Consistency contract: the histogram collect and the final keep/drop
    * scan are TWO actions, so the narrow `(doc_id, score, n_tokens,
    * bucket)` projection is persisted across them — a nondeterministic
    * or recomputed-differently input can't make the driver's bucket
    * totals disagree with the second scan and silently select a wrong
    * set. NULL or NaN scores / NULL token counts are rejected up front
    * (a NULL score carries no defined rank; a NaN score would silently
    * bucket while the exact spelling's `ORDER BY score DESC` ranks NaN
    * above every real score — the two spellings' "identical doc set"
    * contract would break; a NULL n_tokens would NPE mid-collect). */
  def tokenBudgetSelectBucketed(scored: DataFrame, budgetTokens: Long,
      bucketWidth: Double = 0.001): DataFrame = {
    require(budgetTokens >= 0, s"budgetTokens must be >= 0, got $budgetTokens")
    require(bucketWidth > 0.0, s"bucketWidth must be positive, got $bucketWidth")
    // NaN routes to the NULL bucket (instead of ANSI-casting to a bogus
    // bucket id) so the one-action guard below sees it; the NaN count
    // distinguishes the two refusals by name
    val bucket = when(isnan(col("score")), lit(null))
      .otherwise(floor(col("score") / lit(bucketWidth)).cast("long"))
    val base = scored.select(col("doc_id"), col("score"), col("n_tokens"),
      bucket.as("bucket")).scopedPersist()
    // ONE action serves both the guards and the totals: a NULL/NaN score
    // rows into the NULL-key group (NaN counted separately), a NULL
    // n_tokens makes count(n_tokens) lag count(*) for its bucket — all
    // three refuse with a named error instead of an NPE mid-collect
    val histRows = base.groupBy("bucket")
      .agg(sum(col("n_tokens")).as("toks"), count(lit(1)).as("n"),
        count(col("n_tokens")).as("n_tok"),
        count(when(isnan(col("score")), lit(1))).as("n_nan"))
      .collect()
    histRows.find(_.isNullAt(0)).foreach { r =>
      if (r.getLong(4) > 0)
        throw new IllegalArgumentException(
          s"scored frame has ${r.getLong(4)} NaN-score row(s) — NaN has no " +
            "defined rank (the exact selector would order it above every " +
            "real score); filter or re-score them first")
      throw new IllegalArgumentException(
        s"scored frame has ${r.getLong(2)} NULL-score row(s) — a budget " +
          "selection needs every row ranked; filter or score them first")
    }
    require(histRows.forall(r => r.getLong(2) == r.getLong(3)),
      "scored frame has NULL n_tokens row(s) — a budget selection needs " +
        "every row's token mass; filter or count them first")
    val hist = histRows.map(r => (r.getLong(0), r.getLong(1))).sortBy(-_._1)
    require(hist.length <= 65536,
      s"score histogram has ${hist.length} buckets — widen bucketWidth " +
        "(the driver artifact must stay bounded)")
    // walk best-first: cum = tokens of fully-kept buckets; the boundary
    // bucket is the first whose total would cross the budget
    var cum = 0L
    var cutoff = Option.empty[(Long, Long)] // (boundary bucket, its remaining budget)
    val it = hist.iterator
    while (it.hasNext && cutoff.isEmpty) {
      val (b, t) = it.next()
      if (cum + t > budgetTokens) cutoff = Some((b, budgetTokens - cum))
      else cum += t
    }
    val kept = cutoff match {
      case None => base // the whole corpus fits the budget
      case Some((c, rem)) =>
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("doc_id").asc)
          .rowsBetween(Long.MinValue, 0)
        val edge = base.where(col("bucket") === c)
          .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
          .where(col("cum_tokens") <= rem)
          .drop("cum_tokens")
        base.where(col("bucket") > c).unionByName(edge)
    }
    kept.select("doc_id", "score", "n_tokens").orderBy("doc_id")
  }

  // --------------------------------------------------------------------
  // Temperature-based source mixing
  // --------------------------------------------------------------------

  /** Temperature-resampled source rates (the multilingual-LM mixing rule:
    * sample source `s` proportionally to `share_s^alpha`, `alpha < 1`
    * up-weighting the tail): per source the token mass, corpus share,
    * tempered probability `p = share^alpha / Σ share^alpha`, and the
    * per-document acceptance rate `min(1, p·targetTokens / tokens_s)`
    * that realizes `p` of a `targetTokens` budget in expectation.
    *
    * Complement of [[TextAnalysis.sourceTemperaturePlan]]: that one
    * reports RELATIVE down-sampling rates (max-normalized `p^(α−1)`, no
    * budget — the "shrink big sources toward the smallest" audit view);
    * this one solves for an ABSOLUTE token target and pairs with
    * [[temperatureMixSample]], which actually applies the rates.
    *
    * Engine-exact arithmetic: every cross-row sum routes through
    * DECIMAL(28,9), every nonterminating step is rounded to 9 (house
    * float-parity rules), and `alpha = 0.5` dispatches to IEEE `sqrt`
    * (correctly rounded on every engine, unlike `pow`). The whole frame
    * is #sources rows — the totals ride broadcast one-row cross joins. */
  def temperatureMixRates(docs: DataFrame, alpha: Double,
      targetTokens: Long): DataFrame = {
    require(alpha > 0.0, s"alpha must be positive, got $alpha")
    require(targetTokens > 0, s"targetTokens must be positive, got $targetTokens")
    val nt = graft.functions.TextFunctions.surfaceStats(col("text"))
      .getField("n_tokens")
    val perSource = docs.select(col("source"), nt.as("nt"))
      .groupBy("source").agg(sum(col("nt")).as("n_tokens"))
    val tot = perSource.agg(sum(col("n_tokens")).as("total"))
    val tempered = if (alpha == 0.5) (c: Column) => sqrt(c)
      else (c: Column) => pow(c, lit(alpha))
    val sh = perSource.crossJoin(broadcast(tot))
      .withColumn("share", round(col("n_tokens").cast("double") / col("total"), 9))
      .withColumn("p_raw", round(tempered(col("share")), 9))
    val psum = sh.agg(
      sum(col("p_raw").cast(org.apache.spark.sql.types.DecimalType(28, 9)))
        .cast("double").as("psum"))
    sh.crossJoin(broadcast(psum))
      .withColumn("p", round(col("p_raw") / col("psum"), 9))
      .withColumn("rate", round(least(lit(1.0),
        col("p") * lit(targetTokens.toDouble) / col("n_tokens").cast("double")), 9))
      .select("source", "n_tokens", "share", "p", "rate")
      .orderBy("source")
  }

  /** Per-source ingest QUOTAS composed from the temperature-mixing plan —
    * closing the ingest-admission ↔ mixing-plan loop: instead of a
    * hand-picked constant budget per source
    * ([[graft.streaming.Streams.tokenQuotaBatch]]'s registry form), each
    * source's token budget is its tempered probability × the absolute
    * token target (`p · targetTokens` — exactly the token mass
    * [[temperatureMixRates]] plans for that source; greedy admission
    * caps at the available mass implicitly). Decisions are the quota
    * family's greedy prefix: running totals accumulate every arrival,
    * refusals stay visible.
    *
    * Scale shape: the plan is #sources rows (broadcast); the corpus pays
    * one narrow projection + one spillable per-source running-sum
    * window — the same shape as the constant-budget batch quota.
    * Parity: `p` is the 9-rounded plan probability and the budget is one
    * IEEE double product, so the admission predicate replays exactly in
    * the oracle. */
  def tokenQuotaMixComposed(docs: DataFrame, alpha: Double,
      targetTokens: Long): DataFrame = {
    val budgets = temperatureMixRates(docs, alpha, targetTokens)
      .select(col("source"),
        (col("p") * lit(targetTokens.toDouble)).as("budget_tokens"))
    val nt = graft.functions.TextFunctions.surfaceStats(col("text"))
      .getField("n_tokens")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(Long.MinValue, 0)
    docs.select(col("doc_id"), col("source"), nt.cast("long").as("n_tokens"))
      .withColumn("running_tokens", sum(col("n_tokens")).over(w))
      .join(broadcast(budgets), "source")
      .withColumn("admitted",
        (col("running_tokens").cast("double") <= col("budget_tokens"))
          .cast("long"))
      .select("doc_id", "source", "n_tokens", "running_tokens",
        "budget_tokens", "admitted")
      .orderBy("doc_id")
  }

  /** Apply [[temperatureMixRates]] as a stable per-document sample: the
    * house md5 coin (exact power-of-two division, bit-portable) against
    * the broadcast per-source rate — domain rebalancing as one map-side
    * coin flip per document, no shuffle of text, holds at any corpus
    * size. Output: surviving `(doc_id, source)`, doc_id-ordered. */
  def temperatureMixSample(docs: DataFrame, alpha: Double,
      targetTokens: Long): DataFrame = {
    val rates = temperatureMixRates(docs, alpha, targetTokens)
      .select("source", "rate")
    val u = conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8),
      16, 10).cast("long").cast("double") / lit(4294967296.0)
    docs.join(broadcast(rates), "source")
      .withColumn("u", u)
      .where(col("u") < col("rate"))
      .select("doc_id", "source")
      .orderBy("doc_id")
  }

  /** Score-NORMALIZED source mixing — Moore–Lewis in-domain selection ×
    * domain mixing as ONE coin flip (the contrast-delta twin of
    * [[QualityClassifier.scoreWeightedSourceSample]], whose classifier
    * score already lives in [0, 1]): a document from source `s` survives
    * with probability `rates(s) × wgt`, where `wgt` min–max-rescales an
    * arbitrary-range document score (e.g. the perplexity-contrast
    * `domain_delta`, a log-prob difference) onto [0, 1] — the corpus's
    * most-in-domain document keeps its full source rate, the least keeps
    * nothing, and everything between retains proportionally. Sources
    * absent from `rates` keep nothing (rate 0 — the mixing family's
    * visible-refusal contract); documents absent from `scored` (too
    * short to score) drop with the inner join, as in the budget-select
    * composition.
    *
    * Degenerate corpus (all scores equal, `max == min`): `wgt = 1.0` for
    * every document — the sampler honestly degrades to the flat
    * per-source rate instead of dividing by zero.
    *
    * Engine-exact: the coin is the house md5 uniform (exact
    * power-of-two division); scores arrive 9-rounded from the scorer;
    * min/max pick existing values; and `(score − min) / (max − min)`
    * and `rate × wgt` are single correctly-rounded IEEE ops on
    * bit-portable doubles — `u < rate·wgt` replays in the oracle with no
    * rounding.
    *
    * Scale shape: the min/max is one narrow 2-column aggregate to a
    * one-row broadcast; the docs join is a narrow doc_id-keyed shuffle
    * (no text rides it); the coin and the filter are pure map work.
    * Output: surviving (doc_id, source, score, wgt, u), doc_id-ordered. */
  def normalizedScoreSourceSample(docs: DataFrame, scored: DataFrame,
      rates: Map[String, Double]): DataFrame = {
    val rate = rates.foldLeft(lit(0.0): Column) { case (acc, (source, r)) =>
      when(col("source") === source, lit(r)).otherwise(acc)
    }
    normalizedScoreSampleCore(
      scored.join(docs.select("doc_id", "source"), "doc_id")
        .withColumn("rate", rate))
  }

  /** [[normalizedScoreSourceSample]] with PLANNED rates: the per-source
    * rate table comes from [[temperatureMixRates]] (or any
    * `(source, rate)` frame) instead of a hand-written constant map —
    * closing the selection ↔ mixing-plan loop the same way
    * [[tokenQuotaMixComposed]] closes the ingest-quota loop. The
    * #sources plan rides a broadcast join; everything else is the same
    * one-coin map pass. */
  def normalizedScoreSourceSamplePlanned(docs: DataFrame, scored: DataFrame,
      rates: DataFrame): DataFrame =
    normalizedScoreSampleCore(
      scored.join(docs.select("doc_id", "source"), "doc_id")
        .join(broadcast(rates.select("source", "rate")), "source"))

  /** The shared coin: min–max-normalize the scores, survive on
    * `u < rate · wgt` with the house md5 uniform. Input must carry
    * `(doc_id, source, score, rate)`. */
  private def normalizedScoreSampleCore(scoredWithRate: DataFrame): DataFrame = {
    val mm = scoredWithRate.agg(min(col("score")).as("dmin"),
      max(col("score")).as("dmax"))
    val u = conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8),
      16, 10).cast("long").cast("double") / lit(4294967296.0)
    scoredWithRate
      .crossJoin(broadcast(mm))
      .withColumn("wgt", when(col("dmax") > col("dmin"),
        (col("score") - col("dmin")) / (col("dmax") - col("dmin")))
        .otherwise(lit(1.0)))
      .withColumn("u", u)
      .where(col("u") < col("rate") * col("wgt"))
      .select("doc_id", "source", "score", "wgt", "u")
      .orderBy("doc_id")
  }

  /** The CONSERVATIVE curation recipe end to end: within-document
    * paragraph dedup ([[Paragraphs.paragraphDedupStripWithinDocFixed]] —
    * each page drops only its OWN repeated blocks) composed with SOFT
    * cross-document weights ([[Dedup.softDedupWeights]]) computed over
    * the CLEANED corpus. Cross-document sharing — quotes, citations,
    * license headers — is never stripped, only down-weighted so training
    * sees each content roughly once; intra-page chrome, which carries no
    * such ambiguity, is removed outright.
    *
    * This is NOT the corpus-wide strip in disguise: composing the
    * within-doc cut BEFORE the corpus strip reproduces the corpus strip
    * exactly (spec-pinned on the strip family), but soft weights over
    * the cleaned text differ from soft weights over the raw text — both
    * the paragraph-novelty share and the near-dup neighborhoods are
    * re-priced on the text training would actually see, and documents
    * whose only redundancy was intra-page come out at full weight.
    *
    * Scale shape: stage 1 is a pure map (zero shuffle); stage 2 is the
    * capped pair stage + the fp-keyed paragraph profile on the cleaned
    * text (at pipeline scale the cleaned corpus is a materialized
    * dataset between the stages — the scoped persist stands in). Output
    * one narrow row per document:
    * `(doc_id, n_within_dropped, cluster_size, n_paras, n_dup, weight)`. */
  def conservativeSoftWeights(docs: DataFrame,
      paraTokens: Int = 2): DataFrame = {
    require(paraTokens > 0, s"paraTokens must be positive, got $paraTokens")
    val cleaned = Paragraphs
      .paragraphDedupStripWithinDocFixed(docs, paraTokens).scopedPersist()
    val cleanDocs = cleaned.select(col("doc_id"), col("source"),
      col("text_clean").as("text"))
    val labels = Dedup.connectedComponents(
      Dedup.ngramJaccardExact(cleanDocs).select("doc_a", "doc_b"))
    val paraDup = Paragraphs.paragraphDupPerDoc(cleanDocs, paraTokens)
    Dedup.softDedupWeights(cleanDocs, labels, paraDup)
      .join(cleaned.select(col("doc_id"),
        col("n_dropped").as("n_within_dropped")), "doc_id")
      .select(col("doc_id"), col("n_within_dropped"), col("cluster_size"),
        col("n_paras"), col("n_dup"), col("weight"))
  }
}
