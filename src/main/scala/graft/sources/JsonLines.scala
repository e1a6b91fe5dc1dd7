package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL (newline-delimited JSON) document source/sink — the de-facto
  * interchange format for LLM training corpora (one document object per
  * line, as produced by Common-Crawl-derived pipelines and expected by most
  * tokenizer/training toolchains).
  *
  * Scale stance:
  *  - The schema is EXPLICIT, never inferred: schema inference is a full
  *    extra pass over 100 TB before the real read even starts, and a
  *    corrupt line late in the corpus can silently widen a column type.
  *  - Malformed lines go to a `_corrupt` column (PERMISSIVE mode) instead
  *    of failing the job — at corpus scale there are ALWAYS bad lines, and
  *    dropping them must be an explicit, observable decision
  *    ([[readDocumentsStrictness]] counts them).
  *  - Text files split by line, so parallelism is byte-range-based exactly
  *    like the reference's `TextInputFormat` — but documents with embedded
  *    newlines are safe because JSON escapes them (`\n` inside a string
  *    literal), unlike raw text dirs (SURVEY.md §1.3).
  */
object JsonLines {

  /** The documents-table schema in JSONL form. */
  val documentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("_corrupt", StringType)))

  /** Read a JSONL documents directory with the explicit schema; malformed
    * lines land in `_corrupt` with every data column null.
    *
    * Implemented as a line scan + [[from_json]] rather than
    * `spark.read.json`: with the JSON source, `_corrupt` is a scan-level
    * pseudo-column and Spark REFUSES any query that references only it
    * after pruning (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — so innocuous
    * plans like `readDocumentsClean(...).count()` used to throw. Parsing
    * through an expression makes `_corrupt` an ordinary column with no
    * such restriction, while keeping byte-range line splitting (the text
    * source splits exactly like the JSON source) and identical PERMISSIVE
    * semantics (the raw line lands in `_corrupt`, data columns null).
    * Whitespace-only lines are dropped to match the JSON source. */
  def readDocuments(spark: SparkSession, path: String): DataFrame =
    parseLines(spark.read.text(path))

  /** The shared line→document parse chain (batch and streaming reads go
    * through the same expressions, so their semantics cannot drift). */
  private def parseLines(lines: DataFrame): DataFrame =
    lines
      .where(trim(col("value")) =!= "")
      .select(from_json(col("value"), documentSchema,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt")).as("j"))
      .select(col("j.*"))

  /** Streaming (incremental) JSONL ingest with BOUNDED per-trigger intake:
    * `maxFilesPerTrigger` caps how many files each micro-batch reads — the
    * backpressure knob that keeps a backfill/replay over an arbitrarily
    * large landing directory from loading the whole backlog into one giant
    * first batch (the failure mode of an uncapped file stream pointed at
    * months of history). Emits CLEAN rows only; corrupt lines are dropped
    * silently here because a streaming sink can't quarantine to a side
    * report — run [[readDocumentsStrictness]] on the same path for audit. */
  def readDocumentsStream(spark: SparkSession, path: String,
      maxFilesPerTrigger: Int = 16): DataFrame =
    parseLines(spark.readStream
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .text(path))
      .where(col("_corrupt").isNull).drop("_corrupt")

  /** Clean rows only (corrupt lines dropped), `_corrupt` column removed —
    * what downstream operators consume. Count-safe: `.count()` and other
    * pruned-to-nothing plans work (see [[readDocuments]]). */
  def readDocumentsClean(spark: SparkSession, path: String): DataFrame =
    readDocuments(spark, path)
      .where(col("_corrupt").isNull).drop("_corrupt")

  /** One-row data-quality report for an ingest: total / clean / corrupt
    * line counts plus parsed-but-textless lines. One aggregation over one
    * scan. */
  def readDocumentsStrictness(spark: SparkSession, path: String): DataFrame =
    readDocuments(spark, path).agg(
      count(lit(1)).as("n_lines"),
      count(when(col("_corrupt").isNull, 1)).as("n_clean"),
      count(col("_corrupt")).as("n_corrupt"),
      count(when(col("_corrupt").isNull && col("text").isNull, 1)).as("n_missing_text"))

  /** Write documents as JSONL (one object per line, UTF-8). */
  def writeDocuments(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Does `path` (file, dir, or glob base) contain gzip parts? One
    * driver-side metadata listing — no data touched. */
  private[graft] def hasGzipParts(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    def dirHasGz(d: org.apache.hadoop.fs.Path): Boolean =
      fs.listStatus(d).exists(_.getPath.getName.endsWith(".gz"))
    // globStatus resolves patterns ("/corpus/2024-*") that exists() cannot;
    // for a plain path it returns that path's own status
    val matched = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Nil)
    if (matched.isEmpty) path.endsWith(".gz")
    else matched.exists { st =>
      if (st.isFile) st.getPath.getName.endsWith(".gz") else dirHasGz(st.getPath)
    }
  }

  /** [[readDocumentsClean]] with GUARANTEED post-read parallelism — the
    * ingest entry for compressed corpora. Gzip is not splittable: an
    * N-gigabyte `.gz` part scans as ONE task no matter its size, and a
    * file-size-based split estimate ([[graft.operators.Scaling.fanOut]]
    * divides bytes by the split size) cannot see that. For inputs with
    * gzip parts this repartitions the compact parsed rows to the session
    * default parallelism immediately after the scan — one cheap shuffle
    * of pre-expansion rows, before any tokenize/shingle blow-up would run
    * single-threaded per file. Uncompressed inputs delegate to `fanOut`'s
    * no-op-when-already-parallel estimate. */
  def readDocumentsFanned(spark: SparkSession, path: String): DataFrame = {
    val clean = readDocumentsClean(spark, path)
    if (hasGzipParts(spark, path))
      clean.repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
    else graft.operators.Scaling.fanOut(clean)
  }
}
