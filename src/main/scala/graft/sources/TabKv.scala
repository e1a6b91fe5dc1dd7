package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's on-disk interchange format (SURVEY.md O20/O21): tab-
  * separated `key \t value` text, with composite keys encoded as
  * `word|filename` (`WordCount.java:97`, `TextOutputFormat` defaults).
  *
  * Provided for interoperability with existing reference outputs — the
  * engine itself never materializes intermediates in this format (one lazy
  * plan, Parquet at the edges). Reading recovers real typed columns from
  * the stringly-typed encoding; note the reference's own `|`-injection
  * corruption (SURVEY.md §7.3 point 7) cannot round-trip and is NOT
  * reproduced on write: keys containing `|` produce a parse-ambiguous line
  * in the reference, and a left-most split here.
  */
object TabKv {

  /** Write `(term, doc, score)`-shaped results as reference-compatible
    * `term|doc \t score` lines. */
  def writeScores(df: DataFrame, path: String,
      termCol: String = "term", docCol: String = "doc_id", valueCol: String = "tfidf"): Unit =
    df.select(concat_ws("\t",
        concat_ws("|", col(termCol), col(docCol)), col(valueCol)).as("line"))
      .write.mode("overwrite").text(path)

  /** Read reference job output (`word|file \t value`) back into typed
    * columns, splitting the composite key left-most like
    * `CountTF.java:58-61`. */
  def readScores(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(split(col("value"), "\t", 2).as("kv"))
      .select(split(element_at(col("kv"), 1), "\\|", 2).as("key"),
        element_at(col("kv"), 2).cast("double").as("score"))
      .select(element_at(col("key"), 1).as("term"),
        element_at(col("key"), 2).as("doc"),
        col("score"))
}
