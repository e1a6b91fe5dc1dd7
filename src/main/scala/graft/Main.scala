package graft

import org.apache.spark.sql.functions._

import graft.operators.Tfidf
import graft.sources.{Tables, TabKv}

/** CLI with the reference driver's contract
  * (`TfidfMapReduce.main`, `/root/reference/src/TfidfMapReduce.java:36-100`):
  * score a corpus by TF-IDF and write the global descending ranking.
  *
  * {{{
  * runMain graft.Main <input> <output> [--format text|parquet] [--topk K]
  * }}}
  *
  *  - `<input>`: a directory of text files (reference semantics: document
  *    identity = file name, `WordCount.java:89`) or a `documents.parquet`
  *    fixture directory (auto-detected).
  *  - `<output>`: written as reference-compatible tab-KV text
  *    (`word|doc \t score`, the `SortedTFIDF/` format) or parquet.
  *  - The reference's interactive overwrite prompt
  *    (`TfidfMapReduce.java:55-60`) becomes `mode("overwrite")`.
  *  - Unlike the reference's single-reducer job 4, the ranking is a
  *    range-partitioned parallel sort; `--topk` switches to
  *    TakeOrderedAndProject.
  */
object Main {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: graft.Main <input> <output> [--format text|parquet] [--topk K]")
      sys.exit(2)
    }
    val input = args(0)
    val output = args(1)
    val format = args.sliding(2).collectFirst { case Array("--format", f) => f }.getOrElse("text")
    val topk = args.sliding(2).collectFirst { case Array("--topk", k) => k.toInt }

    val spark = GraftSession.create()
    val isParquetFixture = new java.io.File(s"$input/documents.parquet").exists()
    val docs =
      if (isParquetFixture)
        Tables.documents(spark, input).select(col("doc_id").cast("string").as("doc"), col("text"))
      else Tables.textDir(spark, input)

    // reference semantics: N = number of directory entries — for raw text
    // dirs that is the FILE count (empty files included), not the line-row
    // count (`TfidfMapReduce.java:47-52`)
    val renamed = docs.select(col("doc").as("doc_id"), col("text"))
    val scored =
      if (isParquetFixture) Tfidf.pipeline(renamed)
      else {
        val nFiles = Option(new java.io.File(input).listFiles()).map(_.length.toLong).getOrElse(0L)
        Tfidf.pipeline(renamed, nFiles, portable = false)
      }
    val ranked = topk match {
      case Some(k) => Tfidf.topKByValue(scored, "tfidf", k, Seq("term", "doc_id"))
      case None => Tfidf.rankByValue(scored, "tfidf", Seq("term", "doc_id"))
    }
    format match {
      case "parquet" => ranked.write.mode("overwrite").parquet(output)
      case _ => TabKv.writeScores(ranked, output)
    }
    println(s"[graft] wrote ${format} ranking to $output")
    spark.stop()
  }
}
