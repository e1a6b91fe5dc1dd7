package graft

import graft.operators.Tfidf

/** FIXTURES.md §3 golden table — the reference normalizer chain
  * (`WordCount.java:61-85`) reproduced token for token. */
class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  private def terms(token: String): Seq[String] =
    Tfidf.tokenize(Seq((1L, token)).toDF("doc_id", "text"))
      .select("term").as[String].collect().toSeq

  val golden: Seq[(String, Seq[String])] = Seq(
    "Hello,"      -> Seq("hello"),
    "abc123"      -> Seq(),
    "&#39;"       -> Seq(),           // digit-drop runs before entity decode
    "AT&amp;T"    -> Seq("at&t"),
    "<b>Bold</b>" -> Seq("bold"),
    "a&nbsp;b"    -> Seq("a", "b"),   // decode to space + re-split
    "--pre--"     -> Seq("pre"),
    "co-op"       -> Seq("co-op"),    // interior punctuation kept
    "U.S."        -> Seq("u.s"),
    "$100"        -> Seq(),
    "..."         -> Seq(),
  )

  golden.foreach { case (in, out) =>
    test(s"normalize '$in' -> $out") { assert(terms(in) == out) }
  }

  test("multi-token line splits on whitespace runs") {
    assert(terms("  Big\t\tDATA   rocks, ") == Seq("big", "data", "rocks"))
  }

  test("portable tokenizer: lower + non-[a-z] edge trim + digit drop") {
    val got = Tfidf.tokenizePortable(
      Seq((1L, "Hello, WORLD x9 --pre-- U.S. $5")).toDF("doc_id", "text"))
      .select("term").as[String].collect().toSeq
    assert(got == Seq("hello", "world", "pre", "u.s"))
  }

  test("tokenArrays reproduces the portable token stream, order included") {
    // the token-array corpus asset must be interchangeable with
    // tokenizePortable for every derivation (term counts, windows,
    // adjacency) — same tokens, same per-doc order, empty docs kept as
    // empty arrays (they contribute no exploded rows either way)
    val docs = Seq(
      (1L, "Hello, WORLD x9 --pre-- U.S. $5"),
      (2L, "  Big\t\tDATA   rocks, "),
      (3L, "123 456 ..."),
      (4L, "co-op co-op AT&T")).toDF("doc_id", "text")
    val fromArrays = Tfidf.tokenArrays(docs)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.posexplode(
          org.apache.spark.sql.functions.col("tokens")))
      .select("doc_id", "pos", "col").as[(Long, Int, String)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    val exploded = Tfidf.tokenizePortable(docs)
      .select("doc_id", "term").as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val rebuilt = fromArrays.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(rebuilt == exploded) // doc 3 exploded to nothing on both sides
    val emptyDoc = Tfidf.tokenArrays(docs)
      .where(org.apache.spark.sql.functions.col("doc_id") === 3L)
      .select("tokens").as[Seq[String]].collect().toSeq
    assert(emptyDoc == Seq(Seq.empty)) // kept as a row, just with no tokens
  }
}
