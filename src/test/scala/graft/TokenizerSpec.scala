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
}
