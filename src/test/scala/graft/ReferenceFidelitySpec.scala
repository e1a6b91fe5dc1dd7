package graft

import java.util.StringTokenizer

import graft.operators.Tfidf

/** Fidelity oracle for the flagship tokenizer: a literal JVM transcription
  * of the reference normalizer (`/root/reference/src/WordCount.java:61-100`
  * — same `String.replaceAll`/`replace`/`toLowerCase`/`StringTokenizer`
  * calls in the same order) fuzzed against the engine's Catalyst
  * expression chain. Any divergence in regex engine, chain order, or
  * re-split semantics fails here. */
class ReferenceFidelitySpec extends SparkSpec {
  import spark.implicits._

  /** Reference behavior, transcribed statement-for-statement. */
  private def referenceTokens(line: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val itr = new StringTokenizer(line)
    while (itr.hasMoreTokens) {
      var token = itr.nextToken()
      token = token.replaceAll(".*\\d.*", "")
      token = token.replace("&amp;", "&")
      token = token.replace("&lt;", "<")
      token = token.replace("&gt;", ">")
      token = token.replace("&quot;", "\"")
      token = token.replace("&apos;", "'")
      token = token.replace("&nbsp;", " ")
      token = token.replaceAll("<[^>]+>", "")
      token = token.replaceAll("^[\\pP\\$\\+\\-\\=\\<\\>]+", "")
      token = token.replaceAll("[\\pP\\$\\+\\-\\=\\<\\>]+$", "")
      token = token.toLowerCase()
      val st = new StringTokenizer(token)
      while (st.hasMoreTokens) out += st.nextToken()
    }
    out.result()
  }

  private def engineTokens(lines: Seq[String]): Map[Long, Seq[String]] = {
    val docs = lines.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    // collect per doc preserving per-doc order via an index column is not
    // needed: compare as multisets per doc (reference order = engine order
    // is not part of the contract; counts are)
    Tfidf.tokenize(docs).groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.sort_array(
        org.apache.spark.sql.functions.collect_list("term")).as("ts"))
      .as[(Long, Seq[String])].collect().toMap
  }

  test("engine tokenizer == transcribed reference on fuzzed lines") {
    val rnd = new scala.util.Random(1234)
    val atoms = Seq(
      "Hello", "WORLD", "abc123", "&#39;", "AT&amp;T", "<b>Bold</b>", "a&nbsp;b",
      "--pre--", "co-op", "U.S.", "$100", "...", "&quot;quoted&quot;", "x&lt;y&gt;z",
      "tag<i>in</i>side", "ünïcödé", "猫猫", "a|b", "p+q=r", "5", "", " ", "\t",
      "&apos;s", "end.", "(paren)", "[brack]", "semi;colon", "<<>>", "=-=",
    )
    val lines = Seq.fill(400) {
      Seq.fill(rnd.nextInt(12))(atoms(rnd.nextInt(atoms.length)))
        .mkString(Seq(" ", "  ", "\t", " \t ")(rnd.nextInt(4)))
    }
    val engine = engineTokens(lines)
    lines.zipWithIndex.foreach { case (line, i) =>
      val ref = referenceTokens(line).sorted
      val got = engine.getOrElse(i.toLong, Nil)
      assert(got == ref, s"line '$line'\n engine: $got\n ref:    $ref")
    }
  }

  test("engine tokenizer == transcribed reference on the fixture corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(100)
    val texts = docs.select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    val engine = Tfidf.tokenize(docs).groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.sort_array(
        org.apache.spark.sql.functions.collect_list("term")).as("ts"))
      .as[(Long, Seq[String])].collect().toMap
    texts.foreach { case (id, text) =>
      // reference consumes line-by-line; tokens never span lines
      val ref = text.split("\n", -1).toSeq.flatMap(referenceTokens).sorted
      assert(engine.getOrElse(id, Nil) == ref, s"doc $id")
    }
  }

  private object Tables {
    def documents(s: org.apache.spark.sql.SparkSession, dir: String) =
      graft.sources.Tables.documents(s, dir)
  }
}
