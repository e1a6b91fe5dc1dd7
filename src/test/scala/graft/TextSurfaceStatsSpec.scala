package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** The one-pass native TextSurfaceStats scan must be indistinguishable,
  * field by field, from the regex formulation it replaced (the original
  * qualityScore/gopherRules spelling) on any input — that equivalence is
  * what keeps the DuckDB oracle rows for `quality_score`, `gopher_rules`,
  * and every manifest/rollup built on them unchanged. */
class TextSurfaceStatsSpec extends SparkSpec {
  import spark.implicits._

  /** The original regex/split spelling of each field. */
  private def regexFields(text: Column): Seq[Column] = {
    val stopRx = "\\b(" + TextFunctions.EnglishStopwords.mkString("|") + ")\\b"
    val words = split(text, "\\s+")
    Seq(
      length(text).cast("long").as("n_chars"),
      length(regexp_replace(text, "[^a-zA-Z]", "")).cast("long").as("n_alpha"),
      length(regexp_replace(text, "[^0-9]", "")).cast("long").as("n_digit"),
      length(regexp_replace(text, "[^.,;:!?'\"()-]", "")).cast("long").as("n_punct"),
      length(regexp_replace(text, "[^ \\t\\n]", "")).cast("long").as("n_ws"),
      size(words).cast("long").as("n_tokens"),
      aggregate(transform(words, w => length(w).cast("long")), lit(0L),
        (a, x) => a + x).as("sum_word_len"),
      size(filter(words, w => w.rlike("[a-zA-Z]"))).cast("long").as("n_alpha_words"),
      size(regexp_extract_all(text, lit(stopRx), lit(0))).cast("long")
        .as("n_stop_hits"))
  }

  private val fieldNames = Seq("n_chars", "n_alpha", "n_digit", "n_punct",
    "n_ws", "n_tokens", "sum_word_len", "n_alpha_words", "n_stop_hits")

  private def compare(df: DataFrame, text: Column): Unit = {
    val st = TextFunctions.surfaceStats(text)
    val native = fieldNames.map(f => st.getField(f).as(s"nat_$f"))
    val rows = df.select((Seq(text.as("t")) ++ native ++ regexFields(text)): _*)
      .collect()
    rows.foreach { r =>
      fieldNames.zipWithIndex.foreach { case (f, i) =>
        assert(r.getLong(1 + i) == r.getLong(1 + fieldNames.size + i),
          s"field $f differs on input '${r.getString(0)}'")
      }
    }
  }

  test("native == regex on curated edge cases") {
    val cases = Seq(
      "", " ", "  ", "\t\n", "\r", "\f", "a", "A", "the", "The", "THE",
      "the the the", " the ", "the.", "(the)", "the,that;for", "another",
      "them", "thé", "theé", "a_b", "the_", "_the", "the2", "2the",
      "is it", "as-at", "by'be", "this\tare", "don't stop me now",
      "  leading", "trailing  ", "a  b", "1 22 333", "...!!??",
      "ünïcödé is the way", "日本語 the 猫", "猫the猫", "a猫b the",
      "😀 the 😀", "word 😀word",
      "x".*(300) + " the " + "y".*(300),
      "that with this are four-byte-max stopwords",
      "thatthat", "witha", "a a a a a", "of, of. of; of",
    )
    compare(cases.toDF("t"), col("t"))
  }

  test("native == regex on 3000 seeded random strings") {
    val rnd = new scala.util.Random(7)
    val pool = "ab theTHE.,;:!?'\"()-_ 0123456789\t\n\r\f猫é日 ofisto"
    val cases = Seq.fill(3000)(
      Seq.fill(rnd.nextInt(40))(pool(rnd.nextInt(pool.length))).mkString)
    compare(cases.toDF("t"), col("t"))
  }

  test("native == regex on the sf0.001 documents fixture") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    compare(docs, col("text"))
  }

  test("null text propagates null fields") {
    val got = Seq[Option[String]](None, Some("the"))
      .toDF("t")
      .select(TextFunctions.surfaceStats(col("t")).getField("n_stop_hits").as("h"))
      .as[Option[Long]].collect().toSeq
    assert(got == Seq(None, Some(1L)))
  }

  test("graft_text_stats is registered as a SQL function via extensions") {
    val got = spark.sql(
      "SELECT graft_text_stats('the cat, 42 dogs').n_stop_hits AS h").as[Long].head()
    assert(got == 1L)
  }
}
