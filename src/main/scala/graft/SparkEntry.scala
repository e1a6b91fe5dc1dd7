package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Tfidf
import graft.sources.Tables

/** Driver contract — flagship entry, declared queries, and their DuckDB
  * oracle SQL (SURVEY.md §7; parity rules §7.3).
  *
  * Float-parity strategy used by every oracle query:
  *  - int÷int double division and per-row double products are IEEE-exact in
  *    both engines → no rounding needed;
  *  - `ln` may differ in the last ulp across libms → both sides
  *    `round(·, 9)`;
  *  - SUMs of doubles are order-dependent → both sides cast each addend to
  *    a fixed-scale DECIMAL first (exact associative arithmetic), then cast
  *    the exact sum back to double;
  *  - every query ends with a total ORDER BY over output columns (on the
  *    ROUNDED values, so both engines order identical keys).
  */
object SparkEntry {

  /** Flagship: reference-exact TF-IDF ranking (the reference's whole program,
    * `TfidfMapReduce.java`) on sf0.001, with the exact `WordCount.java:61-85`
    * normalizer chain. Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    Tfidf.rankByValue(Tfidf.pipeline(docs), "tfidf", Seq("term", "doc_id"))
  }

  // ---------------------------------------------------------------------------
  // Declared queries. Each (SparkSession, sfDir) => DataFrame, hash-compared
  // against `oracleSql` by the driver (DuckDB on the same parquet).
  // ---------------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- TF-IDF family (reference parity, portable tokenizer) ---
    "tfidf_full" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Tfidf.pipeline(docs, portable = true)
        .select(col("term"), col("doc_id"), col("cnt"), col("doc_total"), col("df"),
          round(col("tf"), 9).as("tf"),
          round(col("idf"), 9).as("idf"),
          round(col("tfidf"), 9).as("tfidf"))
        .orderBy(desc("tfidf"), asc("term"), asc("doc_id"))
    }),
    "tfidf_top100" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Tfidf.topKByValue(
        Tfidf.pipeline(docs, portable = true)
          .select(col("term"), col("doc_id"), round(col("tfidf"), 9).as("tfidf")),
        "tfidf", 100, Seq("term", "doc_id"))
    }),
    "term_counts" -> ((s, dir) => {
      Tfidf.termCounts(Tfidf.tokenizePortable(Tables.documents(s, dir)))
        .orderBy("term", "doc_id")
    }),
    "doc_totals" -> ((s, dir) => {
      Tfidf.docTotals(Tfidf.termCounts(Tfidf.tokenizePortable(Tables.documents(s, dir))))
        .orderBy("doc_id")
    }),
    "doc_freq" -> ((s, dir) => {
      Tfidf.docFreq(Tfidf.termCounts(Tfidf.tokenizePortable(Tables.documents(s, dir))))
        .orderBy("term")
    }),
    // --- O19 as a generic operator: rank any table by a numeric value desc ---
    "rank_events_by_value" -> ((s, dir) => {
      Tfidf.rankByValue(
        Tables.events(s, dir).select("event_id", "user_id", "event_type", "value"),
        "value", Seq("event_id"))
    }),
    // --- Relational surface: TPC-H-ish pricing summary (agg + decimal-exact sums) ---
    "q1_pricing_summary" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,6)"))
            .cast("double").as("sum_disc_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))
            .cast("decimal(18,6)")).cast("double").as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
  )

  // ---------------------------------------------------------------------------
  // DuckDB oracle SQL. Shared portable-tokenizer CTE (FIXTURES.md §4): RE2
  // spelling of Tfidf.tokenizePortable. DuckDB `ln` = natural log (its `log`
  // is base-10); Spark `log` = natural log. Sums cast through DECIMAL exactly
  // like the Spark side; DuckDB integer-sum returns HUGEINT → cast to BIGINT.
  // ---------------------------------------------------------------------------

  private val toksCte =
    """toks AS (
      |  SELECT doc_id, regexp_replace(lower(t), '^[^a-z]+|[^a-z]+$', '', 'g') AS term
      |  FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS t FROM documents) u
      |  WHERE NOT regexp_matches(t, '[0-9]')
      |), toks2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
      |tc AS (SELECT term, doc_id, count(*) AS cnt FROM toks2 GROUP BY 1, 2)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "tfidf_full" ->
      s"""WITH $toksCte,
         |dt AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS doc_total FROM tc GROUP BY 1),
         |dfq AS (SELECT term, count(*) AS df FROM tc GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents)
         |SELECT tc.term, tc.doc_id, tc.cnt, dt.doc_total, dfq.df,
         |  round(CAST(tc.cnt AS DOUBLE) / dt.doc_total, 9) AS tf,
         |  round(ln(CAST(n.n_docs AS DOUBLE) / dfq.df), 9) AS idf,
         |  round((CAST(tc.cnt AS DOUBLE) / dt.doc_total) * ln(CAST(n.n_docs AS DOUBLE) / dfq.df), 9) AS tfidf
         |FROM tc JOIN dt USING (doc_id) JOIN dfq USING (term) CROSS JOIN n
         |ORDER BY tfidf DESC, term ASC, doc_id ASC""".stripMargin,
    "tfidf_top100" ->
      s"""WITH $toksCte,
         |dt AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS doc_total FROM tc GROUP BY 1),
         |dfq AS (SELECT term, count(*) AS df FROM tc GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents)
         |SELECT tc.term, tc.doc_id,
         |  round((CAST(tc.cnt AS DOUBLE) / dt.doc_total) * ln(CAST(n.n_docs AS DOUBLE) / dfq.df), 9) AS tfidf
         |FROM tc JOIN dt USING (doc_id) JOIN dfq USING (term) CROSS JOIN n
         |ORDER BY tfidf DESC, term ASC, doc_id ASC
         |LIMIT 100""".stripMargin,
    "term_counts" ->
      s"WITH $toksCte\nSELECT term, doc_id, cnt FROM tc ORDER BY term, doc_id",
    "doc_totals" ->
      s"""WITH $toksCte
         |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS doc_total FROM tc
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "doc_freq" ->
      s"""WITH $toksCte
         |SELECT term, count(*) AS df FROM tc
         |GROUP BY term ORDER BY term""".stripMargin,
    "rank_events_by_value" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |ORDER BY value DESC, event_id ASC""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
  )
}
