package graft

/** The pure-SQL surface: every native expression/aggregator registered by
  * GraftExtensions / GraftSession.registerAggregates must be reachable from
  * `spark.sql` and agree with the typed API it mirrors. */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("SQL minhash pipeline (shingle TVF + udaf) matches the typed API") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs")).toDF("doc_id", "text")
    val typed = graft.operators.Dedup.minhashSignatures(docs, k = 128)
      .as[(Long, Array[Long])].collect().toMap
    docs.createOrReplaceTempView("sql_surface_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_minhash_agg(sh) AS sig
        |FROM (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ')) AS canon
        |      FROM sql_surface_docs)
        |LATERAL VIEW graft_shingle_hashes(canon, 5) t AS sh
        |GROUP BY doc_id""".stripMargin)
      .as[(Long, Array[Long])].collect().toMap
    typed.foreach { case (id, sig) =>
      assert(viaSql(id).toSeq == sig.toSeq, s"signature mismatch for doc $id")
    }
  }

  test("graft_deflate_len in SQL matches the Column API") {
    val docs = Seq((1L, "spam spam spam spam"), (2L, "assorted words differ"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("sql_surface_docs2")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_deflate_len(text, 6) AS n FROM sql_surface_docs2")
      .as[(Long, Long)].collect().toMap
    val viaCol = docs.select($"doc_id",
        graft.functions.TextFunctions.deflateLen($"text").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(viaSql == viaCol)
    assert(viaSql.values.forall(_ > 0))
  }

  test("bloom build + probe works from pure SQL (scalar-subquery bloom)") {
    Seq(1L, 2L, 3L).toDF("v").createOrReplaceTempView("bloom_keys")
    Seq(1L, 3L, 9L).toDF("v").createOrReplaceTempView("bloom_probe")
    // might_contain demands a constant/scalar-subquery bloom — the scalar
    // subquery form is the pure-SQL spelling of the collected literal the
    // Curation operator ships
    val hits = spark.sql(
      """SELECT v FROM bloom_probe
        |WHERE graft_bloom_contains(
        |  (SELECT graft_bloom_agg(xxhash64(v), 100L) FROM bloom_keys),
        |  xxhash64(v))
        |ORDER BY v""".stripMargin)
      .as[Long].collect().toSeq
    // no false negatives: 1 and 3 must hit; 9 may only appear as an fp
    assert(hits.contains(1L) && hits.contains(3L))
    assert(hits.toSet.subsetOf(Set(1L, 3L, 9L)))
  }
}
