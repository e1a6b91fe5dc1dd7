package graft

import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

import graft.operators.{Dedup, Similarity, Tfidf}

/** Degenerate-input behavior: empty tables, null/empty text, singleton
  * corpora. Operators must return empty/neutral results, never throw. */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def docsOf(rows: Seq[(java.lang.Long, String)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2))), docSchema)

  test("tfidf pipeline on an empty corpus returns no rows") {
    assert(Tfidf.pipeline(docsOf(Seq())).count() == 0)
  }

  test("null and empty text contribute zero tokens but still count in N") {
    val docs = docsOf(Seq((1L, "apple apple"), (2L, null), (3L, "")))
    val out = Tfidf.pipeline(docs)
      .select("term", "df", "idf").as[(String, Long, Double)].collect()
    assert(out.length == 1)
    val (term, df, idf) = out.head
    assert(term == "apple" && df == 1)
    assert(math.abs(idf - math.log(3.0 / 1.0)) < 1e-15) // N=3 despite 2 empty docs
  }

  test("dedup operators tolerate null text and singletons") {
    val docs = docsOf(Seq((1L, "only document here with several tokens"), (2L, null)))
    assert(Dedup.exact(docs).count() == 2)          // null fingerprint group kept
    assert(Dedup.minhashPairs(docs, threshold = 0.1).count() == 0)
    assert(Dedup.simhashPairs(docs).count() == 0)
    assert(Dedup.ngramJaccardExact(docs, minJaccard = 0.0).count() == 0)
  }

  test("similarity search with no matching query ids returns empty") {
    val vecs = Seq((0L, Array(1f, 0f), 0)).toDF("vec_id", "embedding", "label")
    assert(Similarity.knnBruteForce(vecs, Seq(99L), 5).count() == 0)
    assert(Similarity.annCosineLsh(vecs, Seq(99L), 5, planes = 8, bands = 2).count() == 0)
  }

  test("rankByValue on empty input returns empty") {
    assert(Tfidf.rankByValue(docsOf(Seq()), "doc_id", Seq("text")).count() == 0)
  }
}
