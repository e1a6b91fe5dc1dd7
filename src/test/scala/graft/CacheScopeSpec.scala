package graft

import org.apache.spark.sql.functions._

import graft.operators.{CacheScope, Curation, Dedup, Tfidf}

/** The operator-internal cache lifecycle contract: inside `CacheScope { }`,
  * every persist an operator takes for its own plan is released at scope
  * exit; outside a scope behavior is the old plain persist. */
class CacheScopeSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "a completely different document about spark query planning"),
      (3L, "spark query planning with catalyst and tungsten at scale"),
      (4L, "short doc")
    ).toDF("doc_id", "text")
  }

  private def retainedCacheCount: Int =
    spark.sparkContext.getPersistentRDDs.size

  test("composing two operators inside a scope retains zero caches after the action") {
    spark.catalog.clearCache()
    assert(retainedCacheCount === 0)
    val out = CacheScope {
      // two operators with internal persists, composed and DRAINED inside
      // the scope (tfidf term counts + span-dedup window rows + CC frames)
      val cleaned = Curation.stripDuplicateSpans(docs, 3).collect()
      val scored = Tfidf.pipeline(docs, portable = true).collect()
      val labels = Dedup.connectedComponents(
        Dedup.ngramJaccardExact(docs, minJaccard = 0.2).select("doc_a", "doc_b")).collect()
      (cleaned.length, scored.length, labels.length)
    }
    assert(out._1 === 5 && out._2 > 0 && out._3 > 0)
    assert(retainedCacheCount === 0,
      s"scope exit must unpersist operator-internal caches, found $retainedCacheCount")
  }

  test("scopes nest: inner caches release at inner exit, outer at outer exit") {
    spark.catalog.clearCache()
    CacheScope {
      val outer = Dedup.minhashPairs(docs, threshold = 0.0)
      outer.collect()
      val duringOuter = retainedCacheCount
      assert(duringOuter > 0, "outer scope should hold the signature cache while active")
      CacheScope {
        Tfidf.pipeline(docs, portable = true).collect()
        assert(retainedCacheCount > duringOuter)
      }
      assert(retainedCacheCount === duringOuter,
        "inner scope exit must release only the inner caches")
    }
    assert(retainedCacheCount === 0)
  }

  test("outside any scope, internal persists behave as before (caller/clearCache-owned)") {
    spark.catalog.clearCache()
    Tfidf.pipeline(docs, portable = true).collect()
    assert(retainedCacheCount > 0, "no scope: the pipeline's term-count cache persists")
    spark.catalog.clearCache()
    assert(retainedCacheCount === 0)
  }

  test("scope releases caches even when the body throws") {
    spark.catalog.clearCache()
    intercept[RuntimeException] {
      CacheScope {
        Tfidf.pipeline(docs, portable = true).collect()
        assert(retainedCacheCount > 0)
        throw new RuntimeException("boom")
      }
    }
    assert(retainedCacheCount === 0)
  }

  test("connected-components output includes docs appearing only in self-pairs") {
    import spark.implicits._
    val pairs = Seq((7L, 7L), (1L, 2L)).toDF("doc_a", "doc_b")
    val labels = CacheScope {
      Dedup.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    }
    assert(labels === Map(1L -> 1L, 2L -> 1L, 7L -> 7L))
  }
}
