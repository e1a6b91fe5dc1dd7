package graft

import graft.operators.Dedup
import graft.sources.Tables

/** Dev profiling harness: stage-by-stage timings for the heavy operators. */
object DevProfile {
  def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.create()
    val docs = Tables.documents(spark, dir)
    docs.count() // warm the session

    time("shingles")(Dedup.shingles(docs).count())
    time("minhash_sigs")(Dedup.minhashSignatures(docs).count())
    time("minhash_pairs")(Dedup.minhashPairs(docs, threshold = 0.5).count())
    time("simhash_tokens")(graft.operators.Tfidf.tokenizePortable(docs).count())
    time("simhash_sigs")(Dedup.simhashSignatures(docs).count())
    time("simhash_pairs")(Dedup.simhashPairs(docs).count())
    time("simhash_sigs_again")(Dedup.simhashSignatures(docs).count())
    spark.stop()
  }
}
