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
    locally {
      import org.apache.spark.sql.functions._
      val sigs = Dedup.minhashSignatures(docs)
      val banded = sigs.select(col("doc_id"), col("sig"),
        posexplode(expr(
          "transform(sequence(0, 15), b -> xxhash64(slice(sig, b * 8 + 1, 8)))"))
          .as(Seq("band", "band_hash")))
      time("  banded")(banded.count())
      val capped = banded
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("band", "band_hash").orderBy("doc_id")))
        .where(col("rn") <= 64).drop("rn")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("  capped+persist")(capped.count())
      val a = capped.select(col("band"), col("band_hash"),
        col("doc_id").as("doc_a"), col("sig").as("sig_a"))
      val b = capped.select(col("band"), col("band_hash"),
        col("doc_id").as("doc_b"), col("sig").as("sig_b"))
      val joined = a.join(b, Seq("band", "band_hash"))
        .where(col("doc_a") < col("doc_b"))
        .dropDuplicates("doc_a", "doc_b")
      time("  joined+dedup")(joined.count())
      time("  est")(joined.withColumn("jaccard_est", expr(
        "size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)) / cast(128 as double)"))
        .where(col("jaccard_est") >= 0.5).count())
      capped.unpersist()
    }
    time("minhash_pairs")(Dedup.minhashPairs(docs, threshold = 0.5).count())
    time("simhash_tokens")(graft.operators.Tfidf.tokenizePortable(docs).count())
    time("simhash_sigs")(Dedup.simhashSignatures(docs).count())
    time("simhash_pairs")(Dedup.simhashPairs(docs).count())
    time("simhash_sigs_again")(Dedup.simhashSignatures(docs).count())
    spark.stop()
  }
}
