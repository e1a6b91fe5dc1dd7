package graft

import graft.operators.{Dedup, Similarity, Tfidf}
import graft.sources.Tables

/** Dev stress runner: document/embedding operators on a replicated corpus
  * (default /tmp/stress, ~20× sf0.1) to observe scaling behavior beyond the
  * fixture sizes. */
object DevStress {
  def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[stress] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $r")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/stress")
    val spark = GraftSession.create()
    val docs = Tables.documents(spark, dir)
    val embs = Tables.embeddings(spark, dir)
    println(s"[stress] docs=${docs.count()} vecs=${embs.count()}")

    time("tfidf_full")(Tfidf.pipeline(docs, portable = true).count())
    time("tfidf_top100")(
      Tfidf.topKByValue(Tfidf.pipeline(docs, portable = true), "tfidf", 100,
        Seq("term", "doc_id")).count())
    time("dedup_exact")(Dedup.exact(docs).count())
    time("minhash_pairs")(Dedup.minhashPairs(docs, threshold = 0.5).count())
    time("simhash_pairs")(Dedup.simhashPairs(docs).count())
    time("ngram_jaccard_capped")(Dedup.ngramJaccardExact(docs, 0.5).count())
    // the sketch gate (like the verifier's gram cap) presumes exact dedup
    // ran first — on this deliberately 20x-duplicated corpus the capped
    // verifier strips cloned content wholesale, so gate the deduped slice
    val keepers = Dedup.exact(docs)
      .select(org.apache.spark.sql.functions.col("keeper").as("doc_id"))
    time("minhash_gate_deduped")(
      Dedup.sketchQualityGate(docs.join(keepers, "doc_id"), "minhash").count())
    time("dedup_clusters")(Dedup.connectedComponents(
      Dedup.minhashPairs(docs, threshold = 0.5).select(
        org.apache.spark.sql.functions.col("doc_a"),
        org.apache.spark.sql.functions.col("doc_b"))).count())
    time("decontaminate")(graft.operators.Curation.decontaminate(
      docs.where(org.apache.spark.sql.functions.col("doc_id") % 53 =!= 0),
      docs.where(org.apache.spark.sql.functions.col("doc_id") % 53 === 0)).count())
    time("repetition_stats")(graft.operators.Curation.repetitionStats(docs).count())
    time("boilerplate_grams")(graft.operators.Curation.boilerplateGrams(docs).count())
    time("streaming_neardups")(graft.streaming.Streams.streamingNearDups(
      docs.select("doc_id", "text"), threshold = 0.5).count())
    time("knn_top10")(Similarity.knnBruteForce(embs, 0L to 9L, 10).count())
    time("ann_top10")(Similarity.annCosineLsh(embs, 0L to 9L, 10).count())
    time("ivf_top10")(Similarity.ivfSearch(embs, 0L to 9L, 10).count())
    time("embedding_near_dups")(Similarity.cosinePairsLsh(embs, 0.95).count())
    // index built once, searched twice — the production shape
    val idx = time("ann_index_build") {
      val built = graft.operators.ProductQuantization.buildIndex(embs)
      graft.operators.ProductQuantization.writeIndex(built, "/tmp/stress_annidx")
      graft.operators.ProductQuantization.loadIndex(spark, "/tmp/stress_annidx")
    }
    time("pq_top10_indexed")(
      graft.operators.ProductQuantization.pqSearch(idx, embs, 0L to 9L, 10, 300).count())
    time("ivfpq_top10_indexed")(
      graft.operators.ProductQuantization.ivfPqSearch(idx, embs, 0L to 9L, 10, 12, 300).count())
    if (new java.io.File(s"$dir/lineitem.parquet").exists()) {
      time("q1_pricing")(SparkEntry.queries("q1_pricing_summary")(spark, dir).count())
      time("q3_top_revenue")(SparkEntry.queries("q3_top_revenue")(spark, dir).count())
      time("q5_region_revenue")(SparkEntry.queries("q5_region_revenue")(spark, dir).count())
      time("top_orders_window")(SparkEntry.queries("top_orders_per_customer")(spark, dir).count())
      time("top_orders_heapagg")(SparkEntry.queries("top_orders_per_customer_agg")(spark, dir).count())
      time("events_asof_orders")(SparkEntry.queries("events_asof_orders")(spark, dir).count())
      time("sessionize_2m")(SparkEntry.queries("sessionize_events")(spark, dir).count())
      time("trailing_10min_2m")(SparkEntry.queries("events_trailing_10min")(spark, dir).count())
      time("pivot_2m")(SparkEntry.queries("events_pivot_by_type")(spark, dir).count())
    }
    time("duplicate_spans")(graft.operators.Curation.duplicateSpans(docs).count())
    time("duplicate_spans_hashed")(graft.operators.Curation.duplicateSpansHashed(docs).count())
    // toRdd: a plain count() would let Catalyst eliminate the row-preserving
    // re-assembly joins and measure a bare scan
    time("span_dup_stats")(graft.operators.Curation.spanDupStats(docs)
      .queryExecution.toRdd.count())
    time("strip_duplicate_spans")(graft.operators.Curation.stripDuplicateSpans(docs)
      .queryExecution.toRdd.count())
    time("compression_stats")(graft.operators.TextAnalysis.compressionStats(docs)
      .queryExecution.toRdd.count())
    time("keywords_per_doc")(Tfidf.keywordsPerDoc(docs).count())
    time("more_like_this")(Tfidf.moreLikeThis(docs, 0L).count())
    time("bm25_search")(Tfidf.searchByTermsBm25(docs, Seq("table", "query", "spark")).count())
    time("quality_score_100k")(graft.operators.TextAnalysis.qualityScore(docs).count())
    time("lang_id_100k")(graft.operators.TextAnalysis.langId(docs).count())
    time("packing_100k")(graft.operators.TextAnalysis.sequencePacking(docs).count())
    time("dataset_split_100k")(graft.operators.TextAnalysis.datasetSplit(docs).count())
    spark.stop()
  }
}
