package graft

import graft.operators.{Relational, Tfidf}
import graft.sources.Tables

/** Physical-plan quality gates: the properties that keep these operators
  * viable at 100 TB must hold in the planned query, not just in intent. */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("top-k ranking plans as TakeOrderedAndProject, not a global sort") {
    val p = plan(Tfidf.topKByValue(
      Tables.orders(spark, dir), "o_totalprice", 10, Seq("o_orderkey")))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("q1 pushes the shipdate filter and prunes columns at the parquet scan") {
    val df = SparkEntry.queries("q1_pricing_summary")(spark, dir)
    val scan = df.queryExecution.sparkPlan.collectLeaves().map(_.toString).mkString("\n")
    assert(scan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), scan.take(2000))
    assert(!scan.contains("l_orderkey"), "unused columns must not be read")
  }

  test("q3 star join broadcasts the dimension side") {
    val p = plan(Relational.q3TopRevenue(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("tfidf pipeline reads the corpus once (cached term counts)") {
    val df = Tfidf.pipeline(Tables.documents(spark, dir))
    df.count()
    val p = plan(df)
    assert(p.contains("InMemoryTableScan"), p.take(2000))
  }

  test("tokenize reads only (doc_id, text) from the documents scan") {
    val scan = Tfidf.tokenizePortable(Tables.documents(spark, dir))
      .queryExecution.sparkPlan.collectLeaves().map(_.toString).mkString("\n")
    assert(scan.contains("ReadSchema: struct<doc_id:bigint,text:string>"), scan.take(1200))
  }

  test("hive-partitioned writes prune partitions at the scan") {
    val wh = java.nio.file.Files.createTempDirectory("graft_part").toString
    import org.apache.spark.sql.functions._
    Tables.orders(spark, dir)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.partitionBy("o_year").mode("overwrite").parquet(s"$wh/orders_p")
    val pruned = spark.read.parquet(s"$wh/orders_p").where(col("o_year") === 1996)
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("PartitionFilters: [isnotnull(o_year"), scan.take(1500))
    assert(pruned.count() > 0)
  }

  test("as-of join core plans exactly one hash exchange (union-tag-window, no range explosion)") {
    val df = Relational.eventsAsofOrders(spark, dir)
    df.collect() // finalize the adaptive plan
    // AQE's toString prints the plan twice (final + initial) — gate on the
    // final section only
    val p = plan(df).split("== Initial Plan ==")(0)
    val hashExchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    // exactly 2: the orders equal-time pre-dedup agg + the ONE as-of key
    // exchange feeding the window; schema alignment must not add any
    assert(hashExchanges == 2, s"expected 2 hash exchanges, got $hashExchanges:\n" + p.take(3000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "as-of must not plan a join explosion:\n" + p.take(2000))
  }

  test("chunkDocuments is per-row map work: no exchange before the final sort") {
    val df = graft.operators.TextAnalysis.chunkDocuments(
      Tables.documents(spark, dir), 64, 16)
    val p = plan(df).split("== Initial Plan ==")(0)
    // tokenize + window-slice + fingerprint are all generate/project over
    // the scan; the ONLY exchange is the output ORDER BY's range partition
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(_.contains("rangepartitioning")),
      s"chunking must not shuffle before the sort:\n${exchanges.mkString("\n")}")
    val scan = df.queryExecution.sparkPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "chunking must read only (doc_id, text):\n" + scan.take(1200))
  }

  test("epochShuffle plans a range-partitioned sort, no window, no single-partition funnel") {
    val df = graft.operators.TextAnalysis.epochShuffle(
      Tables.documents(spark, dir), epoch = 1)
    val p = plan(df).split("== Initial Plan ==")(0)
    assert(!p.contains("Window"), "no global window allowed:\n" + p.take(1500))
    assert(!p.contains("SinglePartition"),
      "shuffle order must not funnel through one partition:\n" + p.take(1500))
    assert(p.contains("rangepartitioning"), p.take(1500))
  }

  test("weightedSourceSample pushes the row filter below any exchange") {
    val df = graft.operators.TextAnalysis.weightedSourceSample(
      Tables.documents(spark, dir), Map("src0" -> 0.5, "src1" -> 0.2))
    // the sample decision is a pure row predicate over the scan: no
    // exchange, no aggregation — one narrow Filter stage
    val p = plan(df)
    assert(!p.contains("Exchange"), "sampling must not shuffle:\n" + p.take(1500))
    assert(p.contains("Filter"), p.take(1500))
  }

  test("duplicateSpans joins, never pairs: no cartesian/nested-loop, no window") {
    val df = graft.operators.Curation.duplicateSpans(Tables.documents(spark, dir), 5)
    df.collect()
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "span marking must stay an equi-join:\n" + p.take(2000))
    assert(!p.contains("Window"), "no gram-partitioned window (skew):\n" + p.take(2000))
    // the occurrence-count side partial-aggregates map-side before its exchange
    assert(p.contains("HashAggregate"), p.take(2000))
  }

  test("exactSubstr spans: equi-joins only, no window, no gram-string exchange") {
    val toks = graft.operators.Tfidf.tokenArrays(Tables.documents(spark, dir))
    val df = graft.operators.ExactSubstr.spansFromTokens(toks, 12)
    df.collect()
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "candidate and verify stages must stay equi-joins:\n" + p.take(2000))
    assert(!p.contains("Window"),
      "region merge folds per-doc arrays, never a window:\n" + p.take(2000))
    // the full-corpus exchanges carry the 8-byte window hash or doc_id —
    // a `gram` string must never key an exchange over ALL windows (that is
    // the n× corpus shuffle this operator exists to avoid; the verify
    // stage's gram exchange sees candidate rows only, whose volume the
    // hash prefilter already cut)
    val fullWindowExchanges = p.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning"))
      .filter(l => l.contains("wh#")).size
    assert(fullWindowExchanges >= 1,
      "candidate counting must key on the rolling hash:\n" + p.take(2000))
    assert(p.contains("graft_window_hashes"),
      "candidates must come from the rolling kernel:\n" + p.take(2000))
  }

  test("depth profile from cascade levels: flat fixed-fan plan, bounded exchanges") {
    val toks = graft.operators.Tfidf.tokenArrays(Tables.documents(spark, dir))
    val verified = graft.operators.ExactSubstr.duplicateWindowsFromTokens(toks, 12)
    val levels = graft.operators.ExactSubstr.cascadeLevels(
      toks, verified.select("doc_id", "pos"), 12, 3)
    val df = graft.operators.ExactSubstr.dupLengthProfileFromLevels(levels)
    df.collect()
    val p = plan(df)
    // every level is lineage-cut (pin), so the profile plan must be a
    // fixed fan of per-level aggregates over pinned/stored marked sets —
    // the r8 live-cascade spelling embedded the verify pipeline per level
    // and compiled a 953-exchange plan
    val nEx = "Exchange".r.findAllMatchIn(p).length
    assert(nEx <= 24, s"depth-profile plan must stay bounded, got $nEx exchanges:\n" +
      p.take(2000))
    assert(!p.contains("graft_window_hashes"),
      "serving the profile must not re-run candidate generation:\n" + p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "no verify joins may survive into the serving plan:\n" + p.take(2000))
  }

  test("bigramPmi: per-doc extraction (no self-join), top-k heap, no window") {
    val df = graft.operators.TextAnalysis.bigramPmi(Tables.documents(spark, dir), 1L, 10)
    df.collect()
    val p = plan(df)
    assert(p.contains("TakeOrderedAndProject"), "top-k must be a heap:\n" + p.take(2000))
    assert(!p.contains("Window"), "no window over bigram keys:\n" + p.take(2000))
    // the only nested-loop joins allowed are the two one-row totals
    // broadcasts (scalar attach); a token self-join would be a shuffled
    // CartesianProduct over the corpus
    assert(!p.contains("CartesianProduct"),
      "bigrams come from array slicing, never a token self-join:\n" + p.take(2000))
  }

  test("semanticDedup: broadcast centroids, list-keyed pair join, no cartesian") {
    val df = graft.operators.Dedup.semanticDedup(
      Tables.embeddings(spark, dir), nClusters = 16, tau = 0.4)
    df.collect()
    val p = plan(df)
    // centroid attach is a broadcast (C rows), never a shuffled join of the
    // corpus against itself; the only pair join is ON list_id
    assert(p.contains("BroadcastExchange"), "centroids must broadcast:\n" + p.take(2000))
    assert(!p.contains("CartesianProduct"),
      "pair candidates come from the list_id equi-join, never all-pairs:\n" + p.take(2000))
    assert(!p.contains("Window"), "assignment argmax is max_by, not a window:\n" + p.take(2000))
  }

  test("coded SemDeDup: the list_id pair join carries codes, never full vectors") {
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val df = graft.operators.Dedup.semanticDedupCoded(
      Tables.embeddings(spark, dir), nClusters = 16, tau = 0.4)
    df.collect()
    val pairJoins = df.queryExecution.sparkPlan.collect {
      case j: BaseJoinExec
          if j.leftKeys.exists(_.references.exists(_.name == "list_id")) => j
    }
    assert(pairJoins.nonEmpty, "expected the list_id-keyed pair join")
    // the Σ|cluster|² join's inputs must be the NARROW coded projection:
    // int8 codes + scalars. A full array<double> column here is the exact
    // shuffle-bytes regression this variant exists to prevent.
    pairJoins.foreach { j =>
      val wide = (j.left.output ++ j.right.output).filter(_.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      })
      assert(wide.isEmpty,
        s"pair join carries full vectors: ${wide.map(_.name).mkString(", ")}")
    }
    assert(!plan(df).contains("CartesianProduct"))
  }

  /** Flatten a physical plan INCLUDING the cached plans behind any
    * InMemoryTableScan: operator-internal persists (e.g. the
    * self-retrieval pair table) move their upstream join/agg subtree into
    * an InMemoryRelation, and a plan-shape assertion must still see it. */
  private def flattenWithCached(
      p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    p.collect { case n => n }.flatMap {
      case s: InMemoryTableScanExec => s +: flattenWithCached(s.relation.cachedPlan)
      // AQE wrappers are LEAF nodes — collect stops at them; recurse into
      // the current physical plan underneath
      case a: AdaptiveSparkPlanExec => a +: flattenWithCached(a.executedPlan)
      case n => Seq(n)
    }
  }

  test("selfRetrievalEval with stored postings: keywords broadcast, postings stream") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    // mimic the registered shape: scores as a PARQUET asset (file stats
    // present — exactly what flipped the optimizer's build side before
    // the explicit broadcast was spelled)
    val docs = Tables.documents(spark, dir)
    val tc = graft.operators.Tfidf.termCounts(
      graft.operators.Tfidf.tokenizePortable(docs))
    val n = docs.count()
    val tmp = java.nio.file.Files.createTempDirectory("plan_bm25").toFile
    graft.operators.Tfidf.bm25FromCounts(tc, n)
      .write.mode("overwrite").parquet(tmp.getAbsolutePath)
    val df = graft.operators.Tfidf.selfRetrievalEvalFromCounts(tc, n,
      prebuiltScores = Some(spark.read.parquet(tmp.getAbsolutePath)))
    val postingJoins = flattenWithCached(df.queryExecution.sparkPlan).collect {
      case j: BroadcastHashJoinExec
          if j.leftKeys.exists(_.references.exists(_.name == "term")) &&
            (j.left.output ++ j.right.output).exists(_.name == "q_doc") => j
    }
    assert(postingJoins.nonEmpty, "expected the keywords×postings term join")
    postingJoins.foreach { j =>
      val buildOut = j.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left.output
        case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right.output
      }
      // the BUILD (broadcast) side must be the probe-keyword rows — at
      // scale the postings table cannot be broadcast, whatever file
      // stats claim
      assert(buildOut.exists(_.name == "q_doc"),
        s"postings were broadcast instead of keywords: build side ${buildOut.map(_.name)}")
    }
  }

  test("served BM25 postings: warm serving is exchange-free above the cached scan") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    // first access pins the served index (ONE round-robin spread shuffle +
    // persist — a property of the index, not of any query)
    SparkEntry.bm25ServedPostings(spark, dir)
    // a warm serving query must read the cached, pre-spread blocks with NO
    // Exchange between the postings scan and the keyword join — the r6
    // regression was a per-execution repartition re-paying the postings
    // shuffle on every warm query
    val df = SparkEntry.queries("self_retrieval_ranks")(spark, dir)
    val joins = flattenWithCached(df.queryExecution.sparkPlan).collect {
      case j: BroadcastHashJoinExec
          if j.leftKeys.exists(_.references.exists(_.name == "term")) &&
            (j.left.output ++ j.right.output).exists(_.name == "q_doc") => j
    }
    assert(joins.nonEmpty, "expected the keywords×postings term join")
    joins.foreach { j =>
      val stream = j.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.right
        case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.left
      }
      assert(stream.collect { case s: InMemoryTableScanExec => s }.nonEmpty,
        s"postings side is not the cached served index:\n${stream.toString.take(1500)}")
      assert(stream.collect { case e: ShuffleExchangeLike => e }.isEmpty,
        s"warm serving re-pays a postings shuffle:\n${stream.toString.take(1500)}")
    }
  }

  test("lmDocScores: array-sliced transitions, no window, one-row vocab broadcast") {
    val df = graft.operators.TextAnalysis.lmDocScoresFromTokens(
      graft.operators.Tfidf.tokenArrays(Tables.documents(spark, dir)))
    df.collect()
    val p = plan(df)
    assert(!p.contains("Window"), "no window over transition keys:\n" + p.take(2000))
    assert(!p.contains("CartesianProduct"),
      "transitions are per-row slices; the only loose join is the one-row vocab:\n" +
        p.take(2000))
    assert(p.contains("HashAggregate"), p.take(2000))
  }

  test("partMinCostSupplier: single struct-min aggregation — no window, no self-join") {
    val df = Relational.partMinCostSupplier(spark, dir)
    df.collect()
    val p = plan(df)
    assert(!p.contains("Window"), "arg-min must not window over part keys:\n" + p.take(2000))
    assert(!p.contains("Join"),
      "arg-min is one struct-min aggregate, never a pair-table self-join:\n" + p.take(2000))
    assert(p.contains("HashAggregate"), p.take(2000))
  }

  test("q6 pushes every predicate into the parquet scan") {
    val df = Relational.q6ForecastRevenue(spark, dir)
    df.collect()
    val p = plan(df)
    // the PushedFilters list is string-elided in plan dumps, so match its
    // stable head; the quantity bound is visible in the post-scan Filter
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      "filters must reach the scan's PushedFilters:\n" + p.take(2500))
    assert(!p.contains("Join"), "q6 is scan+aggregate only:\n" + p.take(2000))
  }

  test("q4 plans the EXISTS as a semi join, never materializing line detail") {
    val df = Relational.q4OrderPriority(spark, dir)
    df.collect()
    val p = plan(df)
    assert(p.contains("LeftSemi"), "EXISTS must plan as a semi join:\n" + p.take(2000))
  }

  test("q21 plans semi + anti self-joins, no cartesian product") {
    val df = Relational.q21SuppliersKeptWaiting(spark, dir)
    df.collect()
    val p = plan(df)
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"),
      "EXISTS/NOT EXISTS must plan as semi/anti joins:\n" + p.take(2500))
    assert(!p.contains("Cartesian") && !p.contains("BroadcastNestedLoop"),
      "supplier-inequality must ride the order-key equi-join as a residual:\n" +
        p.take(2500))
    assert(p.contains("TakeOrderedAndProject"), "top-k must heap:\n" + p.take(2000))
  }

  test("q16 excludes complainers with a broadcast anti join before the count") {
    val df = Relational.q16SupplierCounts(spark, dir)
    df.collect()
    val p = plan(df)
    assert(p.contains("LeftAnti"), "NOT IN must plan as an anti join:\n" + p.take(2000))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "the tiny supplier/part sides must broadcast:\n" + p.take(2000))
  }

  test("q2 winner decoration broadcasts dims and heaps the top-100") {
    val df = Relational.q2MinCostSupplier(spark, dir)
    df.collect()
    val p = plan(df)
    assert(p.contains("TakeOrderedAndProject"), "top-k must heap:\n" + p.take(2000))
    assert(p.contains("BroadcastHashJoin"),
      "part/supplier/nation/region must broadcast:\n" + p.take(2000))
    assert(!p.contains("Window"), "arg-min must stay agg+join-back:\n" + p.take(2000))
  }

  test("qualityScore plans ONE native text scan: no regex, stats computed once") {
    val df = graft.operators.TextAnalysis.qualityScore(Tables.documents(spark, dir))
    df.collect() // finalize THIS dataset's adaptive plan so codegen stages exist
    val p = plan(df)
    assert(p.contains("graft_text_stats"), p.take(2000))
    // the signals the one-pass scan replaced must not reappear
    for (bad <- Seq("regexp_replace", "regexp_extract_all", "split("))
      assert(!p.contains(bad), s"regex pass '$bad' crept back:\n" + p.take(2000))
    // subexpression elimination must evaluate the struct ONCE per row even
    // though seven output columns read fields off it
    val code = org.apache.spark.sql.execution.debug.codegenString(
      df.queryExecution.executedPlan)
    val calls = "TextStatsUtil\\.compute\\(".r.findAllIn(code).size
    assert(calls == 1, s"expected one native scan call in codegen, got $calls")
  }

  test("sampled rank filters: quantile sketch + broadcast, no per-source sort") {
    val docs = Tables.documents(spark, dir)
    for (df <- Seq(
        graft.operators.TextAnalysis.qualityRankFilterSampled(docs, 0.25),
        graft.operators.TextAnalysis.perplexityBucketsSampledKn(docs,
          graft.operators.Tfidf.tokenArrays(docs),
          graft.operators.TextAnalysis.bigramCountsFromTokens(
            graft.operators.Tfidf.tokenArrays(docs))),
        // the registered (enriched-asset-served) form must keep the same
        // no-per-source-sort plan shape
        graft.operators.TextAnalysis.perplexityBucketsSampledKnServed(docs,
          graft.operators.Tfidf.tokenArrays(docs),
          graft.operators.TextAnalysis.kn2EnrichedModel(
            graft.operators.TextAnalysis.bigramCountsFromTokens(
              graft.operators.Tfidf.tokenArrays(docs)))))) {
      df.collect()
      val p = plan(df)
      // the whole point of the variant: the per-source ranking Window —
      // a single-partition funnel for a pathologically large source — is
      // replaced by a mergeable percentile sketch + a broadcast join
      assert(!p.contains("Window"),
        "thresholds form must not rank per source:\n" + p.take(2000))
      assert(p.contains("percentile_approx") || p.contains("ApproximatePercentile"),
        "thresholds must come from the mergeable sketch:\n" + p.take(2000))
      assert(p.contains("BroadcastExchange"),
        "thresholds must broadcast back:\n" + p.take(2000))
      assert(!p.contains("CartesianProduct"), p.take(2000))
    }
  }

  test("bucketed token-budget selector never windows the full corpus") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, dir)
    val scored = graft.operators.TextAnalysis.qualityScore(docs)
      .select(col("doc_id"), col("quality").as("score"))
      .join(docs.select(col("doc_id"),
        graft.functions.TextFunctions.surfaceStats(col("text"))
          .getField("n_tokens").cast("long").as("n_tokens")), "doc_id")
      .cache()
    try graft.operators.CacheScope {
      scored.count()
      // budget the whole corpus fits: no window, no sort anywhere
      val all = graft.operators.Curation.tokenBudgetSelectBucketed(
        scored, budgetTokens = 100000000L)
      all.collect()
      val pAll = plan(all)
      assert(!pAll.contains("Window"),
        "an all-fits budget must not plan a window:\n" + pAll.take(2000))
      // crossing budget: a window exists, but only above the boundary-
      // bucket filter — the full-corpus branch stays window-free
      val cut = graft.operators.Curation.tokenBudgetSelectBucketed(
        scored, budgetTokens = 500L)
      cut.collect()
      val pCut = plan(cut)
      assert(pCut.contains("Window"), pCut.take(2000))
      // the boundary-bucket equality must sit BELOW the window — the only
      // windowed rows are that one bucket's (the bucket column is served
      // from the consistency persist, so the predicate is on `bucket`)
      assert("(?s)Window.*?bucket#\\d+L? = \\d+".r
        .findFirstIn(pCut).isDefined,
        "the window input must be the boundary-bucket filter:\n" + pCut.take(3000))
    } finally scored.unpersist()
  }

  test("batch token quota plans a spillable window, never a stateful group-materialize") {
    val df = graft.streaming.Streams.tokenQuotaBatch(
      Tables.documents(spark, dir).select("doc_id", "source", "text"),
      budgetPerSource = 800L)
    df.collect()
    val p = plan(df)
    // the r11 weak mark: batch mode must NOT route through
    // flatMapGroupsWithState (an O(source) heap buffer in one task) —
    // the per-source running sum is a sort-based window that spills
    assert(!p.contains("FlatMapGroupsWithState"),
      "batch quota must not buffer whole sources in one task:\n" + p.take(2000))
    assert(!p.contains("SerializeFromObject"),
      "batch quota must stay in Tungsten rows (no object round-trip):\n" + p.take(2000))
    assert(p.contains("Window"),
      "the per-source running sum must be a window:\n" + p.take(2000))
  }

  test("batch span dedup plans an aggregate + join, never a stateful group-materialize") {
    val df = graft.streaming.Streams.spanDedupBatch(
      Tables.documents(spark, dir).select("doc_id", "text"), n = 5)
    df.collect()
    val p = plan(df)
    // the r12 weak mark: batch mode must NOT route through
    // flatMapGroupsWithState (batch.toSeq buffers ALL corpus occurrences
    // of a hot gram in one task) — the first-occurrence election is a
    // map-side-combinable min-struct aggregate plus an equi-join mark-back
    assert(!p.contains("FlatMapGroupsWithState"),
      "batch span dedup must not buffer whole gram groups in one task:\n" + p.take(2000))
    assert(!p.contains("SerializeFromObject"),
      "batch span dedup must stay in Tungsten rows (no object round-trip):\n" + p.take(2000))
    // min(struct) plans as SortAggregate (struct is not a hash-agg buffer
    // type) — the scale property is the MAP-SIDE PARTIAL election, which
    // shrinks every gram to one candidate row before the exchange
    assert(p.contains("partial_min(struct(doc_id"),
      "the first-occurrence election must partial-aggregate map-side:\n" + p.take(2000))
    assert(p.contains("Join"),
      "the mark-back must be an equi-join:\n" + p.take(2000))
  }

  test("batch near-dup store plans a capped-bucket join, never a stateful group-materialize") {
    val df = graft.streaming.Streams.nearDupsBatch(
      Tables.documents(spark, dir).select("doc_id", "text"), threshold = 0.5)
    df.collect()
    val p = plan(df)
    // the r12 weak mark: batch mode must NOT route through
    // flatMapGroupsWithState (batch.toSeq buffers a whole LSH bucket in
    // one task) — the stored side is a spillable row_number window cap
    // and candidates come from a narrow bucket equi-join
    assert(!p.contains("FlatMapGroupsWithState"),
      "batch near-dups must not buffer whole LSH buckets in one task:\n" + p.take(2000))
    assert(!p.contains("SerializeFromObject"),
      "batch near-dups must stay in Tungsten rows (no object round-trip):\n" + p.take(2000))
    assert(p.contains("Window"),
      "the bucket cap must be a window election:\n" + p.take(2000))
    assert(p.contains("Join"),
      "candidates must come from the bucket equi-join:\n" + p.take(2000))
  }

  test("decontaminateSemantic broadcasts the benchmark; corpus shuffles only to aggregate") {
    val df = graft.operators.Curation.decontaminateSemantic(
      Tables.embeddings(spark, dir),
      isBenchmark = org.apache.spark.sql.functions.col("vec_id") % 53 === 0)
    val p = plan(df).split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastNestedLoopJoin"),
      "benchmark side must broadcast:\n" + p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "corpus must never shuffle for the join:\n" + p.take(2000))
    // allowed exchanges: the per-vec_id aggregate and the output sort —
    // never a join-side repartition of the corpus
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(l =>
      l.contains("hashpartitioning(vec_id") || l.contains("rangepartitioning") ||
        l.contains("BroadcastExchange")),
      s"unexpected exchange:\n${exchanges.mkString("\n")}")
  }

  test("calibration/planner grids broadcast; no corpus-side shuffle beyond the rollup") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    // threshold calibration: pair table × broadcast grid, never a sort-merge
    val pairs = Seq((1L, 2L, 0.9)).toDF("doc_a", "doc_b", "jaccard")
    val cal = plan(graft.operators.Dedup.dedupThresholdCalibration(pairs, 10))
      .split("== Initial Plan ==")(0)
    assert(cal.contains("BroadcastNestedLoopJoin"), cal.take(1500))
    assert(!cal.contains("SortMergeJoin") && !cal.contains("CartesianProduct"),
      cal.take(1500))
    // packing planner: the doc-totals rollup is the ONLY corpus shuffle;
    // the length grid rides along as a broadcast
    val tc = Seq(("w", 1L, 5L)).toDF("term", "doc_id", "cnt")
    val pk = plan(graft.operators.TextAnalysis.packingEfficiency(tc))
      .split("== Initial Plan ==")(0)
    assert(pk.contains("BroadcastNestedLoopJoin"), pk.take(1500))
    val exchanges = pk.linesIterator.filter(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange")).toSeq
    assert(exchanges.forall(l => l.contains("hashpartitioning(doc_id") ||
      l.contains("hashpartitioning(max_len") ||
      l.contains("hashpartitioning(_groupingexpression") || // cast-grouped max_len
      l.contains("rangepartitioning")),
      s"unexpected exchange:\n${exchanges.mkString("\n")}")
  }

  test("native normalizer stays inside WholeStageCodegen") {
    val toks = Tfidf.tokenizePortable(Tables.documents(spark, dir))
    toks.collect() // finalize THIS dataset's adaptive plan (count() would plan separately)
    val p = plan(toks)
    assert(p.contains("trim_non_alpha"), p.take(2000))
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("Project")),
      "expected codegen'd project stage:\n" + p.take(2000))
  }

  test("contrast selection head heaps (TakeOrderedAndProject), never a full sort") {
    val df = SparkEntry.queries("perplexity_contrast_top64")(spark, dir)
    df.collect()
    val p = plan(df)
    assert(p.contains("TakeOrderedAndProject"), "top-k must heap:\n" + p.take(2000))
  }
}
