package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}

object Bench {

  /** Canonicalize a physical plan dump into a layout-stable fingerprint
    * input: expression ids, plan ids, file paths/sizes, and every literal
    * digit are normalized away so the SAME plan SHAPE hashes identically
    * across runs, while a structural regression (a lost broadcast, a new
    * Exchange, a join strategy flip) changes the hash. Counts of the
    * load-bearing node kinds ride along so a fingerprint DIFF is readable
    * without the full dump. */
  private[graft] def canonicalPlan(text: String): String =
    text
      .replaceAll("#\\d+L?", "#x")
      .replaceAll("plan_id=\\d+", "plan_id=x")
      .replaceAll("(?m)Location:.*$", "Location: x")
      .replaceAll("file:[^\\s,()\\[\\]]+", "path")
      .replaceAll("/[\\w./-]*(?:tmp|testdata)[\\w./-]*", "path")
      .replaceAll("Statistics\\([^)]*\\)", "Statistics(x)")
      // JVM-assigned identities: hidden-class lambda names
      // (Lambda$123/0x00007f...@5ccf) and object identity hashes vary per
      // process — a fingerprint must survive a JVM restart
      .replaceAll("Lambda\\$[^,\\s)]+", "Lambda")
      .replaceAll("@[0-9a-fA-F]+", "@x")
      .replaceAll("\\d+", "N")
      .linesIterator.map(l => stabilizeDistinctRewrite(stripTruncationTails(l)))
      .mkString("\n")

  /** Truncated metadata strings (DataFilters/ReadSchema at
    * spark.sql.maxMetadataStringLength) end mid-token at a byte offset
    * that can SHIFT when an upstream variable-length token (a JVM
    * identity hash like `[J@5ccf3a` vs `[J@91b2c4d8`) differs across
    * runs: the r9 `embedding_rp_components` fingerprint flap. Normalize
    * by cutting the partial token back to the nearest boundary so only
    * the `...` marker remains. Hand-rolled linear scan, NOT a regex —
    * `\\S*\\.\\.\\.` backtracks quadratically per token and plan dumps
    * carry multi-KB single tokens (struct ReadSchemas), which turned the
    * first spelling into minutes of driver CPU per plan. The session
    * also raises the metadata length so truncation is rare to begin
    * with; this handles the plans that still overflow it. */
  private[graft] def stripTruncationTails(line: String): String = {
    var j = line.indexOf("...")
    if (j < 0) return line
    val sb = new java.lang.StringBuilder(line.length)
    var i = 0
    while (j >= 0) {
      var k = j
      while (k > i && !Character.isWhitespace(line.charAt(k - 1)) &&
             line.charAt(k - 1) != '[' && line.charAt(k - 1) != '(' &&
             line.charAt(k - 1) != ',') k -= 1
      sb.append(line, i, k).append("...")
      i = j + 3
      j = line.indexOf("...", i)
    }
    sb.append(line, i, line.length)
    sb.toString
  }

  /** RewriteDistinctAggregates lays out its Expand projections — and the
    * column SLOTS within them, and therefore the downstream HashAggregate
    * key/output orders — by expression-id ALLOCATION order, which depends
    * on how many plans the session built earlier: semantically identical
    * plans print with permuted columns (the three multi-`count(DISTINCT)`
    * fingerprint flappers of the round-7 baseline). On Expand /
    * HashAggregate lines only, sort the comma tokens inside every
    * innermost bracket list (turning each list into its canonical
    * multiset) and then sort the Expand projection groups themselves.
    * Order within these lists is semantically irrelevant for a hash
    * aggregate; a REAL plan change — a different column, function, or an
    * extra projection — still changes the sorted form
    * ([[graft.BenchCanonSpec]] pins both directions). */
  /** Split a bracket list on ", " at paren depth 0 only: a multi-argument
    * expression like `count(a, b)` is ONE item, not two fragments — a
    * naive split could in principle canonicalize two genuinely different
    * plans to the same fingerprint. */
  private[graft] def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 && i + 1 < s.length && s.charAt(i + 1) == ' ' =>
          out += s.substring(start, i)
          start = i + 2
          i += 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.result()
  }

  private def stabilizeDistinctRewrite(line: String): String = {
    if (!line.contains("Expand") && !line.contains("HashAggregate")) return line
    val innerSorted = "\\[([^\\[\\]]*)\\]".r.replaceAllIn(line, m =>
      java.util.regex.Matcher.quoteReplacement(
        "[" + splitTopLevel(m.group(1)).sorted.mkString(", ") + "]"))
    val start = innerSorted.indexOf("[[")
    if (start < 0) return innerSorted
    val end = innerSorted.indexOf("]]", start)
    if (end < 0) return innerSorted
    val parts = innerSorted.substring(start + 2, end)
      .split("\\], \\[", -1).toSeq.sorted
    innerSorted.substring(0, start + 2) + parts.mkString("], [") +
      innerSorted.substring(end)
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** 1-minute system load average — recorded at leg start and end so a
    * bench record carries its own contention evidence (three rounds of
    * verdicts had to hand-decompose box noise from code deltas). -1 when
    * unreadable (non-Linux). */
  private def loadAvg1m(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.trim.split("\\s+")(0).toDouble finally src.close()
    } catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val loadStart = loadAvg1m()
    val spark = GraftSession.create()

    // Per-pass executor metrics, attributed via job groups: onJobStart maps
    // the group's stages, onTaskEnd accumulates executorRunTime + jvmGCTime
    // per group. Listener delivery is async — the end-of-run drain below
    // waits before reading. Metrics are DIAGNOSTIC (why did wall time
    // move: GC? executor work? scheduling?), never substituted for the
    // recorded wall times.
    val stageGroup = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val taskAgg = new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val g = Option(js.properties).map(_.getProperty("spark.jobGroup.id")).orNull
        if (g != null) js.stageIds.foreach(id => stageGroup.put(id, g))
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val g = stageGroup.get(te.stageId)
        if (g != null && te.taskMetrics != null) {
          val a = taskAgg.computeIfAbsent(g, _ => Array(0L, 0L, 0L))
          a.synchronized {
            a(0) += te.taskMetrics.executorRunTime
            a(1) += te.taskMetrics.jvmGCTime
            a(2) += 1
          }
        }
      }
    })
    def driverGcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }

    // Warm the session once (parquet reader, codegen framework, JIT) so
    // per-query timings measure the operator, not JVM initialization.
    spark.read.parquet(s"$sfDir/region.parquet").count()
    spark.range(1000000).selectExpr("sum(id)").collect()

    // ASSET PHASE (r6 VERDICT item 2): force every shared corpus asset /
    // trained index build FIRST, timed under its own name. Build cost no
    // longer lands on whichever query runs first alphabetically — every
    // query timing below is SERVING-ONLY, so a serving regression can't
    // hide behind (or be faked by) build-attribution noise.
    // Spot rehearsals (SPARK_GRAFT_BENCH_ONLY over asset-free queries at
    // sf3/sf10) restrict the asset phase the same way: a comma list of
    // asset names to force, or the empty string for none — otherwise a
    // five-query probe at 100× data would pay the FULL index/pair-table
    // build farm first. Unknown names fail fast, like BENCH_ONLY's.
    val assetOnly = sys.env.get("SPARK_GRAFT_BENCH_ASSETS")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    assetOnly.foreach { names =>
      val unknown = names -- SparkEntry.assetBuilders.map(_._1).toSet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ASSETS names not in assetBuilders: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    val assetTimes = SparkEntry.assetBuilders
      .filter { case (name, _) => assetOnly.forall(_.contains(name)) }
      .map { case (name, force) =>
      spark.sparkContext.setJobGroup(s"asset|$name", s"asset build: $name")
      val t0 = System.nanoTime()
      force(spark, sfDir)
      spark.sparkContext.clearJobGroup()
      (name, (System.nanoTime() - t0) / 1e9)
    }

    // Re-sample load AFTER sbt/JVM warmup + asset builds, right before the
    // first measured query (r14 verdict "what's wrong" #1): `load_start`
    // above can read the leg's OWN compile/warmup wake — this sample is
    // the honest contention figure for the measured window's start.
    val loadMeasureStart = loadAvg1m()

    // Each query runs twice: cold (fresh cache — includes plan compile,
    // codegen, and any per-query persists) and warm (immediately after,
    // caches intact — the steady-state cost a repeated production query
    // pays). clearCache only BETWEEN queries keeps the memory profile flat
    // across 100+ queries without poisoning the warm run.
    // Optional subset filter (comma-separated names) for targeted runs —
    // e.g. the sf1 scale rehearsal over the flagship + dedup family. The
    // driver's full run leaves it unset. Unknown names fail FAST: a typo
    // must not silently bench an empty set and report a green run.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names not in SparkEntry.queries: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    val planFps = scala.collection.mutable.LinkedHashMap[String, String]()
    val passMetrics = scala.collection.mutable.LinkedHashMap[String, (Long, Long)]() // group -> (wallPassDriverGcMs, unused)
    // Contention-aware ordering: the queries with the LARGEST task fleets
    // (measured: cold_tasks in dev/records/bench_r08_sf01_run*.json) run
    // FIRST, right after JVM warmup — the r8 metrics correlation showed
    // these absorb the CPU co-scheduling variance of a 100+-query run
    // (heap fragmentation + block-manager churn accumulate late), and
    // they were all late-alphabet names. Order within the priority list
    // and the alphabetical tail are both deterministic, so run-to-run
    // records stay comparable.
    val bigFleetsFirst = Seq(
      "semantic_dedup_coded", "exact_substr_agreement_gate",
      "self_retrieval_ranks", "tfidf_more_like_this", "decontaminate_bloom",
      "tfidf_incremental_merge", "dsir_logratio_weights", "source_term_hll")
    val priority = bigFleetsFirst.zipWithIndex.toMap
    val results = SparkEntry.queries.toSeq
      .sortBy { case (name, _) => (priority.getOrElse(name, Int.MaxValue), name) }
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      // Execute the query's OWN plan and drain it (`toRdd.count()`), not
      // `df.count()`: a count on top lets Catalyst prune final-stage
      // expression work and eliminate row-preserving joins (e.g. the
      // left-join re-assembly in strip_duplicate_spans collapses to a
      // bare scan), which under-measures exactly the work a real
      // consumer pays for.
      def once(pass: String): (Double, Option[String]) = {
        val group = s"$name|$pass"
        taskAgg.remove(group) // re-measure overwrites the poisoned attempt
        spark.sparkContext.setJobGroup(group, s"$name $pass")
        val gc0 = driverGcMs()
        val t0 = System.nanoTime()
        var fpPause = 0L
        var tEnd = 0L
        val err =
          try {
            val df = fn(spark, sfDir)
            // fingerprint the INITIAL physical plan (pre-AQE), COLD pass,
            // BEFORE the first action: a post-execution toString renders
            // every cached subtree's inner AdaptiveSparkPlan in its
            // EXECUTED state — runtime shuffle-size decisions (borderline
            // build-side flips, coalesced reads) that flap run-to-run on
            // small fixtures (r13: manifest_incremental's nn-join flipped
            // BuildLeft/BuildRight inside a persisted frame). Pre-action,
            // inter-query hygiene has cleared the cache, so inner plans
            // print their deterministic static form. A regression
            // artifact must be deterministic given the same code and
            // data; a lost broadcast / new Exchange / join-strategy
            // change shows in the static plan. The toString +
            // canonicalization cost (~0.1-1 s on big plans) is excluded
            // from the measured window (r9: leaving it inside inflated
            // the whole registry ~13%).
            if (pass == "cold") {
              // Force analysis/optimization/physical planning INSIDE the
              // measured window (r14, ADVICE): planning is work a real
              // consumer pays on a cold query; only the toString +
              // canonicalization + dump below is measurement overhead.
              val sparkPlan = df.queryExecution.sparkPlan
              val fp0 = System.nanoTime()
              planFps(name) = canonicalPlan(sparkPlan.toString)
              // Flap forensics: dump the CANONICAL plan text per query
              // when asked, so a fingerprint diff between two runs is
              // diffable line-by-line instead of hash-vs-hash.
              sys.env.get("SPARK_GRAFT_PLAN_DUMP_DIR").foreach { d =>
                java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
                java.nio.file.Files.write(
                  java.nio.file.Paths.get(d, s"$name.txt"),
                  planFps(name).getBytes("UTF-8"))
              }
              fpPause = System.nanoTime() - fp0
            }
            df.queryExecution.toRdd.count()
            tEnd = System.nanoTime()
            None
          }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
          }
        val dt =
          ((if (tEnd != 0L) tEnd else System.nanoTime()) - t0 - fpPause) / 1e9
        passMetrics(group) = (driverGcMs() - gc0, 0L)
        spark.sparkContext.clearJobGroup()
        (dt, err)
      }
      def hygiene(): Unit = {
        spark.catalog.clearCache()
        // Inter-query hygiene: without it, heap/GC pressure accumulated over
        // a 100+-query run inflates LATE queries' recorded times up to 13x
        // vs the same query in isolation (r4: value_stats_by_type 7.7s
        // recorded, 0.57s isolated) — poisoning per-query regression
        // tracking. A forced full GC plus a short settle between queries
        // keeps each measurement standalone; the pause happens OUTSIDE the
        // timed region, so totals still sum only measured query time.
        System.gc()
        Thread.sleep(150)
      }
      val (cold0, errC) = once("cold")
      val (warm0, errW) = once("warm")
      hygiene()
      // Outlier guard (r5): a WARM pass that costs over twice its own cold
      // pass is a measurement artifact, not a property of the plan — warm
      // runs with every cache the cold pass populated, so its true cost is
      // bounded by cold. The r5 full run recorded self_retrieval_ranks warm
      // 51.9 s vs 3.2 s isolated: with an 8 GiB unified-memory heap, 160
      // queries of accumulated pressure evicts the cold pass's persisted
      // blocks mid-warm-run, and the "warm" measurement silently becomes
      // "recompute under memory contention". Detection is cheap and exact
      // (warm > 2x cold, with a 1 s floor so sub-second jitter never
      // triggers); the remedy is one isolated re-measure right after
      // hygiene — fresh cold repopulates its own caches, fresh warm reads
      // them — recorded IN PLACE of the poisoned pair and flagged in the
      // JSON ("remeasured") so a reader can audit every substitution.
      val poisoned = errC.isEmpty && errW.isEmpty &&
        warm0 > 2 * cold0 && warm0 > 1.0
      val (cold, warm, orig) =
        if (!poisoned) (cold0, warm0, None)
        else {
          val (c2, e2) = once("cold")
          val (w2, e3) = once("warm")
          hygiene()
          if (e2.isEmpty && e3.isEmpty) (c2, w2, Some((cold0, warm0)))
          // the re-measure itself failed (e.g. the same memory pressure
          // that poisoned warm): keep the original pair but STILL flag it
          // — a "remeasured" entry whose originals equal the recorded
          // values tells the auditing reader "detected as poisoned,
          // substitution unavailable", instead of silently passing the
          // quarantined timing off as clean
          else (cold0, warm0, Some((cold0, warm0)))
        }
      (name, cold, warm, errC.orElse(errW), orig)
    }
    // drain the async listener bus before reading task metrics: a bounded
    // settle (the last query's events are in flight for milliseconds)
    Thread.sleep(2000)
    def jsStr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\n\\r\\t]", " ") + "\""
    type Row = (String, Double, Double, Option[String], Option[(Double, Double)])
    def timesObj(rs: Seq[Row], f: Row => Double): String =
      rs.map(r => "\"" + r._1 + "\":" + math.round(f(r) * 10000) / 10000.0)
        .mkString("{", ",", "}")
    // A query that THREW must never read as a fast success: its timing is
    // excluded from the totals/maps and it lands in "errors" instead.
    val (failed, ok) = results.partition(_._4.isDefined)
    val errorsObj = failed.map(r => "\"" + r._1 + "\":" + jsStr(r._4.get))
      .mkString("{", ",", "}")
    // Audit trail for every outlier substitution: the ORIGINAL poisoned
    // (cold, warm) pair, keyed by query — the recorded maps carry the
    // isolated re-measure.
    val remeasuredObj = ok.filter(_._5.isDefined)
      .map(r => "\"" + r._1 + "\":{\"cold_orig\":" +
        math.round(r._5.get._1 * 10000) / 10000.0 + ",\"warm_orig\":" +
        math.round(r._5.get._2 * 10000) / 10000.0 + "}")
      .mkString("{", ",", "}")
    val assetsObj = assetTimes
      .map { case (n, t) => "\"" + n + "\":" + math.round(t * 10000) / 10000.0 }
      .mkString("{", ",", "}")
    val assetsTotal = assetTimes.map(_._2).sum
    // Per-pass diagnostics: summed executor run / task GC (listener), task
    // count, and driver GC delta — the "why" behind a wall-time move.
    def metricsObj(rs: Seq[Row]): String =
      rs.map { r =>
        def side(pass: String): String = {
          val a = Option(taskAgg.get(s"${r._1}|$pass")).getOrElse(Array(0L, 0L, 0L))
          val drv = passMetrics.getOrElse(s"${r._1}|$pass", (0L, 0L))._1
          s""""${pass}_run_ms":${a(0)},"${pass}_task_gc_ms":${a(1)},""" +
            s""""${pass}_tasks":${a(2)},"${pass}_drv_gc_ms":$drv"""
        }
        "\"" + r._1 + "\":{" + side("cold") + "," + side("warm") + "}"
      }.mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    val totalWarm = ok.map(_._3).sum
    val fullJson = s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""value_warm":$totalWarm,"n_queries":${results.size},""" +
      s""""n_errors":${failed.size},"errors":$errorsObj,""" +
      s""""remeasured":$remeasuredObj,""" +
      s""""assets":$assetsObj,"assets_total":$assetsTotal,""" +
      s""""queries":${timesObj(ok, _._2)},""" +
      s""""queries_warm":${timesObj(ok, _._3)},""" +
      s""""load_start":$loadStart,"load_measure_start":$loadMeasureStart,""" +
      s""""load_end":${loadAvg1m()},""" +
      // cold timings include Catalyst analysis/optimization/physical
      // planning since r14 (ADVICE) — machine-visible so cross-round
      // trackers can annotate the r13->r14 cold-time discontinuity
      s""""planning_in_window":true,""" +
      s""""metrics":${metricsObj(ok)},"sf":"$sfDir"}"""
    val out = java.nio.file.Paths.get("target/bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, (fullJson + "\n").getBytes("UTF-8"))
    // Plan fingerprints (r6 VERDICT item 7): query -> md5 of the
    // canonicalized AQE-final physical plan + counts of the load-bearing
    // node kinds. Diffing two rounds' files surfaces a plan regression (a
    // lost broadcast, a new Exchange) even when timings are noisy.
    val plansJson = planFps.toSeq.sortBy(_._1).map { case (name, canon) =>
      def n(pat: String): Int = pat.r.findAllMatchIn(canon).length
      "\"" + name + "\":{\"fp\":\"" + md5Hex(canon).take(16) + "\"" +
        s""","exchanges":${n("Exchange (?:hashpartitioning|rangepartitioning|RoundRobinPartitioning|SinglePartition)")}""" +
        s""","broadcasts":${n("BroadcastExchange")}""" +
        s""","bhj":${n("BroadcastHashJoin")},"smj":${n("SortMergeJoin")}""" +
        // plan dumps mark codegen'd operators with the `*(id)` star prefix
        // (never the literal WholeStageCodegen); after digit
        // normalization every marker is `*(N)` — this counts codegen'd
        // NODES, a coarse but diffable codegen-coverage signal
        s""","cartesian":${n("CartesianProduct")},"codegen_nodes":${n("\\*\\(N\\)")}}"""
    }.mkString("{", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get("target/plans.json"),
      (plansJson + "\n").getBytes("UTF-8"))
    println(fullJson)
    spark.stop()
    // The driver parses a bounded TAIL of stdout (~2000 chars) — a
    // 110-query JSON line never fits, so the LAST lines are a compact form:
    // totals + the headline (most expensive cold) queries, capped so the
    // sentinel and the line both land inside the tail window. Full
    // per-query detail lives in target/bench.json and the full line above.
    // Both final lines (sentinel-prefixed + bare) must TOGETHER fit the
    // tail window, or the earlier of the two gets truncated away — bound
    // the PAIR's length, not one line's.
    var headline = ok.sortBy(-_._2).take(12)
    var compact = ""
    do {
      compact = s"""{"metric":"total","value":$total,"unit":"sec",""" +
        s""""value_warm":$totalWarm,"assets_total":$assetsTotal,""" +
        s""""n_queries":${results.size},""" +
        s""""n_errors":${failed.size},""" +
        s""""queries":${timesObj(headline, _._2)},"sf":"$sfDir"}"""
      headline = headline.dropRight(1)
    } while (2 * compact.length + 12 > 1900 && headline.nonEmpty)
    println("BENCH_JSON " + compact)
    println(compact)
  }
}
