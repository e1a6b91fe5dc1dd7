package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create()

    // Warm the session once (parquet reader, codegen framework, JIT) so
    // per-query timings measure the operator, not JVM initialization.
    spark.read.parquet(s"$sfDir/region.parquet").count()
    spark.range(1000000).selectExpr("sum(id)").collect()

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
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      // Execute the query's OWN plan and drain it (`toRdd.count()`), not
      // `df.count()`: a count on top lets Catalyst prune final-stage
      // expression work and eliminate row-preserving joins (e.g. the
      // left-join re-assembly in strip_duplicate_spans collapses to a
      // bare scan), which under-measures exactly the work a real
      // consumer pays for.
      def once(): (Double, Option[String]) = {
        val t0 = System.nanoTime()
        val err =
          try { fn(spark, sfDir).queryExecution.toRdd.count(); None }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
          }
        ((System.nanoTime() - t0) / 1e9, err)
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
      val (cold0, errC) = once()
      val (warm0, errW) = once()
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
          val (c2, e2) = once()
          val (w2, e3) = once()
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
    val total = ok.map(_._2).sum
    val totalWarm = ok.map(_._3).sum
    val fullJson = s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""value_warm":$totalWarm,"n_queries":${results.size},""" +
      s""""n_errors":${failed.size},"errors":$errorsObj,""" +
      s""""remeasured":$remeasuredObj,""" +
      s""""queries":${timesObj(ok, _._2)},""" +
      s""""queries_warm":${timesObj(ok, _._3)},"sf":"$sfDir"}"""
    val out = java.nio.file.Paths.get("target/bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, (fullJson + "\n").getBytes("UTF-8"))
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
        s""""value_warm":$totalWarm,"n_queries":${results.size},""" +
        s""""n_errors":${failed.size},""" +
        s""""queries":${timesObj(headline, _._2)},"sf":"$sfDir"}"""
      headline = headline.dropRight(1)
    } while (2 * compact.length + 12 > 1900 && headline.nonEmpty)
    println("BENCH_JSON " + compact)
    println(compact)
  }
}
