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
    // across 90+ queries without poisoning the warm run.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        // Execute the query's OWN plan and drain it (`toRdd.count()`), not
        // `df.count()`: a count on top lets Catalyst prune final-stage
        // expression work and eliminate row-preserving joins (e.g. the
        // left-join re-assembly in strip_duplicate_spans collapses to a
        // bare scan), which under-measures exactly the work a real
        // consumer pays for.
        try fn(spark, sfDir).queryExecution.toRdd.count()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once()
      val warm = once()
      spark.catalog.clearCache()
      (name, cold, warm)
    }
    def obj(f: ((String, Double, Double)) => (String, Double)): String =
      results.map { r => val (k, v) = f(r); "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val totalWarm = results.map(_._3).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""value_warm":$totalWarm,"queries":${obj(r => (r._1, r._2))},""" +
      s""""queries_warm":${obj(r => (r._1, r._3))},"sf":"$sfDir"}"""
    // The driver tails stdout, where sbt's own "[success]" line lands after
    // the forked JVM exits — so emit the JSON line several ways: bare (for
    // line-wise JSON scans), sentinel-prefixed (grep BENCH_JSON), and as a
    // file for machine consumption.
    println(json)
    println("BENCH_JSON " + json)
    val out = java.nio.file.Paths.get("target/bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, (json + "\n").getBytes("UTF-8"))
    spark.stop()
    println(json)
  }
}
