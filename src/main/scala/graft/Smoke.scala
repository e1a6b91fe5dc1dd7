package graft

/** Dev smoke runner: drives SparkEntry.entry exactly as the driver's t1
  * smoke does (rows > 0) and prints the head + physical plan. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    val df = SparkEntry.entry(spark)
    df.explain("formatted")
    val rows = df.limit(5).collect()
    // post-execution adaptive plan: shows whether shuffle stages were reused
    val finalPlan = df.queryExecution.executedPlan.toString
    val reused = finalPlan.linesIterator.count(l =>
      l.contains("ReusedQueryStage") || l.contains("ReusedExchange"))
    val scans = finalPlan.linesIterator.count(_.contains("Scan parquet"))
    val cacheScans = finalPlan.linesIterator.count(_.contains("InMemoryTableScan"))
    println(s"[smoke] final plan: $scans parquet scans, $reused reused stages, $cacheScans cache scans")
    println(s"[smoke] entry columns: ${df.columns.mkString(", ")}")
    rows.foreach(r => println(s"[smoke] $r"))
    println(s"[smoke] entry rows>0: ${rows.nonEmpty}")
    spark.stop()
  }
}
