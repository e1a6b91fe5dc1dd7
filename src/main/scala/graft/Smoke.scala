package graft

/** Dev smoke runner: drives SparkEntry.entry exactly as the driver's t1
  * smoke does (rows > 0) and prints the head + physical plan. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    val df = SparkEntry.entry(spark)
    df.explain("formatted")
    val rows = df.limit(5).collect()
    println(s"[smoke] entry columns: ${df.columns.mkString(", ")}")
    rows.foreach(r => println(s"[smoke] $r"))
    println(s"[smoke] entry rows>0: ${rows.nonEmpty}")
    spark.stop()
  }
}
