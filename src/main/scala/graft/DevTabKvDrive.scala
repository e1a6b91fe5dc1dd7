package graft

/** Dev drive: TabKv interchange round-trip through the public API. */
object DevTabKvDrive {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    val out = "/tmp/graft_tabkv_drive"
    val scored = SparkEntry.entry(spark).limit(1000)
    graft.sources.TabKv.writeScores(scored, out)
    val back = graft.sources.TabKv.readScores(spark, out)
    println(s"[tabkv] wrote+read rows: ${back.count()}")
    back.show(3, truncate = false)
    spark.stop()
  }
}
