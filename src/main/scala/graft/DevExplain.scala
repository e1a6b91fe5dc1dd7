package graft

/** Dev driver: dump `.explain("formatted")` for named registry queries to
  * files — the round's plans/<round>/<query>_{before,after}.txt evidence.
  * Usage: runMain graft.DevExplain <sfDir> <outDir> <q1,q2,...>
  * Asset-backed queries build their assets on construction (untimed —
  * explain itself runs no job). */
object DevExplain {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: DevExplain <sfDir> <outDir> <names,comma-separated>")
    val Array(dir, out, namesCsv) = args
    val names = namesCsv.split(',').map(_.trim).filter(_.nonEmpty)
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = GraftSession.create()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(java.nio.file.Paths.get(out, s"$n.txt"),
        txt.getBytes("UTF-8"))
      println(s"[explain] $n ok (${txt.length} chars)")
    }
    spark.stop()
  }
}
