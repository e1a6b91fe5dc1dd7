package graft

import org.apache.spark.sql.functions._

/** Dev tool (NOT part of the library surface): prints the golden
  * aggregates `multimodal_digest_gate` pins ([[SparkEntry.MultimodalGolden]])
  * from the deterministic 200-asset fixture. Run after any INTENDED
  * decoder/fixture change to repin; an unintended drift should instead be
  * treated as the regression the gate exists to catch. */
object DevRasterGolden {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    val d = graft.multimodal.Multimodal
      .rasterDigests(graft.multimodal.Multimodal.syntheticAssets(spark, 200))
      .toDF()
    val r = d.agg(count(lit(1)), sum(col("crc")), expr("bit_xor(crc)"),
      sum(col("n_bytes"))).head()
    d.groupBy("fmt").count().orderBy("fmt").collect()
      .foreach(row => println(s"GOLDEN_FMT ${row.get(0)} ${row.get(1)}"))
    println(s"GOLDEN nDecoded=${r.getLong(0)}L crcSum=${r.getLong(1)}L " +
      s"crcXor=${r.getLong(2)}L rasterBytes=${r.getLong(3)}L")
    spark.stop()
  }
}
