package graft

import java.nio.file.Files

import graft.sources.Tables

/** Source/sink format breadth beyond the engine's parquet default: CSV,
  * JSON, and ORC round-trips through the standard reader/writer surface. */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    .select("doc_id", "text", "lang").orderBy("doc_id").limit(100)

  private def roundTrip(fmt: String): Unit = {
    val dir = Files.createTempDirectory(s"graft_$fmt").toString + "/out"
    val w = docs.write.format(fmt).mode("overwrite")
    (if (fmt == "csv") w.option("header", "true") else w).save(dir)
    val r = spark.read.format(fmt)
    val back = (if (fmt == "csv") r.option("header", "true").option("inferSchema", "true") else r)
      .load(dir)
      .select("doc_id", "text", "lang")
      .as[(Long, String, String)].collect().toSet
    val expected = docs.as[(Long, String, String)].collect().toSet
    assert(back == expected, s"$fmt round-trip mismatch")
  }

  test("csv round-trip")  { roundTrip("csv") }
  test("json round-trip") { roundTrip("json") }
  test("orc round-trip")  { roundTrip("orc") }
}
