package graft

import java.nio.file.Files

import graft.operators.Tfidf
import graft.sources.{Tables, TabKv}

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("tab-KV scores round-trip through the reference interchange format") {
    val dir = Files.createTempDirectory("graft_tabkv").toString
    val scored = Tfidf.pipeline(Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
    ).toDF("doc_id", "text"))
    TabKv.writeScores(scored, s"$dir/out")
    val back = TabKv.readScores(spark, s"$dir/out")
      .select("term", "doc", "score").as[(String, String, Double)].collect().toSet
    val expected = scored.select($"term", $"doc_id".cast("string"), $"tfidf")
      .as[(String, String, Double)].collect().toSet
    assert(back == expected)
  }

  test("raw text-dir corpus source recovers file-name document identity") {
    val dir = Files.createTempDirectory("graft_corpus")
    Files.writeString(dir.resolve("doc_a.txt"), "apple banana\napple")
    Files.writeString(dir.resolve("doc_b.txt"), "cherry")
    val docs = Tables.textDir(spark, dir.toString)
    val byDoc = Tfidf.tokenize(docs, idCol = "doc", textCol = "text")
      .groupBy("doc_id").count()
      .as[(String, Long)].collect().toMap
    assert(byDoc == Map("doc_a.txt" -> 3L, "doc_b.txt" -> 1L))
  }
}
