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

  test("JSONL round-trips documents, embedded newlines included") {
    val dir = Files.createTempDirectory("graft_jsonl").toString
    val docs = Seq(
      (1L, "line one\nline two", "en", "src0", 17L),
      (2L, "tabs\tand \"quotes\"", "en", "src1", 17L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    graft.sources.JsonLines.writeDocuments(docs, s"$dir/out")
    val back = graft.sources.JsonLines.readDocumentsClean(spark, s"$dir/out")
      .as[(Long, String, String, String, Long)].collect().toSet
    assert(back == docs.as[(Long, String, String, String, Long)].collect().toSet)
  }

  test("JSONL reads gzip-compressed parts transparently (single-split each)") {
    val dir = Files.createTempDirectory("graft_jsonl_gz")
    val gz = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(dir.resolve("part-0.json.gz")))
    gz.write(
      """{"doc_id": 1, "text": "alpha", "lang": "en", "source": "s", "n_chars": 5}
        |{"doc_id": 2, "text": "beta", "lang": "en", "source": "s", "n_chars": 4}
        |""".stripMargin.getBytes("UTF-8"))
    gz.close()
    val back = graft.sources.JsonLines.readDocumentsClean(spark, dir.toString)
    assert(back.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // gzip is not splittable: one task per .gz file regardless of size —
    // the documented pattern is repartition-after-read before heavy work
    assert(back.rdd.getNumPartitions == 1)

    // the fanned ingest entry closes that hazard: gzip inputs come out at
    // session default parallelism (one narrow shuffle of parsed rows),
    // BEFORE any tokenize/shingle expansion would run single-threaded
    val fanned = graft.sources.JsonLines.readDocumentsFanned(spark, dir.toString)
    assert(fanned.rdd.getNumPartitions >= spark.sparkContext.defaultParallelism,
      s"fanned gzip read got ${fanned.rdd.getNumPartitions} partitions")
    assert(fanned.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // uncompressed inputs keep fanOut's no-op-when-parallel behavior (and
    // identical rows either way)
    val plainDir = Files.createTempDirectory("graft_jsonl_plain")
    Files.writeString(plainDir.resolve("part-0.json"),
      """{"doc_id": 3, "text": "gamma", "lang": "en", "source": "s", "n_chars": 5}
        |""".stripMargin)
    val plain = graft.sources.JsonLines.readDocumentsFanned(spark, plainDir.toString)
    assert(plain.select("doc_id").as[Long].collect().toSeq == Seq(3L))
  }

  test("JSONL ingest quarantines corrupt lines instead of failing") {
    val dir = Files.createTempDirectory("graft_jsonl_bad")
    Files.writeString(dir.resolve("part-0.json"),
      """{"doc_id": 1, "text": "good", "lang": "en", "source": "s", "n_chars": 4}
        |this is not json at all
        |{"doc_id": 2, "text": "also good", "lang": "en", "source": "s", "n_chars": 9}
        |{"broken": unquoted}
        |""".stripMargin)
    val stats = graft.sources.JsonLines
      .readDocumentsStrictness(spark, dir.toString)
      .as[(Long, Long, Long, Long)].collect().head
    assert(stats == ((4L, 2L, 2L, 0L)))
    val clean = graft.sources.JsonLines.readDocumentsClean(spark, dir.toString)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(clean == Seq(1L, 2L))
    // count-safety: with the JSON source this plan pruned down to only the
    // corrupt pseudo-column and threw QUERY_ONLY_CORRUPT_RECORD_COLUMN; the
    // from_json-based read has no such restriction
    assert(graft.sources.JsonLines.readDocumentsClean(spark, dir.toString).count() == 2L)
  }
}
