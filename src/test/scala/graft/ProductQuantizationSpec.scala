package graft

import graft.operators.{ProductQuantization, Similarity}
import graft.sources.Tables

class ProductQuantizationSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = Tables.embeddings(spark, dir)

  test("codebooks: dense code ids per sub-space, correct sub-vector width") {
    val cb = ProductQuantization.trainCodebooks(emb, m = 8, codes = 16)
      .as[(Int, Int, Array[Double])].collect()
    assert(cb.length == 8 * 16)
    assert(cb.map(_._1).distinct.sorted.toSeq == (0 until 8))
    cb.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (0 until 16))
    }
    assert(cb.forall(_._3.length == 8))
  }

  test("encode: one code row per vector, m codes in [0, codes)") {
    val cb = ProductQuantization.trainCodebooks(emb, m = 8, codes = 16)
    val enc = ProductQuantization.encode(emb, cb, m = 8)
      .as[(Long, Array[Int], Double)].collect()
    assert(enc.length == emb.count())
    enc.foreach { case (_, codes, norm) =>
      assert(codes.length == 8 && codes.forall(c => c >= 0 && c < 16))
      assert(norm > 0)
    }
  }

  test("pq search: exact re-ranked scores match brute force; recall is useful") {
    val got = ProductQuantization.pqSearch(emb, 0L to 9L, k = 10)
      .select("q_id", "vec_id", "cos").as[(Long, Long, Double)].collect()
    assert(got.length == 100)
    val bf = Similarity.knnBruteForce(emb, 0L to 9L, 10)
      .select("q_id", "vec_id", "cos").as[(Long, Long, Double)].collect()
    val bfMap = bf.map(r => (r._1, r._2) -> r._3).toMap
    // precision: every returned cos that brute force also returned is equal
    got.foreach { case (q, v, c) =>
      bfMap.get((q, v)).foreach(exact => assert(exact == c)) }
    // recall of the exact top-10 via the coarse 8x16 codebook + re-rank
    val hit = got.map(r => (r._1, r._2)).toSet
    val recall = bf.count(r => hit.contains((r._1, r._2))).toDouble / bf.length
    assert(recall >= 0.5, s"PQ recall $recall under 0.5 — coarser than expected")
  }

  test("ivf+pq composition: recall vs brute force survives double pruning") {
    val got = ProductQuantization.ivfPqSearch(emb, 0L to 9L, k = 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val bf = Similarity.knnBruteForce(emb, 0L to 9L, 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
    val recall = bf.count(got.contains).toDouble / bf.length
    // two approximations stack (nprobe=12/16 lists × 8x32 codes): the bar
    // is necessarily below either alone, but must stay useful
    assert(recall >= 0.7, s"IVF+PQ recall $recall under 0.7")
  }

  test("encodeStream matches the batch encoder bit-for-bit (frozen index)") {
    val e = emb.withColumn("v", org.apache.spark.sql.functions.col("embedding")
      .cast("array<double>"))
      .withColumn("norm", org.apache.spark.sql.functions.expr("sqrt(graft_dot(v, v))"))
      .select("vec_id", "v", "norm")
    val cents = Similarity.trainCentroids(e, 4, 2)
    val cb = ProductQuantization.trainCodebooks(emb, m = 8, codes = 16)
    val batch = ProductQuantization.encode(emb, cb, m = 8)
      .join(Similarity.assignToLists(e, cents).select("vec_id", "list_id"), "vec_id")
      .select("vec_id", "list_id", "codes", "norm")
      .as[(Long, Long, Array[Int], Double)].collect()
      .map(r => r._1 -> r).toMap
    val stream = ProductQuantization.encodeStream(emb, cents, cb, m = 8)
      .as[(Long, Long, Array[Int], Double)].collect()
    assert(stream.length == batch.size)
    stream.foreach { case (id, list, codes, norm) =>
      val b = batch(id)
      assert(list == b._2, s"list mismatch for vec $id")
      assert(codes.toSeq == b._3.toSeq, s"codes mismatch for vec $id")
      assert(norm == b._4, s"norm mismatch for vec $id")
    }
  }

  test("encodeStream works on an actual stream (per-row, append mode)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val e = emb.withColumn("v", org.apache.spark.sql.functions.col("embedding")
      .cast("array<double>"))
      .withColumn("norm", org.apache.spark.sql.functions.expr("sqrt(graft_dot(v, v))"))
      .select("vec_id", "v", "norm")
    val cents = Similarity.trainCentroids(e, 4, 1)
    val cb = ProductQuantization.trainCodebooks(emb, m = 8, codes = 16)
    val in = MemoryStream[(Long, Array[Float])]
    val arrivals = in.toDF.toDF("vec_id", "embedding")
    val q = ProductQuantization.encodeStream(arrivals, cents, cb)
      .writeStream.format("memory").queryName("enc_out")
      .outputMode("append").start()
    try {
      val vecs = emb.select("vec_id", "embedding")
        .as[(Long, Array[Float])].take(3)
      in.addData(vecs.toIndexedSeq)
      q.processAllAvailable()
      assert(spark.table("enc_out").count() == 3)
    } finally q.stop()
  }

  test("dim is read from the data: full PQ stack works on a 48-dim corpus") {
    val df = (0L until 60L).map(i =>
      (i, Array.tabulate(48)(j => math.sin(i * 48.0 + j).toFloat)))
      .toDF("vec_id", "embedding")
    val cb = ProductQuantization.trainCodebooks(df, m = 8, codes = 8)
    assert(cb.select("cv").as[Array[Double]].head().length == 6) // 48 / 8
    val enc = ProductQuantization.encode(df, cb, m = 8)
      .as[(Long, Array[Int], Double)].collect()
    assert(enc.length == 60 && enc.forall(_._2.length == 8))
    val got = ProductQuantization.pqSearch(df, Seq(0L, 1L), k = 5, m = 8, codes = 8)
    assert(got.count() == 10)
    // the streaming encoder derives the sub-space width from the codebook
    val e = df.withColumn("v", org.apache.spark.sql.functions.col("embedding")
      .cast("array<double>"))
      .withColumn("norm", org.apache.spark.sql.functions.expr("sqrt(graft_dot(v, v))"))
      .select("vec_id", "v", "norm")
    val cents = Similarity.trainCentroids(e, 4, 1)
    assert(ProductQuantization.encodeStream(df, cents, cb).count() == 60)
  }

  test("embedding dim not divisible by m fails fast with a clear error") {
    val df = (0L until 10L).map(i =>
      (i, Array.tabulate(50)(j => (i + j).toFloat))).toDF("vec_id", "embedding")
    val err = intercept[IllegalArgumentException] {
      ProductQuantization.trainCodebooks(df, m = 8, codes = 4)
    }
    assert(err.getMessage.contains("50"))
  }

  test("index build/write/load round-trip matches the self-contained searches") {
    val tmp = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_test_annidx").getAbsolutePath
    val idx = ProductQuantization.buildIndex(emb)
    ProductQuantization.writeIndex(idx, tmp)
    val loaded = ProductQuantization.loadIndex(spark, tmp)
    assert(loaded.m == 8 && loaded.dim == 64)
    val viaIdx = ProductQuantization.pqSearch(loaded, emb, 0L to 2L, 10, 300)
      .collect().map(_.toString).toSeq
    val direct = ProductQuantization.pqSearch(emb, 0L to 2L, 10)
      .collect().map(_.toString).toSeq
    assert(viaIdx == direct)
    val ivfViaIdx = ProductQuantization.ivfPqSearch(loaded, emb, 0L to 2L, 10, 12, 300)
      .collect().map(_.toString).toSeq
    val ivfDirect = ProductQuantization.ivfPqSearch(emb, 0L to 2L, 10)
      .collect().map(_.toString).toSeq
    assert(ivfViaIdx == ivfDirect)
  }

  test("pq search is deterministic across shuffle layouts") {
    def run(parts: Int): Seq[String] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try ProductQuantization.pqSearch(emb, Seq(0L, 1L), k = 5)
        .collect().map(_.toString).toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", 4)
    }
    assert(run(3) == run(13))
  }
}
