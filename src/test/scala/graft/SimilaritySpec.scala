package graft

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // 4-dim toy corpus; query 0 = e1. cos(0,1)=1 (same dir), cos(0,2)≈0.707,
  // cos(0,3)=0.
  private val vecs = Seq(
    (0L, Array(1f, 0f, 0f, 0f), 0),
    (1L, Array(2f, 0f, 0f, 0f), 0),
    (2L, Array(1f, 1f, 0f, 0f), 0),
    (3L, Array(0f, 0f, 3f, 0f), 1),
    (4L, Array(-1f, 0f, 0f, 0f), 1),
  ).toDF("vec_id", "embedding", "label")

  test("brute-force knn ranks by exact cosine") {
    val got = Similarity.knnBruteForce(vecs, Seq(0L), k = 4)
      .select("rank", "vec_id", "cos").as[(Int, Long, Double)].collect().toSeq
    assert(got.map(_._2) == Seq(1L, 2L, 3L, 4L))
    assert(got.head._3 == 1.0)
    assert(math.abs(got(1)._3 - 0.707107) < 1e-9)
    assert(got(2)._3 == 0.0)
    assert(got(3)._3 == -1.0)
  }

  test("hardNegatives returns only other-label vectors, similarity-ranked") {
    val got = Similarity.hardNegatives(vecs, Seq(0L), k = 4)
      .select("rnk", "vec_id", "label", "cos").as[(Long, Long, Long, Double)]
      .collect().toSeq
    // label-0 probes see only label-1 corpus rows (3 and 4), best-first
    assert(got.map(_._2) == Seq(3L, 4L))
    assert(got.map(_._3).forall(_ == 1L))
    assert(got.map(_._4) == Seq(0.0, -1.0))
  }

  test("knnLabelAccuracy votes the majority neighbor label") {
    // probe 0 (label 0) with k=3: neighbors 1, 2 (label 0) and 3 (label 1)
    // → 2-vs-1 vote for label 0, correct
    val row = Similarity.knnLabelAccuracy(vecs, Seq(0L), k = 3)
      .select("true_label", "pred_label", "n_votes", "correct")
      .as[(Long, Long, Long, Int)].collect().head
    assert(row == ((0L, 0L, 2L, 1)))
    // probe 4 (label 1, pointing away): nearest are 3 (label 1), then the
    // orthogonal/opposed label-0 mass — vote 2-vs-1 AGAINST label 1
    val wrong = Similarity.knnLabelAccuracy(vecs, Seq(4L), k = 3)
      .select("correct").as[Int].collect().head
    assert(wrong == 0)
  }

  test("semanticDedup keeps the precedence-ranked representative of a near-dup pair") {
    // one cluster (nClusters = 1) so every vector is a candidate pair;
    // vectors 0 and 1 are collinear (cos = 1): exactly one survives, and
    // the tie on centroid similarity (identical direction) breaks to the
    // LOWER id — 0 kept, 1 dropped. Everything else is below tau = 0.9.
    val out = graft.operators.Dedup.semanticDedup(vecs, nClusters = 1, tau = 0.9)
      .select("vec_id", "keep").as[(Long, Long)].collect().toMap
    assert(out == Map(0L -> 1L, 1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    // audit shape: one row per input vector, never a filtered survivor list
    assert(out.size == 5)
  }

  test("coded SemDeDup reproduces the float path's decisions; gate passes") {
    // same scenario as the float-path test: the collinear pair must drop
    // identically through the int8-coded candidate filter + exact re-rank
    val coded = graft.operators.Dedup.semanticDedupCoded(vecs, nClusters = 1, tau = 0.9)
      .select("vec_id", "keep").as[(Long, Long)].collect().toMap
    assert(coded == Map(0L -> 1L, 1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    // the driver-visible gate: recall 1.0, zero false drops on this corpus
    val row = graft.operators.Dedup.semanticDedupCodedGate(vecs, nClusters = 1, tau = 0.9)
      .select("n_vectors", "n_drop_float", "n_drop_coded", "drop_recall")
      .as[(Long, Long, Long, Double)].collect().head
    assert(row == ((5L, 1L, 1L, 1.0)))
  }

  test("decontaminateSemantic flags corpus vectors near a benchmark vector") {
    // benchmark = {0, 1} (both on e1, collinear): corpus 2/3/4 score their
    // cosine against that direction; ties on cos pick the SMALLER bench id
    val out = graft.operators.Curation.decontaminateSemantic(
      vecs, isBenchmark = $"vec_id" <= 1, tau = 0.7)
      .select("vec_id", "nearest_bench", "max_cos", "contaminated")
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(out.map(_._1) == Seq(2L, 3L, 4L))
    // identical cosine vs both benchmark vectors → nearest is id 0
    assert(out.map(_._2) == Seq(0L, 0L, 0L))
    assert(math.abs(out(0)._3 - 0.707107) < 1e-9)
    assert(out(1)._3 == 0.0)
    assert(out(2)._3 == -1.0)
    // only the 45-degree vector clears tau = 0.7
    assert(out.map(_._4) == Seq(1L, 0L, 0L))
    // audit shape: one row per NON-benchmark vector
    assert(out.size == 3)
  }

  test("decontaminateSemanticExternal: parquet benchmark table == split form") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val isBench = col("vec_id") % 7 === 0
    val split = graft.operators.Curation.decontaminateSemantic(emb, isBench, tau = 0.3)
      .as[(Long, Long, Double, Long)].collect().toSeq
    // the benchmark as a genuinely external source: parquet round-trip
    val benchDir = java.nio.file.Files.createTempDirectory("graft_bench_emb").toString
    emb.where(isBench).select("vec_id", "embedding")
      .write.mode("overwrite").parquet(benchDir)
    val external = graft.operators.Curation.decontaminateSemanticExternal(
      emb.where(!isBench), spark.read.parquet(benchDir), tau = 0.3)
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(external == split && split.nonEmpty)
    // an empty external benchmark scores nothing (nothing to compare)
    val none = graft.operators.Curation.decontaminateSemanticExternal(
      emb.where(!isBench), emb.where(col("vec_id") < 0), tau = 0.3)
    assert(none.count() == 0)
  }

  test("clusterBalancedSample caps each cluster at `cap`, rank-exact") {
    val out = graft.operators.Dedup.clusterBalancedSample(vecs, nClusters = 1, cap = 2)
      .select("vec_id", "list_id", "c_sim", "cluster_rank", "keep")
      .as[(Long, Long, Double, Long, Long)].collect().toSeq
    // audit shape: every vector appears, ranks are a permutation of 1..5
    assert(out.size == 5)
    assert(out.map(_._4).sorted == Seq(1L, 2L, 3L, 4L, 5L))
    // exactly `cap` kept, and they are precisely ranks 1..cap
    assert(out.filter(_._5 == 1L).map(_._4).sorted == Seq(1L, 2L))
    // ranking is (c_sim DESC, vec_id ASC) within the single cluster
    val byRank = out.sortBy(_._4)
    assert(byRank.map(r => (-r._3, r._1)) == byRank.map(r => (-r._3, r._1)).sorted)
    // a cap >= cluster size keeps everything
    val all = graft.operators.Dedup.clusterBalancedSample(vecs, nClusters = 1, cap = 10)
      .select("keep").as[Long].collect()
    assert(all.forall(_ == 1L))
  }

  test("embeddingStats: dim range, zero norms, null entries, hand-computed norms") {
    val rows = Seq(
      (0L, Array[java.lang.Float](3f, 4f)),                 // norm 5
      (1L, Array[java.lang.Float](0f, 0f)),                 // zero norm
      (2L, Array[java.lang.Float](1f, null, 0f)),           // null entry, dim 3
    ).toDF("vec_id", "embedding")
    val got = Similarity.embeddingStats(rows)
      .as[(Long, Long, Long, Long, Long, Long, Double, Double, Double)].head()
    val (n, unscorable, dmin, dmax, zero, nulls, nmin, nmax, navg) = got
    assert(n == 3L && unscorable == 0L && dmin == 2L && dmax == 3L)
    assert(zero == 1L && nulls == 1L)
    assert(nmin == 0.0 && nmax == 5.0)
    // null entries drop out of the norm sum: norm(2) = 1 → avg (5+0+1)/3
    assert(navg == 2.0)
  }

  test("embeddingStats counts empty/null/all-null embeddings instead of dropping them") {
    val rows = Seq(
      (0L, Array[java.lang.Float](3f, 4f)),            // norm 5
      (1L, Array.empty[java.lang.Float]),              // empty → no norm rows
      (2L, null.asInstanceOf[Array[java.lang.Float]]), // null embedding
      (3L, Array[java.lang.Float](null, null)),        // all-null entries → null norm
    ).toDF("vec_id", "embedding")
    val row = Similarity.embeddingStats(rows).head()
    // every row an audit exists to flag is COUNTED, not vanished
    assert(row.getAs[Long]("n_vectors") == 4L)
    assert(row.getAs[Long]("n_unscorable") == 3L)
    assert(row.getAs[Long]("n_null_entries") == 2L)
    // scorable-side stats cover the one real vector only
    assert(row.getAs[Double]("norm_min") == 5.0 && row.getAs[Double]("norm_max") == 5.0)
    assert(row.getAs[Double]("norm_avg") == 5.0)
    // an entirely unscorable table reports null norms, never a crash or a 0/0
    val none = Similarity.embeddingStats(
      Seq((0L, Array.empty[java.lang.Float])).toDF("vec_id", "embedding")).head()
    assert(none.getAs[Long]("n_vectors") == 1L && none.getAs[Long]("n_unscorable") == 1L)
    assert(none.isNullAt(none.fieldIndex("norm_avg")))
    assert(none.getAs[Long]("n_zero_norm") == 0L)
  }

  test("randomProject native kernel == SQL decimal-fold spelling, distortion gate throws") {
    import org.apache.spark.sql.functions.{col, lit, posexplode}
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val native = Similarity.randomProject(emb, outDim = 32, dim = 64)
      .as[(Long, Long, Double)].collect().toSeq
    val hof = emb
      .withColumn("v", col("embedding").cast("array<double>"))
      .withColumn("msk", lit(Similarity.rpMasks(32, 64)))
      .withColumn("rp", Similarity.rpProjectHofExpr(32, 64))
      .select(col("vec_id"), posexplode(col("rp")).as(Seq("k", "comp")))
      .select(col("vec_id"), col("k").cast("long"), col("comp"))
      .orderBy("vec_id", "k")
      .as[(Long, Long, Double)].collect().toSeq
    assert(native == hof)
    assert(native.size == emb.count() * 32)
    // the gate passes at its defaults on this corpus...
    val row = Similarity.rpDistortionGate(emb)
      .select("avg_distortion", "max_distortion").as[(Double, Double)].head()
    assert(row._1 <= 0.25 && row._2 <= 1.0)
    // ...and an impossible tolerance THROWs (the driver-visible path)
    intercept[IllegalArgumentException] {
      Similarity.rpDistortionGate(emb, maxAvg = 0.0, maxWorst = 0.0)
    }
  }

  test("randomProject degenerate inputs null like the decimal fold, never throw") {
    import org.apache.spark.sql.functions.{col, lit, posexplode}
    val D = java.lang.Double.valueOf(_: Double)
    val rows = Seq(
      (0L, Array(D(1.0), D(Double.NaN), D(2.0), D(3.0))),       // NaN element
      (1L, Array(D(Double.PositiveInfinity), D(1.0), D(1.0), D(1.0))),
      (2L, Array(D(1.5e19), D(1.0), D(1.0), D(1.0))),           // > DECIMAL(28,9)
      (3L, Array(D(1.0), null, D(2.0), D(3.0))),                // null element
      (4L, Array(D(5e18), D(5e18), D(5e18), D(5e18))),          // sum overflows mid-fold
      (5L, Array(D(1e10), D(1.0), D(-2.5), D(0.5))),            // past the long fast path
      (6L, Array(D(0.25), D(-1.75), D(3.5), D(0.125)))          // plain fast path
    ).toDF("vec_id", "embedding")
    val native = Similarity.randomProject(rows, outDim = 4, dim = 4)
      .as[(Long, Long, Option[Double])].collect().toSeq.sortBy(r => (r._1, r._2))
    val hof = rows
      .withColumn("v", col("embedding").cast("array<double>"))
      .withColumn("msk", lit(Similarity.rpMasks(4, 4)))
      .withColumn("rp", Similarity.rpProjectHofExpr(4, 4))
      .select(col("vec_id"), posexplode(col("rp")).as(Seq("k", "comp")))
      .select(col("vec_id"), col("k").cast("long"), col("comp"))
      .as[(Long, Long, Option[Double])].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(native == hof)
    // broken rows null every component (the fold sums ALL elements);
    // clean rows — including slow-path magnitudes — still score
    val byVec = native.groupBy(_._1).view.mapValues(_.map(_._3)).toMap
    for (vid <- Seq(0L, 1L, 2L, 3L)) assert(byVec(vid).forall(_.isEmpty), s"vec $vid")
    assert(byVec(5L).forall(_.nonEmpty) && byVec(6L).forall(_.nonEmpty))
    // ragged vectors: SHORTER than dim is degenerate (the fold's
    // element_at past the end nulls the sticky accumulator — all-null
    // output, never a throw); LONGER projects its first dim elements,
    // identically to the same vector truncated at dim
    val ragged = Seq(
      (10L, Array(D(1.0), D(2.0), D(3.0))),                       // 3 < dim=4
      (11L, Array(D(1.0), D(2.0), D(3.0), D(4.0), D(99.0))),      // 5 > dim=4
      (12L, Array(D(1.0), D(2.0), D(3.0), D(4.0))),               // exact dim
      (13L, Array.empty[java.lang.Double])                        // empty
    ).toDF("vec_id", "embedding")
    val rgot = Similarity.randomProject(ragged, outDim = 4, dim = 4)
      .as[(Long, Long, Option[Double])].collect().toSeq.sortBy(r => (r._1, r._2))
    val rby = rgot.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    assert(rby(10L).forall(_.isEmpty) && rby(13L).forall(_.isEmpty))
    assert(rby(11L).forall(_.nonEmpty))
    assert(rby(11L) == rby(12L), "extra trailing elements must not affect the projection")
  }

  test("int8 codec: i8Encode/i8Dot reproduce the quantizer, estimate within guard") {
    import graft.functions.VectorUtil
    import org.apache.spark.sql.catalyst.util.ArrayData
    val a = Array(0.3, -1.2, 0.0, 0.77)
    val b = Array(-0.5, 0.9, 1.1, 0.2)
    def enc(v: Array[Double]): Array[Byte] =
      VectorUtil.i8Encode(ArrayData.toArrayData(v), v.map(math.abs).max)
    // codes match the int8QuantizeStats formula exactly
    assert(enc(a).toSeq == a.map(x => math.floor(x * 127.0 / 1.2 + 0.5).toByte).toSeq)
    // dequantized cosine within the documented guard of the exact cosine
    val (sa, sb) = (a.map(math.abs).max, b.map(math.abs).max)
    val (na, nb) = (math.sqrt(a.map(x => x * x).sum), math.sqrt(b.map(x => x * x).sum))
    val exact = a.zip(b).map { case (x, y) => x * y }.sum / (na * nb)
    val approx = sa * sb * VectorUtil.i8Dot(enc(a), enc(b)) / (127.0 * 127.0 * na * nb)
    assert(math.abs(approx - exact) < 0.05, s"approx $approx vs exact $exact")
    // zero vector encodes to zero codes, never divides by zero
    assert(VectorUtil.i8Encode(ArrayData.toArrayData(Array(0.0, 0.0)), 0.0).forall(_ == 0))
  }

  test("ann lsh finds the collinear vector (same-bucket guarantee)") {
    // identical-direction vectors share all sign bits → always candidates
    val got = Similarity.annCosineLsh(vecs, Seq(0L), k = 4, planes = 16, bands = 4)
      .select("vec_id", "cos").as[(Long, Double)].collect().toMap
    assert(got.contains(1L) && got(1L) == 1.0)
    // opposite vector flips every bit → never a candidate
    assert(!got.contains(4L))
  }

  test("ivf search finds the collinear vector and scores match brute force") {
    val got = Similarity.ivfSearch(vecs, Seq(0L), k = 4, nCentroids = 2, nprobe = 2)
      .select("vec_id", "cos").as[(Long, Double)].collect().toMap
    assert(got.contains(1L) && got(1L) == 1.0)
    val bf = Similarity.knnBruteForce(vecs, Seq(0L), k = 4)
      .select("vec_id", "cos").as[(Long, Double)].collect().toMap
    got.foreach { case (id, c) => assert(bf(id) == c) }
  }

  test("ivf with nprobe = nCentroids recalls everything brute force finds") {
    val got = Similarity.ivfSearch(vecs, Seq(0L), k = 4, nCentroids = 2, nprobe = 2)
      .select("vec_id").as[Long].collect().toSet
    val bf = Similarity.knnBruteForce(vecs, Seq(0L), k = 4)
      .select("vec_id").as[Long].collect().toSet
    assert(got == bf)
  }

  test("cosinePairsLsh finds collinear pairs above threshold, skips opposites") {
    val pairs = Similarity.cosinePairsLsh(vecs, threshold = 0.9, planes = 16, bands = 4)
      .select("vec_a", "vec_b", "cos").as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => ((a, b), c) }.toMap
    // vec 0 and 1 are collinear → cos 1.0, always bucketed together
    assert(pairs.get((0L, 1L)).contains(1.0))
    // vec 4 is opposite to 0/1 → never a candidate, and cos < threshold anyway
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("ann results are a subset of brute-force results with equal scores") {
    val bf = Similarity.knnBruteForce(vecs, Seq(0L), k = 4)
      .select("vec_id", "cos").as[(Long, Double)].collect().toMap
    val ann = Similarity.annCosineLsh(vecs, Seq(0L), k = 4, planes = 16, bands = 4)
      .select("vec_id", "cos").as[(Long, Double)].collect()
    ann.foreach { case (id, c) => assert(bf(id) == c) }
  }

  test("recall gate passes at an attainable bar and reports per-query overlap") {
    // ivf with nprobe = nCentroids is exhaustive → recall 1.0 by construction
    val perQ = Similarity.annRecallGate(vecs, Seq(0L), k = 4, minRecall = 1.0,
      mode = "ivf", ivfNprobe = 2, ivfCentroids = 2)
      .as[(Long, Long, Long)].collect()
    assert(perQ.toSeq == Seq((0L, 4L, 4L)))
  }

  test("recall gate throws when aggregate recall misses the bar") {
    // lsh can never return vec 4 (opposite signs) → recall ≤ 3/4 < 0.99
    val ex = intercept[IllegalArgumentException] {
      Similarity.annRecallGate(vecs, Seq(0L), k = 4, minRecall = 0.99,
        mode = "lsh", lshBands = 4).collect()
    }
    assert(ex.getMessage.contains("recall"))
  }

  test("int8 quantization: codes bounded, extremes exact, zero vector safe") {
    val emb = Seq(
      (0L, Array(1f, -1f, 0.5f, 0f), 0),
      (1L, Array(0f, 0f, 0f, 0f), 0)).toDF("vec_id", "embedding", "label")
    val got = Similarity.int8QuantizeStats(emb)
      .as[(Long, Double, Long, Long, Double, Double)].collect().toSeq
    val (id0, scale0, qmin0, qmax0, maxErr0, mse0) = got.head
    assert(id0 == 0L && scale0 == 1.0 && qmin0 == -127L && qmax0 == 127L)
    // ±scale quantize exactly; the 0.5 component carries the only error
    assert(maxErr0 < 1.0 / 127.0 && mse0 < maxErr0 * maxErr0)
    // the all-zero vector must not divide by zero: zero codes, zero error
    assert(got(1) == ((1L, 0.0, 0L, 0L, 0.0, 0.0)))
  }

  test("int8 recall gate: exact at a toy scale, throws at an unreachable bar") {
    val perQ = Similarity.int8KnnRecallGate(vecs, Seq(0L), k = 2, minRecall = 1.0)
      .as[(Long, Long, Long)].collect()
    assert(perQ.toSeq == Seq((0L, 2L, 2L)))
    val ex = intercept[IllegalArgumentException] {
      Similarity.int8KnnRecallGate(vecs, Seq(0L), k = 4, minRecall = 1.01).collect()
    }
    assert(ex.getMessage.contains("recall"))
  }
}
