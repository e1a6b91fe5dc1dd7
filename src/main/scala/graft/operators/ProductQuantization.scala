package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-quantization (PQ) approximate nearest neighbor: compress each
  * vector to `m` sub-space codebook codes (8 codes of 5 bits → 8
  * bytes/vector instead of 256 for a 64-dim float embedding), score
  * queries against codes via an asymmetric distance table, exact-re-rank
  * the survivors.
  *
  * Why it matters at 100 TB: IVF/LSH prune WHICH vectors are scored; PQ
  * shrinks WHAT is stored and scanned — the codes table is ~30× smaller
  * than the embeddings, so the scan stage reads gigabytes instead of
  * terabytes, and codes survive entirely in memory at corpus sizes where
  * raw vectors cannot. Composing both (IVF lists of PQ codes) is the
  * standard billion-scale layout; [[AnnIndex]] holds exactly that
  * composition, built once and queried many times.
  *
  * All stages are deterministic: codebook init is a lowest-hash sample per
  * sub-space, Lloyd refinement uses means rounded to 9 decimals (merge-
  * order ulps cannot leak into assignments), and every argmin tie breaks
  * toward the lowest code id. The embedding dimension is read from the
  * data (never assumed), so any `array<float>` corpus works as long as
  * `dim % m == 0`.
  */
object ProductQuantization {

  /** A trained, reusable ANN index over one embedding corpus:
    *  - `cents`     (c_id, cv, cnorm): IVF coarse centroids
    *  - `codebooks` (sub, code, cv):   PQ sub-space codebooks
    *  - `encoded`   (vec_id, list_id, codes, norm): the compressed corpus
    * Build once with [[buildIndex]], persist to storage with
    * [[writeIndex]], reload with [[loadIndex]] — the production shape
    * (index tables on disk, queried many times) and the fix for paying
    * deterministic training again on every search call. */
  case class AnnIndex(
      cents: DataFrame,
      codebooks: DataFrame,
      encoded: DataFrame,
      m: Int,
      dim: Int)

  /** Embedding width read from the data: one-row scan at index-build
    * time, never a hardcoded fixture width. */
  private[operators] def embeddingDim(embeddings: DataFrame): Int =
    embeddings.select(size(col("embedding")).as("d")).head().getInt(0)

  private def checkDim(dim: Int, m: Int): Int = {
    require(dim > 0 && dim % m == 0,
      s"embedding dim $dim must be a positive multiple of m=$m sub-spaces")
    dim / m
  }

  /** Per-sub-space rows (vec_id, sub, subv) from (vec_id, v) rows. */
  private def subVectors(prepared: DataFrame, m: Int, subDim: Int): DataFrame =
    prepared.select(col("vec_id"), posexplode(expr(
      s"transform(sequence(0, ${m - 1}), s -> slice(v, s * $subDim + 1, $subDim))"))
      .as(Seq("sub", "subv")))

  /** Train per-sub-space codebooks: `codes` centroids per sub-space,
    * deterministic lowest-hash init + `lloydIters` k-means refinements.
    * Returns (sub, code, cv) with code ids 0..codes-1 dense per sub-space. */
  def trainCodebooks(
      embeddings: DataFrame,
      m: Int = 8,
      codes: Int = 16,
      lloydIters: Int = 2): DataFrame = {
    val e = embeddings.withColumn("v", col("embedding").cast("array<double>"))
      .select("vec_id", "v")
    val subDim = checkDim(embeddingDim(embeddings), m)
    val sub = subVectors(e, m, subDim)
      .scopedPersist()
    // init: per sub-space, the `codes` sub-vectors with the lowest
    // md5(vec_id|sub) — uniform AND engine-portable (DuckDB computes the
    // identical hex, same reasoning as Similarity.trainCentroids' seed),
    // so a zero-iteration codebook — and therefore every code assignment
    // — is reproducible in the SQL oracle; xxhash64 ordering was Spark-only
    var cents = sub.withColumn("h",
        md5(concat(col("vec_id").cast("string"), lit("|"),
          col("sub").cast("string")).cast("binary")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("sub").orderBy("h", "vec_id")))
      .where(col("rn") <= codes)
      .select(col("sub"), (col("rn") - 1).cast("int").as("code"), col("subv").as("cv"))
    for (_ <- 1 to lloydIters) {
      // assign: nearest centroid per (vec, sub) by L2 — map-side max_by on
      // negated distance, broadcast codebook (m×codes rows — tiny). Same
      // determinism contract as Similarity.trainCentroids: the argmax
      // ranks on a ROUNDED distance (an unrounded one lets last-ulp
      // summation differences flip near-tied assignments between physical
      // layouts), ties to the lower code.
      val assigned = sub.join(broadcast(cents), "sub")
        .withColumn("d2", round(expr("graft_sqdist(subv, cv)"), 9))
        .groupBy("vec_id", "sub")
        .agg(max_by(struct(col("code"), col("subv")),
          struct(-col("d2"), -col("code"))).as("best"))
        .select(col("sub"), col("best.code").as("code"), col("best.subv").as("subv"))
      // recenter: per-dimension means (m×codes×subDim rows after partial
      // agg), routed through an exact DECIMAL sum — a plain double avg is
      // partition-order-dependent and the 9-round alone cannot mask a
      // flip landing exactly on a rounding boundary
      cents = assigned
        .select(col("sub"), col("code"), posexplode(col("subv")).as(Seq("i", "x")))
        .groupBy("sub", "code", "i")
        .agg(round(sum(col("x").cast("decimal(38,20)")).cast("double")
          / count(lit(1)), 9).as("mu"))
        .groupBy("sub", "code")
        .agg(array_sort(collect_list(struct(col("i"), col("mu")))).as("pairs"))
        .select(col("sub"), col("code"), expr("transform(pairs, p -> p.mu)").as("cv"))
    }
    cents
  }

  /** Encode the corpus: one row per vector, `codes` = array of m code ids
    * (ordered by sub-space), `norm` = the EXACT vector norm (stored beside
    * the codes — 8 bytes — so cosine denominators stay exact). */
  def encode(embeddings: DataFrame, codebooks: DataFrame, m: Int = 8): DataFrame = {
    val e = embeddings.withColumn("v", col("embedding").cast("array<double>"))
      .withColumn("norm", expr("sqrt(graft_dot(v, v))"))
      .select("vec_id", "v", "norm")
    val subDim = checkDim(embeddingDim(embeddings), m)
    // norm rides along through both aggregations (any_value of a column
    // functionally determined by the group key) — carrying 8 bytes beats
    // re-joining the corpus to itself on vec_id afterwards
    e.select(col("vec_id"), col("norm"), posexplode(expr(
      s"transform(sequence(0, ${m - 1}), s -> slice(v, s * $subDim + 1, $subDim))"))
      .as(Seq("sub", "subv")))
      .join(broadcast(codebooks), "sub")
      // rounded BEFORE the argmin (same contract as Similarity.
      // assignToLists): last-ulp summation differences must not flip
      // near-tied code assignments between engines or physical layouts
      .withColumn("d2", round(expr("graft_sqdist(subv, cv)"), 6))
      .groupBy("vec_id", "sub")
      .agg(any_value(col("norm")).as("norm"),
        max_by(col("code"), struct(-col("d2"), -col("code"))).as("code"))
      .groupBy("vec_id")
      .agg(any_value(col("norm")).as("norm"),
        array_sort(collect_list(struct(col("sub"), col("code")))).as("pairs"))
      .select(col("vec_id"), expr("transform(pairs, p -> p.code)").as("codes"),
        col("norm"))
  }

  /** Train the full IVF+PQ index over a corpus: coarse centroids, PQ
    * codebooks, and the encoded corpus with list assignments — every
    * deterministic training pass runs exactly once. The returned frames
    * are persisted; call [[writeIndex]] to make the index durable. */
  def buildIndex(
      embeddings: DataFrame,
      nCentroids: Int = 16,
      m: Int = 8,
      codes: Int = 32,
      lloydIters: Int = 2): AnnIndex = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val dim = embeddingDim(embeddings)
    checkDim(dim, m)
    val e = Similarity.prepared(embeddings, "embedding")
      .select("vec_id", "v", "norm").scopedPersist()
    val cents = Similarity.trainCentroids(e, nCentroids, lloydIters).scopedPersist()
    val lists = Similarity.assignToLists(e, cents).select("list_id", "vec_id")
    val cb = trainCodebooks(embeddings, m, codes, lloydIters).scopedPersist()
    val encoded = encode(embeddings, cb, m).join(lists, "vec_id")
      .select("vec_id", "list_id", "codes", "norm").scopedPersist()
    AnnIndex(cents, cb, encoded, m, dim)
  }

  /** Persist a trained index as parquet tables under `dir` — the
    * build-once/query-many layout (centroids + codebooks are tiny; the
    * encoded corpus is the ~30×-compressed representation). */
  def writeIndex(index: AnnIndex, dir: String): Unit = {
    index.cents.write.mode("overwrite").parquet(s"$dir/centroids.parquet")
    index.codebooks.write.mode("overwrite").parquet(s"$dir/codebooks.parquet")
    index.encoded.write.mode("overwrite").parquet(s"$dir/encoded.parquet")
    index.cents.sparkSession.range(1)
      .select(lit(index.m).as("m"), lit(index.dim).as("dim"))
      .write.mode("overwrite").parquet(s"$dir/meta.parquet")
  }

  /** Reload a persisted index. Queries against a loaded index never pay
    * training again — and never re-scan the raw corpus except for the
    * output-bound exact re-rank. */
  def loadIndex(spark: SparkSession, dir: String): AnnIndex = {
    val meta = spark.read.parquet(s"$dir/meta.parquet").head()
    AnnIndex(
      cents = spark.read.parquet(s"$dir/centroids.parquet"),
      codebooks = spark.read.parquet(s"$dir/codebooks.parquet"),
      encoded = spark.read.parquet(s"$dir/encoded.parquet"),
      m = meta.getAs[Int]("m"),
      dim = meta.getAs[Int]("dim"))
  }

  /** ADC lookup table: per query, the partial dot product of each of its
    * sub-vectors with every codebook centroid — m×codes rows per query,
    * broadcast to the code scan. Output: (q_id, qnorm, sub, code, pdot). */
  private def adcTable(
      e: DataFrame, codebooks: DataFrame, queryIds: Seq[Long],
      m: Int, subDim: Int): DataFrame =
    e.where(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qnorm"))
      .select(col("q_id"), col("qnorm"), posexplode(expr(
        s"transform(sequence(0, ${m - 1}), s -> slice(qv, s * $subDim + 1, $subDim))"))
        .as(Seq("sub", "qsubv")))
      .join(broadcast(codebooks), "sub")
      .withColumn("pdot", expr("graft_dot(qsubv, cv)"))
      .select("q_id", "qnorm", "sub", "code", "pdot")

  /** Sum of per-sub-space partial dots → approximate cosine per
    * (query, vector). `coded` must carry (q_id, vec_id, norm, sub, code)
    * already joined with the ADC `table` columns (qnorm, pdot). */
  private def adcScore(coded: DataFrame): DataFrame =
    coded
      .groupBy("q_id", "vec_id")
      .agg(any_value(col("qnorm")).as("qnorm"), any_value(col("norm")).as("norm"),
        sum("pdot").as("adot"))
      .withColumn("acos", col("adot") / (col("qnorm") * col("norm")))

  /** PQ search against a prebuilt index: asymmetric distance computation
    * over the compressed corpus (every list — no IVF pruning), then the
    * top `rerank` candidates by approximate cosine are re-scored EXACTLY
    * and the top `k` returned. The scan side touches only
    * (vec_id, codes, norm) — the ~30×-smaller representation — plus an
    * output-bound exact re-rank against `embeddings`.
    *
    * Defaults calibrated on the synthetic (iid-random — PQ's worst case:
    * no cluster structure to exploit) corpus: 8×32 codebooks with a
    * 300-candidate exact re-rank hold recall ≥ 0.9 at both fixture scales.
    * `rerank` is a CONSTANT independent of corpus size — at a billion
    * vectors the re-rank stage is still 300 exact dots per query. */
  def pqSearch(
      index: AnnIndex,
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int,
      rerank: Int): DataFrame = {
    val e = Similarity.prepared(embeddings, "embedding").select("vec_id", "v", "norm")
    val table = adcTable(e, index.codebooks, queryIds, index.m, index.dim / index.m)
    val scored = adcScore(index.encoded
      .select(col("vec_id"), col("norm"),
        posexplode(col("codes")).as(Seq("sub", "code")))
      .join(broadcast(table), Seq("sub", "code"))
      .where(col("q_id") =!= col("vec_id")))
    exactRerank(topCandidates(scored, rerank), e, k)
  }

  /** Self-contained PQ search: trains an ephemeral codebook + encoding
    * first (one deterministic pass), then delegates to the indexed path.
    * Prefer [[buildIndex]] + the index overload when running more than one
    * query batch — training is the dominant cost. */
  def pqSearch(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int = 10,
      m: Int = 8,
      codes: Int = 32,
      rerank: Int = 300): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val dim = embeddingDim(embeddings)
    val cb = trainCodebooks(embeddings, m, codes).scopedPersist()
    val encoded = encode(embeddings, cb, m)
      .withColumn("list_id", lit(0L)).scopedPersist()
    pqSearch(AnnIndex(null, cb, encoded, m, dim), embeddings, queryIds, k, rerank)
  }

  /** IVF+PQ against a prebuilt index: the composed billion-scale layout —
    * IVF prunes WHICH lists are scanned (nprobe of C), PQ codes shrink
    * WHAT each scan touches (8 bytes + norm per vector). Queries ADC-score
    * only the vectors in their probed lists, then exact-re-rank `rerank`
    * survivors. Codebooks are shared across lists (non-residual IVFADC —
    * residual-encoding would subtract the list centroid before PQ; same
    * dataflow, one extra broadcast join at encode time). */
  def ivfPqSearch(
      index: AnnIndex,
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int,
      nprobe: Int,
      rerank: Int): DataFrame = {
    val e = Similarity.prepared(embeddings, "embedding").select("vec_id", "v", "norm")
    val probes = Similarity.probeLists(e, index.cents, queryIds, nprobe)
      .select("q_id", "list_id")
    val table = adcTable(e, index.codebooks, queryIds, index.m, index.dim / index.m)
    // candidates = probed lists only; ADC over codes, never raw vectors
    val scored = adcScore(index.encoded
      .join(broadcast(probes), "list_id")
      .where(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"), col("norm"),
        posexplode(col("codes")).as(Seq("sub", "code")))
      .join(broadcast(table), Seq("q_id", "sub", "code")))
    exactRerank(topCandidates(scored, rerank), e, k)
  }

  /** Self-contained IVF+PQ: builds an ephemeral index, then delegates.
    * Prefer [[buildIndex]] + the index overload for repeated queries. */
  def ivfPqSearch(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int = 10,
      nCentroids: Int = 16,
      nprobe: Int = 12,
      m: Int = 8,
      codes: Int = 32,
      rerank: Int = 300): DataFrame =
    ivfPqSearch(buildIndex(embeddings, nCentroids, m, codes),
      embeddings, queryIds, k, nprobe, rerank)

  /** Top-`rerank` ADC candidates per query via the bounded
    * [[graft.functions.TopKAgg]] buffer — the shuffle carries at most
    * `rerank` rows per (query, partition) instead of every scored vector
    * through a ranking-window sort. */
  private def topCandidates(scored: DataFrame, rerank: Int): DataFrame = {
    val topk = udaf(new graft.functions.TopKAgg(rerank))
    scored
      .groupBy("q_id")
      .agg(topk(col("acos"), col("vec_id")).as("top"))
      .select(col("q_id"), explode(expr("transform(top, t -> t._2)")).as("vec_id"))
  }

  /** Streaming index maintenance: encode ARRIVING vectors against a FROZEN
    * index — per-row map work only (no shuffle, no state store, streaming-
    * safe in append mode). The trained centroids + codebooks are tiny
    * (C + m·codes short vectors) and are collected once into the task
    * closure — the standard "broadcast the trained model, score the
    * stream" pattern; training itself stays in batch
    * ([[Similarity.trainCentroids]], [[trainCodebooks]]).
    *
    * Argmin order matches the batch encoders bit-for-bit: index-ordered
    * dot products, ties toward the lowest centroid/code id (inputs iterate
    * id-sorted, comparisons strict). The sub-space width comes from the
    * codebook vectors themselves, so any trained dimension works.
    * Output: (vec_id, list_id, codes, norm) — identical schema to
    * [[encode]] + list assignment. */
  def encodeStream(
      arrivals: DataFrame,
      cents: DataFrame,
      codebooks: DataFrame,
      m: Int = 8): DataFrame = {
    import arrivals.sparkSession.implicits._
    val cA = cents.select("c_id", "cv", "cnorm")
      .as[(Long, Array[Double], Double)].collect().sortBy(_._1)
    // keep (code, cv) pairs: code ids can have gaps if a Lloyd iteration
    // emptied a cluster, so the array index is NOT the code id
    val cbA = codebooks.select("sub", "code", "cv")
      .as[(Int, Int, Array[Double])].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._2, r._3))).toMap
    val subDim = cbA(0).head._2.length
    arrivals.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .as[(Long, Array[Double])]
      .map { case (id, v) =>
        var nn = 0.0
        var i = 0
        while (i < v.length) { nn += v(i) * v(i); i += 1 }
        val norm = math.sqrt(nn)
        // init = lowest centroid id: matches the batch max_by tie policy
        // even in the degenerate all-NaN case (a zero-norm vector)
        var bestC = cA.head._1
        var bestSim = Double.NegativeInfinity
        cA.foreach { case (cid, cv, cnorm) =>
          var d = 0.0
          var j = 0
          val n = math.min(v.length, cv.length)
          while (j < n) { d += v(j) * cv(j); j += 1 }
          val sim = d / (norm * cnorm)
          if (sim > bestSim) { bestSim = sim; bestC = cid }
        }
        val codes = Array.tabulate(m) { s =>
          val start = s * subDim
          var best = 0
          var bestD = Double.MaxValue
          val cb = cbA(s)
          var c = 0
          while (c < cb.length) {
            val (code, cv) = cb(c)
            var d2 = 0.0
            var j = 0
            val n = math.min(subDim, cv.length)
            while (j < n) { val d = v(start + j) - cv(j); d2 += d * d; j += 1 }
            if (d2 < bestD) { bestD = d2; best = code }
            c += 1
          }
          best
        }
        (id, bestC, codes, norm)
      }
      .toDF("vec_id", "list_id", "codes", "norm")
  }

  /** Exact cosine re-rank of (q_id, vec_id) candidates → top-k rows.
    * Candidates are ≤ |Q|·rerank rows by construction → broadcast them
    * rather than letting an unknown-stats post-agg side pick a
    * sort-merge join against the corpus. */
  private def exactRerank(candidates: DataFrame, e: DataFrame, k: Int): DataFrame =
    broadcast(candidates)
      .join(e.select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("norm").as("qnorm")), "q_id")
      .join(e, "vec_id")
      .withColumn("cos", round(expr("graft_dot(qv, v) / (qnorm * norm)"), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(desc("cos"), asc("vec_id"))))
      .where(col("rank") <= k)
      .select("q_id", "rank", "vec_id", "cos")
      .orderBy("q_id", "rank")
}
