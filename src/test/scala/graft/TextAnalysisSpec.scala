package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("sequencePacking: bins are contiguous and boundaries respect the budget") {
    val docs = (1L to 40L).map(i => (i, ("tok " * 100).trim)).toDF("doc_id", "text")
    val packed = TextAnalysis.sequencePacking(docs, targetTokens = 256)
      .select("doc_id", "n_tokens", "cum_tokens", "bin_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(packed.map(_._2).forall(_ == 100))
    // bin of each doc = floor(tokens-before-it / 256)
    packed.foreach { case (_, n, cum, bin) => assert(bin == (cum - n) / 256) }
    // bins are non-decreasing in doc order and contiguous from 0
    val bins = packed.sortBy(_._1).map(_._4)
    assert(bins == bins.sorted)
    assert(bins.distinct == (0L to bins.max).toSeq)
  }

  test("sequencePacking with shardCol packs each shard independently") {
    val docs = Seq(
      (1L, ("t " * 100).trim, "a"), (2L, ("t " * 100).trim, "a"),
      (3L, ("t " * 100).trim, "b"), (4L, ("t " * 100).trim, "b"),
    ).toDF("doc_id", "text", "source")
    val bins = TextAnalysis.sequencePacking(docs, targetTokens = 150, shardCol = Some("source"))
      .select("doc_id", "bin_id").as[(Long, Long)].collect().toMap
    // each shard restarts at bin 0: docs 1 and 3 both open bin 0
    assert(bins(1L) == 0 && bins(3L) == 0)
    assert(bins(2L) == 0 && bins(4L) == 0) // second doc starts at token 100 < 150
  }

  test("datasetSplit: deterministic, complete, roughly 75/12.5/12.5") {
    val docs = Tables("documents")
    val split = TextAnalysis.datasetSplit(docs)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    val total = split.values.sum
    assert(total == docs.count())
    assert(split("train").toDouble / total > 0.6)
    assert(split.keySet == Set("train", "val", "test"))
    // stable across runs
    val again = TextAnalysis.datasetSplit(docs)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(again == split)
  }

  private def Tables(name: String) =
    graft.sources.Tables.load(spark, "/root/testdata/sf0.001", name)

  test("bigramPmi: hand-computed counts and PMI on a micro corpus") {
    val docs = Seq((1L, "new york new york is big")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramPmi(docs, minCount = 1L, k = 10)
      .select("w1", "w2", "n_ab", "n_a", "n_b", "pmi")
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    // bigrams: (new,york)×2, (york,new), (york,is), (is,big) — B=5, T=6
    assert(out.length == 4)
    val top = out.head
    assert((top._1, top._2, top._3, top._4, top._5) == ("new", "york", 2L, 2L, 2L))
    val expected = BigDecimal(math.log((2.0 / 5.0) / ((2.0 / 6.0) * (2.0 / 6.0))))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(top._6 == expected)
    // deterministic order: count desc, then (w1, w2) asc
    assert(out.map(r => (r._1, r._2)) ==
      Seq(("new", "york"), ("is", "big"), ("york", "is"), ("york", "new")))
  }

  test("lmDocScores: hand-computed add-one bigram log-probs on a micro corpus") {
    def r9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val toks = Seq(
      (1L, Seq("a", "b", "a", "b")),
      (2L, Seq("a", "b")),
      (3L, Seq("c"))).toDF("doc_id", "tokens")
    val out = TextAnalysis.lmDocScoresFromTokens(toks)
      .as[(Long, Long, Double)].collect().toSeq
    // corpus model: C(a,b)=3, C(b,a)=1; ctx(a)=3, ctx(b)=1; V=3 (a,b,c —
    // c has no transitions but is vocabulary). doc 3 has none → excluded.
    val lab = r9(math.log((3.0 + 1) / (3 + 3))) // ln(4/6)
    val lba = r9(math.log((1.0 + 1) / (1 + 3))) // ln(2/4)
    assert(out.map(r => (r._1, r._2)) == Seq((1L, 3L), (2L, 1L)))
    assert(out(0)._3 == r9((lab + lba + lab) / 3))
    assert(out(1)._3 == lab)
  }

  test("lmDocScoresKn: hand-computed Kneser-Ney bigram log-probs") {
    def r9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val toks = Seq(
      (1L, Seq("a", "b", "a", "b")),
      (2L, Seq("a", "b")),
      (3L, Seq("c"))).toDF("doc_id", "tokens")
    val bigrams = TextAnalysis.bigramCountsFromTokens(toks)
    val out = TextAnalysis.lmDocScoresKnFromModel(toks, bigrams, d = 0.75)
      .as[(Long, Long, Double)].collect().toSeq
    // model: C(a,b)=3, C(b,a)=1; ctx(a)=3 (N1+fwd=1), ctx(b)=1 (N1+fwd=1);
    // N1+rev(b)=1, N1+rev(a)=1; types=2
    val pab = (3.0 - 0.75) / 3 + ((0.75 * 1) / 3) * (1.0 / 2)
    val pba = (1.0 - 0.75) / 1 + ((0.75 * 1) / 1) * (1.0 / 2)
    val lab = r9(math.log(pab))
    val lba = r9(math.log(pba))
    assert(out.map(r => (r._1, r._2)) == Seq((1L, 3L), (2L, 1L)))
    assert(out(0)._3 == r9((lab + lba + lab) / 3))
    assert(out(1)._3 == lab)
  }

  test("Kneser-Ney properties: per-context mass sums to 1, monotone in count") {
    // sums-to-one over the vocabulary: SUM_observed (C-D)/ctx = 1 - λ(w1)
    // and continuation probabilities sum to 1 over ALL w2, so
    // SUM_all_w2 p_KN(w2|w1) = 1 per context — check on the fixture model
    val toks = operators.Tfidf.tokenArrays(
      sources.Tables.documents(spark, "/root/testdata/sf0.001"))
    val bigrams = TextAnalysis.bigramCountsFromTokens(toks)
      .as[(String, String, Long)].collect().toSeq
    val d = 0.75
    val ctx = bigrams.groupBy(_._1).view.mapValues(g => (g.map(_._3).sum, g.size)).toMap
    val rev = bigrams.groupBy(_._2).view.mapValues(_.size).toMap
    val types = bigrams.size.toDouble
    // continuation distribution is a distribution
    assert(math.abs(rev.values.sum / types - 1.0) < 1e-12)
    for ((w1, (n, fwd)) <- ctx.take(200)) {
      val lambda = d * fwd / n
      val observedMass = bigrams.filter(_._1 == w1).map(b => (b._3 - d) / n).sum
      assert(math.abs(observedMass - (1.0 - lambda)) < 1e-9, w1)
    }
    // monotonicity: with everything else fixed, a higher bigram count
    // gives a strictly higher p_KN (the discount is additive-constant)
    def pkn(c: Long, n: Long, fwd: Int, revN: Int): Double =
      (c - d) / n + (d * fwd / n) * (revN / types)
    for ((w1, w2, c) <- bigrams.take(200)) {
      val (n, fwd) = ctx(w1)
      assert(pkn(c + 1, n + 1, fwd, rev(w2)) * (n + 1) > pkn(c, n, fwd, rev(w2)) * n)
      if (c >= 2) assert(pkn(c, n, fwd, rev(w2)) > pkn(c - 1, n, fwd, rev(w2)))
    }
    // and the scored corpus agrees with a direct local recomputation of
    // every document's mean (full-model check, not just sampled contexts)
    val got = TextAnalysis.lmDocScoresKnFromModel(
      toks, TextAnalysis.bigramCountsFromTokens(toks), d)
      .as[(Long, Long, Double)].collect().toSeq
    def r9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pairCount = bigrams.map(b => (b._1, b._2) -> b._3).toMap
    val localDocs = operators.Tfidf.tokenArrays(
      sources.Tables.documents(spark, "/root/testdata/sf0.001"))
      .as[(Long, Seq[String])].collect().toSeq
    val expected = localDocs
      .filter(_._2.length >= 2)
      .map { case (id, ts) =>
        val lps = ts.sliding(2).toSeq.map { case Seq(w1, w2) =>
          val (n, fwd) = ctx(w1)
          BigDecimal(r9(math.log(pkn(pairCount((w1, w2)), n, fwd, rev(w2)))))
        }
        (id, lps.size.toLong, r9(lps.sum.toDouble / lps.size))
      }
      .sortBy(_._1)
    assert(got == expected)
  }

  test("lmDocScoresKn3: hand-computed trigram interpolated KN log-probs") {
    def r9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val toks = Seq(
      (1L, Seq("a", "b", "a", "b", "a")),
      (2L, Seq("b", "a", "b")),
      (3L, Seq("c", "c"))).toDF("doc_id", "tokens") // <3 tokens: drops out
    val tri = TextAnalysis.trigramCountsFromTokens(toks)
    val tc = Seq(("a", 1L, 1L), ("b", 1L, 1L), ("c", 3L, 2L))
      .toDF("term", "doc_id", "cnt")
    val out = TextAnalysis.lmDocScoresKn3FromModel(toks, tri, tc, d = 0.75)
      .as[(Long, Long, Double)].collect().toSeq
    // model: C(aba)=2, C(bab)=2; ctx(a,b)=2 (fwd 1), ctx(b,a)=2 (fwd 1);
    // cont2(b,a)=1, cont2(a,b)=1; mid(a)=mid(b)=(1,1); cont1(a)=cont1(b)=1;
    // types=2
    val p1 = 1.0 / 2
    val p2 = (1.0 - 0.75) / 1 + ((0.75 * 1) / 1) * p1    // 0.625
    val p3 = (2.0 - 0.75) / 2 + ((0.75 * 1) / 2) * p2    // 0.859375
    val l3 = r9(math.log(p3))
    assert(out.map(r => (r._1, r._2)) == Seq((1L, 3L), (2L, 1L)))
    assert(out(0)._3 == r9((l3 * 3) / 3) && out(1)._3 == l3)
  }

  test("KN3 backoff: unseen contexts interpolate level by level, never saturate to 1/V") {
    def r9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val train = Seq(
      (1L, Seq("a", "b", "a", "b", "a")),
      (2L, Seq("b", "a", "b"))).toDF("doc_id", "tokens")
    val tri = TextAnalysis.trigramCountsFromTokens(train)
    val tc = Seq(("a", 1L, 1L), ("b", 1L, 1L)).toDF("term", "doc_id", "cnt")
    // held-out transitions over the SAME model:
    //  (b,b,a): context (b,b) unseen -> falls through to p2(a|b) = 0.625
    //  (a,b,z): context seen, (b,z) continuation unseen, z unseen ->
    //           lam3(a,b) * lam2(b) * (1/V) = (.75*1/2)*(.75*1/1)*(1/2)
    val heldOut = Seq((10L, Seq("b", "b", "a")), (11L, Seq("a", "b", "z")))
      .toDF("doc_id", "tokens")
    val got = TextAnalysis.lmDocScoresKn3FromModel(heldOut, tri, tc, d = 0.75)
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, s) => id -> ((n, s)) }.toMap
    val p2a = (1.0 - 0.75) / 1 + ((0.75 * 1) / 1) * 0.5
    assert(got(10L) == ((1L, r9(math.log(p2a)))))
    val pz = ((0.75 * 1) / 2) * (((0.75 * 1) / 1) * (1.0 / 2))
    assert(got(11L) == ((1L, r9(math.log(pz)))))
    // the whole point vs add-one: a fluent-but-unseen transition keeps
    // interpolated mass far above the uniform floor, and even the
    // fully-unseen word keeps its backoff weights explicit
    assert(p2a > 0.5 && pz > 0.0)
  }

  test("KN3 properties: mass sums to 1 at every level; fixture recompute pins the model") {
    val toks = operators.Tfidf.tokenArrays(
      sources.Tables.documents(spark, "/root/testdata/sf0.001"))
    val tri = TextAnalysis.trigramCountsFromTokens(toks)
      .as[(String, String, String, Long)].collect().toSeq
    val d = 0.75
    val ctx = tri.groupBy(t => (t._1, t._2)).view
      .mapValues(g => (g.map(_._4).sum, g.size)).toMap
    val cont2 = tri.map(t => (t._2, t._3)).distinct
    val cont1 = cont2.groupBy(_._2).view.mapValues(_.size).toMap
    val nCt = cont2.size.toDouble
    def p1(w3: String): Double = cont1(w3) / nCt
    // cont23(w2 -> w3 -> N1+(.w2w3)): distinct w1 preceding each (w2,w3)
    val cont23By = tri.groupBy(_._2).view.mapValues(g =>
      g.groupBy(_._3).view.mapValues(_.map(_._1).distinct.size).toMap).toMap
    // p1 is a distribution
    assert(math.abs(cont1.values.sum / nCt - 1.0) < 1e-12)
    // p2 mass per w2 over the FULL vocabulary: observed continuations get
    // the discounted term, unseen ones the interpolation arm lam2*p1 (the
    // same backoff arm the scorer's CASE takes) — exactly 1 by the KN
    // identity SUM(c - D) = mid - D*n1p and SUM_all p1 = 1
    val vocabW3 = cont1.keys.toSeq
    for ((w2, cont23) <- cont23By.take(50)) {
      val midSum = cont23.values.sum.toDouble
      val lam2 = (d * cont23.size) / midSum
      val mass = vocabW3.map { w3 =>
        cont23.get(w3) match {
          case Some(c) => (c - d) / midSum + lam2 * p1(w3)
          case None => lam2 * p1(w3)
        }
      }.sum
      assert(math.abs(mass - 1.0) < 1e-9, s"p2 mass for $w2: $mass")
    }
    // p3 mass per observed (w1,w2) context over the full vocabulary —
    // unseen trigrams and unseen continuations take exactly the scorer's
    // backoff arms
    for (((w1, w2), (c12, fwd)) <- ctx.take(50)) {
      val cont23 = cont23By(w2)
      val midSum = cont23.values.sum.toDouble
      val lam2 = (d * cont23.size) / midSum
      def p2t(w3: String): Double = cont23.get(w3) match {
        case Some(c) => (c - d) / midSum + lam2 * p1(w3)
        case None => lam2 * p1(w3)
      }
      val triHere = tri.filter(t => t._1 == w1 && t._2 == w2)
        .map(t => t._3 -> t._4).toMap
      val lam3 = (d * fwd) / c12.toDouble
      val mass = vocabW3.map { w3 =>
        triHere.get(w3) match {
          case Some(c) => (c - d) / c12 + lam3 * p2t(w3)
          case None => lam3 * p2t(w3)
        }
      }.sum
      assert(math.abs(mass - 1.0) < 1e-9, s"p3 mass for ($w1,$w2): $mass")
    }
    // full-model local recompute of every document's mean == the operator
    def r9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val triCount = tri.map(t => (t._1, t._2, t._3) -> t._4).toMap
    val localDocs = toks.as[(Long, Seq[String])].collect().toSeq
    val expected = localDocs
      .filter(_._2.length >= 3)
      .map { case (id, ts) =>
        val lps = ts.sliding(3).toSeq.map { case Seq(w1, w2, w3) =>
          val (c12, fwd) = ctx((w1, w2))
          val cont23 = cont23By(w2)
          val midSum = cont23.values.sum.toDouble
          val p2v = (cont23(w3) - d) / midSum +
            ((d * cont23.size) / midSum) * p1(w3)
          val p3v = (triCount((w1, w2, w3)) - d) / c12 +
            ((d * fwd) / c12.toDouble) * p2v
          BigDecimal(r9(math.log(p3v)))
        }
        (id, lps.size.toLong, r9(lps.sum.toDouble / lps.size))
      }
      .sortBy(_._1)
    val tc = Seq(("a", 1L, 1L)).toDF("term", "doc_id", "cnt") // V unused in-corpus
    val got = TextAnalysis.lmDocScoresKn3FromModel(toks,
      TextAnalysis.trigramCountsFromTokens(toks), tc, d)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == expected)
  }

  test("qualityRankFilterSampled keeps the rank-exact set on tie-free boundaries") {
    val docs = sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val exact = TextAnalysis.qualityRankFilter(docs, dropFraction = 0.25)
      .select("doc_id").as[Long].collect().toSet
    val sampled = TextAnalysis.qualityRankFilterSampled(docs, dropFraction = 0.25)
      .select("doc_id").as[Long].collect().toSet
    assert(sampled == exact && exact.nonEmpty)
    // integer f·n boundary too (sources of 100 docs at f=0.25 hit it)
    val exact2 = TextAnalysis.qualityRankFilter(docs, dropFraction = 0.2)
      .select("doc_id").as[Long].collect().toSet
    val sampled2 = TextAnalysis.qualityRankFilterSampled(docs, dropFraction = 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(sampled2 == exact2)
    // dropFraction 0 keeps everything, with the SAME 4-column schema as
    // every thresholded call (null q_threshold = "no cut"), so outputs
    // union across parameterizations without an AnalysisException
    val noCut = TextAnalysis.qualityRankFilterSampled(docs, 0.0)
    assert(noCut.count() == docs.count())
    assert(noCut.columns.toSeq ==
      TextAnalysis.qualityRankFilterSampled(docs, 0.25).columns.toSeq)
    assert(noCut.unionByName(TextAnalysis.qualityRankFilterSampled(docs, 0.25))
      .count() > 0)
    assert(noCut.where(col("q_threshold").isNotNull).count() == 0)
    // tie semantics: a tie ACROSS the cut drops as a whole value group
    // (thresholds cannot see doc_ids) — the documented divergence from
    // rank-exact, which tiebreaks by doc_id and drops exactly one here
    val tied = Seq(
      (1L, "s", "1111"), (2L, "s", "1111"), // digit-only: quality 0.1, tied LOW
      (3L, "s", "aaaa"), (4L, "s", "cccc")).toDF("doc_id", "source", "text")
    val exactTied = TextAnalysis.qualityRankFilter(tied, dropFraction = 0.25)
      .select("doc_id").as[Long].collect().toSet
    assert(exactTied == Set(2L, 3L, 4L)) // doc_id breaks the low-quality tie
    val keptTied = TextAnalysis.qualityRankFilterSampled(tied, dropFraction = 0.25)
      .select("doc_id").as[Long].collect().toSet
    // f·n = 1 (integer) → drop quality <= threshold: BOTH tied lows go
    assert(keptTied == Set(3L, 4L))
  }

  test("lowQualityByStoredThresholds replays the sampled cut's verdict; unknown sources refuse") {
    val dir = "/root/testdata/sf0.001"
    val docs = sources.Tables.documents(spark, dir)
    // manifest-family BLOCK arrival split: whole 20-id blocks (one full
    // source cycle) arrive together, so every source has a stored threshold
    val old = docs.where(expr("(doc_id div 20) % 10") =!= 9)
    val batch = docs.where(expr("(doc_id div 20) % 10") === 9)
    val thresholds = TextAnalysis.qualityThresholds(old, dropFraction = 0.25)
    // the stored-threshold verdict on the SNAPSHOT corpus itself must be
    // exactly the sampled cut's complement (same thresholds, same
    // boundary rule — low_quality = NOT kept)
    val keptSampled = TextAnalysis.qualityRankFilterSampled(old, 0.25)
      .select("doc_id").as[Long].collect().toSet
    val flags = TextAnalysis.lowQualityByStoredThresholds(old, thresholds)
      .select("doc_id", "low_quality").as[(Long, Long)].collect()
    assert(flags.nonEmpty && flags.forall { case (id, lq) =>
      (lq == 0L) == keptSampled.contains(id) })
    // an append batch scores at O(batch) against the stored table and
    // both verdicts occur on the real fixture
    val batchFlags = TextAnalysis.lowQualityByStoredThresholds(batch, thresholds)
      .select("low_quality").as[Long].collect().toSeq
    assert(batchFlags.contains(0L) && batchFlags.contains(1L))
    // a source with no stored calibration refuses VISIBLY (low_quality=1),
    // never silently admits
    val alien = Seq((999L, "src_alien", "perfectly reasonable english text here"))
      .toDF("doc_id", "source", "text")
    val alienFlag = TextAnalysis.lowQualityByStoredThresholds(alien, thresholds)
      .select("doc_id", "low_quality").as[(Long, Long)].collect().toSeq
    assert(alienFlag == Seq((999L, 1L)))
  }

  test("perplexityBucketsSampledKn buckets like the rank-exact KN cut on the fixture") {
    val docs = sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val toks = operators.Tfidf.tokenArrays(docs)
    val bigrams = TextAnalysis.bigramCountsFromTokens(toks)
    val exact = TextAnalysis.perplexityBucketsKn(docs, toks, bigrams)
      .select("doc_id", "ppl_bucket").as[(Long, String)].collect().toMap
    val sampled = TextAnalysis.perplexityBucketsSampledKn(docs, toks, bigrams)
      .select("doc_id", "ppl_bucket").as[(Long, String)].collect().toMap
    assert(sampled == exact && exact.nonEmpty)
  }

  test("perplexityBucketsSampledKn3 buckets like the rank-exact KN3 cut on the fixture") {
    val docs = sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val toks = operators.Tfidf.tokenArrays(docs)
    val tri = TextAnalysis.trigramCountsFromTokens(toks)
    val tc = Seq(("a", 1L, 1L)).toDF("term", "doc_id", "cnt") // V unused in-corpus
    val exact = TextAnalysis.perplexityBucketsKn3(docs, toks, tri, tc)
      .select("doc_id", "ppl_bucket").as[(Long, String)].collect().toMap
    val sampled = TextAnalysis.perplexityBucketsSampledKn3(docs, toks, tri, tc)
      .select("doc_id", "ppl_bucket").as[(Long, String)].collect().toMap
    assert(sampled == exact && exact.nonEmpty)
  }

  test("packingEfficiency: truncation counts and padding bound, hand-computed") {
    val tc = Seq(("w", 1L, 10L), ("w", 2L, 100L)).toDF("term", "doc_id", "cnt")
    val got = TextAnalysis.packingEfficiency(tc, maxLens = Seq(64, 128))
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect().toSeq
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    // L=64: doc2 truncates, kept 10+64=74; pad bound (2*64-74)/(2*64)
    assert(got(0) == ((64L, 2L, 1L, 110L, 74L, r9(36.0 / 110), r9(54.0 / 128))))
    // L=128: nothing truncates; pad bound (256-110)/256
    assert(got(1) == ((128L, 2L, 0L, 110L, 110L, 0.0, r9(146.0 / 256))))
  }

  test("sourceTemperaturePlan: smallest source keeps rate 1, alpha=1 is identity") {
    val docs = Seq((1L, "s_big"), (2L, "s_big"), (3L, "s_small"))
      .toDF("doc_id", "source")
    // tokens: s_big = 90, s_small = 10
    val tc = Seq(("w", 1L, 50L), ("w", 2L, 40L), ("w", 3L, 10L))
      .toDF("term", "doc_id", "cnt")
    val got = TextAnalysis.sourceTemperaturePlan(docs, tc, alpha = 0.5)
      .select("source", "total_tokens", "rate", "expected_tokens")
      .as[(String, Long, Double, Long)].collect().map(r => r._1 -> r).toMap
    // smallest source anchors at rate 1; α=0.5 → rate_big = (p_b/p_s)^-0.5
    // = sqrt(10/90) = 1/3
    assert(got("s_small")._3 == 1.0 && got("s_small")._4 == 10L)
    assert(math.abs(got("s_big")._3 - 1.0 / 3.0) < 1e-8)
    assert(got("s_big")._4 == 30L)
    // α = 1: no rebalancing at all
    val id = TextAnalysis.sourceTemperaturePlan(docs, tc, alpha = 1.0)
      .select("rate").as[Double].collect()
    assert(id.forall(_ == 1.0))
    // a token-less source gets rate 0, not NaN (the sourceMixturePlan guard)
    val withEmpty = TextAnalysis.sourceTemperaturePlan(
      docs.unionByName(Seq((4L, "s_empty")).toDF("doc_id", "source")), tc, alpha = 0.5)
      .select("source", "rate").as[(String, Double)].collect().toMap
    assert(withEmpty("s_empty") == 0.0)
  }

  test("perplexityBuckets: per-source rank-exact terciles over LM scores") {
    val toks = Seq(
      (1L, Seq("a", "b", "a", "b")), (2L, Seq("a", "b")), (3L, Seq("b", "a")),
      (4L, Seq("a", "b", "a")), (5L, Seq("b", "a", "b")), (6L, Seq("a", "a")),
      (7L, Seq("c"))).toDF("doc_id", "tokens")
    val docs = Seq((1L, "s1"), (2L, "s1"), (3L, "s1"), (4L, "s2"), (5L, "s2"),
      (6L, "s2"), (7L, "s2")).toDF("doc_id", "source")
    // model assets built from the same token stream
    val typed = toks.as[(Long, Seq[String])]
    val bigrams = typed.flatMap { case (_, ts) => ts.zip(ts.drop(1)) }
      .toDF("w1", "w2").groupBy("w1", "w2").agg(count(lit(1)).as("n_ab"))
    val tc = typed.flatMap { case (id, ts) => ts.map(t => (t, id)) }
      .toDF("term", "doc_id").groupBy("term", "doc_id")
      .agg(count(lit(1)).as("cnt"))
    val out = TextAnalysis.perplexityBuckets(docs, toks, bigrams, tc)
      .as[(Long, String, Double, Long, String)].collect().toSeq
    // doc 7 has no transitions → no LM score → excluded (as in lmDocScores)
    assert(out.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L, 6L))
    // each source has 3 scored docs → exactly one head/middle/tail each
    for (src <- Seq("s1", "s2")) {
      val inSrc = out.filter(_._2 == src).sortBy(_._4)
      assert(inSrc.map(_._5) == Seq("head", "middle", "tail"))
      // rank order must follow (avg_logprob DESC, doc_id ASC)
      assert(inSrc.map(r => (-r._3, r._1)) == inSrc.map(r => (-r._3, r._1)).sorted)
    }
    // bucket scores agree with the standalone LM scorer (FromModel parity)
    val lm = TextAnalysis.lmDocScoresFromTokens(toks)
      .select("doc_id", "avg_logprob").as[(Long, Double)].collect().toMap
    assert(out.forall(r => lm(r._1) == r._3))
  }

  test("bpeTrainMerges learns the classic Sennrich merge sequence") {
    // the worked example from the BPE paper: vocabulary
    // low×5, lower×2, newest×6, widest×3 (with </w> markers).
    // Hand-tallied rounds: (e,s):9 ties (s,t):9 and (t,</w>):9 → left-asc
    // tie-break picks (e,s); then (es,t):9; (est,</w>):9; (l,o):7 ties
    // (o,w):7 → (l,o); then (lo,w):7.
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("term", "freq")
    val got = TextAnalysis.bpeTrainMerges(vocab, nMerges = 5)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "est", "</w>", "est</w>", 9L),
      (4, "l", "o", "lo", 7L),
      (5, "lo", "w", "low", 7L)))
    // merged symbol is always the concatenation of the pair
    assert(got.forall(r => r._4 == r._2 + r._3))
  }

  test("sourceTermHll: per-source sketches and their union track exact counts") {
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "source")
    // source a: terms {x, y, z}; source b: {y, z, w} — union {x, y, z, w}
    val tc = Seq((1L, "x", 1L), (1L, "y", 2L), (2L, "z", 1L),
      (3L, "y", 1L), (3L, "z", 3L), (3L, "w", 1L))
      .toDF("doc_id", "term", "cnt")
    val got = TextAnalysis.sourceTermHll(docs, tc)
      .as[(String, Double, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._3)) ==
      Seq(("__all__", 4L), ("a", 3L), ("b", 3L)))
    // HLL is exact at these cardinalities (sparse mode); the union row's
    // estimate must come from MERGED per-source sketches, not a re-scan
    got.foreach { case (src, approx, exact) =>
      assert(math.abs(approx - exact) / exact < 0.05, s"$src: $approx vs $exact")
    }
  }

  test("bpeSegmentVocab encodes with the learned rules, leftmost-greedy") {
    // the 5 rules learned in the Sennrich test: es, est, est</w>, lo, low
    val rules = Seq(("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w"))
    val got = TextAnalysis.bpeSegmentVocab(
        Seq("low", "lower", "newest", "widest").toDF("term"), rules)
      .select("term", "subwords").as[(String, Seq[String])].collect().toMap
    assert(got("low") == Seq("low", "</w>"))
    assert(got("lower") == Seq("low", "e", "r", "</w>"))
    assert(got("newest") == Seq("n", "e", "w", "est</w>"))
    assert(got("widest") == Seq("w", "i", "d", "est</w>"))
  }

  test("bpeRoundTripGate passes on real segmentations, throws on corruption") {
    val rules = Seq(("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w"))
    val segs = TextAnalysis.bpeSegmentVocab(
      Seq("low", "lower", "newest", "widest", "zzz").toDF("term"), rules)
    val row = TextAnalysis.bpeRoundTripGate(segs, rules)
      .select("n_terms", "n_rules", "n_roundtrip_fail", "n_unclosed_terms")
      .as[(Long, Long, Long, Long)].collect().head
    assert(row == ((5L, 5L, 0L, 0L)))
    // a dropped subword breaks the concatenation property
    val lossy = segs.withColumn("subwords",
      org.apache.spark.sql.functions.slice(
        org.apache.spark.sql.functions.col("subwords"), 1, 1))
    assertThrows[IllegalArgumentException](TextAnalysis.bpeRoundTripGate(lossy, rules))
    // a multi-char subword no rule built breaks merge-closure (round-trip
    // still holds: "zz"+"z"+marker concatenates fine)
    val forged = Seq(("zzz", Seq("zz", "z", "</w>"))).toDF("term", "subwords")
    assertThrows[IllegalArgumentException](TextAnalysis.bpeRoundTripGate(forged, rules))
  }

  test("bpeTrainMerges stops early once no pairs remain") {
    val vocab = Seq(("ab", 3L)).toDF("term", "freq")
    // ab</w> has 2 pairs; afterwards the word is one symbol — rounds past
    // exhaustion must not emit rules or loop forever
    val got = TextAnalysis.bpeTrainMerges(vocab, nMerges = 10)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(got.map(r => (r._2, r._3)) == Seq(("a", "b"), ("ab", "</w>")))
  }

  test("gopherRules: per-rule flags and the pass conjunction, hand-computed") {
    val docs = Seq(
      (1L, "the cat and the dog have a nap"),    // 8 words, all alpha, stops
      (2L, "x1 99 $$ %% !!"),                    // symbols/digits: fails alpha+stop
      (3L, "supercalifragilistic expialidocious antidisestablishmentarianism of the")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRules(docs, minWords = 3L, maxWords = 10L,
        minMeanLen = 2.0, maxMeanLen = 6.0, minAlphaFrac = 0.8, minStopHits = 2L)
      .select("doc_id", "n_words", "r_words", "r_word_len", "r_alpha", "r_stop", "pass")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1: 8 words, mean len (3+3+3+3+3+4+1+3)/8 = 2.875, alpha 8/8, stops≥2 → pass
    assert(got(1L) == ((1L, 8L, 1L, 1L, 1L, 1L, 1L)))
    // doc 2: 5 words; only x1 has a letter (1/5 < 0.8); no stop hits
    assert(got(2L)._5 == 0L && got(2L)._6 == 0L && got(2L)._7 == 0L)
    // doc 3: mean word length way over 6 → r_word_len fails, pass fails
    assert(got(3L)._4 == 0L && got(3L)._7 == 0L)
  }

  test("tokenLengthHistogram: hand-computed bins over per-doc totals") {
    val docs = Seq((1L, "a b c"), (2L, "d e"), (3L, (1 to 40).map(_ => "w").mkString(" ")))
      .toDF("doc_id", "text")
    val tc = operators.Tfidf.termCounts(operators.Tfidf.tokenizePortable(docs))
    val got = TextAnalysis.tokenLengthHistogramFromCounts(tc)
      .select("bucket_lo", "n_docs", "sum_tokens", "avg_tokens")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // docs 1 (3 tokens) and 2 (2 tokens) → bucket 0; doc 3 (40) → bucket 32
    assert(got == Seq((0L, 2L, 5L, 2.5), (32L, 1L, 40L, 40.0)))
  }

  test("stopwordCandidates keeps only terms above the df-ratio floor") {
    val docs = Seq((1L, "the cat"), (2L, "the dog"), (3L, "the bird"), (4L, "fish"))
      .toDF("doc_id", "text")
    val tc = operators.Tfidf.termCounts(operators.Tfidf.tokenizePortable(docs))
    val out = TextAnalysis.stopwordCandidatesFromCounts(tc, totalDocs = 4L, minDfRatio = 0.5)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out == Seq(("the", 3L, 3L, 0.75)))
  }

  test("sourceMixturePlan levels every source to the smallest token budget") {
    val docs = Seq(
      (1L, "alpha beta gamma", "a"), (2L, "delta epsilon zeta", "a"),
      (3L, "eta theta", "b"),
    ).toDF("doc_id", "text", "source")
    val tc = operators.Tfidf.termCounts(operators.Tfidf.tokenizePortable(docs))
    val out = TextAnalysis.sourceMixturePlan(docs, tc)
      .as[(String, Long, Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out("a") == ((2L, 6L, 0.333333333, math.floor((2.0 / 6.0) * 6.0).toLong)))
    assert(out("b") == ((1L, 2L, 1.0, 2L)))
  }

  test("sourceMixturePlan: a token-less source gets rate 0, not NaN") {
    val docs = Seq(
      (1L, "alpha beta", "a"),
      (2L, "123 456", "z"), // every token digit-dropped → zero tokens
    ).toDF("doc_id", "text", "source")
    val tc = operators.Tfidf.termCounts(operators.Tfidf.tokenizePortable(docs))
    val out = TextAnalysis.sourceMixturePlan(docs, tc)
      .as[(String, Long, Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // corpus minimum is 0 → every source keeps nothing; no NaN anywhere
    assert(out("z") == ((1L, 0L, 0.0, 0L)))
    assert(out("a") == ((1L, 2L, 0.0, 0L)))
  }

  test("qualityRankFilter drops the bottom quartile per source, rank-exact") {
    // 8 docs in one source: 2 digit-heavy (low quality), 6 prose (high)
    val low = Seq((1L, "111 222 333 444 !!!", "s"), (2L, "999 888 777 666 ???", "s"))
    val high = (3L to 8L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog again", "s"))
    val docs = (low ++ high).toDF("doc_id", "text", "source")
    val kept = TextAnalysis.qualityRankFilter(docs, dropFraction = 0.25)
      .select("doc_id").as[Long].collect().toSet
    // floor(0.25 × 8) = 2 dropped — exactly the two digit-heavy docs
    assert(kept == (3L to 8L).toSet)
    val all = TextAnalysis.qualityRankFilter(docs, dropFraction = 0.0)
    assert(all.count() == 8)
  }

  test("piiRedact removes emails and urls") {
    val docs = Seq(
      (1L, "contact me at alice.smith+spam@example.org today"),
      (2L, "see https://example.com/a/b?q=1 for details"),
      (3L, "nothing sensitive here"),
    ).toDF("doc_id", "text")
    val out = TextAnalysis.piiRedact(docs)
      .select("doc_id", "chars_removed").as[(Long, Long)].collect().toMap
    assert(out(1L) > 0)   // email longer than <EMAIL>
    assert(out(2L) > 0)
    assert(out(3L) == 0)
    // redacted fingerprint of doc 3 equals the plain fingerprint (no change)
    val fp = TextAnalysis.fingerprints(docs.where($"doc_id" === 3))
      .select("fingerprint").as[String].head()
    val rfp = TextAnalysis.piiRedact(docs.where($"doc_id" === 3))
      .select("redacted_fp").as[String].head()
    assert(fp == rfp)
  }

  test("langId: stopword-dense text classifies en, stopword-free does not") {
    val docs = Seq(
      (1L, "the cat and the dog sat on a mat in the sun"),
      (2L, "zorro quixote fandango bravado crescendo"),
    ).toDF("doc_id", "text")
    val out = TextAnalysis.langId(docs)
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(out(1L) == "en")
    assert(out(2L) == "unknown")
  }

  test("qualityScore: ratios bounded and ordered by obvious quality") {
    val docs = Seq(
      (1L, "The quick brown fox jumps over the lazy dog and runs away"),
      (2L, "!!! ??? ;;; ,,, 12345 67890 !!! ??? ;;;"),
    ).toDF("doc_id", "text")
    val out = TextAnalysis.qualityScore(docs)
      .select("doc_id", "alpha_ratio", "quality").as[(Long, Double, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    out.values.foreach { case (a, q) => assert(a >= 0 && a <= 1 && q >= 0 && q <= 1.5) }
    assert(out(1L)._2 > out(2L)._2, "clean prose must outscore punctuation soup")
  }

  test("tokenCounts: BPE-ish segmentation counts sub-word units") {
    val docs = Seq((1L, "hello world42 x-y")).toDF("doc_id", "text")
    val (ws, bpe) = TextAnalysis.tokenCounts(docs)
      .select("n_ws_tokens", "n_bpe_tokens").as[(Long, Long)].head()
    assert(ws == 3)
    // hello | world | 42 | x | - | y  → 6 BPE-ish pieces
    assert(bpe == 6)
  }

  test("rollingFingerprints: order-sensitive, content-stable") {
    val a = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val b = Seq((1L, "gamma beta alpha")).toDF("doc_id", "text")
    def fp(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.rollingFingerprints(df).select("rolling_fp").as[Long].head()
    assert(fp(a) != fp(b))      // order matters
    assert(fp(a) == fp(a))      // deterministic
  }

  test("chunkDocuments: overlapping windows, truncated tail, no empty docs") {
    val docs = Seq(
      (1L, "aa bb cc dd ee"),   // 5 tokens, chunk=3 stride=2 → [aa bb cc], [cc dd ee]
      (2L, "xx yy"),            // 2 tokens < chunk → one whole chunk
      (3L, "12 34"),            // all tokens digit-dropped → no chunks
    ).toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocuments(docs, chunkTokens = 3, overlap = 1)
      .select("doc_id", "chunk_idx", "doc_tokens", "chunk_tokens")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L, 5L, 3L), (1L, 1L, 5L, 3L), (2L, 0L, 2L, 2L)))
    // overlap: last token of chunk 0 == first token of chunk 1 → fingerprints
    // of the two chunks of doc 1 differ but share the boundary token "cc"
    val fps = TextAnalysis.chunkDocuments(docs, 3, 1)
      .where($"doc_id" === 1L).select("chunk_fp").as[String].collect()
    assert(fps.distinct.length == 2)
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkDocuments(docs, chunkTokens = 3, overlap = 3)
    }
  }

  test("weightedSourceSample: per-source fractions, absent sources drop") {
    val docs = (0L until 40L).map(i =>
      (i, s"text $i", if (i < 20) "keep_all" else if (i < 30) "keep_none" else "absent"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.weightedSourceSample(docs,
      Map("keep_all" -> 1.0, "keep_none" -> 0.0))
      .select("source").as[String].collect()
    assert(got.toSet == Set("keep_all") && got.length == 20)
  }

  test("compressionStats: boilerplate compresses harder than varied prose") {
    val docs = Seq(
      (1L, "spam spam spam " * 50),                       // repetitive → low ratio
      (2L, (0 until 200).map(i => s"w${i * 7919 % 997}").mkString(" ")), // varied
      (3L, "")).toDF("doc_id", "text")                    // empty → ratio 0
    val got = TextAnalysis.compressionStats(docs)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1)._2 == 750L && got(2)._2 > 0L)           // n_bytes = utf-8 length
    assert(got(1)._4 < got(2)._4, s"repetitive ${got(1)._4} !< varied ${got(2)._4}")
    assert(got(1)._4 > 0.0 && got(2)._4 > 0.0)
    assert(got(3)._2 == 0L && got(3)._4 == 0.0)
    // deterministic across invocations (fixed deflate level)
    val again = TextAnalysis.compressionStats(docs)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(again == got)
  }

  test("sourceQualityRollup aggregates per provenance with exact-decimal means") {
    val docs = Seq(
      (1L, "the cat sat on the mat", "web", 22L),
      (2L, "the dog ran to the park", "web", 23L),
      (3L, "1234 5678 !!!! ####", "spam", 19L)).toDF("doc_id", "text", "source", "n_chars")
    val got = TextAnalysis.sourceQualityRollup(docs)
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3)) == Seq(("spam", 1L, 4L), ("web", 2L, 12L)))
    val bySrc = got.map(r => r._1 -> r).toMap
    assert(bySrc("web")._4 > bySrc("spam")._4)     // prose outranks digit noise
    assert(bySrc("web")._5 == 22.5)                // (22 + 23) / 2
    // deterministic across runs (decimal sum, not double summation order)
    val again = TextAnalysis.sourceQualityRollup(docs)
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(again == got)
  }

  test("vocabCoverage: top-k vocab by frequency, per-doc OOV occurrence rate") {
    val docs = Seq(
      (1L, "common common common rare"),
      (2L, "common common unseen other")).toDF("doc_id", "text")
    // vocabSize = 1 → vocab = {common} (highest frequency)
    val got = TextAnalysis.vocabCoverage(docs, vocabSize = 1)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 4L, 3L, 0.25), (2L, 4L, 2L, 0.5)))
    // frequency tie at the cutoff breaks by term asc — deterministic
    val tied = Seq((1L, "aaa bbb"), (2L, "bbb aaa")).toDF("doc_id", "text")
    val cut = TextAnalysis.vocabCoverage(tied, vocabSize = 1)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(cut == Seq((1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5))) // 'aaa' wins the tie
  }

  test("tokenEntropy: golden values, uniform doc maximal, repeated doc zero") {
    import graft.operators.Tfidf
    val docs = Seq(
      (1L, "aa bb cc dd"),   // uniform over 4 → H = ln 4, norm 1
      (2L, "aa aa aa aa"),   // single term → H = 0, norm 0 (n_distinct = 1)
      (3L, "aa aa bb")).toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropyFromCounts(
      Tfidf.termCounts(Tfidf.tokenizePortable(docs)))
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    def r9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val h3 = r9(math.log(3.0) - r9(2.0 * math.log(2.0)) / 3.0)
    assert(got == Seq(
      (1L, 4L, 4L, r9(math.log(4.0)), 1.0),
      (2L, 4L, 1L, 0.0, 0.0),
      (3L, 3L, 2L, h3, r9(h3 / math.log(2.0)))))
  }

  test("epochShuffle: total deterministic order, epoch changes the order") {
    val docs = (0L until 50L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val e0 = TextAnalysis.epochShuffle(docs, 0).select("doc_id").as[Long].collect().toSeq
    val e0again = TextAnalysis.epochShuffle(docs, 0).select("doc_id").as[Long].collect().toSeq
    val e1 = TextAnalysis.epochShuffle(docs, 1).select("doc_id").as[Long].collect().toSeq
    assert(e0 == e0again)                      // reproducible
    assert(e0.sorted == (0L until 50L).toSeq)  // a permutation, nothing lost
    assert(e0 != e1)                           // epochs reshuffle
  }

  test("perplexityContrastKn3: delta = in-domain minus general, backoff live on alien text") {
    def r9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val toks = Seq(
      (0L, Seq("a", "b", "a", "b", "a")),     // the in-domain training doc
      (1L, Seq("a", "b", "a")),               // reads in-domain
      (2L, Seq("x", "y", "x", "y", "x"))      // alien: every trigram unseen in-domain
    ).toDF("doc_id", "tokens")
    val inToks = toks.where(col("doc_id") === 0L)
    val triIn = TextAnalysis.trigramCountsFromTokens(inToks)
    val tcIn = Seq(("a", 0L, 3L), ("b", 0L, 2L)).toDF("term", "doc_id", "cnt")
    val triG = TextAnalysis.trigramCountsFromTokens(toks)
    val tcG = Seq(("a", 0L, 1L), ("b", 0L, 1L), ("x", 2L, 3L), ("y", 2L, 2L))
      .toDF("term", "doc_id", "cnt")
    val got = TextAnalysis.perplexityContrastKn3(toks, triIn, tcIn,
        TextAnalysis.kn3EnrichedModel(triG, tcG))
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    val inS = TextAnalysis.lmDocScoresKn3FromModel(toks, triIn, tcIn)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    val genS = TextAnalysis.lmDocScoresKn3FromModel(toks, triG, tcG)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(got.map(_._1) == Seq(0L, 1L, 2L))
    // the delta is EXACTLY the difference of the two scorers' outputs
    got.foreach { r =>
      assert(r._3 == inS(r._1) && r._4 == genS(r._1))
      assert(r._5 == r9(inS(r._1) - genS(r._1)))
    }
    // Moore–Lewis direction: the in-domain-looking doc outranks the alien
    val delta = got.map(r => r._1 -> r._5).toMap
    assert(delta(1L) > delta(2L))
    // the alien doc only scores in-domain through the backoff ladder
    // (all its w3 are unseen -> the uniform 1/V arm), and it is a real
    // finite score, far below the in-domain doc's
    assert(inS(2L) < inS(1L) && !inS(2L).isNaN && !inS(2L).isInfinite)
  }

  test("perplexityContrastKn3 == a literal single-node KN3-with-backoff recompute") {
    def r9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d = 0.75
    // literal model: every statistic a type count over the trigram list
    case class M(tri: Map[(String, String, String), Long],
        cx: Map[(String, String), (Long, Int)], ct2: Map[(String, String), Int],
        mid: Map[String, (Long, Int)], ct1: Map[String, Int], nCt: Int, v: Int)
    def model(docs: Seq[Seq[String]], vocab: Set[String]): M = {
      val tris = docs.filter(_.size >= 3)
        .flatMap(t => t.sliding(3).map(w => (w(0), w(1), w(2))))
      val tri = tris.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cx = tri.groupBy(k => (k._1._1, k._1._2)).view
        .mapValues(g => (g.values.sum, g.size)).toMap
      val ct2 = tri.keys.toSeq.map(k => (k._2, k._3)).groupBy(identity).view
        .mapValues(_.size).toMap
      val mid = ct2.groupBy(_._1._1).view
        .mapValues(g => (g.values.map(_.toLong).sum, g.size)).toMap
      val ct1 = ct2.keys.toSeq.groupBy(_._2).view.mapValues(_.size).toMap
      M(tri, cx, ct2, mid, ct1, ct2.size, vocab.size)
    }
    def score(m: M, toks: Seq[String]): Option[(Long, Double)] = {
      if (toks.size < 3) return None
      val lps = toks.sliding(3).toSeq.map { w =>
        val (w1, w2, w3) = (w(0), w(1), w(2))
        val p1 = m.ct1.get(w3) match {
          case Some(c) => c.toDouble / m.nCt
          case None    => 1.0 / m.v
        }
        val p2 = m.mid.get(w2) match {
          case Some((mc, nm)) => m.ct2.get((w2, w3)) match {
            case Some(c) => (c.toDouble - d) / mc + ((d * nm) / mc) * p1
            case None    => ((d * nm) / mc) * p1
          }
          case None => p1
        }
        val p3 = m.cx.get((w1, w2)) match {
          case Some((c12, nf)) => m.tri.get((w1, w2, w3)) match {
            case Some(c) => (c.toDouble - d) / c12 + ((d * nf) / c12) * p2
            case None    => ((d * nf) / c12) * p2
          }
          case None => p2
        }
        BigDecimal(r9(math.log(p3)))
      }
      Some((lps.size.toLong, r9((lps.sum / lps.size).toDouble)))
    }
    val rnd = new scala.util.Random(41)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val corpus = (0L until 25L).map { i =>
      (i, Seq.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))))
    }
    val toksDf = corpus.toDF("doc_id", "tokens")
    val inDocs = corpus.filter(_._1 % 3 == 0)
    def tcOf(ds: Seq[(Long, Seq[String])]) =
      ds.flatMap { case (id, ts) => ts.map(t => (t, id)) }
        .groupBy(identity).map { case ((t, id), g) => (t, id, g.size.toLong) }
        .toSeq.toDF("term", "doc_id", "cnt")
    val triIn = TextAnalysis.trigramCountsFromTokens(
      toksDf.where(col("doc_id") % 3 === 0))
    val got = TextAnalysis.perplexityContrastKn3(toksDf, triIn, tcOf(inDocs),
        TextAnalysis.kn3EnrichedModel(
          TextAnalysis.trigramCountsFromTokens(toksDf), tcOf(corpus)))
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    val mIn = model(inDocs.map(_._2), inDocs.flatMap(_._2).toSet)
    val mGen = model(corpus.map(_._2), corpus.flatMap(_._2).toSet)
    val expected = corpus.flatMap { case (id, ts) =>
      for (si <- score(mIn, ts); sg <- score(mGen, ts))
        yield (id, si._1, si._2, sg._2, r9(si._2 - sg._2))
    }
    assert(got == expected && got.nonEmpty)
    // the random split really exercises the backoff: at least one doc
    // contains a trigram the in-domain model never saw
    assert(corpus.exists { case (_, ts) => ts.size >= 3 &&
      ts.sliding(3).exists(w => !mIn.tri.contains((w(0), w(1), w(2)))) })
  }

  test("kn3 enriched-model serving == the five-join scorer on corpus-trained counts") {
    val toks = operators.Tfidf.tokenArrays(
      sources.Tables.documents(spark, "/root/testdata/sf0.001"))
    val tri = TextAnalysis.trigramCountsFromTokens(toks)
    val tc = operators.Tfidf.termCounts(
      operators.Tfidf.tokenizePortable(
        sources.Tables.documents(spark, "/root/testdata/sf0.001")))
    val enriched = TextAnalysis.kn3EnrichedModel(tri, tc)
    val served = TextAnalysis.lmDocScoresKn3Served(toks, enriched)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    val full = TextAnalysis.lmDocScoresKn3FromModel(toks, tri, tc)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(served == full && served.nonEmpty)
  }

  test("heldout two-ladder contrast == two single-model backoff scorers composed") {
    def r9(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(9, java.math.RoundingMode.HALF_UP)
        .doubleValue()
    val rnd = new scala.util.Random(47)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g")
    val corpus = (0L until 30L).map { i =>
      (i, Seq.fill(3 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))))
    }
    val toksDf = corpus.toDF("doc_id", "tokens")
    def tcOf(pred: Long => Boolean) = corpus.filter(c => pred(c._1))
      .flatMap { case (id, ts) => ts.map(t => (t, id)) }
      .groupBy(identity).map { case ((t, id), g) => (t, id, g.size.toLong) }
      .toSeq.toDF("term", "doc_id", "cnt")
    // in-domain AND general are both PROPER subsets, so BOTH ladders'
    // backoff arms fire on scored text (the snapshot-scored batch shape)
    val triIn = TextAnalysis.trigramCountsFromTokens(
      toksDf.where(col("doc_id") % 3 === 0))
    val triGen = TextAnalysis.trigramCountsFromTokens(
      toksDf.where(col("doc_id") % 5 =!= 4))
    val got = TextAnalysis.perplexityContrastKn3Heldout(toksDf,
        triIn, tcOf(_ % 3 == 0), triGen, tcOf(_ % 5 != 4))
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    val si = TextAnalysis.lmDocScoresKn3FromModel(toksDf, triIn, tcOf(_ % 3 == 0))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val sg = TextAnalysis.lmDocScoresKn3FromModel(toksDf, triGen, tcOf(_ % 5 != 4))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val expected = corpus.map(_._1).filter(si.contains).sorted.map { id =>
      (id, si(id)._2, si(id)._3, sg(id)._3, r9(si(id)._3 - sg(id)._3)) }
    assert(got == expected && got.nonEmpty)
    // both models genuinely miss some scored trigram
    def tris(pred: Long => Boolean) = corpus.filter(c => pred(c._1))
      .flatMap(_._2.sliding(3).filter(_.size == 3).map(w => (w(0), w(1), w(2))))
      .toSet
    val all = tris(_ => true)
    assert(all.exists(!tris(_ % 3 == 0).contains(_)))
    assert(all.exists(!tris(_ % 5 != 4).contains(_)))
  }

  test("mergeTrigramCounts / mergeBigramCounts == full recount on random splits") {
    val rnd = new scala.util.Random(53)
    val vocab = Vector("a", "b", "c", "d", "e")
    for (trial <- 1 to 3) {
      val corpus = (0L until 40L).map { i =>
        (i, Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))))
      }
      val toksDf = corpus.toDF("doc_id", "tokens")
      val old = toksDf.where(col("doc_id") % 4 =!= 3)
      val batch = toksDf.where(col("doc_id") % 4 === 3)
      val mt = TextAnalysis.mergeTrigramCounts(
          TextAnalysis.trigramCountsFromTokens(old), batch)
        .as[(String, String, String, Long)].collect().toSet
      val ft = TextAnalysis.trigramCountsFromTokens(toksDf)
        .as[(String, String, String, Long)].collect().toSet
      assert(mt == ft && ft.nonEmpty, s"trial $trial trigram")
      val mb = TextAnalysis.mergeBigramCounts(
          TextAnalysis.bigramCountsFromTokens(old), batch)
        .as[(String, String, Long)].collect().toSet
      val fb = TextAnalysis.bigramCountsFromTokens(toksDf)
        .as[(String, String, Long)].collect().toSet
      assert(mb == fb && fb.nonEmpty, s"trial $trial bigram")
      // an empty batch is a no-op merge
      val noop = TextAnalysis.mergeTrigramCounts(
          TextAnalysis.trigramCountsFromTokens(old), toksDf.limit(0))
        .as[(String, String, String, Long)].collect().toSet
      assert(noop == TextAnalysis.trigramCountsFromTokens(old)
        .as[(String, String, String, Long)].collect().toSet, s"trial $trial noop")
    }
  }

  test("enriched models rebuilt from MERGED counts == enrichment over the full recount") {
    val rnd = new scala.util.Random(97)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val corpus = (0L until 50L).map { i =>
      (i, Seq.fill(1 + rnd.nextInt(14))(vocab(rnd.nextInt(vocab.size))))
    }
    val toksDf = corpus.toDF("doc_id", "tokens")
    val old = toksDf.where(col("doc_id") % 5 =!= 4)
    val batch = toksDf.where(col("doc_id") % 5 === 4)
    // the vocab side (tc) is shared — full-corpus term counts both ways
    val tc = toksDf.select(col("doc_id"), explode(col("tokens")).as("term"))
      .groupBy("term", "doc_id").count().withColumnRenamed("count", "cnt")
    val k3merged = TextAnalysis.kn3EnrichedModel(
        TextAnalysis.mergeTrigramCounts(
          TextAnalysis.trigramCountsFromTokens(old), batch), tc)
      .collect().map(_.toSeq).toSet
    val k3full = TextAnalysis.kn3EnrichedModel(
        TextAnalysis.trigramCountsFromTokens(toksDf), tc)
      .collect().map(_.toSeq).toSet
    assert(k3merged == k3full && k3full.nonEmpty)
    val k2merged = TextAnalysis.kn2EnrichedModel(
        TextAnalysis.mergeBigramCounts(
          TextAnalysis.bigramCountsFromTokens(old), batch))
      .collect().map(_.toSeq).toSet
    val k2full = TextAnalysis.kn2EnrichedModel(
        TextAnalysis.bigramCountsFromTokens(toksDf))
      .collect().map(_.toSeq).toSet
    assert(k2merged == k2full && k2full.nonEmpty)
  }

  test("enriched DELTA merges == enrichment over the full recount (r15 gate diet)") {
    val rnd = new scala.util.Random(211)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    for (trial <- 1 to 3) {
      val corpus = (0L until 50L).map { i =>
        (i, Seq.fill(1 + rnd.nextInt(14))(vocab(rnd.nextInt(vocab.size))))
      }
      // the batch also carries a NEVER-STORED word so every delta branch
      // fires: new w1/w2/w3, new (w2,w3) pair, new vocab term
      val toksDf = corpus.toDF("doc_id", "tokens")
        .unionByName(Seq((999L, Seq("zz", "a", "zz", "b", "zz")))
          .toDF("doc_id", "tokens"))
      val old = toksDf.where(col("doc_id") % 5 =!= 4)
      val batch = toksDf.where(col("doc_id") % 5 === 4)
      def tcOf(t: org.apache.spark.sql.DataFrame) =
        t.select(col("doc_id"), explode(col("tokens")).as("term"))
          .groupBy("term", "doc_id").count().withColumnRenamed("count", "cnt")
      val k3delta = TextAnalysis.kn3EnrichedMerge(
          TextAnalysis.kn3EnrichedModel(
            TextAnalysis.trigramCountsFromTokens(old), tcOf(old)),
          batch, tcOf(old), tcOf(batch))
        .collect().map(r => r.getValuesMap[Any](r.schema.fieldNames)).toSet
      val k3full = TextAnalysis.kn3EnrichedModel(
          TextAnalysis.trigramCountsFromTokens(toksDf), tcOf(toksDf))
        .collect().map(r => r.getValuesMap[Any](r.schema.fieldNames)).toSet
      assert(k3delta == k3full && k3full.nonEmpty, s"trial $trial kn3")
      val k2delta = TextAnalysis.kn2EnrichedMerge(
          TextAnalysis.kn2EnrichedModel(
            TextAnalysis.bigramCountsFromTokens(old)), batch)
        .collect().map(r => r.getValuesMap[Any](r.schema.fieldNames)).toSet
      val k2full = TextAnalysis.kn2EnrichedModel(
          TextAnalysis.bigramCountsFromTokens(toksDf))
        .collect().map(r => r.getValuesMap[Any](r.schema.fieldNames)).toSet
      assert(k2delta == k2full && k2full.nonEmpty, s"trial $trial kn2")
    }
    // empty batch is a no-op (scalars included)
    val corpus = (0L until 20L).map(i => (i, Seq("a", "b", "c", "a", "b")))
    val toksDf = corpus.toDF("doc_id", "tokens")
    val tc = toksDf.select(col("doc_id"), explode(col("tokens")).as("term"))
      .groupBy("term", "doc_id").count().withColumnRenamed("count", "cnt")
    val base = TextAnalysis.kn3EnrichedModel(
      TextAnalysis.trigramCountsFromTokens(toksDf), tc)
    val noop = TextAnalysis.kn3EnrichedMerge(base, toksDf.limit(0), tc, tc.limit(0))
      .collect().map(r => r.getValuesMap[Any](r.schema.fieldNames)).toSet
    assert(noop == base.collect().map(r => r.getValuesMap[Any](r.schema.fieldNames)).toSet)
  }

  test("count merges chain: repeated appends == one full recount (associativity)") {
    // a real pipeline applies the merge once per ingest batch — the stored
    // table after N merges must equal the recount over everything
    val rnd = new scala.util.Random(131)
    val vocab = Vector("a", "b", "c", "d")
    val corpus = (0L until 60L).map { i =>
      (i, Seq.fill(1 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))))
    }
    val toksDf = corpus.toDF("doc_id", "tokens")
    val parts = (0 to 3).map(k => toksDf.where(col("doc_id") % 4 === k))
    val chained = parts.tail.foldLeft(
        TextAnalysis.trigramCountsFromTokens(parts.head)) { (stored, batch) =>
      TextAnalysis.mergeTrigramCounts(stored, batch)
    }.as[(String, String, String, Long)].collect().toSet
    val full = TextAnalysis.trigramCountsFromTokens(toksDf)
      .as[(String, String, String, Long)].collect().toSet
    assert(chained == full && full.nonEmpty)
    val chainedB = parts.tail.foldLeft(
        TextAnalysis.bigramCountsFromTokens(parts.head)) { (stored, batch) =>
      TextAnalysis.mergeBigramCounts(stored, batch)
    }.as[(String, String, Long)].collect().toSet
    val fullB = TextAnalysis.bigramCountsFromTokens(toksDf)
      .as[(String, String, Long)].collect().toSet
    assert(chainedB == fullB && fullB.nonEmpty)
  }

  test("kn3RefreshImpact counts new vs grown trigram types") {
    val stored = Seq(("a", "b", "c", 3L), ("b", "c", "d", 1L))
      .toDF("w1", "w2", "w3", "n_abc")
    val batch = Seq(("a", "b", "c", 2L), ("x", "y", "z", 1L),
      ("b", "c", "d", 5L), ("a", "a", "a", 1L))
      .toDF("w1", "w2", "w3", "n_abc")
    val got = TextAnalysis.kn3RefreshImpact(stored, batch)
      .as[(Long, Long)].head()
    assert(got == ((2L, 2L)))
    // an all-seen batch: zero new types — the one case a changed-keys
    // re-score would be exact
    val seen = TextAnalysis.kn3RefreshImpact(stored,
        stored.withColumn("n_abc", col("n_abc") + 1))
      .as[(Long, Long)].head()
    assert(seen == ((0L, 2L)))
  }

  test("kn2 enriched-model serving == the three-join scorer on corpus-trained counts") {
    val toks = operators.Tfidf.tokenArrays(
      sources.Tables.documents(spark, "/root/testdata/sf0.001"))
    val bi = TextAnalysis.bigramCountsFromTokens(toks)
    val enriched = TextAnalysis.kn2EnrichedModel(bi)
    val served = TextAnalysis.lmDocScoresKnServed(toks, enriched)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    val full = TextAnalysis.lmDocScoresKnFromModel(toks, bi)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(served == full && served.nonEmpty)
  }

  test("kn3ServedUnseenTransitions: empty under the corpus-trained contract, names violations") {
    val toks = operators.Tfidf.tokenArrays(
      sources.Tables.documents(spark, "/root/testdata/sf0.001"))
    val tc = operators.Tfidf.termCounts(
      operators.Tfidf.tokenizePortable(
        sources.Tables.documents(spark, "/root/testdata/sf0.001")))
    val enriched = TextAnalysis.kn3EnrichedModel(
      TextAnalysis.trigramCountsFromTokens(toks), tc)
    // corpus-trained: every scored transition is a model row
    assert(TextAnalysis.kn3ServedUnseenTransitions(toks, enriched).isEmpty)
    // a held-out document with a novel transition surfaces it — exactly
    // the rows the served inner join would silently drop
    val heldOut = Seq((999L, Seq("zzznovel", "zzzunseen", "zzzalien")))
      .toDF("doc_id", "tokens")
    val unseen = TextAnalysis.kn3ServedUnseenTransitions(heldOut, enriched)
    assert(unseen.count() == 1L)
    val servedRows = TextAnalysis.lmDocScoresKn3Served(heldOut, enriched).count()
    assert(servedRows == 0L, "served scorer silently drops the unseen transition")
  }
}
