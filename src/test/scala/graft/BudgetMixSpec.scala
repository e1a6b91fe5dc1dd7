package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation

/** Token-budget selection (exact vs bucketed parity across widths,
  * budgets, and tie shapes) and temperature-based source mixing
  * (hand-computed rates, tail up-weighting, the md5-coin sample against
  * an independent JVM md5 spelling). */
class BudgetMixSpec extends SparkSpec {
  import spark.implicits._

  private def round9(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(9, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  /** Deterministic scored frame with deliberate score ties (4-digit
    * scores force same-bucket and same-score collisions). */
  private def scoredFrame(n: Int) = {
    val rnd = new scala.util.Random(42)
    (1 to n).map { i =>
      val s = math.floor(rnd.nextDouble() * 10000.0) / 10000.0
      (i.toLong, s, 1L + rnd.nextInt(50))
    }.toDF("doc_id", "score", "n_tokens")
  }

  test("tokenBudgetSelect keeps the maximal greedy prefix by (score desc, doc_id)") {
    val scored = Seq(
      (1L, 0.9, 10L), (2L, 0.8, 10L), (3L, 0.8, 5L), (4L, 0.7, 100L), (5L, 0.6, 1L)
    ).toDF("doc_id", "score", "n_tokens")
    // order: 1(10) 2(20) 3(25) 4(125) 5(126); budget 25 -> {1,2,3};
    // doc 4 crosses and greedy STOPS (doc 5 would fit but is after the cross)
    val kept = Curation.tokenBudgetSelect(scored, 25L)
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(1L, 2L, 3L))
    assert(Curation.tokenBudgetSelect(scored, 9L).count() == 0L)
    assert(Curation.tokenBudgetSelect(scored, 1000L).count() == 5L)
  }

  test("bucketed selection equals the exact spelling across widths and budgets") {
    val scored = scoredFrame(200).cache()
    val total = scored.agg(sum("n_tokens")).as[Long].head()
    try {
      for (width <- Seq(0.001, 0.01, 0.3, 1000.0);
           budget <- Seq(0L, 1L, 37L, total / 3, total - 1, total, total + 10))
        graft.operators.CacheScope {
          val exact = Curation.tokenBudgetSelect(scored, budget)
            .select("doc_id").as[Long].collect().toSet
          val bucketed = Curation.tokenBudgetSelectBucketed(scored, budget, width)
            .select("doc_id").as[Long].collect().toSet
          assert(bucketed == exact, s"width=$width budget=$budget: " +
            s"bucketed ${bucketed.size} vs exact ${exact.size}")
        }
    } finally scored.unpersist()
  }

  test("bucketed selection refuses NULL scores and NULL token counts by name") {
    val nullScore = Seq((1L, Some(0.9), Some(10L)), (2L, None, Some(5L)))
      .toDF("doc_id", "score", "n_tokens")
    val e1 = intercept[IllegalArgumentException] {
      graft.operators.CacheScope {
        Curation.tokenBudgetSelectBucketed(nullScore, 100L).collect()
      }
    }
    assert(e1.getMessage.contains("NULL-score"), e1.getMessage)
    val nullToks = Seq((1L, Some(0.9), Some(10L)), (2L, Some(0.8), None))
      .toDF("doc_id", "score", "n_tokens")
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.CacheScope {
        Curation.tokenBudgetSelectBucketed(nullToks, 100L).collect()
      }
    }
    assert(e2.getMessage.contains("NULL n_tokens"), e2.getMessage)
  }

  test("bucketed selection refuses NaN scores by name (exact/bucketed contract)") {
    // NaN would bucket silently while the exact spelling's ORDER BY
    // score DESC ranks NaN above every real score — the 'identical doc
    // set' contract between the two spellings would break
    val nanScore = Seq((1L, 0.9, 10L), (2L, Double.NaN, 5L))
      .toDF("doc_id", "score", "n_tokens")
    val e = intercept[IllegalArgumentException] {
      graft.operators.CacheScope {
        Curation.tokenBudgetSelectBucketed(nanScore, 100L).collect()
      }
    }
    assert(e.getMessage.contains("NaN-score"), e.getMessage)
    // a NULL+NaN mix still names NaN (the more surprising defect) first
    val both = Seq((1L, Some(0.9), 10L), (2L, Some(Double.NaN), 5L),
      (3L, None, 5L)).toDF("doc_id", "score", "n_tokens")
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.CacheScope {
        Curation.tokenBudgetSelectBucketed(both, 100L).collect()
      }
    }
    assert(e2.getMessage.contains("NaN-score"), e2.getMessage)
  }

  private def mixDocs = {
    // token counts by construction: src_a 400 tokens over 4 docs,
    // src_b 80 over 2, src_c 20 over 1 (total 500)
    val rows =
      (1 to 4).map(i => (i.toLong, Seq.fill(100)("w").mkString(" "), "src_a")) ++
      (5 to 6).map(i => (i.toLong, Seq.fill(40)("w").mkString(" "), "src_b")) :+
      ((7L, Seq.fill(20)("w").mkString(" "), "src_c"))
    rows.toDF("doc_id", "text", "source")
  }

  test("temperatureMixRates: alpha=0.5 up-weights the tail, rates cap at 1") {
    val got = Curation.temperatureMixRates(mixDocs, 0.5, targetTokens = 250L)
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val shares = Map("src_a" -> 0.8, "src_b" -> 0.16, "src_c" -> 0.04)
    val praw = shares.map { case (s, v) => s -> round9(math.sqrt(round9(v))) }
    val psum = praw.values.map(round9).sum
    for (s <- shares.keys) {
      val (_, nt, share, p, rate) = got(s)
      assert(share == round9(shares(s)))
      val pExp = round9(praw(s) / psum)
      assert(p == pExp, s"$s p=$p expected $pExp")
      assert(rate == round9(math.min(1.0, pExp * 250.0 / nt)))
    }
    // temperature flattening: tail source's tempered p exceeds its share,
    // head source's sits below
    assert(got("src_c")._4 > shares("src_c") && got("src_a")._4 < shares("src_a"))
    // a tiny source with a big target caps at rate 1
    val capped = Curation.temperatureMixRates(mixDocs, 0.5, targetTokens = 100000L)
      .where(col("source") === "src_c").select("rate").as[Double].head()
    assert(capped == 1.0)
  }

  test("temperatureMixRates: alpha=1 reduces to proportional shares") {
    val got = Curation.temperatureMixRates(mixDocs, 1.0, targetTokens = 250L)
      .select("source", "share", "p").as[(String, Double, Double)].collect()
    got.foreach { case (s, share, p) =>
      assert(math.abs(p - share) < 1e-6, s"$s: p=$p share=$share") }
  }

  test("temperatureMixSample keeps exactly the docs whose md5 coin lands under the rate") {
    val rates = Curation.temperatureMixRates(mixDocs, 0.5, targetTokens = 250L)
      .select("source", "rate").as[(String, Double)].collect().toMap
    // independent JVM md5 spelling of the house coin
    def coin(id: Long): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
    }
    val srcOf = mixDocs.select("doc_id", "source")
      .as[(Long, String)].collect().toMap
    val expected = srcOf.keySet.filter(id => coin(id) < rates(srcOf(id)))
    val got = Curation.temperatureMixSample(mixDocs, 0.5, targetTokens = 250L)
      .select("doc_id").as[Long].collect().toSet
    assert(got == expected && got.nonEmpty && got.size < srcOf.size)
  }

  test("tokenQuotaMixComposed: budgets = plan p × target, greedy prefix per source") {
    val got = Curation.tokenQuotaMixComposed(mixDocs, 0.5, targetTokens = 250L)
      .as[(Long, String, Long, Long, Double, Long)].collect().toSeq
    val p = Curation.temperatureMixRates(mixDocs, 0.5, targetTokens = 250L)
      .select("source", "p").as[(String, Double)].collect().toMap
    // hand-replay: per source in doc_id order, running totals accumulate
    // every arrival, admitted while the total stays under p × target
    val docs = Seq((1L, "src_a", 100L), (2L, "src_a", 100L), (3L, "src_a", 100L),
      (4L, "src_a", 100L), (5L, "src_b", 40L), (6L, "src_b", 40L),
      (7L, "src_c", 20L))
    var run = Map.empty[String, Long].withDefaultValue(0L)
    val expect = docs.map { case (id, src, nt) =>
      val r = run(src) + nt; run += src -> r
      val budget = p(src) * 250.0
      (id, src, nt, r, budget, if (r.toDouble <= budget) 1L else 0L)
    }
    assert(got == expect)
    // the composition genuinely decides: admits AND refusals occur, and
    // the tail source's whole (tiny) mass is admitted while the head
    // source is cut — the temperature flattening visible at ingest
    assert(got.exists(_._6 == 1L) && got.exists(_._6 == 0L))
    assert(got.filter(_._2 == "src_c").forall(_._6 == 1L))
    assert(got.count(r => r._2 == "src_a" && r._6 == 0L) >= 2)
  }

  test("normalizedScoreSourceSample: survive iff coin < rate × min-max weight") {
    // arbitrary-range scores (log-prob-delta-shaped, incl. negatives);
    // many docs per source so both admits and refusals occur
    val rnd = new scala.util.Random(7)
    val docs = (1 to 120).map { i =>
      (i.toLong, "t", if (i % 3 == 0) "src_a" else if (i % 3 == 1) "src_b"
        else "absent_src")
    }.toDF("doc_id", "text", "source")
    val scores = (1 to 110).map { i => // docs 111–120 unscored -> drop
      (i.toLong, round9(-8.0 + 6.0 * rnd.nextDouble()))
    }
    val scored = scores.toDF("doc_id", "score")
    val rates = Map("src_a" -> 0.9, "src_b" -> 0.5)
    def coin(id: Long): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
    }
    val dmin = scores.map(_._2).min
    val dmax = scores.map(_._2).max
    val expected = scores.flatMap { case (id, s) =>
      val src = if (id % 3 == 0) "src_a" else if (id % 3 == 1) "src_b"
        else "absent_src"
      val wgt = (s - dmin) / (dmax - dmin)
      if (coin(id) < rates.getOrElse(src, 0.0) * wgt) Some(id) else None
    }.toSet
    val got = Curation.normalizedScoreSourceSample(docs, scored, rates)
      .select("doc_id").as[Long].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty && got.size < 110)
    // absent source keeps nothing; unscored docs drop with the join
    val srcs = Curation.normalizedScoreSourceSample(docs, scored, rates)
      .select("source").as[String].collect().toSet
    assert(!srcs.contains("absent_src"))
    assert(!got.exists(_ > 110L))
    // weights land on [0, 1] with both endpoints hit
    val ws = Curation.normalizedScoreSourceSample(
      docs.where($"source" =!= "absent_src"), scored,
      Map("src_a" -> 1.0, "src_b" -> 1.0))
      .select("wgt").as[Double].collect()
    assert(ws.forall(w => w >= 0.0 && w <= 1.0))
  }

  test("normalizedScoreSourceSample: equal scores degrade to the flat sampler") {
    val docs = (1 to 60).map(i => (i.toLong, "t", "src_a"))
      .toDF("doc_id", "text", "source")
    val scored = (1 to 60).map(i => (i.toLong, -3.25)).toDF("doc_id", "score")
    def coin(id: Long): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
    }
    val got = Curation.normalizedScoreSourceSample(docs, scored,
      Map("src_a" -> 0.6))
    // max == min -> wgt 1.0 everywhere -> the flat 0.6 per-source rate
    assert(got.select("wgt").as[Double].collect().forall(_ == 1.0))
    val expected = (1L to 60L).filter(coin(_) < 0.6).toSet
    assert(got.select("doc_id").as[Long].collect().toSet == expected)
  }
}
