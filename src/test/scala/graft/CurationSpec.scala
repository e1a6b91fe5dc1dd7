package graft

import org.apache.spark.sql.functions.col

import graft.operators.Curation

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("decontaminate counts benchmark 3-gram overlap per training doc") {
    val bench = docs(100L -> "alpha beta gamma delta")
    val train = docs(
      1L -> "alpha beta gamma something else entirely here",  // shares 'alpha beta gamma'
      2L -> "zeta eta theta iota kappa")                      // shares nothing
    val got = Curation.decontaminate(train, bench, flagRatio = 0.15)
      .as[(Long, Long, Long, Double, Int)].collect().toSeq
    // doc 1: grams = 5, one overlapping ('alpha beta gamma') → 0.2 ≥ 0.15
    assert(got.contains((1L, 1L, 5L, 0.2, 1)))
    assert(got.contains((2L, 0L, 3L, 0.0, 0)))
  }

  test("decontaminate overlap counts DISTINCT grams once") {
    val bench = docs(100L -> "a b c")
    val train = docs(1L -> "a b c x a b c")  // 'a b c' occurs twice, counts once
    val row = Curation.decontaminate(train, bench)
      .as[(Long, Long, Long, Double, Int)].collect().head
    assert(row._2 == 1L) // n_overlap
    assert(row._3 == 4L) // distinct grams: 'a b c','b c x','c x a','x a b' (dup collapsed)
  }

  test("decontaminateStripSpans removes exactly the leaked spans") {
    val bench = docs(100L -> "alpha beta gamma delta")
    val train = docs(
      1L -> "x y alpha beta gamma z w", // one leaked window covers tpos 3-5
      2L -> "p q r s",                  // clean, intact
      3L -> "alpha beta gamma delta",   // both windows leak -> fully stripped
      4L -> "ab")                       // shorter than n: no windows, intact
    val got = Curation.decontaminateStripSpans(train, bench, 3)
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, "x y z w"),
      (2L, 4L, "p q r s"),
      (3L, 0L, ""),
      (4L, 1L, "ab")))
    // benchmark docs never appear in the output
    assert(!got.exists(_._1 == 100L))
  }

  test("contaminationReport: doc-level flags vs token-level exposure per source") {
    val bench = docs(100L -> "alpha beta gamma delta")
    // s1 doc 1: 30 tokens, 28 distinct grams, exactly one leaked
    // ('alpha beta gamma'; no 'delta' so the second bench gram misses) ->
    // hit but 1/28 < 0.05 so NOT flagged; covered tokens = 3
    // letter-only fillers: digit-bearing words are dropped by the tokenizer
    val filler = ('a' to 'w').map(c => s"t$c").mkString(" ")
    val train = Seq(
      (1L, s"x y alpha beta gamma z w $filler", "s1"),
      (2L, "p q r s t", "s1"),
      (3L, "alpha beta gamma delta", "s2")) // 2/2 grams leak -> flagged
      .toDF("doc_id", "text", "source")
    val got = Curation.contaminationReport(train, bench, 3, 0.05)
      .as[(String, Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("s1", 2L, 1L, 0L, 35L, 3L, 0.085714286),
      ("s2", 1L, 1L, 1L, 4L, 4L, 1.0)))
  }

  test("decontaminateBloom equals the exact decontaminate (no false negatives)") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val train = docs.where(col("doc_id") % 7 =!= 0)
    val bench = docs.where(col("doc_id") % 7 === 0)
    val exact = Curation.decontaminate(train, bench).collect().toSeq
    val bloom = Curation.decontaminateBloom(train, bench).collect().toSeq
    assert(bloom == exact)
    // a deliberately undersized bitset raises fpp but must NOT change answers
    val tiny = Curation.decontaminateBloom(train, bench, expectedItems = 8L)
      .collect().toSeq
    assert(tiny == exact)
  }

  test("*FromWindows rejects an n that disagrees with the table's build n") {
    val d = docs((1L, "aa bb cc dd ee ff"), (2L, "aa bb cc dd ee ff"))
    val wins = Curation.windowRows(d, 5)
    val ex = intercept[IllegalArgumentException] {
      Curation.spanDupStatsFromWindows(d, wins, 3)
    }
    assert(ex.getMessage.contains("built at n=5"))
    // the tag survives the parquet round-trip the span-window asset does
    val dir = java.nio.file.Files.createTempDirectory("graft_wins_").toString
    wins.write.mode("overwrite").parquet(dir)
    val reread = spark.read.parquet(dir)
    intercept[IllegalArgumentException] {
      Curation.stripDuplicateSpansFromWindows(d, reread, 4)
    }
    // and the matching n passes through to identical output
    assert(Curation.spanDupStatsFromWindows(d, reread, 5).collect().toSeq ==
      Curation.spanDupStats(d, 5).collect().toSeq)
  }

  test("decontaminateMulti screens several eval sets in one pass") {
    val benchA = docs(100L -> "alpha beta gamma delta")
    val benchB = docs(200L -> "zeta eta theta iota")
    val train = docs(
      1L -> "alpha beta gamma one two three four",  // hits A only
      2L -> "zeta eta theta one two three four",    // hits B only
      3L -> "none of these words match anything")
    val got = Curation.decontaminateMulti(train, Map("a" -> benchA, "b" -> benchB))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.contains((1L, 5L, 1L, 0L)))
    assert(got.contains((2L, 5L, 0L, 1L)))
    assert(got.contains((3L, 4L, 0L, 0L))) // 6 tokens → 4 grams
  }

  test("repetitionStats flags stutter and repeated grams") {
    val got = Curation.repetitionStats(docs(
      1L -> "word word word word",          // one token repeated: adj pairs = 3
      2L -> "one two three four five"))     // no repetition
    .as[(Long, Long, Double, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val d1 = got(1L)
    assert(d1._2 == 4L && d1._3 == 1.0 && d1._4 == 3L)
    // grams_total=2, distinct=1 ('word word word') → rep frac 0.5
    assert(d1._5 == 0.5)
    val d2 = got(2L)
    assert(d2._3 == 0.2 && d2._4 == 0L && d2._5 == 0.0)
  }

  test("repetitionStats handles short docs (no grams, no pairs)") {
    val got = Curation.repetitionStats(docs(1L -> "solo"))
      .as[(Long, Long, Double, Long, Double)].collect().head
    assert(got == ((1L, 1L, 1.0, 0L, 0.0)))
  }

  test("boilerplateGrams ranks shared grams by document frequency") {
    val corpus = docs(
      1L -> "common header line unique one",
      2L -> "common header line unique two",
      3L -> "common header line unique three",
      4L -> "totally different content here")
    val got = Curation.boilerplateGrams(corpus, minDocs = 3, topK = 10)
      .as[(String, Long)].collect().toSeq
    assert(got.head == (("common header line", 3L)))
    // only grams in ≥3 docs survive
    assert(got.forall(_._2 >= 3L))
  }

  test("boilerplate top-k plans as TakeOrderedAndProject (no global sort)") {
    val corpus = docs(1L -> "a b c d", 2L -> "a b c e")
    val p = Curation.boilerplateGrams(corpus, minDocs = 1, topK = 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("duplicateSpans marks the cross-doc window, positions 1-based") {
    val corpus = docs(
      1L -> "a b c d e",   // windows: (1,'a b c') (2,'b c d') (3,'c d e')
      2L -> "x b c d y",   // windows: (1,'x b c') (2,'b c d') (3,'c d y')
      3L -> "p q r s t")   // shares nothing
    val got = Curation.duplicateSpans(corpus, n = 3)
      .as[(Long, Long, String, Long)].collect().toSet
    assert(got == Set((1L, 2L, "b c d", 2L), (2L, 2L, "b c d", 2L)))
  }

  test("duplicateSpans counts within-doc repetition too") {
    // 'm n o' ×3 → every window's gram recurs, all 7 windows are duplicated
    val corpus = docs(1L -> "m n o m n o m n o")
    val got = Curation.duplicateSpans(corpus, n = 3)
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(got.size == 7)
    assert(got.filter(_._3 == "m n o").map(_._2).sorted == Seq(1L, 4L, 7L))
    assert(got.forall(_._4 >= 2L))
  }

  test("spanDupStats: overlap-free coverage, zero rows for clean/short docs") {
    val corpus = docs(
      1L -> "a b c d e",
      2L -> "x b c d y",
      3L -> "p q r s t",
      4L -> "too short")  // < n tokens: 0 windows
    val got = Curation.spanDupStats(corpus, n = 3)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    // docs 1,2: one dup window at pos 2 covering tokens {2,3,4} → 3/5
    assert(got == Seq(
      (1L, 5L, 3L, 1L, 3L, 0.6),
      (2L, 5L, 3L, 1L, 3L, 0.6),
      (3L, 5L, 3L, 0L, 0L, 0.0),
      (4L, 2L, 0L, 0L, 0L, 0.0)))
  }

  test("duplicateSpansHashed marks identical positions to the exact form") {
    val corpus = docs(
      1L -> "a b c d e f g",
      2L -> "x b c d y z w",
      3L -> "a b c d e q r",  // doc 1 prefix repeated
      4L -> "m n o m n o m n o")
    val exact = Curation.duplicateSpans(corpus, n = 3)
      .select("doc_id", "pos").as[(Long, Long)].collect().toSet
    val hashed = Curation.duplicateSpansHashed(corpus, n = 3)
      .select("doc_id", "pos").as[(Long, Long)].collect().toSet
    assert(hashed == exact)
  }

  test("noveltyScores: repeat of an earlier doc's gram lowers novelty, hand-computed") {
    val corpus = docs(
      1L -> "a b c d e f",        // windows: 'a b c d e', 'b c d e f' — all first
      2L -> "a b c d e x y z w",  // 5 windows; only 'a b c d e' seen before
      3L -> "p q r s t")          // 1 window, novel
    val wins = Curation.windowRows(corpus, 5)
    val got = Curation.noveltyScoresFromWindows(wins)
      .select("doc_id", "n_windows", "n_seen_before", "novelty")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 0L, 1.0), (2L, 5L, 1L, 0.8), (3L, 1L, 0L, 1.0)))
  }

  test("spanHashAgreementGate: zero disagreement on a real corpus, vacuous throws") {
    val corpus = docs(
      1L -> "a b c d e f g",
      2L -> "x b c d y z w",
      3L -> "a b c d e q r")
    val wins = Curation.windowRows(corpus, 3)
    val row = Curation.spanHashAgreementGate(wins)
      .select("n_spans", "n_only_exact", "n_only_hashed")
      .as[(Long, Long, Long)].collect().head
    assert(row._1 > 0 && row._2 == 0L && row._3 == 0L)
    // a corpus with no duplicated windows must FAIL FAST, not report
    // vacuous agreement
    val unique = docs(1L -> "a b c", 2L -> "d e f")
    assertThrows[IllegalArgumentException](
      Curation.spanHashAgreementGate(Curation.windowRows(unique, 3)).collect())
  }

  test("stripDuplicateSpans keeps the corpus-first occurrence, cuts the rest") {
    val corpus = docs(
      1L -> "a b c d e",
      2L -> "x b c d y",   // 'b c d' canon is doc 1 → doc 2's copy removed
      3L -> "p q r s t")
    val got = Curation.stripDuplicateSpans(corpus, n = 3)
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 5L, "a b c d e"),
      (2L, 2L, "x y"),
      (3L, 5L, "p q r s t")))
  }

  test("stripDuplicateSpans: clone doc fully stripped, self-repetition cut") {
    val corpus = docs(
      1L -> "a b c d e",
      2L -> "a b c d e",        // exact clone → stripped to nothing
      3L -> "m n o m n o")      // self-repeat: second 'm n o' removed
    val got = Curation.stripDuplicateSpans(corpus, n = 3)
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 5L, "a b c d e"),
      (2L, 0L, ""),
      (3L, 3L, "m n o")))
  }

  test("stripDuplicateSpansHashed rebuilds identical documents to the exact form") {
    val corpus = docs(
      1L -> "a b c d e",
      2L -> "x b c d y",
      3L -> "a b c d e",        // clone of doc 1
      4L -> "m n o m n o m n")  // self-repetition
    val exact = Curation.stripDuplicateSpans(corpus, n = 3)
      .as[(Long, Long, String)].collect().toSeq
    val hashed = Curation.stripDuplicateSpansHashed(corpus, n = 3)
      .as[(Long, Long, String)].collect().toSeq
    assert(hashed == exact)
  }

  test("spanDupStats does not double-count overlapping dup windows") {
    // doc 1 = doc 2 → every window dup; coverage = all tokens, frac 1.0
    val corpus = docs(1L -> "a b c d e", 2L -> "a b c d e")
    val got = Curation.spanDupStats(corpus, n = 3)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 5L, 3L, 3L, 5L, 1.0), (2L, 5L, 3L, 3L, 5L, 1.0)))
  }

  test("dsirWeights: hand-computed log-ratio on a one-bucket corpus") {
    // ONE term → all mass in one hashed bucket, so the whole formula is
    // hand-checkable: tgt_b=2, raw_b=3, totals (2,3), B=4 buckets →
    // λ = ln((2+1)/(2+4) / ((3+1)/(3+4))) = ln(0.875) = -0.133531393 (r9).
    // Raw doc 1 has n=3 → w_sum = round(3·λ, 9) = -0.400594179,
    // per_token = w_sum/3 as an UNROUNDED IEEE division (the scale-9
    // decimal ratio can tie exactly at the 9th digit, where engines'
    // rounding rules split — so the operator doesn't round it).
    val tc = Seq(("w", 0L, 2L), ("w", 1L, 3L)).toDF("term", "doc_id", "cnt")
    val got = Curation.dsirWeights(tc, col("doc_id") === 0L, buckets = 4)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq((1L, 3L, -0.400594179, -0.400594179 / 3.0)))
  }

  test("dsirWeights: empty target split degrades to smoothing-only ratios") {
    // No target docs: tgt_b=0 / tgt_tot=0 everywhere, so λ is finite (the
    // +1 Laplace numerator) and identical across buckets of equal raw
    // mass: λ = ln((1/B) / ((raw_b+1)/(raw_tot+B))). With one term, B=4,
    // raw (2,3): λ = ln(0.25 / (6/9)) = ln(0.375) = -0.980829253 (r9).
    val tc = Seq(("w", 0L, 2L), ("w", 1L, 3L)).toDF("term", "doc_id", "cnt")
    val got = Curation.dsirWeights(tc, col("doc_id") < 0L, buckets = 4)
      .as[(Long, Long, Double, Double)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      (0L, 2L, -1.961658506, -1.961658506 / 2.0),
      (1L, 3L, -2.942487759, -2.942487759 / 3.0)))
  }

  test("dsirWeights: non-default bucket count changes hashing, not totals") {
    // Same corpus scored at two bucket widths: per-doc token totals are a
    // bucket-invariant (they sum the same counts), and every raw doc gets
    // exactly one row — target docs never appear in the output.
    val tc = Seq(("alpha", 0L, 2L), ("beta", 1L, 3L), ("gamma", 2L, 5L),
      ("alpha", 2L, 1L)).toDF("term", "doc_id", "cnt")
    for (b <- Seq(16, 4096)) {
      val rows = Curation.dsirWeights(tc, col("doc_id") === 0L, buckets = b)
        .as[(Long, Long, Double, Double)].collect().toSeq.sortBy(_._1)
      assert(rows.map(r => (r._1, r._2)) == Seq((1L, 3L), (2L, 6L)),
        s"buckets=$b")
      rows.foreach(r => assert(!r._3.isNaN && !r._4.isNaN))
    }
  }

  test("conservativeSoftWeights: cross-doc repeats survive down-weighted, not stripped") {
    val corpus = Seq(
      // within-doc repeat "x y" -> stage 1 strips doc 1's OWN second copy
      (1L, "s", "x y x y q1 r1"),
      // legitimate cross-doc share: doc 2 holds the SAME "x y" once ->
      // kept in the text, priced in the weight
      (2L, "s", "x y s2 t2"),
      // fully novel doc -> full weight
      (3L, "s", "u3 v3 w3 z3")).toDF("doc_id", "source", "text")
    val got = Curation.conservativeSoftWeights(corpus, paraTokens = 2)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1: one within-drop; after cleaning its "x y" is the corpus-first
    // occurrence -> full novelty, weight 1
    assert(got(1L) == ((1L, 1L, 1L, 2L, 0L, 1.0)))
    // doc 2: NOTHING stripped (cross-doc sharing is not its own repeat),
    // but its shared block's content first occurs in doc 1 -> half its
    // cleaned paragraphs are corpus-repeats, weight 0.5
    assert(got(2L) == ((2L, 0L, 1L, 2L, 1L, 0.5)))
    assert(got(3L) == ((3L, 0L, 1L, 2L, 0L, 1.0)))
    // ...and the composition is genuinely a DIFFERENT policy than the
    // corpus-wide strip, which would remove doc 2's shared block outright
    val corpusStrip = operators.Paragraphs.paragraphDedupStrip(corpus, paraTokens = 2)
      .where(col("doc_id") === 2L).select("n_dropped", "text_clean")
      .as[(Long, String)].collect().head
    assert(corpusStrip == ((1L, "s2 t2")))
  }
}
