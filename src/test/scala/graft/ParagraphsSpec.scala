package graft

import org.apache.spark.sql.functions._

import graft.operators.Paragraphs

/** Paragraph-level (CCNet-style) dedup: hand-computed strip goldens,
  * first-occurrence keeper determinism, per-source stats, the boilerplate
  * top-k, and idempotence of the strip on its own (non-empty) output. */
class ParagraphsSpec extends SparkSpec {
  import spark.implicits._

  test("paragraphDedupIncremental: stored keepers never move, only the batch strips") {
    val old = Seq(
      (1L, "s", "aa bb cc dd"),      // keepers: "aa bb", "cc dd"
      (2L, "s", "ee ff")).toDF("doc_id", "source", "text")
    val batch = Seq(
      (9L, "s", "aa bb zz ww"),      // "aa bb" stored -> drops; "zz ww" novel
      (19L, "s", "zz ww qq rr")      // "zz ww" batch-first at doc 9 -> drops
    ).toDF("doc_id", "source", "text")
    val stored = Paragraphs.paragraphKeepers(old, paraTokens = 2)
    val (merged, stripped) =
      Paragraphs.paragraphDedupIncremental(stored, batch, paraTokens = 2)
    val got = stripped.select("doc_id", "n_dropped", "text_clean")
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(9L -> ((1L, "zz ww")), 19L -> ((1L, "qq rr"))))
    // merged store = old keepers + the batch's first novel occurrences
    val mergedSet = merged.select("doc_id", "para_idx")
      .as[(Long, Long)].collect().toSet
    assert(mergedSet == Set((1L, 0L), (1L, 1L), (2L, 0L), (9L, 1L), (19L, 1L)))
    // ids increasing => incremental == the full-corpus rebuild restricted
    // to the batch (arrival order == corpus order)
    val full = Paragraphs.paragraphDedupStrip(old.unionByName(batch), paraTokens = 2)
      .where($"doc_id" >= 9L).select("doc_id", "n_dropped", "text_clean")
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(full == got)
    // a second empty-batch merge is a no-op (store immutability)
    val (merged2, stripped2) = Paragraphs.paragraphDedupIncremental(
      merged, batch.limit(0), paraTokens = 2)
    assert(stripped2.count() == 0L)
    assert(merged2.select("doc_id", "para_idx").as[(Long, Long)]
      .collect().toSet == mergedSet)
  }

  test("paragraphDedupIncremental == full rebuild on random increasing-id corpora") {
    val rnd = new scala.util.Random(23)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    for (trial <- 1 to 3) {
      val texts = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
      (0L until 30L).foreach { i =>
        val t =
          if (i % 4 == 3 && texts.nonEmpty) texts(rnd.nextInt(texts.size))._2
          else Seq.fill(1 + rnd.nextInt(7))(vocab(rnd.nextInt(vocab.size)))
            .mkString(" ")
        texts += ((i, t))
      }
      val all = texts.toSeq.map { case (i, t) => (i, "s", t) }
        .toDF("doc_id", "source", "text")
      val old = all.where($"doc_id" < 20L)
      val batch = all.where($"doc_id" >= 20L)
      val (merged, stripped) = Paragraphs.paragraphDedupIncremental(
        Paragraphs.paragraphKeepers(old, paraTokens = 3), batch, paraTokens = 3)
      // ids increase old -> new, so arrival order == corpus order and the
      // incremental strip must equal the full rebuild on the batch slice
      val expect = Paragraphs.paragraphDedupStrip(all, paraTokens = 3)
        .where($"doc_id" >= 20L)
        .select("doc_id", "n_paras", "n_dropped", "text_clean")
        .as[(Long, Long, Long, String)].collect().toSet
      val got = stripped.select("doc_id", "n_paras", "n_dropped", "text_clean")
        .as[(Long, Long, Long, String)].collect().toSet
      assert(got == expect, s"trial $trial")
      // the merged store equals a from-scratch keeper build over the union
      val rebuilt = Paragraphs.paragraphKeepers(all, paraTokens = 3)
        .as[(String, Long, Long)].collect().toSet
      assert(merged.as[(String, Long, Long)].collect().toSet == rebuilt,
        s"trial $trial store")
    }
  }

  test("paragraphDedupIncrementalByDelimiter == full delimiter rebuild on increasing ids") {
    val rnd = new scala.util.Random(29)
    val paras = Vector("aa bb", "cc", "dd ee ff", "gg hh")
    val texts = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    (0L until 24L).foreach { i =>
      val t =
        if (i % 4 == 3 && texts.nonEmpty) texts(rnd.nextInt(texts.size))._2
        else Seq.fill(1 + rnd.nextInt(3))(paras(rnd.nextInt(paras.size)))
          .mkString("\n\n")
      texts += ((i, t))
    }
    val all = texts.toSeq.map { case (i, t) => (i, "s", t) }
      .toDF("doc_id", "source", "text")
    val old = all.where($"doc_id" < 16L)
    val batch = all.where($"doc_id" >= 16L)
    val (merged, stripped) = Paragraphs.paragraphDedupIncrementalByDelimiter(
      Paragraphs.paragraphKeepersByDelimiter(old, "\\n{2,}"), batch, "\\n{2,}")
    val expect = Paragraphs.paragraphDedupStripByDelimiter(all, "\\n{2,}")
      .where($"doc_id" >= 16L)
      .select("doc_id", "n_paras", "n_dropped", "text_clean")
      .as[(Long, Long, Long, String)].collect().toSet
    val got = stripped.select("doc_id", "n_paras", "n_dropped", "text_clean")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got == expect && got.nonEmpty)
    // the merged store equals a from-scratch delimiter keeper build
    val rebuilt = Paragraphs.paragraphKeepersByDelimiter(all, "\\n{2,}")
      .as[(String, Long, Long)].collect().toSet
    assert(merged.as[(String, Long, Long)].collect().toSet == rebuilt)
  }

  // P=4 fixture: doc 3 is an exact twin of doc 1; doc 4's SECOND block
  // repeats doc 1's first; doc 2 contains the same tokens a b c d but
  // MISALIGNED (different blocks -> no dup); doc 6 repeats one block
  // internally three times
  private def corpus = Seq(
    (1L, "a b c d e f g h", "s0"),
    (2L, "x y a b c d z", "s0"),
    (3L, "a b c d e f g h", "s1"),
    (4L, "q r s t a b c d", "s1"),
    (5L, "a b c d", "s1"),
    (6L, "m m m m m m m m m m m m", "s2")
  ).toDF("doc_id", "text", "source")

  test("paragraphDedupStrip: first occurrence keeps, later occurrences strip") {
    val got = Paragraphs.paragraphDedupStrip(corpus, paraTokens = 4)
      .select("doc_id", "n_paras", "n_dropped", "text_clean")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 2L, 0L, "a b c d e f g h"),  // keeper of both its blocks
      (2L, 2L, 0L, "x y a b c d z"),    // misaligned content is NOT a dup
      (3L, 2L, 2L, ""),                 // exact twin: fully stripped, row kept
      (4L, 2L, 1L, "q r s t"),          // lost only its repeated block
      (5L, 1L, 1L, ""),                 // its single block is doc 1's first
      (6L, 3L, 2L, "m m m m")))         // within-doc repetition collapses
  }

  test("untouched documents pass through verbatim (not re-joined)") {
    val weird = Seq((7L, "only unique tokens here", "s0")).toDF("doc_id", "text", "source")
    val got = Paragraphs.paragraphDedupStrip(corpus.union(weird), paraTokens = 4)
      .where(col("doc_id") === 7L).select("text_clean").as[String].head()
    assert(got == "only unique tokens here")
  }

  test("paragraphDupStats: per-source occurrence and dup counts") {
    val got = Paragraphs.paragraphDupStats(corpus, paraTokens = 4)
      .as[(String, Long, Long, Double)].collect().toSeq
    // s0: doc1 (2 paras, keepers) + doc2 (2 paras, unique) -> 0 dups
    // s1: doc3 (2 dup) + doc4 (1 of 2 dup) + doc5 (1 dup) -> 4 of 5
    // s2: doc6 -> 2 of 3 dup
    assert(got == Seq(
      ("s0", 4L, 0L, 0.0),
      ("s1", 5L, 4L, 0.8),
      ("s2", 3L, 2L, round9(2.0 / 3.0))))
  }

  test("boilerplateParagraphs: most-repeated contents first, deterministic ties") {
    val got = Paragraphs.boilerplateParagraphs(corpus, paraTokens = 4, k = 10)
      .select("n_occurrences", "first_doc", "first_para_idx")
      .as[(Long, Long, Long)].collect().toSeq
    // "a b c d": doc1#0, doc3#0, doc4#1, doc5#0 -> 4 occurrences;
    // "m m m m": 3; "e f g h": doc1#1, doc3#1 -> 2
    assert(got == Seq((4L, 1L, 0L), (3L, 6L, 0L), (2L, 1L, 1L)))
  }

  test("strip is idempotent on its non-empty output") {
    val once = Paragraphs.paragraphDedupStrip(corpus, paraTokens = 4)
      .where(col("text_clean") =!= "")
      .select(col("doc_id"), col("text_clean").as("text"), col("source"))
    val twice = Paragraphs.paragraphDedupStrip(once, paraTokens = 4)
    assert(twice.where(col("n_dropped") > 0L).count() == 0L)
    val again = twice.select("doc_id", "text_clean")
      .as[(Long, String)].collect().toMap
    val before = once.select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(again == before)
  }

  test("ragged last paragraph dedups only against equal-content blocks") {
    // doc 11's 2-token tail equals doc 10's FULL text (one 2-token para):
    // content-equal -> the later occurrence strips
    val docs = Seq(
      (10L, "tail end", "s0"),
      (11L, "u v w x tail end", "s0")
    ).toDF("doc_id", "text", "source")
    val got = Paragraphs.paragraphDedupStrip(docs, paraTokens = 4)
      .select("doc_id", "n_dropped", "text_clean")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((10L, 0L, "tail end"), (11L, 1L, "u v w x")))
  }

  // ---------------------------------------------------------------
  // delimiter-cut family: REAL paragraph boundaries (blank lines)
  // ---------------------------------------------------------------

  // multi-line corpus: "dup para" repeats across docs 11/13 and twice
  // inside 14 (once behind a TRIPLE newline — `\n{2,}` must still cut)
  private def mlCorpus = Seq(
    (11L, "intro one\n\ndup para\n\nclose one", "s0"),
    (12L, "fresh text only", "s0"),
    (13L, "dup para\n\nnovel tail", "s1"),
    (14L, "dup para\n\n\ndup para\n\nend bit", "s1"),
    (15L, "dup para", "s2")
  ).toDF("doc_id", "text", "source")

  test("paragraphsByDelimiter cuts on the regex and filters empty paragraphs") {
    val rows = Paragraphs.paragraphsByDelimiter(
        Seq((1L, "\n\nhead\n\n\ntail\n\n", "s0")).toDF("doc_id", "text", "source"),
        "\\n{2,}")
      .select("doc_id", "para_idx", "n_paras")
      .as[(Long, Long, Long)].collect().sortBy(_._2).toSeq
    // leading/trailing/adjacent delimiters yield no empty paragraphs
    assert(rows == Seq((1L, 0L, 2L), (1L, 1L, 2L)))
  }

  test("delimiter strip: corpus-first keeper, canonical joiner on touched docs only") {
    val got = Paragraphs.paragraphDedupStripByDelimiter(mlCorpus, "\\n{2,}")
      .select("doc_id", "n_paras", "n_dropped", "text_clean")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (11L, 3L, 0L, "intro one\n\ndup para\n\nclose one"), // keeper, VERBATIM
      (12L, 1L, 0L, "fresh text only"),
      (13L, 2L, 1L, "novel tail"),
      (14L, 3L, 2L, "end bit"), // both repeats drop, incl. the \n\n\n one
      (15L, 1L, 1L, "")))       // fully-duplicated doc survives as a row
  }

  test("delimiter strip is idempotent on its non-empty output") {
    val once = Paragraphs.paragraphDedupStripByDelimiter(mlCorpus, "\\n{2,}")
      .where(col("text_clean") =!= "")
      .select(col("doc_id"), col("text_clean").as("text"), col("source"))
    val twice = Paragraphs.paragraphDedupStripByDelimiter(once, "\\n{2,}")
    assert(twice.where(col("n_dropped") > 0L).count() == 0L)
  }

  test("delimiter dup stats per source") {
    val got = Paragraphs.paragraphDupStatsByDelimiter(mlCorpus, "\\n{2,}")
      .as[(String, Long, Long, Double)].collect().toSeq
    // s0: 3 + 1 paras, all keepers/unique; s1: 2 + 3 paras, 3 dups;
    // s2: 1 para, dup
    assert(got == Seq(
      ("s0", 4L, 0L, 0.0),
      ("s1", 5L, 3L, 0.6),
      ("s2", 1L, 1L, 1.0)))
  }

  test("fixed-width paragraph decontamination strips benchmark-leaked blocks") {
    val corpus = Seq(
      (1L, "a b c d e f g h", "s0"),  // block 0 leaks
      (2L, "x y z w", "s0"),          // clean
      (3L, "a b c d", "s1")           // fully leaked
    ).toDF("doc_id", "text", "source")
    val bench = Seq((100L, "a b c d", "eval")).toDF("doc_id", "text", "source")
    val got = Paragraphs.paragraphDecontaminate(corpus, bench, paraTokens = 4)
      .select("doc_id", "n_paras", "n_dropped", "text_clean")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 2L, 1L, "e f g h"),
      (2L, 1L, 0L, "x y z w"),
      (3L, 1L, 1L, "")))
  }

  test("delimiter paragraph decontamination strips by content, not position") {
    val corpus = Seq(
      (1L, "keep me\n\nleaked paragraph text\n\nalso keep", "s0"),
      (2L, "only original content", "s0")
    ).toDF("doc_id", "text", "source")
    val bench = Seq(
      (100L, "benchmark intro\n\nleaked paragraph text", "eval")
    ).toDF("doc_id", "text", "source")
    val got = Paragraphs.paragraphDecontaminateByDelimiter(
        corpus, bench, "\\n{2,}")
      .select("doc_id", "n_dropped", "text_clean")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 1L, "keep me\n\nalso keep"),
      (2L, 0L, "only original content")))
  }

  private def round9(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(9, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  test("within-doc dedup drops a doc's own repeats, leaves cross-doc sharing alone") {
    val docs = Seq(
      // nav-bar paragraph "home about" repeats INSIDE doc 1 -> second
      // copy strips; the novel middle survives in place
      (1L, "s", "home about x1 y1 home about z1 w1"),
      // doc 2 contains the SAME boilerplate once -> untouched (cross-doc
      // dedup is the corpus pass's job, not this one's)
      (2L, "s", "home about p2 q2"),
      // all-duplicate doc keeps exactly its first block (corpus-level
      // strip would instead empty a later doc entirely)
      (3L, "s", "aa bb aa bb aa bb"),
      // no repeats -> text passes through VERBATIM
      (4L, "s", "u4 v4 w4 x4")).toDF("doc_id", "source", "text")
    val got = Paragraphs.paragraphDedupStripWithinDoc(docs, "\\s+", joiner = " ")
    // delimiter \s+ cuts single tokens: doc 1 repeats home/about
    val m = got.select("doc_id", "n_dropped", "text_clean")
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m(1L) == ((2L, "home about x1 y1 z1 w1")))
    assert(m(2L) == ((0L, "home about p2 q2")))
    assert(m(4L) == ((0L, "u4 v4 w4 x4")))
    // fixed-width cut: 2-token blocks, doc 3 keeps one of three equal blocks
    val fixed = Paragraphs.paragraphDedupStripWithinDocFixed(docs, paraTokens = 2)
      .select("doc_id", "n_paras", "n_dropped", "text_clean")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(fixed(3L) == ((3L, 3L, 2L, "aa bb")))
    assert(fixed(1L) == ((1L, 4L, 1L, "home about x1 y1 z1 w1")))
    assert(fixed(2L)._3 == 0L && fixed(2L)._4 == "home about p2 q2")
    // idempotent: a second pass drops nothing
    val again = Paragraphs.paragraphDedupStripWithinDocFixed(
      fixed.values.toSeq.map(r => (r._1, "s", r._4)).toDF("doc_id", "source", "text"),
      paraTokens = 2)
    assert(again.where($"n_dropped" > 0).count() == 0L)
  }

  test("within-doc is the conservative policy: within-doc ∘ corpus == corpus alone") {
    // random corpora from a small block pool: plenty of intra-doc repeats
    // AND cross-doc sharing. The corpus-wide strip's keeper is the
    // corpus-first (doc_id, para_idx), so it subsumes the within-doc cut —
    // running the conservative pass first must change NOTHING about the
    // corpus pass's final text (the property that makes the two-stage
    // spelling always safe, and within-doc a strict intermediate policy).
    val rnd = new scala.util.Random(23)
    val pool = Vector("aa bb", "cc dd", "ee ff", "gg hh", "ii jj", "kk ll")
    for (trial <- 1 to 3) {
      val docs = (1L to 30L).map { id =>
        (id, "s", Seq.fill(1 + rnd.nextInt(6))(pool(rnd.nextInt(pool.size)))
          .mkString(" "))
      }.toDF("doc_id", "source", "text")
      val corpusOnly = Paragraphs.paragraphDedupStrip(docs, paraTokens = 2)
        .select("doc_id", "text_clean").as[(Long, String)].collect().toMap
      val staged = Paragraphs.paragraphDedupStrip(
        Paragraphs.paragraphDedupStripWithinDocFixed(docs, paraTokens = 2)
          .select(col("doc_id"), col("source"), col("text_clean").as("text")),
        paraTokens = 2)
        .select("doc_id", "text_clean").as[(Long, String)].collect().toMap
      assert(staged == corpusOnly, s"trial $trial")
      // and the corpus pass's output has each block content at most once
      // globally — the within-doc pass cannot add anything to that
      val blocks = corpusOnly.values.toSeq.filter(_.nonEmpty)
        .flatMap(_.split(" ").grouped(2).map(_.mkString(" ")))
      assert(blocks.distinct.size == blocks.size, s"trial $trial dupes")
    }
  }
}
