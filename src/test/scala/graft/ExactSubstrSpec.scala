package graft

import org.apache.spark.sql.DataFrame

import graft.operators.{CacheScope, Curation, ExactSubstr, Tfidf}
import graft.sources.Tables

/** Exact-substring dedup ([[graft.operators.ExactSubstr]]) against two
  * independent single-node oracles:
  *
  *  - a LITERAL suffix-array implementation of the Lee et al. ExactSubstr
  *    algorithm (sort every suffix of the separator-joined corpus, take
  *    adjacent LCPs, mark every position whose longest match elsewhere is
  *    ≥ L) — run on the real sf0.001 fixture;
  *  - a brute-force window-content map — run on randomized
  *    planted-duplicate corpora (seeded, reproducible).
  *
  * Together these pin the operator's central claim: its marked set equals
  * the suffix-automaton marking of "every duplicated substring of ≥ L
  * tokens", not an approximation of it. */
class ExactSubstrSpec extends SparkSpec {
  import spark.implicits._

  private def toksOf(pairs: Seq[(Long, Seq[String])]): DataFrame =
    pairs.toDF("doc_id", "tokens")

  /** Brute-force oracle: duplicated L-window start positions (1-based). */
  private def bruteMarked(docs: Seq[(Long, Seq[String])], l: Int): Set[(Long, Long)] = {
    val counts = scala.collection.mutable.Map[Seq[String], Int]().withDefaultValue(0)
    for ((_, ts) <- docs; p <- 0 to ts.length - l)
      counts(ts.slice(p, p + l)) += 1
    (for {
      (id, ts) <- docs
      p <- 0 to ts.length - l
      if counts(ts.slice(p, p + l)) >= 2
    } yield (id, (p + 1).toLong)).toSet
  }

  /** Merge marked window starts into maximal covered regions per doc —
    * the reference spelling of the operator's span output. */
  private def mergeRegions(marked: Set[(Long, Long)], l: Int): Set[(Long, Long, Long)] =
    marked.groupBy(_._1).flatMap { case (doc, ps) =>
      val sorted = ps.map(_._2).toSeq.sorted
      val regions = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      for (p <- sorted) {
        if (regions.nonEmpty && p <= regions.last._2 + 1)
          regions(regions.length - 1) = (regions.last._1, p + l - 1)
        else regions += ((p, p + l - 1))
      }
      regions.map { case (s, e) => (doc, s, e) }
    }.toSet

  /** LITERAL Lee-et-al single-node reference: suffix array over the
    * separator-joined corpus + adjacent-LCP longest-match marking. Unique
    * separator tokens between documents make cross-document LCPs
    * impossible past a boundary (each separator occurs exactly once), so
    * maxMatch(p) ≥ L already implies the whole match sits inside one
    * document. */
  private def suffixArrayMarked(docs: Seq[(Long, Seq[String])], l: Int): Set[(Long, Long)] = {
    val buf = scala.collection.mutable.ArrayBuffer[String]()
    val origin = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    for (((id, ts), i) <- docs.zipWithIndex) {
      for ((t, j) <- ts.zipWithIndex) { buf += t; origin += ((id, (j + 1).toLong)) }
      buf += (" sep" + i + " "); origin += ((-1L, -1L))
    }
    val a = buf.toArray
    val n = a.length
    val sa = Array.range(0, n).sortWith { (i, j) =>
      var x = i; var y = j
      while (x < n && y < n && a(x) == a(y)) { x += 1; y += 1 }
      if (x == n) true else if (y == n) false else a(x) < a(y)
    }
    def lcp(i: Int, j: Int): Int = {
      var k = 0
      while (i + k < n && j + k < n && a(i + k) == a(j + k)) k += 1
      k
    }
    val maxMatch = new Array[Int](n)
    for (r <- 0 until n - 1) {
      val m = lcp(sa(r), sa(r + 1))
      maxMatch(sa(r)) = math.max(maxMatch(sa(r)), m)
      maxMatch(sa(r + 1)) = math.max(maxMatch(sa(r + 1)), m)
    }
    (0 until n).iterator
      .filter(p => maxMatch(p) >= l && origin(p)._1 >= 0)
      .map(origin(_))
      .toSet
  }

  private def collectMarked(df: DataFrame): Set[(Long, Long)] =
    df.select("doc_id", "pos").as[(Long, Long)].collect().toSet

  private lazy val fixtureToks: Seq[(Long, Seq[String])] =
    Tfidf.tokenArrays(Tables.documents(spark, "/root/testdata/sf0.001"))
      .as[(Long, Seq[String])].collect().toSeq
  private lazy val fixtureToksDf: DataFrame = {
    val df = toksOf(fixtureToks)
    df.cache(); df.count(); df
  }

  test("sf0.001 marked set == literal suffix-array longest-match marking (L=12)") {
    val oracle = suffixArrayMarked(fixtureToks, 12)
    assert(oracle.nonEmpty, "fixture should contain 12-token duplicates")
    val got = collectMarked(ExactSubstr.duplicateWindowsFromTokens(fixtureToksDf, 12))
    assert(got == oracle)
    // and the regions are the merged runs of exactly that set
    val gotSpans = ExactSubstr.spansFromTokens(fixtureToksDf, 12)
      .select("doc_id", "span_start", "span_end")
      .as[(Long, Long, Long)].collect().toSet
    assert(gotSpans == mergeRegions(oracle, 12))
  }

  test("sf0.001 golden: span census at L=12") {
    val spans = ExactSubstr.spansFromTokens(fixtureToksDf, 12)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(spans.size == 43)
    assert(spans.map(_._1).distinct.size == 43)
    assert(spans.map(_._4).sum == 2677L)
    assert(spans.map(_._4).max == 95L)
    assert(spans.map(_._4).min == 15L)
    // every span is a genuine >= L region and within its document
    val lens = fixtureToks.toMap.view.mapValues(_.length).toMap
    for ((doc, s, e, len) <- spans) {
      assert(len == e - s + 1 && len >= 12)
      assert(s >= 1 && e <= lens(doc))
    }
  }

  test("planted-duplicate corpora: operator == brute force (windows and spans)") {
    val rnd = new scala.util.Random(20260814L)
    val alphabet = Vector("a", "b", "c", "d", "e", "f")
    for (trial <- 1 to 8) {
      val nDocs = 5 + rnd.nextInt(5)
      val docs0 = (0 until nDocs).map { i =>
        (i.toLong, Seq.fill(20 + rnd.nextInt(40))(alphabet(rnd.nextInt(alphabet.size))))
      }
      // plant a long verbatim chunk from one doc into another
      val src = docs0(rnd.nextInt(nDocs))._2
      val chunkLen = math.min(src.length, 15 + rnd.nextInt(10))
      val chunk = src.slice(0, chunkLen)
      val victim = rnd.nextInt(nDocs)
      val docs = docs0.updated(victim,
        (docs0(victim)._1, docs0(victim)._2 ++ chunk))
      val df = toksOf(docs)
      for (l <- Seq(3, 5)) {
        val expect = bruteMarked(docs, l)
        val got = collectMarked(ExactSubstr.duplicateWindowsFromTokens(df, l))
        assert(got == expect, s"trial $trial L=$l windows")
        val gotSpans = ExactSubstr.spansFromTokens(df, l)
          .select("doc_id", "span_start", "span_end")
          .as[(Long, Long, Long)].collect().toSet
        assert(gotSpans == mergeRegions(expect, l), s"trial $trial L=$l spans")
      }
    }
  }

  test("prefix-doubling rank path == brute force, including non-power-of-two L") {
    val rnd = new scala.util.Random(7L)
    val alphabet = Vector("a", "b", "c")
    for (trial <- 1 to 3) {
      val docs = (0 until 4).map { i =>
        (i.toLong, Seq.fill(15 + rnd.nextInt(25))(alphabet(rnd.nextInt(alphabet.size))))
      }
      for (l <- Seq(1, 3, 5, 8)) {
        val got = collectMarked(ExactSubstr.duplicateWindowsViaRanks(toksOf(docs), l))
        assert(got == bruteMarked(docs, l), s"trial $trial L=$l")
      }
    }
  }

  test("localRankMarks == brute force and == the distributed rank path") {
    val rnd = new scala.util.Random(11L)
    val alphabet = Vector("a", "b", "c")
    for (trial <- 1 to 3) {
      val docs = (0 until 4).map { i =>
        (i.toLong,
          Vector.fill(15 + rnd.nextInt(25))(alphabet(rnd.nextInt(alphabet.size))))
      }
      for (l <- Seq(1, 3, 5, 8, 12)) {
        val local = ExactSubstr.localRankMarks(docs, l)
        assert(local == bruteMarked(docs, l), s"trial $trial L=$l vs brute")
        val dist = collectMarked(ExactSubstr.duplicateWindowsViaRanks(
          toksOf(docs), l))
        assert(local == dist, s"trial $trial L=$l vs distributed")
      }
    }
    // short docs and empty corpus degenerate to the empty marking
    assert(ExactSubstr.localRankMarks(Seq((1L, Vector("a", "b"))), 5).isEmpty)
    assert(ExactSubstr.localRankMarks(Seq.empty, 3).isEmpty)
  }

  test("sampled rank gate THROWS on a seeded mutation of either side") {
    val marks = Set((1L, 1L), (2L, 5L), (3L, 2L))
    // agreeing sides pass and report the union size
    val ok = ExactSubstr.sampledGateRow(spark, marks, marks, 10L)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(ok == ((3L, 0L, 0L, 10L, 0L)))
    // the verify side LOST a true duplicate (broken kernel: a hash that
    // fails to collide for equal content)
    val lost = intercept[IllegalArgumentException] {
      ExactSubstr.sampledGateRow(spark, marks, marks - ((2L, 5L)), 10L)
    }
    assert(lost.getMessage.contains("missed"))
    // the verify side kept a PHANTOM (content verify failed to kill a
    // collision)
    val phantom = intercept[IllegalArgumentException] {
      ExactSubstr.sampledGateRow(spark, marks, marks + ((9L, 9L)), 10L)
    }
    assert(phantom.getMessage.contains("missed"))
  }

  test("within-doc repetition is found without any cross-doc duplicate") {
    val docs = Seq((7L, Seq("x", "y", "x", "y", "x", "z")))
    val got = collectMarked(ExactSubstr.duplicateWindowsFromTokens(toksOf(docs), 2))
    // "x y" at 1 and 3 duplicate; "y x" at 2 and 4 duplicate
    assert(got == Set((7L, 1L), (7L, 2L), (7L, 3L), (7L, 4L)))
    val spans = ExactSubstr.spansFromTokens(toksOf(docs), 2)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(spans == Seq((7L, 1L, 5L, 5L)))
  }

  test("spansWithWitness: regions point at their canonical occurrence") {
    // doc 2 copies a 4-token run from doc 1; doc 1 is corpus-first
    val docs = Seq(
      (1L, Seq("a", "b", "c", "d", "tailone")),
      (2L, Seq("head", "a", "b", "c", "d")))
    val verified = ExactSubstr.duplicateWindowsFromTokens(toksOf(docs), 4)
    val got = ExactSubstr.spansWithWitness(verified, 4)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // the canonical copy witnesses itself; the duplicate witnesses doc 1
    assert(got == Seq((1L, 1L, 4L, 4L, 1L, 1L), (2L, 2L, 5L, 4L, 1L, 1L)))
    // fixture invariant: every witness is a verified occurrence of the
    // SAME gram as the region's opening window
    val fixtureVerified = ExactSubstr.duplicateWindowsFromTokens(fixtureToksDf, 12)
    fixtureVerified.cache()
    val spans = ExactSubstr.spansWithWitness(fixtureVerified, 12)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(spans.nonEmpty)
    val gramAt = fixtureVerified.select("doc_id", "pos", "gram")
      .as[(Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    for ((doc, s, _, _, wd, wp) <- spans) {
      assert(gramAt((wd, wp)) == gramAt((doc, s)),
        s"witness ($wd,$wp) gram differs from span start ($doc,$s)")
      // canonical = corpus-first: never later than the marked occurrence
      assert(wd < doc || (wd == doc && wp <= s))
    }
    fixtureVerified.unpersist()
  }

  test("strip at the family window length reproduces stripDuplicateSpans exactly") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val family = Curation.stripDuplicateSpans(docs, 5)
      .as[(Long, Long, String)].collect().toSeq
    val exact = ExactSubstr.stripFromTokens(docs, fixtureToksDf, 5)
      .as[(Long, Long, String)].collect().toSeq
    assert(exact == family)
  }

  // digit-free planted words: the strip consumers re-tokenize raw text via
  // Curation.tokenArray, which DROPS digit-bearing tokens
  private def plantedWords(tag: String, n: Int): Seq[String] =
    (0 until n).map(i =>
      tag + ('a' + i % 26).toChar.toString + ('a' + i / 26).toChar)

  test("stripThresholdFromLevel: only >=48-token duplicates strip; shorter ones survive") {
    def words(tag: String, n: Int): Seq[String] = plantedWords(tag, n)
    val long = words("long", 60)   // shared 60-token run: stripped at 48
    val short = words("short", 20) // shared 20-token run: kept at 48
    val corpus = Seq(
      (1L, long ++ words("ua", 9)),           // canonical copy of `long`
      (2L, words("ub", 7) ++ long),           // loses its `long` coverage
      (3L, short ++ words("uc", 40)),         // canonical copy of `short`
      (4L, words("ud", 40) ++ short))         // keeps `short` too (< 48)
    val docs = corpus.map { case (id, ts) => (id, ts.mkString(" ")) }
      .toDF("doc_id", "text")
    val toks = toksOf(corpus)
    val levels = ExactSubstr.cascadeLevels(toks,
      ExactSubstr.duplicateWindowsFromTokens(toks, 12).select("doc_id", "pos"),
      12, 2)
    val l48 = levels.collectFirst { case (48, m) => m }.get
    val got = ExactSubstr.stripThresholdFromLevel(docs, l48, 48)
      .as[(Long, Long, String)].collect().toSeq
    // the live brute-marking spelling at n=48 is the reference
    val expected = Curation.stripDuplicateSpans(docs, 48)
      .as[(Long, Long, String)].collect().toSeq
    assert(got == expected)
    val byDoc = got.map(r => r._1 -> r).toMap
    assert(byDoc(1L)._2 == 69)                      // canonical: untouched
    assert(byDoc(2L)._2 == 7)                       // 60-run stripped
    assert(byDoc(3L)._2 == 60 && byDoc(4L)._2 == 60) // 20-run SURVIVES
    assert(byDoc(4L)._3.contains("shortaa"))
  }

  test("stripKeepLongest: each gram survives in the LONGEST document; ties corpus-first") {
    def words(tag: String, n: Int): Seq[String] = plantedWords(tag, n)
    val g = words("dup", 12)
    val corpus = Seq(
      (1L, g),                                  // shortest, smallest id
      (2L, words("pad", 30) ++ g),              // LONGEST: the keeper
      (3L, g ++ words("tail", 5)))              // middle
    val docs = corpus.map { case (id, ts) => (id, ts.mkString(" ")) }
      .toDF("doc_id", "text")
    val toks = toksOf(corpus)
    val verified = ExactSubstr.duplicateWindowsFromTokens(toks, 12)
    val got = ExactSubstr.stripKeepLongestFromVerified(docs, toks, verified, 12)
      .as[(Long, Long, String)].collect().toSeq.map(r => r._1 -> r).toMap
    assert(got(1L)._2 == 0)                     // corpus-first copy LOSES
    assert(got(2L)._2 == 42 && got(2L)._3.contains("dupaa"))
    assert(got(3L)._2 == 5 && !got(3L)._3.contains("dupaa"))
    // equal lengths fall back to the corpus-first keeper: identical rows
    // to the canonical-keep strip
    val tieCorpus = Seq((1L, g ++ words("xa", 4)), (2L, g ++ words("xb", 4)))
    val tieDocs = tieCorpus.map { case (id, ts) => (id, ts.mkString(" ")) }
      .toDF("doc_id", "text")
    val tieToks = toksOf(tieCorpus)
    val tieVerified = ExactSubstr.duplicateWindowsFromTokens(tieToks, 12)
    val tieGot = ExactSubstr
      .stripKeepLongestFromVerified(tieDocs, tieToks, tieVerified, 12)
      .as[(Long, Long, String)].collect().toSeq
    val tieCanon = ExactSubstr.stripFromVerified(tieDocs, tieVerified, 12)
      .as[(Long, Long, String)].collect().toSeq
    assert(tieGot == tieCanon)
  }

  test("stripKeepLongest == local recompute of the keeper rule on the fixture") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val verified = ExactSubstr.duplicateWindowsFromTokens(fixtureToksDf, 12)
    val got = ExactSubstr
      .stripKeepLongestFromVerified(docs, fixtureToksDf, verified, 12)
      .as[(Long, Long, String)].collect().toSeq
    // local reference: group occurrences by gram, keep max doc_len
    // (ties min (doc_id, pos)), remove coverage of the rest
    val lens = fixtureToks.map { case (id, ts) => id -> ts.length }.toMap
    val marked = bruteMarked(fixtureToks, 12)
    val byGram = marked.groupBy { case (id, p) =>
      fixtureToks.find(_._1 == id).get._2.slice(p.toInt - 1, p.toInt + 11)
    }
    val rem = byGram.values.flatMap { occ =>
      val keeper = occ.minBy { case (id, p) => (-lens(id).toLong, id, p) }
      occ - keeper
    }.toSet
    val cov = rem.flatMap { case (id, p) => (p until p + 12).map(id -> _) }
    val expected = fixtureToks.map { case (id, ts) =>
      val keptToks = ts.zipWithIndex.collect {
        case (t, i) if !cov.contains(id -> (i + 1).toLong) => t
      }
      (id, keptToks.length.toLong, keptToks.mkString(" "))
    }.sortBy(_._1)
    assert(got == expected && rem.nonEmpty)
  }

  test("agreement gates pass on the fixture and report vacuous=1 when duplicate-free") {
    val wins = Curation.windowRowsFromTokens(fixtureToksDf, 5)
    val row = ExactSubstr.windowFamilyAgreementGate(fixtureToksDf, wins, 5)
      .as[(Long, Long, Long, Long)].head()
    assert(row._1 > 0 && row._2 == 0 && row._3 == 0 && row._4 == 0)
    val rank = ExactSubstr.rankAgreementGate(fixtureToksDf, 12)
      .as[(Long, Long, Long, Long)].head()
    assert(rank._1 > 0 && rank._2 == 0 && rank._3 == 0 && rank._4 == 0)
    // a legitimately duplicate-free corpus reports a vacuous row instead
    // of failing the registry (r8 ADVICE: data property != gate failure)
    val empty = toksOf(Seq((1L, Seq("unique", "tokens", "only", "here"))))
    val vac = ExactSubstr.windowFamilyAgreementGate(empty,
      Curation.windowRowsFromTokens(empty, 3), 3)
      .as[(Long, Long, Long, Long)].head()
    assert(vac == ((0L, 0L, 0L, 1L)))
    val vacRank = ExactSubstr.rankAgreementGate(empty, 3)
      .as[(Long, Long, Long, Long)].head()
    assert(vacRank == ((0L, 0L, 0L, 1L)))
  }

  test("rank gate THROWS on a seeded kernel mutation (lost and phantom positions)") {
    // a broken candidate/hash kernel loses a true duplicate: simulate by
    // dropping one verified row — the suffix-rank side still finds it
    val verified = ExactSubstr.duplicateWindowsFromTokens(fixtureToksDf, 12)
      .select("doc_id", "pos").cache()
    val first = verified.orderBy("doc_id", "pos").limit(1)
    val lost = verified.exceptAll(first)
    val e1 = intercept[IllegalArgumentException] {
      ExactSubstr.rankAgreementGateFromVerified(fixtureToksDf, lost, 12)
    }
    assert(e1.getMessage.contains("missed"))
    // a collision the content verify failed to kill: a phantom position
    val phantom = verified.unionByName(
      Seq((999999L, 1L)).toDF("doc_id", "pos"))
    val e2 = intercept[IllegalArgumentException] {
      ExactSubstr.rankAgreementGateFromVerified(fixtureToksDf, phantom, 12)
    }
    assert(e2.getMessage.contains("missed"))
    verified.unpersist()
  }

  test("sampled rank gate: deterministic, non-vacuous via planting, agrees with full gate") {
    val verified = ExactSubstr.duplicateWindowsFromTokens(fixtureToksDf, 12)
    // sampleDocs >= corpus samples every document — the sampled gate then
    // IS the full gate (summary row matches, plus the sample-size column)
    val full = ExactSubstr.rankAgreementGate(fixtureToksDf, 12)
      .as[(Long, Long, Long, Long)].head()
    val all = ExactSubstr.rankAgreementGateSampled(fixtureToksDf, verified, 12,
      sampleDocs = fixtureToks.size, plantedGrams = 0)
      .as[(Long, Long, Long, Long, Long)].head()
    assert((all._1, all._2, all._3) == ((full._1, full._2, full._3)))
    assert(all._4 == fixtureToks.size && all._5 == 0)
    // an empty hash sample with planting stays non-vacuous (the planted
    // gram groups ride along whole) and is identical run-to-run
    val s1 = ExactSubstr.rankAgreementGateSampled(fixtureToksDf, verified, 12,
      sampleDocs = 0, plantedGrams = 4)
      .as[(Long, Long, Long, Long, Long)].head()
    val s2 = ExactSubstr.rankAgreementGateSampled(fixtureToksDf, verified, 12,
      sampleDocs = 0, plantedGrams = 4)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(s1 == s2)
    assert(s1._5 == 0 && s1._1 > 0, "planting must keep the gate non-vacuous")
    assert(s1._4 < fixtureToks.size, "sample must actually be a subset")
    // the FIXED-size sample really is fixed: K docs by smallest hash plus
    // the planted groups, regardless of corpus size
    val k = ExactSubstr.rankAgreementGateSampled(fixtureToksDf, verified, 12,
      sampleDocs = 7, plantedGrams = 0)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(k._4 == 7)
    // the sample itself is the documented closure: planted gram groups
    // arrive complete, so their windows verify as duplicated IN the sample
    val sample = ExactSubstr.exactSubstrSample(fixtureToksDf, verified, 0, 4)
    assert(sample.count() == s1._4)
  }

  test("dupLengthProfile: brute-force counts per length, zero rows past max depth") {
    val rnd = new scala.util.Random(99L)
    val alphabet = Vector("a", "b", "c", "d")
    val docs0 = (0 until 5).map { i =>
      (i.toLong, Seq.fill(25 + rnd.nextInt(20))(alphabet(rnd.nextInt(alphabet.size))))
    }
    // plant a 10-token verbatim clone so depth 8 is occupied, 16 is not
    val chunk = docs0.head._2.take(10)
    val docs = docs0.updated(3, (3L, docs0(3)._2 ++ chunk))
    val lengths = Seq(2, 4, 8, 16)
    val got = ExactSubstr.dupLengthProfile(toksOf(docs), lengths)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val expect = lengths.map { l =>
      val marked = bruteMarked(docs, l)
      val covered = marked.flatMap { case (d, p) => (p until p + l).map((d, _)) }
      (l.toLong, marked.size.toLong, covered.size.toLong,
        marked.map(_._1).size.toLong /* placeholder, fixed below */)
    }.map { case (l, w, c, _) =>
      (l, w, c, bruteMarked(docs, l.toInt).map(_._1).toSet.size.toLong)
    }
    assert(got == expect)
    // the planted 10-token clone guarantees depth 8 mass and depth 16 zeros
    assert(got.find(_._1 == 8L).get._2 > 0)
    assert(got.find(_._1 == 16L).get == ((16L, 0L, 0L, 0L)))
    // coverage is monotone non-increasing in depth
    assert(got.map(_._3) == got.map(_._3).sorted.reverse)
    // the cascade-pruned asset-served form (the registered query's path)
    // produces the identical profile from the base-level verified table
    val verified = ExactSubstr.duplicateWindowsFromTokens(toksOf(docs), 2)
    val cascade = ExactSubstr.dupLengthProfileFromVerified(
        toksOf(docs), verified, baseLen = 2, doublings = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(cascade == got)
  }

  test("cascade depth profile matches the standalone form on the fixture") {
    val verified = ExactSubstr.duplicateWindowsFromTokens(fixtureToksDf, 12)
    val cascade = ExactSubstr.dupLengthProfileFromVerified(
        fixtureToksDf, verified, baseLen = 12, doublings = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val standalone = ExactSubstr.dupLengthProfile(
        fixtureToksDf, Seq(12, 24, 48, 96))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(cascade == standalone)
    // fixture shape: depth 48 occupied, depth 96 empty (honest zero row)
    assert(cascade.find(_._1 == 48L).get._2 > 0)
    assert(cascade.find(_._1 == 96L).get == ((96L, 0L, 0L, 0L)))
  }

  /** Brute-force per-position longest duplicated window length, capped:
    * for each base-marked position, max m in [base, cap] whose m-window
    * occurs >= 2 times corpus-wide. */
  private def bruteMatchLengths(docs: Seq[(Long, Seq[String])], base: Int,
      cap: Int): Map[(Long, Long), Long] = {
    val counts = scala.collection.mutable.Map[(Int, Seq[String]), Int]().withDefaultValue(0)
    for ((_, ts) <- docs; m <- base to cap; p <- 0 to ts.length - m)
      counts((m, ts.slice(p, p + m))) += 1
    (for {
      (id, ts) <- docs
      p <- 0 to ts.length - base
      if counts((base, ts.slice(p, p + base))) >= 2
    } yield {
      val best = (base to cap).filter(m =>
        p + m <= ts.length && counts((m, ts.slice(p, p + m))) >= 2).max
      (id, (p + 1).toLong) -> best.toLong
    }).toMap
  }

  test("matchLengths == brute force on planted corpora (base 2, cap 16)") {
    val rnd = new scala.util.Random(424242L)
    val alphabet = Vector("a", "b", "c", "d")
    for (trial <- 1 to 5) {
      val docs0 = (0 until 5).map { i =>
        (i.toLong, Seq.fill(20 + rnd.nextInt(25))(alphabet(rnd.nextInt(alphabet.size))))
      }
      // plant a clone of length in [5, 14] so several bands are exercised
      val src = docs0(rnd.nextInt(5))._2
      val chunk = src.slice(0, math.min(src.length, 5 + rnd.nextInt(10)))
      val victim = rnd.nextInt(5)
      val docs = docs0.updated(victim, (docs0(victim)._1, docs0(victim)._2 ++ chunk))
      val df = toksOf(docs)
      val verified = ExactSubstr.duplicateWindowsFromTokens(df, 2)
      val got = ExactSubstr.matchLengthsFromVerified(df, verified, 2, 3)
        .as[(Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      val expect = bruteMatchLengths(docs, 2, 16)
      assert(got == expect, s"trial $trial")
    }
  }

  test("incremental merge == full rebuild on planted corpora (incl. the unique-window flip)") {
    val rnd = new scala.util.Random(99L)
    val alphabet = Vector("a", "b", "c", "d", "e")
    def asRows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "pos", "gram", "occ", "canon.doc_id", "canon.pos")
        .as[(Long, Long, String, Long, Long, Long)].collect().toSet
    for (trial <- 1 to 5) CacheScope {
      val all = (0 until 8).map { i =>
        (i.toLong, Seq.fill(10 + rnd.nextInt(20))(alphabet(rnd.nextInt(alphabet.size))))
      }
      // plant a cross-batch clone: an OLD doc's chunk appended to a NEW
      // doc — the old chunk's windows may be UNIQUE in the old corpus and
      // must flip to duplicated only through the merge
      val chunk = all(0)._2.take(5 + rnd.nextInt(5))
      val newIds = Set(6L, 7L)
      val planted = all.updated(7, (7L, all(7)._2 ++ chunk))
      val oldDocs = planted.filterNot(d => newIds(d._1))
      val newDocs = planted.filter(d => newIds(d._1))
      val (oldDf, newDf, allDf) = (toksOf(oldDocs), toksOf(newDocs), toksOf(planted))
      val n = 3
      val merged = ExactSubstr.mergeVerifiedIncremental(
        oldDf, ExactSubstr.windowHashesFromTokens(oldDf, n),
        ExactSubstr.duplicateWindowsFromTokens(oldDf, n), newDf, n)
      assert(asRows(merged) == asRows(ExactSubstr.duplicateWindowsFromTokens(allDf, n)),
        s"trial $trial")
    }
  }

  test("cascade merge == full rebuild at every level on planted corpora") {
    val rnd = new scala.util.Random(7L)
    val alphabet = Vector("a", "b", "c", "d", "e", "f", "g")
    def levelRows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "pos", "occ", "canon.doc_id", "canon.pos")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
    def storedLevel(toks: org.apache.spark.sql.DataFrame,
        prev: org.apache.spark.sql.DataFrame, level: Int) =
      ExactSubstr.withLevelHashes(toks,
        ExactSubstr.cascadeStep(toks, prev.select("doc_id", "pos"), level / 2), level)
    // CacheScope per trial: the merge drivers pin (persist) a dozen
    // frames each — unscoped, three trials' caches stack on the suite's
    // shared session and starve later suites' broadcasts
    for (trial <- 1 to 3) CacheScope {
      val all = (0 until 8).map { i =>
        (i.toLong, Seq.fill(14 + rnd.nextInt(18))(alphabet(rnd.nextInt(alphabet.size))))
      }
      // plant a LONG cross-batch clone (>= 2 doublings above base 3) so
      // the upper levels change THROUGH the merge: old doc 0's chunk
      // appended to new doc 7 — its 12-windows may be unique pre-append
      val chunk = all(0)._2.take(12 + rnd.nextInt(4))
      val newIds = Set(6L, 7L)
      val planted = all.updated(7, (7L, all(7)._2 ++ chunk))
      val (oldDf, newDf, allDf) = (toksOf(planted.filterNot(d => newIds(d._1))),
        toksOf(planted.filter(d => newIds(d._1))), toksOf(planted))
      val oldBase = ExactSubstr.duplicateWindowsFromTokens(oldDf, 3)
      val oldL6 = storedLevel(oldDf, oldBase, 6)
      val oldL12 = storedLevel(oldDf, oldL6, 12)
      val merged = ExactSubstr.mergeCascadeIncremental(
        oldDf, ExactSubstr.windowHashesFromTokens(oldDf, 3), oldBase,
        Seq(6 -> oldL6, 12 -> oldL12), newDf, 3)
      val fullBase = ExactSubstr.duplicateWindowsFromTokens(allDf, 3)
      val fullL6 = ExactSubstr.cascadeStep(allDf, fullBase, 3)
      val fullL12 = ExactSubstr.cascadeStep(allDf, fullL6, 6)
      assert(merged.map(_._1) == Seq(3, 6, 12))
      assert(levelRows(merged(0)._2) == levelRows(fullBase), s"trial $trial base")
      assert(levelRows(merged(1)._2) == levelRows(fullL6), s"trial $trial l6")
      assert(levelRows(merged(2)._2) == levelRows(fullL12), s"trial $trial l12")
      // the merged levels carry CORRECT hashes (the next append's probe key)
      for ((lvl, m) <- merged.drop(1)) {
        val wrongWh = m.join(
          ExactSubstr.windowHashesFromTokens(allDf, lvl)
            .withColumnRenamed("wh", "expected_wh"),
          Seq("doc_id", "pos"))
          .where(org.apache.spark.sql.functions.col("wh") =!=
            org.apache.spark.sql.functions.col("expected_wh")).count()
        assert(wrongWh == 0L, s"trial $trial level $lvl hashes")
      }
    }
  }

  test("incremental match lengths == full recompute on planted corpora (incl. forced collisions)") {
    val rnd = new scala.util.Random(41L)
    val alphabet = Vector("a", "b", "c", "d", "e", "f")
    def mlRows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "pos", "match_len")
        .as[(Long, Long, Long)].collect().toSet
    def storedLevel(toks: org.apache.spark.sql.DataFrame,
        prev: org.apache.spark.sql.DataFrame, level: Int) =
      ExactSubstr.withLevelHashes(toks,
        ExactSubstr.cascadeStep(toks, prev.select("doc_id", "pos"), level / 2), level)
    // CacheScope per trial: two full + two incremental length searches
    // pin tens of frames each — scoped so the suite's session stays lean
    for (trial <- 1 to 2) CacheScope {
      val all = (0 until 8).map { i =>
        (i.toLong, Seq.fill(14 + rnd.nextInt(16))(alphabet(rnd.nextInt(alphabet.size))))
      }
      // a long cross-batch clone GROWS an old position's match length
      // in place (band-internal growth, the occ-propagation case) and
      // flips others
      val chunk = all(0)._2.take(11 + rnd.nextInt(4))
      val newIds = Set(6L, 7L)
      val planted = all.updated(7, (7L, all(7)._2 ++ chunk))
      val (oldDf, newDf, allDf) = (toksOf(planted.filterNot(d => newIds(d._1))),
        toksOf(planted.filter(d => newIds(d._1))), toksOf(planted))
      val oldBase = ExactSubstr.duplicateWindowsFromTokens(oldDf, 3)
      val oldL6 = storedLevel(oldDf, oldBase, 6)
      val oldL12 = storedLevel(oldDf, oldL6, 12)
      val oldML = ExactSubstr.matchLengthsFromLevels(oldDf,
        Seq(3 -> oldBase, 6 -> oldL6, 12 -> oldL12))
      val merged = ExactSubstr.mergeCascadeIncremental(
        oldDf, ExactSubstr.windowHashesFromTokens(oldDf, 3), oldBase,
        Seq(6 -> oldL6, 12 -> oldL12), newDf, 3)
      val changed = ExactSubstr.changedMarks(merged.head._2, oldBase)
      val full = ExactSubstr.matchLengthsFromLevels(allDf, merged)
      assert(mlRows(ExactSubstr.matchLengthsIncremental(
        allDf, merged, oldML, changed)) == mlRows(full), s"trial $trial")
      // masked probe hashes force collisions: fallback keeps it exact
      assert(mlRows(ExactSubstr.matchLengthsIncremental(
        allDf, merged, oldML, changed, probeHashBits = 2)) == mlRows(full),
        s"trial $trial masked")
    }
  }

  test("incremental match lengths: empty batch passes the stored table through") {
    CacheScope {
    val docs = Seq(
      (1L, Seq.fill(3)(Seq("x", "y", "z", "w")).flatten),
      (2L, Seq("x", "y", "z", "w") ++ Seq("q", "r", "s", "t")))
    val df = toksOf(docs)
    val base = ExactSubstr.duplicateWindowsFromTokens(df, 2)
    val l4 = ExactSubstr.withLevelHashes(df,
      ExactSubstr.cascadeStep(df, base.select("doc_id", "pos"), 2), 4)
    val levels = Seq(2 -> base, 4 -> l4)
    val ml = ExactSubstr.matchLengthsFromLevels(df, levels)
    val none = ExactSubstr.changedMarks(base, base) // empty by construction
    assert(none.isEmpty)
    val out = ExactSubstr.matchLengthsIncremental(df, levels, ml, none)
      .select("doc_id", "pos", "match_len").as[(Long, Long, Long)].collect().toSet
    assert(out == ml.select("doc_id", "pos", "match_len")
      .as[(Long, Long, Long)].collect().toSet)
    }
  }

  test("cascade merge degenerate batches: empty new, empty old") {
    CacheScope {
    val docs = Seq(
      (1L, Seq.fill(3)(Seq("x", "y", "z", "w")).flatten),
      (2L, Seq("x", "y", "z", "w") ++ Seq("q", "r", "s", "t")))
    val df = toksOf(docs)
    val none = toksOf(Seq.empty[(Long, Seq[String])])
    val base = ExactSubstr.duplicateWindowsFromTokens(df, 2)
    val l4 = ExactSubstr.withLevelHashes(df,
      ExactSubstr.cascadeStep(df, base.select("doc_id", "pos"), 2), 4)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select("doc_id", "pos", "occ").as[(Long, Long, Long)].collect().toSet
    // empty append: every stored level passes through untouched
    val mEmpty = ExactSubstr.mergeCascadeIncremental(
      df, ExactSubstr.windowHashesFromTokens(df, 2), base,
      Seq(4 -> l4), none, 2)
    assert(rows(mEmpty(1)._2) == rows(l4))
    // empty old index: the merge IS the fresh cascade over the batch
    val emptyBase = ExactSubstr.duplicateWindowsFromTokens(none, 2)
    val mFresh = ExactSubstr.mergeCascadeIncremental(
      none, ExactSubstr.windowHashesFromTokens(none, 2), emptyBase,
      Seq(4 -> ExactSubstr.withLevelHashes(none,
        ExactSubstr.cascadeStep(none, emptyBase.select("doc_id", "pos"), 2), 4)),
      df, 2)
    assert(rows(mFresh(1)._2) == rows(l4))
    }
  }

  test("incremental merge degenerate batches: empty new, empty old") {
    val docs = Seq((1L, Seq("x", "y", "z", "x", "y", "z")), (2L, Seq("q", "r", "s")))
    val df = toksOf(docs)
    val none = toksOf(Seq.empty[(Long, Seq[String])])
    val full = ExactSubstr.duplicateWindowsFromTokens(df, 2)
    def key(d: org.apache.spark.sql.DataFrame) =
      d.select("doc_id", "pos", "gram", "occ").as[(Long, Long, String, Long)].collect().toSet
    // empty append: the stored index passes through untouched
    assert(key(ExactSubstr.mergeVerifiedIncremental(
      df, ExactSubstr.windowHashesFromTokens(df, 2), full, none, 2)) == key(full))
    // empty old index: the merge IS the fresh build over the batch
    assert(key(ExactSubstr.mergeVerifiedIncremental(
      none, ExactSubstr.windowHashesFromTokens(none, 2),
      ExactSubstr.duplicateWindowsFromTokens(none, 2), df, 2)) == key(full))
  }

  test("matchLengths stays exact under forced hash collisions (masked probe bits)") {
    // the probe rounds guide the bisection with rolling hashes; the final
    // exact-string confirm + fallback must keep the RESULT exact at any
    // hash width. Masking to 2 bits leaves 4 distinct probe hashes, so
    // nearly every bucket is a collision and the fallback path carries
    // the load; at 1 bit EVERY candidate shares a bucket.
    val rnd = new scala.util.Random(77L)
    val alphabet = Vector("a", "b", "c", "d")
    for (bits <- Seq(1, 2, 8)) {
      val docs0 = (0 until 5).map { i =>
        (i.toLong, Seq.fill(20 + rnd.nextInt(25))(alphabet(rnd.nextInt(alphabet.size))))
      }
      val src = docs0(rnd.nextInt(5))._2
      val chunk = src.slice(0, math.min(src.length, 5 + rnd.nextInt(10)))
      val victim = rnd.nextInt(5)
      val docs = docs0.updated(victim, (docs0(victim)._1, docs0(victim)._2 ++ chunk))
      val df = toksOf(docs)
      val verified = ExactSubstr.duplicateWindowsFromTokens(df, 2)
      val got = ExactSubstr.matchLengthsFromVerified(df, verified, 2, 3,
          probeHashBits = bits)
        .as[(Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(got == bruteMatchLengths(docs, 2, 16), s"bits=$bits")
    }
  }

  test("matchLengths on the fixture == capped suffix-array per-position longest match") {
    // the literal suffix array's maxMatch(p) IS dupLen(p): the longest
    // match of suffix p against any other suffix, i.e. the longest
    // duplicated substring starting at p
    val buf = scala.collection.mutable.ArrayBuffer[String]()
    val origin = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    for (((id, ts), i) <- fixtureToks.zipWithIndex) {
      for ((t, j) <- ts.zipWithIndex) { buf += t; origin += ((id, (j + 1).toLong)) }
      buf += (" sep" + i + " "); origin += ((-1L, -1L))
    }
    val a = buf.toArray
    val n = a.length
    val sa = Array.range(0, n).sortWith { (i, j) =>
      var x = i; var y = j
      while (x < n && y < n && a(x) == a(y)) { x += 1; y += 1 }
      if (x == n) true else if (y == n) false else a(x) < a(y)
    }
    val maxMatch = new Array[Int](n)
    for (r <- 0 until n - 1) {
      var k = 0
      val (i, j) = (sa(r), sa(r + 1))
      while (i + k < n && j + k < n && a(i + k) == a(j + k)) k += 1
      maxMatch(i) = math.max(maxMatch(i), k)
      maxMatch(j) = math.max(maxMatch(j), k)
    }
    val expect = (0 until n).iterator
      .filter(p => maxMatch(p) >= 12 && origin(p)._1 >= 0)
      .map(p => origin(p) -> math.min(maxMatch(p), 96).toLong)
      .toMap
    val verified = ExactSubstr.duplicateWindowsFromTokens(fixtureToksDf, 12)
    val got = ExactSubstr.matchLengthsFromVerified(fixtureToksDf, verified, 12, 3)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got.keySet == expect.keySet)
    val diff = got.collect { case (k, v) if expect(k) != v => (k, v, expect(k)) }
    assert(diff.isEmpty, s"mismatched lengths: ${diff.take(5)}")
    // the fixture genuinely exercises exact (non-band-edge) lengths and
    // the cap
    assert(got.values.exists(v => v != 12 && v != 24 && v != 48 && v != 96))
  }

  test("matchLengths degenerate shapes: single level, empty corpus") {
    // single-level cascade: every mark reports the cap (= base)
    val docs = Seq((1L, Seq("x", "y", "z", "q")), (2L, Seq("x", "y", "z", "w")))
    val df = toksOf(docs)
    val verified = ExactSubstr.duplicateWindowsFromTokens(df, 3)
    val one = ExactSubstr.matchLengthsFromVerified(df, verified, 3, 0)
      .as[(Long, Long, Long)].collect().toSet
    assert(one == Set((1L, 1L, 3L), (2L, 1L, 3L)))
    // empty corpus: no rows, no crash
    val none = toksOf(Seq.empty[(Long, Seq[String])])
    assert(ExactSubstr.matchLengthsFromVerified(none,
      ExactSubstr.duplicateWindowsFromTokens(none, 2), 2, 2).count() == 0)
  }

  test("pathological corpus: every document identical") {
    // all-dup worst case: every window of every doc is duplicated, every
    // doc is one wall-to-wall region, and the strip keeps ONLY the
    // canonical (first) document's text
    val toks = Seq("p", "q", "r", "s", "t", "u")
    val docs = (1L to 4L).map(i => (i, toks))
    val spans = ExactSubstr.spansFromTokens(toksOf(docs), 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(spans == (1L to 4L).map(i => (i, 1L, 6L, 6L)))
    val docsDf = docs.map { case (i, ts) => (i, ts.mkString(" ")) }
      .toDF("doc_id", "text")
    val stripped = ExactSubstr.stripFromTokens(docsDf, toksOf(docs), 3)
      .as[(Long, Long, String)].collect().toSeq
    assert(stripped.head == ((1L, 6L, "p q r s t u")))
    assert(stripped.tail.forall(r => r._2 == 0L && r._3 == ""))
    // depth profile: bands up to the doc length occupied, beyond it zero
    val prof = ExactSubstr.dupLengthProfile(toksOf(docs), Seq(3, 6, 12))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(prof.find(_._1 == 6L).get._4 == 4L)
    assert(prof.find(_._1 == 12L).get == ((12L, 0L, 0L, 0L)))
  }

  test("degenerate inputs: short docs, empty corpus, L=1") {
    val short = toksOf(Seq((1L, Seq("a", "b")), (2L, Seq("a", "b"))))
    // docs shorter than L have no windows at all
    assert(ExactSubstr.duplicateWindowsFromTokens(short, 3).count() == 0)
    assert(ExactSubstr.spansFromTokens(short, 3).count() == 0)
    val none = toksOf(Seq.empty[(Long, Seq[String])])
    assert(ExactSubstr.spansFromTokens(none, 5).count() == 0)
    // L=1: duplicated single tokens, brute-checked
    val tiny = Seq((1L, Seq("p", "q", "p")), (2L, Seq("q", "r")))
    assert(collectMarked(ExactSubstr.duplicateWindowsFromTokens(toksOf(tiny), 1))
      == bruteMarked(tiny, 1))
  }

  test("window-hash kernel: rolling == direct polynomial, shapes, null tokens") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.{ShingleHashing, WindowHashUtil}
    val toks = Seq("alpha", "beta", "alpha", "gamma", "beta")
    val arr = new GenericArrayData(
      toks.map(UTF8String.fromString).toArray[Any])
    def tokenHash(t: String): Long = {
      val b = t.getBytes("UTF-8")
      ShingleHashing.hashRange(b, 0, b.length)
    }
    val B = 0x100000001b3L
    for (n <- 1 to 5) {
      val got = WindowHashUtil.hashes(arr, n).toLongArray().toSeq
      val want = (0 to toks.length - n).map { p =>
        toks.slice(p, p + n).foldLeft(0L)((h, t) => h * B + tokenHash(t))
      }
      assert(got == want, s"n=$n")
    }
    assert(WindowHashUtil.hashes(arr, 6).numElements() == 0)
    // equal windows hash equal; the fixture's distinct windows differ here
    val h2 = WindowHashUtil.hashes(arr, 2).toLongArray()
    assert(h2.length == 4 && h2.toSet.size == 4)
    val rep = new GenericArrayData(
      Seq("x", "y", "x", "y").map(UTF8String.fromString).toArray[Any])
    val hr = WindowHashUtil.hashes(rep, 2).toLongArray()
    assert(hr(0) == hr(2) && hr(0) != hr(1))
    // a null token hashes as empty rather than crashing
    val withNull = new GenericArrayData(
      Array[Any](UTF8String.fromString("a"), null, UTF8String.fromString("a")))
    assert(WindowHashUtil.hashes(withNull, 2).numElements() == 2)
  }

  test("prefix-hash combine is bit-identical to the rolling kernel at every (pos, m)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.WindowHashUtil
    val rnd = new scala.util.Random(31)
    val vocab = Vector("alpha", "beta", "gamma", "δélta", "e", "", "x y")
    for (trial <- 1 to 20) {
      val toks = Seq.fill(1 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size)))
      val arr = new GenericArrayData(
        toks.map(UTF8String.fromString).toArray[Any])
      val pre = WindowHashUtil.prefixHashes(arr)
      assert(pre.numElements() == toks.length + 1 && pre.getLong(0) == 0L)
      for (m <- 1 to toks.length) {
        val rolling = WindowHashUtil.hashes(arr, m).toLongArray()
        for (p0 <- rolling.indices) // p0 0-based; combine takes 1-based pos
          assert(WindowHashUtil.combine(pre, p0 + 1, m) == rolling(p0),
            s"trial $trial m=$m pos=${p0 + 1}")
      }
    }
    // the SQL surface agrees with the JVM spelling (incl. inside a lambda)
    val df = Seq((1L, Seq("a", "b", "a", "b", "c"))).toDF("doc_id", "tokens")
      .selectExpr("doc_id", "tokens",
        "graft_prefix_hashes(tokens) AS pre",
        "graft_window_hashes(tokens, 2) AS h2")
      .selectExpr("transform(sequence(1, 4), p -> " +
        "graft_prefix_window_hash(pre, CAST(p AS BIGINT), 2L) = h2[p - 1]) AS ok")
      .selectExpr("forall(ok, x -> x) AS all_ok")
    assert(df.head().getBoolean(0))
  }

  test("prefix-hash combine refuses out-of-range windows by name; long probes stay exact") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.WindowHashUtil
    val arr = new GenericArrayData(
      Seq("a", "b", "c", "d").map(UTF8String.fromString).toArray[Any])
    val pre = WindowHashUtil.prefixHashes(arr)
    // graft_prefix_window_hash is catalog-registered, so user SQL reaches
    // combine with arbitrary (pos, m): out-of-bounds must raise a NAMED
    // error, never read past the UnsafeArrayData buffer
    for ((p, m) <- Seq((0L, 2L), (1L, 0L), (4L, 2L), (1L, 5L), (-1L, 1L),
        (1L, Long.MaxValue), (Long.MaxValue, 1L),
        (Long.MaxValue, Long.MaxValue))) { // pos + m wraps — must still refuse
      val e = intercept[IllegalArgumentException](WindowHashUtil.combine(pre, p, m))
      assert(e.getMessage.contains("out of range"), s"(pos=$p, m=$m): ${e.getMessage}")
    }
    val sqlErr = intercept[Exception] {
      Seq(Seq("a", "b")).toDF("tokens")
        .selectExpr("graft_prefix_window_hash(graft_prefix_hashes(tokens), 2L, 9L) AS h")
        .collect()
    }
    assert(sqlErr.getMessage != null)
    // boundary windows are legal: full doc and last single token
    assert(WindowHashUtil.combine(pre, 1L, 4L) ==
      WindowHashUtil.hashes(arr, 4).toLongArray()(0))
    assert(WindowHashUtil.combine(pre, 4L, 1L) ==
      WindowHashUtil.hashes(arr, 1).toLongArray()(3))
    // past the 1024-entry B-power table the fallback is square-and-multiply
    // — still bit-identical to the rolling kernel at m > 1024
    val rnd = new scala.util.Random(47)
    val big = new GenericArrayData(Seq.fill(1100)(
      UTF8String.fromString(s"t${rnd.nextInt(7)}")).toArray[Any])
    val preBig = WindowHashUtil.prefixHashes(big)
    for (m <- Seq(1025, 1100)) {
      val rolling = WindowHashUtil.hashes(big, m).toLongArray()
      assert(WindowHashUtil.combine(preBig, 1L, m.toLong) == rolling(0))
      assert(WindowHashUtil.combine(preBig, (1100 - m + 1).toLong, m.toLong) ==
        rolling(1100 - m))
    }
  }
}
