package graft

import org.apache.spark.sql.functions.col

/** The r15 refresh-impact audit family (paragraph keepers, exact-substr
  * indexes, BM25 postings, ANN/IVF stores): registry-level rule pins on
  * the sf0.001 fixture (values are DuckDB-oracle-pinned at sf0.01+), plus
  * CONSTRUCTED fixtures that force each family's invalidation path — the
  * tiny fixture can leave `n_invalidated` at 0, and a comparison branch
  * that never fires is a comparison branch that was never tested. */
class RefreshImpactSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def rows(name: String, dir: String): Seq[(String, Long, Long, Long)] =
    SparkEntry.queries(name)(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSeq

  private def tmpFixture(): String =
    java.nio.file.Files.createTempDirectory("graft_refresh_fixture")
      .toFile.getAbsolutePath

  test("paragraph_refresh_impact: first-arrived keepers never rebuild-due") {
    val got = rows("paragraph_refresh_impact", sf)
    assert(got.map(_._1) == Seq("keepers_delim", "keepers_fixed"))
    // keeperships are immutable by rule; the invalidated count is DRIFT
    // from a corpus-min rebuild, never a due flag
    assert(got.forall(_._4 == 0L))
    // the batch brings genuinely new paragraph content on this fixture
    assert(got.forall(_._2 > 0L))
  }

  test("paragraph keeper drift: an earlier-keyed batch occurrence invalidates the stored keeper") {
    val dir = tmpFixture()
    // old docs 0 and 10; batch doc 9 repeats doc 10's (single-paragraph)
    // content with a SMALLER doc_id -> corpus-min rebuild would re-elect,
    // first-arrived store reports exactly one drifted keeper per cut
    Seq(
      (0L, "src0", "totally novel starter content here"),
      (10L, "src0", "alpha beta gamma shared paragraph body"),
      (9L, "src9", "alpha beta gamma shared paragraph body"))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = rows("paragraph_refresh_impact", dir)
    // nothing new (the batch content is stored), one invalidated, never due
    assert(got == Seq(
      ("keepers_delim", 0L, 1L, 0L),
      ("keepers_fixed", 0L, 1L, 0L)))
  }

  test("exact_substr_refresh_impact: rebuild-exact merges never flag due") {
    val got = rows("exact_substr_refresh_impact", sf)
    assert(got.map(_._1) == Seq("base_index", "cascade_l24"))
    assert(got.forall(_._4 == 0L))
  }

  test("exact-substr audit: batch twin grows occ, shifts canon, flips a unique old window") {
    val dir = tmpFixture()
    val g1 = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    val g2 = "mike november oscar papa quebec romeo sierra tango uniform victor whiskey xray"
    // old: G1 duplicated (docs 10, 20), G2 unique (doc 30);
    // batch doc 9 = G1 ++ G2: adds a third G1 occurrence (stored rows'
    // occ 2 -> 3 AND canon moves to (9,1) < (10,1)), flips doc 30's
    // unique G2 window to duplicated, and contributes two new rows of
    // its own. No 24-gram is duplicated anywhere -> empty l24 stage.
    Seq(
      (10L, "src0", g1), (20L, "src0", g1), (30L, "src0", g2),
      (9L, "src9", s"$g1 $g2"))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = rows("exact_substr_refresh_impact", dir)
    // n_new = (9,1) + (9,13) + flipped (30,1); n_invalidated = stored
    // (10,1) and (20,1), both rewritten (occ grew, canon shifted)
    assert(got == Seq(
      ("base_index", 3L, 2L, 0L),
      ("cascade_l24", 0L, 0L, 0L)))
  }

  test("bm25_refresh_impact: due flags follow the stale-score rules") {
    val got = rows("bm25_refresh_impact", sf)
    assert(got.map(_._1) == Seq("collection_stats", "served_postings"))
    val byStage = got.map(r => r._1 -> r).toMap
    // a non-empty batch stales the one global (N, avgdl) row
    val stats = byStage("collection_stats")
    assert(stats._2 > 0L && stats._3 == 1L && stats._4 == 1L)
    // shared vocabulary means stored postings' df/idf/score are stale
    val postings = byStage("served_postings")
    assert(postings._2 > 0L && postings._3 > 0L)
    assert(postings._4 == (if (postings._3 > 0) 1L else 0L))
  }

  test("ann_refresh_impact: frozen quantizer adds no centroid, assignments append-only") {
    val got = rows("ann_refresh_impact", sf)
    assert(got.map(_._1) == Seq("cell_assignments", "centroids"))
    val byStage = got.map(r => r._1 -> r).toMap
    val assigns = byStage("cell_assignments")
    assert(assigns._2 > 0L && assigns._3 == 0L && assigns._4 == 0L)
    val cents = byStage("centroids")
    assert(cents._2 == 0L)
    assert(cents._4 == (if (cents._3 > 0) 1L else 0L))
  }

  test("ann audit: a batch concentrating on one cell trips the imbalance bound") {
    val dir = tmpFixture()
    // 16 orthogonal one-hot old vectors -> 16 singleton cells (every
    // vector is its own centroid after one Lloyd pass), mean list size 1,
    // cap = ceil(1 * 2) = 2; the batch lands THREE copies on cell 0 ->
    // 1 + 3 = 4 > 2, exactly one cell invalidated, retrain due
    val dim = 16
    def oneHot(k: Int): Array[Double] =
      Array.tabulate(dim)(i => if (i == k) 1.0 else 0.0)
    val oldIds = ((0L to 8L) ++ (10L to 16L)).toSeq // 16 ids, none % 10 == 9
    val vecs = oldIds.zipWithIndex.map { case (id, k) => (id, oneHot(k)) } ++
      Seq(9L, 19L, 29L).map(id => (id, oneHot(0)))
    vecs.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = rows("ann_refresh_impact", dir)
    assert(got == Seq(
      ("cell_assignments", 3L, 0L, 0L),
      ("centroids", 0L, 1L, 1L)))
  }
}
