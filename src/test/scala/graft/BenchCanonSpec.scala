package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit contract for the plan-fingerprint canonicalizer: every
  * JVM-assigned or data-dependent token must normalize away (two runs of
  * the same code on the same data must hash identically), while plan
  * STRUCTURE — node kinds, join strategies, exchange placement — must
  * survive (a lost broadcast must change the hash). */
class BenchCanonSpec extends AnyFunSuite {

  test("expression ids, plan ids, paths, sizes, and literals normalize away") {
    val a = Bench.canonicalPlan(
      "Exchange hashpartitioning(doc_id#123L, 32), ENSURE_REQUIREMENTS, [plan_id=908]\n" +
        "+- FileScan parquet [term#87,score#93] Batched: true, " +
        "Location: InMemoryFileIndex(1 paths)[file:/tmp/graft_asset_x_abc12...\n" +
        "   Statistics(sizeInBytes=12.3 MiB, rowCount=456)")
    val b = Bench.canonicalPlan(
      "Exchange hashpartitioning(doc_id#999L, 32), ENSURE_REQUIREMENTS, [plan_id=17]\n" +
        "+- FileScan parquet [term#11,score#2] Batched: true, " +
        "Location: InMemoryFileIndex(1 paths)[file:/tmp/graft_asset_x_def98...\n" +
        "   Statistics(sizeInBytes=999.9 GiB, rowCount=1)")
    assert(a == b)
  }

  test("JVM lambda names and identity hashes normalize away") {
    val a = Bench.canonicalPlan(
      "MapPartitions graft.multimodal.Multimodal$$$Lambda$4479/0x00007f1d2fd19ba8@5ccf, obj#423")
    val b = Bench.canonicalPlan(
      "MapPartitions graft.multimodal.Multimodal$$$Lambda$991/0x00007aaa2fc11fa0@91b2, obj#7")
    assert(a == b)
  }

  test("Expand projection order normalizes away; a different projection does not") {
    // RewriteDistinctAggregates permutes Expand projections — including
    // the column SLOTS within each group — by expression-id allocation
    // order: the round-7 flapper mode
    val a = Bench.canonicalPlan(
      "Expand [[l_orderkey#5L, null, 0], [null, l_suppkey#7L, 1]], [key#9L, gid#10]")
    val b = Bench.canonicalPlan(
      "Expand [[null, l_suppkey#7L, 1], [l_orderkey#5L, 0, null]], [gid#10, key#9L]")
    assert(a == b)
    val c = Bench.canonicalPlan(
      "Expand [[l_orderkey#5L, null, 0], [null, l_partkey#7L, 1]], [key#9L, gid#10]")
    assert(a != c)
    // the downstream HashAggregate's permuted key order normalizes too,
    // while a changed function or column still changes the form
    val ha = Bench.canonicalPlan(
      "HashAggregate(keys=[l_returnflag#1, l_partkey#2, l_suppkey#3, gid#4], functions=[count(1)])")
    val hb = Bench.canonicalPlan(
      "HashAggregate(keys=[l_returnflag#1, l_suppkey#3, l_partkey#2, gid#4], functions=[count(1)])")
    assert(ha == hb)
    val hc = Bench.canonicalPlan(
      "HashAggregate(keys=[l_returnflag#1, l_suppkey#3, l_partkey#2, gid#4], functions=[sum(1)])")
    assert(ha != hc)
  }

  test("multi-argument expressions in bracket lists sort as ONE item") {
    // a naive split(", ") tears `corr(a, b)` into fragments whose sorted
    // multiset can collide with a genuinely different function list;
    // depth-aware splitting keeps each call intact
    val items = Bench.splitTopLevel("corr(a#1, b#2), count(1), max(c#3)")
    assert(items == Seq("corr(a#1, b#2)", "count(1)", "max(c#3)"))
    val a = Bench.canonicalPlan(
      "HashAggregate(keys=[k#1], functions=[corr(a#1, b#2), count(1)])")
    val b = Bench.canonicalPlan(
      "HashAggregate(keys=[k#1], functions=[count(1), corr(a#1, b#2)])")
    assert(a == b)
    // the fragment-collision counterexample: same comma tokens, different
    // argument grouping must NOT canonicalize together
    val c = Bench.canonicalPlan(
      "HashAggregate(keys=[k#1], functions=[corr(a#1, c#2), count(b#9)])")
    val d = Bench.canonicalPlan(
      "HashAggregate(keys=[k#1], functions=[corr(a#1, b#9), count(c#2)])")
    assert(c != d)
  }

  test("a truncation cutoff shifted mid-token normalizes away; a real pre-cutoff difference does not") {
    // the r9 flapper: DataFilters truncates at maxMetadataStringLength,
    // and an embedded `[J@<identityHash>` whose hex LENGTH varies per JVM
    // shifts the cutoff — the partial trailing token differed (`is...` vs
    // `isn...`) while the plan was identical
    val a = Bench.canonicalPlan(
      "FileScan parquet [vec_id#1,embedding#2] DataFilters: [(size(graft_rp_project(cast(embedding#2 as array<double>), [J@5ccf3a, 32, 64), false) > 0), is...")
    val b = Bench.canonicalPlan(
      "FileScan parquet [vec_id#1,embedding#2] DataFilters: [(size(graft_rp_project(cast(embedding#2 as array<double>), [J@91b2c4d8, 32, 64), false) > 0), isn...")
    assert(a == b)
    // a difference BEFORE the cutoff must still change the form
    val c = Bench.canonicalPlan(
      "FileScan parquet [vec_id#1,embedding#2] DataFilters: [(size(graft_jl_project(cast(embedding#2 as array<double>), [J@5ccf3a, 32, 64), false) > 0), is...")
    assert(a != c)
  }

  test("structural changes survive: a lost broadcast changes the canonical form") {
    val broadcastJoin = Bench.canonicalPlan(
      "BroadcastHashJoin [term#87], [term#23], Inner, BuildRight, false")
    val mergeJoin = Bench.canonicalPlan(
      "SortMergeJoin [term#87], [term#23], Inner")
    assert(broadcastJoin != mergeJoin)
    val withExchange = Bench.canonicalPlan(
      "Exchange hashpartitioning(q_doc#1L, 32)\n+- HashAggregate(keys=[q_doc#1L])")
    val withoutExchange = Bench.canonicalPlan(
      "HashAggregate(keys=[q_doc#1L])")
    assert(withExchange != withoutExchange)
  }
}
