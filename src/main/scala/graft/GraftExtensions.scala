package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, I8Dot, I8Encode, MinHashSignature, ShingleHashes, SigAgreement, SignBits, SquaredDistance, TrimNonAlpha}

/** Engine extensions installed via `SparkSession.builder.withExtensions`
  * (or `spark.sql.extensions=graft.GraftExtensions`): registers the
  * engine's native expressions with the function registry so they are
  * callable from SQL and `call_function`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.CollapseNormalize)
    ext.injectFunction((
      FunctionIdentifier("graft_normalize"),
      new ExpressionInfo(classOf[TrimNonAlpha].getName, "graft_normalize"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_normalize takes exactly one argument")
        TrimNonAlpha.normalized(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_dot takes exactly two arguments")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_sig_match"),
      new ExpressionInfo(classOf[SigAgreement].getName, "graft_sig_match"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_sig_match takes exactly two arguments")
        SigAgreement(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_i8_encode"),
      new ExpressionInfo(classOf[I8Encode].getName, "graft_i8_encode"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_i8_encode takes (vector, scale)")
        I8Encode(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_i8_dot"),
      new ExpressionInfo(classOf[I8Dot].getName, "graft_i8_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_i8_dot takes (codes, codes)")
        I8Dot(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_sqdist"),
      new ExpressionInfo(classOf[SquaredDistance].getName, "graft_sqdist"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_sqdist takes exactly two arguments")
        SquaredDistance(children.head, children(1))
      }))
    // table-valued surface: LATERAL VIEW graft_shingle_hashes(text, n)
    ext.injectFunction((
      FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_hashes"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_shingle_hashes takes (text, n)")
        ShingleHashes(children.head, foldableInt(children(1), "n"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_sign_bits"),
      new ExpressionInfo(classOf[SignBits].getName, "graft_sign_bits"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_sign_bits takes (vector, planes)")
        SignBits(children.head, foldableInt(children(1), "planes"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "graft_minhash takes (text, n, k)")
        MinHashSignature(children.head,
          foldableInt(children(1), "n"), foldableInt(children(2), "k"))
      }))
    // Spark ships Bloom-filter aggregate/probe expressions for its runtime
    // join filters but does NOT register them in the public function
    // registry — surface them under graft names for the decontamination
    // prefilter (value side must be a LONG, e.g. xxhash64(gram))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_bloom_agg takes (long_value, estimated_items)")
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_bloom_contains"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_bloom_contains takes (bloom, long_value)")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_text_stats"),
      new ExpressionInfo(classOf[graft.functions.TextSurfaceStats].getName,
        "graft_text_stats"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_text_stats takes exactly one argument")
        graft.functions.TextSurfaceStats(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_window_hashes"),
      new ExpressionInfo(classOf[graft.functions.WindowHashes].getName,
        "graft_window_hashes"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_window_hashes takes (tokens, n)")
        graft.functions.WindowHashes(children.head, foldableInt(children(1), "n"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_prefix_hashes"),
      new ExpressionInfo(classOf[graft.functions.PrefixHashes].getName,
        "graft_prefix_hashes"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_prefix_hashes takes (tokens)")
        graft.functions.PrefixHashes(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_prefix_window_hash"),
      new ExpressionInfo(classOf[graft.functions.PrefixWindowHash].getName,
        "graft_prefix_window_hash"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          "graft_prefix_window_hash takes (prefix_hashes, pos, m)")
        graft.functions.PrefixWindowHash(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_deflate_len"),
      new ExpressionInfo(classOf[graft.functions.DeflateLen].getName, "graft_deflate_len"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_deflate_len takes (text, level)")
        graft.functions.DeflateLen(children.head, foldableInt(children(1), "level"))
      }))
  }

  /** Evaluate a foldable argument to an Int at resolution time (the shingle
    * and signature lengths are plan constants, not per-row data). */
  private def foldableInt(e: Expression, name: String): Int = {
    require(e.foldable, s"graft function argument '$name' must be a literal")
    e.eval().asInstanceOf[Number].intValue()
  }
}
