package graft

import graft.functions.TextFunctions

class OptimizerRuleSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("CollapseNormalize reduces nested graft_normalize to one call") {
    // parquet-backed input: a literal would be constant-folded away entirely
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val df = docs.select(TextFunctions.portableNormalize(
      TextFunctions.portableNormalize(col("text"))).as("x"))
    val optimized = df.queryExecution.optimizedPlan.toString
    val occurrences = "trim_non_alpha".r.findAllIn(optimized).length
    assert(occurrences == 1, optimized)
    assert(df.limit(1).as[String].head().nonEmpty)
  }

  test("collapse preserves semantics for already-normalized input") {
    val inputs = Seq("Hello,", "--a--", "", "...", "猫a猫")
    val once = inputs.toDF("t")
      .select(TextFunctions.portableNormalize(col("t"))).as[String].collect().toSeq
    val twice = inputs.toDF("t")
      .select(TextFunctions.portableNormalize(
        TextFunctions.portableNormalize(col("t")))).as[String].collect().toSeq
    assert(once == twice)
  }
}
