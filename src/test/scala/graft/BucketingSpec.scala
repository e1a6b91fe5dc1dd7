package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Bucketing: the co-located-join strategy for repeated fact-fact joins at
  * scale — both tables pre-partitioned into the same bucket layout on the
  * join key, so the sort-merge join needs NO shuffle exchange at query
  * time. This is the 100 TB answer to "orders ⋈ lineitem on every query". */
class BucketingSpec extends SparkSpec {

  test("bucketed orders ⋈ lineitem sort-merge-joins without a shuffle") {
    val wh = Files.createTempDirectory("graft_warehouse").toString
    val db = "graft_buckets"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$wh'")
    try {
      val dir = "/root/testdata/sf0.001"
      Tables.orders(spark, dir).write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable(s"$db.orders_b")
      Tables.lineitem(spark, dir).write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable(s"$db.lineitem_b")

      val joined = spark.table(s"$db.orders_b")
        .join(spark.table(s"$db.lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
      // disable broadcast so the join strategy is actually exercised
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        joined.collect()
        // final adaptive plan only (the dump appends the pre-AQE "Initial
        // Plan", whose agg exchange would false-positive the check)
        val plan = joined.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
        assert(plan.contains("SortMergeJoin"), plan.take(1500))
        assert(plan.contains("Bucketed: true"), plan.take(1500))
        // everything below the join (its two scan subtrees) must be
        // exchange-free: the only shuffle allowed is the post-join groupBy
        val joinSubtree = plan.substring(plan.indexOf("SortMergeJoin"))
        assert(!joinSubtree.contains("Exchange hashpartitioning"),
          "bucketed join must not shuffle either side:\n" + joinSubtree.take(2500))
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    } finally spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
  }
}
