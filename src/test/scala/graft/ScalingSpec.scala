package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Scaling

class ScalingSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join, including a monster key") {
    val probe = ((1 to 5000).map(i => (7L, s"hot$i")) ++
      (1 to 100).map(i => (i.toLong, s"cold$i"))).toDF("k", "pv")
    val build = Seq((7L, "seven"), (1L, "one"), (999L, "unmatched")).toDF("k", "bv")
    val plain = probe.join(build, Seq("k"))
      .select("k", "pv", "bv").as[(Long, String, String)].collect().sorted.toSeq
    val salted = Scaling.saltedJoin(probe, build, Seq("k"), salts = 8)
      .select("k", "pv", "bv").as[(Long, String, String)].collect().sorted.toSeq
    assert(salted == plain)
    assert(salted.count(_._1 == 7L) == 5001) // 5000 hot rows + "cold7"
  }

  test("skewReport surfaces the monster key with exact share and ratio") {
    // 60 rows on key 7, one row each on 1..4: total 64, 5 keys,
    // mean 12.8, skew_ratio 60/12.8 = 4.6875
    val df = ((1 to 60).map(_ => 7L) ++ (1L to 4L)).toDF("k")
    val got = Scaling.skewReport(df, "k", topK = 3)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got.head == ((7L, 60L, 0.9375, 4.6875)))
    // ties on n_rows = 1 break to key ascending; topK caps the output
    assert(got.map(_._1) == Seq(7L, 1L, 2L))
  }

  test("AQE splits a skewed join partition when thresholds are met") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.coalescePartitions.enabled",
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "20KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // one monster key (~95% of rows, non-constant payload so bytes
      // actually cross the shuffle) vs uniform rest
      val left = spark.range(200000).selectExpr(
        "CASE WHEN id % 20 != 0 THEN 7 ELSE id END AS k",
        "repeat(cast(id AS string), 8) AS pad")
      val right = spark.range(200).selectExpr("id AS k", "id * 2 AS v")
      val joined = left.join(right, "k")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan.take(3000))
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
    }
  }

  test("fanOut is a no-op when the scan is already parallel enough") {
    val wide = spark.range(1000).repartition(8).toDF("doc_id")
    assert(Scaling.fanOut(wide, "doc_id").rdd.getNumPartitions == 8)
  }
}

/** Boundary semantics of the two sessionizers, documented by test: Spark's
  * `session_window` MERGES events exactly `gap` apart (windows
  * `[ts, ts+gap]` touch), matching the lag-based rule `diff > gap` splits.
  * The `streams_sessionize_batch` oracle encodes the same `>` rule — this
  * pins it against regressions that would only surface on exact-gap data. */
class SessionBoundarySpec extends SparkSpec {
  import spark.implicits._

  private def ev(minute: Int) =
    (minute.toLong, Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00"), 1L, "click", 1.0)

  test("both sessionizers merge events exactly gap apart, split just past it") {
    val atGap = Seq(ev(0), ev(30)).toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(graft.streaming.Streams.sessionize(atGap, gapMinutes = 30).count() == 1)
    val pastGap = Seq(ev(0), ev(31)).toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(graft.streaming.Streams.sessionize(pastGap, gapMinutes = 30).count() == 2)

    val gapUs = 30L * 60 * 1000000
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id").orderBy("ts")
    def lagSessions(events: org.apache.spark.sql.DataFrame): Long = events
      .withColumn("prev", lag("ts", 1).over(w))
      .withColumn("new_s", when(col("prev").isNull ||
        unix_micros(col("ts")) - unix_micros(col("prev")) > gapUs, 1).otherwise(0))
      .agg(sum("new_s")).as[Long].head()
    assert(lagSessions(atGap) == 1)
    assert(lagSessions(pastGap) == 2)
  }
}
