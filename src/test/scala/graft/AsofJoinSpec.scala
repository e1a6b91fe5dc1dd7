package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Relational

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("asof join matches each left row to the latest right at-or-before it") {
    val left = Seq(
      (100L, 1L, ts(0)),  // before any order → dropped (inner)
      (101L, 1L, ts(1)),  // exactly at order A → inclusive match
      (102L, 1L, ts(3)),  // between A and B → A
      (103L, 1L, ts(6)),  // after B → B
      (104L, 2L, ts(6)),  // other key, no orders → dropped
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, ts(1), 10L, 11.0),
      (1L, ts(5), 20L, 22.0),
    ).toDF("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")

    val got = Relational.asofJoin(left, right, "user_id", "o_custkey", "ts", "o_orderdate",
        Seq("o_orderkey", "o_totalprice"))
      .select(col("event_id"), col("_m.o_orderkey"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(101L -> 10L, 102L -> 10L, 103L -> 20L))
  }

  test("equal-time right rows resolve to the greatest payload struct") {
    val left = Seq((1L, 1L, ts(2))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, ts(1), 7L, 1.0),
      (1L, ts(1), 9L, 2.0), // same time, larger key → wins
    ).toDF("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    val got = Relational.asofJoin(left, right, "user_id", "o_custkey", "ts", "o_orderdate",
        Seq("o_orderkey", "o_totalprice"))
      .select(col("_m.o_orderkey")).as[Long].head()
    assert(got == 9L)
  }
}
