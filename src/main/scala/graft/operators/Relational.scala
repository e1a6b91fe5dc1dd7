package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Relational surface over the TPC-H-ish fixture tables: joins (broadcast +
  * shuffle, semi/anti), grouped aggregation, ranking windows, set operations,
  * top-k. The reference has NO joins (SURVEY.md §2.1) — these demonstrate the
  * engine's general query capability beyond reference parity.
  *
  * Scale notes:
  *  - Dimension tables (`region`, `nation`, `supplier`, `customer` at
  *    fixture scale) are explicitly `broadcast()` — no shuffle of the fact
  *    side. At 100 TB, `customer` would exceed the broadcast threshold; AQE
  *    then picks a shuffled hash join and its skew-split handles hot keys.
  *  - Fact-fact joins (`orders` ⨝ `lineitem`) shuffle on the join key; both
  *    sides partial-aggregate before the shuffle where possible.
  *  - Money sums go through fixed-scale DECIMAL so results are exact and
  *    order-independent (parallel double summation is neither).
  */
object Relational {

  private def decSum(c: org.apache.spark.sql.Column, scale: Int = 6) =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  /** TPC-H Q3-style: top-10 unshipped-revenue orders for one market segment.
    * Broadcast customer → orders, shuffle join to lineitem, agg, top-k
    * (plans as TakeOrderedAndProject, not a full sort). */
  def q3TopRevenue(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).where(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, dir)
      .where(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") > lit("1996-01-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style: revenue by nation where customer and supplier share the
    * nation. Star-join with all dimensions broadcast. */
  def q5RegionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
      .where(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy("r_name", "n_name")
  }

  /** Ranking window: top-3 orders per customer by total price.
    * `row_number` with a deterministic tiebreak on orderkey. */
  def topOrdersPerCustomer(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rank_in_cust", row_number().over(w))
      .where(col("rank_in_cust") <= k)
      .select("o_custkey", "rank_in_cust", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rank_in_cust")
  }

  /** Heap-aggregate twin of [[topOrdersPerCustomer]]: same result, no
    * ranking window — a bounded top-k buffer per group
    * ([[graft.functions.TopKAgg]]) partial-merges map-side, so the shuffle
    * carries ≤ k rows per (customer, partition) instead of every order.
    * The formulation to prefer when groups are large and k is small. */
  def topOrdersPerCustomerAgg(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val topk = udaf(new graft.functions.TopKAgg(k))
    Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(topk(col("o_totalprice"), col("o_orderkey")).as("top"))
      .select(col("o_custkey"), posexplode(col("top")).as(Seq("i", "kv")))
      .select(col("o_custkey"),
        (col("i") + 1).cast("long").as("rank_in_cust"),
        col("kv._2").as("o_orderkey"),
        col("kv._1").as("o_totalprice"))
      .orderBy("o_custkey", "rank_in_cust")
  }

  /** Anti join: customers that never placed an order. */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")

  /** Semi join + agg: order-priority counts for orders with at least one
    * line shipped after the order date (TPC-H Q4 shape: EXISTS → semi). */
  def orderPriorityCounts(spark: SparkSession, dir: String): DataFrame = {
    val late = Tables.lineitem(spark, dir)
    Tables.orders(spark, dir)
      .join(late,
        col("o_orderkey") === col("l_orderkey") && col("l_shipdate") > col("o_orderdate"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** Set operations: purchase-users vs error-users (EXCEPT / INTERSECT),
    * tagged and unioned into one result. */
  def eventUserSetOps(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def users(t: String) = ev.where(col("event_type") === t).select("user_id").distinct()
    val p = users("purchase")
    val e = users("error")
    p.except(e).withColumn("set_op", lit("purchase_minus_error"))
      .union(p.intersect(e).withColumn("set_op", lit("purchase_and_error")))
      .select("set_op", "user_id")
      .orderBy("set_op", "user_id")
  }

  /** As-of join: for each left row, the latest right row with
    * `rightTime <= leftTime` for the same key (inclusive, like DuckDB's
    * `ASOF JOIN ... ON l.t >= r.t`). Spark has no native as-of join; the
    * composition is union-tag-window: one shuffle by key, one sort, a
    * running `last(payload, ignoreNulls)` — no range-join explosion and no
    * per-key buffering beyond the window frame, so it scales like any
    * window over a bounded key. Ties: right rows sort before left rows at
    * equal time (inclusive match); equal-time right rows resolve by
    * greatest payload struct, so make the FIRST payload column a unique
    * tiebreaker (e.g. a key column). Inner semantics: unmatched left rows
    * are dropped.
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payloadCols: Seq[String]): DataFrame = {
    val payloadType = org.apache.spark.sql.functions.struct(
      payloadCols.map(right(_)): _*)
    val pType = right.select(payloadType.as("_p")).schema("_p").dataType
    // schema alignment in ONE select per side (a withColumn chain re-runs
    // the analyzer per column and plans the query once per fold step)
    val lCols = left.columns.toIndexedSeq
    val l = left.select(lCols.map(col) ++ Seq(
      col(leftKey).as("_k"), col(leftTime).cast("timestamp").as("_t"),
      lit(1).as("_tag"), lit(null).cast(pType).as("_p")): _*)
    val rAligned = right.select(
      lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++ Seq(
        col(rightKey).as("_k"), col(rightTime).cast("timestamp").as("_t"),
        lit(0).as("_tag"), payloadType.as("_p")): _*)
    val w = Window.partitionBy("_k").orderBy(col("_t"), col("_tag"), col("_p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rAligned.unionByName(l)
      .withColumn("_m", last(when(col("_tag") === 0, col("_p")), ignoreNulls = true).over(w))
      .where(col("_tag") === 1 && col("_m").isNotNull)
      .drop("_k", "_t", "_tag", "_p")
  }

  /** Events as-of joined to the user's most recent order (order placed at
    * or before the event). Oracle: DuckDB native `ASOF JOIN`. */
  def eventsAsofOrders(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select("event_id", "user_id", "ts")
    // dedupe equal-time right rows FIRST (greatest orderkey wins): with
    // duplicates, as-of tie-picking is engine-arbitrary — fix the rule on
    // both sides instead of relying on it
    val ord = Tables.orders(spark, dir)
      .groupBy("o_custkey", "o_orderdate")
      .agg(max(struct(col("o_orderkey"), col("o_totalprice"))).as("o"))
      .select(col("o_custkey"), col("o_orderdate"),
        col("o.o_orderkey").as("o_orderkey"), col("o.o_totalprice").as("o_totalprice"))
    asofJoin(ev, ord, "user_id", "o_custkey", "ts", "o_orderdate",
      Seq("o_orderkey", "o_totalprice", "o_orderdate"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"),
        col("_m.o_orderkey").as("m_orderkey"),
        col("_m.o_totalprice").as("m_totalprice"),
        unix_micros(col("_m.o_orderdate").cast("timestamp")).as("order_ts_us"))
      .orderBy("event_id")
  }

  /** JSON column surface: extract a typed field from the `props` JSON
    * string and aggregate on it. `get_json_object` is a codegen'd path
    * expression — no UDF, no full JSON parse into a tree per row. */
  def jsonPropsRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        min("k").as("min_k"), max("k").as("max_k"),
        sum("k").as("sum_k"))
      .orderBy("event_type")

  /** Hierarchical aggregation: ROLLUP over (priority, status) — grouping
    * sets in one pass over the fact table (Expand + single aggregate, not
    * one job per level). */
  def ordersRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .rollup("o_orderpriority", "o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
      .orderBy(asc_nulls_first("o_orderpriority"), asc_nulls_first("o_orderstatus"))

  /** Exact percentiles of event value per type (Spark `percentile` and
    * DuckDB `quantile_cont` share linear interpolation). At 100 TB the
    * engine swaps in `approx_percentile` (t-digest) — exact percentile
    * needs the group's values collected per partition. */
  def valuePercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(expr("percentile(value, array(0.25D, 0.5D, 0.75D))").as("ps"))
      .select(col("event_type"),
        round(element_at(col("ps"), 1), 6).as("p25"),
        round(element_at(col("ps"), 2), 6).as("p50"),
        round(element_at(col("ps"), 3), 6).as("p75"))
      .orderBy("event_type")

  /** Driver-visible accuracy gate for the approximate percentile sketch
    * (THROW contract, like the CMS/HLL gates): per (event_type, p), the
    * RANK the `percentile_approx` answer occupies must overlap the rank
    * window [n·(p−eps), n·(p+eps)] — which is the sketch's ACTUAL
    * guarantee (rank error, not value error). Comparing against
    * value-interpolated exact percentiles instead would false-alarm on
    * small or gappy groups, where the sketch returns a real data value
    * but linear interpolation lands between values. The approx value's
    * rank interval is [count(value < a), count(value ≤ a)] — an interval
    * because of ties — and the gate passes iff it intersects the window.
    * One broadcast of the per-type sketch answers + one conditional-count
    * pass over the events; the per-type rows are the driver-visible
    * artifact. */
  def percentileApproxGate(spark: SparkSession, dir: String,
      eps: Double = 0.01): DataFrame = {
    val ps = Seq(0.25, 0.5, 0.75)
    val approxArr = ps.map(p => s"${p}D").mkString("array(", ", ", ")")
    val approx = Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(expr(s"approx_percentile(value, $approxArr, 10000)").as("approx"))
    val aggCols = ps.zipWithIndex.flatMap { case (p, i) =>
      val tag = (p * 100).toInt
      val a = element_at(col("approx"), i + 1)
      Seq(sum(when(col("value") < a, 1L).otherwise(0L)).as(s"lt$tag"),
        sum(when(col("value") <= a, 1L).otherwise(0L)).as(s"le$tag"),
        first(a).as(s"ap$tag"))
    }
    val checked = Tables.events(spark, dir).select("event_type", "value")
      .join(broadcast(approx), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), aggCols: _*)
      .select((col("event_type") +: col("n") +: ps.flatMap { p =>
        val tag = (p * 100).toInt
        Seq(col(s"ap$tag"),
          (col(s"le$tag").cast("double") >= col("n") * (p - eps) &&
            col(s"lt$tag").cast("double") <= col("n") * (p + eps)).as(s"ok$tag"))
      }): _*)
      .orderBy("event_type")
      .scopedPersist()
    val bad = checked.where(ps.map(p => !col(s"ok${(p * 100).toInt}"))
      .reduce(_ || _)).count()
    require(bad == 0L,
      s"approx_percentile rank outside n*(p±$eps) for $bad event types")
    checked.select(col("event_type") +: ps.map(p =>
      round(col(s"ap${(p * 100).toInt}"), 6).as(s"ap${(p * 100).toInt}")): _*)
  }

  /** Correlated-subquery shape: customers with above-segment-average
    * account balance. Decorrelated as agg + broadcast join — what Catalyst
    * does to the subquery form anyway, written explicitly. */
  def customersAboveSegmentAvg(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val segAvg = cust.groupBy(col("c_mktsegment").as("seg"))
      .agg((sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") / count(lit(1)))
        .as("seg_avg"))
    cust.join(broadcast(segAvg), col("c_mktsegment") === col("seg"))
      .where(col("c_acctbal") > col("seg_avg"))
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        round(col("seg_avg"), 6).as("seg_avg"))
      .orderBy("c_custkey")
  }

  /** Row-frame window: per-user moving sum of the last 3 events (decimal
    * addends → exact, order fixed by (ts, event_id)). */
  def eventsMovingSum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      .rowsBetween(-2, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .withColumn("moving_sum",
        sum(col("value").cast("decimal(18,2)")).over(w).cast("double"))
      .select("user_id", "event_id", "ts_us", "value", "moving_sum")
      .orderBy("user_id", "ts_us", "event_id")
  }

  /** TPC-H Q6 shape: forecast-revenue change — the minimal scan-dominated
    * aggregate. Every predicate (ship-date range, discount band, quantity
    * cap) pushes into the parquet reader, no join, and the single global
    * sum partial-aggregates map-side, so the full-table pass is the only
    * cost at any scale. */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
      .where(col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .where(col("l_discount").between(0.05, 0.07))
      .where(col("l_quantity") < 24)
      .agg(count(lit(1)).as("n_lines"),
        decSum(col("l_extendedprice") * col("l_discount")).as("revenue"))

  /** TPC-H Q10 shape: top returned-item customers by lost revenue in a
    * date window. Fact-fact join (lineitem ⨝ orders) shuffles on the order
    * key with both sides pre-filtered; customer and nation broadcast. */
  def q10ReturnedItems(spark: SparkSession, dir: String, k: Int = 20): DataFrame =
    Tables.lineitem(spark, dir).where(col("l_returnflag") === "R")
      .join(Tables.orders(spark, dir)
          .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
          .where(col("o_orderdate") < lit("1996-07-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(desc("revenue"), asc("c_custkey"))
      .limit(k)

  /** TPC-H Q14 shape: promotion revenue share over a ship-date window —
    * conditional aggregation (sum-CASE) after a broadcast dimension join,
    * one output row. Both sums go through DECIMAL so the share is exact. */
  def q14PromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
      .where(col("l_shipdate") < lit("1996-07-01").cast("timestamp"))
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .agg(
        count(lit(1)).as("n_lines"),
        decSum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))).as("promo_revenue"),
        decSum(rev).as("total_revenue"))
      .select(col("n_lines"), col("promo_revenue"), col("total_revenue"),
        round(lit(100.0) * col("promo_revenue") / col("total_revenue"), 9).as("promo_share"))
  }

  /** TPC-H Q17 shape: revenue lost to small-quantity orders for one brand.
    * The correlated `avg(l_quantity) per part` subquery is decorrelated as
    * an aggregate + equi-join back (what Catalyst produces for the
    * subquery form): the per-part average shuffles once on the part key —
    * never a per-row subquery — and the brand filter broadcasts. */
  def q17SmallQuantityRevenue(spark: SparkSession, dir: String,
      brand: String = "Brand#4"): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    // sum routed through DECIMAL, then ONE double division — exact and
    // identical in both engines regardless of partition merge order
    val partAvg = li.groupBy(col("l_partkey").as("pa_partkey"))
      .agg((sum(col("l_quantity").cast("decimal(18,2)")).cast("double") / count(lit(1)))
        .as("avg_qty"))
    val brandParts = Tables.part(spark, dir)
      .where(col("p_brand") === brand).select("p_partkey")
    li.join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
      .join(partAvg, col("l_partkey") === col("pa_partkey"))
      .where(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double") / lit(7.0), 6)
          .as("avg_yearly"))
  }

  /** TPC-H Q18 shape: large-volume orders — a HAVING-on-fact-aggregate
    * (sum of quantity per order above a floor) joined back to order and
    * customer detail. The quantity rollup shuffles the narrow
    * (orderkey, qty) projection once; survivors are few, so the detail
    * join is cheap at any scale. */
  def q18LargeOrders(spark: SparkSession, dir: String, minQty: Double = 250.0): DataFrame = {
    // fanOut on the rollup key: the quantity rollup is a full-table
    // partial agg over the single-row-group fixture scan (one serial
    // task without the floor), and the l_orderkey spread IS the rollup's
    // own partitioning, so the exchange is reused — measured 1.9 -> 1.3 s
    // cold at sf0.1, no-op at scale.
    val big = Scaling.fanOut(Tables.lineitem(spark, dir), "l_orderkey")
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .where(col("sum_qty") > minQty)
    Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("order_ts_us"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
  }

  /** TPC-H Q19 shape: disjunctive "bracket" predicate over a fact ⨝ dim
    * join — three (brand, size-band, quantity-band) alternatives OR-ed
    * into one filter. Exercises boolean-expression pushdown: the part side
    * prunes to the three brands before broadcast, and the residual OR
    * evaluates post-join in one codegen'd stage. */
  def q19BracketRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .where(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
          col("l_quantity").between(1, 15)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(11, 20) &&
          col("l_quantity").between(10, 25)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(21, 30) &&
          col("l_quantity").between(20, 35)))
      .agg(count(lit(1)).as("n_lines"),
        decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))

  /** TPC-H Q7 shape: shipping volume between two nations by year — the
    * classic two-role dimension join (nation joined TWICE under different
    * roles, supplier side and customer side) with a symmetric pair
    * filter. Both nation copies broadcast; the fact join shuffles once on
    * the order key. */
  def q7VolumeShipping(spark: SparkSession, dir: String,
      nationA: String = "NATION_1", nationB: String = "NATION_2"): DataFrame = {
    val n1 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
      .where(col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .where((col("supp_nation") === nationA && col("cust_nation") === nationB) ||
        (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q8 shape: one supplier nation's market share of revenue within
    * one customer region, per order year — conditional aggregation over a
    * two-role star join, with the share an exact DECIMAL-routed ratio. */
  def q8MarketShare(spark: SparkSession, dir: String,
      targetNation: String = "NATION_3", region: String = "ASIA"): DataFrame = {
    val custNation = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("cn_key"), col("n_regionkey").as("cn_region"))
    val suppNation = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val reg = Tables.region(spark, dir).where(col("r_name") === region)
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(custNation), col("c_nationkey") === col("cn_key"))
      .join(broadcast(reg), col("cn_region") === col("r_regionkey"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        decSum(when(col("supp_nation") === targetNation, rev).otherwise(lit(0.0)))
          .as("nation_revenue"),
        decSum(rev).as("total_revenue"))
      .select(col("o_year"), col("nation_revenue"), col("total_revenue"),
        round(col("nation_revenue") / col("total_revenue"), 9).as("mkt_share"))
      .orderBy("o_year")
  }

  /** TPC-H Q15 shape: the top supplier(s) by quarterly revenue — a
    * fact-side aggregate compared against its own maximum (the scalar-
    * subquery shape, decorrelated as a one-row broadcast + equality on
    * the identical double). Ties all surface, ordered by key. */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
      .where(col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("total_revenue"))
    val best = rev.agg(max("total_revenue").as("best_revenue"))
    rev.crossJoin(broadcast(best))
      .where(col("total_revenue") === col("best_revenue"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q2 shape: min-cost supplier per part with full dimension
    * decoration — the correlated-min-subquery classic. The fixture has no
    * `partsupp`, so the "offer" table is lineitem's quantity-weighted unit
    * price per (part, supplier) (same pair grain as `partsupp`); the
    * correlated `min(ps_supplycost)` decorrelates to ONE lexicographic
    * struct-min aggregate per part (the oracle keeps the equivalent
    * aggregate + join-back spelling Catalyst would produce from the
    * subquery form). Ties on best price resolve to the smallest supplier
    * key (deterministic), then supplier/nation/region decorate via
    * broadcast. */
  def q2MinCostSupplier(spark: SparkSession, dir: String,
      ptype: String = "STANDARD", maxSize: Int = 25, k: Int = 100): DataFrame = {
    val parts = Tables.part(spark, dir)
      .where(col("p_type") === ptype && col("p_size") <= maxSize)
    val perPair = Tables.lineitem(spark, dir)
      .groupBy("l_partkey", "l_suppkey")
      .agg((sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double") /
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")).as("unit_price"))
    // arg-min as ONE struct-min aggregation (lexicographic: lowest price,
    // tie → lowest suppkey) — same answer as the oracle's join-back
    // spelling with one less shuffle and no self-join of the pair table
    perPair
      .groupBy("l_partkey")
      .agg(min(struct(col("unit_price"), col("l_suppkey"))).as("bst"))
      .select(col("l_partkey"), col("bst.l_suppkey").as("best_suppkey"),
        round(col("bst.unit_price"), 9).as("best_price"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(spark, dir)),
        col("best_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"), col("r_name"),
        col("p_partkey"), col("p_name"), col("best_price"))
      .orderBy(desc("s_acctbal"), asc("n_name"), asc("s_name"), asc("p_partkey"))
      .limit(k)
  }

  /** TPC-H Q4 shape: order-priority counts over a quarter, restricted to
    * orders with at least one line shipped after the order date (EXISTS →
    * left-semi; the fixture has no commit/receipt dates, so "late line" is
    * ship-after-order). The semi join probes with the pre-filtered quarter
    * of orders; the date bound is a residual predicate on the equi-join. */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lit("1996-07-01").cast("timestamp"))
      .where(col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
      .join(Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey") && col("l_shipdate") > col("o_orderdate"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")

  /** TPC-H Q9 shape: profit by supplier nation and order year for one part
    * family — the five-way star join with an arithmetic measure. No
    * `partsupp` in the fixture, so unit cost is proxied from the part
    * dimension (0.6 × retail price), keeping the amount = revenue − cost
    * expression shape. Part/supplier/nation broadcast; the one fact-fact
    * join (lineitem ⨝ orders) shuffles on the order key. */
  def q9ProductTypeProfit(spark: SparkSession, dir: String,
      nameContains: String = "red"): DataFrame = {
    val amount = col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
      lit(0.6) * col("p_retailprice") * col("l_quantity")
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)
          .where(col("p_name").contains(nameContains))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(decSum(amount).as("sum_profit"))
      .orderBy(asc("nation"), desc("o_year"))
  }

  /** TPC-H Q11 shape: parts whose stocked value for one nation's suppliers
    * exceeds a fraction of the nation-wide total — per-group aggregate
    * compared against a broadcast scalar of the SAME measure (the
    * HAVING-scalar-subquery form). Value is lineitem revenue (no
    * `partsupp`); the total aggregates the base rows directly (one exact
    * DECIMAL sum), never the per-part doubles, so the threshold is
    * order-independent. */
  def q11ImportantParts(spark: SparkSession, dir: String,
      nation: String = "NATION_1", fraction: Double = 0.001): DataFrame = {
    val nationSupp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir).where(col("n_name") === nation)),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val li = Tables.lineitem(spark, dir)
      .join(broadcast(nationSupp), col("l_suppkey") === col("s_suppkey"), "left_semi")
    val perPart = li.groupBy("l_partkey")
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("value"))
    val threshold = li.agg(
      (sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double") * lit(fraction))
        .as("threshold"))
    perPart.crossJoin(broadcast(threshold))
      .where(col("value") > col("threshold"))
      .select("l_partkey", "value")
      .orderBy(desc("value"), asc("l_partkey"))
  }

  /** TPC-H Q12 shape: high/low-priority line counts per category over a
    * ship-year — join + dual conditional aggregation (sum-CASE twice). The
    * fixture has no ship mode, so lines categorize by return flag. */
  def q12ReturnflagPriority(spark: SparkSession, dir: String): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
      .where(col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("l_returnflag")
  }

  /** TPC-H Q13 shape: the customer order-count distribution — a left outer
    * join with the filter in the JOIN CONDITION (not a WHERE, which would
    * drop order-less customers), then two stacked aggregations. The first
    * groupBy keys on the customer (fine-grained, spreads), the second on
    * the tiny count domain. */
  def q13CustomerOrderDistribution(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir)
          .where(col("o_orderpriority") =!= "4-NOT SPECIFIED"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count")) // count() skips the null-extended rows
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))

  /** TPC-H Q16 shape: distinct-supplier counts per part attribute triple,
    * excluding an attribute value pair and a "complaints" supplier set
    * (NOT IN → left-anti; the stand-in for the comment scan is a negative
    * account balance). The anti join runs BEFORE the distinct count so
    * excluded suppliers never inflate a group. */
  def q16SupplierCounts(spark: SparkSession, dir: String,
      excludeBrand: String = "Brand#1", excludeType: String = "PROMO",
      maxSize: Int = 8): DataFrame = {
    val complainers = Tables.supplier(spark, dir)
      .where(col("s_acctbal") < 0).select("s_suppkey")
    val parts = Tables.part(spark, dir)
      .where(col("p_brand") =!= excludeBrand)
      .where(col("p_type") =!= excludeType)
      .where(col("p_size") <= maxSize)
    Tables.lineitem(spark, dir).select("l_partkey", "l_suppkey")
      .join(broadcast(complainers), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_type"), asc("p_size"))
  }

  /** TPC-H Q20 shape: suppliers of one nation who shipped "excess" volume
    * of one part family in a year — two nested IN subqueries (part-family
    * membership, then a HAVING-grouped supplier set), each a semi join.
    * The grouped subquery aggregates the narrow (supplier, part, qty)
    * projection; survivors are few, so the outer semi join is cheap. */
  def q20ExcessSuppliers(spark: SparkSession, dir: String,
      namePrefix: String = "red", minQty: Double = 40.0,
      nation: String = "NATION_1"): DataFrame = {
    val partFamily = Tables.part(spark, dir)
      .where(col("p_name").startsWith(namePrefix)).select("p_partkey")
    val bigShippers = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
      .where(col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(broadcast(partFamily), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
      .where(col("qty") > minQty)
      .select("l_suppkey")
    Tables.supplier(spark, dir)
      .join(bigShippers, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(Tables.nation(spark, dir).where(col("n_name") === nation)),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_name", "s_acctbal")
      .orderBy("s_name")
  }

  /** TPC-H Q21 shape: suppliers who alone held up multi-supplier orders —
    * the EXISTS + NOT-EXISTS double self-join on the fact table. "Late" is
    * ship > 60 days after order (no receipt/commit dates in the fixture).
    * Both subqueries join on the order key with a supplier-inequality
    * residual: EXISTS(another supplier in the order) as a semi join,
    * NOT EXISTS(another LATE supplier) as an anti join over the same late
    * set. Counts are per waiting ORDER (the late pair table is distinct). */
  def q21SuppliersKeptWaiting(spark: SparkSession, dir: String,
      lateDays: Int = 60, k: Int = 20): DataFrame = {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey", "l_shipdate")
    val late = li
      .join(Tables.orders(spark, dir).where(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .where(col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"))
      .select("l_orderkey", "l_suppkey").distinct()
    val anyOther = li.select(col("l_orderkey").as("o2_key"), col("l_suppkey").as("s2_key"))
    val lateOther = late.select(col("l_orderkey").as("o3_key"), col("l_suppkey").as("s3_key"))
    late
      .join(anyOther,
        col("l_orderkey") === col("o2_key") && col("l_suppkey") =!= col("s2_key"),
        "left_semi")
      .join(lateOther,
        col("l_orderkey") === col("o3_key") && col("l_suppkey") =!= col("s3_key"),
        "left_anti")
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(desc("numwait"), asc("s_name"))
      .limit(k)
  }

  /** TPC-H Q22 shape: well-funded customers with untapped demand, by
    * country — a scalar AVG subquery (positive balances only) gating the
    * customer scan, then a NOT-EXISTS anti join and a tiny final rollup.
    * Fixture adaptations: "country code" is the nation key (no phone
    * column), and the anti join excludes customers with an URGENT order
    * (every fixture customer has SOME order, so the literal no-orders
    * predicate would be vacuously empty — the urgent variant keeps the
    * filtered-anti-join shape with non-trivial survivors). The average
    * routes through one exact DECIMAL sum and ONE double division
    * (order-independent both engines). */
  def q22GlobalSalesOpportunity(spark: SparkSession, dir: String,
      codes: Seq[Int] = Seq(0, 1, 2, 3, 4)): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .where(col("c_nationkey").isin(codes.map(Integer.valueOf): _*))
    val avgBal = cust.where(col("c_acctbal") > 0.0)
      .agg((sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") / count(lit(1)))
        .as("avg_bal"))
    cust.crossJoin(broadcast(avgBal))
      .where(col("c_acctbal") > col("avg_bal"))
      .join(Tables.orders(spark, dir).where(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").cast("long").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("totacctbal"))
      .orderBy("cntrycode")
  }

  /** Explicit GROUPING SETS — the general form ROLLUP/CUBE specialize:
    * per-priority totals, per-status totals, and the grand total in ONE
    * pass (Expand + a single aggregate, not three jobs). The two
    * `grouping()` flags disambiguate "NULL because aggregated away" from a
    * genuine NULL key, spelled per-column for engine parity (grouping_id
    * bit order is engine-specific). */
  def ordersGroupingSets(spark: SparkSession, dir: String): DataFrame =
    // Dataset-API grouping sets (no temp view, no session-state mutation)
    Tables.orders(spark, dir)
      .groupingSets(
        Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus")), Seq()),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(
        grouping(col("o_orderpriority")).cast("long").as("g_priority"),
        grouping(col("o_orderstatus")).cast("long").as("g_status"),
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
      .orderBy("g_priority", "g_status", "o_orderpriority", "o_orderstatus")

  /** Arg-min per group, engine-deterministic: the cheapest supplier of
    * each part by quantity-weighted unit price (total revenue / total
    * units). `min_by`/`arg_min` leave ties engine-arbitrary, so the
    * portable form is a LEXICOGRAPHIC struct-min (price, then suppkey) —
    * deterministic ties, two chained narrow aggregations, no self-join of
    * the pair rollup and no window over a skewable key. The oracle spells
    * the same semantics as min + join-back + min-key.
    *
    * Both sums route through DECIMAL(18,2) — EXACT casts for 2-decimal
    * money and integral quantities (a per-row `price/qty` double cast to
    * decimal instead hits the engines' tie-rounding split: dyadic
    * quotients land exactly on scale-6 ties, which Spark rounds HALF_UP
    * and DuckDB half-even) — then ONE double division. */
  def partMinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val perPair = Tables.lineitem(spark, dir)
      .groupBy("l_partkey", "l_suppkey")
      .agg((sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double") /
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")).as("avg_unit_price"))
    // arg-min as ONE struct-min aggregation (lexicographic: lowest price,
    // tie → lowest suppkey) — the oracle keeps the equivalent join-back
    // spelling; this plan is two chained aggregates, no self-join, no window
    perPair
      .groupBy("l_partkey")
      .agg(min(struct(col("avg_unit_price"), col("l_suppkey"))).as("bst"))
      .select(col("l_partkey"), col("bst.l_suppkey").as("best_suppkey"),
        round(col("bst.avg_unit_price"), 9).as("best_price"))
      .orderBy("l_partkey")
  }

  /** Cumulative-distribution window surface: `cume_dist`, `first_value`,
    * `nth_value` over a total per-status order (price desc, key asc — the
    * unique key kills RANGE-frame peer groups, so every engine agrees). */
  def orderCumeDist(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
        round(cume_dist().over(w), 9).as("cdist"),
        first("o_totalprice").over(w).as("top_price"),
        nth_value(col("o_totalprice"), 3).over(w).as("third_price"))
      .orderBy("o_orderstatus", "cdist", "o_orderkey")
  }

  /** Ordered event funnel — the product-analytics staple: per user, the
    * earliest `view`, the earliest `click` strictly AFTER that view, and
    * the earliest `purchase` strictly after that click (sequential
    * first-occurrence semantics, not mere presence). `stage_reached`
    * counts completed steps; users with no view emit nothing.
    *
    * Scale shape: three per-user min-aggregations chained by inequality
    * joins on the user key — each stage's input is pre-filtered to one
    * event type, every join is a user-key equi-join (the time bound is a
    * residual predicate, not a range-join explosion), and per-user
    * cardinality after stage 1 is ONE row. Micros precision so the
    * DuckDB oracle agrees (parquet nanos truncate there). */
  def eventFunnel(spark: SparkSession, dir: String,
      steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(steps.nonEmpty, "eventFunnel needs at least one step")
    val ev = Tables.events(spark, dir)
      .withColumn("ts_us", expr("ts_ns div 1000"))
    val s1 = ev.where(col("event_type") === steps.head)
      .groupBy("user_id").agg(min("ts_us").as("t1_us"))
    // fold the remaining steps: each adds t{i}_us = earliest occurrence of
    // step i strictly after the previous step's time (users who never
    // reached the previous step carry NULL forward — the join predicate is
    // null-rejecting, so they can't "reach" a later step either)
    val (funnel, tCols) = steps.zipWithIndex.drop(1)
      .foldLeft((s1, Seq("t1_us"))) { case ((prev, cols), (tpe, i)) =>
        val outCol = s"t${i + 1}_us"
        val next = ev.where(col("event_type") === tpe)
          .select(col("user_id").as("u"), col("ts_us"))
          .join(prev, col("u") === col("user_id") && col("ts_us") > col(cols.last))
          .groupBy("user_id").agg(min("ts_us").as(outCol))
        (prev.join(next, Seq("user_id"), "left"), cols :+ outCol)
      }
    val stages = tCols.tail.foldLeft(lit(1L)) { (acc, c) =>
      acc + when(col(c).isNotNull, 1L).otherwise(0L)
    }
    funnel
      .select(col("user_id") +: tCols.map(col) :+ stages.as("stage_reached"): _*)
      .orderBy("user_id")
  }

  /** Cohort retention matrix — users grouped by first-activity day,
    * counted on each subsequent day they were active: (cohort day, days
    * since, active users). The retention triangle a growth dashboard
    * plots; day granularity because the fixture (like most short event
    * windows) spans weeks, not years — only the truncation unit changes
    * for weekly/monthly cohorts.
    *
    * Scale shape: one narrow (user, day) distinct, one per-user min
    * aggregate, a user-key equi-join, and a tiny final group-by (days ×
    * cohorts). */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"), col("ts"))
    val first = ev.groupBy("user_id")
      .agg(date_trunc("day", min("ts")).as("cohort"))
    val active = ev
      .select(col("user_id").as("u"), date_trunc("day", col("ts")).as("d"))
      .distinct()
    active.join(first, col("u") === col("user_id"))
      .groupBy(col("cohort"),
        datediff(col("d"), col("cohort")).cast("long").as("days_since"))
      .agg(countDistinct("u").as("n_active"))
      .select(unix_micros(col("cohort")).as("cohort_us"),
        col("days_since"), col("n_active"))
      .orderBy("cohort_us", "days_since")
  }

  /** Gap-based sessionization of the event stream (batch form): a session
    * breaks after `gapMinutes` of inactivity per user. Windows: `lag` for
    * boundary flags, running sum for session ids — then one aggregate per
    * session. The streaming twin lives in
    * [[graft.streaming.StreamingSessionize]]. Timestamps compared on exact
    * nanos (`ts_ns`), value sums through DECIMAL (exact). */
  def sessionize(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame = {
    // micros, not nanos: DuckDB truncates parquet nano-timestamps to micro
    // precision on read, so the oracle can only agree at micros.
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    Tables.events(spark, dir)
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .withColumn("prev_ts", lag("ts_us", 1).over(byUser))
      .withColumn("is_new", when(col("prev_ts").isNull ||
        col("ts_us") - col("prev_ts") > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq", sum("is_new").over(
        Window.partitionBy("user_id").orderBy("ts_us", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n_events"),
        min("ts_us").as("t_start_us"),
        max("ts_us").as("t_end_us"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy("user_id", "session_seq")
  }
}
