package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.functions._

/** Parallelism helpers shared by expansion-heavy operators. */
object Scaling {

  /** Join-key skew report — the diagnostic an engineer reads BEFORE
    * reaching for [[saltedJoin]] or trusting AQE: per hot key its row
    * count and share of the table, plus the table-wide skew ratio
    * (hottest key ÷ mean rows per key). One narrow (key, count)
    * aggregate with map-side partials and a `TakeOrderedAndProject`
    * top-k; the two scalar totals ride along as a broadcast one-row
    * frame — no driver action, corpus-size-independent output.
    *
    * Reading it: share ≈ 1/partitions for the top key means one reducer
    * owns that key's whole row set — AQE can split oversized partitions
    * but never a single monster key; that is [[saltedJoin]] territory. */
  def skewReport(df: DataFrame, keyCol: String, topK: Int = 20): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("n_rows"))
    val totals = counts.agg(
      sum("n_rows").as("total_rows"), count(lit(1)).as("n_keys"),
      max("n_rows").as("max_rows"))
    Tfidf.topKByValue(
      counts.crossJoin(broadcast(totals))
        .select(col("key"), col("n_rows"),
          round(col("n_rows").cast("double") / col("total_rows"), 9).as("share"),
          round(col("max_rows").cast("double") /
            (col("total_rows").cast("double") / col("n_keys")), 9).as("skew_ratio")),
      "n_rows", topK, Seq("key"))
  }

  /** Skew-salted inner equi-join: the build side is replicated `salts`
    * times, the probe side is deterministically salted by row hash, so one
    * hot key's rows spread over `salts` reducers instead of one. Result
    * equals `probe.join(build, keys)` exactly.
    *
    * Use only when AQE's skew-join splitting is insufficient (it splits
    * oversized partitions, but a single monster KEY within one partition
    * can't be split without salting). Cost: `salts`× the build side — keep
    * the build side the smaller input. */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String], salts: Int): DataFrame = {
    // salt = hash of the WHOLE probe row (not monotonically_increasing_id,
    // which is retry-unstable: a recomputed map task could re-salt a row
    // differently and a reducer would see it twice or not at all). Fully
    // duplicate rows share a salt — correct, just less spread for them.
    val probeSalted = probe.withColumn("_salt",
      pmod(xxhash64(probe.columns.toIndexedSeq.map(probe.col): _*), lit(salts.toLong)))
    val buildReplicated = build.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    probeSalted.join(buildReplicated, keys :+ "_salt").drop("_salt")
  }

  /** Ensure at least the session's default parallelism ahead of a high
    * fan-out stage (tokenize ≈ ×50 rows, shingle ≈ ×500). A small or
    * single-row-group file scans as 1-2 partitions, which would run the
    * whole expansion single-threaded; the fix — one cheap shuffle of the
    * compact pre-expansion rows — is equally valid on a cluster whenever
    * scan splits ≪ cores (tiny-file corpora, coalesced AQE output). When
    * the scan is already parallel enough this is a no-op (no shuffle). */
  def fanOut(df: DataFrame, byCol: String = "doc_id"): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    // estimate scan parallelism from file-size metadata on the ANALYZED plan
    // (df.rdd would force full physical planning — and file listing — per
    // call, planning every downstream query twice and hiding the stage from
    // AQE). Unknown leaf types estimate 0 → repartition, the safe default.
    val maxBytes = spark.sessionState.conf.filesMaxPartitionBytes
    val analyzed = df.queryExecution.analyzed
    // an explicit repartition upstream already fixed the parallelism
    val repartitioned = analyzed.collect {
      case r: logical.Repartition => r.numPartitions.toLong
      case r: logical.RepartitionByExpression =>
        r.optNumPartitions.map(_.toLong)
          .getOrElse(spark.sessionState.conf.numShufflePartitions.toLong)
    }
    val estSplits =
      if (repartitioned.nonEmpty) repartitioned.max
      else analyzed.collectLeaves().map {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          math.max(1L, (l.relation.sizeInBytes.toDouble / maxBytes).ceil.toLong)
        case r: logical.Range => r.numSlices.map(_.toLong).getOrElse(target.toLong)
        case rdd: org.apache.spark.sql.execution.LogicalRDD =>
          rdd.rdd.getNumPartitions.toLong // already-materialized RDD: no planning
        case _ => 0L // unknown leaf: assume narrow → repartition (safe default)
      }.sum
    // hash-partition on the id column: round-robin would force Spark's
    // retry-safe sort-before-repartition over the full text payload
    if (estSplits < target) df.repartition(target, df.col(byCol)) else df
  }
}
