package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parallelism helpers shared by expansion-heavy operators. */
object Scaling {

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
    val probeSalted = probe.withColumn("_salt",
      pmod(xxhash64(keys.map(probe.col): _*) + monotonically_increasing_id(), lit(salts.toLong)))
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
    val target = df.sparkSession.sparkContext.defaultParallelism
    // hash-partition on the id column: round-robin would force Spark's
    // retry-safe sort-before-repartition over the full text payload
    if (df.rdd.getNumPartitions < target) df.repartition(target, df.col(byCol)) else df
  }
}
