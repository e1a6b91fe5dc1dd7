package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism helpers shared by expansion-heavy operators. */
object Scaling {

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
