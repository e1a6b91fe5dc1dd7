package graft

import org.apache.spark.sql.DataFrame

package object operators {

  /** Sugar for [[operators.CacheScope.persist]]: an operator-internal
    * MEMORY_AND_DISK persist that a surrounding [[operators.CacheScope]]
    * releases on exit (plain persist when no scope is active). */
  private[graft] implicit class GraftPersistable(private val df: DataFrame)
      extends AnyVal {
    def scopedPersist(): DataFrame = CacheScope.persist(df)

    /** Persist + LINEAGE-CUT without a synchronous materialize (the
      * cascade-merge diet pattern): `p.rdd` compiles the physical plan but
      * runs NO job, so the wrapped frame renders as a tiny `LogicalRDD` in
      * every downstream plan — a multi-stage composite otherwise embeds
      * each stage's full tree once per reference, and the rendered text
      * alone becomes driver-side planning drag (r13: the incremental
      * manifest rendered ~679 exchanges). The cache is populated by
      * whichever downstream job touches it first. DETERMINISTIC frames
      * only: concurrent first readers may compute a partition twice, so a
      * nondeterministic id would fork. */
    def lazyPinned(): DataFrame = {
      val p = CacheScope.persist(df)
      df.sparkSession.createDataFrame(p.rdd, p.schema)
    }
  }
}
