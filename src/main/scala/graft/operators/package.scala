package graft

import org.apache.spark.sql.DataFrame

package object operators {

  /** Sugar for [[operators.CacheScope.persist]]: an operator-internal
    * MEMORY_AND_DISK persist that a surrounding [[operators.CacheScope]]
    * releases on exit (plain persist when no scope is active). */
  private[graft] implicit class GraftPersistable(private val df: DataFrame)
      extends AnyVal {
    def scopedPersist(): DataFrame = CacheScope.persist(df)
  }
}
