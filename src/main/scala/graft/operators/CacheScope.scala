package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Lifecycle contract for operator-INTERNAL persists.
  *
  * Several operators cache an intermediate frame that feeds multiple
  * consumers inside one returned plan (e.g. [[Dedup.ngramJaccardExact]]'s
  * gram rows feed the DF aggregation, the sizes, and both self-join
  * sides). Those persists are load-bearing — without them Catalyst
  * re-tokenizes the corpus per consumer — but they outlive the query: a
  * long-lived session composing operators would accumulate storage with
  * every call.
  *
  * The contract: operators route internal persists through
  * [[CacheScope.persist]]. Outside any scope that is a plain
  * MEMORY_AND_DISK persist (exactly the old behavior — one-shot drivers
  * like Verify/Bench clear the session cache between queries). Inside
  * `CacheScope { ... }`, every frame an operator persisted is registered
  * and unpersisted when the scope exits, after the caller has drained its
  * action:
  *
  * {{{
  * val clusters = CacheScope {
  *   val pairs = Dedup.ngramJaccardExact(docs)
  *   Dedup.connectedComponents(pairs.select("doc_a", "doc_b")).collect()
  * } // <- gram rows, iteration frames, label cache all released here
  * }}}
  *
  * Scopes nest (inner frames release at the inner exit) and are
  * per-thread: plan construction and the draining action must happen on
  * the scope's thread, which is how both the drivers and a typical
  * notebook session already behave. Frames whose lifetime an operator can
  * bound itself (an internal action already materializes everything) are
  * unpersisted eagerly by that operator instead and never reach a scope.
  */
object CacheScope {

  private val active = new ThreadLocal[java.util.ArrayDeque[DataFrame]]()

  /** Persist `df` (MEMORY_AND_DISK) and, when a scope is active on this
    * thread, register it for release at scope exit. Operators call this
    * instead of `.persist(...)` for caches that live inside the returned
    * plan. */
  private[graft] def persist(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    val frames = active.get()
    if (frames != null) frames.push(df)
    df
  }

  /** Run `body`; unpersist every operator-internal frame persisted on this
    * thread during it (most-recent first), then restore the enclosing
    * scope. Blocking=false: Spark releases the blocks asynchronously. */
  def apply[T](body: => T): T = {
    val outer = active.get()
    val frames = new java.util.ArrayDeque[DataFrame]()
    active.set(frames)
    try body
    finally {
      frames.forEach(_.unpersist(false))
      if (outer == null) active.remove() else active.set(outer)
    }
  }
}
