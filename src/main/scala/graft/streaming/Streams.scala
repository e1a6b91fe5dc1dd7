package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the event stream. Each takes a
  * DataFrame that may be batch (`spark.read`) or streaming
  * (`spark.readStream`) with schema `(event_id, ts timestamp, user_id,
  * event_type, value)` — the transforms are identical in both modes, which
  * is the point: one declarative plan, micro-batch or batch execution.
  *
  * Scale notes: all state here is keyed and bounded — watermarks let the
  * state store evict closed windows/sessions, so state size tracks the
  * number of ACTIVE keys, not stream history. That is the property that
  * survives an unbounded stream on a 1000-executor cluster.
  */
object Streams {

  /** Gap-based sessionization with the built-in `session_window` (the
    * streaming twin of [[graft.operators.Relational.sessionize]]): windows
    * merge while events arrive within `gapMinutes`; the watermark closes
    * sessions `watermark` behind the max seen event time and evicts their
    * state. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("user_id"), col("w.start").as("t_start"), col("w.end").as("t_end"),
        col("n_events"), col("sum_value"))

  /** Tumbling-window event-type counts with late-data handling. */
  def windowedTypeCounts(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))

  /** Stream-static join: enrich a stream with a batch dimension table.
    * The static side is planned per micro-batch (broadcast when small);
    * no state store involved — the scale-friendly way to attach
    * dimensions to an unbounded stream. */
  def enrichWithDim(events: DataFrame, dim: DataFrame, streamKey: String, dimKey: String): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim),
      col(streamKey) === col(dimKey), "left")

  /** Streaming exact dedup: keep the first occurrence of each content
    * fingerprint. With a watermark the dedup state evicts fingerprints
    * older than the horizon — bounded state on an unbounded stream (the
    * batch twin is [[graft.operators.Dedup.exact]]; an unbounded-state
    * variant would OOM exactly like the reference's reducer buffers).
    * Input schema: (doc_id, ts timestamp, text). */
  def streamingDedup(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("fingerprint",
        graft.functions.TextFunctions.contentFingerprint(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fingerprint")

  case class UserEvent(event_id: Long, user_id: Long, event_type: String, value: Double)
  case class UserRunning(user_id: Long, n_events: Long, n_purchases: Long, total_value: Double)

  /** Custom keyed state via `flatMapGroupsWithState`: running per-user
    * counters emitted on every update (Update output — this is an
    * upsert-style aggregate, not an append of immutable rows) — the escape
    * hatch for stateful logic `session_window`/windowed aggs can't express.
    * State per key is O(1), and keys idle past `idleTimeout` are EVICTED via
    * processing-time timeout, so total state tracks recently-active users,
    * not all users ever seen. Trade-off (documented, deliberate): a user
    * returning after eviction restarts from zero; keep lifetime totals in a
    * compacted external sink if they matter. */
  def runningUserStats(events: Dataset[UserEvent],
      idleTimeout: String = "30 minutes"): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.ProcessingTimeTimeout)(
        (userId: Long, batch: Iterator[UserEvent], state: GroupState[UserRunning]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var cur = state.getOption.getOrElse(UserRunning(userId, 0L, 0L, 0.0))
            batch.foreach { e =>
              cur = UserRunning(
                userId,
                cur.n_events + 1,
                cur.n_purchases + (if (e.event_type == "purchase") 1 else 0),
                cur.total_value + e.value)
            }
            state.update(cur)
            state.setTimeoutDuration(idleTimeout)
            Iterator.single(cur)
          }
        })
  }
}
