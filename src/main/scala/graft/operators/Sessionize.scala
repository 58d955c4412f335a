package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the batch form of Structured Streaming's
  * `session_window` (which covers the streaming side; SURVEY §2.9 lists
  * session windows as an extension beyond the reference surface).
  *
  * Classic two-pass window formulation, one shuffle on the key:
  * session-start flag = (gap to previous event > threshold), session id =
  * running sum of flags. Timestamps compare as epoch microseconds so the
  * arithmetic is integer (engine-portable) and the plan stays codegen'd.
  */
object Sessionize {

  /** Assign `session_id` (0-based per key, by time order) to every row. */
  def assign(events: DataFrame, keyCol: String, tsCol: String, ordCol: String,
      gap: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(ordCol))
    val us = unix_micros(col(tsCol))
    val prev = lag(us, 1).over(w)
    val isNew = when(prev.isNull || (us - prev) > gap, 1L).otherwise(0L)
    events.withColumn("session_id",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1L)
  }

  /** Per-session summary: bounds and event count. */
  def sessions(events: DataFrame, keyCol: String, tsCol: String, ordCol: String,
      gap: Column): DataFrame =
    assign(events, keyCol, tsCol, ordCol, gap)
      .groupBy(col(keyCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))

  /** [[assign]] with a PER-EVENT gap (Spark's dynamic `session_window`
    * semantics, batch form): each event extends its session's close to
    * `ts + gap(event)`, so the session stays open as long as ANY earlier
    * member's window still covers the next event — the running-max-end
    * islands rule, `new session ⟺ ts > max over preceding rows of
    * (ts + gap)`. With a constant gap the running max collapses to
    * `prev_ts + gap` (timestamps are sorted) and this reduces EXACTLY to
    * [[assign]] — property-tested. The canonical use: event types with
    * different idle tolerances (an error burst sessionizes tighter than
    * browsing). Integer epoch-micros arithmetic throughout
    * (engine-portable); one shuffle on the key, the same two-pass window
    * shape as [[assign]]. */
  def assignDynamic(events: DataFrame, keyCol: String, tsCol: String,
      ordCol: String, gapCol: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(ordCol))
    val us = unix_micros(col(tsCol))
    val prevEnd = max(us + gapCol)
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val isNew = when(prevEnd.isNull || us > prevEnd, 1L).otherwise(0L)
    events.withColumn("session_id",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1L)
  }

  /** Per-session summary over [[assignDynamic]]. */
  def sessionsDynamic(events: DataFrame, keyCol: String, tsCol: String,
      ordCol: String, gapCol: Column): DataFrame =
    assignDynamic(events, keyCol, tsCol, ordCol, gapCol)
      .groupBy(col(keyCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))

  /** Streaming sessionization: Spark-native `session_window` (dynamic-gap
    * state merged by the engine) + watermark. Append mode — a session is
    * emitted once the watermark passes its close (start-of-gap + gap), so
    * output rows are final, never updated. State per open session, evicted
    * at emission: O(active sessions), not O(history).
    *
    * Semantics match [[sessions]] on the same data: a session = maximal run
    * of events with inter-event gap ≤ `gap` (session_window extends the
    * window per event and merges overlaps). */
  def stream(events: DataFrame, keyCol: String, tsCol: String,
      gap: String, watermarkDelay: String): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      // session_end = max event time, matching the batch operator —
      // session_window.end is last-event + gap (the close boundary), which
      // would disagree with sessions() by exactly `gap` on every session
      .agg(count(lit(1)).as("n_events"), max(col(tsCol)).as("session_end"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_end"),
        col("n_events"))
}
