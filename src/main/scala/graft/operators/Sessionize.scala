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
}
