package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series regularization (SURVEY §2.10 time-series family): align
  * irregular per-key observations onto a fixed-step grid with
  * forward-fill — the standard pre-processing step before windowed
  * feature extraction or similarity search over series.
  *
  * Composition, not new machinery: per-key bounds (one agg) → grid
  * explode (`sequence(lo, hi, step)`, narrow) → [[AsOf.join]] carries the
  * latest observation at-or-before each tick. Scale shape is the as-of
  * join's: ONE shuffle on the key for the union, one in-partition sort —
  * never an inequality-join explosion. Grid growth is span/step rows per
  * key; the caller picks `step` accordingly.
  */
object TimeSeries {

  /** One row per (key, tick) for every `step` tick in the key's observed
    * [min ts, max ts]; `valueCol` = the observation at-or-before the tick
    * (ties at one instant resolve to the highest `ordCol` — Kafka-offset
    * semantics, same as [[WeatherOps.latestPerKey]]).
    *
    * Output: `(keyCol, tick TIMESTAMP, valueCol)`; every tick ≥ the first
    * observation, so forward-fill always finds a value. */
  def resample(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, ordCol: String, step: Column): DataFrame = {
    // collapse to one observation per (key, instant) FIRST: as-of ties at
    // an instant are otherwise nondeterministic under parallelism. Null
    // values are dropped BEFORE the collapse — a fill operator carries the
    // latest real observation past a null reading, it does not propagate
    // the null (also keeps max_by, which returns null payloads, in
    // lock-step with the oracle's null-skipping arg_max). Bounds still
    // come from the full input, so null-value rows extend the grid.
    val obs = df.filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol), col(tsCol))
      .agg(max_by(col(valueCol), col(ordCol)).as(valueCol))
    val grid = df.groupBy(col(keyCol))
      .agg(min(col(tsCol)).as("__lo"), max(col(tsCol)).as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"), step)).as("tick"))
    AsOf.join(grid, obs,
      leftKey = col(keyCol), rightKey = col(keyCol),
      leftTime = col("tick"), rightTime = col(tsCol),
      rightPayload = Seq(valueCol),
      rightOrd = unix_micros(col(tsCol)),
      inner = false)
  }
}
