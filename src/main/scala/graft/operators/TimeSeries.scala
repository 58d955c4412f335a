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

  /** [[resample]]'s linear-interpolation sibling: one row per (key, tick)
    * with the value LINEARLY interpolated between the surrounding
    * observations instead of held flat —
    * `v = prev + (next − prev) · (tick − t_prev)/(t_next − t_prev)`
    * in epoch-microsecond time. A tick coinciding with an observation
    * reproduces it exactly (the ratio is 0); a tick after the last
    * observation holds the last value (trailing hold); one before the
    * first backfills from the next (leading backfill); a key with no
    * non-null observation yields null. The arithmetic is one fixed-shape
    * IEEE-double expression over exact integer microsecond differences —
    * deterministic, and bit-reproducible by any engine evaluating the
    * same expression (the catalog face is hash-gated on it).
    *
    * Scale shape: does NOT run [[AsOf.join]] twice (two shuffles). Both
    * neighbors ride ONE union + ONE exchange/sort on the key — the as-of
    * union trick with two frames over the same window ordering: a
    * backward `last(ignoreNulls)` carries the at-or-before observation,
    * a forward `first(ignoreNulls)` over the following frame carries the
    * strictly-after one (observation rows sort before grid rows at equal
    * instants, which is what makes the backward carry inclusive and the
    * forward one exclusive — no double-count of an exact hit).
    */
  def interpolate(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, ordCol: String, step: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val obs = df.filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol), col(tsCol))
      .agg(max_by(col(valueCol), col(ordCol)).cast("double").as(valueCol))
    val grid = df.groupBy(col(keyCol))
      .agg(min(col(tsCol)).as("__lo"), max(col(tsCol)).as("__hi"))
      .select(col(keyCol), explode(sequence(col("__lo"), col("__hi"), step)).as("tick"))

    val payloadT = "struct<v:double,tu:bigint>"
    val l = grid.select(col(keyCol).as("__k"), col("tick").as("__t"),
      lit(1).as("__side"), lit(null).cast(payloadT).as("__r"))
    val r = obs.select(col(keyCol).as("__k"), col(tsCol).as("__t"),
      lit(0).as("__side"),
      struct(col(valueCol).as("v"), unix_micros(col(tsCol)).as("tu")).as("__r"))
      .filter(col("__k").isNotNull && col("__t").isNotNull)
    val order = Seq(col("__t"), col("__side"))
    val wb = Window.partitionBy(col("__k")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col("__k")).orderBy(order: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = l.unionByName(r)
      .withColumn("__prev", last(col("__r"), ignoreNulls = true).over(wb))
      .withColumn("__next", first(col("__r"), ignoreNulls = true).over(wf))
      .filter(col("__side") === 1)
    val tickUs = unix_micros(col("__t"))
    val v = when(col("__prev").isNull, col("__next.v"))
      .when(col("__next").isNull, col("__prev.v"))
      .otherwise(col("__prev.v") + (col("__next.v") - col("__prev.v")) *
        ((tickUs - col("__prev.tu")).cast("double") /
          (col("__next.tu") - col("__prev.tu")).cast("double")))
    carried.select(col("__k").as(keyCol), col("__t").as("tick"), v.as(valueCol))
  }
}
