package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream windowed joins — the Structured Streaming build of Kafka
  * Streams' `KStream.join(KStream, JoinWindows)` family (the reference
  * framework's stream-stream operator class; the reference app itself only
  * uses the stream-table form, `WeatherHotelsApp.java:144-151`, covered by
  * [[WeatherStreams.enrichStream]]).
  *
  * Mapping from Kafka Streams mechanics:
  *  - `JoinWindows.of(Δ)`            → a time-range residual on the join
  *    condition: `r.ts ∈ [l.ts − before, l.ts + after]`
  *  - windowed join state stores     → the symmetric hash join's keyed
  *    state, one store per side
  *  - stream time + grace period     → `withWatermark` on BOTH inputs: rows
  *    older than the watermark are dropped at the source and — the part
  *    that matters at scale — buffered join state falls out of the store
  *    the moment the watermark passes the range bound, so state is
  *    O(rows per key per window), never O(history)
  *  - left join's "no match within window" late emission → Spark's
  *    left-outer stream-stream join emits the null-padded row only once
  *    the watermark proves no match can still arrive — same observable
  *    contract, micro-batch-coalesced like every emission here
  *
  * 100 TB story: both sides shuffle ONCE on the equi-key (the time range is
  * a residual predicate, not part of the exchange), so per-batch cost is
  * O(batch) rows hashed into co-located state; the range bound is what
  * makes the state bounded and the watermark is what makes Spark enforce
  * that bound. Without the equi-key a stream-stream join would be a
  * broadcast-nested-loop over state — refuse that shape rather than ship
  * it (same stance as the batch `q_range_join`'s equi-prefix note,
  * `CoreQueries.scala:377-380`).
  */
object EventStreams {

  /** Inner or left-outer stream-stream join of `left` and `right` on
    * `leftKey == rightKey` with `right.tsR ∈ [left.tsL − before,
    * left.tsL + after]` (Kafka Streams `JoinWindows` orientation: `before`/
    * `after` are how far the right event may lag/lead the left one).
    *
    * Both inputs are watermarked here — callers pass the raw streams. ALL
    * columns (keys included) must be disjointly named — same pre-renamed
    * contract as the batch interval join (`q_range_join` renames its probe
    * side, `CoreQueries.scala:383-385`); both key columns survive into the
    * output so downstreams can audit which side matched in the outer case.
    *
    * @param watermarkDelay lateness tolerance, both sides (the Kafka
    *   Streams grace period). State eviction horizon = watermark − window
    *   bound; spec-locked in EventStreamsSpec (late rows beyond it do not
    *   join, and a flushed left-outer row is final).
    * @param joinType "inner" (default) or "left_outer" — the two shapes
    *   Kafka Streams' KStream-KStream join offers (right_outer is the
    *   mirrored call; full_outer exists in Spark but has no KS analogue).
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      before: String = "0 seconds", after: String = "1 hour",
      watermarkDelay: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_outer").contains(joinType),
      s"intervalJoin: joinType must be inner or left_outer, got $joinType")
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "intervalJoin: rename the sides apart first — shared column names " +
        s"${left.columns.toSet.intersect(right.columns.toSet).mkString(", ")}")
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    val cond = l(leftKey) === r(rightKey) &&
      r(rightTs) >= l(leftTs) - expr(s"INTERVAL $before") &&
      r(rightTs) <= l(leftTs) + expr(s"INTERVAL $after")
    l.join(r, cond, joinType)
  }
}
