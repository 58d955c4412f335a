package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
// Serializable: funnelStages' state function closes over this object
// (foldFunnel), and the closure ships to executors with the stateful plan
object EventStreams extends Serializable {

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
    require(Set("inner", "left_outer", "full_outer").contains(joinType),
      s"intervalJoin: joinType must be inner, left_outer or full_outer, got $joinType")
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

  /** One funnel event after step projection: `evt` is the WATERMARKED
    * timestamp column (it must survive into the stateful operator for the
    * event-time timeout to be legal); `ts` is the same instant in epoch
    * MICROSECONDS (matching the batch catalog face's engine-portable
    * comparisons). */
  private[streaming] case class FunnelEv(user: Long, step: Int,
      evt: java.sql.Timestamp, ts: Long)

  /** A buffered (not yet watermark-sealed) event — state keeps only the
    * narrow (step, ts) pair. */
  private[streaming] case class BufEv(step: Int, ts: Long)

  /** Per-user streaming-funnel state: the greedy DP times (element i =
    * tᵢ, null while unreached — the EXACT [[graft.operators.Funnel.stages]]
    * chain) plus the out-of-order buffer of not-yet-sealed events. */
  private[streaming] case class FunnelSt(
      times: Seq[Option[Long]], buf: Seq[BufEv])

  /** Emitted row: latest watermark-FINAL stage times for the user. */
  private[streaming] case class FunnelOut(user: Long, times: Seq[Option[Long]])

  /** The greedy funnel DP folded over time-sorted SEALED events —
    * byte-identical logic to the batch operator's partition pass
    * (`Funnel.stages`): a step-j event advances the chain iff stage j−1
    * is reached, j is not, ts is strictly after t(j−1), and the optional
    * conversion window from t₀ holds. Equal timestamps fold step-ascending
    * (the batch sort order). */
  private[streaming] def foldFunnel(t: Array[Option[Long]],
      sealedEvs: Seq[BufEv], within: Option[Long]): Unit =
    sealedEvs.sortBy(e => (e.ts, e.step)).foreach { e =>
      if (e.step == 0) { if (t(0).isEmpty) t(0) = Some(e.ts) }
      else if (t(e.step - 1).nonEmpty && t(e.step).isEmpty &&
        e.ts > t(e.step - 1).get &&
        within.forall(w => e.ts - t(0).get <= w)) t(e.step) = Some(e.ts)
    }

  /** Streaming funnel — [[graft.operators.Funnel.stages]] maintained
    * incrementally over an event stream (the Kafka Streams processor-API
    * use case: per-user ordered-sequence state the DSL can't express).
    *
    * THE correctness problem is arrival order: the greedy DP is only
    * right when events fold in EVENT-TIME order, and streams deliver
    * processing-time order (a view arriving one batch after the click it
    * precedes would silently lose the conversion if folded on arrival —
    * the failure mode EventStreamsSpec pins). So events are folded only
    * once the watermark SEALS them: each user's state holds the O(k) DP
    * times plus a buffer of still-unsealed events; every trigger (and
    * every watermark-advance timeout) moves newly-sealed events out of
    * the buffer in (ts, step) order into the DP. Emitted rows are
    * therefore watermark-final (never retracted) — the same emission
    * contract as the append-mode session windows, and the reason output
    * equals the batch operator on the same events (spec-locked, including
    * the out-of-order trap above).
    *
    * Scale: ONE exchange on user into the state store (the same shape as
    * the batch operator's single repartition); state per user = k times +
    * the events inside the watermark horizon — O(user's in-flight events),
    * evicted as the watermark advances, never the history. Late events
    * past the watermark are dropped by the engine before they reach the
    * state (standard lateness contract).
    *
    * @param events streaming DataFrame with `userCol` (long), `typeCol`
    *   (string), `tsCol` (timestamp)
    * @param within optional conversion window in MICROSECONDS from t₀
    *   (same unit the batch catalog face uses)
    * @return update-mode stream of (user, t0 … t{n−1}) epoch-microsecond
    *   columns, null while unreached; a user appears once they have any
    *   sealed step event (t0 possibly still null — e.g. a sealed click
    *   before any view) */
  def funnelStages(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", watermarkDelay: String = "10 minutes",
      within: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, s"duplicate steps: $steps")
    val n = steps.size
    val idx = element_at(typedLit(steps.zipWithIndex.toMap), col(typeCol))
    implicit val evEnc = Encoders.product[FunnelEv]
    implicit val stEnc = Encoders.product[FunnelSt]
    implicit val outEnc = Encoders.product[FunnelOut]
    implicit val longEnc = Encoders.scalaLong
    // Order matters twice here: the watermark must be declared on a
    // column that SURVIVES into the stateful operator (project first —
    // watermarking the raw input and then projecting it away fails
    // analysis), and the step filter must sit DOWNSTREAM of the watermark
    // node — non-funnel events still advance event time (a stream whose
    // recent traffic is all non-step events must still seal and emit;
    // filtering first would freeze the watermark at the last step event).
    // The predicate deliberately references the watermark column: the
    // optimizer pushes watermark-column-free conjuncts BELOW the
    // EventTimeWatermark node (PushPredicateThroughNonJoin), which would
    // silently re-create the frozen-watermark bug the ordering avoids —
    // `when(evt.isNotNull, step).isNotNull` is step.isNotNull ∧
    // evt.isNotNull in one unpushable conjunct (spec-locked by the
    // watermark-advance-by-noise scenarios).
    val evs = events
      .select(col(userCol).cast("long").as("user"), idx.as("step"),
        col(tsCol).as("evt"), unix_micros(col(tsCol)).as("ts"))
      .withWatermark("evt", watermarkDelay)
      .filter(when(col("evt").isNotNull, col("step")).isNotNull)
      .as[FunnelEv]

    def advance(user: Long, incoming: Iterator[FunnelEv],
        state: GroupState[FunnelSt]): Iterator[FunnelOut] = {
      val st = state.getOption.getOrElse(
        FunnelSt(Seq.fill(n)(None), Seq.empty))
      // watermark is ms; events are micros. Seal strictly BELOW the
      // watermark boundary — an event AT the watermark could still gain
      // equal-ts siblings (engine drops only ts < watermark).
      val wmMicros = state.getCurrentWatermarkMs() * 1000L
      val all = st.buf ++ incoming.map(e => BufEv(e.step, e.ts))
      val (sealedEvs, pending) = all.partition(_.ts < wmMicros)
      val t = st.times.toArray
      foldFunnel(t, sealedEvs, within)
      state.update(FunnelSt(t.toSeq, pending))
      // wake on the watermark passing the earliest pending event so its
      // seal doesn't wait for the user's next activity
      if (pending.nonEmpty)
        state.setTimeoutTimestamp(pending.map(_.ts).min / 1000L + 1L)
      if (sealedEvs.nonEmpty) Iterator(FunnelOut(user, t.toSeq))
      else Iterator.empty
    }

    evs.groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.EventTimeTimeout())(advance)
      .select((col("user").as(userCol) +:
        (0 until n).map(i => col("times")(i).as(s"t$i"))): _*)
  }
}
