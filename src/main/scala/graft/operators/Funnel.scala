package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered funnel analysis over an event log (SURVEY §2.10 events family):
  * how many users progress through `steps` IN ORDER — the
  * view → click → purchase conversion measurement every product-analytics
  * deployment runs.
  *
  * Semantics: a user reaches stage k iff they have a step-k event STRICTLY
  * after their earliest qualifying time for stage k−1 (t₀ = first step-0
  * event; tₖ = first step-k event with ts > tₖ₋₁). Out-of-order events
  * don't count — a purchase before the first view is not a conversion.
  *
  * Scale shape: ONE exchange. Step events (a narrow (user, step, ts)
  * projection — the type filter and step indexing sit on the scan) hash-
  * partition by user and sort within partitions by (user, ts); a
  * streaming per-partition pass then runs the greedy funnel DP with O(k)
  * state per user — no event list is ever assembled (the sort is Spark's
  * spillable partition sort, not a per-key buffer), and deeper funnels
  * are free. The previous revision planned k − 1 shuffle joins on the
  * shrinking reached-set — k − 1 exchanges of the event log's hot keys;
  * the DP computes the identical greedy chain (t₀ = first step-0 event;
  * tₖ = first step-k event with ts > tₖ₋₁, processed in ascending ts
  * order) in one. Timestamps are compared as-is: pass an epoch-numeric
  * column for engine-portable comparisons (the catalog entry uses
  * microseconds). Events with a null timestamp are ignored.
  */
object Funnel {

  /** Per-user stage times: (userCol, t0 … t{n-1}), tᵢ null when stage i
    * was not reached. Users with no step-0 event are absent.
    *
    * `within`: optional conversion window — stage i ≥ 1 additionally
    * requires `tᵢ − t₀ ≤ within` (units of `tsCol`, which must be an
    * integral column when set; the greedy t₀ is NOT re-chosen if its
    * window expires, the standard windowed-funnel semantic). */
  def stages(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", within: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, s"duplicate steps: $steps")
    require(within.forall(_ > 0), s"within must be positive, got $within")
    val n = steps.size
    // step name → index as a typed literal map lookup: injection-free and
    // one scan-level projection for every step at once
    val idx = element_at(typedLit(steps.zipWithIndex.toMap), col(typeCol))
    val ev = events
      .select(col(userCol).as("__u"), idx.as("__step"), col(tsCol).as("__ts"))
      .filter(col("__step").isNotNull && col("__ts").isNotNull)
    if (within.isDefined) {
      val ok = ev.schema("__ts").dataType match {
        case org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.IntegerType => true
        case _ => false
      }
      require(ok, s"within requires an integral $tsCol (epoch units), " +
        s"got ${ev.schema("__ts").dataType}")
    }
    val parted = ev.repartition(col("__u"))
      .sortWithinPartitions(col("__u"), col("__ts"), col("__step"))
    val outSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField(userCol,
        ev.schema("__u").dataType, nullable = true) +:
        (0 until n).map(i => org.apache.spark.sql.types.StructField(s"t$i",
          ev.schema("__ts").dataType, nullable = true)))
    parted.mapPartitions { it =>
      // greedy DP over one user's time-sorted events: a step-j event at ts
      // advances the chain iff stage j-1 is reached, stage j is not, and
      // ts is STRICTLY after t(j-1) — ascending order makes the first such
      // event the minimum, so this is exactly the sequential-min chain.
      new scala.collection.AbstractIterator[org.apache.spark.sql.Row] {
        private var pending: org.apache.spark.sql.Row =
          if (it.hasNext) it.next() else null
        override def hasNext: Boolean = pending != null
        override def next(): org.apache.spark.sql.Row = {
          val user = pending.get(0)
          val t = new Array[Any](n)
          var r = pending
          while (r != null && java.util.Objects.equals(r.get(0), user)) {
            val j = r.getInt(1)
            val ts = r.get(2)
            if (j == 0) { if (t(0) == null) t(0) = ts }
            else if (t(j - 1) != null && t(j) == null &&
              ts.asInstanceOf[Comparable[Any]].compareTo(t(j - 1)) > 0 &&
              within.forall(w => ts.asInstanceOf[Number].longValue -
                t(0).asInstanceOf[Number].longValue <= w))
              t(j) = ts
            r = if (it.hasNext) it.next() else null
          }
          pending = r
          org.apache.spark.sql.Row.fromSeq(user +: t.toSeq)
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
      .filter(col("t0").isNotNull) // users with no step-0 event are absent
  }

  /** Weekly cohort retention: users grouped by the ISO week of their FIRST
    * event; `n_active` counts distinct cohort members active in each
    * subsequent week. Output: (cohort_week, week_offset, n_active).
    *
    * Scale shape: two per-user aggregates (first-seen, distinct active
    * weeks — both partial-combined, shuffling one narrow row per user per
    * week) and one join on user — never a per-user event list, never a
    * window. Week truncation is ISO-Monday in UTC on both Spark and the
    * SQL engines the result is audited against. */
  def retention(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val firstSeen = events.groupBy(col(userCol))
      .agg(date_trunc("week", min(col(tsCol))).as("cohort_week"))
    val active = events.select(col(userCol),
      date_trunc("week", col(tsCol)).as("active_week")).distinct()
    active.join(firstSeen, Seq(userCol))
      .groupBy(col("cohort_week"),
        (datediff(col("active_week"), col("cohort_week")) / 7).cast("int")
          .as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** Stage-level conversion counts: (stage, step, n_users), one row per
    * step, n_users = users whose tᵢ is non-null. One single-row aggregate
    * over [[stages]] unpivoted by exploding an array of typed literal
    * structs — no extra shuffle, and step names are DATA (a name holding
    * a quote can never reshape the plan, unlike a `stack(...)` SQL
    * string). */
  def conversionCounts(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", within: Option[Long] = None): DataFrame = {
    val st = stages(events, steps, userCol, typeCol, tsCol, within)
    val aggs = steps.indices.map(i =>
      sum(when(col(s"t$i").isNotNull, 1L).otherwise(0L)).as(s"n$i"))
    val rows = array(steps.zipWithIndex.map { case (s, i) =>
      struct(lit(i).as("stage"), lit(s).as("step"),
        col(s"n$i").as("n_users")) }: _*)
    st.agg(aggs.head, aggs.tail: _*)
      .select(explode(rows).as("__e"))
      .select(col("__e.stage"), col("__e.step"), col("__e.n_users"))
      .orderBy(col("stage"))
  }
}
