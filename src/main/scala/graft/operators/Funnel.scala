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
  * Scale shape: one narrow type-filter per step feeds a per-user min
  * aggregate (partial map-side combine — the shuffle carries one (user,
  * ts) pair per partition, never event lists), joined back per stage.
  * The alternative single-pass form — `sort_array(collect_list(...))` per
  * user and a scan — assembles every user's full event history in one
  * task, exactly the hot-key straggler the rest of this repo avoids;
  * k − 1 narrow joins on the shrinking reached-set are the better trade
  * (each stage's input is ≤ the previous stage's users). Timestamps are
  * compared as-is: pass an epoch-numeric column for engine-portable
  * comparisons (the catalog entry uses microseconds).
  */
object Funnel {

  /** Per-user stage times: (userCol, t0 … t{n-1}), tᵢ null when stage i
    * was not reached. Users with no step-0 event are absent. */
  def stages(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, s"duplicate steps: $steps")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t0"))
    steps.zipWithIndex.drop(1).foldLeft(first) { case (acc, (step, i)) =>
      val next = events.filter(col(typeCol) === step)
        .join(acc.select(col(userCol), col(s"t${i - 1}")), Seq(userCol))
        .filter(col(tsCol) > col(s"t${i - 1}"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"t$i"))
      // right join keeps users stuck at earlier stages (their tᵢ is null)
      next.join(acc, Seq(userCol), "right")
    }
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
    * over [[stages]] unpivoted with `stack` — no extra shuffle. */
  def conversionCounts(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    val st = stages(events, steps, userCol, typeCol, tsCol)
    val aggs = steps.indices.map(i =>
      sum(when(col(s"t$i").isNotNull, 1L).otherwise(0L)).as(s"n$i"))
    val stackArgs = steps.zipWithIndex
      .map { case (s, i) => s"$i, '$s', n$i" }.mkString(", ")
    st.agg(aggs.head, aggs.tail: _*)
      .select(expr(
        s"stack(${steps.size}, $stackArgs) AS (stage, step, n_users)"))
      .orderBy(col("stage"))
  }
}
