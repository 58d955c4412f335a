package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSuite {
  import spark.implicits._

  // (user, type, ts)
  private def log(rows: (Long, String, Long)*) =
    rows.toSeq.toDF("user_id", "event_type", "ts")

  test("ordered progression counts; out-of-order events don't convert") {
    val events = log(
      // u1: full ordered funnel
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // u2: purchase BEFORE view — only stage 0 (and a click after view)
      (2L, "purchase", 5L), (2L, "view", 10L), (2L, "click", 15L),
      // u3: click before view only — stuck at stage 0
      (3L, "click", 5L), (3L, "view", 10L),
      // u4: never views — absent from every stage
      (4L, "click", 1L), (4L, "purchase", 2L))
    val got = Funnel.conversionCounts(events, Seq("view", "click", "purchase"))
      .as[(Int, String, Long)].collect().toSeq
    // u1 converts fully; u2/u3 reach click-after-view but never purchase
    // after it; u4 never views at all
    assert(got == Seq((0, "view", 3L), (1, "click", 2L), (2, "purchase", 1L)),
      s"got $got")
  }

  test("strictly-after semantics: same-timestamp events do not advance") {
    val events = log(
      (1L, "view", 10L), (1L, "click", 10L), // tie: not strictly after
      (2L, "view", 10L), (2L, "click", 11L))
    val got = Funnel.conversionCounts(events, Seq("view", "click"))
      .as[(Int, String, Long)].collect().toSeq
    assert(got == Seq((0, "view", 2L), (1, "click", 1L)), s"got $got")
  }

  test("stage times: earliest qualifying event per stage") {
    val events = log(
      (1L, "view", 10L), (1L, "view", 5L),        // t0 = 5
      (1L, "click", 3L),                           // before t0 → ignored
      (1L, "click", 8L), (1L, "click", 50L))       // t1 = 8
    val st = Funnel.stages(events, Seq("view", "click"))
      .select($"user_id", $"t0", $"t1").as[(Long, Long, Option[Long])]
      .collect().toSeq
    assert(st == Seq((1L, 5L, Some(8L))), s"got $st")
  }

  test("retention: cohort by first week, distinct-active per offset") {
    import java.sql.Timestamp
    // week of 2024-03-04 (Mon); next week 2024-03-11
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      (1L, ts("2024-03-05 10:00:00")), // u1 cohort week0
      (1L, ts("2024-03-06 10:00:00")), // same week — still one active row
      (1L, ts("2024-03-12 10:00:00")), // week1
      (2L, ts("2024-03-07 10:00:00")), // u2 cohort week0, never returns
      (3L, ts("2024-03-13 10:00:00"))  // u3 cohort = NEXT week
    ).toDF("user_id", "ts")
    val got = Funnel.retention(events)
      .select(date_format($"cohort_week", "yyyy-MM-dd").as("w"),
        $"week_offset", $"n_active")
      .as[(String, Int, Long)].collect().toSet
    assert(got == Set(
      ("2024-03-04", 0, 2L),  // u1+u2 in cohort week, both active
      ("2024-03-04", 1, 1L),  // only u1 returns
      ("2024-03-11", 0, 1L)), // u3's own cohort
      s"got $got")
  }

  test("one exchange; no windows, no event-list assembly") {
    val events = log((1L, "view", 1L), (1L, "click", 2L))
    val df = Funnel.stages(events, Seq("view", "click"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("collect_list") && !p.contains("Window"),
      s"funnel must not assemble per-user event lists:\n${p.take(1500)}")
    // string-count (not a tree collect): under AQE the wrapper node hides
    // its children from collect until execution
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges == 1,
      s"stages must plan exactly ONE exchange (got $exchanges):\n${p.take(1500)}")
  }

  test("5-stage funnel: greedy chain matches the sequential-min reference") {
    val steps = Seq("a", "b", "c", "d", "e")
    // u1 converts fully in order; u2 has every type but d's only event
    // precedes its c-time; u3 interleaves with repeats — greedy must pick
    // earliest qualifying each time; u4 only reaches b
    val events = log(
      (1L, "a", 1L), (1L, "b", 2L), (1L, "c", 3L), (1L, "d", 4L), (1L, "e", 5L),
      (2L, "a", 1L), (2L, "b", 2L), (2L, "d", 2L), (2L, "c", 3L), (2L, "e", 9L),
      (3L, "b", 1L), (3L, "a", 2L), (3L, "b", 3L), (3L, "a", 4L), (3L, "c", 4L),
      (3L, "d", 4L), (3L, "c", 5L), (3L, "d", 6L), (3L, "e", 6L), (3L, "e", 7L),
      (4L, "a", 5L), (4L, "b", 6L), (4L, "c", 1L))
    val st = Funnel.stages(events, steps)
      .select($"user_id", $"t0", $"t1", $"t2", $"t3", $"t4")
      .as[(Long, Long, Option[Long], Option[Long], Option[Long], Option[Long])]
      .collect().toSet
    assert(st == Set(
      (1L, 1L, Some(2L), Some(3L), Some(4L), Some(5L)),
      // u2: d@2 is not after c@3 → stuck at c; e never qualifies
      (2L, 1L, Some(2L), Some(3L), None, None),
      // u3: a@2, first b after → b@3, first c after → c@4, d@6 (d@4 ties
      // c@4 — not strictly after), e@7
      (3L, 2L, Some(3L), Some(4L), Some(6L), Some(7L)),
      (4L, 5L, Some(6L), None, None, None)), s"got $st")
    val counts = Funnel.conversionCounts(events, steps)
      .as[(Int, String, Long)].collect().toSeq
    assert(counts == Seq((0, "a", 4L), (1, "b", 4L), (2, "c", 3L),
      (3, "d", 2L), (4, "e", 2L)), s"got $counts")
  }

  test("windowed funnel: window expires stages; greedy t0 is not re-chosen") {
    val events = log(
      (1L, "a", 0L), (1L, "b", 5L),                    // converts in window
      // u2: only b is 25, outside greedy a@0's window — the later a@20
      // would qualify, but windowed-funnel semantics keep the greedy t0
      (2L, "a", 0L), (2L, "a", 20L), (2L, "b", 25L),
      (3L, "a", 0L), (3L, "b", 10L))                   // boundary: 10 ≤ W
    val st = Funnel.stages(events, Seq("a", "b"), within = Some(10L))
      .select($"user_id", $"t0", $"t1").as[(Long, Long, Option[Long])]
      .collect().toSet
    assert(st == Set((1L, 0L, Some(5L)), (2L, 0L, None), (3L, 0L, Some(10L))),
      s"got $st")
    val counts = Funnel.conversionCounts(events, Seq("a", "b"),
      within = Some(10L)).as[(Int, String, Long)].collect().toSeq
    assert(counts == Seq((0, "a", 3L), (1, "b", 2L)), s"got $counts")
    // window math needs an integral ts
    intercept[IllegalArgumentException] {
      Funnel.stages(events.withColumn("ts", $"ts".cast("double")),
        Seq("a", "b"), within = Some(10L))
    }
  }

  test("step names are data: an apostrophe cannot reshape the plan") {
    val events = log((1L, "add'l --x", 1L), (1L, "buy", 2L))
    val got = Funnel.conversionCounts(events, Seq("add'l --x", "buy"))
      .as[(Int, String, Long)].collect().toSeq
    assert(got == Seq((0, "add'l --x", 1L), (1, "buy", 1L)), s"got $got")
  }
}
