package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("sessions split exactly at gaps greater than the threshold") {
    val events = Seq(
      ("u1", 1L, ts("2020-01-01 10:00:00")),
      ("u1", 2L, ts("2020-01-01 10:10:00")), // 10 min → same session
      ("u1", 3L, ts("2020-01-01 10:40:00")), // exactly 30 min → same (strict >)
      ("u1", 4L, ts("2020-01-01 11:20:00")), // 40 min → NEW session
      ("u2", 5L, ts("2020-01-01 09:00:00"))
    ).toDF("user_id", "event_id", "ts")

    val sess = Sessionize.sessions(events, "user_id", "ts", "event_id",
      gap = lit(30L * 60L * 1000000L))
      .select($"user_id", $"session_id", $"n_events")
      .as[(String, Long, Long)].collect().toSet
    assert(sess == Set(("u1", 0L, 3L), ("u1", 1L, 1L), ("u2", 0L, 1L)))
  }

  test("assignDynamic: per-event gaps drive the break; an early long-gap event holds the session open") {
    // gap: type 'a' tolerates 60 min idle, type 'b' only 5. Event 2 (type
    // b at 10:10) would CLOSE after 10:15, but event 1's 60-min window
    // (type a at 10:00) still covers 10:30 — the running-max-end rule
    // keeps event 3 in session 0. Event 4 arrives past everyone's end.
    val events = Seq(
      ("u1", 1L, "a", ts("2020-01-01 10:00:00")),
      ("u1", 2L, "b", ts("2020-01-01 10:10:00")),
      ("u1", 3L, "b", ts("2020-01-01 10:30:00")), // past b's end, inside a's
      ("u1", 4L, "b", ts("2020-01-01 11:30:00"))  // past 10:00+60 too → NEW
    ).toDF("user_id", "event_id", "event_type", "ts")
    val gap = when($"event_type" === "a", lit(3600L * 1000000L))
      .otherwise(lit(300L * 1000000L))
    val got = Sessionize.assignDynamic(events, "user_id", "ts", "event_id", gap)
      .select($"event_id", $"session_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L), s"$got")
  }

  test("assignDynamic with a constant gap reduces exactly to assign (property)") {
    val rnd = new scala.util.Random(11)
    val events = (0 until 300).map { i =>
      (s"u${i % 7}", i.toLong,
        new java.sql.Timestamp(1577872800000L + rnd.nextInt(86400) * 1000L))
    }.toDF("user_id", "event_id", "ts")
    val g = 1800L * 1000000L
    val a = Sessionize.assign(events, "user_id", "ts", "event_id", lit(g))
      .select($"event_id", $"session_id").as[(Long, Long)].collect().toMap
    val b = Sessionize.assignDynamic(events, "user_id", "ts", "event_id", lit(g))
      .select($"event_id", $"session_id").as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("assign: session ids are contiguous, 0-based, time-ordered per key") {
    val events = (0 until 20).map(i =>
      ("u", i.toLong, ts(f"2020-01-01 ${i / 5}%02d:00:00"))) // hourly gaps every 5
      .toDF("user_id", "event_id", "ts")
    val ids = Sessionize.assign(events, "user_id", "ts", "event_id",
      gap = lit(30L * 60L * 1000000L))
      .orderBy($"event_id").select($"session_id").as[Long].collect().toSeq
    assert(ids == (0 until 20).map(i => (i / 5).toLong))
  }
}
