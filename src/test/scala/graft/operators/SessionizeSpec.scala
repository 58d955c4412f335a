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
