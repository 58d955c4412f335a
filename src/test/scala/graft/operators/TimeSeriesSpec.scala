package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("resample: hourly grid forward-fills the latest observation") {
    val obs = Seq(
      ("a", ts("2020-01-01 10:00:00"), 1.0, 1L),
      ("a", ts("2020-01-01 12:30:00"), 2.0, 2L),
      ("a", ts("2020-01-01 14:00:00"), 3.0, 3L))
      .toDF("k", "t", "v", "ord")
    val got = TimeSeries.resample(obs, "k", "t", "v", "ord",
      expr("interval 1 hour"))
      .orderBy($"tick")
      .select(date_format($"tick", "HH:mm").as("hm"), $"v")
      .as[(String, Double)].collect().toSeq
    // grid: 10:00..14:00 hourly; 12:30 obs fills from the 13:00 tick on
    assert(got == Seq(
      ("10:00", 1.0), ("11:00", 1.0), ("12:00", 1.0),
      ("13:00", 2.0), ("14:00", 3.0)))
  }

  test("resample: instant ties resolve to the highest ordinal") {
    val obs = Seq(
      ("a", ts("2020-01-01 10:00:00"), 5.0, 1L),
      ("a", ts("2020-01-01 10:00:00"), 7.0, 2L))  // same instant, later ord
      .toDF("k", "t", "v", "ord")
    val got = TimeSeries.resample(obs, "k", "t", "v", "ord",
      expr("interval 1 hour"))
      .select($"v").as[Double].collect().toSeq
    assert(got == Seq(7.0))
  }

  test("resample: null observations are skipped, not forward-filled") {
    val obs = Seq(
      ("a", ts("2020-01-01 10:00:00"), Some(1.0), 1L),
      ("a", ts("2020-01-01 11:00:00"), None, 2L),       // null reading
      ("a", ts("2020-01-01 12:00:00"), Some(3.0), 3L))
      .toDF("k", "t", "v", "ord")
    val got = TimeSeries.resample(obs, "k", "t", "v", "ord",
      expr("interval 1 hour"))
      .orderBy($"tick")
      .select(date_format($"tick", "HH:mm").as("hm"), $"v")
      .as[(String, Option[Double])].collect().toSeq
    // the 11:00 tick carries the 10:00 value — a null reading never
    // overwrites the last real observation (but it still extends the grid)
    assert(got == Seq(
      ("10:00", Some(1.0)), ("11:00", Some(1.0)), ("12:00", Some(3.0))))
  }

  test("resample: keys are independent, every tick filled") {
    val obs = Seq(
      ("a", ts("2020-01-01 00:00:00"), 1.0, 1L),
      ("a", ts("2020-01-03 00:00:00"), 2.0, 2L),
      ("b", ts("2020-02-01 00:00:00"), 9.0, 3L))
      .toDF("k", "t", "v", "ord")
    val got = TimeSeries.resample(obs, "k", "t", "v", "ord",
      expr("interval 1 day"))
      .select($"k", $"v").as[(String, Double)].collect()
    assert(got.count(_._1 == "a") == 3) // Jan 1, 2, 3
    assert(got.count(_._1 == "b") == 1)
    assert(got.forall(_._2 > 0), "forward fill always finds a value")
  }
}
