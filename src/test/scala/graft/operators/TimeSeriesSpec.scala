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

  test("interpolate: exact hits, midpoints, trailing hold, leading backfill") {
    val obs = Seq(
      ("a", ts("2020-01-01 10:00:00"), Some(1.0), 1L),
      ("a", ts("2020-01-01 12:00:00"), Some(3.0), 2L),
      // null reading at 08:00 extends the grid below the first real obs
      ("a", ts("2020-01-01 08:00:00"), None, 3L),
      // null reading at 14:00 extends it above the last real obs
      ("a", ts("2020-01-01 14:00:00"), None, 4L))
      .toDF("k", "t", "v", "ord")
    val got = TimeSeries.interpolate(obs, "k", "t", "v", "ord",
      expr("interval 1 hour"))
      .orderBy($"tick")
      .select(date_format($"tick", "HH:mm").as("hm"), $"v")
      .as[(String, Option[Double])].collect().toSeq
    assert(got == Seq(
      ("08:00", Some(1.0)), ("09:00", Some(1.0)),  // leading backfill
      ("10:00", Some(1.0)),                        // exact hit
      ("11:00", Some(2.0)),                        // midpoint of 1 and 3
      ("12:00", Some(3.0)),                        // exact hit
      ("13:00", Some(3.0)), ("14:00", Some(3.0)))) // trailing hold
  }

  test("interpolate: all-null key yields null values; ratio is time-weighted") {
    val obs = Seq(
      ("n", ts("2020-01-01 00:00:00"), None: Option[Double], 1L),
      ("n", ts("2020-01-02 00:00:00"), None: Option[Double], 2L),
      ("w", ts("2020-01-01 00:00:00"), Some(0.0), 3L),
      ("w", ts("2020-01-05 00:00:00"), Some(4.0), 4L))
      .toDF("k", "t", "v", "ord")
    val got = TimeSeries.interpolate(obs, "k", "t", "v", "ord",
      expr("interval 1 day"))
      .select($"k", date_format($"tick", "MM-dd").as("d"), $"v")
      .as[(String, String, Option[Double])].collect()
    assert(got.filter(_._1 == "n").forall(_._3.isEmpty))
    val w = got.filter(_._1 == "w").map(r => r._2 -> r._3.get).toMap
    // 1 unit per day: the 25%/50%/75% points of the [0,4] span
    assert(w == Map("01-01" -> 0.0, "01-02" -> 1.0, "01-03" -> 2.0,
      "01-04" -> 3.0, "01-05" -> 4.0))
  }

  test("interpolate: deterministic across partitionings, ties by ordinal") {
    val obs = (1L to 300L).map { i =>
      ("k", ts(f"2020-01-01 ${i % 24}%02d:00:00"), Some(i.toDouble), i)
    }
    val a = TimeSeries.interpolate(obs.toDF("k", "t", "v", "ord").repartition(1),
      "k", "t", "v", "ord", expr("interval 1 hour"))
      .select($"tick", $"v").as[(java.sql.Timestamp, Double)].collect().toSet
    val b = TimeSeries.interpolate(obs.toDF("k", "t", "v", "ord").repartition(17),
      "k", "t", "v", "ord", expr("interval 1 hour"))
      .select($"tick", $"v").as[(java.sql.Timestamp, Double)].collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
