package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSuite {
  import spark.implicits._

  private val df = Seq(
    (1L, Some(10.5), Some("b")),
    (2L, Some(-2.0), Some("a")),
    (3L, None, Some("a")),
    (4L, Some(10.5), None)
  ).toDF("id", "score", "tag")

  test("profile: counts, nulls, distinct, typed min/max per column") {
    val got = Profile.profile(df, Seq("id", "score", "tag"))
      .collect().map(r => r.getString(0) -> r).toMap

    val id = got("id")
    assert(id.getLong(1) == 4 && id.getLong(2) == 0 && id.getLong(3) == 4)
    assert(id.getDouble(4) == 1.0 && id.getDouble(5) == 4.0)
    assert(id.isNullAt(6) && id.isNullAt(7))

    val score = got("score")
    assert(score.getLong(1) == 3 && score.getLong(2) == 1)
    assert(score.getLong(3) == 2) // 10.5 appears twice
    assert(score.getDouble(4) == -2.0 && score.getDouble(5) == 10.5)

    val tag = got("tag")
    assert(tag.getLong(1) == 3 && tag.getLong(2) == 1 && tag.getLong(3) == 2)
    assert(tag.isNullAt(4) && tag.isNullAt(5))
    assert(tag.getString(6) == "a" && tag.getString(7) == "b")
  }

  test("profile: approx mode returns plausible distinct counts in one pass") {
    val got = Profile.profile(df, Seq("id", "tag"), exactDistinct = false)
      .select($"column", $"n_distinct").as[(String, Long)].collect().toMap
    // HLL at this cardinality is exact in practice; allow slack anyway
    assert(math.abs(got("id") - 4L) <= 1)
    assert(math.abs(got("tag") - 2L) <= 1)
  }

  test("histogram: exact bins, empty bins emitted, edges closed correctly") {
    // values 0..10 over [0, 10] in 5 bins of width 2: 0,1→b0; 2,3→b1;
    // …; 8,9→b4; AND the closed top edge 10→b4 (the last-bin fold)
    val df = (0 to 10).map(_.toDouble).toDF("v")
    val got = Profile.histogram(df, col("v"), lo = 0.0, hi = 10.0, buckets = 5)
      .orderBy($"bucket")
      .select($"bucket", $"lo_edge", $"hi_edge", $"n")
      .as[(Long, Double, Double, Long)].collect().toSeq
    assert(got.map(_._1) == (0L until 5L))
    assert(got.map(_._4) == Seq(2L, 2L, 2L, 2L, 3L), s"$got")
    assert(got.head == ((0L, 0.0, 2.0, 2L)))
    assert(got.last == ((4L, 8.0, 10.0, 3L)))
    // out-of-range rows dropped; empty bins still present with n = 0
    val sparse = Seq(-5.0, 0.5, 9.5, 99.0).toDF("v")
    val g2 = Profile.histogram(sparse, col("v"), 0.0, 10.0, 5)
      .orderBy($"bucket").select($"bucket", $"n").as[(Long, Long)].collect()
    assert(g2.toSeq == Seq((0L, 1L), (1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L)))
  }

  test("histogramDrift: exact counts and diff numerator, ln lock, identical slices flat") {
    // slice A concentrated low, slice B concentrated high over [0, 10) in
    // 2 bins of width 5
    val df = (Seq.fill(6)(2.0).map((true, _)) ++ Seq.fill(2)(7.0).map((true, _)) ++
      Seq.fill(3)(2.0).map((false, _)) ++ Seq.fill(9)(7.0).map((false, _)))
      .toDF("a", "v")
    val got = Profile.histogramDrift(df, $"a", $"v", 0.0, 10.0, 2)
      .orderBy($"bucket").as[(Long, Long, Long, Long, Long)].collect()
    val (nA, nB) = (8L, 12L)
    assert(got.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((0L, 6L, 3L), (1L, 2L, 9L)))
    got.foreach { case (b, na, nb, diff, scaled) =>
      assert(diff == na * nB - nb * nA, s"diff at $b")
      val ln = math.log((na + 1.0) / (nA + 2.0)) -
        math.log((nb + 1.0) / (nB + 2.0))
      assert(math.round(ln * 1e6) == scaled, s"ln lock at $b")
    }
    // PSI from the exact table is clearly positive for drifted slices
    val psi = got.map(r => r._4.toDouble * r._5 / (nA * nB * 1e6)).sum
    assert(psi > 0.1, s"drifted slices must show PSI > 0.1, got $psi")
    // identical distributions → every diff_num is 0 and PSI is 0
    val same = (Seq.fill(5)(2.0) ++ Seq.fill(5)(7.0)).flatMap(v =>
      Seq((true, v), (false, v))).toDF("a", "v")
    val flat = Profile.histogramDrift(same, $"a", $"v", 0.0, 10.0, 2)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(flat.forall(_._4 == 0L), s"identical slices: $flat")
  }

  test("histogramDrift: a NULL predicate row counts on the B side, not dropped") {
    // the documented NULL rule (isA coalesced to false): an SQL mirror
    // must spell the B filter `a IS DISTINCT FROM true` — `NOT a` would
    // drop the NULL row and the engines would disagree
    val df = Seq((Some(true), 2.0), (Some(false), 2.0),
      (Option.empty[Boolean], 2.0)).toDF("a", "v")
    val got = Profile.histogramDrift(df, $"a", $"v", 0.0, 10.0, 1)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert((got._2, got._3) == ((1L, 2L)),
      s"NULL predicate must land in n_b: $got")
  }

  test("quantilesExact: integer ppm rank rule, duplicates, distributed == local") {
    val df = (1 to 10).map(_.toDouble).toDF("v").repartition(7)
    val got = Profile.quantilesExact(df, $"v",
      Seq(0L, 100000L, 500000L, 1000000L))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(0L) == ((1L, 1.0)))        // ppm 0 clamps to rank 1
    assert(got(100000L) == ((1L, 1.0)))   // ceil(0.1·10) = 1
    assert(got(500000L) == ((5L, 5.0)))   // ceil(0.5·10) = 5
    assert(got(1000000L) == ((10L, 10.0)))
    // duplicate values: the k-th VALUE is unique whatever the tie order
    val dup = Seq(1.0, 2.0, 2.0, 2.0, 9.0).toDF("v").repartition(3)
    val med = Profile.quantilesExact(dup, $"v", Seq(500000L))
      .as[(Long, Long, Double)].head()
    assert(med == ((500000L, 3L, 2.0)))
    // NULLs excluded like any SQL aggregate
    val withNull = Seq(Some(1.0), None, Some(3.0)).toDF("v")
    assert(Profile.quantilesExact(withNull, $"v", Seq(1000000L))
      .as[(Long, Long, Double)].head() == ((1000000L, 2L, 3.0)))
  }

  test("quantilesExact/winsorize edge cases: single row, equal cutoffs, empty input") {
    // single row: every ppm maps to rank 1, the row's own value
    val one = Seq(42.0).toDF("v")
    val qs = Profile.quantilesExact(one, $"v", Seq(0L, 500000L, 1000000L))
      .as[(Long, Long, Double)].collect()
    assert(qs.toSet == Set((0L, 1L, 42.0), (500000L, 1L, 42.0), (1000000L, 1L, 42.0)))
    // ppmLow == ppmHigh: everything clamps to that one exact value
    val df = (1 to 5).map(_.toDouble).toDF("v")
    val pinned = Profile.winsorize(df, $"v", 500000L, 500000L)
      .select($"winsorized").as[Double].collect().toSet
    assert(pinned == Set(3.0))
    // empty / all-NULL input fails loudly, not with a wrong quantile
    intercept[IllegalArgumentException] {
      Profile.quantilesExact(Seq.empty[Double].toDF("v"), $"v", Seq(500000L))
    }
    intercept[IllegalArgumentException] {
      Profile.quantilesExact(Seq(Option.empty[Double]).toDF("v"), $"v", Seq(500000L))
    }
  }

  test("winsorize: exact cutoffs clamp both tails, NULL passes through") {
    val df = ((1 to 10).map(x => Some(x.toDouble)) :+ None).toDF("v")
    val got = Profile.winsorize(df, $"v", ppmLow = 200000L, ppmHigh = 900000L)
      .select($"v", $"winsorized").as[(Option[Double], Option[Double])]
      .collect().toMap
    assert(got(Some(1.0)).contains(2.0))  // low tail clamped up to rank-2 value
    assert(got(Some(10.0)).contains(9.0)) // high tail clamped down to rank-9
    assert(got(Some(5.0)).contains(5.0))  // interior untouched
    assert(got(None).isEmpty, "NULL value must stay NULL")
    // no second shuffle of the data: the cutoffs broadcast
    val p = Profile.winsorize(df, $"v", 200000L, 900000L)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"cutoffs must broadcast:\n${p.take(1500)}")
  }

  test("keySkew: counts, hottest key, deterministic top-k list, no window") {
    import org.apache.spark.sql.functions.col
    val skewed = (Seq.fill(6)("hot") ++ Seq("a", "a", "b")).toDF("k")
    val r = Profile.keySkew(skewed, col("k"), topK = 2).head()
    assert(r.getLong(0) == 9L && r.getLong(1) == 3L && r.getLong(2) == 6L)
    assert(math.abs(r.getDouble(3) - 6.0 / 9.0) < 1e-15)
    assert(r.getString(4) == "hot:6,a:2", s"got ${r.getString(4)}")
    val p = Profile.keySkew(skewed, col("k"), topK = 2)
      .queryExecution.executedPlan.toString
    assert(p.contains("topk_by_ord") && !p.contains("Window"),
      s"top-k must be the bounded heap aggregate:\n${p.take(1200)}")
  }

  test("keySkew: a null hottest key appears in top_keys as <null>") {
    import org.apache.spark.sql.functions.col
    val skewed = (Seq.fill(5)(None: Option[String]) ++
      Seq(Some("a"), Some("a"), Some("b"))).toDF("k")
    val r = Profile.keySkew(skewed, col("k"), topK = 2).head()
    assert(r.getLong(0) == 8L && r.getLong(1) == 3L && r.getLong(2) == 5L)
    assert(math.abs(r.getDouble(3) - 5.0 / 8.0) < 1e-15,
      "top1_share must count the null stratum")
    assert(r.getString(4) == "<null>:5,a:2", s"got ${r.getString(4)}")
  }

  test("profile: single aggregation output is one row per profiled column") {
    val got = Profile.profile(df, Seq("id", "score"))
    assert(got.count() == 2)
    assert(got.columns.toSeq == Seq("column", "n_nonnull", "n_null",
      "n_distinct", "min_num", "max_num", "min_str", "max_str"))
  }

  test("observed: rule counters ride the existing action, rows pass through") {
    val df = Seq((1L, "ok text here", 5), (2L, "", 0), (3L, "short", -1),
      (4L, "fine", 2)).toDF("id", "text", "score")
    val (instrumented, obs) = Profile.observed(df, "gate", Map(
      "nonempty" -> (length($"text") > 0),
      "score_pos" -> ($"score" > 0)))
    // pass-through: same rows, no filtering
    assert(instrumented.count() == 4)
    // metrics were collected by THAT count action — no extra job needed
    val m = obs.get
    assert(m("n_rows") == 4L)
    assert(m("failed_nonempty") == 1L) // id 2
    assert(m("failed_score_pos") == 2L) // ids 2, 3
  }

  test("observed: NULL rule evaluations count as failures, not nothing") {
    // the silent-undercount trap: `length(text) > 0` on a NULL text is
    // NULL, and count(when(!NULL, 1)) would skip the row entirely — the
    // violation counter must treat un-evaluable as failed
    val df = Seq((1L, Option("ok")), (2L, None), (3L, Option("")))
      .toDF("id", "text")
    val (instrumented, obs) = Profile.observed(df, "nullgate", Map(
      "nonempty" -> (length($"text") > 0)))
    assert(instrumented.count() == 3)
    val m = obs.get
    assert(m("n_rows") == 3L)
    assert(m("failed_nonempty") == 2L) // id 2 (NULL rule) AND id 3 (false)
  }

  test("observed: streaming side reads the same counters from QueryProgress") {
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    // same observe call as batch, no Observation handle on a stream: the
    // per-batch metrics surface in StreamingQueryProgress.observedMetrics
    val instrumented = in.toDF().toDF("id", "text")
      .observe("gate", count(lit(1)).as("n_rows"),
        count(when(!(length($"text") > 0), 1)).as("failed_nonempty"))
    val q = instrumented.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .format("memory").queryName("obs_stream")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-obs").toString)
      .start()
    try {
      in.addData((1L, "ok"), (2L, ""), (3L, "also ok"))
      q.processAllAvailable()
      val om = q.lastProgress.observedMetrics
      assert(om.containsKey("gate"), s"observedMetrics: $om")
      val row = om.get("gate")
      assert(row.getAs[Long]("n_rows") == 3L)
      assert(row.getAs[Long]("failed_nonempty") == 1L)
    } finally q.stop()
  }
}
