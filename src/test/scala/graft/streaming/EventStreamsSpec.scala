package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Stream-stream windowed join semantics (Kafka Streams KStream-KStream
  * join class — JoinWindows matching, grace-period lateness, left join's
  * no-match emission) via MemoryStream micro-batches.
  */
class EventStreamsSpec extends SparkSuite {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def ts(min: Int): Timestamp = new Timestamp(min * 60000L)

  test("inner interval join matches the batch time-range join row-for-row") {
    implicit val sqlCtx = spark.sqlContext
    val errIn = MemoryStream[(Long, Timestamp, String)]
    val actIn = MemoryStream[(Long, Timestamp, String)]
    val errs = errIn.toDF().toDF("err_user", "err_ts", "err_kind")
    val acts = actIn.toDF().toDF("user_id", "ts", "action")
    val q = EventStreams.intervalJoin(errs, acts,
      leftKey = "err_user", rightKey = "user_id",
      leftTs = "err_ts", rightTs = "ts",
      before = "0 seconds", after = "30 minutes",
      watermarkDelay = "5 minutes")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ij_inner")
      .option("checkpointLocation", tmpDir("ckpt-ij"))
      .start()
    try {
      // user 1: error at t=10, actions at t=20 (in window), t=50 (past it),
      // t=5 (before it — JoinWindows before=0 excludes earlier rights);
      // user 2: action at t=15 but no error → inner drops it
      errIn.addData((1L, ts(10), "oom"))
      actIn.addData((1L, ts(20), "retry"), (1L, ts(50), "login"),
        (1L, ts(5), "click"), (2L, ts(15), "login"))
      q.processAllAvailable()
      val got = spark.table("ij_inner")
        .select("err_user", "err_kind", "action").as[(Long, String, String)]
        .collect().toSet
      assert(got == Set((1L, "oom", "retry")))

      // the batch join over the SAME rows and the SAME condition agrees —
      // the stream-stream operator is the batch interval join plus state
      val be = Seq((1L, ts(10), "oom")).toDF("err_user", "err_ts", "err_kind")
      val ba = Seq((1L, ts(20), "retry"), (1L, ts(50), "login"),
        (1L, ts(5), "click"), (2L, ts(15), "login"))
        .toDF("user_id", "ts", "action")
      val batch = be.join(ba,
        col("err_user") === col("user_id") &&
          col("ts") >= col("err_ts") && col("ts") <= col("err_ts") + expr("INTERVAL 30 MINUTES"))
        .select("err_user", "err_kind", "action").as[(Long, String, String)]
        .collect().toSet
      assert(got == batch)

      // plan guard: the equi-key became the symmetric hash join's key —
      // NOT a nested-loop over state (the shape the operator's 100 TB
      // contract rules out); the time range rides as the residual
      val exec = q.asInstanceOf[
          org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan.toString
      assert(exec.contains("StreamingSymmetricHashJoin"), exec.take(2000))
      assert(exec.contains("err_user"), "equi-key missing from the join keys")
    } finally q.stop()
  }

  test("watermark evicts join state: a too-late right row never joins") {
    implicit val sqlCtx = spark.sqlContext
    val errIn = MemoryStream[(Long, Timestamp, String)]
    val actIn = MemoryStream[(Long, Timestamp, String)]
    val q = EventStreams.intervalJoin(
      errIn.toDF().toDF("err_user", "err_ts", "err_kind"),
      actIn.toDF().toDF("user_id", "ts", "action"),
      leftKey = "err_user", rightKey = "user_id",
      leftTs = "err_ts", rightTs = "ts",
      before = "0 seconds", after = "30 minutes",
      watermarkDelay = "5 minutes")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ij_late")
      .option("checkpointLocation", tmpDir("ckpt-ij-late"))
      .start()
    try {
      errIn.addData((1L, ts(10), "oom"))
      actIn.addData((9L, ts(10), "noise"))
      q.processAllAvailable()
      // advance BOTH watermarks far past the error's window: the left
      // row's state (err_ts=10, window end 40, watermark horizon 45) is
      // eviction-eligible everywhere
      errIn.addData((8L, ts(500), "late-err"))
      actIn.addData((9L, ts(500), "noise2"))
      q.processAllAvailable()
      // a matching action arrives NOW but with an in-window event time —
      // it is late beyond the grace period, so it must NOT join (Kafka
      // Streams: past the window's grace, the join state is gone)
      actIn.addData((1L, ts(20), "too-late-retry"))
      q.processAllAvailable()
      assert(spark.table("ij_late").isEmpty)
    } finally q.stop()
  }

  test("left-outer emits the null-padded row once the watermark proves no match") {
    implicit val sqlCtx = spark.sqlContext
    val errIn = MemoryStream[(Long, Timestamp, String)]
    val actIn = MemoryStream[(Long, Timestamp, String)]
    val q = EventStreams.intervalJoin(
      errIn.toDF().toDF("err_user", "err_ts", "err_kind"),
      actIn.toDF().toDF("user_id", "ts", "action"),
      leftKey = "err_user", rightKey = "user_id",
      leftTs = "err_ts", rightTs = "ts",
      before = "0 seconds", after = "30 minutes",
      watermarkDelay = "5 minutes", joinType = "left_outer")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ij_outer")
      .option("checkpointLocation", tmpDir("ckpt-ij-outer"))
      .start()
    try {
      // user 1 error matched in-window; user 3 error never matched
      errIn.addData((1L, ts(10), "oom"), (3L, ts(12), "disk"))
      actIn.addData((1L, ts(20), "retry"))
      q.processAllAvailable()
      // matched row emits immediately; unmatched row must WAIT (a match
      // could still arrive) — the KS left join's timing contract
      val early = spark.table("ij_outer")
        .select("err_user", "action").as[(Long, Option[String])].collect().toSet
      assert(early == Set((1L, Some("retry"))))

      // push the watermark past user 3's window end + delay on both sides
      errIn.addData((8L, ts(500), "wm"))
      actIn.addData((9L, ts(500), "wm"))
      q.processAllAvailable()
      actIn.addData((9L, ts(501), "wm2")) // second batch so the horizon propagates to state
      q.processAllAvailable()
      val fin = spark.table("ij_outer")
        .select("err_user", "action").as[(Long, Option[String])].collect().toSet
      assert(fin == Set((1L, Some("retry")), (3L, None)))
    } finally q.stop()
  }

  test("streaming funnel: watermark sealing rescues the out-of-order conversion") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = EventStreams.funnelStages(
      in.toDF().toDF("user_id", "event_type", "ts"),
      steps = Seq("view", "click"), watermarkDelay = "5 minutes")
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("funnel_ooo")
      .option("checkpointLocation", tmpDir("ckpt-funnel-ooo"))
      .start()
    try {
      // the trap: the click ARRIVES a batch before the view it follows in
      // event time. A fold-on-arrival DP would skip the click (stage 0
      // empty at its processing time) and never converge; the sealed DP
      // must count the conversion.
      in.addData((1L, "click", ts(20)))
      q.processAllAvailable()
      in.addData((1L, "view", ts(18)), (99L, "noise", ts(100)))
      q.processAllAvailable()
      // watermark is now 95; the next batch fires user 1's seal timeout
      in.addData((99L, "noise", ts(101)))
      q.processAllAvailable()
      in.addData((99L, "noise", ts(102)))
      q.processAllAvailable()
      val rows = spark.table("funnel_ooo")
        .filter($"user_id" === 1L)
        .agg(max($"t0"), max($"t1")).as[(Option[Long], Option[Long])].head()
      assert(rows._1.contains(18L * 60000000L), s"t0: $rows")
      assert(rows._2.contains(20L * 60000000L), s"t1: $rows")
    } finally q.stop()
  }

  test("streaming funnel: the event-time timeout seals a silent user's buffer") {
    // the punctuator-analogue claim (SURVEY §2.9): emission must come
    // from the WATERMARK passing the buffered event, never from the
    // user's own next activity. User 1 buffers a partial funnel (one
    // view) and then goes silent except for PRE-watermark noise — which
    // the step filter drops before the state operator, so user 1's group
    // receives no further input rows at all. Only other users' traffic
    // advances event time; the registered event-time timeout must fire
    // and emit user 1's sealed t0.
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = EventStreams.funnelStages(
      in.toDF().toDF("user_id", "event_type", "ts"),
      steps = Seq("view", "click"), watermarkDelay = "5 minutes")
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("funnel_timeout")
      .option("checkpointLocation", tmpDir("ckpt-funnel-timeout"))
      .start()
    try {
      in.addData((1L, "view", ts(10)))
      q.processAllAvailable()
      assert(spark.table("funnel_timeout").filter($"user_id" === 1L).isEmpty,
        "nothing may emit before the watermark seals the view")
      // user 1's ONLY further activity: noise with an already-pre-watermark
      // timestamp (filtered out before the state store — it can neither
      // reach the group nor advance event time past its own staleness);
      // user 99 is what actually moves the watermark to 95
      in.addData((1L, "noise", ts(11)), (99L, "noise", ts(100)))
      q.processAllAvailable()
      // next batches carry NO user-1 rows of any kind: the only way user
      // 1 can emit now is the event-time timeout registered on its state
      in.addData((99L, "noise", ts(101)))
      q.processAllAvailable()
      in.addData((99L, "noise", ts(102)))
      q.processAllAvailable()
      val got = spark.table("funnel_timeout").filter($"user_id" === 1L)
        .agg(max($"t0"), max($"t1")).as[(Option[Long], Option[Long])].head()
      assert(got._1.contains(10L * 60000000L), s"timeout emission missing: $got")
      assert(got._2.isEmpty, s"t1 must stay unreached: $got")
    } finally q.stop()
  }

  test("streaming funnel: multi-batch adversarial feed equals the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq("view", "click", "purchase")
    // deterministic pseudo-random event log: 30 users, events scattered
    // over 100 minutes, fed to the stream in REVERSE time order across
    // batches (max out-of-order pressure), watermark wide enough that
    // nothing is late-dropped mid-feed
    val rnd = new scala.util.Random(42)
    val types = steps ++ Seq("noise")
    val events = (1 to 300).map { _ =>
      (rnd.nextInt(30).toLong + 1L, types(rnd.nextInt(types.size)),
        ts(rnd.nextInt(100) + 1))
    }
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = EventStreams.funnelStages(
      in.toDF().toDF("user_id", "event_type", "ts"),
      steps = steps, watermarkDelay = "2 hours")
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("funnel_par")
      .option("checkpointLocation", tmpDir("ckpt-funnel-par"))
      .start()
    try {
      events.sortBy(-_._3.getTime).grouped(100).foreach { batch =>
        in.addData(batch: _*); q.processAllAvailable()
      }
      // seal everything: sentinel far in the future, extra batches so the
      // advanced watermark reaches the timeout pass
      in.addData((999L, "noise", ts(100000)))
      q.processAllAvailable()
      in.addData((999L, "noise", ts(100001)))
      q.processAllAvailable()
      val got = spark.table("funnel_par").filter($"user_id" =!= 999L)
        .groupBy($"user_id")
        .agg(max($"t0").as("t0"), max($"t1").as("t1"), max($"t2").as("t2"))
        .as[(Long, Option[Long], Option[Long], Option[Long])]
        .collect().filter(_._2.nonEmpty).toSet
      val batchDf = events.toDF("user_id", "event_type", "ts")
        .withColumn("ts", unix_micros($"ts"))
      val want = graft.operators.Funnel.stages(batchDf, steps)
        .as[(Long, Option[Long], Option[Long], Option[Long])]
        .collect().toSet
      assert(got == want,
        s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    } finally q.stop()
  }

  test("inner interval join: randomized multi-batch feed equals the batch join") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(7)
    val lefts = (1 to 60).map(i =>
      (rnd.nextInt(8).toLong + 1L, ts(rnd.nextInt(100) + 1), s"L$i"))
    val rights = (1 to 120).map(i =>
      (rnd.nextInt(8).toLong + 1L, ts(rnd.nextInt(100) + 1), s"R$i"))
    val lIn = MemoryStream[(Long, Timestamp, String)]
    val rIn = MemoryStream[(Long, Timestamp, String)]
    val q = EventStreams.intervalJoin(
      lIn.toDF().toDF("l_user", "l_ts", "l_tag"),
      rIn.toDF().toDF("r_user", "r_ts", "r_tag"),
      leftKey = "l_user", rightKey = "r_user",
      leftTs = "l_ts", rightTs = "r_ts",
      before = "10 minutes", after = "25 minutes",
      watermarkDelay = "2 hours")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ij_fuzz")
      .option("checkpointLocation", tmpDir("ckpt-ij-fuzz"))
      .start()
    try {
      // adversarial interleave: reverse-time batches, sides alternating
      lefts.sortBy(-_._2.getTime).grouped(20).zipAll(
        rights.sortBy(-_._2.getTime).grouped(40), Nil, Nil).foreach {
        case (lb, rb) =>
          if (lb.nonEmpty) lIn.addData(lb: _*)
          if (rb.nonEmpty) rIn.addData(rb: _*)
          q.processAllAvailable()
      }
      val got = spark.table("ij_fuzz").select("l_tag", "r_tag")
        .as[(String, String)].collect().toSet
      val want = lefts.toDF("l_user", "l_ts", "l_tag").join(
        rights.toDF("r_user", "r_ts", "r_tag"),
        col("l_user") === col("r_user") &&
          col("r_ts") >= col("l_ts") - expr("INTERVAL 10 MINUTES") &&
          col("r_ts") <= col("l_ts") + expr("INTERVAL 25 MINUTES"))
        .select("l_tag", "r_tag").as[(String, String)].collect().toSet
      assert(got == want,
        s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    } finally q.stop()
  }

  test("funnel fold: conversion window gates stages, t0 is never re-chosen") {
    import EventStreams.BufEv
    // within = 10: view@5, click@12 (Δ7 ok), purchase@20 (Δ15 too late)
    val t = Array[Option[Long]](None, None, None)
    EventStreams.foldFunnel(t,
      Seq(BufEv(0, 5L), BufEv(1, 12L), BufEv(2, 20L)), within = Some(10L))
    assert(t.toSeq == Seq(Some(5L), Some(12L), None))
    // a later view@15 would put purchase@20 in window, but greedy t0
    // stays at 5 — the standard windowed-funnel semantic
    val t2 = Array[Option[Long]](None, None, None)
    EventStreams.foldFunnel(t2,
      Seq(BufEv(0, 5L), BufEv(0, 15L), BufEv(1, 12L), BufEv(2, 20L)),
      within = Some(10L))
    assert(t2.toSeq == Seq(Some(5L), Some(12L), None))
    // equal-ts events fold step-ascending (the batch sort order): a view
    // and click at the same instant do NOT chain (strict > required)
    val t3 = Array[Option[Long]](None, None, None)
    EventStreams.foldFunnel(t3,
      Seq(BufEv(1, 5L), BufEv(0, 5L), BufEv(1, 6L)), within = None)
    assert(t3.toSeq == Seq(Some(5L), Some(6L), None))
  }

  test("shared column names are refused up front") {
    implicit val sqlCtx = spark.sqlContext
    val a = MemoryStream[(Long, Timestamp)].toDF().toDF("user_id", "ts")
    val b = MemoryStream[(Long, Timestamp)].toDF().toDF("user_id", "ts2")
    val e = intercept[IllegalArgumentException] {
      EventStreams.intervalJoin(a, b, "user_id", "user_id", "ts", "ts2")
    }
    assert(e.getMessage.contains("user_id"))
  }
}
