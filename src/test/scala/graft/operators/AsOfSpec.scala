package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val trades = Seq(
    (1L, "A", ts("2020-01-01 10:00:05")),
    (2L, "A", ts("2020-01-01 10:00:10")),
    (3L, "B", ts("2020-01-01 10:00:03")),
    (4L, "C", ts("2020-01-01 10:00:03"))   // no quotes for C
  ).toDF("trade_id", "sym", "t")

  private val quotes = Seq(
    (100L, "A", ts("2020-01-01 10:00:01"), 1.0),
    (101L, "A", ts("2020-01-01 10:00:07"), 2.0),
    (102L, "A", ts("2020-01-01 10:00:11"), 3.0), // after both trades
    (103L, "B", ts("2020-01-01 10:00:03"), 9.0)  // exactly at trade time
  ).toDF("qid", "sym", "qt", "px")

  private def run(inner: Boolean) = AsOf.join(
    trades, quotes,
    leftKey = col("sym"), rightKey = col("sym"),
    leftTime = col("t"), rightTime = col("qt"),
    rightPayload = Seq("qid", "px"), rightOrd = col("qid"), inner = inner)

  test("joinForward: earliest at-or-after; inclusive equal time; inner drops unmatched") {
    val got = AsOf.joinForward(trades, quotes,
      leftKey = col("sym"), rightKey = col("sym"),
      leftTime = col("t"), rightTime = col("qt"),
      rightPayload = Seq("qid", "px"), rightOrd = col("qid"))
      .select($"trade_id", $"qid", $"px").as[(Long, Long, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((101L, 2.0)))  // 10:00:05 → next quote at :07
    assert(got(2L) == ((102L, 3.0)))  // 10:00:10 → quote at :11
    assert(got(3L) == ((103L, 9.0)))  // equal time is inclusive forward too
    assert(!got.contains(4L))
    // left-outer keeps C with null payload
    val outer = AsOf.joinForward(trades, quotes,
      col("sym"), col("sym"), col("t"), col("qt"),
      Seq("qid", "px"), col("qid"), inner = false)
      .filter($"trade_id" === 4L).select($"qid").collect()
    assert(outer.length == 1 && outer.head.isNullAt(0))
  }

  test("joinNearest: closest wins, gap ties go backward, equal-instant claimed backward") {
    val got = AsOf.joinNearest(trades, quotes,
      leftKey = col("sym"), rightKey = col("sym"),
      leftTime = col("t"), rightTime = col("qt"),
      rightPayload = Seq("qid", "px"), rightOrd = col("qid"))
      .select($"trade_id", $"qid", $"px").as[(Long, Long, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((101L, 2.0)))  // :05 — forward :07 (gap 2) beats :01 (gap 4)
    assert(got(2L) == ((102L, 3.0)))  // :10 — forward :11 (gap 1) beats :07 (gap 3)
    assert(got(3L) == ((103L, 9.0)))  // exact instant
    assert(!got.contains(4L))
    // a symmetric tie resolves to the backward match
    val t2 = Seq((9L, "A", ts("2020-01-01 10:00:09"))).toDF("trade_id", "sym", "t")
    val tie = AsOf.joinNearest(t2, quotes, col("sym"), col("sym"),
      col("t"), col("qt"), Seq("qid"), col("qid"))
      .select($"qid").as[Long].head()
    assert(tie == 101L, "gap 2 both ways: backward (:07) must win")
  }

  test("as-of picks the latest right row at-or-before each left time") {
    val got = run(inner = true)
      .select($"trade_id", $"qid", $"px").as[(Long, Long, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((100L, 1.0)))  // 10:00:05 → quote at :01
    assert(got(2L) == ((101L, 2.0)))  // 10:00:10 → quote at :07 (not :11)
    assert(got(3L) == ((103L, 9.0)))  // equal timestamps are inclusive
    assert(!got.contains(4L))         // inner: no quote for C
  }

  test("left variant keeps unmatched rows with null payload") {
    val left = run(inner = false)
    assert(left.count() == 4)
    assert(left.filter($"trade_id" === 4 && $"qid".isNull).count() == 1)
  }

  test("ties between right rows at the same instant: highest ordinal wins") {
    val dupQuotes = quotes.union(Seq(
      (104L, "B", ts("2020-01-01 10:00:03"), 8.0)).toDF("qid", "sym", "qt", "px"))
    val got = AsOf.join(trades.filter($"sym" === "B"), dupQuotes,
      col("sym"), col("sym"), col("t"), col("qt"),
      Seq("qid", "px"), col("qid"))
      .select($"qid").as[Long].head()
    assert(got == 104L)
  }

  test("null join keys never match (equi-join semantics)") {
    val tradesN = trades.union(Seq(
      (5L, null.asInstanceOf[String], ts("2020-01-01 10:00:09")))
      .toDF("trade_id", "sym", "t"))
    val quotesN = quotes.union(Seq(
      (105L, null.asInstanceOf[String], ts("2020-01-01 10:00:01"), 7.0))
      .toDF("qid", "sym", "qt", "px"))
    val inner = AsOf.join(tradesN, quotesN,
      col("sym"), col("sym"), col("t"), col("qt"),
      Seq("qid", "px"), col("qid"), inner = true)
    // a null-key left row must NOT pick up the null-key quote
    assert(inner.filter($"trade_id" === 5).count() == 0)
    // and the non-null matches are unchanged
    assert(inner.count() == 3)
    val outer = AsOf.join(tradesN, quotesN,
      col("sym"), col("sym"), col("t"), col("qt"),
      Seq("qid", "px"), col("qid"), inner = false)
    assert(outer.filter($"trade_id" === 5 && $"qid".isNull).count() == 1)
  }

  test("null right timestamps never match (NULL <= t is never true)") {
    // a null-time quote sorts nulls-first in the window; unfiltered it
    // would become the carried match for trades preceding all real quotes
    val quotesN = quotes.union(Seq(
      (200L, "C", null.asInstanceOf[java.sql.Timestamp], 9.9))
      .toDF("qid", "sym", "qt", "px"))
    val inner = AsOf.join(trades, quotesN,
      col("sym"), col("sym"), col("t"), col("qt"),
      Seq("qid", "px"), col("qid"), inner = true)
    // trade 4 (sym C) must still have no match — its only quote has NULL time
    assert(inner.filter($"trade_id" === 4).count() == 0)
    assert(inner.count() == 3)
  }

  test("joinWithin: stale matches null out (left-outer) or drop (inner)") {
    val t = Seq(
      (1L, "A", ts("2020-01-01 10:00:00")),  // quote 1s before → in tolerance
      (2L, "A", ts("2020-01-01 10:30:00")),  // latest quote 30min old → stale
      (3L, "B", ts("2020-01-01 09:00:00")))  // no quote at all
      .toDF("trade_id", "sym", "t")
    val q = Seq((10L, "A", ts("2020-01-01 09:59:59"), 1.5))
      .toDF("qid", "sym", "qt", "px")
    val outer = AsOf.joinWithin(t, q, col("sym"), col("sym"), col("t"),
      col("qt"), Seq("qid", "px"), col("qid"),
      tolerance = expr("interval 5 minutes"), inner = false)
      .select($"trade_id", $"qid", $"px", $"matched_time")
      .as[(Long, Option[Long], Option[Double], Option[java.sql.Timestamp])]
      .collect().map(r => r._1 -> r).toMap
    assert(outer(1L)._2.contains(10L) && outer(1L)._4.nonEmpty)
    assert(outer(2L)._2.isEmpty && outer(2L)._3.isEmpty && outer(2L)._4.isEmpty,
      s"stale match must null out: ${outer(2L)}")
    assert(outer(3L)._2.isEmpty)
    val inner = AsOf.joinWithin(t, q, col("sym"), col("sym"), col("t"),
      col("qt"), Seq("qid", "px"), col("qid"),
      tolerance = expr("interval 5 minutes"), inner = true)
    assert(inner.select($"trade_id").as[Long].collect().toSeq == Seq(1L))
    // exact boundary: a match exactly `tolerance` old still counts (>=)
    val boundary = AsOf.joinWithin(t, q, col("sym"), col("sym"), col("t"),
      col("qt"), Seq("qid", "px"), col("qid"),
      tolerance = expr("interval 1 second"), inner = true)
    assert(boundary.select($"trade_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("joinWithin direction='forward': bound is matched - left <= tol") {
    val t = Seq(
      (1L, "A", ts("2020-01-01 10:00:00")),  // next quote 4min ahead → in tol
      (2L, "A", ts("2020-01-01 09:00:00")),  // next quote 64min ahead → out
      (3L, "B", ts("2020-01-01 11:00:00")))  // no quote after at all
      .toDF("trade_id", "sym", "t")
    val q = Seq((10L, "A", ts("2020-01-01 10:04:00"), 1.5))
      .toDF("qid", "sym", "qt", "px")
    val outer = AsOf.joinWithin(t, q, col("sym"), col("sym"), col("t"),
      col("qt"), Seq("qid", "px"), col("qid"),
      tolerance = expr("interval 5 minutes"), inner = false,
      direction = "forward")
      .select($"trade_id", $"qid").as[(Long, Option[Long])]
      .collect().toMap
    assert(outer(1L).contains(10L))
    assert(outer(2L).isEmpty, "out-of-tolerance forward match must null")
    assert(outer(3L).isEmpty)
    // boundary: exactly tolerance ahead still counts (>=)
    val b = AsOf.joinWithin(t, q, col("sym"), col("sym"), col("t"),
      col("qt"), Seq("qid", "px"), col("qid"),
      tolerance = expr("interval 4 minutes"), inner = true,
      direction = "forward")
    assert(b.select($"trade_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("joinWithin direction='nearest': champion first, then |gap| <= tol") {
    // trade at 10:00; quotes at 09:58 (gap 2min, backward) and 10:03
    // (gap 3min, forward): nearest champion is the backward quote. With
    // tol=1min the champion is out of bounds → NO match, even though
    // nothing closer exists (the pandas composition: bound the champion,
    // never fall through to the other side).
    val t = Seq((1L, "A", ts("2020-01-01 10:00:00"))).toDF("trade_id", "sym", "t")
    val q = Seq(
      (10L, "A", ts("2020-01-01 09:58:00"), 1.0),
      (11L, "A", ts("2020-01-01 10:03:00"), 2.0)).toDF("qid", "sym", "qt", "px")
    def within(tol: String) = AsOf.joinWithin(t, q, col("sym"), col("sym"),
      col("t"), col("qt"), Seq("qid", "px"), col("qid"),
      tolerance = expr(tol), inner = false, direction = "nearest")
      .select($"qid").as[Option[Long]].head()
    assert(within("interval 2 minutes").contains(10L))
    assert(within("interval 1 minute").isEmpty)
    // a forward champion in tolerance also passes the |gap| check
    val t2 = Seq((2L, "A", ts("2020-01-01 10:02:30"))).toDF("trade_id", "sym", "t")
    val fwd = AsOf.joinWithin(t2, q, col("sym"), col("sym"),
      col("t"), col("qt"), Seq("qid", "px"), col("qid"),
      tolerance = expr("interval 1 minute"), inner = false, direction = "nearest")
      .select($"qid").as[Option[Long]].head()
    assert(fwd.contains(11L))
  }

  test("joinWithin nearest: no-candidate keys stay null (outer) / drop (inner)") {
    // key C has no quotes at all: the nearest champion is NULL and the
    // tolerance predicate must not resurrect anything
    val t = Seq((4L, "C", ts("2020-01-01 10:00:00"))).toDF("trade_id", "sym", "t")
    val outer = AsOf.joinWithin(t, quotes, col("sym"), col("sym"), col("t"),
      col("qt"), Seq("qid", "px"), col("qid"),
      tolerance = expr("interval 1 hour"), inner = false, direction = "nearest")
    assert(outer.count() == 1 && outer.select($"qid").head().isNullAt(0))
    val inner = AsOf.joinWithin(t, quotes, col("sym"), col("sym"), col("t"),
      col("qt"), Seq("qid", "px"), col("qid"),
      tolerance = expr("interval 1 hour"), inner = true, direction = "nearest")
    assert(inner.count() == 0)
  }

  test("joinWithin rejects an unknown direction") {
    intercept[IllegalArgumentException] {
      AsOf.joinWithin(trades, quotes, col("sym"), col("sym"), col("t"),
        col("qt"), Seq("qid", "px"), col("qid"),
        tolerance = expr("interval 1 minute"), direction = "sideways")
    }
  }

  test("fixture slice: the error→purchase faces are non-vacuous and the " +
      "nearest forward champion actually wins rows") {
    val ev = graft.Tables.events(spark, sf0001)
    val err = ev.filter($"event_type" === "error")
      .select($"event_id", $"user_id", $"ts")
    val pur = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"user_id".as("p_user"),
        $"ts".as("p_ts"), $"value".as("p_value"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select($"event_id", $"p_id").as[(Long, Long)].collect().toMap
    val fwd = pairs(AsOf.joinForward(err, pur, col("user_id"), col("p_user"),
      col("ts"), col("p_ts"), Seq("p_id", "p_value"), col("p_id")))
    val bwd = pairs(AsOf.join(err, pur, col("user_id"), col("p_user"),
      col("ts"), col("p_ts"), Seq("p_id", "p_value"), col("p_id")))
    val near = pairs(AsOf.joinNearest(err, pur, col("user_id"), col("p_user"),
      col("ts"), col("p_ts"), Seq("p_id", "p_value"), col("p_id")))
    assert(fwd.nonEmpty, "forward face must be non-vacuous on the fixture")
    // rows where the nearest choice DIFFERS from the backward champion —
    // the forward champion won the gap compare (or was the only one)
    val fwdWins = near.count { case (e, p) => !bwd.get(e).contains(p) }
    assert(fwdWins > 0, "fixture must make the forward champion win rows")
    // and rows where a backward match exists but forward is closer
    val gapWins = near.count { case (e, p) =>
      bwd.contains(e) && bwd(e) != p && fwd.get(e).contains(p) }
    assert(gapWins > 0, "gap compare must decide rows, not just one-sided presence")
    // forward-only rows (no backward candidate at all) exercise the
    // null-champion branch
    assert(near.keySet.exists(e => !bwd.contains(e)))
  }

  test("fixture slice: forward matches the naive inequality-join formulation") {
    val ev = graft.Tables.events(spark, sf0001)
    val err = ev.filter($"event_type" === "error")
      .select($"event_id", $"user_id", $"ts")
    val pur = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"user_id".as("p_user"),
        $"ts".as("p_ts"))
    val fast = AsOf.joinForward(err, pur, col("user_id"), col("p_user"),
      col("ts"), col("p_ts"), Seq("p_id"), col("p_id"))
      .select($"event_id", $"p_id").as[(Long, Long)].collect().toSet
    val naive = err.join(pur,
      col("user_id") === col("p_user") && col("p_ts") >= col("ts"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"event_id")
          .orderBy($"p_ts".asc, $"p_id".desc)))
      .filter($"rn" === 1)
      .select($"event_id", $"p_id").as[(Long, Long)].collect().toSet
    assert(fast == naive && fast.nonEmpty)
  }

  test("matches the naive inequality-join formulation on fixture data") {
    val ev = graft.Tables.events(spark, sf0001)
    val ord = graft.Tables.orders(spark, sf0001)
    val fast = AsOf.join(ev, ord, col("user_id"), col("o_custkey"),
      col("ts"), col("o_orderdate"), Seq("o_orderkey"), col("o_orderkey"))
      .select($"event_id", $"o_orderkey").as[(Long, Long)].collect().toSet
    val naive = ev.join(ord,
      col("user_id") === col("o_custkey") && col("o_orderdate") <= col("ts"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"event_id")
          .orderBy($"o_orderdate".desc, $"o_orderkey".desc)))
      .filter($"rn" === 1)
      .select($"event_id", $"o_orderkey").as[(Long, Long)].collect().toSet
    assert(fast == naive)
  }
}
