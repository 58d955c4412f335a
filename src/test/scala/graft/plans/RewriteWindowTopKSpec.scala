package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The injected optimizer rule that migrates `row_number()` window top-k
  * filters to the k-bounded TopK aggregate automatically. Tested through
  * `spark.experimental.extraOptimizations` (same rule object the
  * GraftExtensions entry point injects). */
class RewriteWindowTopKSpec extends SparkSuite {
  import spark.implicits._

  private def withRule[T](body: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RewriteWindowTopK
    try body finally spark.experimental.extraOptimizations = prev
  }

  private def topkQuery: DataFrame = {
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    graft.Tables.orders(spark, sf0001)
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"o_orderpriority", $"rk", $"o_orderkey", $"o_totalprice")
  }

  test("rank<=k window becomes the TopK aggregate; results identical") {
    val baseline = topkQuery.collect().map(_.toSeq).toSet // rule OFF
    withRule {
      val df = topkQuery
      val p = df.queryExecution.optimizedPlan.toString
      assert(p.contains("topk_by_ord"), s"rewrite must fire:\n${p.take(2000)}")
      // no Window operator and no leftover WindowGroupLimit either
      assert(!p.contains("Window [") && !p.contains("WindowGroupLimit"),
        s"window machinery must be gone:\n${p.take(2000)}")
      assert(df.collect().map(_.toSeq).toSet == baseline,
        "rewritten results must match the window formulation exactly")
    }
  }

  test("extra filter conjuncts survive; opt-out conf restores the window") {
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    def q = graft.Tables.orders(spark, sf0001)
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3 && $"o_orderkey" % 2 === 0)
      .select($"o_orderpriority", $"rk", $"o_orderkey")
    val baseline = q.collect().map(_.toSeq).toSet
    withRule {
      assert(q.queryExecution.optimizedPlan.toString.contains("topk_by_ord"))
      assert(q.collect().map(_.toSeq).toSet == baseline)
      spark.conf.set("spark.graft.rewriteWindowTopK", "false")
      try assert(!q.queryExecution.optimizedPlan.toString.contains("topk_by_ord"),
        "opt-out conf must disable the rewrite")
      finally spark.conf.unset("spark.graft.rewriteWindowTopK")
    }
  }

  test("unsupported shapes are left alone (rank k>1, non-atomic key, no bound)") {
    withRule {
      val w = Window.partitionBy($"g").orderBy($"v".desc, $"id")
      val df = Seq((1L, "a", 1.0), (2L, "a", 2.0)).toDF("id", "g", "v")
      def window(q: DataFrame): Boolean = {
        val p = q.queryExecution.optimizedPlan.toString
        !p.contains("topk_by_ord") && p.contains("Window")
      }
      // rank() with k > 1: only the k = 1 tie-group has the aggregate form
      val r1 = df.withColumn("rk", rank().over(Window.partitionBy($"g")
        .orderBy($"v".desc, $"id"))).filter($"rk" <= 2)
      assert(window(r1))
      // rank() = 1 over a DESCENDING DOUBLE: no overflow/NaN-free reversal
      val r1b = df.withColumn("rk", rank().over(Window.partitionBy($"g")
        .orderBy($"v".desc, $"id"))).filter($"rk" <= 1)
      assert(window(r1b))
      // row_number over a NON-ATOMIC sort key (array) — not encodable
      val r2 = df.withColumn("rk", row_number().over(Window.partitionBy($"g")
        .orderBy(array($"v").desc, $"id"))).filter($"rk" <= 1)
      assert(window(r2))
      // no rank bound in the filter
      val r4 = df.withColumn("rk", row_number().over(w)).filter($"v" > 0.5)
      assert(window(r4))
      // rank() = 1 over a child the aggregate leg can't re-instantiate
      // (another window below this one) keeps the window form
      val r5 = df.withColumn("rn", row_number().over(Window.partitionBy($"g")
          .orderBy($"id".asc)))
        .withColumn("rk", rank().over(Window.partitionBy($"g")
          .orderBy($"rn".asc))).filter($"rk" === 1)
      assert(!r5.queryExecution.optimizedPlan.toString.contains("Join"),
        "a window-below-window child must bail to the window form")
    }
  }

  test("general leg: bottom-k (asc) and double-tie shapes fire via sort_key_bytes") {
    val df = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0),
      (4L, "b", 2.0), (5L, "b", 1.0)).toDF("id", "g", "v")
    // ascending primary (bottom-k) and a DOUBLE tie — both beyond the
    // specialized (desc, asc-long/string) shape, both encodable now
    val shapes = Seq(
      Window.partitionBy($"g").orderBy($"v".asc, $"id"),
      Window.partitionBy($"g").orderBy($"id".desc, $"v"),
      Window.partitionBy($"g").orderBy($"v".asc))
    for (w <- shapes) {
      def q = df.withColumn("rk", row_number().over(w)).filter($"rk" <= 2)
        .select($"id", $"rk")
      val baseline = q.collect().map(_.toSeq).toSet // rule OFF
      withRule {
        val p = q.queryExecution.optimizedPlan.toString
        assert(p.contains("sort_key_bytes") && p.contains("topk_by_ord"),
          s"general leg must fire:\n${p.take(1500)}")
        assert(!p.contains("Window [") && !p.contains("WindowGroupLimit"),
          s"window machinery must be gone:\n${p.take(1500)}")
        assert(q.collect().map(_.toSeq).toSet == baseline)
      }
    }
  }

  test("general leg: multi-key mixed directions + null orderings match the window") {
    val df = Seq[(Long, String, java.lang.Double, String)](
      (1L, "a", 2.0, "x"), (2L, "a", 2.0, "w"), (3L, "a", null, "z"),
      (4L, "a", 1.0, "y"), (5L, "b", -0.0, "m"), (6L, "b", 0.0, "n"),
      (7L, "b", Double.NaN, "o"), (8L, "b", null, "p")
    ).toDF("id", "g", "v", "s")
    val shapes = Seq(
      Window.partitionBy($"g").orderBy($"v".desc_nulls_last, $"s".desc, $"id"),
      Window.partitionBy($"g").orderBy($"v".asc_nulls_first, $"s".asc, $"id".desc),
      Window.partitionBy($"g").orderBy($"s".desc, $"v".asc, $"id"))
    for (w <- shapes) {
      def q = df.withColumn("rk", row_number().over(w)).filter($"rk" <= 3)
        .select($"id", $"rk")
      val baseline = q.collect().map(_.toSeq).toSet // rule OFF
      withRule {
        assert(q.queryExecution.optimizedPlan.toString.contains("sort_key_bytes"))
        assert(q.collect().map(_.toSeq).toSet == baseline, s"window=$w")
      }
    }
  }

  test("general leg: string prefix / embedded-NUL keys order like the window") {
    // the memcomparable escape+terminator must keep "a" < "a\u0000b" < "ab"
    // in both directions, with the unique id as the final key
    val df = Seq((1L, "g", "a"), (2L, "g", "a\u0000b"), (3L, "g", "ab"),
      (4L, "g", ""), (5L, "g", "a\u0000"), (6L, "g", "b")).toDF("id", "g", "s")
    for (dir <- Seq($"s".asc, $"s".desc)) {
      def q = df.withColumn("rk", row_number().over(
        Window.partitionBy($"g").orderBy(dir, $"id"))).filter($"rk" <= 4)
        .select($"id", $"rk")
      val baseline = q.collect().map(_.toSeq).toSet // rule OFF
      withRule {
        assert(q.queryExecution.optimizedPlan.toString.contains("sort_key_bytes"))
        assert(q.collect().map(_.toSeq).toSet == baseline, s"dir=$dir")
      }
    }
  }

  test("LONG ord: fires and compares natively (no 2^53 double collision)") {
    withRule {
      val big = 1L << 53 // big and big+1 collide after a double cast
      val df = Seq((big, "a", 0), (big + 1L, "a", 1)).toDF("id", "g", "t")
      def q = df.withColumn("rk", row_number().over(Window.partitionBy($"g")
        .orderBy($"id".desc, $"t"))).filter($"rk" === 1).select($"id")
      assert(q.queryExecution.optimizedPlan.toString.contains("topk_by_ord"),
        "long ord must fire")
      // double-cast compare would tie the two ids and fall back to t asc
      // (picking `big`); native long compare must pick big+1
      assert(q.as[Long].collect().toSeq == Seq(big + 1L))
    }
  }

  test("rank()/dense_rank() = 1: aggregate+join form, ties preserved") {
    val df = Seq(
      (1L, "a", 5), (2L, "a", 5), (3L, "a", 7),   // tie at min v=5 in a
      (4L, "b", 2), (5L, "b", 3)).toDF("id", "g", "v")
    for (fn <- Seq(rank(), dense_rank());
         (ord, expect) <- Seq(
           ($"v".asc, Set(1L, 2L, 4L)),  // min: both tied rows of a
           ($"v".desc, Set(3L, 5L)))) {  // max via the -1-x reversal
      def q = df.withColumn("rk", fn.over(Window.partitionBy($"g")
        .orderBy(ord))).filter($"rk" === 1).select($"id", $"rk")
      val baseline = q.collect().map(_.toSeq).toSet // rule OFF
      withRule {
        val p = q.queryExecution.optimizedPlan.toString
        assert(!p.contains("Window"), s"window must be gone:\n${p.take(1500)}")
        assert(p.contains("Join"), s"aggregate+join form expected:\n${p.take(1500)}")
        assert(q.collect().map(_.toSeq).toSet == baseline)
        assert(q.select($"id").as[Long].collect().toSet == expect)
      }
    }
  }

  test("rank() = 1 over a groupBy: the canonical top-group-per-key shape fires") {
    // orders per (priority, custkey): which customer(s) tie for the most orders
    // in each priority — rank over an Aggregate child, the shape the
    // freshCopy Aggregate case exists for
    def q = {
      val counts = graft.Tables.orders(spark, sf0001)
        .groupBy($"o_orderpriority", $"o_custkey")
        .agg(count(lit(1)).as("n"))
      counts.withColumn("rk", rank().over(
        Window.partitionBy($"o_orderpriority").orderBy($"n".desc_nulls_last)))
        .filter($"rk" === 1)
        .select($"o_orderpriority", $"o_custkey", $"n", $"rk")
    }
    val baseline = q.collect().map(_.toSeq).toSet // rule OFF
    assert(baseline.nonEmpty)
    withRule {
      val p = q.queryExecution.optimizedPlan.toString
      assert(!p.contains("Window") && p.contains("Join"),
        s"rank-over-aggregate must take the join form:\n${p.take(1500)}")
      assert(q.collect().map(_.toSeq).toSet == baseline)
    }
  }

  test("dense_rank() <= k: distinct-key top-k + join, ties and ranks preserved") {
    val df = Seq(
      (1L, "a", 5), (2L, "a", 5), (3L, "a", 7), (4L, "a", 9),  // dup key 5
      (5L, "b", 2), (6L, "b", 3), (7L, "b", 3), (8L, "b", 4)   // dup key 3
    ).toDF("id", "g", "v")
    for ((ord, expect) <- Seq(
        ($"v".asc, Set((1L, 1), (2L, 1), (3L, 2), (5L, 1), (6L, 2), (7L, 2))),
        ($"v".desc, Set((4L, 1), (3L, 2), (8L, 1), (6L, 2), (7L, 2))))) {
      def q = df.withColumn("rk", dense_rank().over(Window.partitionBy($"g")
        .orderBy(ord))).filter($"rk" <= 2).select($"id", $"rk")
      val baseline = q.collect().map(_.toSeq).toSet // rule OFF
      withRule {
        val p = q.queryExecution.optimizedPlan.toString
        assert(p.contains("Join"), s"distinct-key join form expected:\n${p.take(1500)}")
        assert(p.contains("__graft_key"), s"distinct-key leg expected:\n${p.take(1500)}")
        assert(q.collect().map(_.toSeq).toSet == baseline, s"ord=$ord")
        assert(q.as[(Long, Int)].collect().toSet == expect, s"ord=$ord")
      }
    }
  }

  test("dense_rank() <= k fires on DESCENDING doubles and strings (no reversal needed)") {
    // the k=1 min-struct leg bails on desc doubles/strings (NaN breaks
    // negation); the distinct-key leg orders natively, so these fire —
    // including the NaN / -0.0==0.0 sort-equality edges
    val df = Seq(
      (1L, "a", 2.5, "x"), (2L, "a", 2.5, "y"), (3L, "a", 1.0, "z"),
      (4L, "a", 9.0, "w"), (5L, "b", -0.0, "m"), (6L, "b", 0.0, "n"),
      (7L, "b", Double.NaN, "o")).toDF("id", "g", "v", "s")
    for (ord <- Seq($"v".desc, $"s".desc, $"v".desc_nulls_last)) {
      def q = df.withColumn("rk", dense_rank().over(
        Window.partitionBy($"g").orderBy(ord)))
        .filter($"rk" <= 2).select($"id", $"rk")
      val baseline = q.collect().map(_.toSeq).toSet // rule OFF
      withRule {
        assert(q.queryExecution.optimizedPlan.toString.contains("__graft_key"),
          s"ord=$ord must fire")
        assert(q.collect().map(_.toSeq).toSet == baseline, s"ord=$ord")
      }
    }
  }

  test("dense_rank() <= k locked shapes: rank() <= k stays a window; = k too") {
    withRule {
      val df = Seq((1L, "a", 1), (2L, "a", 1), (3L, "a", 2)).toDF("id", "g", "v")
      // rank() <= 2 is NOT top-2-distinct-keys (rank skips after ties)
      val r = df.withColumn("rk", rank().over(Window.partitionBy($"g")
        .orderBy($"v".asc))).filter($"rk" <= 2)
      val pr = r.queryExecution.optimizedPlan.toString
      assert(pr.contains("Window") && !pr.contains("__graft_key"), pr.take(1200))
      // dense_rank() = 2 (an equality slice, not a top-k) keeps the window
      val d = df.withColumn("rk", dense_rank().over(Window.partitionBy($"g")
        .orderBy($"v".asc))).filter($"rk" === 2)
      val pd = d.queryExecution.optimizedPlan.toString
      assert(pd.contains("Window") && !pd.contains("__graft_key"), pd.take(1200))
    }
  }

  test("property: dense_rank<=k rule-on == rule-off (ties, nulls, desc ints)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val rowsGen: Gen[Seq[(String, Option[Int], Long)]] = for {
      n <- Gen.chooseNum(1, 40)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf("a", "b")
        s <- Gen.option(Gen.chooseNum(0, 3)) // ties AND nulls
      } yield (g, s))
    } yield rows.zipWithIndex.map { case ((g, s), i) => (g, s, i.toLong) }
    val prop = Prop.forAll(rowsGen, Gen.chooseNum(2, 4),
        Gen.oneOf(true, false)) { (rows, k, desc) =>
      def q = {
        val ord = if (desc) $"_2".desc else $"_2".asc
        rows.toDF().withColumn("rk", dense_rank().over(
          Window.partitionBy($"_1").orderBy(ord))).filter($"rk" <= k)
          .select($"_1", $"_3", $"rk")
      }
      val off = q.collect().map(_.toSeq).toSet
      val on = withRule {
        // fired = the distinct-key leg is present (the rewrite keeps a
        // Window, but over per-group DISTINCT keys, not the corpus)
        assert(q.queryExecution.optimizedPlan.toString.contains("__graft_key"))
        q.collect().map(_.toSeq).toSet
      }
      off == on
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("dense_rank() <= k over an AGGREGATE child fires (top distinct totals per key)") {
    // "top 3 distinct daily totals per priority" — the window's input is
    // itself a groupBy, so the distinct-key leg must freshCopy an
    // Aggregate (regenerated aliases) into its second leg
    def q = {
      val daily = graft.Tables.orders(spark, sf0001)
        .groupBy($"o_orderpriority", $"o_orderdate")
        .agg(sum($"o_totalprice").as("total"))
      daily.withColumn("rk", dense_rank().over(
        Window.partitionBy($"o_orderpriority").orderBy($"total".desc)))
        .filter($"rk" <= 3)
        .select($"o_orderpriority", $"o_orderdate", $"total", $"rk")
    }
    val baseline = q.collect().map(_.toSeq).toSet // rule OFF
    assert(baseline.nonEmpty)
    withRule {
      val p = q.queryExecution.optimizedPlan.toString
      assert(p.contains("__graft_key") && p.contains("Join"),
        s"dense_rank over aggregate child must take the distinct-key form:\n${p.take(1500)}")
      assert(q.collect().map(_.toSeq).toSet == baseline)
    }
  }

  test("property: dense_rank<=k over aggregated child rule-on == rule-off") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // random fact rows → groupBy(g, s) sum(v) → dense_rank over partition g
    // ordered by the aggregated total; duplicate totals exercise the
    // distinct-key semantics, null group keys the null-safe join-back
    val rowsGen: Gen[Seq[(String, Option[Int], Int)]] = for {
      n <- Gen.chooseNum(1, 40)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf("a", "b")
        s <- Gen.option(Gen.chooseNum(0, 2))
        v <- Gen.chooseNum(0, 3) // few values → tied sums across subkeys
      } yield (g, s, v))
    } yield rows
    val prop = Prop.forAll(rowsGen, Gen.chooseNum(2, 4),
        Gen.oneOf(true, false)) { (rows, k, desc) =>
      def q = {
        val ord = if (desc) $"total".desc else $"total".asc
        rows.toDF("g", "s", "v").groupBy($"g", $"s")
          .agg(sum($"v").as("total"))
          .withColumn("rk", dense_rank().over(
            Window.partitionBy($"g").orderBy(ord)))
          .filter($"rk" <= k).select($"g", $"s", $"total", $"rk")
      }
      val off = q.collect().map(_.toSeq).toSet
      val on = withRule {
        assert(q.queryExecution.optimizedPlan.toString.contains("__graft_key"))
        q.collect().map(_.toSeq).toSet
      }
      off == on
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("rank() = 1 / dense_rank() <= k over a JOINED input fires (freshCopy over Join)") {
    // top-order(s) per customer over an enriched orders⋈customer input —
    // the "top group per key over a joined relation" shape
    def base = {
      val o = graft.Tables.orders(spark, sf0001)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      val c = graft.Tables.customer(spark, sf0001)
        .select($"c_custkey", $"c_mktsegment")
      o.join(c, $"o_custkey" === $"c_custkey")
    }
    def q1 = base.withColumn("rk", rank().over(
        Window.partitionBy($"c_mktsegment").orderBy($"o_orderkey".asc)))
      .filter($"rk" === 1).select($"c_mktsegment", $"o_orderkey", $"rk")
    def qk = base.withColumn("rk", dense_rank().over(
        Window.partitionBy($"c_mktsegment").orderBy($"o_orderkey".asc)))
      .filter($"rk" <= 3).select($"c_mktsegment", $"o_orderkey", $"rk")
    val b1 = q1.collect().map(_.toSeq).toSet // rule OFF
    val bk = qk.collect().map(_.toSeq).toSet
    assert(b1.nonEmpty && bk.nonEmpty)
    withRule {
      val p1 = q1.queryExecution.optimizedPlan.toString
      assert(!p1.contains("Window ["), s"join child must fire:\n${p1.take(1500)}")
      assert(q1.collect().map(_.toSeq).toSet == b1)
      val pk = qk.queryExecution.optimizedPlan.toString
      assert(pk.contains("__graft_key"),
        s"dense_rank over join child must fire:\n${pk.take(1500)}")
      assert(qk.collect().map(_.toSeq).toSet == bk)
    }
  }

  test("SQL text: the window-topk idiom in spark.sql() takes the same rewrites") {
    graft.Tables.orders(spark, sf0001).createOrReplaceTempView("o_sqltest")
    try {
      def q(fn: String, bound: String) = spark.sql(
        s"""SELECT o_orderpriority, o_orderkey, rk FROM (
           |  SELECT o_orderpriority, o_orderkey,
           |         $fn OVER (PARTITION BY o_orderpriority
           |                   ORDER BY o_orderkey) AS rk
           |  FROM o_sqltest) WHERE $bound""".stripMargin)
      for ((fn, bound, marker) <- Seq(
          ("dense_rank()", "rk <= 3", "__graft_key"),
          ("rank()", "rk = 1", "__graft_min"))) {
        val baseline = q(fn, bound).collect().map(_.toSeq).toSet // rule OFF
        assert(baseline.nonEmpty)
        withRule {
          val df = q(fn, bound)
          assert(df.queryExecution.optimizedPlan.toString.contains(marker),
            s"$fn $bound must fire through the SQL surface")
          assert(df.collect().map(_.toSeq).toSet == baseline)
        }
      }
    } finally spark.catalog.dropTempView("o_sqltest")
  }

  test("rank() = 1 over a UNION of shards fires (freshCopy over Union)") {
    // multi-shard corpus: min order per priority across two disjoint
    // slices — the union-of-sources shape a sharded pipeline produces
    def q = {
      val o = graft.Tables.orders(spark, sf0001)
        .select($"o_orderpriority", $"o_orderkey")
      val sharded = o.filter($"o_orderkey" % 2 === 0)
        .union(o.filter($"o_orderkey" % 2 =!= 0))
      sharded.withColumn("rk", rank().over(
        Window.partitionBy($"o_orderpriority").orderBy($"o_orderkey".asc)))
        .filter($"rk" === 1).select($"o_orderpriority", $"o_orderkey", $"rk")
    }
    val baseline = q.collect().map(_.toSeq).toSet // rule OFF
    assert(baseline.nonEmpty)
    withRule {
      val p = q.queryExecution.optimizedPlan.toString
      assert(!p.contains("Window ["), s"union child must fire:\n${p.take(1500)}")
      assert(q.collect().map(_.toSeq).toSet == baseline)
    }
  }

  test("non-deterministic input bails: rand() below rank()=1 keeps the window") {
    withRule {
      // NB: a LocalRelation fixture would be constant-folded by
      // ConvertToLocalRelation (rand evaluated before this rule runs, so
      // firing would be correct); Range projections stay symbolic
      val df = spark.range(6).select($"id", (($"id" % 2).cast("string")).as("g"))
      // rand() in a projection below the window: duplicating the subtree
      // would re-draw it per leg — the rule must NOT fire
      val q1 = df.withColumn("v", rand(7))
        .withColumn("rk", rank().over(Window.partitionBy($"g").orderBy($"v".asc)))
        .filter($"rk" === 1)
      val p1 = q1.queryExecution.optimizedPlan.toString
      assert(p1.contains("Window [") && !p1.contains("Join"), p1.take(1200))
      // and for the dense_rank k>1 leg
      val q2 = df.withColumn("v", rand(7))
        .withColumn("rk", dense_rank().over(Window.partitionBy($"g").orderBy($"v".asc)))
        .filter($"rk" <= 2)
      val p2 = q2.queryExecution.optimizedPlan.toString
      assert(p2.contains("Window [") && !p2.contains("__graft_key"), p2.take(1200))
      // row_number TopK path reads its input ONCE — rand() below it is
      // still safe and must keep firing
      val q3 = df.withColumn("v", rand(7))
        .withColumn("rk", row_number().over(
          Window.partitionBy($"g").orderBy($"v".desc, $"id")))
        .filter($"rk" <= 1)
      assert(q3.queryExecution.optimizedPlan.toString.contains("topk_by_ord"))
    }
  }

  test("rank() = 1: nulls and -0.0/0.0 agree with the window form") {
    // nulls first (asc default) and the float grouping-vs-sort equality
    // edge: whatever the window says, the rewrite must say the same
    val df = Seq[(Long, String, java.lang.Double)](
      (1L, "a", null), (2L, "a", null), (3L, "a", 1.0),
      (4L, "b", -0.0), (5L, "b", 0.0), (6L, "b", 1.0)
    ).toDF("id", "g", "v")
    for (ord <- Seq($"v".asc, $"v".asc_nulls_last)) {
      def q = df.withColumn("rk", rank().over(Window.partitionBy($"g")
        .orderBy(ord))).filter($"rk" === 1).select($"id")
      val baseline = q.collect().map(_.toSeq).toSet
      withRule {
        assert(!q.queryExecution.optimizedPlan.toString.contains("Window"))
        assert(q.collect().map(_.toSeq).toSet == baseline, s"ord=$ord")
      }
    }
  }

  test("property: rank=1 rule-on == rule-off (ties, nulls, desc ints)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val rowsGen: Gen[Seq[(String, Option[Int], Long)]] = for {
      n <- Gen.chooseNum(1, 40)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf("a", "b")
        s <- Gen.option(Gen.chooseNum(0, 3)) // ties AND nulls
      } yield (g, s))
    } yield rows.zipWithIndex.map { case ((g, s), i) => (g, s, i.toLong) }
    val prop = Prop.forAll(rowsGen, Gen.oneOf(true, false)) { (rows, desc) =>
      def q = {
        val ord = if (desc) $"_2".desc else $"_2".asc
        val w = Window.partitionBy($"_1").orderBy(ord)
        rows.toDF().withColumn("rk", rank().over(w)).filter($"rk" === 1)
          .select($"_1", $"_3", $"rk")
      }
      val off = q.collect().map(_.toSeq).toSet
      val on = withRule {
        assert(!q.queryExecution.optimizedPlan.toString.contains("Window"))
        q.collect().map(_.toSeq).toSet
      }
      off == on
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("nullable ord: null sorts per NULLS LAST via the -Infinity sentinel") {
    withRule {
      val df = Seq[(Long, String, java.lang.Double)](
        (1L, "a", 5.0), (2L, "a", null), (3L, "a", 1.0), (4L, "a", null)
      ).toDF("id", "g", "v")
      val w = Window.partitionBy($"g").orderBy($"v".desc, $"id")
      def q = df.withColumn("rk", row_number().over(w)).filter($"rk" <= 3)
        .select($"id", $"rk")
      assert(q.queryExecution.optimizedPlan.toString.contains("topk_by_ord"))
      val got = q.as[(Long, Int)].collect().toSet
      // desc NULLS LAST: 5.0, 1.0, then nulls by id asc → ids 1,3,2
      assert(got == Set((1L, 1), (3L, 2), (2L, 3)), s"got $got")
    }
  }

  test("property: rule-on == rule-off for random data (ties, nulls, any k)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val rowsGen: Gen[Seq[(String, Option[Int], Long)]] = for {
      n <- Gen.chooseNum(1, 40)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf("a", "b")
        s <- Gen.option(Gen.chooseNum(0, 3)) // ties AND nulls
      } yield (g, s))
    } yield rows.zipWithIndex.map { case ((g, s), i) => (g, s, i.toLong) }
    val prop = Prop.forAll(rowsGen, Gen.chooseNum(1, 4)) { (rows, k) =>
      def q = {
        val w = Window.partitionBy($"_1").orderBy($"_2".desc, $"_3")
        rows.toDF().withColumn("rk", row_number().over(w)).filter($"rk" <= k)
          .select($"_1", $"_3", $"rk")
      }
      val off = q.collect().map(_.toSeq).toSet
      val on = withRule {
        assert(q.queryExecution.optimizedPlan.toString.contains("topk_by_ord"))
        q.collect().map(_.toSeq).toSet
      }
      off == on
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: general leg rule-on == rule-off (random directions, key counts)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val rowsGen: Gen[Seq[(String, Option[Int], Option[String], Long)]] = for {
      n <- Gen.chooseNum(1, 40)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf("a", "b")
        v <- Gen.option(Gen.chooseNum(0, 3))          // ties AND nulls
        s <- Gen.option(Gen.oneOf("", "x", "x y", "xy", "z"))
      } yield (g, v, s))
    } yield rows.zipWithIndex.map { case ((g, v, s), i) => (g, v, s, i.toLong) }
    val dirGen = Gen.oneOf(0, 1, 2, 3) // asc, desc, asc_nulls_last, desc_nulls_first
    def orient(c: org.apache.spark.sql.Column, d: Int) = d match {
      case 0 => c.asc
      case 1 => c.desc
      case 2 => c.asc_nulls_last
      case _ => c.desc_nulls_first
    }
    val prop = Prop.forAll(rowsGen, Gen.chooseNum(1, 4), dirGen, dirGen,
        dirGen, Gen.chooseNum(1, 3)) { (rows, k, d1, d2, d3, nKeys) =>
      def q = {
        // 1-3 sort keys of random orientation; the unique index is always
        // last so row_number stays deterministic
        val keys = Seq(orient($"_2", d1), orient($"_3", d2))
          .take(nKeys - 1) :+ orient($"_4", d3)
        val w = Window.partitionBy($"_1").orderBy(keys: _*)
        rows.toDF().withColumn("rk", row_number().over(w)).filter($"rk" <= k)
          .select($"_1", $"_4", $"rk")
      }
      val off = q.collect().map(_.toSeq).toSet
      val on = withRule {
        assert(q.queryExecution.optimizedPlan.toString.contains("topk_by_ord"),
          "every all-atomic shape must take one of the TopK legs")
        q.collect().map(_.toSeq).toSet
      }
      off == on
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("global top-k (no partition) — the single-task sort worst case") {
    withRule {
      val df = (1 to 100).map(i => (i.toLong, i * 1.5)).toDF("id", "v")
      def q = df.withColumn("rk", row_number().over(
        Window.orderBy($"v".desc, $"id"))).filter($"rk" <= 2)
      assert(q.queryExecution.optimizedPlan.toString.contains("topk_by_ord"))
      val got = q.select($"id", $"rk").as[(Long, Int)].collect().toSet
      assert(got == Set((100L, 1), (99L, 2)), s"got $got")
    }
  }
}
