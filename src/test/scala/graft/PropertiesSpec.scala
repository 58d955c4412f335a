package graft

import graft.operators.{Dedup, WeatherOps}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Engine-level invariants (SURVEY.md §5.4): properties that must hold for
  * any input, checked over generated data.
  */
class PropertiesSpec extends SparkSuite {
  import spark.implicits._

  private def check(prop: Prop, n: Int = 30): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val docGen: Gen[Seq[(Long, String)]] = for {
    n <- Gen.chooseNum(1, 12)
    texts <- Gen.listOfN(n, Gen.nonEmptyListOf(
      Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon", "zeta"))
      .map(_.mkString(" ")))
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("dedup idempotence: dedupCorpus(dedupCorpus(x)) == dedupCorpus(x)") {
    check(Prop.forAll(docGen) { docs =>
      val df = docs.toDF("doc_id", "text")
      val once = Dedup.dedupCorpus(df, threshold = 0.6)
      val twice = Dedup.dedupCorpus(once, threshold = 0.6)
      once.select($"doc_id").as[Long].collect().toSet ==
        twice.select($"doc_id").as[Long].collect().toSet
    }, n = 15)
  }

  test("chunking: windows cover every token exactly; reconstruction at zero overlap") {
    import graft.operators.TextPrep
    check(Prop.forAll(docGen, Gen.chooseNum(2, 8)) { (docs, chunkSize) =>
      val df = docs.toDF("doc_id", "text")
      // zero overlap: concatenating the chunks reconstructs the token stream
      val rebuilt = TextPrep.chunkTokens(df, chunkSize = chunkSize, overlap = 0)
        .orderBy($"doc_id", $"chunk_idx")
        .groupBy($"doc_id")
        .agg(concat_ws(" ", collect_list($"chunk_text")).as("joined"))
        .as[(Long, String)].collect().toMap
      docs.forall { case (id, text) =>
        rebuilt(id) == text.toLowerCase.split("\\s+").mkString(" ")
      }
    }, n = 15)
  }

  test("chunking: every chunk within size; token count conserved at zero overlap") {
    import graft.operators.TextPrep
    check(Prop.forAll(docGen, Gen.chooseNum(2, 8)) { (docs, chunkSize) =>
      val df = docs.toDF("doc_id", "text")
      val chunks = TextPrep.chunkTokens(df, chunkSize = chunkSize, overlap = 0)
        .select($"doc_id", $"n_chunk_tokens").as[(Long, Int)].collect()
      val perDoc = chunks.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      chunks.forall { case (_, n) => n >= 1 && n <= chunkSize } &&
        docs.forall { case (id, text) =>
          perDoc(id) == text.split("\\s+").length
        }
    }, n = 15)
  }

  test("packing: totals conserved; pack ids monotone and defined by the cumsum") {
    import graft.operators.TextPrep
    check(Prop.forAll(docGen, Gen.chooseNum(3, 20)) { (docs, budget) =>
      val df = docs.toDF("doc_id", "text")
      val packed = TextPrep.packByBudget(df, lit("g"), budget = budget)
        .select($"doc_id", $"pack_id", $"n_tokens")
        .as[(Long, Long, Int)].collect().sortBy(_._1)
      val totalTokens = docs.map(_._2.split("\\s+").length).sum
      packed.map(_._3).sum == totalTokens &&
        packed.length == docs.length &&
        packed.head._2 == 0L &&
        // monotone in doc order (a later doc never lands in an earlier pack);
        // ids may skip when one doc spans several budgets — that is the
        // bounded-overflow contract, not contiguity
        packed.sliding(2).forall {
          case Array(a, b) => a._2 <= b._2
          case _ => true } &&
        // the defining equation: pack = exclusive running tokens / budget
        packed.forall { case (id, pid, _) =>
          val cumBefore = packed.filter(_._1 < id).map(_._3).sum
          cumBefore / budget == pid
        }
    }, n = 15)
  }

  test("topk aggregate == window row_number formulation for any data") {
    import org.apache.spark.sql.expressions.Window
    val rowsGen: Gen[Seq[(String, Int, Long)]] = for {
      n <- Gen.chooseNum(1, 60)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf("a", "b", "c")
        s <- Gen.chooseNum(0, 5) // small range forces score ties
      } yield (g, s))
    } yield rows.zipWithIndex.map { case ((g, s), i) => (g, s, i.toLong) }
    check(Prop.forAll(rowsGen, Gen.chooseNum(1, 5)) { (rows, k) =>
      val df = rows.toDF("g", "s", "id")
      val agg = df.groupBy($"g")
        .agg(graft.functions.TopK.topKByOrd($"id", $"s", $"id", k).as("top"))
        .as[(String, Seq[Long])].collect().toMap
      val win = df.withColumn("rn", row_number().over(
        Window.partitionBy($"g").orderBy($"s".desc, $"id")))
        .filter($"rn" <= k)
        .orderBy($"rn")
        .select($"g", $"id").as[(String, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
      agg.keySet == win.keySet && agg.keySet.forall(g => agg(g) == win(g))
    }, n = 15)
  }

  test("exact dedup: survivor count == distinct keys; dup counts sum to input") {
    check(Prop.forAll(docGen) { docs =>
      val df = docs.toDF("doc_id", "text")
      val dd = Dedup.exact(df, "text", "doc_id")
      val distinctTexts = docs.map(_._2).distinct.size
      dd.count() == distinctTexts &&
        dd.agg(sum($"n_dups")).head().getLong(0) == docs.size
    }, n = 20)
  }

  test("avg invariant: dailyAverage equals sum/count for any grouping") {
    val readingsGen = for {
      n <- Gen.chooseNum(1, 40)
      rows <- Gen.listOfN(n, for {
        k <- Gen.oneOf("a", "b", "c")
        d <- Gen.oneOf("2020-01-01", "2020-01-02")
        v <- Gen.chooseNum(-100.0, 150.0)
      } yield (k, d, v, v / 2))
    } yield rows
    check(Prop.forAll(readingsGen) { rows =>
      val df = rows.toDF("key", "wthr_date", "tmp_f", "tmp_c")
      val got = WeatherOps.dailyAverage(df)
        .select($"key", $"wthr_date", $"avg_tmp_f")
        .as[(String, String, Double)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      val expected = rows.groupBy(r => (r._1, r._2))
        .map { case (k, rs) => k -> rs.map(_._3).sum / rs.size }
      expected.forall { case (k, v) => math.abs(got(k) - v) < 1e-9 }
    }, n = 20)
  }

  test("join bounds: |inner| <= |left| * max-group(right); left keeps all rows") {
    val dimGen = Gen.listOfN(10, Gen.chooseNum(0L, 6L))
    check(Prop.forAll(dimGen, dimGen) { (leftKeys, rightKeys) =>
      val l = leftKeys.zipWithIndex.map { case (k, i) => (k, i) }.toDF("key", "lv")
      val r = rightKeys.zipWithIndex.map { case (k, i) => (k, i) }.toDF("key", "rv")
      val hist = r.groupBy($"key").agg(collect_list($"rv").as("weather_list"))
      val inner = WeatherOps.enrich(l, hist).count()
      val left = WeatherOps.enrichLeft(l, hist).count()
      inner <= l.count() && left == l.count()
    }, n = 20)
  }

  test("minhash estimate tracks exact jaccard within sketch error") {
    import graft.functions.TextFunctions._
    import org.apache.spark.sql.functions.{array_distinct, col}
    val pairGen = for {
      common <- Gen.chooseNum(5, 30)
      onlyA <- Gen.chooseNum(0, 15)
      onlyB <- Gen.chooseNum(0, 15)
    } yield (common, onlyA, onlyB)
    check(Prop.forAll(pairGen) { case (common, onlyA, onlyB) =>
      val shared = (0 until common).map(i => s"w$i c$i x$i")
      val ta = (shared ++ (0 until onlyA).map(i => s"a$i a$i a$i")).mkString(" ")
      val tb = (shared ++ (0 until onlyB).map(i => s"b$i b$i b$i")).mkString(" ")
      val sigs = Seq((0L, ta), (1L, tb)).toDF("doc_id", "text")
        .select(col("doc_id"),
          array_distinct(shingleHashes(tokens(col("text")), 3)).as("sh"))
        .withColumn("sig", minhashSig(col("sh"), 256))
      val rows = sigs.select("doc_id", "sh", "sig").collect()
        .map(r => r.getLong(0) -> ((r.getSeq[Long](1).toSet, r.getSeq[Long](2)))).toMap
      val (shA, sigA) = rows(0L); val (shB, sigB) = rows(1L)
      val exact = (shA & shB).size.toDouble / (shA | shB).size
      val est = sigA.zip(sigB).count { case (x, y) => x == y }.toDouble / 256
      math.abs(est - exact) < 0.2 // ~3σ for 256 hashes
    }, n = 15)
  }

  test("as-of join == local reference for any data incl. null keys/times and instant ties") {
    // guards the null-key/null-time window-grouping hazard (right-side rows
    // must be filtered, never carried) and the highest-ord instant-tie rule
    import graft.operators.AsOf
    val keyGen = Gen.oneOf[Option[Long]](None, Some(1L), Some(2L))
    val timeGen: Gen[Option[Long]] =
      Gen.oneOf(None +: (0L to 6L).map(t => Some(t): Option[Long]))
    val caseGen = for {
      nl <- Gen.chooseNum(1, 10)
      nr <- Gen.chooseNum(0, 12)
      lrows <- Gen.listOfN(nl, Gen.zip(keyGen, timeGen))
      rrows <- Gen.listOfN(nr, Gen.zip(keyGen, timeGen, Gen.chooseNum(0, 99)))
    } yield (
      lrows.zipWithIndex.map { case ((k: Option[Long], t: Option[Long]), i) =>
        (k, t, i.toLong) },
      rrows.zipWithIndex.map {
        case ((k: Option[Long], t: Option[Long], v: Int), i) =>
          (k, t, v.toLong, i.toLong) })
    check(Prop.forAll(caseGen) { case (lrows, rrows) =>
      val left = lrows.toDF("lk", "lt", "lv")
      val right = rrows.toDF("rk", "rt", "rv", "ord")
      def reference(l: (Option[Long], Option[Long], Long)): Option[Long] =
        (l._1, l._2) match {
          case (Some(k), Some(t)) =>
            val cands = rrows.filter(r =>
              r._1.contains(k) && r._2.exists(_ <= t))
            if (cands.isEmpty) None
            else Some(cands.maxBy(r => (r._2.get, r._4))._3)
          case _ => None // null key/time never matches (SQL equi-join rule)
        }
      val expectedInner = lrows.flatMap(l =>
        reference(l).map(rv => (l._3, Some(rv)))).toSet
      val expectedOuter = lrows.map(l => (l._3, reference(l))).toSet
      val gotInner = AsOf.join(left, right, col("lk"), col("rk"),
        col("lt"), col("rt"), Seq("rv"), col("ord"), inner = true)
        .select($"lv", $"rv").as[(Long, Option[Long])].collect()
        .map { case (lv, rv) => (lv, rv) }.toSet
      val gotOuter = AsOf.join(left, right, col("lk"), col("rk"),
        col("lt"), col("rt"), Seq("rv"), col("ord"), inner = false)
        .select($"lv", $"rv").as[(Long, Option[Long])].collect().toSet
      gotInner == expectedInner && gotOuter == expectedOuter
    }, n = 15)
  }

  test("forward/nearest as-of == local reference for any data incl. nulls and ties") {
    // the r14 direction surface under the same adversarial generator as
    // the backward property: null keys/times, instant ties (highest ord
    // wins), and the nearest gap-tie-to-backward rule
    import graft.operators.AsOf
    val keyGen = Gen.oneOf[Option[Long]](None, Some(1L), Some(2L))
    val timeGen: Gen[Option[Long]] =
      Gen.oneOf(None +: (0L to 6L).map(t => Some(t): Option[Long]))
    val caseGen = for {
      nl <- Gen.chooseNum(1, 10)
      nr <- Gen.chooseNum(0, 12)
      lrows <- Gen.listOfN(nl, Gen.zip(keyGen, timeGen))
      rrows <- Gen.listOfN(nr, Gen.zip(keyGen, timeGen, Gen.chooseNum(0, 99)))
    } yield (
      lrows.zipWithIndex.map { case ((k: Option[Long], t: Option[Long]), i) =>
        (k, t, i.toLong) },
      rrows.zipWithIndex.map {
        case ((k: Option[Long], t: Option[Long], v: Int), i) =>
          (k, t, v.toLong, i.toLong) })
    check(Prop.forAll(caseGen) { case (lrows, rrows) =>
      val left = lrows.toDF("lk", "lt", "lv")
      val right = rrows.toDF("rk", "rt", "rv", "ord")
      def bwd(k: Long, t: Long) = {
        val c = rrows.filter(r => r._1.contains(k) && r._2.exists(_ <= t))
        if (c.isEmpty) None else Some(c.maxBy(r => (r._2.get, r._4)))
      }
      def fwd(k: Long, t: Long) = {
        val c = rrows.filter(r => r._1.contains(k) && r._2.exists(_ >= t))
        if (c.isEmpty) None
        else Some(c.minBy(r => (r._2.get, -r._4))) // earliest; instant tie → max ord
      }
      def refFwd(l: (Option[Long], Option[Long], Long)): Option[Long] =
        (l._1, l._2) match {
          case (Some(k), Some(t)) => fwd(k, t).map(_._3)
          case _ => None
        }
      def refNear(l: (Option[Long], Option[Long], Long)): Option[Long] =
        (l._1, l._2) match {
          case (Some(k), Some(t)) => (bwd(k, t), fwd(k, t)) match {
            case (None, f) => f.map(_._3)
            case (b, None) => b.map(_._3)
            case (Some(b), Some(f)) =>
              // strictly smaller forward gap wins; ties → backward
              Some(if (f._2.get - t < t - b._2.get) f._3 else b._3)
          }
          case _ => None
        }
      val gotFwd = AsOf.joinForward(left, right, col("lk"), col("rk"),
        col("lt"), col("rt"), Seq("rv"), col("ord"), inner = false)
        .select($"lv", $"rv").as[(Long, Option[Long])].collect().toSet
      val gotNear = AsOf.joinNearest(left, right, col("lk"), col("rk"),
        col("lt"), col("rt"), Seq("rv"), col("ord"), inner = false)
        .select($"lv", $"rv").as[(Long, Option[Long])].collect().toSet
      gotFwd == lrows.map(l => (l._3, refFwd(l))).toSet &&
        gotNear == lrows.map(l => (l._3, refNear(l))).toSet
    }, n = 15)
  }

  test("joinWithin: bound-the-champion semantics for all three directions") {
    // the pandas tolerance composition: pick the direction's champion
    // FIRST, then null it if out of bounds — never fall through to a
    // farther in-bound candidate. Long-typed times, tolerance in the
    // same units.
    import graft.operators.AsOf
    val caseGen = for {
      nl <- Gen.chooseNum(1, 8)
      nr <- Gen.chooseNum(0, 10)
      lrows <- Gen.listOfN(nl, Gen.zip(Gen.chooseNum(1L, 2L), Gen.chooseNum(0L, 9L)))
      rrows <- Gen.listOfN(nr, Gen.zip(Gen.chooseNum(1L, 2L), Gen.chooseNum(0L, 9L)))
      tol <- Gen.chooseNum(0L, 4L)
      dirn <- Gen.oneOf("backward", "forward", "nearest")
    } yield (
      lrows.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) },
      rrows.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) },
      tol, dirn)
    check(Prop.forAll(caseGen) { case (lrows, rrows, tol, dirn) =>
      val left = lrows.toDF("lk", "lt", "lv")
      val right = rrows.toDF("rk", "rt", "rv")
      def champ(k: Long, t: Long): Option[(Long, Long, Long)] = dirn match {
        case "backward" =>
          val c = rrows.filter(r => r._1 == k && r._2 <= t)
          if (c.isEmpty) None else Some(c.maxBy(r => (r._2, r._3)))
        case "forward" =>
          val c = rrows.filter(r => r._1 == k && r._2 >= t)
          if (c.isEmpty) None else Some(c.minBy(r => (r._2, -r._3)))
        case _ =>
          val b = rrows.filter(r => r._1 == k && r._2 <= t)
            .sortBy(r => (r._2, r._3)).lastOption
          val f = rrows.filter(r => r._1 == k && r._2 >= t)
            .sortBy(r => (r._2, -r._3)).headOption
          (b, f) match {
            case (None, f2) => f2
            case (b2, None) => b2
            case (Some(b2), Some(f2)) =>
              Some(if (f2._2 - t < t - b2._2) f2 else b2)
          }
      }
      val expected = lrows.map { case (k, t, lv) =>
        (lv, champ(k, t).filter(r => math.abs(r._2 - t) <= tol).map(_._3))
      }.toSet
      val got = AsOf.joinWithin(left, right, col("lk"), col("rk"),
        col("lt"), col("rt"), Seq("rv"), col("rv"),
        tolerance = lit(tol), inner = false, direction = dirn)
        .select($"lv", $"rv").as[(Long, Option[Long])].collect().toSet
      got == expected
    }, n = 25)
  }

  test("frequentPairs == brute-force co-occurrence counting for any baskets") {
    import graft.operators.Baskets
    val caseGen = for {
      n <- Gen.chooseNum(0, 40)
      rows <- Gen.listOfN(n, Gen.zip(Gen.chooseNum(1L, 6L), Gen.chooseNum(1L, 8L)))
      minSup <- Gen.chooseNum(1L, 3L)
    } yield (rows, minSup)
    check(Prop.forAll(caseGen) { case (rows, minSup) =>
      // reference: distinct membership per basket, all a<b pairs, count
      val byBasket = rows.distinct.groupBy(_._1).view
        .mapValues(_.map(_._2).distinct.sorted).toMap
      val counts = byBasket.values.toSeq
        .flatMap(items => for {
          a <- items; b <- items if a < b
        } yield (a, b))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
        .filter(_._2 >= minSup)
      val expected = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.take(5)
        .map { case ((a, b), c) => (a, b, c) }.toSet
      val got = Baskets.frequentPairs(rows.toDF("b", "i"),
        col("b"), col("i"), minSupport = minSup, k = 5)
        .as[(Long, Long, Long)].collect().toSet
      got == expected
    }, n = 20)
  }

  test("quantilesExact == sorted-array order statistic for any data and ppm") {
    import graft.operators.Profile
    val caseGen = for {
      n <- Gen.chooseNum(1, 40)
      vals <- Gen.listOfN(n, Gen.chooseNum(-50, 50).map(_.toDouble / 7.0))
      ppms <- Gen.nonEmptyListOf(Gen.chooseNum(0L, 1000000L)).map(_.take(4))
    } yield (vals, ppms)
    check(Prop.forAll(caseGen) { case (vals, ppms) =>
      val sorted = vals.sorted
      val got = Profile.quantilesExact(
        vals.toDF("v").repartition(5), $"v", ppms)
        .as[(Long, Long, Double)].collect()
      got.length == ppms.distinct.length && got.forall { case (p, k, v) =>
        k == math.max(1L, (p * vals.length + 999999L) / 1000000L) &&
          v == sorted((k - 1).toInt)
      }
    }, n = 15)
  }

  test("sessionize: streaming session_window == batch sessions for any events") {
    // the parity the end-boundary alignment (Sessionize.stream's
    // max(ts)-as-session_end) exists to guarantee. Minute-granular
    // timestamps against a 10-minute gap deliberately generate exact-gap
    // boundaries: session_window merges at start == end (verified
    // empirically), matching the batch strict-> split rule, and ties on
    // (key, ts) exercise the ord-independence of the summary.
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    val base = java.sql.Timestamp.valueOf("2020-01-01 00:00:00").getTime
    val eventsGen: Gen[Seq[(String, Long)]] = for {
      n <- Gen.chooseNum(1, 25)
      rows <- Gen.listOfN(n, for {
        k <- Gen.oneOf("a", "b")
        m <- Gen.chooseNum(0, 90) // minute offset; exact 10-min gaps common
      } yield (k, m.toLong))
    } yield rows
    var iter = 0
    check(Prop.forAll(eventsGen) { rows =>
      iter += 1
      val data = rows.zipWithIndex.map { case ((k, m), i) =>
        (k, new java.sql.Timestamp(base + m * 60000L), i.toLong)
      }
      val batch = graft.operators.Sessionize.sessions(
        data.toDF("user", "ts", "ord"), "user", "ts", "ord",
        gap = lit(10L * 60L * 1000000L))
        .select($"user", $"session_start".cast("string"),
          $"session_end".cast("string"), $"n_events")
        .as[(String, String, String, Long)].collect().toSet

      val in = MemoryStream[(String, java.sql.Timestamp)]
      val name = s"sess_parity_$iter"
      val q = graft.operators.Sessionize.stream(
        in.toDF().toDF("user", "ts"), "user", "ts",
        gap = "10 minutes", watermarkDelay = "1 minute")
        .writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName(name)
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory(s"ckpt-$name").toString)
        .start()
      val streamed =
        try {
          in.addData(data.map { case (k, t, _) => (k, t) })
          q.processAllAvailable()
          // sentinel far in the future pushes the watermark past every real
          // session's close so append mode finalizes them all
          in.addData(("zz", new java.sql.Timestamp(base + 86400000L)))
          q.processAllAvailable()
          spark.table(name).collect()
            .filter(_.getString(0) != "zz")
            .map(r => (r.getString(0), r.getTimestamp(1).toString,
              r.getTimestamp(2).toString, r.getLong(3))).toSet
        } finally q.stop()
      // timestamp cast("string") renders "yyyy-MM-dd HH:mm:ss";
      // Timestamp.toString renders "...HH:mm:ss.0" — strip the subsecond
      val canon = streamed.map { case (k, s, e, n) =>
        (k, s.stripSuffix(".0"), e.stripSuffix(".0"), n) }
      canon == batch
    }, n = 8)
  }

  test("geohash neighbors share an edge with the origin cell") {
    check(Prop.forAll(Gen.chooseNum(-80.0, 80.0), Gen.chooseNum(-170.0, 170.0)) {
      (lat: Double, lng: Double) =>
        import graft.functions.Geohash
        val gh = Geohash.encode(lat, lng, 5)
        val (la, lb, na, nb) = Geohash.decodeBBox(gh)
        val eps = 1e-9
        val east = Geohash.decodeBBox(Geohash.neighbor(gh, 0, 1))
        val north = Geohash.decodeBBox(Geohash.neighbor(gh, 1, 0))
        math.abs(east._3 - nb) < eps &&   // east cell starts where this ends
          math.abs(north._1 - lb) < eps   // north cell starts at our top
    }, n = 50)
  }

  test("splitAssign: a partition of the corpus, stable under subsetting") {
    import graft.operators.Sampling
    val fracGen: Gen[Seq[(String, Double)]] = for {
      k <- Gen.chooseNum(2, 4)
      ws <- Gen.listOfN(k, Gen.chooseNum(1, 10))
    } yield {
      val total = ws.sum.toDouble
      ws.zipWithIndex.map { case (w, i) => s"s$i" -> w / total }
    }
    check(Prop.forAll(docGen, fracGen) { (docs, fracs) =>
      val df = docs.toDF("doc_id", "text")
      val all = Sampling.splitAssign(df, col("doc_id"), fracs)
        .select($"doc_id", $"split").as[(Long, String)].collect().toMap
      val names = fracs.map(_._1).toSet
      val sub = Sampling.splitAssign(
        df.filter($"doc_id" % 2 === 0), col("doc_id"), fracs)
        .select($"doc_id", $"split").as[(Long, String)].collect().toMap
      all.size == docs.size && all.values.forall(names.contains) &&
        sub.forall { case (id, s) => all(id) == s }
    }, n = 15)
  }

  test("dedupParagraphs: idempotent; kept == distinct paragraphs globally") {
    import graft.operators.TextPrep
    val paraPool =
      Seq("alpha beta", "gamma delta", "epsilon zeta", "eta theta", "iota kappa")
    val pdocGen: Gen[Seq[(Long, String)]] = for {
      n <- Gen.chooseNum(1, 8)
      docs <- Gen.listOfN(n,
        Gen.nonEmptyListOf(Gen.oneOf(paraPool)).map(_.mkString("\n\n")))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    check(Prop.forAll(pdocGen) { docs =>
      val df = docs.toDF("doc_id", "text")
      val o = TextPrep.dedupParagraphs(df)
        .select($"doc_id", $"text_dedup", $"n_paras", $"n_kept")
        .as[(Long, String, Long, Long)].collect()
      val twice = TextPrep.dedupParagraphs(
        df.sparkSession.createDataFrame(
          o.map(r => (r._1, r._2)).toSeq).toDF("doc_id", "text"))
        .select($"doc_id", $"text_dedup").as[(Long, String)].collect().toMap
      val distinctParas =
        docs.flatMap(_._2.split("\n\n")).filter(_.trim.nonEmpty).distinct.size
      o.forall { case (_, _, np, nk) => nk <= np } &&
        o.map(_._4).sum == distinctParas &&
        o.forall { case (id, t, _, _) => twice(id) == t }
    }, n = 15)
  }

  test("latest-per-key: idempotent and order-insensitive") {
    val rowsGen = for {
      n <- Gen.chooseNum(1, 30)
      rows <- Gen.listOfN(n, for {
        k <- Gen.oneOf("a", "b", "c", "d")
        o <- Gen.chooseNum(0L, 1000L)
      } yield (k, o, s"v$o"))
    } yield rows
    check(Prop.forAll(rowsGen) { rows =>
      val distinctOrd = rows.map(r => (r._1, r._2)).distinct
        .map { case (k, o) => (k, o, s"v$o") }
      val a = WeatherOps.latestPerKey(distinctOrd.toDF("key", "ord", "v"),
        Seq("key"), "ord").as[(String, Long, String)].collect().toSet
      val b = WeatherOps.latestPerKey(distinctOrd.reverse.toDF("key", "ord", "v"),
        Seq("key"), "ord").as[(String, Long, String)].collect().toSet
      a == b && a.size == distinctOrd.map(_._1).distinct.size
    }, n = 15)
  }

  test("scd2History: intervals chain per key, one open interval, payload intact") {
    val verGen = for {
      n <- Gen.chooseNum(1, 40)
      rows <- Gen.listOfN(n, for {
        k <- Gen.oneOf("a", "b", "c", "d")
        o <- Gen.chooseNum(0L, 1000L)
      } yield (k, o, s"v$o"))
    } yield rows.map(r => (r._1, r._2)).distinct // ord unique per key
      .map { case (k, o) => (k, o, s"v$o") }
    check(Prop.forAll(verGen) { rows =>
      val got = WeatherOps.scd2History(rows.toDF("key", "ord", "payload"),
          Seq("key"), "ord")
        .select($"key", $"payload", $"valid_from", $"valid_to", $"is_current")
        .as[(String, String, Long, Option[Long], Boolean)].collect().toSeq
      val byKey = got.groupBy(_._1)
      byKey.forall { case (k, vs) =>
        val sorted = vs.sortBy(_._3)
        val ords = rows.filter(_._1 == k).map(_._2).sorted
        // valid_from = the key's ords in order; valid_to chains to the
        // next; exactly the last interval is open and flagged current
        sorted.map(_._3) == ords &&
          sorted.init.zip(sorted.tail).forall { case (a, b) =>
            a._4.contains(b._3) && !a._5 } &&
          sorted.last._4.isEmpty && sorted.last._5 &&
          sorted.forall { case (_, p, vf, _, _) => p == s"v$vf" }
      } && got.length == rows.length
    }, n = 15)
  }

  test("dedupSubstrings == local reference (string shingles) for any corpus") {
    // local reference: string-shingle identity, sort-by-(id,pos) survivor,
    // removed set = union of excised [pos, pos+k) — a DIFFERENT formulation
    // (occurrence lists + index sets) than the engine's hash-identity
    // arg-min + merged-interval islands
    def reference(docs: Seq[(Long, String)], k: Int): Map[Long, (String, Long)] = {
      val toks = docs.map { case (id, t) =>
        id -> t.toLowerCase.split("\\s+").toSeq }.toMap
      val occ = docs.flatMap { case (id, _) =>
        val ts = toks(id)
        val shingles =
          if (ts.length < k) Seq(ts.mkString(" ") -> 0)
          else ts.sliding(k).map(_.mkString(" ")).zipWithIndex.toSeq
        shingles.map { case (sh, pos) => (sh, id, pos) }
      }
      val cuts = occ.groupBy(_._1).values.filter(_.size >= 2)
        .flatMap(_.sortBy(o => (o._2, o._3)).tail)
      val removed = cuts.toSeq.groupBy(_._2).map { case (id, os) =>
        id -> os.flatMap(o => o._3 until math.min(o._3 + k, toks(id).length)).toSet
      }
      docs.map { case (id, _) =>
        val rm = removed.getOrElse(id, Set.empty[Int])
        val kept = toks(id).zipWithIndex.collect {
          case (t, i) if !rm.contains(i) => t }
        id -> (kept.mkString(" "), rm.size.toLong)
      }.toMap
    }
    val vocab = Gen.oneOf("w1", "w2", "w3", "w4") // tiny vocab → dense repeats
    val corpusGen: Gen[Seq[(Long, String)]] = for {
      n <- Gen.chooseNum(1, 8)
      texts <- Gen.listOfN(n,
        Gen.nonEmptyListOf(vocab).map(_.mkString(" ")))
    } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    check(Prop.forAll(corpusGen, Gen.chooseNum(2, 4)) { (docs, k) =>
      val got = Dedup.dedupSubstrings(docs.toDF("doc_id", "text"), k = k)
        .select($"doc_id", $"text_dedup", $"n_removed")
        .as[(Long, String, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      got == reference(docs, k)
    }, n = 15)
  }
}
