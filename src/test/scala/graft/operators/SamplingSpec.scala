package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSuite {
  import spark.implicits._

  private def docs = graft.Tables.documents(spark, sf0001)

  test("hashSample: deterministic, rate-accurate, content-keyed") {
    val a = Sampling.hashSample(docs, col("doc_id"), 0.3)
      .select($"doc_id").as[Long].collect().toSet
    val b = Sampling.hashSample(docs, col("doc_id"), 0.3)
      .select($"doc_id").as[Long].collect().toSet
    assert(a == b, "same input → same sample")
    val rate = a.size.toDouble / docs.count()
    assert(rate > 0.2 && rate < 0.4, s"rate=$rate (expect ~0.3)")
    // monotone: a higher rate strictly extends the sample (nested samples)
    val bigger = Sampling.hashSample(docs, col("doc_id"), 0.6)
      .select($"doc_id").as[Long].collect().toSet
    assert(a.subsetOf(bigger), "samples must be nested by rate")
  }

  test("stratifiedSample: per-class rates, unknown strata dropped") {
    val sampled = Sampling.stratifiedSample(docs, col("lang"), col("doc_id"),
      Map("en" -> 1.0, "de" -> 0.0, "fr" -> 0.5))
    val counts = sampled.groupBy($"lang").count().as[(String, Long)].collect().toMap
    val full = docs.groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(counts("en") == full("en"), "rate 1.0 keeps everything")
    assert(!counts.contains("de"), "rate 0.0 drops the class")
    assert(!counts.contains("es") && !counts.contains("zh"), "unlisted strata dropped")
    val frRate = counts.getOrElse("fr", 0L).toDouble / full("fr")
    assert(frRate > 0.3 && frRate < 0.7, s"fr rate=$frRate (expect ~0.5)")
  }

  test("stratifiedSample: md5 rule agrees with weightedSample; Xx variant shares hashSample membership") {
    val rates = Map("en" -> 0.5, "fr" -> 0.25)
    // same (key, rate) rule → identical membership across the two operators
    val a = Sampling.stratifiedSample(docs, col("lang"), col("doc_id"), rates)
      .select($"doc_id").as[Long].collect().toSet
    val b = Sampling.weightedSample(docs, col("lang"), rates, col("doc_id"))
      .select($"doc_id").as[Long].collect().toSet
    assert(a == b, "md5 stratified sample must equal weightedSample at the same rates")
    // the xxhash64 path shares hashSample's rounded-threshold predicate
    val xx = Sampling.stratifiedSampleXx(docs, col("lang"), col("doc_id"),
      Map("en" -> 0.3)).select($"doc_id").as[Long].collect().toSet
    val hs = Sampling.hashSample(docs.filter($"lang" === "en"), col("doc_id"), 0.3)
      .select($"doc_id").as[Long].collect().toSet
    assert(xx == hs, "Xx variant must share hashSample membership bit-for-bit")
  }

  test("hexThreshold: boundary renderings") {
    assert(Sampling.hexThreshold(1.0) == "g", "keep-all sentinel above hex")
    assert(Sampling.hexThreshold(0.0) == "00000000", "rate 0 keeps nothing")
    assert(Sampling.hexThreshold(0.5) == "80000000")
    // every 8-char lowercase hex string sorts below the sentinel
    assert("ffffffff" < "g" && "00000000" < "g")
  }

  test("weightedSample: md5 membership is deterministic, rated, and nested") {
    val rates = Map("en" -> 0.5, "de" -> 1.0, "fr" -> 0.0)
    val s1 = Sampling.weightedSample(docs, col("lang"), rates, col("doc_id"))
    val ids = s1.select($"doc_id").as[Long].collect().toSet
    assert(ids == Sampling.weightedSample(docs, col("lang"), rates, col("doc_id"))
      .select($"doc_id").as[Long].collect().toSet)
    val counts = s1.groupBy($"lang").count().as[(String, Long)].collect().toMap
    val full = docs.groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(counts("de") == full("de"), "rate 1.0 (sentinel path) keeps all")
    assert(!counts.contains("fr"), "rate 0.0 keeps none")
    assert(!counts.contains("es"), "unlisted group dropped")
    val enRate = counts("en").toDouble / full("en")
    assert(enRate > 0.35 && enRate < 0.65, s"en rate=$enRate (expect ~0.5)")
    // nested by rate: md5 membership is threshold-monotone
    val smaller = Sampling.weightedSample(docs, col("lang"),
      Map("en" -> 0.2), col("doc_id")).select($"doc_id").as[Long].collect().toSet
    assert(smaller.subsetOf(ids))
  }

  test("mixToShares: bottleneck group kept whole, others near target shares") {
    val weights = Map("en" -> 2, "de" -> 1, "es" -> 1, "zh" -> 1)
    val full = docs.groupBy($"lang").count().as[(String, Long)].collect().toMap
    val mixed = Sampling.mixToShares(docs, col("lang"), weights, col("doc_id"))
    val counts = mixed.groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(!counts.contains("fr"), "unweighted group dropped")
    // bottleneck = argmin n_g/share_g; its rate is exactly 1.0
    val totalW = weights.values.sum.toDouble
    val bottleneck = weights.keys.minBy(g => full(g) / (weights(g) / totalW))
    assert(counts(bottleneck) == full(bottleneck), "bottleneck group kept whole")
    // achieved composition tracks the target shares (Bernoulli noise-tolerant)
    val kept = counts.values.sum.toDouble
    weights.foreach { case (g, wt) =>
      val achieved = counts.getOrElse(g, 0L) / kept
      val target = wt / totalW
      assert(math.abs(achieved - target) < 0.10,
        s"$g achieved=$achieved target=$target")
    }
    // deterministic
    assert(mixed.select($"doc_id").as[Long].collect().toSet ==
      Sampling.mixToShares(docs, col("lang"), weights, col("doc_id"))
        .select($"doc_id").as[Long].collect().toSet)
  }

  test("temperatureMix: α=1 is a no-op, α=0.5 flattens toward tail groups") {
    val full = docs.groupBy($"lang").count().as[(String, Long)].collect().toMap
    // α = 1: w = n so every rate is exactly 1 — identity sample
    val id1 = Sampling.temperatureMix(docs, col("lang"), 1.0, col("doc_id"))
    assert(id1.count() == docs.count())
    // α = 0.5: smallest group (arg-min n/w = n^0.5) kept whole; achieved
    // composition tracks p_g ∝ sqrt(n_g) within Bernoulli noise
    val mixed = Sampling.temperatureMix(docs, col("lang"), 0.5, col("doc_id"))
    val counts = mixed.groupBy($"lang").count().as[(String, Long)].collect().toMap
    val smallest = full.keys.minBy(full)
    assert(counts(smallest) == full(smallest), "rarest group kept whole")
    val sumW = full.values.map(math.sqrt(_).toDouble).sum
    val kept = counts.values.sum.toDouble
    full.keys.foreach { g =>
      val achieved = counts.getOrElse(g, 0L) / kept
      val target = math.sqrt(full(g).toDouble) / sumW
      assert(math.abs(achieved - target) < 0.10,
        s"$g achieved=$achieved target=$target")
    }
    // flattening: the kept head/tail ratio shrinks vs the raw corpus
    val head = full.keys.maxBy(full)
    assert(counts(head).toDouble / counts(smallest) <
      full(head).toDouble / full(smallest))
    // deterministic membership
    assert(mixed.select($"doc_id").as[Long].collect().toSet ==
      Sampling.temperatureMix(docs, col("lang"), 0.5, col("doc_id"))
        .select($"doc_id").as[Long].collect().toSet)
  }

  test("temperatureMix: a NULL group participates — no group is dropped") {
    // the no-group-dropped contract includes the NULL group: it forms its
    // own count group upstream, so the membership join back must be
    // null-safe (a === join would silently drop every NULL-group row)
    val withNull = docs.withColumn("lang",
      when($"doc_id" % 7 === 0, lit(null: String)).otherwise($"lang"))
    val full = withNull.groupBy($"lang").count()
      .as[(Option[String], Long)].collect().toMap
    assert(full.contains(None), "fixture must actually have a NULL group")
    val kept = Sampling.temperatureMix(withNull, col("lang"), 0.5, col("doc_id"))
      .groupBy($"lang").count().as[(Option[String], Long)].collect().toMap
    assert(kept.contains(None), s"NULL group dropped: $kept")
    // and it is sampled by the same rate rule, not just passed through:
    // within Bernoulli noise of its sqrt-share target
    val sumW = full.values.map(math.sqrt(_).toDouble).sum
    val target = math.sqrt(full(None).toDouble) / sumW
    val achieved = kept(None).toDouble / kept.values.sum
    assert(math.abs(achieved - target) < 0.15,
      s"null-group achieved=$achieved target=$target")
    // α = 1 identity must keep every NULL-group row too
    assert(Sampling.temperatureMix(withNull, col("lang"), 1.0, col("doc_id"))
      .count() == withNull.count())
  }

  test("temperatureMix: general-α membership equals the rate rule re-derived by hand") {
    // the catalog face pins α = 0.5 (sqrt); this locks the pow path: for
    // α = 0.3, recompute every per-group threshold driver-side with the
    // SAME op order (min(n/n^α) · n^α / n) and replay the md5 rule row by
    // row — membership must agree exactly
    val alpha = 0.3
    val full = docs.groupBy($"lang").count().as[(String, Long)].collect().toMap
    val mn = full.values.map(n => n.toDouble / math.pow(n.toDouble, alpha)).min
    val thr: Map[String, String] = full.map { case (g, n) =>
      val rate = math.min(1.0, mn * math.pow(n.toDouble, alpha) / n.toDouble)
      val t = math.round(rate * 4294967296.0d)
      g -> (if (t >= 4294967296L) "g" else f"$t%08x")
    }
    val expected = docs.select($"doc_id", $"lang",
        substring(md5($"doc_id".cast("string")), 1, 8).as("h"))
      .as[(Long, String, String)].collect()
      .filter { case (_, g, h) => h < thr(g) }.map(_._1).toSet
    val got = Sampling.temperatureMix(docs, col("lang"), alpha, col("doc_id"))
      .select($"doc_id").as[Long].collect().toSet
    assert(got == expected)
  }

  test("epochsMix: copy counts and fractional membership re-derived by hand") {
    val epochs = Map("en" -> 0.75, "de" -> 2.5, "fr" -> 1.0, "zh" -> 3.25)
    val out = Sampling.epochsMix(docs, col("lang"), epochs, col("doc_id"))
      .select($"doc_id", $"lang", $"epoch").as[(Long, String, Long)].collect()
    // per-row replay of the contract: n = floor(e) + (md5 rule), epochs
    // are exactly 0..n-1
    val perDoc = out.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    val all = docs.select($"doc_id", $"lang",
        substring(md5($"doc_id".cast("string")), 1, 8).as("h"))
      .as[(Long, String, String)].collect()
    all.foreach { case (id, g, h) =>
      epochs.get(g) match {
        case None => assert(!perDoc.contains(id), s"dropped-group doc $id leaked")
        case Some(e) =>
          val t = math.round((e - math.floor(e)) * 4294967296.0d)
          val expect = math.floor(e).toLong +
            (if (t >= 4294967296L || h < f"$t%08x") 1L else 0L)
          assert(perDoc.getOrElse(id, Seq.empty) == (0L until expect),
            s"doc $id ($g, e=$e): got ${perDoc.get(id)}, want 0 until $expect")
      }
    }
    // es is absent from the spec map: every es row must be gone
    assert(out.forall(_._2 != "es"))
    // integral epochs replicate exactly — fr rows appear once, epoch 0
    assert(out.filter(_._2 == "fr").forall(_._3 == 0L))
    // determinism
    val again = Sampling.epochsMix(docs, col("lang"), epochs, col("doc_id"))
      .select($"doc_id", $"lang", $"epoch").as[(Long, String, Long)].collect()
    assert(again.sorted.toSeq == out.sorted.toSeq)
    // scale shape: no aggregate, no join — one narrow projection + explode
    val p = Sampling.epochsMix(docs, col("lang"), epochs, col("doc_id"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"epochsMix must stay map-side:\n${p.take(1500)}")
    intercept[IllegalArgumentException] {
      Sampling.epochsMix(docs, col("lang"), Map("en" -> 17.0), col("doc_id"))
    }
  }

  test("scoreStrata: identical to a window ntile on (score, tie)") {
    val scored = graft.operators.TextAnalysis.qualityScore(docs)
      .select($"doc_id", $"quality")
    for (k <- Seq(1, 7, 10, 600)) { // 600 > n exercises the n<k branch
      val strata = Sampling.scoreStrata(scored, col("quality"), col("doc_id"), k)
        .select($"doc_id", $"stratum").as[(Long, Int)].collect().toMap
      val expected = scored.withColumn("stratum",
        ntile(k).over(org.apache.spark.sql.expressions.Window
          .orderBy($"quality", $"doc_id")))
        .select($"doc_id", $"stratum").as[(Long, Int)].collect().toMap
      assert(strata == expected, s"k=$k")
    }
  }

  test("scoreStrata: exact under a dominant score value (hot-score skew)") {
    // 50% of rows share ONE score — the saturation-pile-up shape that made
    // the old per-score row_number window a single-task sort. Assignment
    // must still be bit-identical to the global ntile.
    val scored = spark.range(0, 2000).toDF("doc_id")
      .withColumn("quality",
        when($"doc_id" % 2 === 0, lit(1.0d)).otherwise(rand(7) * 0.9))
    for (k <- Seq(3, 10)) {
      val strata = Sampling.scoreStrata(scored, col("quality"), col("doc_id"), k)
        .select($"doc_id", $"stratum").as[(Long, Int)].collect().toMap
      val expected = scored.withColumn("stratum",
        ntile(k).over(org.apache.spark.sql.expressions.Window
          .orderBy($"quality", $"doc_id")))
        .select($"doc_id", $"stratum").as[(Long, Int)].collect().toMap
      assert(strata == expected, s"k=$k")
    }
    // behavioral skew check: the hot score value spreads across partitions
    // (range partitioning splits it by tie) instead of landing in one task
    val spread = Sampling.scoreStrata(scored, col("quality"), col("doc_id"), 10)
      .filter($"quality" === 1.0d)
      .groupBy(spark_partition_id().as("p")).count()
      .select(max($"count")).head().getLong(0)
    assert(spread < 1000L,
      s"hot score must spread across range partitions; max partition rows = $spread")
    // parquet-staged numbering path: identical assignment, table on disk
    val dir = java.nio.file.Files.createTempDirectory("graft-strata").toString
    try {
      val staged = Sampling.scoreStrata(scored, col("quality"), col("doc_id"),
        10, stagingDir = Some(dir))
        .select($"doc_id", $"stratum").as[(Long, Int)].collect().toMap
      val default = Sampling.scoreStrata(scored, col("quality"), col("doc_id"), 10)
        .select($"doc_id", $"stratum").as[(Long, Int)].collect().toMap
      assert(staged == default, "staged strata must equal the persist path")
      assert(new java.io.File(dir).listFiles()
        .exists(f => f.isDirectory && f.getName.startsWith("strata_numbered_")))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      ()
    }
  }

  test("splitAssign: total, disjoint, near-fractional, growth-stable") {
    val fracs = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val assigned = Sampling.splitAssign(docs, col("doc_id"), fracs)
    val n = docs.count()
    assert(assigned.count() == n, "every row gets exactly one split")
    val counts = assigned.groupBy($"split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    val trainRate = counts.getOrElse("train", 0L).toDouble / n
    assert(trainRate > 0.7 && trainRate < 0.9, s"train rate=$trainRate")
    // the property that makes eval sets stable: a row's split never depends
    // on which OTHER rows are present
    val subset = Sampling.splitAssign(
      docs.filter($"doc_id" % 3 === 0), col("doc_id"), fracs)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val fullMap = assigned.select($"doc_id", $"split")
      .as[(Long, String)].collect().toMap
    subset.foreach { case (id, sp) =>
      assert(fullMap(id) == sp, s"doc $id reassigned by corpus change")
    }
    // degenerate single split
    val one = Sampling.splitAssign(docs, col("doc_id"), Seq("all" -> 1.0))
    assert(one.filter($"split" =!= "all").count() == 0)
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(docs, col("doc_id"), Seq("a" -> 0.5, "b" -> 0.6))
    }
  }

  test("bottomKPerKey: exactly k per key (or all when group smaller), stable") {
    val s1 = Sampling.bottomKPerKey(docs, col("lang"), col("doc_id"), k = 10)
    val sizes = s1.groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(sizes.values.forall(_ <= 10))
    val s2 = Sampling.bottomKPerKey(docs, col("lang"), col("doc_id"), k = 10)
      .select($"doc_id").as[Long].collect().toSet
    assert(s2 == s1.select($"doc_id").as[Long].collect().toSet)
    // mergeable bottom-k: bottom-k of a half is a superset of the half's
    // contribution to the global bottom-k
    val half = docs.filter($"doc_id" % 2 === 0)
    val halfK = Sampling.bottomKPerKey(half, col("lang"), col("doc_id"), k = 10)
      .select($"doc_id").as[Long].collect().toSet
    assert((s2.filter(_ % 2 == 0) -- halfK).isEmpty)
    // scale shape: k-bounded aggregate, never a per-key window sort
    val p = s1.queryExecution.executedPlan.toString
    assert(p.contains("topk_by_ord") && !p.contains("Window"),
      s"bottom-k must plan the TopK aggregate:\n${p.take(1500)}")
  }

  test("prefixSum: equals the single-partition window reference, any partitioning") {
    val rows = (1L to 500L).map(i => (i * 3, (i % 7) + 1)) // unique, gappy order keys
    val df = rows.toDF("id", "w").repartition(13)
    val got = Sampling.prefixSum(df, col("id"), col("w"))
      .select($"id", $"cum_before").as[(Long, Long)].collect().toMap
    var acc = 0L
    rows.sortBy(_._1).foreach { case (id, w) =>
      assert(got(id) == acc, s"id=$id: got ${got(id)}, want $acc")
      acc += w
    }
    // no single-task window: the cumsum window must be PARTITIONED (by
    // the range-partition id), never a global empty-partition-spec window
    val plan = Sampling.prefixSum(df, col("id"), col("w"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("__pid"),
      s"window must partition by __pid:\n${plan.take(800)}")
  }

  test("prefixSum: consistent when the range sample is NON-exhaustive (ADVICE r13)") {
    // 20k rows >> rangeExchange sample (~100/partition): the range
    // partitioner's boundaries now come from a genuine sample and vary
    // per execution. The staged windowed relation (prefix_sum_local)
    // guarantees the collected per-partition totals and the returned
    // rows read ONE partitioning — without it, exec-1 offsets applied to
    // exec-2 partition ids silently corrupt cum_before in this regime.
    val n = 20000L
    val rows = (1L to n).map(i => (i * 7 % (n * 7 + 1), (i % 5) + 1))
    val df = rows.toDF("id", "w").repartition(32)
    val got = Sampling.prefixSum(df, col("id"), col("w"))
      .select($"id", $"cum_before").as[(Long, Long)].collect().toMap
    var acc = 0L
    rows.sortBy(_._1).foreach { case (id, w) =>
      assert(got(id) == acc, s"id=$id: got ${got(id)}, want $acc")
      acc += w
    }
    // durable-staging twin: same values through the parquet staging path
    Staging.withDir(spark, java.nio.file.Files
      .createTempDirectory("graft-prefix-sum").toString) { dir =>
      val staged = Sampling.prefixSum(df, col("id"), col("w"),
        stagingDir = Some(dir))
        .select($"id", $"cum_before").as[(Long, Long)].collect().toMap
      assert(staged == got)
    }
  }

  test("negativeSample: deterministic draws, self/same-label excluded, ≤ k per query") {
    val rows = (0L until 60L).map(i => (i, s"lab${i % 3}"))
    val df = rows.toDF("id", "lab")
    val got = Sampling.negativeSample(df, col("id"), col("lab"), k = 4)
      .as[(Long, Int, Long)].collect()
    val byQ = got.groupBy(_._1)
    assert(byQ.values.forall(_.length <= 4), "at most k draws survive")
    assert(got.nonEmpty && byQ.size > 30, s"most queries get negatives: ${byQ.size}")
    val lab = rows.toMap
    got.foreach { case (q, _, n) =>
      assert(n != q && lab(n) != lab(q), s"excluded draw survived: ($q, $n)")
    }
    // deterministic across partitionings
    val again = Sampling.negativeSample(df.repartition(13), col("id"),
      col("lab"), k = 4).as[(Long, Int, Long)].collect().toSet
    assert(again == got.toSet)
    // null-label queries and candidates never pair
    val withNull = (rows :+ ((99L, null.asInstanceOf[String])))
      .toDF("id", "lab")
    val g2 = Sampling.negativeSample(withNull, col("id"), col("lab"), k = 4)
      .as[(Long, Int, Long)].collect()
    assert(!g2.exists(r => r._1 == 99L || r._3 == 99L))
  }

  test("ppsSystematic: exactly k picks, PPS-proportional, zero weights never drawn") {
    val rows = Seq((1L, 1000L), (2L, 10L), (3L, 0L), (4L, 990L)) ++
      (10L to 200L).map(i => (i, 5L))
    val df = rows.toDF("id", "w").repartition(7)
    val k = 50
    val got = Sampling.ppsSystematic(df, col("id"), col("w"), k)
      .select($"id", $"n_picks").as[(Long, Long)].collect().toMap
    assert(got.values.sum == k, s"sum of picks must be exactly k: $got")
    assert(!got.contains(3L), "zero-weight row drawn")
    // row 1 holds 1000/2955 of the mass → expect ≈ k·w/W picks
    val W = rows.map(_._2).sum.toDouble
    assert(math.abs(got(1L) - k * 1000L / W) <= 1.0, s"got(1)=${got(1L)}")
    assert(got(1L) > 1L, "heavy row must be drawn with replacement (multiple picks)")
  }

  test("ppsSystematic: deterministic across partitionings; empty when W < k") {
    val rows = (1L to 300L).map(i => (i, (i % 11) + 1))
    val a = Sampling.ppsSystematic(rows.toDF("id", "w").repartition(1),
      col("id"), col("w"), 40).select($"id", $"n_picks")
      .as[(Long, Long)].collect().toSet
    val b = Sampling.ppsSystematic(rows.toDF("id", "w").repartition(23),
      col("id"), col("w"), 40).select($"id", $"n_picks")
      .as[(Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
    val tiny = Seq((1L, 2L), (2L, 3L)).toDF("id", "w")
    assert(Sampling.ppsSystematic(tiny, col("id"), col("w"), 100).count() == 0)
  }
}
