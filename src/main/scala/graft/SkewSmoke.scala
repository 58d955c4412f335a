package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Measured skew stress for the guarded pair-mining paths (SCALE.md
  * §Measured scaling).
  *
  * [[ScaleSmoke]] proves sub-quadratic growth on ORGANIC data; this main
  * proves the skew GUARDS by behavior: a boilerplate sentence is prepended
  * to a growing share of the corpus (0% → 50%), planting one shingle whose
  * document frequency is half the corpus and hot LSH band buckets — the
  * exact adversarial shape `dfCap` / `maxBucket` exist for. Wall time must
  * stay flat as the hot share grows: an unguarded miner would go quadratic
  * in the hot share (df² pair expansion), so a blow-up here means a guard
  * stopped working even if plan-shape asserts still pass.
  *
  * Exit 1 if any operator's t(50%) exceeds 3× its t(0%) (flat + noise;
  * the quadratic signature would be ≫10×).
  */
object SkewSmoke {

  private val boiler =
    "all rights reserved copyright notice and standard disclaimer follow"

  private def skewed(docs: DataFrame, pct: Int): DataFrame =
    docs.withColumn("text",
      when(pmod(xxhash64(col("doc_id")), lit(100L)) < pct,
        concat(lit(boiler + " "), col("text"))).otherwise(col("text")))

  /** Plant a dominant SCORE value on `pct`% of rows — the hot-score shape
    * scoreStrata's range-exchange exists for (a per-score window would
    * single-task the hot value's sort). */
  private def hotScore(docs: DataFrame, pct: Int): DataFrame =
    docs.withColumn("score",
      when(pmod(xxhash64(col("doc_id")), lit(100L)) < pct, lit(1.0d))
        .otherwise(pmod(xxhash64(col("doc_id"), lit(3L)), lit(1000000L))
          .cast("double") / 1000000.0d))

  private val ops: Seq[(String, (DataFrame, Int) => DataFrame)] = Seq(
    "minhash" -> ((d: DataFrame, pct: Int) =>
      Dedup.minhashPairs(skewed(d, pct), bands = 32, rowsPerBand = 2,
        threshold = 0.5)),
    "ngram" -> ((d: DataFrame, pct: Int) =>
      Dedup.ngramJaccardPairs(skewed(d, pct), blockCol = col("lang"),
        threshold = 0.5)),
    "strata" -> ((d: DataFrame, pct: Int) =>
      graft.operators.Sampling.scoreStrata(
        hotScore(d.select(col("doc_id")), pct), col("score"), col("doc_id"),
        k = 10)),
    // r12: a hot NAME (identical string on pct% of rows → one giant
    // block in BOTH passes) against blockedLevenshtein's maxBlock guard —
    // unguarded, the hot block is a |hot|² candidate explosion; guarded,
    // it is dropped entirely and wall time stays flat
    "fuzzy" -> ((d: DataFrame, pct: Int) => {
      val named = d.select(col("doc_id"),
        when(pmod(xxhash64(col("doc_id")), lit(100L)) < pct,
          lit("all rights reserved boilerplate entity name"))
          .otherwise(md5(col("doc_id").cast("string"))).as("name"))
      graft.operators.Fuzzy.blockedLevenshtein(named, col("doc_id"),
        col("name"), maxDist = 1, prefixLen = 4, maxBlock = Some(200))
    }),
    // r8: dense_rank()<=k through the RewriteWindowTopK distinct-key leg
    // (the session installs GraftExtensions below, and the firing is
    // asserted before timing) — a dominant score value must collapse in
    // the distinct partial agg map-side, not assemble anywhere
    "dense_topk" -> ((d: DataFrame, pct: Int) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("score").desc)
      hotScore(d.select(col("doc_id"), col("lang")), pct)
        .withColumn("rk", dense_rank().over(w))
        .filter(col("rk") <= 3)
    }))

  def main(args: Array[String]): Unit = {
    val shares = Seq(0, 10, 30, 50)
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the dense_topk case stresses the REWRITTEN plan, not the window
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id"), col("lang"), col("text"))

    // guard the guard: if the rewrite stopped firing, this smoke would
    // silently time the window form instead of the distinct-key leg
    ops.collectFirst { case ("dense_topk", op) =>
      val p = op(docs, 50).queryExecution.optimizedPlan.toString
      require(p.contains("__graft_key"),
        s"dense_topk must take the rewritten form:\n${p.take(1200)}")
    }

    def time(op: (DataFrame, Int) => DataFrame, pct: Int): Double =
      (0 until math.max(1, iters)).map { _ =>
        spark.catalog.clearCache() // pinned signature persists (ScaleSmoke note)
        val t0 = System.nanoTime()
        op(docs, pct).count()
        (System.nanoTime() - t0) / 1e9
      }.min

    // warm-up for the codegen cache
    ops.foreach { case (_, op) =>
      spark.catalog.clearCache()
      op(docs.limit(500), 0).count()
    }

    var violations = 0
    ops.foreach { case (name, op) =>
      val ts = shares.map(p => p -> time(op, p))
      val flat = ts.last._2 / math.max(ts.head._2, 1e-9)
      val ok = flat < 3.0
      if (!ok) violations += 1
      val cells = ts.map { case (p, t) => f"hot$p%d%%=$t%.2fs" }.mkString(" ")
      println(f"$name%-8s $cells  x(0%%→50%%)=$flat%.2f " +
        (if (ok) "OK" else "GUARD BROKEN?"))
    }
    spark.stop()
    if (violations > 0) {
      System.err.println(s"[skew-smoke] $violations op(s) blew up under skew")
      sys.exit(1)
    }
  }
}
