package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Column profiling for pipeline observability: one aggregation pass over
  * the table produces per-column row/null/distinct counts and min/max.
  *
  * Scale shape: ALL columns' statistics come from a single `agg(...)` — one
  * scan, one (single-row) aggregation, then a driver-free unpivot of that
  * row into (column, stats) rows via an `explode` of a literal-built array.
  * With `exactDistinct = true` Spark plans multiple count-distincts via an
  * Expand (rows × profiled columns) — exact and oracle-checkable, the right
  * default for audits; flip to false for the one-pass HLL sketch
  * (`approx_count_distinct`) when profiling hundreds of columns at 100 TB.
  *
  * min/max are emitted twice, typed: `min_num`/`max_num` (DOUBLE, null for
  * non-numeric columns) and `min_str`/`max_str` (binary-collation string
  * order) — a single stringly-typed pair would hash-diverge across engines
  * on float formatting.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
      exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val schema = df.schema
    def statCols(c: String): Seq[Column] = {
      val isNum = schema(c).dataType.isInstanceOf[NumericType]
      val isStr = schema(c).dataType == StringType
      val nd =
        if (exactDistinct) count_distinct(col(c))
        else approx_count_distinct(col(c))
      Seq(
        count(col(c)).as(s"__n_$c"),
        nd.as(s"__nd_$c"),
        (if (isNum) min(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"__minn_$c"),
        (if (isNum) max(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"__maxn_$c"),
        (if (isStr) min(col(c)) else lit(null).cast("string")).as(s"__mins_$c"),
        (if (isStr) max(col(c)) else lit(null).cast("string")).as(s"__maxs_$c"))
    }
    // one shared total-rows aggregate, referenced by every column's struct
    // (a per-column count(1) would widen the agg by N identical fields)
    val aggregated = df.agg(
      count(lit(1)).as("__rows"),
      cols.flatMap(statCols): _*)
    val rows = array(cols.map(c => struct(
      lit(c).as("column"),
      col(s"__n_$c").as("n_nonnull"),
      (col("__rows") - col(s"__n_$c")).as("n_null"),
      col(s"__nd_$c").as("n_distinct"),
      col(s"__minn_$c").as("min_num"),
      col(s"__maxn_$c").as("max_num"),
      col(s"__mins_$c").as("min_str"),
      col(s"__maxs_$c").as("max_str"))): _*)
    aggregated.select(explode(rows).as("p")).select(col("p.*"))
  }

  /** Join/group-key skew profile — the pre-flight check before keying a
    * 100 TB shuffle on a column: row/distinct counts, the hottest key's
    * frequency and share, and the top-k keys as a deterministic
    * `key:count` list (count desc, key asc — the q_ngram_topk string-tie
    * contract, so the output is engine-portable and oracle-checkable).
    *
    * One groupBy(key) count (partial-combined; the shuffle carries one
    * row per distinct key per partition) + one single-row aggregate whose
    * top-k is the k-bounded string-tie TopK heap — no window, no sort,
    * no driver-side key list. `top1_share` is a single int/int division
    * (bit-portable). Null keys — the CANONICAL skew cause — profile as
    * the `<null>` stratum: the TopK aggregate skips null ties, so an
    * un-coalesced null hottest key would count in `top1_share` yet vanish
    * from `top_keys`. */
  def keySkew(df: DataFrame, keyCol: Column, topK: Int = 5): DataFrame = {
    import graft.functions.TopK
    require(topK >= 1)
    val counts = df.groupBy(
      coalesce(keyCol.cast("string"), lit("<null>")).as("k"))
      .agg(count(lit(1)).as("c"))
    counts.agg(
      sum(col("c")).as("n_rows"),
      count(lit(1)).as("n_distinct"),
      max(col("c")).as("max_count"),
      TopK.topKByOrdStrTie(
        concat(col("k"), lit(":"), col("c")), col("c"), col("k"), topK)
        .as("__top"))
      .select(
        col("n_rows"), col("n_distinct"), col("max_count"),
        (col("max_count").cast("double") / col("n_rows").cast("double"))
          .as("top1_share"),
        concat_ws(",", col("__top")).as("top_keys"))
  }

  /** Equi-width histogram over a numeric column — the distribution
    * snapshot a pipeline audit reads before choosing filters or strata:
    * `buckets` equal-width bins over [lo, hi], EVERY bin emitted
    * (including empty ones — gaps are the signal), rows outside the
    * range dropped (profile them separately via [[profile]]'s min/max,
    * which is how lo/hi get chosen).
    *
    * Bin assignment is `least(buckets−1, floor((x − lo) · buckets /
    * (hi − lo)))` over doubles — a fixed-shape IEEE expression evaluated
    * in the same operation order by any engine (the
    * [[TimeSeries.interpolate]] bit-portability stance), with the
    * closed upper edge folded into the last bin (the standard
    * equi-width convention).
    *
    * Scale: one scan + one map-side-combined count per bin (≤ `buckets`
    * groups), then a broadcast left join against the `buckets`-row bin
    * spine. Nothing driver-side, nothing proportional to the data.
    *
    * Output: `(bucket, lo_edge, hi_edge, n)`, bucket 0-based. */
  def histogram(df: DataFrame, valueCol: Column, lo: Double, hi: Double,
      buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    val spark = df.sparkSession
    val x = valueCol.cast("double")
    val counts = df.filter(x >= lo && x <= hi)
      .select(least(lit((buckets - 1).toLong),
        floor((x - lit(lo)) * lit(buckets) / (lit(hi) - lit(lo))))
        .as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    spark.range(buckets).select(col("id").as("bucket"))
      .join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        (lit(lo) + col("bucket") * (lit(hi) - lit(lo)) / lit(buckets))
          .as("lo_edge"),
        (lit(lo) + (col("bucket") + 1) * (lit(hi) - lit(lo)) / lit(buckets))
          .as("hi_edge"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Distribution DRIFT between two slices of a corpus — the PSI
    * (population stability index) evidence table a pipeline audits
    * before trusting that today's crawl looks like yesterday's: both
    * slices binned by the SAME [[histogram]] assignment, per-bin counts
    * plus the add-one-smoothed log-ratio
    *
    *   ln_scaled(b) = round(10⁶ · [ln((n_a+1)/(N_a+B)) − ln((n_b+1)/(N_b+B))])
    *
    * and the exact integer numerator `diff_num = n_a·N_b − n_b·N_a`
    * (the (p−q) term multiplied through by N_a·N_b — no float enters
    * the gated table). PSI = Σ_b diff_num(b)·ln_scaled(b) /
    * (N_a·N_b·10⁶), computed by the caller OUTSIDE the exact table.
    *
    * Auditability (the [[TextAnalysis.dsirSelect]] gate pattern): counts
    * and diff_num are re-derivable from raw data by any engine; the ln
    * column is engine-side (libm last-ulp differences make a recomputed
    * round(10⁶·ln) occasionally disagree), so consumers needing an
    * external gate stage this table and have the auditor verify the
    * count evidence before trusting the ln column — ProfileSpec
    * recomputes the ln itself.
    *
    * Scale: one scan + a (bucket, slice) map-side-combined count into
    * ≤ 2B rows, collected (bounded codebook class) for the driver-side
    * ln; output is the B-row spine. Rows outside [lo, hi] are dropped
    * on BOTH slices — same contract as [[histogram]].
    *
    * NULL rule: a row whose `isA` predicate evaluates NULL counts on
    * the B side (the predicate is coalesced to false internally), so
    * every in-range row lands in exactly one slice — an SQL mirror must
    * spell the B filter `isA IS DISTINCT FROM true`, not `NOT isA`
    * (which drops NULL rows entirely).
    *
    * Output: (bucket, n_a, n_b, diff_num, ln_scaled), every bin
    * emitted. */
  def histogramDrift(df: DataFrame, isA: Column, valueCol: Column,
      lo: Double, hi: Double, buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    val spark = df.sparkSession
    val x = valueCol.cast("double")
    val counts = df.filter(x >= lo && x <= hi)
      .select(least(lit((buckets - 1).toLong),
        floor((x - lit(lo)) * lit(buckets) / (lit(hi) - lit(lo))))
        .as("bucket"), coalesce(isA, lit(false)).as("a"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("a"), 0L).otherwise(1L)).as("n_b"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap // ≤ buckets rows — bounded codebook class
    val nA = counts.values.map(_._1).sum
    val nB = counts.values.map(_._2).sum
    val rows = (0L until buckets.toLong).map { b =>
      val (na, nb) = counts.getOrElse(b, (0L, 0L))
      val ln = math.log((na + 1.0) / (nA + buckets.toDouble)) -
        math.log((nb + 1.0) / (nB + buckets.toDouble))
      (b, na, nb, na * nB - nb * nA, math.round(ln * 1e6))
    }
    spark.createDataFrame(rows.toIndexedSeq)
      .toDF("bucket", "n_a", "n_b", "diff_num", "ln_scaled")
  }

  /** EXACT order-statistic quantiles — the value at rank
    * `k = max(1, ceil(ppm·n / 10^6))` (1-based ascending) for each
    * requested probability, given in PARTS-PER-MILLION so the target
    * rank is pure integer arithmetic (`(ppm·n + 999999) div 10^6`) that
    * any engine reproduces bit-exactly; interpolating quantile
    * definitions are not ULP-portable (the q_median_exact lesson).
    * Unlike `approx_percentile` this is the true order statistic — the
    * winsorization / outlier-clipping cutoff a data pipeline wants to
    * be reproducible across engines and runs.
    *
    * Scale: ranking rides [[Sampling.prefixSum]]'s two-phase distributed
    * scheme (range exchange + per-partition window + broadcast offsets
    * — never a single-task global window), one extra count job for `n`,
    * and the cutoff extraction filters |distinct ranks| rows. NULL
    * values are excluded (SQL aggregate convention). Ties across a
    * range-partition boundary are safe: any tie order is consistent
    * with value order, and the k-th VALUE of a multiset is unique.
    *
    * Output: (ppm, k, value), one row per requested ppm. */
  def quantilesExact(df: DataFrame, valueCol: Column,
      ppms: Seq[Long]): DataFrame = {
    require(ppms.nonEmpty && ppms.forall(p => p >= 0L && p <= 1000000L),
      s"ppms must be in [0, 1e6], got $ppms")
    val spark = df.sparkSession
    val rows = df.select(valueCol.as("__x")).filter(col("__x").isNotNull)
    // rank FIRST, count from the ranked relation: prefixSum persists its
    // numbered rows (its totals-collect materializes the cache), so this
    // count reads the cache instead of paying a second full input scan
    val ranked = Sampling.prefixSum(rows, col("__x"), lit(1L))
      .withColumn("__rank", col("cum_before") + lit(1L))
    val n = ranked.count()
    require(n > 0, "quantilesExact over an empty (or all-NULL) column")
    val pk = ppms.distinct.map(p => p -> math.max(1L, (p * n + 999999L) / 1000000L))
    val cut = ranked.filter(col("__rank").isin(pk.map(_._2).distinct: _*))
      .select(col("__rank"), col("__x"))
    import spark.implicits._
    val wanted = pk.toDF("ppm", "__rank")
    wanted.join(cut, Seq("__rank"))
      .select(col("ppm"), col("__rank").as("k"), col("__x").as("value"))
  }

  /** Winsorize: clamp `valueCol` into the exact [pLow, pHigh] order-
    * statistic cutoffs from [[quantilesExact]] (ppm probabilities). The
    * two cutoffs broadcast as a 1-row relation onto the input — the
    * clamp itself is a narrow map-side projection, no second shuffle of
    * the data. Output: input columns + `<out>` (clamped value; NULL
    * stays NULL). */
  def winsorize(df: DataFrame, valueCol: Column, ppmLow: Long, ppmHigh: Long,
      out: String = "winsorized"): DataFrame = {
    require(ppmLow <= ppmHigh, s"need ppmLow <= ppmHigh, got $ppmLow > $ppmHigh")
    val cuts = quantilesExact(df, valueCol, Seq(ppmLow, ppmHigh))
    val lohi = cuts.groupBy().agg(
      min(when(col("ppm") === ppmLow, col("value"))).as("__lo"),
      max(when(col("ppm") === ppmHigh, col("value"))).as("__hi"))
    df.crossJoin(broadcast(lohi))
      // explicit NULL pass-through: Spark's greatest/least IGNORE nulls
      // (greatest(NULL, lo) = lo — a NULL value would silently clamp to
      // the low cutoff), and engines disagree on that rule, so the
      // operator pins it
      .withColumn(out, when(valueCol.isNull, lit(null))
        .otherwise(least(greatest(valueCol, col("__lo")), col("__hi"))))
      .drop("__lo", "__hi")
  }

  /** Free pipeline telemetry: attach named rule counters to a DataFrame
    * via `observe` — per-rule violation counts (and the total row count)
    * are collected AS the plan's existing action runs, with zero extra
    * scan. The expectations pattern: a quality gate that REPORTS what it
    * would drop costs a second corpus pass if done as a separate
    * aggregation query; as observed metrics it rides the write/count the
    * pipeline already pays — at 100 TB that second pass is the entire
    * price of observability, and this makes it zero.
    *
    * `rules` are boolean pass-predicates (same shape as
    * [[TextAnalysis.qualityRules]]' columns); each metric counts the rows
    * FAILING its rule. Read the metrics from the returned [[Observation]]
    * AFTER an action: `obs.get("failed_<name>")`. Works on batch plans;
    * for streams use the same `observe` call and read
    * `QueryProgressEvent.progress.observedMetrics` per micro-batch.
    *
    * The returned DataFrame is the input unchanged (observe is a no-op
    * pass-through node) — this instruments, it does not filter; compose
    * with `.filter(allRules)` downstream as usual. */
  def observed(df: DataFrame, name: String,
      rules: Map[String, Column]): (DataFrame, org.apache.spark.sql.Observation) = {
    require(rules.nonEmpty, "observed: at least one rule")
    val obs = org.apache.spark.sql.Observation(name)
    // NULL-safe failure counting: a rule predicate over null data (e.g.
    // `length(text) > 0` on a null text) evaluates to NULL, and `!NULL`
    // is still NULL — `count(when(!pass, 1))` would then count the row
    // neither as passing nor failing, silently UNDER-counting violations
    // on exactly the rows a quality gate most wants to flag. Coalescing
    // the pass-predicate to false first makes NULL read as a failure.
    val metrics = count(lit(1)).as("n_rows") +:
      rules.toSeq.sortBy(_._1).map { case (n, pass) =>
        count(when(!coalesce(pass, lit(false)), 1)).as(s"failed_$n")
      }
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
