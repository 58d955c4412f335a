package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * All three operators are pure functions of the data (no RNG state): the
  * same input always yields the same sample, on any cluster, under retries,
  * across partitionings — the property that makes pipeline runs reproducible
  * and samples joinable across stages (e.g., sample docs, then fetch their
  * embeddings by the same predicate).
  */
object Sampling {

  /** Keep a row iff `xxhash64(key) mod 10^6 < round(rate·10^6)` — a
    * deterministic Bernoulli sample keyed on content, not position. Narrow
    * op, fully pushdown-friendly (the predicate sits right on the scan).
    * The threshold rounds (not truncates) so the same (key, rate) predicate
    * is shared bit-for-bit with [[stratifiedSampleXx]] — samples taken by
    * either operator at the same rate stay joinable. */
  def hashSample(df: DataFrame, keyCol: Column, rate: Double, seed: Long = 42L): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    df.filter(pmod(xxhash64(keyCol, lit(seed)), lit(1000000L)) <
      lit(math.round(rate * 1000000.0)))
  }

  /** Per-stratum hash sample with an individual rate per stratum value
    * (class rebalancing: downsample the head class, keep the tail). The
    * per-row decision is the engine-portable md5 rule ([[hexUniform]] over
    * `keyCol` vs the stratum's [[hexThreshold]]) — identical membership is
    * re-derivable from ANY engine with a standard md5, so the sample is
    * oracle-checkable row for row, and stays joinable with samples taken
    * by [[weightedSample]]/[[splitAssign]] at the same rates. Strata
    * absent from `rates` are dropped. Narrow map-side filter. */
  def stratifiedSample(df: DataFrame, strataCol: Column, keyCol: Column,
      rates: Map[String, Double]): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0),
      s"all rates must be in [0,1], got $rates")
    val thresholds = rates.map { case (k, r) => k -> hexThreshold(r) }
    val thr = element_at(typedLit(thresholds), strataCol)
    df.filter(thr.isNotNull && hexUniform(keyCol) < thr)
  }

  /** [[stratifiedSample]] on the cheaper engine-internal xxhash64 rule
    * (same rounded threshold as [[hashSample]], no md5 hex round-trip).
    * Use when per-row cost matters more than external auditability —
    * membership is deterministic but only re-derivable inside Spark. */
  def stratifiedSampleXx(df: DataFrame, strataCol: Column, keyCol: Column,
      rates: Map[String, Double], seed: Long = 42L): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0),
      s"all rates must be in [0,1], got $rates")
    val thresholds: Map[String, Long] =
      rates.map { case (k, r) => k -> math.round(r * 1000000.0) }
    val threshold = element_at(typedLit(thresholds), strataCol)
    df.filter(threshold.isNotNull &&
      pmod(xxhash64(keyCol, lit(seed)), lit(1000000L)) < threshold)
  }

  /** First 8 hex chars of `md5(key rendered as string)` — a deterministic
    * uniform in [0, 2³²) that evaluates BYTE-IDENTICALLY in any engine with
    * a standard md5 (Spark, DuckDB, Trino, Postgres…): padded fixed-width
    * lowercase hex, so lexicographic comparison == numeric comparison.
    * [[hashSample]]'s xxhash64 is cheaper per row (no hex round-trip) but
    * engine-specific; this variant is the cross-engine-auditable one — an
    * external system can re-derive exactly which rows a sample contains. */
  def hexUniform(keyCol: Column): Column =
    substring(md5(keyCol.cast("string")), 1, 8)

  /** Render a keep-rate as the [[hexUniform]] threshold string: keep a row
    * iff `hexUniform(key) < threshold`. rate ≥ 1.0 returns "g", which is
    * lexicographically above every 8-char hex string (hex digits end at
    * 'f'), i.e. keep-all — avoiding the 9-char "100000000" whose string
    * compare would invert. */
  def hexThreshold(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    val t = math.round(rate * 4294967296.0d)
    if (t >= 4294967296L) "g" else f"$t%08x"
  }

  /** Per-group deterministic Bernoulli sample with engine-portable
    * membership: keep a row iff `hexUniform(idCol) < hexThreshold(rate)` for
    * its group's rate. Same contract as [[stratifiedSample]] (groups absent
    * from `rates` are dropped) but auditable from ANY engine — the oracle
    * can hash-check exact membership, not just row counts. Narrow map-side
    * filter; the only cost over xxhash64 is the md5. */
  def weightedSample(df: DataFrame, groupCol: Column, rates: Map[String, Double],
      idCol: Column): DataFrame = {
    val thresholds = rates.map { case (g, r) => g -> hexThreshold(r) }
    val thr = element_at(typedLit(thresholds), groupCol)
    df.filter(thr.isNotNull && hexUniform(idCol) < thr)
  }

  /** Data mixing to a target group composition: given integer `weights`
    * (e.g. web=3, code=2, books=1), compute per-group keep-rates that yield
    * the LARGEST expected sample distributed proportionally to the weights,
    * then take the [[weightedSample]]-style md5 sample at those rates.
    *
    * The bottleneck group (smallest `n_g / share_g`) is kept whole
    * (rate 1.0); every other group is downsampled to match its share. Rates
    * are derived ENGINE-SIDE from one count aggregate — no caller-supplied
    * magic numbers — and every arithmetic step is a deterministic IEEE
    * double op on exact integer inputs (counts and integer weights; the
    * normalizing sum is integer, so no float-sum reassociation), which is
    * what keeps membership engine-portable. Groups absent from `weights`
    * are dropped.
    *
    * Scale: one partial-agg count over the data + a broadcast join of the
    * tiny per-group threshold relation back onto the scan; the filter stays
    * map-side.
    */
  def mixToShares(df: DataFrame, groupCol: Column, weights: Map[String, Int],
      idCol: Column): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      s"weights must be positive, got $weights")
    val totalW = weights.values.map(_.toLong).sum
    val w = typedLit(weights.map { case (g, x) => g -> x.toLong })
    val counts = df.select(groupCol.as("g"))
      .filter(element_at(w, col("g")).isNotNull)
      .groupBy(col("g")).agg(count(lit(1)).as("n"))
      .withColumn("share", element_at(w, col("g")).cast("double") / lit(totalW.toDouble))
    // scale = min_g n_g / share_g → the largest total that keeps every
    // group's demand ≤ its population; rate_g = scale·share_g / n_g ≤ 1
    val scale = counts.agg(min(col("n").cast("double") / col("share")).as("sc"))
    val thr = counts.crossJoin(scale)
      .withColumn("t", round(least(lit(1.0d),
        col("sc") * col("share") / col("n").cast("double")) * lit(4294967296.0d))
        .cast("long"))
      .select(col("g"), col("t"))
    df.join(broadcast(thr), groupCol === col("g"))
      .filter(col("t") >= lit(4294967296L) ||
        hexUniform(idCol) < format_string("%08x", col("t")))
      .drop("g", "t")
  }

  /** Temperature-scaled mixing — the multilingual-LM α-sampling rule:
    * resample so group g's share is proportional to `n_g^alpha` instead of
    * `n_g` (α < 1 flattens the distribution toward the tail groups — the
    * published fix for head languages/sources swamping a multilingual or
    * multi-source pretraining mix; α = 1 is a no-op, α → 0 approaches
    * equal shares). Unlike [[mixToShares]] the target composition is
    * DERIVED from the data, so no group list is supplied and no group is
    * dropped.
    *
    * Same largest-feasible-sample construction as [[mixToShares]], with
    * the normalizing sum algebraically cancelled: with w_g = n_g^α,
    * rate_g = min_h(n_h / w_h) · w_g / n_g — the arg-min group is kept
    * whole and every other group meets the α-share exactly. Because the
    * Σw_g never appears, NO float summation exists anywhere in the rate
    * derivation: each threshold is a chain of correctly-rounded IEEE
    * scalar ops on exact integer counts, which is what keeps membership
    * engine-portable (the oracle re-derives it verbatim). α = 0.5 — the
    * common published choice — routes through `sqrt`, correctly rounded
    * per IEEE 754 in every engine; other α use `pow`, whose last-ulp
    * behavior is libm-specific (fine for pipelines, but the hash-gated
    * catalog face pins α = 0.5 for that reason).
    *
    * Scale: identical to [[mixToShares]] — one partial-agg count, a
    * broadcast of the per-group thresholds, map-side membership filter. */
  def temperatureMix(df: DataFrame, groupCol: Column, alpha: Double,
      idCol: Column): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    val counts = df.groupBy(groupCol.as("g")).agg(count(lit(1)).as("n"))
    val wCol = if (alpha == 0.5) sqrt(col("n").cast("double"))
      else pow(col("n").cast("double"), lit(alpha))
    val weighted = counts.withColumn("w", wCol)
    val mn = weighted.agg(min(col("n").cast("double") / col("w")).as("mn"))
    val thr = weighted.crossJoin(mn)
      .withColumn("t", round(least(lit(1.0d),
        col("mn") * col("w") / col("n").cast("double")) * lit(4294967296.0d))
        .cast("long"))
      .select(col("g"), col("t"))
    // null-SAFE equality (<=>): the groupBy upstream forms a count group
    // for a NULL groupCol, and the no-group-dropped contract above must
    // hold for it too — a plain === membership join is null-rejecting and
    // would silently drop every NULL-group row on the way back.
    df.join(broadcast(thr), groupCol <=> col("g"))
      .filter(col("t") >= lit(4294967296L) ||
        hexUniform(idCol) < format_string("%08x", col("t")))
      .drop("g", "t")
  }

  /** Epoch-based mixing — UPSAMPLING with replacement, the data-mix spec
    * published LLM pretraining recipes are written in ("2.3 epochs of
    * source X"): every row of group g appears `floor(e_g)` times, plus one
    * more copy iff `hexUniform(id) < frac(e_g)` — the same deterministic
    * md5 hex-threshold membership as the downsampling family, so repeated
    * runs and external engines agree on WHICH rows carry the extra copy,
    * not merely how many. The output adds `epoch` (0-based copy index) so
    * downstream sharding/shuffling can spread the copies. Groups absent
    * from `epochs` are dropped (the [[mixToShares]] contract); `e_g = 0`
    * drops the group. Repeat factors are sanity-capped at 16: real mix
    * specs are single digits, and an unchecked constant multiplies the
    * corpus unbounded.
    *
    * Scale: NO aggregate and NO join anywhere — the per-group factor is a
    * plan-time map literal, so the whole operator is one narrow map-side
    * projection + explode; at 100 TB the copies stream from the scan
    * directly into the downstream shuffle/write without any extra pass
    * (contrast [[mixToShares]]/[[temperatureMix]], which need one count
    * aggregate because their rates are data-derived). */
  def epochsMix(df: DataFrame, groupCol: Column, epochs: Map[String, Double],
      idCol: Column): DataFrame = {
    require(epochs.nonEmpty && epochs.values.forall(e => e >= 0.0 && e <= 16.0),
      s"epoch factors must be in [0, 16], got $epochs")
    val m = typedLit(epochs)
    val e = element_at(m, groupCol.cast("string"))
    val base = floor(e).cast("long")
    // frac < 1 ⇒ t < 2³² always; the t ≥ 2³² keep-all arm below is kept
    // anyway so the mixToShares membership shape (and its oracle SQL)
    // carries over verbatim
    val t = round((e - floor(e)) * lit(4294967296.0d)).cast("long")
    val extra = when(t >= lit(4294967296L) ||
      hexUniform(idCol) < format_string("%08x", t), 1L).otherwise(0L)
    df.withColumn("__n",
        when(e.isNotNull, base + extra).otherwise(lit(0L)))
      .filter(col("__n") > 0L)
      .withColumn("epoch", explode(sequence(lit(0L), col("__n") - 1L)))
      .drop("__n")
  }

  /** Exact global `ntile(k)` over `(scoreCol, tieCol)` WITHOUT a global
    * sort: quality-decile stratification for curriculum/mixing decisions.
    *
    * A bare `ntile().over(Window.orderBy(...))` funnels every row through
    * ONE task (Spark warns "No Partition Defined"). An earlier revision of
    * this operator distributed the rank as per-score offsets + a
    * `row_number` window PARTITIONED BY the score — which re-creates the
    * same straggler one level down: quality scores concentrate (rounding,
    * and degenerate corpora pile up at exactly 0.0/1.0, the gate's
    * saturation points), and every row sharing the dominant score value
    * lands in ONE task's sort. This form has no per-value task anywhere:
    *  1. range-exchange on `(score, tie)` — the sampled range partitioner
    *     splits a hot score value across partitions BY TIE, so partition
    *     sizes track `n/partitions` regardless of the score distribution,
    *     and partitions are totally ordered;
    *  2. per-partition local row numbers — one streaming pass, no
    *     cross-row state beyond a counter (`mapPartitions`: Spark has no
    *     narrow zip-with-index, and a window here would re-shuffle);
    *  3. per-partition row counts → cumulative offsets — a single-task
    *     window over ≤ `spark.sql.shuffle.partitions` aggregated rows,
    *     broadcast back. Global rank = partition offset + local number,
    *     and the SQL-standard ntile bucket is a closed form of
    *     (rank, n, k) in exact integer arithmetic.
    *
    * The numbered relation is materialized ([[Staging.stage]]): offsets
    * and the final join must read the SAME numbering — the range
    * partitioner samples its bounds per execution, so an unmaterialized
    * diamond could compute offsets for one set of bounds and ranks for
    * another. (Ranks are invariant to WHERE the bounds fall — partitions
    * are totally ordered — so run-to-run output is still deterministic.)
    * Default is `persist(MEMORY_AND_DISK)` with the usual
    * CacheManager-lifetime caveat; at 100 TB pass `stagingDir` ([[Staging]]
    * contract: unique per-invocation subdir, eager write, caller deletes
    * the dir only after the result is fully consumed) and the
    * numbered relation becomes an explicit parquet staging table instead
    * (once __pid/__rn are materialized columns, any re-read partitioning
    * is correct).
    *
    * Output: input columns + `stratum` (1..k), bit-identical to
    * `ntile(k) OVER (ORDER BY score, tie)` in any SQL engine, provided
    * `(score, tie)` is unique per row (make `tie` a row id — with
    * duplicate (score, tie) pairs ANY engine's assignment among the
    * duplicates is arbitrary).
    */
  def scoreStrata(df: DataFrame, scoreCol: Column, tieCol: Column, k: Int,
      stagingDir: Option[String] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(!df.columns.exists(Set("__pid", "__c", "__off", "__rn", "__rank", "__n")),
      "input uses a reserved __ column name")
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(parts, scoreCol.asc, tieCol.asc)
      .sortWithinPartitions(scoreCol.asc, tieCol.asc)
    val outSchema = ranged.schema
      .add("__pid", org.apache.spark.sql.types.IntegerType, nullable = false)
      .add("__rn", org.apache.spark.sql.types.LongType, nullable = false)
    val numbered = Staging.stage(
      ranged.mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var i = 0L
        it.map { r =>
          i += 1
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ pid :+ i)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema)),
      stagingDir, "strata_numbered")
    val wCum = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = numbered.groupBy(col("__pid")).agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(sum(col("__c")).over(wCum), lit(0L)))
    val total = offsets.agg(sum(col("__c")).as("__n"))
    numbered
      .join(broadcast(offsets.select(col("__pid"), col("__off"))), Seq("__pid"))
      .crossJoin(broadcast(total))
      .withColumn("__rank", col("__off") + col("__rn"))
      // ntile: first (n % k) buckets hold (n div k + 1) rows, the rest
      // (n div k); q=0 (n<k) is covered entirely by the WHEN branch
      .withColumn("stratum", expr(
        s"""CAST(CASE WHEN __rank <= ((__n div $k) + 1) * (__n % $k)
           |  THEN (__rank + (__n div $k)) div ((__n div $k) + 1)
           |  ELSE (__n % $k) +
           |    (__rank - ((__n div $k) + 1) * (__n % $k) + (__n div $k) - 1)
           |      div (__n div $k)
           |END AS INT)""".stripMargin))
      .drop("__pid", "__off", "__rn", "__rank", "__n")
  }

  /** Deterministic train/val/test (or any n-way) split assignment: each row
    * gets the FIRST split whose cumulative [[hexThreshold]] exceeds its
    * [[hexUniform]] draw. Membership is a pure function of `idCol` — adding
    * or removing other rows never reassigns a row (the property that keeps
    * eval sets stable as the corpus grows), and the rule is engine-portable:
    * any system with md5 can re-derive the assignment, so the split can be
    * audited (and oracle-checked) outside Spark. Narrow map-side projection.
    *
    * `fractions` is ordered (first entry claims the lowest hash range);
    * values must be positive and sum to 1 (±1e-9). */
  def splitAssign(df: DataFrame, idCol: Column,
      fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0.0),
      s"fractions must be positive, got $fractions")
    require(fractions.map(_._1).distinct.size == fractions.size,
      s"duplicate split names in $fractions")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${fractions.map(_._2).sum}")
    val cuts = fractions.map(_._2).scanLeft(0.0)(_ + _).tail.init
      .map(hexThreshold) // last split needs no cut: it catches the rest
    val u = hexUniform(idCol)
    val names = fractions.map(_._1)
    val split = cuts.zip(names).foldLeft(Option.empty[Column]) {
      case (acc, (thr, name)) =>
        Some(acc.fold(when(u < lit(thr), lit(name)))(
          _.when(u < lit(thr), lit(name))))
    }.fold(lit(names.last))(_.otherwise(lit(names.last)))
    df.withColumn("split", split)
  }

  /** Deterministic per-key "reservoir": the k rows with the smallest
    * content hash per key — a uniform-ish fixed-size sample per group that
    * is stable across runs and mergeable (the k smallest of a union is
    * computable from each side's k smallest — the classic distributed
    * bottom-k sketch).
    *
    * Selection is the k-bounded [[graft.functions.TopK]] aggregate of the
    * NEGATED hash (bottom-k = top-k of the negation), not a
    * `row_number()` window: the window formulation sorts EVERY row of
    * every key, which at corpus scale is a per-key O(n log n) sort to
    * keep k rows; the aggregate ships ≤ k rows per (partition, key). The
    * hash is compared in double precision (low 11 bits fold away), with
    * ties — including any 53-bit collisions — resolved by ascending
    * `idCol`, so the rule stays a pure deterministic function of content.
    * `idCol` must be integral (the aggregate's LONG tie contract). */
  def bottomKPerKey(df: DataFrame, keyCol: Column, idCol: Column, k: Int,
      seed: Long = 42L): DataFrame = {
    import graft.functions.TopK
    val payload = struct(df.columns.toIndexedSeq.map(col): _*)
    df.groupBy(keyCol.as("__g"))
      .agg(TopK.topKByOrd(payload,
        negate(xxhash64(idCol, lit(seed)).cast("double")), idCol, k).as("__top"))
      .select(explode(col("__top")).as("__e"))
      .select(col("__e.*"))
  }

  /** Distributed exclusive prefix sum: append `cumCol` = Σ of `valueCol`
    * over all rows strictly before this one in `orderCol` order.
    *
    * A bare `Window.orderBy(orderCol)` computes the same thing in ONE
    * task (Spark's no-partition-spec window collapses the data — the
    * single-task-window anti-pattern this repo's plan audits hunt). This
    * is the classic two-phase scan instead:
    *  1. range-repartition by `orderCol` and cumsum WITHIN each range
    *     partition (a partitioned window — parallel);
    *  2. lift each partition's total to the driver (≤ shuffle-partition-
    *     count rows — the bounded-collect class), prefix-fold them, and
    *     broadcast the per-partition offsets back onto the rows.
    * Partition boundaries come from range-sampling and vary run to run,
    * but the result never does: local cumsum + that partition's offset
    * telescopes to the global prefix regardless of where the cuts fall.
    *
    * The windowed relation is MATERIALIZED ([[Staging.stage]]) before the
    * totals collect: the range partitioner samples its bounds per
    * execution (seeded by the per-execution RDD id), so an unmaterialized
    * diamond could collect totals for one set of bounds and compute the
    * output rows under another — exec-1 offsets applied to exec-2
    * partition ids would silently corrupt `cumCol` once the bound sample
    * is non-exhaustive (> ~100 rows per partition). Same rule, and same
    * fix, as [[scoreStrata]]'s numbered relation; once `__pid`/`__local`
    * are materialized columns, any re-read partitioning is correct.
    * Default is `persist(MEMORY_AND_DISK)`; at 100 TB pass `stagingDir`
    * ([[Staging]] contract) for a durable parquet staging table.
    *
    * Plan note: Catalyst does not know `spark_partition_id()` IS the
    * range partitioning, so ENSURE_REQUIREMENTS inserts a hash exchange
    * on `__pid` before the window — physically a second narrow shuffle
    * whose rows are already co-located. The declarative form is kept
    * anyway (codegen'd window, no imperative per-partition scan); if
    * that exchange ever matters at scale, a `mapPartitions` running
    * cumsum over the sorted range partitions drops it at the cost of
    * leaving whole-stage codegen.
    *
    * `orderCol` values must be UNIQUE (they define the order; a tie would
    * make "strictly before" ambiguous) and `valueCol` integral — integer
    * sums are exact and associative, which is what makes the two-phase
    * reassociation legal (a float version would drift by reassociation).
    */
  def prefixSum(df: DataFrame, orderCol: Column, valueCol: Column,
      cumCol: String = "cum_before", stagingDir: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    val nb = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val ranged = df.repartitionByRange(nb, orderCol)
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy(col("__pid")).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    // materialized: totals (collected below) and the returned rows MUST
    // read the same __pid assignment — see the scaladoc's diamond note
    val local = Staging.stage(ranged.withColumn("__local",
      coalesce(sum(valueCol.cast("long")).over(w), lit(0L))),
      stagingDir, "prefix_sum_local")
    // per-partition totals: tiny (≤ nb rows), prefix-folded on the driver
    val totals = local.groupBy(col("__pid"))
      .agg(sum(valueCol.cast("long")).as("__t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (pid, t)) =>
      (pid, acc + t)
    }.init.zip(totals).map { case ((_, off), (pid, _)) => pid -> off }.toMap
    val offCol = element_at(typedLit(offsets), col("__pid"))
    local.withColumn(cumCol, col("__local") + coalesce(offCol, lit(0L)))
      .drop("__pid", "__local")
  }

  /** Deterministic NEGATIVE sampling for contrastive training pairs —
    * for every row (as query), up to `k` pseudo-random negatives drawn
    * from the whole table, excluding self and same-label rows (the
    * in-batch-negatives data-prep step of contrastive/embedding
    * training, made reproducible): draw j of query q indexes the
    * candidate ranked `hexIndex(q:j) mod N`, where hexIndex is the
    * engine-portable md5-prefix integer (the [[hexUniform]] family —
    * any SQL engine re-derives exactly which negatives were drawn).
    *
    * Draws that land on self or a same-label candidate are DROPPED, not
    * re-drawn — so a query yields at most `k` negatives (expected loss
    * is the query's label share; callers needing exactly k draw a
    * padded k' and keep the first k per query). Rows with a NULL label
    * yield no negatives (label inequality is three-valued — documented,
    * mirrored by the oracle).
    *
    * Scale: candidate ranks come from [[prefixSum]]'s two-phase
    * distributed numbering (no single-task window — the oracle's
    * `row_number()` equivalent is driver-scale only); the ×k expansion
    * is map-side; one narrow hash join on the rank index resolves
    * draws; N rides a 1-row broadcast. Nothing quadratic, nothing
    * driver-side.
    *
    * Output: `(query_id, j, neg_id)`, one row per surviving draw. */
  def negativeSample(candidates: DataFrame, idCol: Column, labelCol: Column,
      k: Int, stagingDir: Option[String] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val base = candidates.select(idCol.as("__id"), labelCol.as("__lab"))
    val ranked = prefixSum(base, col("__id"), lit(1L), cumCol = "__idx",
      stagingDir = stagingDir)
    val tot = base.agg(count(lit(1)).as("__n"))
    val draws = base
      .select(col("__id").as("query_id"), col("__lab").as("__qlab"))
      .withColumn("j", explode(sequence(lit(0), lit(k - 1))))
      .crossJoin(broadcast(tot))
      .withColumn("__draw",
        conv(substring(md5(concat(col("query_id").cast("string"), lit(":"),
          col("j").cast("string"))), 1, 8), 16, 10).cast("long") % col("__n"))
    draws.join(ranked.select(col("__idx").as("__draw"),
        col("__id").as("neg_id"), col("__lab").as("__nlab")), Seq("__draw"))
      .filter(col("__nlab") =!= col("__qlab") &&
        col("neg_id") =!= col("query_id"))
      .select(col("query_id"), col("j"), col("neg_id"))
  }

  /** Deterministic systematic probability-proportional-to-size sampling
    * (the classic PPS/systematic design from survey statistics — Madow's
    * method): lay every row's integer weight end to end along a line in
    * `orderCol` order, then take `k` equally-spaced selection points
    * `p_j = stride/2 + j·stride` (stride = `W div k`). A row is drawn
    * once per point falling inside its weight interval — heavy rows can
    * be drawn multiple times (sampling WITH replacement, the
    * upsampling-friendly form, same contract as [[epochsMix]]'s copies).
    *
    * Everything is integer arithmetic on exact sums, so the sample is
    * bit-portable across engines (no RNG: the fixed mid-stride start is
    * the deterministic twin of the textbook random start — reproducible
    * pipelines beat incremental variance here, same stance as
    * [[hexUniform]]). Exactly `k` picks total, Σ n_picks = k, rows with
    * zero weight never drawn.
    *
    * Scale: one [[prefixSum]] (two-phase, no single-task window) + a
    * narrow map-side pick computation. Output: the input row plus
    * `n_picks ≥ 1` for selected rows only.
    */
  def ppsSystematic(df: DataFrame, orderCol: Column, weightCol: Column,
      k: Int, stagingDir: Option[String] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val withCum = prefixSum(df, orderCol, weightCol, stagingDir = stagingDir)
    // W and the derived stride/start ride a 1-row broadcast cross join —
    // no driver action, stays one plan
    val tot = withCum.agg(sum(weightCol.cast("long")).as("__w"))
    // picks in [a, b) = f(b) − f(a), f(x) = #selection points < x =
    // min(k, x <= start ? 0 : (x − start − 1) div stride + 1) — every
    // operand non-negative, so truncating (Spark div) and flooring
    // (external //) integer division agree
    def f(x: String): Column =
      least(lit(k.toLong), when(col(x) <= col("__start"), lit(0L))
        .otherwise(expr(s"($x - __start - 1) div __stride + 1")))
    withCum.crossJoin(broadcast(tot))
      .filter(col("__w") >= k) // k > W would make stride 0 — empty, not divide-by-zero
      .withColumn("__stride", expr(s"__w div ${k}L"))
      .withColumn("__start", expr("__stride div 2"))
      .withColumn("__a", col("cum_before"))
      .withColumn("__b", col("cum_before") + weightCol.cast("long"))
      .withColumn("n_picks", f("__b") - f("__a"))
      .filter(col("n_picks") >= 1)
      .drop("__w", "__stride", "__start", "__a", "__b", "cum_before")
  }
}
