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
    * is shared bit-for-bit with [[stratifiedSample]] — samples taken by
    * either operator at the same rate stay joinable. */
  def hashSample(df: DataFrame, keyCol: Column, rate: Double, seed: Long = 42L): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    df.filter(pmod(xxhash64(keyCol, lit(seed)), lit(1000000L)) <
      lit(math.round(rate * 1000000.0)))
  }

  /** Per-stratum hash sample with an individual rate per stratum value
    * (class rebalancing: downsample the head class, keep the tail). The
    * per-row decision hashes `keyCol` (a stable row identity) with the same
    * rounded threshold as [[hashSample]]; strata absent from `rates` are
    * dropped. */
  def stratifiedSample(df: DataFrame, strataCol: Column, keyCol: Column,
      rates: Map[String, Double], seed: Long = 42L): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0),
      s"all rates must be in [0,1], got $rates")
    val thresholds: Map[String, Long] =
      rates.map { case (k, r) => k -> math.round(r * 1000000.0) }
    val threshold = element_at(typedLit(thresholds), strataCol)
    df.filter(threshold.isNotNull &&
      pmod(xxhash64(keyCol, lit(seed)), lit(1000000L)) < threshold)
  }

  /** Deterministic per-key "reservoir": the k rows with the smallest
    * content hash per key — a uniform-ish fixed-size sample per group that
    * is stable across runs and mergeable (the k smallest of a union is
    * computable from each side's k smallest — the classic distributed
    * bottom-k sketch). */
  def bottomKPerKey(df: DataFrame, keyCol: Column, idCol: Column, k: Int,
      seed: Long = 42L): DataFrame = {
    require(!df.columns.contains("__rk"),
      "input already has a __rk column; rename it before sampling")
    val w = Window.partitionBy(keyCol)
      .orderBy(xxhash64(idCol, lit(seed)), idCol)
    df.withColumn("__rk", row_number().over(w)).filter(col("__rk") <= k).drop("__rk")
  }
}
