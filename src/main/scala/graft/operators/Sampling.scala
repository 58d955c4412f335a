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

  /** Keep a row iff `xxhash64(key) mod 10^6 < rate·10^6` — a deterministic
    * Bernoulli sample keyed on content, not position. Narrow op, fully
    * pushdown-friendly (the predicate sits right on the scan). */
  def hashSample(df: DataFrame, keyCol: Column, rate: Double, seed: Long = 42L): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0)
    df.filter(pmod(xxhash64(keyCol, lit(seed)), lit(1000000L)) <
      lit((rate * 1000000L).toLong))
  }

  /** Per-stratum hash sample with an individual rate per stratum value
    * (class rebalancing: downsample the head class, keep the tail). The
    * per-row decision hashes `keyCol` (a stable row identity); strata absent
    * from `rates` are dropped. */
  def stratifiedSample(df: DataFrame, strataCol: Column, keyCol: Column,
      rates: Map[String, Double], seed: Long = 42L): DataFrame = {
    val rateCol = rates.foldLeft(lit(-1.0d)) { case (acc, (k, r)) =>
      when(strataCol === k, lit(r)).otherwise(acc)
    }
    df.filter(rateCol >= 0.0d &&
      pmod(xxhash64(keyCol, lit(seed)), lit(1000000L)).cast("double") <
        rateCol * 1000000.0d)
  }

  /** Deterministic per-key "reservoir": the k rows with the smallest
    * content hash per key — a uniform-ish fixed-size sample per group that
    * is stable across runs and mergeable (the k smallest of a union is
    * computable from each side's k smallest — the classic distributed
    * bottom-k sketch). */
  def bottomKPerKey(df: DataFrame, keyCol: Column, idCol: Column, k: Int,
      seed: Long = 42L): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy(xxhash64(idCol, lit(seed)), idCol)
    df.withColumn("__rk", row_number().over(w)).filter(col("__rk") <= k).drop("__rk")
  }
}
