package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining — frequent item PAIRS (the 2-itemset
  * core of association-rule mining, Agrawal & Srikant's Apriori first
  * pass): which items appear together in the same basket more than
  * `minSupport` times.
  *
  * Scale design: the pair space is generated per BASKET (self-join on the
  * basket key with `a < b`), never across the catalog — Σ_b |b|²
  * comparisons, the same bucketed-not-all-pairs shape as [[Dedup]]'s LSH
  * and [[Fuzzy]]'s blocks. `maxBasket` is the straggler guard for the
  * degenerate basket (a mega-order touching half the catalog would emit
  * |b|²/2 pairs from one task): oversized baskets are dropped entirely,
  * the [[Dedup.dropOversized]] contract, mirrored in the oracle's HAVING
  * so the guard semantics sit under the hash gate too. Counting is one
  * map-side-combinable aggregate; the top-k is a TakeOrdered on the
  * (support desc, item_a, item_b) total order, never a global sort.
  */
object Baskets {

  /** Item pairs co-occurring in ≥ `minSupport` baskets, the `k` most
    * frequent (ties broken by ascending item ids — deterministic).
    * Output: `(item_a, item_b, support)` with `item_a < item_b`; a pair
    * is counted once per basket (membership, not multiplicity).
    *
    * The distinct (basket, item) relation feeds THREE consumers — the
    * oversized-basket guard count and both legs of the pair self-join —
    * so it is a consumer diamond: without a materialization point
    * Catalyst recomputes the scan + distinct exchange per branch (3×
    * the input scan, seen in the audited plan). [[Staging.stage]] is
    * the shared materialization — executor-local persist by default
    * (released before returning: the ≤ k-row result is forced eagerly
    * and the cache unpersisted, so repeated invocations in one session
    * do not accumulate pinned relations); pass `stagingDir` at 100 TB
    * for an explicit parquet staging table (the
    * [[Dedup.minhashPairsFromShingles]] contract — caller deletes the
    * dir once the result is consumed). */
  def frequentPairs(df: DataFrame, basketCol: Column, itemCol: Column,
      minSupport: Long, k: Int,
      maxBasket: Option[Int] = Some(10000),
      stagingDir: Option[String] = None): DataFrame = {
    val (topk, items) =
      frequentPairsLazy(df, basketCol, itemCol, minSupport, k, maxBasket,
        stagingDir)
    if (stagingDir.isEmpty) {
      // the result is ≤ k rows by contract, so forcing it here is
      // bounded; the staged diamond can then be released immediately
      // instead of pinning the CacheManager for the session lifetime
      // (repeated invocations would otherwise accumulate one
      // MEMORY_AND_DISK relation each)
      val rows = topk.collect()
      items.unpersist()
      df.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), topk.schema)
    } else topk
  }

  /** The LAZY plan [[frequentPairs]] forces: (top-k DataFrame, the staged
    * distinct (basket, item) diamond). Package-visible so plan-invariant
    * tests can assert the one-materialization diamond that the public
    * API's eager force + unpersist hides from its returned plan. */
  private[graft] def frequentPairsLazy(df: DataFrame, basketCol: Column,
      itemCol: Column, minSupport: Long, k: Int,
      maxBasket: Option[Int] = Some(10000),
      stagingDir: Option[String] = None): (DataFrame, DataFrame) = {
    require(minSupport >= 1 && k >= 1, s"bad params: $minSupport, $k")
    val items = Staging.stage(
      df.select(basketCol.as("b"), itemCol.as("i")).distinct(),
      stagingDir, "basket_items")
    val kept = maxBasket match {
      case Some(cap) =>
        val ok = items.groupBy(col("b")).agg(count(lit(1)).as("n"))
          .filter(col("n") <= cap).select(col("b"))
        items.join(ok, Seq("b"))
      case None => items
    }
    val topk = kept.select(col("b"), col("i").as("item_a"))
      .join(kept.select(col("b"), col("i").as("item_b")), Seq("b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .orderBy(col("support").desc, col("item_a"), col("item_b"))
      .limit(k)
    (topk, items)
  }
}
