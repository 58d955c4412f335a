package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranking-quality evaluation — the retrieval-eval metrics a
  * training-data pipeline runs over its own ANN/BM25 results (recall@k,
  * reciprocal rank, nDCG@k), expressed so every number is an EXACT
  * integer and therefore bit-portable across engines:
  *
  *  - rational metrics are emitted as their integer components
  *    (`n_rel_at_k` / `n_rel` is recall; `first_rel_rank` carries MRR as
  *    1/r with the no-hit case as the −1 sentinel — never a nullable
  *    int);
  *  - the nDCG log discounts `1/log2(r+1)` are a k-entry SCALED-INTEGER
  *    literal table (`round(10⁶/log2(r+1))`), a plan constant both the
  *    engine and any SQL auditor render identically — so `dcg_scaled`
  *    and `idcg_scaled` (the ideal prefix sum at `min(n_rel, k)`) are
  *    exact sums of literals, and nDCG = dcg/idcg divides OUTSIDE the
  *    gate.
  *
  * Scale: the ranked table is filtered to rank ≤ k BEFORE its join with
  * the relevance table (≤ k rows per query cross the shuffle), per-query
  * aggregates are map-side combinable, and the discount lookup is a
  * literal map — nothing driver-side, nothing proportional to the
  * corpus. Queries present in `relevant` but absent from `ranked` (the
  * retriever returned nothing) still emit a row via the outer join —
  * silently dropping them would inflate every mean metric.
  */
object Eval {

  /** Scaled discount table: rank → round(1e6 / log2(rank + 1)). */
  private[graft] def discounts(k: Int): Map[Int, Long] =
    (1 to k).map(r =>
      r -> math.round(1e6 / (math.log(r + 1.0) / math.log(2.0)))).toMap

  /** Ideal-DCG prefix sums: n relevant in the top positions → Σ of the
    * first min(n, k) discounts. Index 0 → 0. */
  private[graft] def idealPrefix(k: Int): Map[Int, Long] = {
    val d = discounts(k)
    (0 to k).map(n => n -> (1 to n).map(d).sum).toMap
  }

  /** Per-query ranking metrics of `ranked` (query_id, rank, id — rank
    * 1-based, unique per query) against `relevant` (query_id, id).
    *
    * Output: (query_id, n_rel, n_rel_at_k, first_rel_rank, dcg_scaled,
    * idcg_scaled) — one row per query with ≥ 1 relevant item;
    * `first_rel_rank` is −1 when no relevant item made the top k. */
  def rankingMetrics(ranked: DataFrame, relevant: DataFrame, k: Int,
      queryCol: String = "query_id", rankCol: String = "rank",
      idCol: String = "id"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val discCol = element_at(typedLit(discounts(k)), col(rankCol).cast("int"))
    val idealCol = element_at(typedLit(idealPrefix(k)),
      least(col("n_rel"), lit(k.toLong)).cast("int"))
    val rel = relevant.select(col(queryCol), col(idCol))
    val nRel = rel.groupBy(col(queryCol)).agg(count(lit(1)).as("n_rel"))
    val hits = ranked.filter(col(rankCol) <= k)
      .select(col(queryCol), col(rankCol), col(idCol))
      .join(rel, Seq(queryCol, idCol), "left_semi")
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_rel_at_k"),
        min(col(rankCol)).cast("long").as("first_rel_rank"),
        sum(discCol).as("dcg_scaled"))
    nRel.join(hits, Seq(queryCol), "left")
      .select(col(queryCol), col("n_rel"),
        coalesce(col("n_rel_at_k"), lit(0L)).as("n_rel_at_k"),
        coalesce(col("first_rel_rank"), lit(-1L)).as("first_rel_rank"),
        coalesce(col("dcg_scaled"), lit(0L)).as("dcg_scaled"),
        idealCol.as("idcg_scaled"))
  }
}
