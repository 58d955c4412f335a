package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities.
  *
  * First preference at runtime is AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default) — it needs no
  * code change and reacts to the actual sizes. [[saltedJoin]] is the
  * plan-time fallback for cases AQE can't fix: a shuffle-hash/sort-merge
  * join where a handful of hot keys put one partition orders of magnitude
  * over the rest (the classic 100 TB failure mode — one straggler task
  * holding the stage).
  */
object Skew {

  /** Salted inner equi-join.
    *
    * The skewed (large) side gets a deterministic per-row salt in
    * [0, saltFactor); the small side is replicated `saltFactor`× with every
    * salt value; the join key becomes (key, salt), splitting each hot key's
    * rows across `saltFactor` partitions. Output multiset is identical to
    * `large.join(small, key)`.
    *
    * Salt source (`saltOn`): pass a per-row ordinal/identity column (offset,
    * event id) when you have one — it spreads even fully-duplicate rows.
    * The default hashes the whole row, which is deterministic (reruns and
    * retries partition identically; no executor RNG) but cannot split a hot
    * key whose rows are byte-identical — exactly-duplicated rows land in one
    * salt bucket; give `saltOn` an ordinal in that case.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keyCol: String,
      saltFactor: Int, saltOn: Option[Column] = None): DataFrame = {
    require(saltFactor > 0)
    val saltSource = saltOn.getOrElse(
      struct(large.columns.toIndexedSeq.map(col): _*))
    val saltedLarge = large.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(saltFactor.toLong)).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLarge.join(replicatedSmall, Seq(keyCol, "__salt")).drop("__salt")
  }
}
