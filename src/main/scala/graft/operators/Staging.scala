package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared materialization point for consumer-diamond staging relations.
  *
  * With `stagingDir` set, the relation is written ONCE as an explicit
  * parquet table under `stagingDir/name` and read back — the 100 TB shape
  * (SCALE.md §Cross-cutting): every consumer re-reads from disk, nothing
  * pins the SQL CacheManager for the session lifetime, and the staged
  * table doubles as a restart point. Without it, executor-local
  * `persist(MEMORY_AND_DISK)` — the small-job default, whose cache is
  * pinned by the CacheManager until `spark.catalog.clearCache()` (the
  * Spark ML handlePersistence caveat, documented at
  * [[Dedup.minhashPairsFromShingles]]).
  *
  * Either path also FREEZES the relation's content and partitioning, so
  * diamond consumers provably read the same data — which is a correctness
  * requirement for operators whose staging pass is nondeterministic at
  * the partition level (e.g. [[Sampling.scoreStrata]]'s sampled range
  * exchange).
  */
private[operators] object Staging {
  def stage(df: DataFrame, stagingDir: Option[String],
      name: String): DataFrame = stagingDir match {
    case Some(dir) =>
      val path = s"$dir/$name"
      df.write.mode("overwrite").parquet(path)
      df.sparkSession.read.parquet(path)
    case None =>
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }
}
