package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The catalog is assembled from per-area objects:
  *  - [[CoreQueries]]  — reference operator surface (SURVEY §2) + relational core
  *  - graft.operators.* — north-star extensions (dedup, similarity, text)
  */
object SparkEntry {

  /** Flagship query (full reference topology, SURVEY §7.3) on sf0.001;
    * driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ §2.10). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ ExtQueries.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (non-SQL-expressible ops) get the
    * driver's weaker rows-only check. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracleSql ++ ExtQueries.oracleSql
}
