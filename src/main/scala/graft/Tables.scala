package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loaders (TESTDATA.md / FIXTURES.md §B).
  *
  * All queries are parameterized by `sfDir` so the same code runs at any
  * scale factor — and, on a real cluster, against any warehouse path.
  * Loads are plain `spark.read.parquet`: column pruning and predicate
  * pushdown then reach the scan for free via Catalyst.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    * ([PARQUET_TYPE_ILLEGAL]). Read it as raw int64 nanos
    * (`spark.sql.legacy.parquet.nanosAsLong`) and convert to a microsecond
    * TimestampType column — the same truncation DuckDB applies when casting
    * TIMESTAMP_NS, so oracle comparisons stay aligned.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    // `ts div 1000` = integral division; `floor(ts / 1000)` would go through
    // double division, whose 256ns ulp near 1.7e18 shifts ~13% of values by
    // 1 µs versus true truncation (verified against the fixtures).
    load(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def customer(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "customer")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "orders")
  def part(spark: SparkSession, sfDir: String): DataFrame       = load(spark, sfDir, "part")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "supplier")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
