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

  /** `events.ts` varies by fixture generation and must land on the SAME
    * microsecond TimestampType either way (the oracle compares epoch
    * micros):
    *  - parquet TIMESTAMP(NANOS): Spark's reader rejects it
    *    ([PARQUET_TYPE_ILLEGAL]), so read as raw int64 nanos
    *    (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to micros —
    *    the same truncation DuckDB applies when casting TIMESTAMP_NS.
    *    `ts div 1000` = integral division; `floor(ts / 1000)` would go
    *    through double division, whose 256ns ulp near 1.7e18 shifts ~13%
    *    of values by 1 µs versus true truncation (verified on fixtures).
    *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): reads as
    *    TIMESTAMP_NTZ; reinterpret the wall clock as an instant under the
    *    session timezone, which every entry point pins to UTC — exactly
    *    how DuckDB's `epoch_us` treats its naive TIMESTAMP.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
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
