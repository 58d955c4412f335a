package graft

/** Smoke + invariant tests for the query catalog at sf0.001.
  * (Exact value parity vs DuckDB is the driver's gate; tools/check_oracle.py
  * replicates it locally.)
  */
class CoreQueriesSpec extends SparkSuite {

  test("every query runs and every oracle key has a query") {
    val qs = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet),
      s"orphan oracle keys: ${SparkEntry.oracleSql.keySet -- qs.keySet}")
    qs.foreach { case (name, fn) =>
      val n = fn(spark, sf0001).count()
      assert(n >= 0, name)
    }
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("flagship: every enriched customer has a plausible history") {
    import org.apache.spark.sql.functions._
    val df = CoreQueries.flagship(spark, sf0001)
    assert(df.filter(col("n_days") <= 0).count() == 0)
    assert(df.filter(length(col("history")) === 0).count() == 0)
  }

  test("a1 invariant: per-day avg lies within [min, max] of raw values") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf0001).withColumn("day", to_date(col("ts")))
    val bounds = ev.groupBy("user_id", "day")
      .agg(min("value").as("lo"), max("value").as("hi"))
    val daily = CoreQueries.dailyAvg(spark, sf0001)
    val joined = daily.join(bounds, Seq("user_id", "day"))
    assert(joined.filter(col("avg_tmp_f") < col("lo") - 1e-9 ||
      col("avg_tmp_f") > col("hi") + 1e-9).count() == 0)
  }

  test("c1 invariant: latest-per-key count equals distinct keys") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf0001)
    val latest = SparkEntry.queries("q_c1_latest")(spark, sf0001)
    assert(latest.count() == ev.select(countDistinct(col("user_id"))).head().getLong(0))
  }
}
