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

  test("approx distinct: HLL estimate within rsd bounds of the exact twin") {
    // q_approx_distinct is rows-only (sketch estimates are engine-specific);
    // this bounds it against the hash-checked exact variant so a broken
    // sketch path can't hide behind the rows-only contract
    import org.apache.spark.sql.functions.col
    val approx = SparkEntry.queries("q_approx_distinct")(spark, sf0001)
      .select(col("event_type"), col("approx_users"))
    val exact = SparkEntry.queries("q_distinct_agg")(spark, sf0001)
      .select(col("event_type"), col("n_users"))
    val joined = approx.join(exact, "event_type")
      .select(col("approx_users").cast("double"), col("n_users").cast("double"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (a, e) = (r.getDouble(0), r.getDouble(1))
      // default rsd is 5%; 3σ + slack for small groups
      assert(math.abs(a - e) <= math.max(0.2 * e, 3.0),
        s"approx=$a exact=$e drifted beyond sketch bounds")
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
