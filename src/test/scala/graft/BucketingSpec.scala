package graft

import org.apache.spark.sql.functions._

/** Demonstrates the co-located-join scale path: bucketing both sides of a
  * recurring join on the join key eliminates the per-query shuffle entirely
  * (SCALE.md / SURVEY §4 "pre-partitioning"). At 100 TB this converts every
  * repeated fact-dim join from a full network shuffle into local merges.
  */
class BucketingSpec extends SparkSuite {
  import spark.implicits._

  test("bucketed co-partitioned join plans with no exchange on either side") {
    val left = (1L to 1000L).map(k => (k % 97, k)).toDF("key", "lv")
    val right = (1L to 500L).map(k => (k % 97, s"r$k")).toDF("key", "rv")

    spark.sql("DROP TABLE IF EXISTS b_left")
    spark.sql("DROP TABLE IF EXISTS b_right")
    graft.sources.Sources.writeBucketed(left, "b_left", 8, Seq("key"))
    graft.sources.Sources.writeBucketed(right, "b_right", 8, Seq("key"))

    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // pin to sort-merge so the plan shape is deterministic for the assert
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("b_left").join(spark.table("b_right"), "key")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // and the result matches the plain (shuffled) join
      assert(j.count() == left.join(right, "key").count())
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS b_left")
      spark.sql("DROP TABLE IF EXISTS b_right")
    }
  }
}
