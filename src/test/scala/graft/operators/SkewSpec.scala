package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSuite {
  import spark.implicits._

  test("salted join result multiset equals the plain join") {
    // skewed: one hot key with 1000 rows
    val large = ((1 to 1000).map(i => ("hot", i.toLong)) ++
      (1 to 50).map(i => (s"k$i", i.toLong))).toDF("key", "payload")
    val small = (Seq("hot") ++ (1 to 50).map(s => s"k$s")).zipWithIndex
      .map { case (k, i) => (k, s"dim$i") }.toDF("key", "dim")

    val plain = large.join(small, "key")
    val salted = Skew.saltedJoin(large, small, "key", saltFactor = 8)

    assert(salted.count() == plain.count())
    assert(salted.columns.sorted.sameElements(plain.columns.sorted))
    val a = plain.select("key", "payload", "dim").as[(String, Long, String)]
      .collect().sorted.toSeq
    val b = salted.select("key", "payload", "dim").as[(String, Long, String)]
      .collect().sorted.toSeq
    assert(a == b)
  }

  test("saltedJoin under AQE: correct result, hot key spread across partitions") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true",
      "suite must run with AQE on — this case exercises the production config")
    // hot key dominates: 2000 of 2050 rows share one key
    val large = ((1 to 2000).map(i => ("hot", i.toLong)) ++
      (1 to 50).map(i => (s"k$i", i.toLong))).toDF("key", "payload")
    val small = (Seq("hot") ++ (1 to 50).map(s => s"k$s")).zipWithIndex
      .map { case (k, i) => (k, s"dim$i") }.toDF("key", "dim")
    // pin broadcast off so the join actually shuffles on (key, salt) — a
    // broadcast join never skews and would make the assert vacuous — and
    // partition COALESCING off: at toy scale AQE merges every post-shuffle
    // partition into one (all below the advisory size), which hides the
    // spread that real-size partitions would keep
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevCoalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // 32 salts: with few salts, several (key, salt) groups can hash into
      // the SAME shuffle partition and re-stack (observed 5-deep at 8)
      val salted = Skew.saltedJoin(large, small, "key", saltFactor = 32)
      // multiset parity with the plain join, AQE active end to end
      val a = large.join(small, "key").select("key", "payload", "dim")
        .as[(String, Long, String)].collect().sorted.toSeq
      val b = salted.select("key", "payload", "dim")
        .as[(String, Long, String)].collect().sorted.toSeq
      assert(a == b)
      // behavioral skew check: no join-output partition holds more than
      // half the hot key's rows (unsalted, all 2000 land in ONE partition)
      val perPart = salted.filter($"key" === "hot")
        .groupBy(spark_partition_id().as("p")).count()
        .select(max($"count")).head().getLong(0)
      assert(perPart <= 1000L,
        s"salting must spread the hot key; max partition rows = $perPart")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCoalesce)
    }
  }

  test("salt splits the hot key across buckets") {
    val large = (1 to 1000).map(i => ("hot", i.toLong)).toDF("key", "payload")
    val salts = large.withColumn("__salt",
      pmod(xxhash64(struct(large.columns.toIndexedSeq.map(col): _*)), lit(8L)).cast("int"))
      .select(countDistinct(col("__salt"))).head().getLong(0)
    assert(salts == 8, s"expected all 8 salt buckets used, got $salts")
  }
}
