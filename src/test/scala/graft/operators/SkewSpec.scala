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

  test("salt splits the hot key across buckets") {
    val large = (1 to 1000).map(i => ("hot", i.toLong)).toDF("key", "payload")
    val salts = large.withColumn("__salt",
      pmod(xxhash64(struct(large.columns.toIndexedSeq.map(col): _*)), lit(8L)).cast("int"))
      .select(countDistinct(col("__salt"))).head().getLong(0)
    assert(salts == 8, s"expected all 8 salt buckets used, got $salts")
  }
}
