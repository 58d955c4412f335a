package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSuite {
  import spark.implicits._

  private def docs = graft.Tables.documents(spark, sf0001)

  test("hashSample: deterministic, rate-accurate, content-keyed") {
    val a = Sampling.hashSample(docs, col("doc_id"), 0.3)
      .select($"doc_id").as[Long].collect().toSet
    val b = Sampling.hashSample(docs, col("doc_id"), 0.3)
      .select($"doc_id").as[Long].collect().toSet
    assert(a == b, "same input → same sample")
    val rate = a.size.toDouble / docs.count()
    assert(rate > 0.2 && rate < 0.4, s"rate=$rate (expect ~0.3)")
    // monotone: a higher rate strictly extends the sample (nested samples)
    val bigger = Sampling.hashSample(docs, col("doc_id"), 0.6)
      .select($"doc_id").as[Long].collect().toSet
    assert(a.subsetOf(bigger), "samples must be nested by rate")
  }

  test("stratifiedSample: per-class rates, unknown strata dropped") {
    val sampled = Sampling.stratifiedSample(docs, col("lang"), col("doc_id"),
      Map("en" -> 1.0, "de" -> 0.0, "fr" -> 0.5))
    val counts = sampled.groupBy($"lang").count().as[(String, Long)].collect().toMap
    val full = docs.groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(counts("en") == full("en"), "rate 1.0 keeps everything")
    assert(!counts.contains("de"), "rate 0.0 drops the class")
    assert(!counts.contains("es") && !counts.contains("zh"), "unlisted strata dropped")
    val frRate = counts.getOrElse("fr", 0L).toDouble / full("fr")
    assert(frRate > 0.3 && frRate < 0.7, s"fr rate=$frRate (expect ~0.5)")
  }

  test("bottomKPerKey: exactly k per key (or all when group smaller), stable") {
    val s1 = Sampling.bottomKPerKey(docs, col("lang"), col("doc_id"), k = 10)
    val sizes = s1.groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(sizes.values.forall(_ <= 10))
    val s2 = Sampling.bottomKPerKey(docs, col("lang"), col("doc_id"), k = 10)
      .select($"doc_id").as[Long].collect().toSet
    assert(s2 == s1.select($"doc_id").as[Long].collect().toSet)
    // mergeable bottom-k: bottom-k of a half is a superset of the half's
    // contribution to the global bottom-k
    val half = docs.filter($"doc_id" % 2 === 0)
    val halfK = Sampling.bottomKPerKey(half, col("lang"), col("doc_id"), k = 10)
      .select($"doc_id").as[Long].collect().toSet
    assert((s2.filter(_ % 2 == 0) -- halfK).isEmpty)
  }
}
