package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class EmbeddingPrepSpec extends SparkSuite {
  import spark.implicits._

  private val embs = Seq(
    (0L, Seq(3.0f, 4.0f)),
    (1L, Seq(0.0f, 0.0f)),
    (2L, Seq(-1.0f, 1.0f, 2.0f, -2.0f))
  ).toDF("vec_id", "embedding")

  test("l2Normalize: unit norm, direction preserved, zero vector safe") {
    val got = EmbeddingPrep.l2Normalize(embs)
      .select($"vec_id", $"nvec").as[(Long, Seq[Double])].collect().toMap
    assert(got(0L).zip(Seq(0.6, 0.8)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    assert(got(1L) == Seq(0.0, 0.0), "zero vector stays zero, no NaN")
    val n2 = math.sqrt(got(2L).map(x => x * x).sum)
    assert(math.abs(n2 - 1.0) < 1e-12)
  }

  test("quantizeInt8: max component hits ±127, dequantize round-trips within step") {
    val q = EmbeddingPrep.quantizeInt8(embs)
    val rows = q.select($"vec_id", $"qvec", $"scale")
      .as[(Long, Seq[Byte], Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows(0L)._1 == Seq[Byte]((3.0 / 4.0 * 127).round.toByte, 127.toByte))
    assert(rows(0L)._2 == 4.0)
    assert(rows(1L)._1 == Seq[Byte](0, 0) && rows(1L)._2 == 0.0)
    assert(rows(2L)._1.max == 127 && rows(2L)._1.min == -127)

    val deq = EmbeddingPrep.dequantizeInt8(q)
      .select($"vec_id", $"dvec").as[(Long, Seq[Double])].collect().toMap
    // quantization error bounded by half a step = scale/254
    val orig = Map(0L -> Seq(3.0, 4.0), 2L -> Seq(-1.0, 1.0, 2.0, -2.0))
    orig.foreach { case (id, v) =>
      val step = rows(id)._2 / 127.0
      v.zip(deq(id)).foreach { case (a, b) =>
        assert(math.abs(a - b) <= step / 2 + 1e-12, s"id=$id: $a vs $b")
      }
    }
  }

  test("truncate: prefix slice + renormalize, zero prefix safe, short vectors pass") {
    val df = Seq(
      (1L, Seq(3.0f, 4.0f, 100.0f, -7.0f)),  // prefix (3,4) → (0.6, 0.8)
      (2L, Seq(0.0f, 0.0f, 5.0f)),           // zero prefix → zeros, no NaN
      (3L, Seq(2.0f))                        // shorter than dim → unchanged shape
    ).toDF("vec_id", "embedding")
    val got = EmbeddingPrep.truncate(df, dim = 2)
      .select($"vec_id", $"tvec").as[(Long, Seq[Double])]
      .collect().toMap
    assert(got(1L) == Seq(0.6, 0.8))
    assert(got(2L) == Seq(0.0, 0.0))
    assert(got(3L) == Seq(1.0)) // single coord renormalizes to ±1
    // a matryoshka prefix of the normalized full vector ≠ normalize of the
    // prefix is FALSE — they must coincide (scaling commutes with slicing)
    val full = EmbeddingPrep.l2Normalize(df.filter($"vec_id" === 1L))
      .select($"nvec").as[Seq[Double]].head()
    val prefNorm = {
      val p = full.take(2)
      val n = math.sqrt(p.map(x => x * x).sum)
      p.map(_ / n)
    }
    assert(got(1L).zip(prefNorm).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("quantized cosine approximates full-precision cosine on fixture data") {
    val real = graft.Tables.embeddings(spark, sf0001).limit(50)
    val deq = EmbeddingPrep.dequantizeInt8(EmbeddingPrep.quantizeInt8(real))
    val both = real.select($"vec_id",
      transform($"embedding", x => x.cast("double")).as("v"))
      .join(deq.select($"vec_id", $"dvec"), "vec_id")
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val pairs = both.select($"v", $"dvec").as[(Seq[Double], Seq[Double])].collect()
    pairs.foreach { case (v, d) =>
      assert(cos(v, d) > 0.999, "int8 quantization must preserve direction")
    }
  }

  test("binaryQuantize: little-endian 32-bit packing golden vectors") {
    val docs = Seq(
      // bit 0 (first element) and bit 2 set; zeros and negatives clear
      (1L, Seq(1.0f, -2.0f, 0.5f, 0.0f)),
      // 33 elements: element 33 (index 32) spills into word 1, bit 0
      (2L, Seq.fill(32)(-1.0f) ++ Seq(3.0f)),
      // all 32 bits of word 0 set → 2^32 − 1 (needs the full BIGINT)
      (3L, Seq.fill(32)(1.0f)),
      (4L, Seq.empty[Float]))
      .toDF("vec_id", "embedding")
    val got = EmbeddingPrep.binaryQuantize(docs)
      .select($"vec_id", $"bvec").as[(Long, Seq[Long])].collect().toMap
    assert(got(1L) == Seq(5L))
    assert(got(2L) == Seq(0L, 1L))
    assert(got(3L) == Seq(4294967295L))
    assert(got(4L) == Seq.empty[Long])
  }
}
