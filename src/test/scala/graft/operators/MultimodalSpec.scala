package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  test("payload schema: BINARY payload + typed metadata struct") {
    val df = Multimodal.attachPayload(Seq((1L, "hello world")).toDF("doc_id", "text"))
    val mediaType = df.schema("media").dataType
    // compare shape, not nullability (literals produce non-null fields)
    assert(mediaType.catalogString == Multimodal.mediaSchema.catalogString)
  }

  test("feature extraction: deterministic fake decode over batches") {
    val docs = graft.Tables.documents(spark, sf0001)
    val feats = Multimodal.extractFeatures(spark, Multimodal.attachPayload(docs),
      batchSize = 16)
    assert(feats.count() == docs.count())
    // n_bytes == utf-8 length of the source text (ASCII fixture → text length)
    val joined = feats.join(docs, "doc_id")
      .filter(col("n_bytes") =!= length(col("text")))
    assert(joined.count() == 0)
    // deterministic: same crc both runs
    val crc1 = feats.orderBy("doc_id").select("crc32").as[Long].collect().toSeq
    val crc2 = Multimodal.extractFeatures(spark, Multimodal.attachPayload(docs))
      .orderBy("doc_id").select("crc32").as[Long].collect().toSeq
    assert(crc1 == crc2)
    // dims within declared metadata bounds
    assert(feats.filter(col("width") < 1 || col("width") > 1920 ||
      col("height") < 1 || col("height") > 1080).count() == 0)
  }

  test("resize: metadata updated, payload scaled by area ratio") {
    val df = Multimodal.attachPayload(Seq((1L, "x" * 100)).toDF("doc_id", "text"))
    val resized = Multimodal.resizeStub(df, 64, 64)
    val m = resized.select($"media.meta.width", $"media.meta.height",
      length($"media.payload")).head()
    assert(m.getInt(0) == 64 && m.getInt(1) == 64)
    assert(m.getInt(2) >= 1 && m.getInt(2) <= 100)
  }

  test("frameSample: n frames per doc, indexed, non-empty slices") {
    val df = Multimodal.attachPayload(
      Seq((1L, "a" * 90), (2L, "b" * 33)).toDF("doc_id", "text"))
    val frames = Multimodal.frameSample(df, "doc_id", 4)
    assert(frames.count() == 8)
    assert(frames.groupBy($"doc_id").count().filter($"count" =!= 4).count() == 0)
    assert(frames.filter(length($"frame") < 1).count() == 0)
    assert(frames.select($"frame_idx").distinct().count() == 4)
    // frames of doc 1 tile the payload: 4 × 22-byte slices of 90 bytes
    val lens = frames.filter($"doc_id" === 1).select(length($"frame"))
      .as[Int].collect().toSeq
    assert(lens.forall(_ == 90 / 4))
  }

  test("decode stub: known bytes") {
    val (luma, n, crc) = Multimodal.decodeStub("abc".getBytes("UTF-8"))
    assert(n == 3)
    assert(luma == (97 + 98 + 99) / 3.0)
    assert(crc == 891568578L) // CRC32("abc") — standard public test vector
  }
}
