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

  test("decode stub: known bytes") {
    val (luma, n, crc) = Multimodal.decodeStub("abc".getBytes("UTF-8"))
    assert(n == 3)
    assert(luma == (97 + 98 + 99) / 3.0)
    assert(crc == 891568578L) // CRC32("abc") — standard public test vector
  }
}
