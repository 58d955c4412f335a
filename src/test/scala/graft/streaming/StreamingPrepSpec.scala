package graft.streaming

import graft.SparkSuite
import graft.operators.{TextAnalysis, TextPrep}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming corpus prep: the narrow prep operators (HTML strip → quality
  * gate → chunking) are pure per-row transforms, so the SAME composition
  * runs unchanged over a stream in append mode with no state and no
  * watermark — asserted here by driving batches through MemoryStream and
  * comparing against the batch path on identical data. This is the
  * incremental-ingestion story: documents stream in, training-ready chunks
  * stream out, and adding data never changes previously emitted chunks.
  */
class StreamingPrepSpec extends SparkSuite {
  import spark.implicits._

  private def prep(docs: DataFrame): DataFrame = {
    val plain = TextPrep.stripHtml(docs).drop("text")
      .withColumnRenamed("text_plain", "text")
    val gated = TextAnalysis.qualityScore(plain).filter(col("quality") >= 0.3)
    TextPrep.chunkTokens(gated.select(col("doc_id"), col("text")),
      chunkSize = 8, overlap = 2)
  }

  test("stream(prep) == batch(prep): same chunks, append mode, stateless") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "<p>the quick brown fox jumps over the lazy dog and keeps " +
        "on running through the quiet green field today</p>"),
      (2L, "<script>junk();</script><b>a solid and reasonably long plain " +
        "sentence with enough words for the gate to like it</b>"),
      // quality-gated out: avg token length 15 > 12 (lenScore 0), no
      // stopwords, saturated punct+digit penalties → quality 0. The
      // previous fixture ("!!!! ???? 1234 5678 $$$$") scored exactly 0.3
      // — the lenScore term alone — and sat ON the gate boundary.
      (3L, "$$$$$$$$$$$$$$$ 111111111111111 ???????????????"))

    val in = MemoryStream[(Long, String)]
    val q = prep(in.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("prep_stream")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-prep").toString)
      .start()
    try {
      // two micro-batches — chunks for doc 1 must not change when doc 2/3
      // arrive (statelessness)
      in.addData(docs.head)
      q.processAllAvailable()
      val afterFirst = spark.table("prep_stream")
        .select($"doc_id", $"chunk_idx", $"chunk_text")
        .as[(Long, Int, String)].collect().toSet
      in.addData(docs(1), docs(2))
      q.processAllAvailable()
      val streamed = spark.table("prep_stream")
        .select($"doc_id", $"chunk_idx", $"chunk_text")
        .as[(Long, Int, String)].collect().toSet

      assert(afterFirst.subsetOf(streamed),
        "append mode must never retract previously emitted chunks")
      val batch = prep(docs.toDF("doc_id", "text"))
        .select($"doc_id", $"chunk_idx", $"chunk_text")
        .as[(Long, Int, String)].collect().toSet
      assert(streamed == batch,
        s"stream/batch divergence:\nstream ${streamed.toSeq.sorted}\n" +
          s"batch ${batch.toSeq.sorted}")
      assert(!streamed.exists(_._1 == 3L), "low-quality doc must be gated out")
      assert(streamed.exists(_._1 == 2L), "script junk stripped, doc 2 survives")
    } finally q.stop()
  }
}
