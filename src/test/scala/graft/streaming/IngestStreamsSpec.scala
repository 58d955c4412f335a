package graft.streaming

import java.nio.file.Files

import graft.SparkSuite
import graft.operators.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Durable cross-batch dedup ingestion: batches stream in through
  * foreachBatch, survivors and their key hashes append to parquet, and a
  * document admitted in ANY earlier batch is rejected in every later one —
  * the unbounded-state dedup a watermark can't express. Parity oracle: the
  * final output must equal batch-mode exact dedup of the full concatenation
  * (modulo survivor id: the stream admits the FIRST batch's copy, which is
  * also the min id here).
  */
class IngestStreamsSpec extends SparkSuite {
  import spark.implicits._

  test("dedupIngest: cross-batch rejection, batch parity, restart-safe index") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("ingest").toString
    val (indexDir, outDir, ckpt) = (s"$dir/idx", s"$dir/out", s"$dir/ckpt")

    val src = MemoryStream[(Long, String)]
    val q = IngestStreams.dedupIngest(
      src.toDF().toDF("doc_id", "text"), indexDir, outDir, ckpt)

    src.addData((1L, "alpha doc"), (2L, "beta doc"), (3L, "alpha doc"))
    q.processAllAvailable()
    src.addData((4L, "alpha doc"), (5L, "gamma doc"), (6L, "gamma doc"))
    q.processAllAvailable()
    q.stop()

    val out = spark.read.parquet(outDir)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSet
    // batch 1: 1 and 2 admitted (3 is a batch-internal dup of 1);
    // batch 2: 4 rejected by the INDEX (cross-batch), 5 admitted, 6 is
    // batch-internal dup of 5
    assert(out == Set((1L, "alpha doc"), (2L, "beta doc"), (5L, "gamma doc")))

    // parity with batch dedup over the concatenation
    val all = Seq((1L, "alpha doc"), (2L, "beta doc"), (3L, "alpha doc"),
      (4L, "alpha doc"), (5L, "gamma doc"), (6L, "gamma doc"))
      .toDF("doc_id", "text")
    val batch = all.join(
      Dedup.exact(all, "text", "doc_id").select($"doc_id"),
      Seq("doc_id"), "left_semi")
      .as[(Long, String)].collect().toSet
    assert(out == batch, "stream ingestion must match batch dedup semantics")

    // the index survives the query: a NEW query over the same dirs still
    // rejects previously admitted content
    val src2 = MemoryStream[(Long, String)]
    val q2 = IngestStreams.dedupIngest(
      src2.toDF().toDF("doc_id", "text"), indexDir, outDir, s"$dir/ckpt2")
    src2.addData((7L, "beta doc"), (8L, "delta doc"))
    q2.processAllAvailable()
    q2.stop()
    val out2 = spark.read.parquet(outDir)
      .select($"doc_id").as[Long].collect().toSet
    assert(out2 == Set(1L, 2L, 5L, 8L), s"got $out2")
  }
}
