package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/** Streaming corpus ingestion with DURABLE cross-batch exact dedup.
  *
  * [[WeatherStreams.dedupStream]] bounds its state with a watermark — the
  * right tool when duplicates arrive close together. Corpus ingestion has
  * the opposite profile: a document seen TODAY must still be recognized
  * next month, so the dedup state is unbounded and belongs OUTSIDE the
  * stream, in a durable staging table — the same `(key_hash)` index that
  * [[Dedup.incrementalExact]] consumes in batch. `foreachBatch` is the
  * Spark-native seam for this pattern: each micro-batch is deduped against
  * the index AND itself, survivors are appended to the output, and their
  * hashes are appended to the index, so batch N+1 sees everything batch N
  * admitted.
  *
  * Scale: the index carries ONE 8-byte hash per admitted document (the
  * [[Dedup.exact]] narrow-key contract, birthday bound documented there);
  * per batch the corpus cost is one semi-join of the (small) batch against
  * the index — the standing output is never re-read. Parquet append is
  * at-least-once under retries; on a production lakehouse back the index
  * and output with a transactional table format so batch replays stay
  * exactly-once (the checkpoint already dedups Kafka offsets).
  */
object IngestStreams {

  /** Start the ingestion query. `docs` is a streaming DataFrame with
    * (idCol, textCol, ...); survivors land in `outDir`, their key hashes
    * in `indexDir`. Both directories may start empty/absent. */
  def dedupIngest(docs: DataFrame, indexDir: String, outDir: String,
      checkpointDir: String, idCol: String = "doc_id",
      textCol: String = "text"): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val survivors = Dedup.incrementalExact(
          batch, loadIndex(spark, indexDir), keyCol = textCol, idCol = idCol)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // survivors carry (idCol, key_hash, n_dups); join the batch back
          // for the full payload — batch-local, never touches the output
          batch.join(survivors.select(col(idCol)), Seq(idCol), "left_semi")
            .write.mode("append").parquet(outDir)
          survivors.select(col("key_hash"))
            .write.mode("append").parquet(s"$indexDir/hashes")
        } finally survivors.unpersist()
        ()
      }
      .start()

  /** The standing (key_hash) index; an absent/empty directory is the empty
    * index (first ever batch). */
  def loadIndex(spark: SparkSession, indexDir: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(s"$indexDir/hashes")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) spark.read.parquet(path.toString)
    else {
      import org.apache.spark.sql.types._
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("key_hash", LongType))))
    }
  }
}
