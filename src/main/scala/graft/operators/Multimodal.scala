package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2.10): media as opaque `BINARY`
  * payloads plus typed metadata, with batch-shaped decode/feature-extract.
  *
  * The decode step is a STUB — this container has no image/audio codecs, so
  * [[decodeStub]] produces deterministic fake features from the bytes. The
  * Spark-side plumbing is the real deliverable and is fully exercised:
  *  - schema: `media STRUCT<payload BINARY, meta STRUCT<mime, width, height>>`
  *  - partition-parallel batched execution via `mapPartitions` with an
  *    explicit batch size (the Scala analog of `mapInPandas`: the decoder
  *    sees BATCHES, amortizing model/codec init per batch, not per row);
  *  - feature output lands back in a columnar-friendly flat schema.
  *
  * At 100 TB: payloads dominate row size → keep them out of shuffles
  * (extract features in the same stage as the scan, project payload away
  * before any wide operation). This operator does exactly that: no shuffle
  * between attach → decode → features.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType))))))

  /** Attach a synthetic media payload derived from the text column —
    * deterministic fake bytes standing in for real image/audio blobs.
    * Fake dimensions are exact integer arithmetic over the payload byte
    * length (not an engine-specific hash), so the whole attach→decode
    * pipeline is re-derivable — and oracle-checkable — from any SQL
    * engine. */
  def attachPayload(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("media", struct(
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("image/fake").as("mime"),
        (pmod(octet_length(col(textCol)).cast("long"), lit(1920L)) + 1)
          .cast("int").as("width"),
        (pmod(octet_length(col(textCol)).cast("long") * lit(7919L), lit(1080L)) + 1)
          .cast("int").as("height"))
        .as("meta")))

  /** ??? in spirit: a real deployment swaps this for an actual codec call
    * (JNI/ONNX/ffmpeg). Deterministic fake: byte-sum "luma", length, crc. */
  def decodeStub(payload: Array[Byte]): (Double, Int, Long) = {
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += (payload(i) & 0xFF); i += 1 }
    val crc = new java.util.zip.CRC32
    crc.update(payload)
    (if (payload.isEmpty) 0.0 else sum.toDouble / payload.length,
      payload.length, crc.getValue)
  }

  /** Resize: metadata-accurate, payload-stubbed. The meta struct carries the
    * new dimensions (what downstream schema consumers see); the payload
    * transform is a deterministic fake (length scaled by the area ratio) —
    * a real deployment swaps the lambda for the codec call. Narrow op, no
    * shuffle; payload never leaves the stage. */
  def resizeStub(df: DataFrame, newWidth: Int, newHeight: Int): DataFrame =
    df.withColumn("media", struct(
      // arithmetic in BIGINT: len × w × h overflows 32-bit int for any
      // payload ≥ 32 KB (wraps negative → 1-byte "resize")
      expr(s"substring(media.payload, 1, " +
        s"greatest(1, cast(cast(length(media.payload) AS BIGINT) * ${newWidth}L * ${newHeight}L / " +
        s"greatest(cast(media.meta.width AS BIGINT) * media.meta.height, 1L) as int)))").as("payload"),
      struct(
        col("media.meta.mime").as("mime"),
        lit(newWidth).as("width"),
        lit(newHeight).as("height")).as("meta")))

  /** Frame sampling for video-shaped payloads: emit `n` evenly-spaced frames
    * per document as (doc_id, frame_idx, frame) rows. Frame extraction is
    * stubbed as payload slices; the row-explosion shape (×n growth of id
    * rows, payloads sliced not duplicated wholesale) is the real contract.
    */
  def frameSample(df: DataFrame, idCol: String, n: Int): DataFrame = {
    require(n > 0)
    // n is a plan-time constant → statically unrolled frame array
    val frames = array((0 until n).map(i =>
      // stub "frame decode": the i-th of n equal payload slices
      // (offsets in BIGINT — len × i overflows int for GB-scale payloads)
      expr(s"substring(media.payload, " +
        s"1 + cast(cast(length(media.payload) AS BIGINT) * ${i}L / $n as int), " +
        s"greatest(1, cast(length(media.payload) / $n as int)))")): _*)
    df.select(col(idCol), col("media"),
      posexplode(frames).as(Seq("frame_idx", "frame")))
      .drop("media")
  }

  /** Batched decode/feature-extract. Output: doc_id, mime, width, height,
    * n_bytes, crc32, avg_luma. Batch size is the codec-amortization knob. */
  def extractFeatures(spark: SparkSession, docs: DataFrame,
      idCol: String = "doc_id", batchSize: Int = 64): DataFrame = {
    val withMedia = if (docs.columns.contains("media")) docs else attachPayload(docs)
    val in = withMedia.select(col(idCol), col("media"))
    // id column keeps its caller-declared name AND type
    val outSchema = StructType(
      StructField(idCol, in.schema(idCol).dataType) +: Seq(
        StructField("mime", StringType),
        StructField("width", IntegerType),
        StructField("height", IntegerType),
        StructField("n_bytes", IntegerType),
        StructField("crc32", LongType),
        StructField("avg_luma", DoubleType)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    val out: Dataset[Row] = in.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch decoder init would go here (the point of batching)
        batch.iterator.map { r =>
          val id = r.get(0)
          // null-tolerant like the rest of the engine: a null media/payload
          // row yields null features, it does not fail the task
          if (r.isNullAt(1)) Row(id, null, null, null, null, null, null)
          else {
            val media = r.getStruct(1)
            val payload = media.getAs[Array[Byte]]("payload")
            val metaIdx = media.fieldIndex("meta")
            val meta = if (media.isNullAt(metaIdx)) null else media.getStruct(metaIdx)
            def metaField[T](i: Int): Any =
              if (meta == null || meta.isNullAt(i)) null else meta.get(i)
            if (payload == null)
              Row(id, metaField(0), metaField(1), metaField(2), null, null, null)
            else {
              val (luma, n, crc) = decodeStub(payload)
              Row(id, metaField(0), metaField(1), metaField(2), n, crc, luma)
            }
          }
        }
      }
    }
    out.toDF()
  }
}
