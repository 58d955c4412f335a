package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.dot

/** Embedding storage/retrieval prep (SURVEY.md §2.10 similarity family):
  * unit normalization and per-vector symmetric int8 quantization — the two
  * transforms a pipeline applies before writing embeddings at scale
  * (cosine becomes dot product; storage drops 4×).
  *
  * Both are narrow, codegen'd transforms. The per-row scalar (norm, scale)
  * is materialized into its own projection column BEFORE the per-element
  * lambda references it — an outer-scope subexpression inside a HOF lambda
  * is not guaranteed to be eliminated and can re-evaluate per element (the
  * `element_at(transform(...))` trap, SCALE.md).
  */
object EmbeddingPrep {

  private def asDouble(vecCol: Column): Column =
    transform(vecCol, x => x.cast("double"))

  /** Unit-L2 vectors as ARRAY<DOUBLE>; zero vectors pass through as zeros
    * (no NaN poisoning). Output column: `nvec`. */
  def l2Normalize(embs: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val v = asDouble(col(vecCol))
    embs.withColumn("__v", v)
      .withColumn("__norm", sqrt(dot(col("__v"), col("__v"))))
      .withColumn("nvec",
        when(col("__norm") === 0.0d, col("__v"))
          .otherwise(transform(col("__v"), x => x / col("__norm"))))
      .drop("__v", "__norm")
  }

  /** Symmetric per-vector int8 quantization: `scale = max |x|`,
    * `q = round(x · 127 / scale)` as ARRAY<TINYINT> plus the `scale`
    * needed to dequantize (`q · scale / 127`). Zero vectors quantize to
    * zeros with scale 0. Output columns: `qvec`, `scale`. */
  def quantizeInt8(embs: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val v = asDouble(col(vecCol))
    embs.withColumn("__v", v)
      .withColumn("scale", array_max(transform(col("__v"), x => abs(x))))
      .withColumn("qvec",
        when(col("scale") === 0.0d,
          transform(col("__v"), _ => lit(0).cast("byte")))
          .otherwise(transform(col("__v"),
            x => round(x * 127.0d / col("scale")).cast("byte"))))
      .drop("__v")
  }

  /** Matryoshka truncation (MRL-style): keep the FIRST `dim`
    * coordinates and L2-renormalize — the storage/latency dial of
    * matryoshka-trained embedding models, where a prefix of the vector
    * is itself a valid lower-capacity embedding. Zero prefixes pass
    * through as zeros (the [[l2Normalize]] contract); vectors shorter
    * than `dim` keep their full length (slice semantics). Narrow,
    * codegen'd, no shuffle. Output column: `tvec`. */
  def truncate(embs: DataFrame, dim: Int,
      vecCol: String = "embedding"): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val v = slice(asDouble(col(vecCol)), 1, dim)
    embs.withColumn("__v", v)
      .withColumn("__norm", sqrt(dot(col("__v"), col("__v"))))
      .withColumn("tvec",
        when(col("__norm") === 0.0d, col("__v"))
          .otherwise(transform(col("__v"), x => x / col("__norm"))))
      .drop("__v", "__norm")
  }

  /** Binary (1-bit) quantization: the sign structure of the vector
    * packed into 32-bit little-endian words — bit `j` of word `w` is set
    * iff element `32w + j` (0-based) is > 0. The 32× storage drop of the
    * binary-embedding retrieval recipe (sign bits + Hamming distance
    * approximate cosine for normalized vectors; exact rerank recovers
    * the rest — [[Similarity.bqTopK]]). 32 bits per word, not 64: every
    * packed value stays well inside a non-negative BIGINT, so external
    * engines recompute the words with plain integer arithmetic (no sign
    * bit, no HUGEINT detour). Pure array-HOF fold over a materialized
    * vector column, codegen-friendly, no shuffle. Output column: `bvec`
    * (ARRAY<BIGINT>, length ⌈d/32⌉). */
  def binaryQuantize(embs: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val v = asDouble(col(vecCol))
    embs.withColumn("__v", v)
      .withColumn("bvec",
        when(size(col("__v")) === 0, array().cast("array<bigint>"))
          .otherwise(transform(
            sequence(lit(0),
              floor((size(col("__v")) - 1) / 32.0d).cast("int")),
            w => aggregate(
              sequence(lit(31), lit(0), lit(-1)), lit(0L),
              (acc, j) => {
                val idx = (w * 32 + j + 1).cast("int")
                acc * lit(2L) +
                  when(idx <= size(col("__v")) &&
                    element_at(col("__v"), idx) > 0.0d, lit(1L))
                    .otherwise(lit(0L))
              }))))
      .drop("__v")
  }

  /** Inverse of [[quantizeInt8]] (lossy): ARRAY<DOUBLE> `dvec`. */
  def dequantizeInt8(df: DataFrame, qvecCol: String = "qvec",
      scaleCol: String = "scale"): DataFrame =
    df.withColumn("dvec",
      transform(col(qvecCol), q => q.cast("double") * col(scaleCol) / 127.0d))
}
