package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.GraftFunctions.cosine

/** Deduplication operators for a training-data pipeline (SURVEY.md §2.10):
  * exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design notes (the 100 TB story):
  *  - exact dedup is one hash-shuffle on the dup key (or its xxhash64 to keep
  *    shuffle rows narrow when the key is a whole document);
  *  - MinHash/LSH: per-doc signature is a narrow map-side transform; the only
  *    shuffle is the `(band_idx, band_hash)` explode (×#bands row growth but
  *    each row is just ids+hash), then candidate verification joins only
  *    within buckets — never all-pairs. Skewed buckets (boilerplate docs)
  *    are the classic hazard: `maxBucket` caps them deterministically;
  *  - SimHash: join on 16-bit chunk equality (pigeonhole: hamming ≤ 3 ⇒ at
  *    least one of 4 chunks equal), verify with `bit_count(xor)`;
  *  - embedding near-dup blocks on an existing coarse key (label/IVF cell)
  *    so the quadratic verify is per-block, not global.
  */
object Dedup {

  /** Exact dedup: deterministic survivor (min id) per distinct key. */
  def exact(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))

  /** Candidate near-dup pairs via MinHash + LSH banding, verified with exact
    * Jaccard over distinct shingle-hash sets.
    *
    * @param bands     number of LSH bands (signature length = bands * rowsPerBand)
    * @param maxBucket drop pathological buckets larger than this (skew guard)
    */
  def minhashPairs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      k: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.8, maxBucket: Int = 1000): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sigd = docs.select(
      col(idCol),
      array_distinct(hashed(shingles(tokens(col(textCol)), k))).as("sh"))
      .withColumn("sig", minhashSig(col("sh"), numHashes))

    // band_j = hash of the j-th signature slice → bucket key (bands is a
    // plan-time constant, so the band array is statically unrolled — better
    // codegen than a sequence+transform HOF)
    val bandArray = array((0 until bands).map(b =>
      xxhash64(lit(b), concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)))): _*)
    val banded = sigd.select(
      col(idCol), col("sh"),
      posexplode(bandArray).as(Seq("band_idx", "band_hash")))

    // skew guard: deterministically drop over-sized buckets
    val bucketed = banded.withColumn("bucket_n",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("band_idx"), col("band_hash"))))
      .filter(col("bucket_n") <= maxBucket)

    val l = bucketed.select(col("band_idx"), col("band_hash"),
      col(idCol).as("id_a"), col("sh").as("sh_a"))
    val r = bucketed.select(col("band_idx"), col("band_hash"),
      col(idCol).as("id_b"), col("sh").as("sh_b"))

    l.join(r, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash near-dup pairs: hamming(simhash_a, simhash_b) <= maxHamming.
    * Candidate generation joins on equality of one of `chunks` 16-bit chunks
    * (pigeonhole guarantee when maxHamming < chunks). */
  def simhashPairs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      maxHamming: Int = 3, chunks: Int = 4, maxBucket: Int = 1000): DataFrame = {
    val width = 64 / chunks
    val mask = (1L << width) - 1L
    val sigs = docs.select(col(idCol),
      simhash64(hashed(tokens(col(textCol)))).as("sim"))
    val chunkArray = array((0 until chunks).map(c =>
      shiftright(col("sim"), c * width).bitwiseAND(lit(mask))): _*)
    val chunked = sigs.select(col(idCol), col("sim"),
      posexplode(chunkArray).as(Seq("chunk_idx", "chunk_val")))
      .withColumn("bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("chunk_idx"), col("chunk_val"))))
      .filter(col("bucket_n") <= maxBucket)

    val l = chunked.select(col("chunk_idx"), col("chunk_val"),
      col(idCol).as("id_a"), col("sim").as("sim_a"))
    val r = chunked.select(col("chunk_idx"), col("chunk_val"),
      col(idCol).as("id_b"), col("sim").as("sim_b"))
    l.join(r, Seq("chunk_idx", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard pairs within a blocking key (no sketch — the
    * SQL-checkable ground truth the sketched variants approximate). */
  def ngramJaccardPairs(docs: DataFrame, blockCol: Column,
      idCol: String = "doc_id", textCol: String = "text",
      k: Int = 3, threshold: Double = 0.5): DataFrame = {
    val d = docs.select(col(idCol), blockCol.as("block"),
      array_distinct(shingles(tokens(col(textCol)), k)).as("sh"))
    val l = d.select(col("block"), col(idCol).as("id_a"), col("sh").as("sh_a"))
    val r = d.select(col("block"), col(idCol).as("id_b"), col("sh").as("sh_b"))
    l.join(r, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Embedding-cosine near-dup pairs within a blocking key (label / IVF
    * cell): the per-block quadratic verify that backs ANN dedup. */
  def embeddingPairs(embs: DataFrame, blockCol: Column,
      idCol: String = "vec_id", vecCol: String = "embedding",
      threshold: Double = 0.95): DataFrame = {
    val d = embs.select(col(idCol), blockCol.as("block"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    val l = d.select(col("block"), col(idCol).as("id_a"), col("v").as("v_a"))
    val r = d.select(col("block"), col(idCol).as("id_b"), col("v").as("v_b"))
    l.join(r, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("v_a"), col("v_b")), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
