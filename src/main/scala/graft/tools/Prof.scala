package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// scratch profiling harness (not part of the library surface)
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.TextFunctions._
    val docs = graft.Tables.documents(spark, dir)

    def time(name: String)(f: => Long): Unit = {
      val runs = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$name%-40s ${runs.map(_._1).min}%8.3f s  n=${runs.head._2}")
    }

    time("scan only")(docs.select(col("lang"), col("text")).count())
    time("tokens")(docs.select(col("lang"), tokens(col("text")).as("t")).count())
    time("shingles explode")(
      docs.select(col("lang"), explode(shingles(tokens(col("text")), 3)).as("ngram")).count())
    time("explode + groupBy count")(
      docs.select(col("lang"), explode(shingles(tokens(col("text")), 3)).as("ngram"))
        .groupBy(col("lang"), col("ngram")).agg(count(lit(1))).count())
    time("shingles explode, toks materialized")(
      docs.select(col("lang"), tokens(col("text")).as("toks"))
        .select(col("lang"), explode(shingles(col("toks"), 3)).as("ngram")).count())
    time("full q_ngram_topk")(
      graft.SparkEntry.queries("q_ngram_topk")(spark, dir).count())
    time("full q_dedup_minhash_recall")(
      graft.SparkEntry.queries("q_dedup_minhash_recall")(spark, dir).count())
    time("full q_s2_roundtrip")(
      graft.SparkEntry.queries("q_s2_roundtrip")(spark, dir).count())
    spark.stop()
  }
}
