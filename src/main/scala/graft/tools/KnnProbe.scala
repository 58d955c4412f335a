package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      val runs = (0 until 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$name%-30s ${runs.map(_._1).min}%8.3f s n=${runs.head._2}")
    }
    val embs = graft.Tables.embeddings(spark, dir)
    time("collect sample + lloyd") {
      val c = embs.select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      val sample = c.orderBy(col("vec_id")).limit(10000).select(col("v")).collect()
      sample.length.toLong
    }
    time("knnGraph full") {
      graft.operators.Similarity.knnGraph(embs, k = 5, nlist = 8, nprobe = 3).count()
    }
    spark.stop()
  }
}
