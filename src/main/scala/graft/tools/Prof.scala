package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// scratch profiling harness (not part of the library surface)
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("q_cc_components", "q_dedup_corpus_cc", "q_dedup_minhash_recall")

    def time(name: String)(f: => Long): Unit = {
      val runs = (0 until 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      // every sample, in order: first-iteration stalls (fixture builds,
      // codegen, GC debt) are visible only in the per-run sequence
      println(f"$name%-40s ${runs.map(_._1).min}%8.3f s  n=${runs.head._2}" +
        runs.map(r => f"${r._1}%.3f").mkString("  [", " ", "]"))
    }

    // `name@/some/sf/dir` runs that query against an explicit fixture dir
    // (simulating Bench's warm-at-sf0.001-then-time-at-sf0.1 sequence)
    qs.foreach { q =>
      val (name, d) = q.split("@", 2) match {
        case Array(n, over) => (n, over)
        case _ => (q, dir)
      }
      time(q)(graft.SparkEntry.queries(name)(spark, d).count())
    }
    spark.stop()
  }
}
