package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-JVM A/B probe for the q_pagerank cost breakdown (r12 judge
  * directive #5): edge-staging slice vs per-round slice, lazy
  * localCheckpoint vs durable parquet staging, and rounds scaling.
  * Results land in SCALE.md ("PageRank cost probe"). */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def edges = graft.Tables.orders(spark, dir)
      .join(graft.Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + lit(1000000L)).as("dst"))

    def time(name: String)(f: => Long): Double = {
      val runs = (0 until 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val best = runs.map(_._1).min
      println(f"$name%-44s $best%8.3f s  n=${runs.head._2}")
      best
    }

    // slice 1: the once-per-job edge derivation + staging (distinct +
    // node union + out-degrees), no rounds
    time("stage only (edges+nodes+outdeg counts)") {
      val canon = edges.distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      
      val c = canon.count()
      canon.unpersist(); c
    }

    // slice 2: rounds scaling — 1 vs 3 vs 5 rounds of the real operator
    Seq(1, 3, 5).foreach { r =>
      time(s"pageRank rounds=$r (lazy localCheckpoint)") {
        graft.operators.Graph.pageRank(edges, rounds = r).count()
      }
    }

    // slice 3: durable parquet staging path
    time("pageRank rounds=5 (durable staging)") {
      graft.operators.Staging.withDir(spark,
        java.nio.file.Files.createTempDirectory("pr-probe").toString) { d =>
        graft.operators.Graph.pageRank(edges, rounds = 5,
          stagingDir = Some(d)).count()
      }
    }
    spark.stop()
  }
}
