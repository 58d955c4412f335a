package graft.sources

import java.nio.file.Files

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Data-layout tests: the declarative pruning paths a 100 TB deployment
  * lives on — partition pruning (directory skip) and filter pushdown over
  * a range-clustered sort (row-group skip).
  */
class LayoutSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("writePartitioned: partition filter reaches the scan, directories pruned") {
    val dir = tmp("part")
    val df = (1 to 1000).map(i => (i.toLong, s"t${i % 4}", i * 1.5))
      .toDF("id", "kind", "v")
    Sources.writePartitioned(df, dir, Seq("kind"))
    // one directory per kind
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("kind=")).sorted
    assert(dirs.toSeq == Seq("kind=t0", "kind=t1", "kind=t2", "kind=t3"))

    val q = spark.read.parquet(dir).filter($"kind" === "t2")
    val scan = q.queryExecution.executedPlan.toString
    // the filter must appear INSIDE the PartitionFilters bracket — a bare
    // contains() check passes vacuously on 'PartitionFilters: []' plus a
    // post-scan Filter node mentioning the column
    assert("PartitionFilters: \\[[^\\]]*kind".r.findFirstIn(scan).isDefined,
      s"kind filter must be inside PartitionFilters:\n$scan")
    assert(q.count() == 250)
    // and the pruned read touches only the matching directory's files
    val files = q.select(input_file_name()).distinct().as[String].collect()
    assert(files.forall(_.contains("kind=t2")), files.mkString("\n"))
  }

  test("writeSorted: disjoint file ranges, pushed filters on the sort column") {
    val dir = tmp("sorted")
    val df = (1 to 10000).map(i => (i.toLong, s"p$i")).toDF("id", "payload")
    Sources.writeSorted(df, dir, Seq("id"), numFiles = 4)

    // each parquet file covers a disjoint id range (range partitioning)
    val perFile = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min($"id").as("lo"), max($"id").as("hi"))
      .as[(String, Long, Long)].collect().sortBy(_._2)
    assert(perFile.length == 4)
    perFile.sliding(2).foreach {
      case Array(a, b) => assert(a._3 < b._2,
        s"file ranges overlap: ${a._3} >= ${b._2}")
      case _ =>
    }

    val q = spark.read.parquet(dir).filter($"id" === 7777L)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("EqualTo(id,7777)"),
      s"filter must be pushed to the parquet scan:\n$scan")
    assert(q.count() == 1)
  }
}
