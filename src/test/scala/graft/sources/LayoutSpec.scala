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

  test("aggregate pushdown: COUNT/MIN/MAX answered from parquet footers") {
    // spark.sql.parquet.aggregatePushdown pushes whole-table COUNT/MIN/MAX
    // into the scan — the query reads row-group METADATA, zero data pages.
    // At 100 TB that turns corpus-size audits from a full scan into a
    // footer sweep; worth guarding because the conf silently no-ops when a
    // query shape disqualifies (filters, nested fields, timestamps).
    val dir = s"${tmp("aggpush")}/data"
    (1 to 5000).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
      .write.parquet(dir)
    val prev = spark.conf.get("spark.sql.parquet.aggregatePushdown", "false")
    val prevV1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    try {
      spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
      // aggregate pushdown is a DSv2-only feature; parquet defaults to the
      // V1 path, so lift it out of the V1 list for this read
      spark.conf.set("spark.sql.sources.useV1SourceList",
        prevV1.split(",").filterNot(_.trim == "parquet").mkString(","))
      val q = spark.read.parquet(dir).agg(count("*"), min($"id"), max($"v"))
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("PushedAggregation"),
        s"aggregates must reach the scan:\n${p.take(2000)}")
      val r = q.head()
      assert(r.getLong(0) == 5000L && r.getLong(1) == 1L && r.getDouble(2) == 10000.0)
    } finally {
      spark.conf.set("spark.sql.parquet.aggregatePushdown", prev)
      spark.conf.set("spark.sql.sources.useV1SourceList", prevV1)
    }
  }

  test("writeZOrdered: BOTH dimensions cluster per file; single-col sort only one") {
    // a 100×100 grid of (a, b): z-order tiles the plane, so each output
    // file should cover a bounded window of a AND of b; a plain sort on
    // `a` clusters a but leaves b spanning its full range in every file
    val dir = tmp("zorder")
    val dirA = tmp("asorted")
    val grid = (for (a <- 0 until 100; b <- 0 until 100)
      yield (a.toLong, b.toLong)).toDF("a", "b")
    Sources.writeZOrdered(grid, dir, "a", "b", numFiles = 16)
    Sources.writeSorted(grid, dirA, Seq("a"), numFiles = 16)

    def avgSpan(path: String, c: String): Double =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max(col(c)) - min(col(c))).as("span"))
        .agg(avg($"span")).head().getDouble(0)

    val (za, zb) = (avgSpan(dir, "a"), avgSpan(dir, "b"))
    val (sa, sb) = (avgSpan(dirA, "a"), avgSpan(dirA, "b"))
    // z-order: both dimensions bounded well below the full 0..99 range
    assert(za < 60.0 && zb < 60.0, s"z-order must cluster both dims: a=$za b=$zb")
    // single-column sort: a clusters tightly, b spans ~everything
    assert(sa < 20.0, s"sort clusters its own column: $sa")
    assert(sb > 90.0, s"sort leaves the other column unclustered: $sb")
    // and z-order beats the sort on the non-sorted dimension by a lot
    assert(zb < sb / 2, s"z-order b-span $zb must beat plain-sort $sb")

    // correctness: same rows back
    assert(spark.read.parquet(dir).count() == 10000)

    // min/max pruning is live on both columns: a two-sided predicate reads
    // fewer files than exist
    val q = spark.read.parquet(dir)
      .filter($"a".between(10, 19) && $"b".between(10, 19))
    assert(q.count() == 100)
    val touched = q.select(input_file_name()).distinct().count()
    assert(touched < 16, s"two-dim predicate should not touch every file: $touched")
  }
}
