package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit entry point: prints `.explain("formatted")` for the named
  * catalog queries (all of them when none given). Usage:
  *   sbt "runMain graft.Explain [sfDir] [query ...]"
  * The 100 TB review loop: after a query is correct, read its plan here and
  * iterate until it is the plan you'd want on a 1000-executor cluster —
  * filters on scans, broadcasts on small sides, no stray exchanges.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // same extensions as Verify/Bench — the audited plan is the plan
      // the gates actually run (q_topk_window pin honored below)
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          println(s"\n========== $name ==========")
          try Bench.runPinned(spark, name)(fn(spark, sfDir).explain("formatted"))
          catch { case e: Throwable => println(s"[explain] $name failed: $e") }
        case None => println(s"[explain] unknown query: $name")
      }
    }
    spark.stop()
  }
}
