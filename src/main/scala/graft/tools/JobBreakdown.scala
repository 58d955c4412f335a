package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch measurement harness (guide §1/§7): runs one catalog face and
  * prints every Spark job's wall time + stage count + description, so
  * "where do the seconds go" is answerable without the UI (disabled in
  * this environment). Not part of the library surface. */
object JobBreakdown {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class J(var start: Long = 0L, var end: Long = 0L,
      var desc: String = "", var stages: Int = 0, var tasks: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = new J(e.time, 0L,
          Option(e.properties.getProperty("spark.job.description"))
            .getOrElse(""), e.stageInfos.size,
          e.stageInfos.map(_.numTasks).sum)
        jobs.put(e.jobId, j)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.end = e.time
      }
    }
    spark.sparkContext.addSparkListener(listener)

    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warm run (fixture build, codegen) — not broken down
      graft.Bench.runPinned(spark, name)(fn(spark, dir).count())
      spark.catalog.clearCache()
      jobs.clear()
      val t0 = System.nanoTime()
      graft.Bench.runPinned(spark, name)(fn(spark, dir).count())
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"\n===== $name  total ${dt}%.3f s  jobs=${jobs.size} =====")
      import scala.jdk.CollectionConverters._
      val rows = jobs.asScala.toSeq.sortBy(_._1)
      rows.foreach { case (id, j) =>
        println(f"job $id%3d  ${(j.end - j.start) / 1e3}%7.3f s  " +
          f"stages=${j.stages}%2d tasks=${j.tasks}%4d  ${j.desc.take(80)}")
      }
      val busy = rows.map(r => (r._2.end - r._2.start) / 1e3).sum
      println(f"sum-of-jobs ${busy}%.3f s (gaps = driver/planning: " +
        f"${dt - busy}%.3f s)")
    }
    spark.stop()
  }
}
