package graft.tools

import org.apache.spark.sql.SparkSession

// scratch audit harness (not part of the library surface): run every
// catalog face with codegen fallback DISABLED, so any stage whose
// generated method janino cannot compile (the 64 KB method limit —
// which silently degrades to interpreted evaluation and a 10-100x
// per-row cost in production) surfaces as a hard per-face failure
// instead of an ERROR log line nobody reads. Streaming replay faces
// rebuild checkpoints; everything runs at the smallest SF — codegen
// shape is SF-independent.
object CodegenAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.sql.codegen.wholeStage", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    var bad = 0
    names.foreach { name =>
      val r = scala.util.Try(graft.SparkEntry.queries(name)(spark, dir).count())
      r match {
        case scala.util.Success(n) => println(s"OK   $name n=$n")
        case scala.util.Failure(e) =>
          bad += 1
          val root = {
            var c: Throwable = e
            while (c.getCause != null && c.getCause != c) c = c.getCause
            c
          }
          println(s"FAIL $name ${root.getClass.getSimpleName}: " +
            root.getMessage.take(160).replace('\n', ' '))
      }
    }
    println(s"codegen audit: ${names.size - bad} ok / $bad failed")
    spark.stop()
  }
}
