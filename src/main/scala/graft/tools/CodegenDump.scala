package graft.tools

import org.apache.spark.sql.SparkSession

// scratch harness (not part of the library surface): print, per
// WholeStageCodegen span of a face's physical plan, the generated
// source size and janino's compiled max-method size — the direct
// evidence for 64 KB method blowups that silently fall back to
// interpreted evaluation.
object CodegenDump {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // AQE defers span creation to stage materialization — disable so
      // the static executedPlan carries the WholeStageCodegen nodes
      .config("spark.sql.adaptive.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // no args: sweep the whole catalog, printing only anomalies (big
    // expression trees, failed or near-limit spans) — the standing
    // codegen-health check next to CodegenAudit's hard-fail run
    val names = if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val sweep = args.isEmpty
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      if (!sweep) println(s"=== $name ===")
      // optimizer-side view first: per-node total expression-tree size —
      // an inlining cascade (CollapseProject / predicate pushdown
      // substitution) shows up here as one node with a 10^4+ expression
      // count long before codegen renders it as megabytes of Java
      df.queryExecution.optimizedPlan.foreach { n =>
        val exprSize = n.expressions.map(e => e.collect { case x => x }.size).sum
        if (exprSize > (if (sweep) 20000 else 500))
          println(f"  $name opt ${n.nodeName}%-20s exprTreeNodes=$exprSize%8d")
      }
      // substitution explosions render as kilometer-long plan lines well
      // before they hit the 20k-node print bar (q_frontier_traps' pushed
      // trap gate was a 195 KB Filter condition at ~4k nodes) — flag any
      // optimized-plan line over 30 KB
      val longest = df.queryExecution.optimizedPlan.toString
        .linesIterator.map(_.length).max
      if (longest > 30000)
        println(s"  $name opt LONG-LINE ${longest} chars")
      val plan = df.queryExecution.executedPlan
      var i = 0
      plan.foreach {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
          i += 1
          val (_, src) = w.doCodeGen()
          val code = src.body
          val r = scala.util.Try(
            org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
              .compile(src))
          val status = r match {
            case scala.util.Success((_, maxMethod)) => s"maxMethod=$maxMethod"
            case scala.util.Failure(e) =>
              var c: Throwable = e
              while (c.getCause != null && c.getCause != c) c = c.getCause
              s"COMPILE FAIL: ${c.getMessage.take(100)}"
          }
          // sweep mode: only failures, megabyte spans, or methods past
          // half of janino's 64 KB limit are worth a line
          val near = r match {
            case scala.util.Success((_, m)) => m.maxMethodCodeSize > 32000
            case _ => true
          }
          if (!sweep || near || code.length > 1000000) {
            println(f"  $name span $i%2d src=${code.length}%8d chars  " +
              s"$status  ${w.child.nodeName}")
            // big spans: show the fused subtree so the heavy operator
            // chain is identifiable without a separate explain run
            if (code.length > 300000) {
              println(w.child.treeString.linesIterator
                .map("      " + _.take(150)).take(20).mkString("\n"))
              val f = s"/tmp/span_${name}_$i.java"
              java.nio.file.Files.write(java.nio.file.Paths.get(f),
                code.getBytes("UTF-8"))
              println(s"      [source dumped to $f]")
            }
          }
        case _ =>
      }
    }
    spark.stop()
  }
}
