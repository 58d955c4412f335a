package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.GraftFunctions

/** Cluster-deployment entry point: registers the graft function catalog and
  * the window-top-k rewrite at session build time —
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or: SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * The one injected optimizer rule, [[graft.plans.RewriteWindowTopK]],
  * replaces provably-equivalent `row_number()` window top-k filters with
  * the k-bounded TopK aggregate (opt out:
  * `spark.graft.rewriteWindowTopK=false`). No strategies or plan nodes are
  * injected: the engine's operators are all Catalyst-planned DataFrame
  * compositions (SURVEY.md §4); custom pieces are expressions (function
  * registry) plus this one plan-shape rewrite.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.functionBuilders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", name),
        builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.RewriteWindowTopK)
  }
}
