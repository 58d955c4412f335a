package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.GraftFunctions

/** Cluster-deployment entry point: registers the graft function catalog at
  * session build time —
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or: SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * No planner rules or strategies are injected: the engine's operators are
  * all Catalyst-planned DataFrame compositions (SURVEY.md §4 — nothing in
  * the reference's semantics needs planner surgery); the only custom pieces
  * are scalar expressions, which belong in the function registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functionBuilders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", name),
        builder))
    }
}
