package graft

/** Custom Catalyst plan rules.
  *
  * One resident: [[graft.plans.RewriteWindowTopK]], an optimizer rule
  * (injected by [[graft.GraftExtensions]]) that migrates the ubiquitous
  * `row_number().over(window).filter(rk <= k)` idiom to the k-bounded
  * [[graft.functions.TopKByOrd]] aggregate — the plan-shape fix this repo
  * applied by hand to its own queries, made automatic for user queries.
  *
  * Nothing else lives here by design (SURVEY.md §4): every operator is
  * either a composition of built-in relational operators (Catalyst plans
  * them, AQE re-plans them at runtime) or a scalar/aggregate *expression*
  * (graft.functions.*), which is the cheaper extension point — expressions
  * stay inside whole-stage codegen and need no strategy, exchange
  * planning, or resolution rules. The decision table (SURVEY.md §7.4)
  * records the preference order used throughout: compose built-ins →
  * custom `Expression` → custom rule → `LogicalPlan`+`Strategy` →
  * `mapPartitions`. The furthest the engine needs is the one rewrite rule.
  */
package object plans
