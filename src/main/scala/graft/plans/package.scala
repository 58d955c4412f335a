package graft

/** Custom Catalyst plan nodes / rules / strategies.
  *
  * Intentionally empty (see SURVEY.md §4): nothing in the reference's
  * semantics — nor in the §2.10 extensions — needs planner surgery. Every
  * operator here is either a composition of built-in relational operators
  * (Catalyst plans them, AQE re-plans them at runtime) or a scalar/aggregate
  * *expression* (graft.functions.*, registered via [[graft.GraftExtensions]]),
  * which is the cheaper extension point: expressions stay inside whole-stage
  * codegen and need no strategy, exchange planning, or resolution rules.
  *
  * The decision table (SURVEY.md §7.4) records the preference order used
  * throughout: compose built-ins → custom `Expression` → custom
  * `LogicalPlan`+`Strategy` → `mapPartitions`. The furthest the engine ever
  * needs is level 2.
  */
package object plans
