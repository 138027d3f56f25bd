package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Algebraic rewrites for the engine's native expressions, injected into
  * Catalyst via `GraftExtensions` (`injectOptimizerRule`).
  *
  * `dot_f(a, a)` ≡ `sum_sq_f(a)`: the self-dot-product reads the array
  * twice and multiplies pairwise; the sum-of-squares form reads it once.
  * Self-similarity shows up when generic scoring code is instantiated
  * with query == corpus (dedup against self, norm computations), and the
  * caller shouldn't have to special-case it — the optimizer does.
  *
  * Guard: only for deterministic children (a nondeterministic `a` must
  * not collapse from two evaluations to one — that would change
  * semantics, the same rule Catalyst applies everywhere).
  */
object DotSelfToSumSq extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case DotProductF(a, b) if a.deterministic && a.semanticEquals(b) =>
        SumSqF(a)
    }
}
