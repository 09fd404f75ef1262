package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/**
 * Optimizer rule: rewrite existence checks phrased as a filtered-array
 * cardinality — `size(filter(xs, f)) > 0` (and its `= 0` / `>= 1`
 * negations) — into `exists(xs, f)` / `NOT exists(xs, f)`.
 *
 * Why a RULE and not a style fix: the `size(filter(...))` shape is
 * what desugarings naturally emit — the Cypher engine's
 * `EXISTS { pattern }` projection expression and `single()`-style
 * list predicates both lower through filtered comprehensions — and
 * per-row it materializes the whole filtered array, walks every
 * element, then throws the array away. `exists` short-circuits at the
 * first hit and allocates nothing. On a boilerplate-heavy corpus
 * where the predicate hits early, that is the difference between
 * O(match position) and O(n) per row.
 *
 * Correctness guards:
 *  - only fires when `legacySizeOfNull` is off (the default): with it
 *    on, `size(null) = -1` makes the comparison FALSE where `exists`
 *    yields NULL — not equivalent;
 *  - the replacement `ArrayExists` is built with three-valued logic
 *    DISABLED, matching the count semantics exactly: `filter` keeps
 *    only elements whose predicate is TRUE (nulls drop), so
 *    `size > 0` is "∃ strictly-true element" — which is exactly
 *    `exists` under non-3VL. Under 3VL a null predicate result could
 *    turn a FALSE into a NULL and change projected values.
 *
 * Registered by [[graft.GraftExtensions]] via `injectOptimizerRule`;
 * plan-asserted and value-asserted in PlanRulesSpec.
 */
object ShortCircuitExists extends Rule[LogicalPlan] {

  private object FilteredSize {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case s @ Size(ArrayFilter(arr, f), _) if !s.legacySizeOfNull =>
        Some((arr, f))
      case _ => None
    }
  }

  private def exists(arr: Expression, f: Expression): Expression =
    ArrayExists(arr, f, followThreeValuedLogic = false)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case GreaterThan(FilteredSize(arr, f), Literal(0, _)) =>
        exists(arr, f)
      case LessThan(Literal(0, _), FilteredSize(arr, f)) =>
        exists(arr, f)
      case GreaterThanOrEqual(FilteredSize(arr, f), Literal(1, _)) =>
        exists(arr, f)
      case EqualTo(FilteredSize(arr, f), Literal(0, _)) =>
        Not(exists(arr, f))
      case EqualTo(Literal(0, _), FilteredSize(arr, f)) =>
        Not(exists(arr, f))
      case LessThanOrEqual(FilteredSize(arr, f), Literal(0, _)) =>
        Not(exists(arr, f))
    }
}
