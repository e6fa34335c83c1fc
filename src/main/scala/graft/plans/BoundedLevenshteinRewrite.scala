package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Levenshtein, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType
import graft.functions.BoundedLevenshtein

/** Optimizer rule: rewrite bounded edit-distance PREDICATES onto the banded
  * kernel — `levenshtein(a, b) <= k` (k an INT literal) becomes
  * `bounded_levenshtein(a, b, k) >= 0`, so a user writing plain ANSI-ish
  * SQL gets the affix-trimmed O((2k+1)·len) Ukkonen DP with band-minimum
  * early exit ([[graft.functions.BoundedLevenshtein]], ~2.5× on
  * entity-resolution blocks) instead of the built-in's full O(len²) table.
  *
  * Semantics are exactly preserved:
  *   - bounded(a, b, k) returns dist (≤ k) or −1, so `>= 0` ⟺ `dist <= k`;
  *   - strict `< k` rewrites with bound k−1 (only for k ≥ 1);
  *   - null inputs: both forms are null-intolerant, so the predicate stays
  *     NULL either way;
  *   - only INT literals rewrite — a column-valued or folded-away bound
  *     keeps the built-in (the kernel needs a compile-time band width).
  *
  * Runs in the user-provided optimizer batch (after constant folding, so
  * expression-literal bounds like `1 + 1` are already literals). Registered
  * by [[graft.GraftExtensions]] via `injectOptimizerRule` at builder time
  * or `spark.experimental.extraOptimizations` at runtime.
  */
object BoundedLevenshteinRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // dist <= k  /  k >= dist
    case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType)) if k >= 0 =>
      GreaterThanOrEqual(BoundedLevenshtein(a, b, k), Literal(0, IntegerType))
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None)) if k >= 0 =>
      GreaterThanOrEqual(BoundedLevenshtein(a, b, k), Literal(0, IntegerType))
    // dist < k  /  k > dist  (band k-1; k >= 1 keeps the bound legal)
    case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType)) if k >= 1 =>
      GreaterThanOrEqual(BoundedLevenshtein(a, b, k - 1), Literal(0, IntegerType))
    case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(a, b, None)) if k >= 1 =>
      GreaterThanOrEqual(BoundedLevenshtein(a, b, k - 1), Literal(0, IntegerType))
  }
}
