package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite bounded edit-distance predicates into
  * Spark's thresholded `levenshtein`, which abandons a pair as soon as
  * the DP band exceeds the bound — O(k·len) per comparison instead of
  * O(len²).
  *
  * `levenshtein(a, b) <= k`  →  `levenshtein(a, b, k) >= 0`
  * `levenshtein(a, b) <  k`  →  `levenshtein(a, b, k-1) >= 0`
  *
  * The thresholded form returns the true distance when it is ≤ k and
  * −1 otherwise, so `>= 0` is exactly the original predicate; on null
  * input both forms yield null, so three-valued logic is preserved.
  * This is the natural predicate users write in record-linkage /
  * fuzzy-dedup SQL — the rewrite gives them the banded algorithm
  * without touching their query. Flipped comparisons (`k >=
  * levenshtein(...)`) are normalized by Catalyst before this rule
  * runs in the operatorOptimization batch.
  */
object ThresholdLevenshtein extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(a, b, None), lit @ Literal(k: Int, IntegerType))
          if k >= 0 =>
        GreaterThanOrEqual(Levenshtein(a, b, Some(lit)), Literal(0))
      case GreaterThanOrEqual(lit @ Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 0 =>
        GreaterThanOrEqual(Levenshtein(a, b, Some(lit)), Literal(0))
      case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
          if k >= 1 =>
        GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(k - 1))), Literal(0))
      case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 1 =>
        GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(k - 1))), Literal(0))
    }
}
