package graft.plans

import org.apache.spark.sql.catalyst.expressions.{GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Levenshtein, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: a thresholded edit-distance FILTER should run the
  * banded algorithm, not the full DP matrix.
  *
  * `levenshtein(a, b) <= k` computes the complete O(|a|·|b|) distance
  * per row and then compares. Spark's ternary Levenshtein(a, b, k)
  * runs the O(k·min(|a|,|b|)) banded variant with early exit,
  * returning -1 when the distance exceeds k — so inside a filter the
  * two are equivalent: distance <= k  ⟺  bounded(a, b, k) >= 0
  * (null inputs yield null on both forms, filtering identically).
  *
  * The rewrite targets Filter conditions only (a projected distance
  * VALUE must stay exact) and emits the non-matching
  * `bounded >= 0` shape, so the rule is fixpoint-stable. For fuzzy
  * entity matching (q83-style blocked verification) the verify kernel
  * drops from quadratic to banded per pair — the dominant cost at
  * block scale.
  */
object RewriteBoundedLevenshtein extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val rewritten = cond.transformUp {
        case LessThanOrEqual(Levenshtein(a, b, None), k @ Literal(kv: Int, IntegerType))
            if kv > 0 =>
          GreaterThanOrEqual(Levenshtein(a, b, Some(k)), Literal(0))
        case GreaterThanOrEqual(k @ Literal(kv: Int, IntegerType), Levenshtein(a, b, None))
            if kv > 0 =>
          GreaterThanOrEqual(Levenshtein(a, b, Some(k)), Literal(0))
        case LessThan(Levenshtein(a, b, None), Literal(kv: Int, IntegerType))
            if kv > 1 =>
          GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(kv - 1))), Literal(0))
        case GreaterThan(Literal(kv: Int, IntegerType), Levenshtein(a, b, None))
            if kv > 1 =>
          GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(kv - 1))), Literal(0))
      }
      if (rewritten fastEquals cond) f else f.copy(condition = rewritten)
  }
}
