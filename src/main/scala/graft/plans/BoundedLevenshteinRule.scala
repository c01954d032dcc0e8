package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Threshold pushdown for edit-distance predicates — a `Rule[LogicalPlan]`
  * counterpart of the reference's `editdistance_with_max` kernel
  * (BodoSQL/bodosql/kernels/string_array_kernels.py): the user writes the
  * natural predicate, the optimizer supplies the banded algorithm.
  *
  * `levenshtein(a, b) <= k` evaluates the full O(|a|·|b|) dynamic program
  * on every row before comparing; Spark's bounded form
  * `levenshtein(a, b, k)` abandons a row as soon as the distance must
  * exceed k (an O(k·min(|a|,|b|)) band) and returns -1 beyond the bound.
  * Since bounded returns -1 exactly when the true distance exceeds k
  * (and null exactly when unbounded is null):
  *
  *   lev(a,b) <= k  ≡  lev(a,b,k) >= 0        lev(a,b) > k  ≡  lev(a,b,k) = -1
  *
  * Only non-negative integer literals are rewritten. Registered through
  * `GraftExtensions.injectOptimizerRule` — runs in the user-provided
  * optimizer batch of every session built with the extension.
  */
object BoundedLevenshteinRule extends Rule[LogicalPlan] {

  private def nonNegIntLit(e: Expression): Option[Int] = e match {
    case Literal(v: Int, IntegerType) if v >= 0 => Some(v)
    case _ => None
  }

  private def bounded(l: Levenshtein, k: Int): Levenshtein =
    Levenshtein(l.left, l.right, Some(Literal(k)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case LessThanOrEqual(l @ Levenshtein(_, _, None), lit) if nonNegIntLit(lit).isDefined =>
      GreaterThanOrEqual(bounded(l, nonNegIntLit(lit).get), Literal(0))
    case GreaterThanOrEqual(lit, l @ Levenshtein(_, _, None)) if nonNegIntLit(lit).isDefined =>
      GreaterThanOrEqual(bounded(l, nonNegIntLit(lit).get), Literal(0))
    case GreaterThan(l @ Levenshtein(_, _, None), lit) if nonNegIntLit(lit).isDefined =>
      EqualTo(bounded(l, nonNegIntLit(lit).get), Literal(-1))
    case LessThan(lit, l @ Levenshtein(_, _, None)) if nonNegIntLit(lit).isDefined =>
      EqualTo(bounded(l, nonNegIntLit(lit).get), Literal(-1))
  }
}
