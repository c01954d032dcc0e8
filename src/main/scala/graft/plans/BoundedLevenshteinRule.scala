package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

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
  * and the strict/≥ forms reduce to those via k-1 (for k >= 1):
  *
  *   lev(a,b) < k   ≡  lev(a,b,k-1) >= 0      lev(a,b) >= k ≡  lev(a,b,k-1) = -1
  *
  * The threshold side may be any foldable integral expression (Int/Long/
  * Short/Byte literal, CAST of one, 2+1, …) — folded here since constant
  * folding may not have run yet; both operand orders are matched. k = 0
  * strict-below and thresholds beyond Int.MaxValue are left alone (the
  * former needs k-1 = -1, the latter can't be banded — and at that size
  * the full DP predicate is effectively constant-true anyway). Null
  * semantics are preserved exactly: both forms are null iff an input
  * string is null. Registered through `GraftExtensions
  * .injectOptimizerRule` — runs in the user-provided optimizer batch of
  * every session built with the extension.
  */
object BoundedLevenshteinRule extends Rule[LogicalPlan] {

  /** Foldable integral expression in [0, Int.MaxValue] → its Int value. */
  private def nonNegIntConst(e: Expression): Option[Int] = e match {
    case _ if !e.foldable => None
    case _ => e.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        val v = e.eval() match {
          case null => return None
          case b: Byte => b.toLong
          case s: Short => s.toLong
          case i: Int => i.toLong
          case l: Long => l
        }
        if (v >= 0 && v <= Int.MaxValue) Some(v.toInt) else None
      case _ => None
    }
  }

  /** An unbounded levenshtein, possibly under the widening int→long cast
    * the analyzer inserts when the threshold side is a bigint (widening
    * preserves ordering, so the rewrite stays valid). */
  private object Lev {
    def unapply(e: Expression): Option[Levenshtein] = e match {
      case l @ Levenshtein(_, _, None) => Some(l)
      case c: Cast if c.dataType == LongType =>
        c.child match {
          case l @ Levenshtein(_, _, None) => Some(l)
          case _ => None
        }
      case _ => None
    }
  }

  private def within(l: Levenshtein, k: Int): Expression =
    GreaterThanOrEqual(Levenshtein(l.left, l.right, Some(Literal(k))), Literal(0))
  private def beyond(l: Levenshtein, k: Int): Expression =
    EqualTo(Levenshtein(l.left, l.right, Some(Literal(k))), Literal(-1))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // lev <= k / k >= lev
    case LessThanOrEqual(Lev(l), e) if nonNegIntConst(e).isDefined =>
      within(l, nonNegIntConst(e).get)
    case GreaterThanOrEqual(e, Lev(l)) if nonNegIntConst(e).isDefined =>
      within(l, nonNegIntConst(e).get)
    // lev < k / k > lev  (k >= 1)
    case LessThan(Lev(l), e) if nonNegIntConst(e).exists(_ >= 1) =>
      within(l, nonNegIntConst(e).get - 1)
    case GreaterThan(e, Lev(l)) if nonNegIntConst(e).exists(_ >= 1) =>
      within(l, nonNegIntConst(e).get - 1)
    // lev > k / k < lev
    case GreaterThan(Lev(l), e) if nonNegIntConst(e).isDefined =>
      beyond(l, nonNegIntConst(e).get)
    case LessThan(e, Lev(l)) if nonNegIntConst(e).isDefined =>
      beyond(l, nonNegIntConst(e).get)
    // lev >= k / k <= lev  (k >= 1)
    case GreaterThanOrEqual(Lev(l), e) if nonNegIntConst(e).exists(_ >= 1) =>
      beyond(l, nonNegIntConst(e).get - 1)
    case LessThanOrEqual(e, Lev(l)) if nonNegIntConst(e).exists(_ >= 1) =>
      beyond(l, nonNegIntConst(e).get - 1)
  }
}
