package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule for fuzzy-match filters: make `levenshtein(a, b) <= k`
  * cheap at scale.
  *
  * Two semantics-preserving rewrites on Filter predicates, applied to
  * each conjunct:
  *
  *  1. Prepend a free guard. Every edit changes a string's length by at
  *     most one, so `levenshtein(a,b) <= k` implies
  *     `abs(length(a) - length(b)) <= k`. `And` short-circuits
  *     left-to-right in codegen, so rows failing the O(1) guard never run
  *     the DP at all.
  *  2. Swap in the thresholded Levenshtein. Spark's 3-arg
  *     `levenshtein(a, b, k)` runs a banded DP — O(k * n) instead of
  *     O(n^2) — returning -1 when the distance exceeds k, so
  *     `levenshtein(a,b) <= k` becomes `levenshtein(a,b,k) >= 0`.
  *
  * On a 100 TB fuzzy-join verification pass, the guard eliminates most
  * candidate rows before any DP and the band bounds the rest — the same
  * cheap-filter -> expensive-verify layering t09 does by hand, applied
  * automatically to any user query. Idempotent: a conjunct whose guard
  * is already present (semanticEquals) is left untouched, so the
  * fixpoint batch terminates.
  *
  * Injected by [[GraftExtensions]] via injectOptimizerRule.
  */
object FuzzyMatchGuardRule extends Rule[LogicalPlan] with PredicateHelper {

  private def lengthGuard(lev: Levenshtein, k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(lev.left), Length(lev.right))), k)

  /** levenshtein(a,b,k) >= 0 — the banded form of `distance <= k`. */
  private def banded(lev: Levenshtein, k: Int): Expression =
    GreaterThanOrEqual(
      Levenshtein(lev.left, lev.right, Some(Literal(k))), Literal(0))

  private def rewriteConjunct(c: Expression): Seq[Expression] = c match {
    case LessThanOrEqual(lev: Levenshtein, k @ Literal(ki: Int, _))
        if lev.threshold.isEmpty && ki >= 0 =>
      Seq(lengthGuard(lev, k), banded(lev, ki))
    case LessThan(lev: Levenshtein, k @ Literal(ki: Int, _))
        if lev.threshold.isEmpty && ki >= 1 =>
      Seq(lengthGuard(lev, k), banded(lev, ki - 1))
    case EqualTo(lev: Levenshtein, k @ Literal(ki: Int, _))
        if lev.threshold.isEmpty && ki >= 0 =>
      Seq(lengthGuard(lev, k),
        EqualTo(Levenshtein(lev.left, lev.right, Some(Literal(ki))), k))
    case other => Seq(other)
  }

  /** Returns None when nothing changed (keeps the fixpoint stable). */
  private def rewriteCondition(cond: Expression): Option[Expression] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val rewritten = conjuncts.flatMap(rewriteConjunct)
    // drop duplicates the fixpoint batch would otherwise re-add
    val deduped = rewritten.foldLeft(Seq.empty[Expression]) { (acc, e) =>
      if (acc.exists(_.semanticEquals(e))) acc else acc :+ e
    }
    if (deduped.length == conjuncts.length &&
        deduped.zip(conjuncts).forall { case (a, b) => a.semanticEquals(b) }) None
    else Some(deduped.reduce(And))
  }

  // Predicate-pushdown may have folded the fuzzy filter into a Join
  // condition before this rule runs — handle both homes.
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      rewriteCondition(cond).map(Filter(_, child)).getOrElse(f)
    case j @ Join(_, _, _, Some(cond), _) =>
      rewriteCondition(cond).map(c => j.copy(condition = Some(c))).getOrElse(j)
  }
}
