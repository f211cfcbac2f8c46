package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: a join whose only cross-side predicate is an edit-
  * distance bound
  *
  *   `a JOIN b ON levenshtein(a.s, b.s) <= k [AND other conjuncts]`
  *
  * has no equi-key, so Spark plans a cartesian / broadcast-nested-loop
  * join — O(|a|·|b|) Levenshtein evaluations. But the bound itself implies
  * a lossless blocking key: lev(x, y) ≤ k forces |len(x) − len(y)| ≤ k,
  * which forces `len div (k+1)` buckets to be equal or adjacent. The rule
  * rewrites the join to
  *
  *   explode(a × {bucket−1, bucket, bucket+1}) ⋈ b ON bucket = bucket(b.s)
  *   → Filter(original condition) → Project(original output)
  *
  * — an EQUI-join (hash/sort-merge, shuffled on the bucket key) that
  * generates every qualifying pair exactly once (the right side has one
  * home bucket; the three exploded values are distinct), tripling the left
  * side instead of squaring the pair space. The expensive Levenshtein then
  * runs only on length-compatible candidates.
  *
  * Semantics are preserved exactly: the full original condition is
  * re-applied above the new join, and null inputs — which make the
  * Levenshtein bound null and drop the row in the original plan — produce
  * null buckets, which an equi-join also drops.
  *
  * Fires only on Inner/Cross joins with a deterministic condition, a
  * literal non-negative bound, sides cleanly split by the Levenshtein
  * arguments, and NO existing cross-side equality conjunct (if one exists
  * the join already has an equi-key and the planner never goes cartesian).
  * The rewrite inserts an equi-join, so the pattern cannot re-match — the
  * rule is fixed-point safe in the operator-optimization batch.
  */
object RewriteLevenshteinJoin extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** (leftStr, rightStr, k) when `e` bounds a Levenshtein whose arguments
    * split cleanly across the join sides.
    */
  private def levBound(e: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Int)] = {
    def orient(a: Expression, b: Expression, k: Int) =
      if (k < 0 || a.references.isEmpty || b.references.isEmpty) None
      else if (a.references.subsetOf(left.outputSet) &&
        b.references.subsetOf(right.outputSet)) Some((a, b, k))
      else if (a.references.subsetOf(right.outputSet) &&
        b.references.subsetOf(left.outputSet)) Some((b, a, k))
      else None
    e match {
      case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, _)) =>
        orient(a, b, k)
      case LessThan(Levenshtein(a, b, None), Literal(k: Int, _)) =>
        orient(a, b, k - 1)
      case GreaterThanOrEqual(Literal(k: Int, _), Levenshtein(a, b, None)) =>
        orient(a, b, k)
      case GreaterThan(Literal(k: Int, _), Levenshtein(a, b, None)) =>
        orient(a, b, k - 1)
      case _ => None
    }
  }

  private def crossSideEquality(conjs: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Boolean = {
    def splits(a: Expression, b: Expression) =
      a.references.nonEmpty && b.references.nonEmpty &&
        ((a.references.subsetOf(left.outputSet) &&
          b.references.subsetOf(right.outputSet)) ||
          (a.references.subsetOf(right.outputSet) &&
            b.references.subsetOf(left.outputSet)))
    conjs.exists {
      case EqualTo(a, b) => splits(a, b)
      case EqualNullSafe(a, b) => splits(a, b)
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, jt, Some(cond), hint)
        if (jt == Inner || jt == Cross) && cond.deterministic &&
          j.resolved && !crossSideEquality(conjuncts(cond), left, right) =>
      conjuncts(cond).iterator
        .flatMap(levBound(_, left, right))
        .nextOption() match {
        case Some((lstr, rstr, k)) =>
          val width = Literal((k + 1).toLong, LongType)
          def bucket(e: Expression): Expression =
            IntegralDivide(Cast(Length(e), LongType), width)
          val lb = bucket(lstr)
          val candidates = CreateArray(Seq(
            Subtract(lb, Literal(1L)), lb, Add(lb, Literal(1L))))
          val bkAttr = AttributeReference("__lev_bucket", LongType)()
          val exploded = Generate(Explode(candidates),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(bkAttr), child = left)
          val rb = Alias(bucket(rstr), "__lev_bucket_r")()
          val keyed = Project(right.output :+ rb, right)
          val equiJoin = Join(exploded, keyed, jt,
            Some(EqualTo(bkAttr, rb.toAttribute)), hint)
          Project(left.output ++ right.output, Filter(cond, equiJoin))
        case None => j
      }
  }
}
