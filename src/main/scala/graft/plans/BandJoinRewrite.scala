package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Auto-rewrite of band joins: `a JOIN b ON abs(a.x - b.y) <= k`.
  *
  * Without an equi-predicate Spark can only plan a nested-loop join —
  * O(n·m) comparisons, the canonical 100 TB scale-killer, and easy to
  * write by accident (as-of tolerances, sensor alignment, fraud
  * windows). q30 shows the manual fix: bucketize by the band width so
  * partners can only sit in adjacent buckets, making the predicate an
  * equi-join. This rule performs that rewrite IN THE OPTIMIZER, so the
  * naive spelling gets the scalable plan automatically:
  *
  *   Join(L, R, |x−y| ≤ k)  ⇒
  *   Project(orig output,
  *     Join(Generate(explode([x div k − 1, x div k, x div k + 1]), L),
  *          Project(+ y div k, R),
  *          band_l = band_r ∧ |x−y| ≤ k))
  *
  * Soundness (why matching pairs stay matched): for k ≥ 1 and
  * integral x, y, |x−y| ≤ k implies the truncating-division buckets
  * differ by at most 1. With floor division this is immediate; `div`
  * truncates toward zero, i.e. adds 1 to the floor exactly on
  * negative non-multiples, and a bucket difference of 2 would need
  * that correction on one side AND a full floor-bucket step — which
  * forces |x−y| > k (the boundary row is a k-multiple, owned by the
  * next bucket). Each matching pair then meets in EXACTLY one of the
  * probe's three buckets (the build bucket is a single value), so no
  * duplicates are introduced and the residual |x−y| ≤ k keeps the
  * result exact. The rule fires only for inner joins with NO existing
  * equi-conjunct (those already hash-partition; adding a band key
  * would only bloat the shuffle), deterministic integral sides, and a
  * foldable integral k ≥ 1 — outside that envelope the plan is left
  * untouched. Restriction to integral operands is load-bearing:
  * float division + FLOOR can round a boundary value across a bucket
  * edge, and a missed pair is silent wrong answers, not slowness.
  */
object BandJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val BandCol = "__graft_band"

  private def integral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** (leftSide, rightSide, k) when `c` is the band conjunct. */
  private def bandPattern(c: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Long)] = c match {
    case LessThanOrEqual(Abs(Subtract(a, b, _), _), kLit)
        if kLit.foldable && integral(kLit) && integral(a) && integral(b) &&
          a.deterministic && b.deterministic =>
      val k = kLit.eval() match { case n: Number => n.longValue(); case _ => return None }
      if (k < 1) return None
      if (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet))
        Some((a, b, k))
      else if (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))
        Some((b, a, k))
      else None
    case GreaterThanOrEqual(kLit, abs: Abs) => bandPattern(LessThanOrEqual(abs, kLit), left, right)
    case _ => None
  }

  private def hasEquiKeys(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Boolean = conjuncts.exists {
    case EqualTo(a, b) =>
      (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
        (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))
    case _ => false
  }

  private def bucket(e: Expression, k: Long): Expression =
    IntegralDivide(Cast(e, LongType), Literal(k))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      if (hasEquiKeys(conjuncts, left, right)) j
      else conjuncts.iterator.flatMap(c => bandPattern(c, left, right).map((c, _)))
        .nextOption() match {
        case None => j
        case Some((_, (lExpr, rExpr, k))) =>
          val lBucket = bucket(lExpr, k)
          val probe = CreateArray(Seq(
            Subtract(lBucket, Literal(1L)), lBucket, Add(lBucket, Literal(1L))))
          val bandL = AttributeReference(BandCol + "_l", LongType, nullable = true)()
          val gen = Generate(Explode(probe), unrequiredChildIndex = Nil,
            outer = false, qualifier = None, generatorOutput = Seq(bandL), child = left)
          val bandR = Alias(bucket(rExpr, k), BandCol + "_r")()
          val proj = Project(right.output :+ bandR, right)
          val newCond = And(EqualTo(bandL, bandR.toAttribute), cond)
          Project(j.output, Join(gen, proj, Inner, Some(newCond), hint))
      }
  }
}
