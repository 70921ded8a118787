package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types.NumericType

import graft.operators.RangeJoin

/** Optimizer rule: pure range (BETWEEN) theta-join → bucketed range
  * join — the third declarative-join rewrite, and the first matching
  * PLAIN SQL rather than a graft marker expression:
  *
  * {{{ points.join(bands, $"p" >= $"lo" && $"p" <= $"hi") }}}
  *
  * has no Spark physical plan except a nested loop (O(n·m) bound
  * evaluations). When a bucket width is configured, this rule replaces
  * the join with [[RangeJoin.pointInInterval]]'s grid-bucket hash join
  * and re-applies EVERY original conjunct as a filter — the bucket
  * join is purely a candidate generator (an exact superset under the
  * ±1-bucket margin), so output equality holds for strict or inclusive
  * bounds, extra conjuncts, either point side.
  *
  * Scope and safety:
  *  - inner/cross joins whose condition contains a lower AND an upper
  *    bound conjunct (>=, >, <=, < in either writing) on the SAME
  *    deterministic numeric point expression from one side, with both
  *    bound expressions from the other;
  *  - joins already carrying an equi conjunct between the sides are
  *    skipped: Spark hash-joins those fine, and the skip also makes
  *    the rule a fixed point (its own rewritten join is equi on the
  *    bucket id, so it can never re-match after filter-pushdown folds
  *    the re-applied bounds back into the join condition);
  *  - the bucket width comes from `spark.graft.range_join.bucket_width`
  *    (no default — width is a data decision: pick ≈ the median
  *    interval span). Unset, unparsable, or non-positive ⇒ rule is
  *    inert;
  *  - bails out unchanged unless the rebuilt plan exposes the original
  *    output attribute ids (same guard as the other two rewrites).
  */
case class RangeJoinRewrite(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.range_join.bucket_width"

  /** point / bound sidedness: pointOnLeft=true ⇔ point refs ⊆ left. */
  private case class Bound(
      point: Expression, bound: Expression, lower: Boolean, pointOnLeft: Boolean)

  override def apply(plan: LogicalPlan): LogicalPlan = width() match {
    case None => plan
    case Some(w) => plan.transformUp {
      case j @ Join(l, r, Inner | Cross, Some(cond), _) =>
        val conjuncts = splitConjunctivePredicates(cond)
        if (hasEquiConjunct(conjuncts, l, r)) j
        else matchRange(conjuncts, l, r) match {
          case Some((loB, hiB)) => rewrite(j, loB, hiB, conjuncts, w).getOrElse(j)
          case None => j
        }
    }
  }

  private def width(): Option[Double] =
    spark.conf.getOption(WidthConf).flatMap(_.toDoubleOption).filter(_ > 0)

  private def hasEquiConjunct(
      conjuncts: Seq[Expression], l: LogicalPlan, r: LogicalPlan): Boolean = {
    def split(a: Expression, b: Expression): Boolean =
      (a.references.nonEmpty && b.references.nonEmpty) &&
        ((a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet)) ||
          (a.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet)))
    conjuncts.exists {
      case EqualTo(a, b) => split(a, b)
      case EqualNullSafe(a, b) => split(a, b)
      case _ => false
    }
  }

  private def matchRange(
      conjuncts: Seq[Expression], l: LogicalPlan, r: LogicalPlan): Option[(Bound, Bound)] = {
    def mk(p: Expression, b: Expression, lower: Boolean): Option[Bound] = {
      val numeric = p.dataType.isInstanceOf[NumericType] && b.dataType.isInstanceOf[NumericType]
      if (!p.deterministic || !b.deterministic || !numeric) None
      else if (p.references.nonEmpty && b.references.nonEmpty &&
        p.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet))
        Some(Bound(p, b, lower, pointOnLeft = true))
      else if (p.references.nonEmpty && b.references.nonEmpty &&
        p.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet))
        Some(Bound(p, b, lower, pointOnLeft = false))
      else None
    }
    // x ≥ y reads as (point x, lower bound y) or (upper bound x, point y)
    val bounds = conjuncts.flatMap {
      case GreaterThanOrEqual(a, b) => mk(a, b, lower = true) ++ mk(b, a, lower = false)
      case GreaterThan(a, b)        => mk(a, b, lower = true) ++ mk(b, a, lower = false)
      case LessThanOrEqual(a, b)    => mk(a, b, lower = false) ++ mk(b, a, lower = true)
      case LessThan(a, b)           => mk(a, b, lower = false) ++ mk(b, a, lower = true)
      case _ => Nil
    }
    val pairs = for {
      loB <- bounds if loB.lower
      hiB <- bounds if !hiB.lower
      if loB.pointOnLeft == hiB.pointOnLeft && loB.point.semanticEquals(hiB.point)
    } yield (loB, hiB)
    pairs.headOption
  }

  private def rewrite(
      j: Join, loB: Bound, hiB: Bound,
      conjuncts: Seq[Expression], w: Double): Option[LogicalPlan] = {
    val (ptsPlan, itvPlan) =
      if (loB.pointOnLeft) (j.left, j.right) else (j.right, j.left)
    val candidates = RangeJoin.pointInInterval(
      bridge.ofRows(spark, ptsPlan), bridge.toColumn(loB.point),
      bridge.ofRows(spark, itvPlan), bridge.toColumn(loB.bound),
      bridge.toColumn(hiB.bound), w)
    // every original conjunct re-applies — the bucket join generated
    // candidates only, so strict bounds / residual predicates all
    // enforce themselves here
    val filtered = conjuncts.foldLeft(candidates)((d, e) => d.filter(bridge.toColumn(e)))
    val projected = filtered.select(j.output.map(bridge.toColumn): _*)
    val newPlan = projected.queryExecution.optimizedPlan
    newPlan match {
      case p if p.output.map(_.exprId) == j.output.map(_.exprId) => Some(p)
      case p if j.outputSet.subsetOf(p.outputSet) => Some(Project(j.output, p))
      case _ => None // analyzer dedup moved the original attributes — bail out
    }
  }
}
