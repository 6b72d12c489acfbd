package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule (§7.3(c), third layer): recognize the banded range
  * join written in PLAIN join syntax —
  *
  *   `left.join(right, lk === rk && abs(lt − rt) <= lit(gap))`
  *
  * — and reroute it to [[BandJoinNode]], the native single-merge-pass
  * operator, instead of the plan Spark would otherwise pick (a hash
  * join on the equality with the band as a post-join filter keeps the
  * full per-key cross product alive inside the join; at 100 TB a hot
  * key's quadratic blowup lands in one task). Users shouldn't need to
  * know [[RangeNative.bandJoin]] exists to get the right plan — this
  * is the same contract Spark itself applies when it turns a plain
  * equality into a SortMergeJoin.
  *
  * Strictly conservative match, mirroring the exec's documented
  * contract: INNER join, no join hint, EXACTLY ONE equality conjunct
  * (LONG=LONG across the sides — a composite-key join keeps its hash
  * plan: the engine's own explode-composition
  * [[graft.operators.RangeJoin]] joins on (key, bucket) and must NOT
  * be hijacked into explode + band-join, which PlanSpec pins), and
  * one `abs(a − b) <= <positive integral literal>` conjunct with LONG
  * attributes across the sides. Any leftover NON-equality conjuncts
  * survive as a [[Filter]] ON TOP of the node (same semantics: inner
  * join conditions and post-filters commute). Anything else — outer
  * joins, hinted joins, non-literal or non-positive gaps, computed
  * operands — is left untouched. NULL semantics are preserved by
  * construction: a NULL key or time fails both the original
  * predicates and the exec's match rules.
  *
  * Registered via `SparkSessionExtensions.injectOptimizerRule`;
  * [[BandRewriteSpec]] pins the rewrite (plan shape + row identity
  * against the explode-composition) and the non-matches.
  */
object BandJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private def longAttr(e: Expression): Option[Attribute] = e match {
    case a: Attribute if a.dataType == LongType => Some(a)
    case _ => None
  }

  private def gapOf(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) if v > 0 => Some(v)
    case Literal(v: Int, IntegerType) if v > 0 => Some(v.toLong)
    case _ => None
  }

  /** `abs(x − y) <= gap` (either comparison orientation) over LONG
    * attributes with a positive integral literal gap. */
  private def bandOf(e: Expression): Option[(Attribute, Attribute, Long)] =
    e match {
      case LessThanOrEqual(Abs(Subtract(x, y, _), _), g) =>
        for (a <- longAttr(x); b <- longAttr(y); gap <- gapOf(g))
          yield (a, b, gap)
      case GreaterThanOrEqual(g, Abs(Subtract(x, y, _), _)) =>
        for (a <- longAttr(x); b <- longAttr(y); gap <- gapOf(g))
          yield (a, b, gap)
      case _ => None
    }

  /** Orient (a, b) as (fromLeft, fromRight), if they split across the
    * join's children. */
  private def sides(l: LogicalPlan, r: LogicalPlan,
      a: Attribute, b: Attribute): Option[(Attribute, Attribute)] =
    if (l.outputSet.contains(a) && r.outputSet.contains(b)) Some((a, b))
    else if (l.outputSet.contains(b) && r.outputSet.contains(a)) Some((b, a))
    else None

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, Inner, Some(cond), JoinHint.NONE) =>
      val conjs = splitConjunctivePredicates(cond)
      val eqs = conjs.flatMap {
        case e @ EqualTo(a: Attribute, b: Attribute)
            if a.dataType == LongType && b.dataType == LongType =>
          sides(l, r, a, b).map(s => (e: Expression, s))
        case _ => None
      }
      // exactly one cross-side equality: composite-key joins (like the
      // explode-composition's (key, bucket) join) keep their hash plan
      val eq = if (eqs.length == 1) eqs.headOption else None
      val band = conjs.iterator.map { e =>
        bandOf(e).flatMap { case (a, b, gap) =>
          sides(l, r, a, b).map(s => (e, s, gap))
        }
      }.collectFirst { case Some(hit) => hit }
      (eq, band) match {
        case (Some((eqExpr, (lk, rk))), Some((bandExpr, (lt, rt), gap))) =>
          val node = BandJoinNode(l, r, lk, lt, rk, rt, gap)
          val rest = conjs.filterNot(c => c.eq(eqExpr) || c.eq(bandExpr))
          if (rest.isEmpty) node else Filter(rest.reduce(And), node)
        case _ => j
      }
  }
}
