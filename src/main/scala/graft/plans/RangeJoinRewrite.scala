package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Optimizer rule: rewrite a pure interval-containment inner join —
  * `A JOIN B ON a.p >= b.lo AND a.p <= b.hi` (any >=/>/<=/< mix, either
  * operand order) with NO equality conjunct — from the
  * BroadcastNestedLoopJoin Spark would otherwise plan (O(|A|·|B|)
  * comparisons: the canonical 100 TB scale-killer) into the bucketed
  * equi-join shape the engine's hand-written `range_join` query uses:
  *
  *   bin(x) = (x - pmod(x, W)) div W          -- exact floor(x/W), any sign
  *   A' = A + bin(p);  B' = B + explode(sequence(bin(lo), bin(hi)))
  *   A' JOIN B' ON binA = binB AND <original range predicates>
  *
  * Every interval explodes to its covered bins (span/W + 1 rows), the
  * join becomes a hash/sort-merge equi-join on the bin, and the original
  * predicates remain as the residual filter, so semantics are EXACTLY
  * the naive join's (strictness, nulls — a null bound nulls the
  * sequence, and exploding a null array emits nothing, matching the
  * never-true comparison). W is `spark.graft.rangeJoin.binSize`
  * (default 100, integral point/bound types only); pick W near the
  * typical interval span so each interval lands in ~2 bins.
  *
  * Injected via [[graft.GraftExtensions]] (`injectOptimizerRule`), the
  * deployment path a shared cluster enables with one conf line. The rule
  * runs after the main optimizer batches, so pushed-down predicates have
  * already settled into the join condition it inspects; the rewritten
  * join contains an equality conjunct, which also makes the rule
  * idempotent (a second pass sees an equi-join and leaves it alone).
  */
case class RangeJoinRewrite(session: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  private val integralTypes =
    Seq(ByteType, ShortType, IntegerType, LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjs = splitConjunctivePredicates(cond)
      val crossSide = conjs.forall(c =>
        !c.references.subsetOf(left.outputSet) &&
          !c.references.subsetOf(right.outputSet))
      val hasEqui = conjs.exists {
        case EqualTo(_, _) | EqualNullSafe(_, _) => true
        case _ => false
      }
      if (hasEqui || !crossSide) j
      else findRangePair(conjs, left, right) match {
        case Some((p, lo, hi)) if Seq(p, lo, hi)
            .forall(e => integralTypes.contains(e.dataType)) =>
          val w = session.conf.get("spark.graft.rangeJoin.binSize", "100").toLong
          if (w <= 0) j else rewrite(j, conjs, p, lo, hi, w, hint)
        case _ => j
      }
  }

  /** Find a point expression bounded below AND above by the other side:
    * returns (point, lo, hi) with point from one side, bounds from the
    * other. Comparisons may be strict or not — the original conjuncts
    * are kept as the residual, so only the BOUNDING role matters here.
    */
  private def findRangePair(
      conjs: Seq[Expression], left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Expression)] = {
    def sided(a: Expression, b: Expression): Boolean =
      (a.references.subsetOf(left.outputSet) &&
        b.references.subsetOf(right.outputSet)) ||
        (a.references.subsetOf(right.outputSet) &&
          b.references.subsetOf(left.outputSet))
    // (point, bound, boundIsLower)
    val bounds = conjs.collect {
      case GreaterThanOrEqual(a, b) if sided(a, b) => (a, b, true)
      case GreaterThan(a, b) if sided(a, b)        => (a, b, true)
      case LessThanOrEqual(a, b) if sided(a, b)    => (a, b, false)
      case LessThan(a, b) if sided(a, b)           => (a, b, false)
    }.flatMap { case (a, b, lower) =>
      // normalize to bounds ON a and, flipped, bounds on b
      Seq((a, b, lower), (b, a, !lower))
    }
    val byPoint = bounds.groupBy(_._1.canonicalized)
    byPoint.values.collectFirst {
      case bs if bs.exists(_._3) && bs.exists(!_._3) =>
        val p = bs.head._1
        (p, bs.find(_._3).get._2, bs.find(!_._3).get._2)
    }
  }

  private def rewrite(
      j: Join, conjs: Seq[Expression], p: Expression,
      lo: Expression, hi: Expression, w: Long,
      hint: org.apache.spark.sql.catalyst.plans.logical.JoinHint): LogicalPlan = {
    // Sequence/Cast are TimeZoneAware: without an explicit zone they stay
    // unresolved and the post-optimization plan validator rejects the plan
    val tz = Some(session.sessionState.conf.sessionLocalTimeZone)
    val wLit = Literal(w, LongType)
    def bin(e: Expression): Expression = {
      val x = Cast(e, LongType, tz)
      IntegralDivide(Subtract(x, Pmod(x, wLit)), wLit)
    }
    val binAttr = AttributeReference("graft_bin", LongType, nullable = true)()
    val pointOnLeft = p.references.subsetOf(j.left.outputSet)
    val intervalSide = if (pointOnLeft) j.right else j.left
    // empty interval (lo > hi): sequence() would THROW on descending
    // bounds; null out the array instead — exploding null emits nothing,
    // matching the naive join's zero matches
    val bins = If(
      LessThanOrEqual(bin(lo), bin(hi)),
      new Sequence(bin(lo), bin(hi), Some(Literal(1L, LongType)), tz),
      Literal.create(null, org.apache.spark.sql.types.ArrayType(LongType)))
    val gen = Generate(
      Explode(bins),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(binAttr), child = intervalSide)
    val newCond = (EqualTo(bin(p), binAttr) +: conjs).reduce(And)
    val newJoin =
      if (pointOnLeft) Join(j.left, gen, Inner, Some(newCond), hint)
      else Join(gen, j.right, Inner, Some(newCond), hint)
    Project(j.output, newJoin)
  }
}
