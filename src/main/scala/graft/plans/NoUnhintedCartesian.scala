package graft.plans

import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical.{
  Join, JoinHint, LogicalPlan, ResolvedHint, UnaryNode}
import org.apache.spark.sql.internal.SQLConf

/** Analysis CHECK rule (the engine's fourth extension point, after
  * injected functions, an optimizer rule, and a planner strategy):
  * reject an explicit CROSS join (`crossJoin` / SQL `CROSS JOIN`) that
  * is neither explicitly hinted nor provably bounded to one row on a
  * side.
  *
  * Rationale: an unhinted unbounded cartesian is never what a 100 TB
  * job means. The engine's own legitimate cross joins all pass: scalar
  * cross joins (a one-row global aggregate attached in-plan,
  * `maxRows == 1` at analysis time) and explicitly `broadcast()`-hinted
  * brute-force baselines (the hint is a ResolvedHint child at check
  * time — Join.hint is only populated later by the optimizer). Escape
  * hatch: `spark.graft.failOnCartesian=false` for a session that
  * really wants one.
  *
  * Scope is deliberately Cross-only: `Dataset.join(right, usingCols)`
  * internally ANALYZES a temporary condition-less Inner join to
  * disambiguate columns before building the real UsingJoin, so a rule
  * matching Inner(condition=None) would reject every using-join in the
  * API. Condition-less Inner joins that survive to execution are still
  * caught by the physical-plan audit in ScaleSpec.
  *
  * Unlike ScaleSpec (which audits this repo's queries at test time),
  * the check rule guards EVERY query in any session that enables
  * `spark.sql.extensions=graft.GraftExtensions` — ad-hoc SQL included.
  */
object NoUnhintedCartesian extends (LogicalPlan => Unit) {
  private val Conf = "spark.graft.failOnCartesian"

  /** The hint must govern THIS join side: accept a ResolvedHint reached
    * through UNARY nodes only (alias, projection, filter, limit, sort,
    * aggregate — exactly the nodes Spark's own EliminateResolvedHint
    * propagates hints up through, so anything Spark would honor as a
    * hint on this side counts). Binary nodes stop the descent: a
    * broadcast() buried below an already-joined input governs THAT
    * join, and letting it legitimize an unbounded cartesian above it
    * would gut the guard.
    */
  @annotation.tailrec
  private def hinted(p: LogicalPlan): Boolean = p match {
    case _: ResolvedHint => true
    case u: UnaryNode    => hinted(u.child)
    case _               => false
  }

  private def oneRow(p: LogicalPlan): Boolean = p.maxRows.exists(_ <= 1L)

  override def apply(plan: LogicalPlan): Unit =
    if (SQLConf.get.getConfString(Conf, "true").toBoolean)
      plan.foreach {
        case j: Join
            if j.joinType == Cross &&
              j.condition.isEmpty && j.hint == JoinHint.NONE &&
              !hinted(j.left) && !hinted(j.right) &&
              !oneRow(j.left) && !oneRow(j.right) =>
          throw new IllegalStateException(
            "graft: unhinted cartesian join rejected (missing join " +
              "condition? at scale this is O(|L|x|R|)). Add the condition, " +
              "broadcast() the small side explicitly, or set " +
              s"$Conf=false for this session.")
        case _ => ()
      }
}
