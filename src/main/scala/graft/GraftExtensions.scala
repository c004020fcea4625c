package graft

import graft.functions.{DotProduct, NfcNormalize}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: makes the engine's native
  * expressions available to ANY session via
  * `--conf spark.sql.extensions=graft.GraftExtensions` — the standard
  * deployment path on a shared cluster (no per-session registration call
  * needed). `VectorFunctions.register` remains for programmatic use.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(
        classOf[DotProduct].getName, null, "graft_dot",
        "graft_dot(a, b) - dot product of two array<double> columns " +
          "(codegen'd single fused loop).",
        "", "", "", "", "", "", "built-in"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(
        classOf[NfcNormalize].getName, null, "graft_nfc",
        "graft_nfc(s) - Unicode NFC normalization (UAX#15), codegen'd " +
          "with a zero-copy already-normalized fast path.",
        "", "", "", "", "", "", "built-in"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        NfcNormalize(exprs(0))))
    // auto-rewrite pure interval-containment joins (else planned as a
    // BroadcastNestedLoopJoin) into bucketed equi-joins — see the rule's
    // scaladoc for the shape and the binSize conf
    ext.injectOptimizerRule(graft.plans.RangeJoinRewrite)
    // whole-operator extension: native as-of join (custom LogicalPlan +
    // strategy + per-partition merge exec) — see plans/AsOfJoin.scala
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // analysis check rule: reject unhinted, unbounded cartesian joins
    // session-wide (spark.graft.failOnCartesian=false to opt out)
    ext.injectCheckRule(_ => graft.plans.NoUnhintedCartesian)
  }
}
