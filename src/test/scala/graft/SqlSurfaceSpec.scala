package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._

/** Plan-shape guards for the raw-SQL surface queries, plus the
  * `Observation` metrics hook (how a production pipeline watches row
  * counts/sums in-flight without a second pass over the data).
  */
class SqlSurfaceSpec extends SparkSpec {

  test("correlated aggregate subquery is decorrelated, not re-executed") {
    val plan = ops.Relational.sqlCorrelatedSubquery
      .fn(spark, sfDir).queryExecution.optimizedPlan
    // decorrelation rewrites the per-row scalar subquery into one
    // grouped aggregate joined back on the correlation key: the
    // optimized plan must carry a Join and NO surviving subquery
    // expression (a leftover ScalarSubquery means per-outer-row
    // re-execution — the O(rows x groups) trap). Collect over the WHOLE
    // tree — plan.expressions alone is root-node-local and would miss a
    // subquery surviving in a deeper Filter/Project.
    val subqueries = plan.collect { case p => p.expressions }.flatten
      .flatMap(_.collect { case s: SubqueryExpression => s })
    assert(subqueries.isEmpty,
      s"subquery survived optimization: ${subqueries.map(_.sql)}")
    assert(plan.collect { case j: Join => j }.nonEmpty)
  }

  test("EXISTS predicates become existence joins, never per-row probes") {
    val plan = ops.Relational.sqlExistsSubquery
      .fn(spark, sfDir).queryExecution.optimizedPlan
    val subqueries = plan.collect { case p => p.expressions }.flatten
      .flatMap(_.collect { case s: SubqueryExpression => s })
    assert(subqueries.isEmpty)
    // customer JOIN nation + two ExistenceJoins over orders
    assert(plan.collect { case j: Join => j }.size >= 3)
  }

  test("observe() reports pipeline metrics without a second pass") {
    val obs = Observation("flagship_metrics")
    val df = pipeline.Climate.monthly.fn(spark, sfDir)
      .observe(obs, count(lit(1)).as("rows"), sum(col("n_items")).as("items"))
    val n = df.count()
    assert(obs.get("rows") === n)
    assert(obs.get("items").asInstanceOf[Long] > n) // >=1 item per group
  }

  test("Q2 correlated scalar min decorrelates to one agg + join") {
    // The WHERE-clause scalar subquery must not survive optimization
    // as a per-row probe: Catalyst rewrites it to a per-part min
    // aggregate joined back on the correlation key.
    val plan = ops.Relational.sqlMinPriceSupplier
      .fn(spark, sfDir).queryExecution.optimizedPlan
    val subqueries = plan.collect { case p => p.expressions }.flatten
      .flatMap(_.collect { case s: SubqueryExpression => s })
    assert(subqueries.isEmpty,
      s"scalar subquery survived optimization: ${subqueries.map(_.sql)}")
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    assert(plan.collect { case a: Aggregate => a }.nonEmpty)
    assert(plan.collect { case j: Join => j }.size >= 3) // part⋈li⋈supp + min-agg join
  }

  test("Q22 NOT EXISTS becomes an anti join; scalar threshold is one subquery") {
    val plan = ops.Relational.sqlIdleCustomers
      .fn(spark, sfDir).queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.LeftAnti
    assert(plan.collect { case j: Join if j.joinType == LeftAnti => j }.nonEmpty,
      s"NOT EXISTS did not rewrite to LEFT ANTI:\n$plan")
    // the uncorrelated mean threshold stays a (single-execution) scalar
    // subquery — it must NOT have been inlined into a per-row join
    val scalars = plan.collect { case p => p.expressions }.flatten
      .flatMap(_.collect {
        case s: org.apache.spark.sql.catalyst.expressions.ScalarSubquery => s })
    assert(scalars.size === 1, s"expected 1 scalar subquery, got ${scalars.size}")
  }
}
