package graft

import graft.core.Pin
import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** The production-sort contract: every registered query ends in a global
  * ORDER BY purely so the oracle hash is deterministic; QueryDef.production
  * strips exactly that top-level Sort. This spec proves, on a
  * representative sample spanning agg / join / window / sketch / SQL-text
  * shapes, that (a) the stripped plan EXECUTES with no global sort at the
  * root — no SortExec whose child exchange is RangePartitioning — and
  * (b) the production variant returns the same BAG of rows as fn (order
  * is the only thing allowed to differ). Queries whose top node is not a
  * plain global Sort (top-k limits, single-row aggregates) pass through
  * production() unchanged — also asserted.
  */
class ProductionSortSpec extends SparkSpec {

  private val sample = Seq(
    "climate_monthly",      // flagship: agg + broadcast join + project
    "dim_enrich_join",      // join shape
    "rolling_avg",          // window shape
    "kll_quantiles",        // sketch + certification join
    "sql_large_orders")     // raw SQL text surface

  private def byName(n: String) =
    SparkEntry.defs.find(_.name == n).getOrElse(fail(s"unknown query $n"))

  test("production variant: no root global sort, same bag of rows") {
    sample.foreach { name =>
      val q = byName(name)
      val prod = q.production(spark, sfDir)
      val rows = prod.collect() // finalize AQE before inspecting the plan
      val plan = prod.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // the root must not be a global SortExec fed by a range exchange
      // (interior sorts — window operators, sort-merge joins — are fine)
      plan match {
        case s: SortExec if s.global =>
          fail(s"$name production plan still globally sorted:\n$plan")
        case _ =>
      }
      assert(!plan.toString.linesIterator.next().contains("rangepartitioning"),
        s"$name production root is range-partitioned")
      // bag equality vs fn (sort both collected sets by toString)
      val expect = q.fn(spark, sfDir).collect()
      Pin.releaseAll()
      assert(rows.map(_.toString).sorted.toSeq ===
        expect.map(_.toString).sorted.toSeq, s"$name rows differ")
      // and fn itself DOES sort globally — the contract this strips
      val fnPlan = q.fn(spark, sfDir).queryExecution.optimizedPlan
      assert(fnPlan.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Sort] ||
        fnPlan.collectFirst {
          case s: org.apache.spark.sql.catalyst.plans.logical.Sort if s.global => s
        }.isDefined, s"$name fn has no global sort — sample choice stale")
      Pin.releaseAll()
    }
  }

  test("queries without a top-level global sort pass through unchanged") {
    // count_distinct ends in orderBy too; use a genuinely sort-free shape:
    // the one-row aggregate of lsh_recall_eval
    val q = byName("lsh_recall_eval")
    val df = q.fn(spark, sfDir)
    val prod = q.production(spark, sfDir)
    assert(df.queryExecution.analyzed.getClass ===
      prod.queryExecution.analyzed.getClass)
    Pin.releaseAll()
  }

  test("production of the flagship keeps its pushdown and broadcast shape") {
    val prod = byName("climate_monthly").production(spark, sfDir)
    prod.collect()
    val plan = prod.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("PushedFilters:") &&
      plan.contains("BroadcastHashJoin"), s"shape lost:\n$plan")
    // stripping the sort removes the range exchange entirely: the only
    // shuffle left is the aggregation's hash exchange
    assert(!plan.contains("Exchange rangepartitioning"),
      s"range exchange survived the strip:\n$plan")
  }

  test("total shuffles drop when the presentation sort is stripped") {
    val q = byName("dim_enrich_join")
    def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect()
      val p = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      p.collect { case e: ShuffleExchangeExec => e }.size +
        p.toString.linesIterator.count(_.contains("Exchange rangepartitioning"))
    }
    val withSort = shuffles(q.fn(spark, sfDir))
    val without = shuffles(q.production(spark, sfDir))
    assert(without < withSort || withSort == 0,
      s"stripping saved nothing: fn=$withSort production=$without")
    Pin.releaseAll()
  }
}
