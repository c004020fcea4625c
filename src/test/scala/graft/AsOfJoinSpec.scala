package graft

import java.sql.Timestamp

import graft.plans.{AsOfJoin, AsOfJoinExec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{
  AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.{
  BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._

/** The native as-of join exec (plans/AsOfJoin.scala): semantics pinned
  * against hand-computed expectations on adversarial fixtures (exact-time
  * ties, tiebreak order, matchless keys, null keys, empty right), and the
  * physical plan shape asserted (two clustered exchanges feeding the merge,
  * never a nested-loop/cartesian pairing).
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // trades/quotes shape: the canonical as-of workload
  private def leftDf: DataFrame = Seq(
    // (sym, ts, trade_id)
    ("A", ts("2024-01-01 10:00:00"), 1L), // before any quote -> null
    ("A", ts("2024-01-01 10:00:05"), 2L), // exact match on 10:00:05
    ("A", ts("2024-01-01 10:00:30"), 3L), // between quotes -> 10:00:05 tie-max
    ("B", ts("2024-01-01 09:00:00"), 4L), // key with no quotes at all -> null
    ("C", ts("2024-01-01 12:00:00"), 5L)  // after the last C quote
  ).toDF("sym", "ts", "trade_id")

  private def rightDf: DataFrame = Seq(
    // (q_sym, q_ts, q_seq, px) — two quotes at the SAME instant for A:
    // the tiebreak (q_seq, greatest wins) must pick seq 11
    ("A", ts("2024-01-01 10:00:05"), 10L, 1.0),
    ("A", ts("2024-01-01 10:00:05"), 11L, 2.0),
    ("A", ts("2024-01-01 10:00:31"), 12L, 3.0), // 1s after trade 3
    ("C", ts("2024-01-01 11:00:00"), 20L, 9.0),
    ("D", ts("2024-01-01 00:00:00"), 30L, 7.0)  // right-only key: ignored
  ).toDF("q_sym", "q_ts", "q_seq", "px")

  private def joinRun(l: DataFrame = leftDf, r: DataFrame = rightDf) =
    AsOfJoin.leftJoin(l, r, Seq("sym"), Seq("q_sym"), "ts", "q_ts",
      Seq("q_seq"))

  test("backward as-of with exact-match and tiebreak semantics") {
    val got = joinRun()
      .select($"trade_id", $"q_seq", $"px")
      .as[(Long, Option[Long], Option[Double])]
      .collect().sortBy(_._1)
    assert(got === Array(
      (1L, None, None),             // no quote at-or-before
      (2L, Some(11L), Some(2.0)),   // exact time counts; tie -> max q_seq
      (3L, Some(11L), Some(2.0)),   // 10:00:31 quote is in the future
      (4L, None, None),             // key absent on right
      (5L, Some(20L), Some(9.0))))  // last C quote carried forward
  }

  test("every left row survives exactly once (left-outer cardinality)") {
    assert(joinRun().count() === leftDf.count())
  }

  test("empty right side yields all-null right columns") {
    val got = joinRun(r = rightDf.filter($"q_sym" === "ZZZ"))
    assert(got.count() === 5 && got.filter($"q_seq".isNotNull).count() === 0)
  }

  test("null keys match null keys (ordering semantics, documented)") {
    val l = Seq((Option.empty[String], ts("2024-01-01 10:00:00"), 1L))
      .toDF("sym", "ts", "trade_id")
    val r = Seq((Option.empty[String], ts("2024-01-01 09:00:00"), 5L, 1.5))
      .toDF("q_sym", "q_ts", "q_seq", "px")
    val got = joinRun(l, r).select($"q_seq").as[Option[Long]].collect()
    assert(got === Array(Some(5L)))
  }

  test("plan: merge exec fed by two clustered exchanges, no NLJ") {
    val df = joinRun()
    df.collect() // finalize AQE
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => q +: walk(q.plan) // stages are leaves
      case other => other +: other.children.flatMap(walk)
    }
    val nodes = walk(df.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[AsOfJoinExec]))
    assert(nodes.count(_.isInstanceOf[ShuffleExchangeLike]) === 2)
    assert(!nodes.exists(n => n.isInstanceOf[BroadcastNestedLoopJoinExec] ||
      n.isInstanceOf[CartesianProductExec]))
  }

  test("matches the relational argmax formulation on the fixture events") {
    val ev = core.Tables.events(spark, sfDir)
    val signups = ev.filter($"event_type" === "signup")
      .select($"event_id", $"user_id", $"ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("p_event_id"), $"user_id".as("p_user"),
        $"ts".as("p_ts"), $"value".as("p_val"))
    val native = AsOfJoin.leftJoin(signups, purchases,
        Seq("user_id"), Seq("p_user"), "ts", "p_ts", Seq("p_event_id"))
      .select($"event_id", $"p_event_id", $"p_val")
    // oracle shape: join all earlier purchases, keep argmax(ts, event_id)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_id")
      .orderBy($"p_ts".desc_nulls_last, $"p_event_id".desc_nulls_last)
    val relational = signups
      .join(purchases, $"p_user" === $"user_id" && $"p_ts" <= $"ts", "left")
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"event_id", $"p_event_id", $"p_val")
    assert(native.exceptAll(relational).isEmpty &&
      relational.exceptAll(native).isEmpty)
  }
}
