package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Regression guards for the plan properties the engine's 100 TB posture
  * depends on: filter pushdown, column pruning, partition pruning, and
  * the flagship's single-shuffle shape.
  */
class ScaleSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // finalize AQE
    // AQE's toString prints "== Final Plan ==" followed by the initial
    // plan; keep only the final section so node counts aren't doubled
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("flagship: filters pushed to scan, columns pruned, one data shuffle") {
    val df = pipeline.Climate.monthly.fn(spark, sfDir)
    val plan = planOf(df)
    assert(plan.contains("PushedFilters:") &&
      plan.contains("GreaterThanOrEqual(l_shipdate"), s"no pushed filters:\n$plan")
    // pruned lineitem read: 5 of 11 columns
    val read = plan.linesIterator
      .find(l => l.contains("ReadSchema") && l.contains("l_suppkey"))
    assert(read.isDefined && !read.get.contains("l_comment") &&
      !read.get.contains("l_returnflag"), s"scan not pruned: $read")
    // exactly one hash-partitioned exchange for the agg (plus the sort's
    // range exchange); dim join must be broadcast
    val hashEx = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(hashEx === 1, s"expected 1 hash exchange, got $hashEx:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), "dim join not broadcast")
  }

  test("no unintended nested-loop or cartesian join in ANY query plan") {
    // Two queries broadcast a deliberately tiny side against every row:
    // the brute-force top-k baseline (whole point: score all pairs) and
    // IVF centroid assignment (every vector scores all ~10 centroids).
    // Both are broadcast-NLJ over KB-scale builds — fine at any scale.
    val intended = Set("embed_cosine_topk", "embed_ann_ivf")
    SparkEntry.defs.foreach { q =>
      val df = q.fn(spark, sfDir)
      val phys = df.queryExecution.sparkPlan.toString
      assert(!phys.contains("CartesianProduct"),
        s"${q.name} plans a cartesian product:\n$phys")
      if (!intended(q.name))
        assert(!phys.contains("BroadcastNestedLoopJoin"),
          s"${q.name} plans a nested-loop join:\n$phys")
    }
  }

  test("partitioned parquet write prunes partitions on read") {
    val out = Files.createTempDirectory("graft_pp").toString
    spark.read.parquet(s"$sfDir/orders.parquet")
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    val one = spark.read.parquet(out).filter(col("o_orderstatus") === "F")
    val plan = planOf(one)
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderstatus"),
      s"no partition filter:\n$plan")
    val statuses = spark.read.parquet(out)
      .select("o_orderstatus").distinct().count()
    assert(statuses >= 2) // pruning is meaningful
  }
}
