package graft

import org.apache.spark.sql.functions._

/** Bucketing: co-located join with NO shuffle — the pre-partitioned-join
  * layout the engine prescribes for repeated big-big joins at 100 TB
  * (write once bucketed by the join key; every subsequent join on that
  * key skips both exchanges).
  */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    // warehouse.dir is a static conf — the default (spark-warehouse under
    // cwd = target of the forked test JVM) is fine; the db is dropped after.
    val db = "graft_bktest"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // at test scale both sides fit the broadcast threshold, which would
    // bypass bucketing entirely; the demo is the big-big (shuffled) case
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
      orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(s"$db.orders_b")
      lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(s"$db.lineitem_b")

      val joined = spark.table(s"$db.lineitem_b")
        .join(spark.table(s"$db.orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))

      // force execution so AQE finalizes, then inspect the final plan text
      val expected = lineitem.join(orders,
        col("l_orderkey") === col("o_orderkey")).count()
      val got = joined.collect().map(_.getLong(1)).sum
      assert(got === expected)
      val planStr = joined.queryExecution.executedPlan.toString
      assert(planStr.contains("SortMergeJoin") || planStr.contains("ShuffledHashJoin"),
        s"expected a shuffled join over bucketed scans:\n$planStr")
      assert(planStr.contains("Bucketed: true"), s"scans not bucketed:\n$planStr")
      // the ONLY exchange allowed is the groupBy on o_orderstatus; the join
      // keys must never be repartitioned (bucket layout satisfies them)
      assert(!planStr.contains("Exchange hashpartitioning(l_orderkey") &&
        !planStr.contains("Exchange hashpartitioning(o_orderkey"),
        s"join keys were shuffled despite bucketing:\n$planStr")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }

  test("parquet schema evolution: mergeSchema unions old and new file schemas") {
    // The lakehouse reality at 100 TB: files written before a column
    // existed coexist with files written after. mergeSchema=true unions
    // footer schemas at planning time; old files yield NULL for the new
    // column (no rewrite of historical data).
    val dir = s"target/graft_evolve_${ProcessHandle.current().pid()}"
    val oldBatch = spark.range(0, 5).selectExpr("id", "id * 2 AS a")
    val newBatch = spark.range(5, 10).selectExpr("id", "id * 2 AS a", "'x' AS b")
    oldBatch.write.mode("overwrite").parquet(dir)
    newBatch.write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("id", "a", "b"))
    val rows = merged.selectExpr("id", "b").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(rows(0L).isEmpty && rows(9L).contains("x"))
    assert(merged.count() === 10)
  }

  test("partitioned parquet re-read prunes to a single o_year partition") {
    // fn() performs the partitioned write eagerly, then returns the lazy
    // pruned-read plan — inspect the scan's PartitionFilters directly.
    val df = pipeline.Climate.parquetPartitioned.fn(spark, sfDir)
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") &&
      planStr.contains("(o_year") && planStr.contains("= 1997"),
      s"o_year=1997 not applied as a partition filter:\n$planStr")
    // the filter must NOT appear as a data filter (it has no data column)
    assert(!planStr.contains("PushedFilters: [IsNotNull(o_year)"),
      s"o_year leaked into data filters — not a partition column:\n$planStr")
    assert(df.count() > 0)
  }
}
