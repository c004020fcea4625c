package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL registration for Spark's own Bloom-filter expressions.
  *
  * Catalyst ships `BloomFilterAggregate` / `BloomFilterMightContain` for
  * its AQE runtime-filter injection (InjectRuntimeFilter) but does NOT
  * expose them in the public function registry. The engine registers
  * them under `graft_` names — the same temp-function route as
  * graft_dot — so a query can make semi-join reduction STRUCTURAL
  * instead of hoping the optimizer injects it: build a KB-scale sketch
  * of the (filtered) dim-side join keys once, broadcast it as a scalar
  * subquery, and drop non-joining fact rows at the scan — before the
  * shuffle. `might_contain` admits false positives only, so following
  * it with the exact equi-join keeps results EXACT while the shuffle
  * carries ~selectivity × fact instead of the whole fact table; at
  * 100 TB that is the difference between shuffling terabytes and
  * gigabytes. The sketch itself is a mergeable aggregate (partial blooms
  * OR-merge), so building it is one pass with map-side combine.
  */
object BloomFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_might_contain",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in")
  }
}
