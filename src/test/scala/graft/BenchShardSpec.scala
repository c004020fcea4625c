package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's JVM-sharding must be an exact partition of the registry:
  * a dropped query silently under-reports the bench; a duplicated one
  * double-counts its time in the total.
  */
class BenchShardSpec extends AnyFunSuite {
  test("shards partition the query registry exactly, for any shard count") {
    val all = Bench.allNames
    for (n <- 1 to 5) {
      val shards = (0 until n).map(Bench.shardNames(_, n))
      assert(shards.flatten.sorted === all.sorted, s"n=$n not a partition")
      assert(shards.flatMap(identity).distinct.size === all.size)
      // round-robin keeps shard sizes within 1 of each other
      assert(shards.map(_.size).max - shards.map(_.size).min <= 1)
    }
  }
}
