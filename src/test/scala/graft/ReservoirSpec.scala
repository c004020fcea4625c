package graft

import graft.functions.BottomKByHash
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The mergeable bottom-k-by-hash Aggregator behind `reservoir_sample`. */
class ReservoirSpec extends SparkSpec {
  import spark.implicits._

  test("partition layout cannot change the sample (merge correctness)") {
    // The same input under 1, 3, and 13 partitions drives completely
    // different reduce/merge call trees; a buggy merge (dropping, double
    // counting, unstable ties) shows up as layout-dependent output.
    val ids = (1L to 500L).toSeq
    val resK = udaf(new BottomKByHash(7), org.apache.spark.sql.Encoders.scalaLong)
    def sample(parts: Int): Seq[Long] =
      ids.toDF("id").repartition(parts)
        .agg(resK(col("id")).as("ids"))
        .as[Seq[Long]].head()
    val ref = sample(1)
    assert(ref.length == 7)
    assert(sample(3) == ref)
    assert(sample(13) == ref)
  }

  test("agrees with the window-rank formulation groupwise") {
    val df = (1L to 300L).map(i => (i, s"g${i % 4}")).toDF("id", "g")
    val resK = udaf(new BottomKByHash(5), org.apache.spark.sql.Encoders.scalaLong)
    val viaAgg = df.repartition(11)
      .groupBy($"g").agg(resK($"id").as("ids"))
      .select($"g", explode($"ids").as("id"))
      .as[(String, Long)].collect().toSet
    val viaWindow = df
      .withColumn("h", core.Text.h32(col("id").cast("string")))
      .withColumn("rn",
        row_number().over(Window.partitionBy($"g").orderBy($"h", $"id")))
      .filter($"rn" <= 5).select($"g", $"id")
      .as[(String, Long)].collect().toSet
    assert(viaAgg == viaWindow)
    assert(viaAgg.size == 20)
  }

  test("groups smaller than k return the whole group, hash-ordered") {
    val resK = udaf(new BottomKByHash(10), org.apache.spark.sql.Encoders.scalaLong)
    val out = Seq(1L, 2L, 3L).toDF("id")
      .agg(resK(col("id")).as("ids")).as[Seq[Long]].head()
    assert(out.toSet == Set(1L, 2L, 3L))
    // ascending by md5-prefix hash, not by id
    val hs = out.map(i => core.Text.jvmH32(i.toString))
    assert(hs == hs.sorted)
  }
}
