package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Property check for the bottom-k machinery behind the KMV family
  * (`kmv_set_ops`, `kmv_partition_union`, `kmv_distinct_types`,
  * `EventStream.kmvDistinctState`): merge ≡ rebuild — the bottom-k of a
  * union of per-shard bottom-k's equals the whole-data bottom-k — must
  * hold EXACTLY, including on inputs the md5 fixtures never produce:
  * DUPLICATE hash values straddling the k boundary and split across
  * shards. The (h, key) total order is what makes the sketch
  * deterministic there; this spec drives that tie-break through Spark's
  * actual window-rank / orderBy-limit plans (the risk surface — the
  * JVM-side streaming fold is three lines, the plan semantics are not)
  * against a brute-force reference, on planted boundary ties and on
  * random heavy-collision inputs.
  */
class KmvPropertySpec extends SparkSpec {
  import spark.implicits._

  /** The exact plan shapes the queries use: per-shard window rank ≤ k,
    * then global bottom-k of the union, vs direct global bottom-k.
    */
  private def mergedVsDirect(df: DataFrame, k: Int): (Seq[(Long, Long)], Seq[(Long, Long)]) = {
    val wS = Window.partitionBy(col("shard")).orderBy(col("h"), col("key"))
    val perShard = df.withColumn("rn", row_number().over(wS))
      .filter(col("rn") <= k).drop("rn")
    def bottomK(d: DataFrame) =
      d.orderBy(col("h"), col("key")).limit(k)
        .select(col("h"), col("key")).as[(Long, Long)].collect().toSeq.sorted
    (bottomK(perShard), bottomK(df))
  }

  private def brute(rows: Seq[(Long, Long)], k: Int): Seq[(Long, Long)] =
    rows.distinct.sorted.take(k)

  test("planted boundary ties split across shards: merge == rebuild == brute") {
    // k = 4; the tie group h=5 spans the boundary (positions 3..6) and is
    // dealt across all three shards, so any tie-unsafe path (per-shard or
    // global) keeps the wrong members
    val rows = Seq(
      (1L, 10L, 0L), (2L, 11L, 1L), (5L, 3L, 0L), (5L, 1L, 1L),
      (5L, 2L, 2L), (5L, 4L, 0L), (9L, 12L, 2L), (9L, 13L, 1L),
      (12L, 14L, 2L))
    val df = rows.toDF("h", "key", "shard")
    val (merged, direct) = mergedVsDirect(df, 4)
    val expect = brute(rows.map(r => (r._1, r._2)), 4)
    assert(expect === Seq((1L, 10L), (2L, 11L), (5L, 1L), (5L, 2L)),
      "planted input lost its boundary-tie shape — fix the fixture")
    assert(merged === expect, s"merged bottom-k wrong: $merged")
    assert(direct === expect, s"direct bottom-k wrong: $direct")
  }

  test("random heavy-collision inputs, adversarial shard splits: merge == rebuild") {
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 6) {
      val n = 40 + rnd.nextInt(160)
      val k = 1 + rnd.nextInt(12)
      // tiny hash domain → massive tie groups; keys unique
      val rows = (1 to n).map { i =>
        (rnd.nextInt(8).toLong, i.toLong, rnd.nextInt(4).toLong)
      }
      val df = rows.toDF("h", "key", "shard")
      val (merged, direct) = mergedVsDirect(df, k)
      val expect = brute(rows.map(r => (r._1, r._2)), k)
      assert(merged === expect, s"trial $trial (n=$n k=$k): merged != brute")
      assert(direct === expect, s"trial $trial (n=$n k=$k): direct != brute")
    }
  }

  test("streaming fold == plan bottom-k on the same rows in any batch split") {
    val rnd = new scala.util.Random(17)
    val k = 8
    // (h, user) ROW state, the KmvBuf shape: colliding hashes from
    // distinct users are distinct rows and may BOTH occupy bottom-k slots
    val rows = (1 to 120).map(u => (rnd.nextInt(20).toLong, u.toLong))
    val folded = rows.grouped(40).foldLeft(Vector.empty[(Long, Long)]) {
      (prev, batch) => (prev.iterator ++ batch).toVector.distinct.sorted.take(k)
    }
    val direct = rows.distinct.sorted.take(k).toVector
    assert(folded === direct, "batch-split fold diverged from direct bottom-k")
    assert(direct.map(_._1).distinct.size < direct.size,
      "no hash tie landed in the bottom-k — vacuous collision coverage")
  }
}
