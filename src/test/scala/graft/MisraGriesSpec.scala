package graft

import graft.functions.{MgBuf, MisraGries}
import org.apache.spark.sql.functions._

/** The mergeable Misra-Gries sketch behind `heavy_hitters`. */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish skewed stream: term t_i appears ~1000/i times. */
  private val stream: Seq[String] =
    (1 to 40).flatMap(i => Seq.fill(1000 / i)(s"t$i"))

  test("guarantee: every term above N/(k+1) survives, any partition layout") {
    val k = 8
    val n = stream.length
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mustSurvive = exact.collect {
      case (t, c) if c * (k + 1) > n => t
    }.toSet
    assert(mustSurvive.nonEmpty && mustSurvive.size < exact.size,
      "fixture must straddle the threshold")
    val mg = udaf(new MisraGries(k), org.apache.spark.sql.Encoders.STRING)
    for (parts <- Seq(1, 3, 17)) {
      val cands = stream.toDF("t").repartition(parts)
        .agg(mg(col("t")).as("c")).as[Seq[String]].head().toSet
      assert(cands.size <= k, s"parts=$parts: sketch exceeded k")
      assert(mustSurvive.subsetOf(cands),
        s"parts=$parts: lost guaranteed heavy hitter(s) ${mustSurvive -- cands}")
    }
  }

  test("merge subtract-pivot keeps at most k and never overcounts") {
    val agg = new MisraGries(4)
    val a = MgBuf(Array("a", "b", "c", "d"), Array(10L, 8L, 5L, 2L))
    val b = MgBuf(Array("c", "d", "e", "f"), Array(9L, 7L, 6L, 1L))
    val m = agg.merge(a, b)
    assert(m.terms.length <= 4)
    val w = m.terms.zip(m.ws).toMap
    // summed weights pre-pivot: a=10 b=8 c=14 d=9 e=6 f=1; pivot = 5th
    // largest = 6 → kept: a=4, b=2, c=8, d=3
    assert(w == Map("a" -> 4L, "b" -> 2L, "c" -> 8L, "d" -> 3L))
  }

  test("two-pass query result equals the exact GROUP BY + HAVING") {
    val k = 8
    val n = stream.length
    val mg = udaf(new MisraGries(k), org.apache.spark.sql.Encoders.STRING)
    val toks = stream.toDF("term").repartition(7)
    val cands = toks.agg(mg(col("term")).as("c"))
      .select(explode(col("c")).as("term"))
    val got = toks.join(broadcast(cands), Seq("term"))
      .groupBy($"term").agg(count(lit(1)).as("n"))
      .filter($"n" * (k + 1) > n)
      .as[(String, Long)].collect().toMap
    val want = stream.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * (k + 1) > n }.toMap
    assert(got == want)
  }
}
