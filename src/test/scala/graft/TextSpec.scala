package graft

import graft.core.Text
import org.apache.spark.sql.functions._

/** Cross-engine text/hash primitives. */
class TextSpec extends SparkSpec {
  import spark.implicits._

  test("words: splits on whitespace runs, trims ends") {
    val got = Seq("  a  b\tc ").toDF("t")
      .select(Text.words(col("t")).as("w")).head().getSeq[String](0)
    assert(got === Seq("a", "b", "c"))
  }

  test("h32: 32-bit non-negative, deterministic, spread") {
    val got = Seq("a", "b", "a").toDF("t")
      .select(Text.h32(col("t")).as("h")).collect().map(_.getLong(0))
    assert(got(0) === got(2))
    assert(got(0) !== got(1))
    assert(got.forall(h => h >= 0 && h < (1L << 32)))
  }

  test("shingles: 3-word grams in order") {
    val got = Seq("a b c d e").toDF("t")
      .select(Text.words(col("t")).as("w"))
      .select(Text.shingles("w").as("sh")).head().getSeq[String](0)
    assert(got === Seq("a b c", "b c d", "c d e"))
  }

  test("hround: floor-based half-up, deterministic at midpoints") {
    val got = Seq(0.12344, 2.5, 3.5).toDF("x")
      .select(Text.hround(col("x"), 4).as("a"), Text.hround(col("x"), 0).as("b"))
      .collect()
    assert(math.abs(got(0).getDouble(0) - 0.1234) < 1e-12)
    assert(got(1).getDouble(1) === 3.0) // 2.5 -> 3 (half-up, not half-even)
    assert(got(2).getDouble(1) === 4.0)
  }
}
