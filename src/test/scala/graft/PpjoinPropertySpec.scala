package graft

import graft.ops.Extended
import org.apache.spark.sql.functions._

/** Property check for the PPJoin prefix filter: on ADVERSARIAL random
  * token sets (distributions the parquet fixtures don't exhibit — tiny
  * shared vocabularies, heavy skew, subset/superset chains, singleton
  * and identical sets), the filtered join must return EXACTLY the
  * brute-force all-pairs Jaccard ≥ 0.5 result. This guards the two
  * subtle pieces of math the oracle only tests on fixture-shaped data:
  * the prefix length |x| − ⌈t·|x|⌉ + 1 under the global (df, h) order,
  * and the symmetric ⌈t·|x|⌉ ≤ |y| length filter.
  */
class PpjoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private def bruteForce(sets: Map[Long, Set[Long]]): Set[(Long, Long)] = {
    val ids = sets.keys.toSeq.sorted
    (for {
      i <- ids; j <- ids if i < j
      inter = sets(i).intersect(sets(j)).size
      union = sets(i).size + sets(j).size - inter
      // mirror the engine's EXACT integer gate: 2·inter >= union
      // (never a rounded-jaccard threshold — hround(4) >= 0.5 admits
      // true jac in [0.49995, 0.5), which the prefix filter may prune)
      if 2 * inter >= union
    } yield (i, j)).toSet
  }

  test("ppjoin == brute force on adversarial random token sets") {
    val rnd = new scala.util.Random(42)
    // 3 regimes per trial: tiny vocab (forces prefix collisions), skewed
    // Zipf-ish vocab, and mutation chains (near-dups by construction)
    for (trial <- 1 to 3) {
      val vocab = trial match {
        case 1 => 12L   // nearly everything collides
        case 2 => 200L
        case _ => 60L
      }
      val base = (1L to 40L).map { id =>
        val n = 1 + rnd.nextInt(12)
        id -> (1 to n).map(_ => rnd.nextLong().abs % vocab).toSet
      }.toMap
      // mutation chains: copy a set, flip one element (near-dup), plus
      // one exact duplicate and one subset
      val mutated = base ++ Map(
        41L -> base(1L),
        42L -> (base(2L) + (vocab + 1)),
        43L -> base(3L).take(math.max(1, base(3L).size / 2)))
      val rows = mutated.toSeq.flatMap { case (id, hs) => hs.map(id -> _) }
      val ds = rows.toDF("doc_id", "h")
      val got = Extended.ppjoinPairsOf(ds)
        .select(col("d1"), col("d2")).as[(Long, Long)].collect().toSet
      val want = bruteForce(mutated)
      assert(got === want,
        s"trial $trial: ppjoin ${got.size} pairs vs brute ${want.size}; " +
          s"missed=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
      assert(want.nonEmpty, s"trial $trial: vacuous — no qualifying pairs")
    }
  }

  test("rounding-window pair (true jac in [0.49995, 0.5)) is excluded") {
    // Planted boundary case from the round-9 advice: A = {1..14999},
    // B = {5001..20000} → inter = 9999, union = 20000, true jac =
    // 0.49995, which hround(4) rounds UP to 0.5000. Under the old
    // rounded gate this pair's membership depended on whether the
    // prefix filter happened to keep it; under the exact integer gate
    // both engines agree it does NOT qualify. Control pair C/D has jac
    // exactly 0.5 (inter 6, union 12) and MUST survive.
    val sets = Map(
      1L -> (1L to 14999L).toSet,
      2L -> (5001L to 20000L).toSet,
      3L -> (100001L to 100010L).toSet,
      4L -> ((100001L to 100006L).toSet + 200001L + 200002L))
    val rows = sets.toSeq.flatMap { case (id, hs) => hs.map(id -> _) }
    val got = Extended.ppjoinPairsOf(rows.toDF("doc_id", "h"))
      .select(col("d1"), col("d2")).as[(Long, Long)].collect().toSet
    assert(got === bruteForce(sets), s"mismatch vs brute force: $got")
    assert(!got.contains((1L, 2L)), "rounding-window pair wrongly admitted")
    assert(got.contains((3L, 4L)), "exact jac=0.5 control pair missed")
  }
}
