package graft

import graft.ops.Extended
import org.apache.spark.sql.functions._

/** Property check for the SimHash banding join: on random 32-bit
  * signatures with ADVERSARIALLY planted mutations, the banded
  * candidate + row-local Hamming verify must return EXACTLY the
  * brute-force all-pairs Hamming ≤ 3 result. The pigeonhole theorem
  * (≤3 flips can't touch all 4 bands) is trivially true — what this
  * spec actually guards is the IMPLEMENTATION: band extraction
  * (shift/mask arithmetic), the pair-expand, the ride-along signature,
  * and the verify-before-distinct, on shapes the fixtures don't
  * produce (band-boundary-straddling flips, all-flips-in-one-band,
  * exact hamming-4 negatives planted one flip per band).
  */
class SimhashPropertySpec extends SparkSpec {
  import spark.implicits._

  private val Mask = 0xFFFFFFFFL

  private def brute(sigs: Map[Long, Long]): Set[(Long, Long, Int)] = {
    val ids = sigs.keys.toSeq.sorted
    (for {
      i <- ids; j <- ids if i < j
      h = java.lang.Long.bitCount(sigs(i) ^ sigs(j))
      if h <= Extended.SimBands - 1
    } yield (i, j, h)).toSet
  }

  test("banded pairs == brute-force hamming<=3 on adversarial signatures") {
    val rnd = new scala.util.Random(11)
    def randSig(): Long = rnd.nextLong() & Mask
    val base = (1L to 60L).map(i => i -> randSig()).toMap
    def flip(sig: Long, bits: Seq[Int]): Long =
      bits.foldLeft(sig)((s, b) => s ^ (1L << b)) & Mask
    var next = 100L
    def derive(from: Long, bits: Seq[Int]): (Long, Long) = {
      next += 1; next -> flip(base(from), bits)
    }
    val planted = Map(
      derive(1L, Nil), // exact duplicate
      derive(2L, Seq(5)), // 1 flip inside band 0
      derive(3L, Seq(7, 8)), // 2 flips straddling the band-0/1 boundary
      derive(4L, Seq(0, 1, 2)), // 3 flips all inside one band
      derive(5L, Seq(7, 15, 23)), // 3 flips in 3 different bands
      derive(6L, Seq(3, 11, 19, 27)), // hamming 4, one per band: MUST be absent
      derive(7L, Seq(31)), // top-bit flip (sign/mask edge)
      derive(8L, Seq(24, 31, 30)) // 3 flips all inside the top band
    )
    val sigs = base ++ planted
    val got = Extended.simhashPairsOf(
        sigs.toSeq.toDF("doc_id", "simhash"))
      .as[(Long, Long, Int)].collect().toSet
    val want = brute(sigs)
    assert(got === want,
      s"missed=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    // non-vacuity: all 7 planted positives must actually appear, and the
    // planted hamming-4 pair (6, 106) must NOT
    assert(want.size >= 7, s"vacuous: only ${want.size} true pairs")
    assert(!got.exists(p => p._1 == 6L && p._2 == 106L),
      "hamming-4 negative leaked through the verify filter")
  }
}
