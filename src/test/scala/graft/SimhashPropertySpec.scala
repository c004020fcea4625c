package graft

import graft.ops.Extended
import org.apache.spark.sql.functions._

/** Property check for the SimHash banding join: on random signatures
  * with ADVERSARIALLY planted mutations, the banded candidate +
  * row-local Hamming verify must return EXACTLY the brute-force
  * all-pairs Hamming ≤ (bands−1) result — at BOTH registered widths
  * (32-bit/8-bit bands and the production 64-bit/16-bit bands). The
  * pigeonhole theorem (≤ bands−1 flips can't touch all bands) is
  * trivially true — what this spec actually guards is the
  * IMPLEMENTATION: band extraction (shift/mask arithmetic — at 64 bits
  * the top band sits under the sign bit, so an unmasked arithmetic
  * shiftright would smear sign bits into the code), the pair-expand,
  * the ride-along signature, and the verify-before-distinct, on shapes
  * the fixtures don't produce (band-boundary-straddling flips,
  * all-flips-in-one-band, exact hamming-(bands) negatives planted one
  * flip per band).
  */
class SimhashPropertySpec extends SparkSpec {
  import spark.implicits._

  private def brute(sigs: Map[Long, Long],
      bands: Int): Set[(Long, Long, Int)] = {
    val ids = sigs.keys.toSeq.sorted
    (for {
      i <- ids; j <- ids if i < j
      h = java.lang.Long.bitCount(sigs(i) ^ sigs(j))
      if h <= bands - 1
    } yield (i, j, h)).toSet
  }

  private def check(bits: Int, bands: Int): Unit = {
    val mask = if (bits == 64) -1L else (1L << bits) - 1
    val bandBits = bits / bands
    val rnd = new scala.util.Random(11)
    def randSig(): Long = rnd.nextLong() & mask
    val base = (1L to 60L).map(i => i -> randSig()).toMap
    def flip(sig: Long, fbits: Seq[Int]): Long =
      fbits.foldLeft(sig)((s, b) => s ^ (1L << b)) & mask
    var next = 100L
    def derive(from: Long, fbits: Seq[Int]): (Long, Long) = {
      next += 1; next -> flip(base(from), fbits)
    }
    val top = bits - 1
    val planted = Map(
      derive(1L, Nil), // exact duplicate
      derive(2L, Seq(5)), // 1 flip inside band 0
      // 2 flips straddling the band-0/1 boundary
      derive(3L, Seq(bandBits - 1, bandBits)),
      derive(4L, Seq(0, 1, 2)), // 3 flips all inside one band
      // 3 flips in 3 different bands
      derive(5L, Seq(bandBits - 1, 2 * bandBits - 1, 3 * bandBits - 1)),
      // hamming 4, one per band: MUST be absent
      derive(6L, Seq(3, bandBits + 3, 2 * bandBits + 3, 3 * bandBits + 3)),
      derive(7L, Seq(top)), // top-bit flip (sign/mask edge)
      derive(8L, Seq(top, top - 1, top - 2)) // 3 flips in the top band
    )
    val sigs = base ++ planted
    val got = Extended.simhashPairsOf(
        sigs.toSeq.toDF("doc_id", "simhash"), bits, bands)
      .as[(Long, Long, Int)].collect().toSet
    val want = brute(sigs, bands)
    assert(got === want,
      s"$bits-bit: missed=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    // non-vacuity: all 7 planted positives must actually appear, and the
    // planted hamming-4 pair (6, 106) must NOT
    assert(want.size >= 7, s"$bits-bit vacuous: only ${want.size} true pairs")
    assert(!got.exists(p => p._1 == 6L && p._2 == 106L),
      s"$bits-bit: hamming-${bands} negative leaked through the verify filter")
  }

  test("banded pairs == brute force on adversarial 32-bit signatures") {
    check(Extended.SimBits, Extended.SimBands)
  }

  test("banded pairs == brute force on adversarial 64-bit signatures") {
    check(Extended.SimWideBits, Extended.SimBands)
  }
}
