package graft

import graft.ops.{Extended, Multimodal}
import org.apache.spark.sql.functions._

/** Property coverage for the phash 128-bit rung (r16 verdict task 4).
  * The banded machinery itself (word-seam straddles, sign-bit masking,
  * rung equivalences) is property-tested in SimhashPropertySpec and
  * SHARED; what is new here and needs its own adversaries is (a) the
  * count-GATED second pixel plane inside phashOf — below the gate it
  * must change nothing, above it it must carry real per-doc signal —
  * and (b) the PARAMETERIZED third-rung threshold (phash opens at
  * Phash128N = 2M, not the text family's 50M). No fixture count comes
  * near the gate, so both sides are exercised with FORGED one-row count
  * frames (the SimhashPropertySpec discipline).
  */
class PhashRungSpec extends SparkSpec {
  import spark.implicits._

  private def payloads = Multimodal.media(spark, sfDir)
    .select(col("doc_id"), col("payload"))

  test("below the gate: two-word phash path is bit-identical to the single-word path") {
    val ndReal = graft.core.Tables.documents(spark, sfDir)
      .agg(count(lit(1)).as("nd"))
    val single = Multimodal.phashOf(payloads)
      .orderBy(col("doc_id")).collect().toSeq
    val gatedOff = Multimodal.phashOf(payloads, Some(ndReal))
      .select(col("doc_id"), col("ph"), col("ph64"))
      .orderBy(col("doc_id")).collect().toSeq
    assert(gatedOff === single,
      "adding the gated plane below the gate changed ph/ph64 values")
    // ...and the ladder masks the below-gate constant second word, so the
    // pair output is the historical one
    val sig2 = Multimodal.phashOf(payloads, Some(ndReal))
      .select(col("doc_id"), col("ph64").as("simhash"),
        col("ph64b").as("simhash2"))
    val sig1 = Multimodal.phashOf(payloads)
      .select(col("doc_id"), col("ph64").as("simhash"))
    def pairs(df: org.apache.spark.sql.DataFrame,
        nd: org.apache.spark.sql.DataFrame) =
      Extended.simhashPairsAdaptiveFrom(df, nd, n128 = Multimodal.Phash128N)
        .as[(Long, Long, Int)].collect().toSet
    assert(pairs(sig2, ndReal) === pairs(sig1, ndReal))
  }

  test("forged gate: plane 2 carries real per-doc signal and tightens the verify") {
    val ndForged = Seq(Multimodal.Phash128N + 1).toDF("nd")
    // PLANT a true exact duplicate (the fixture has none at sf0.001:
    // its hamming-0 pairs are near-dups whose plane-1 bits happen not
    // to flip — exactly the pairs the finer plane-2 hamming may
    // legitimately re-separate): identical payload, new id
    val dup = payloads.filter(col("doc_id") === 8)
      .select(lit(999999L).as("doc_id"), col("payload"))
    val withDup = payloads.unionByName(dup)
    val sigs = Multimodal.phashOf(withDup, Some(ndForged))
      .select(col("doc_id"), col("ph64").as("simhash"),
        col("ph64b").as("simhash2"))
    // plane-2 signal: above the gate ph64b must DISCRIMINATE (below it
    // every doc collapses to the same masked constant)
    val distinct2 = sigs.select(col("simhash2")).distinct().count()
    assert(distinct2 > 100, s"plane-2 word is near-constant: $distinct2 values")
    def pairs(nd: org.apache.spark.sql.DataFrame) =
      Extended.simhashPairsAdaptiveFrom(sigs, nd, n128 = Multimodal.Phash128N)
        .as[(Long, Long, Int)].collect().toSet
    val at64 = pairs(Seq(Extended.SimWidthLadderN + 1).toDF("nd"))
    val at128 = pairs(ndForged)
    // the 128-bit hamming adds plane-2 bits, so the rung can only TIGHTEN
    assert(at128.map(p => (p._1, p._2)).subsetOf(at64.map(p => (p._1, p._2))),
      s"128 rung emitted a pair the 64 rung did not: ${
        at128.map(p => (p._1, p._2)) -- at64.map(p => (p._1, p._2))}")
    // the planted exact duplicate has identical planes: hamming 0 at
    // BOTH rungs — opening the rung never loses a true duplicate
    assert(at64.contains((8L, 999999L, 0)),
      s"planted exact dup missing at the 64 rung: $at64")
    assert(at128.contains((8L, 999999L, 0)),
      s"planted exact dup lost opening the 128 rung: $at128")
  }

  test("PLANTED plane-2 divergence: dropped at the parameterized 128 rung only") {
    // two signatures identical in the 64-bit word, 4 plane-2 bits apart
    // (one per band — the SimhashPropertySpec hamming-(bands) negative,
    // moved entirely into the second word): the 64 rung cannot see the
    // divergence, the 128 rung must drop the pair. n128 is a small
    // custom threshold to prove the PARAMETER is honored (not Sim128N).
    val lo = 0x123456789ABCDEFL
    val hiA = 0x0F0F0F0F0F0F0F0FL
    val hiB = hiA ^ ((1L << 3) | (1L << 35) | (1L << 44) | (1L << 63))
    val rnd = new scala.util.Random(13)
    val fillers = (10L to 40L).map(i => (i, rnd.nextLong(), rnd.nextLong()))
    val df = (Seq((1L, lo, hiA), (2L, lo, hiB)) ++ fillers)
      .toDF("doc_id", "simhash", "simhash2")
    // n128 must sit ABOVE the 32→64 floor (8192) or the first rung wins
    // the CASE and the threshold is unreachable — itself worth pinning
    val n128 = Extended.SimWidthLadderN + 1000L
    def pairs(nd: Long) =
      Extended.simhashPairsAdaptiveFrom(df, Seq(nd).toDF("nd"), n128 = n128)
        .as[(Long, Long, Int)].collect().toSet
        .filter(p => p._1 == 1L && p._2 == 2L)
    assert(pairs(n128 - 1) === Set((1L, 2L, 0)),
      "below the custom n128 the pair must surface with 64-bit hamming 0")
    assert(pairs(n128 + 1) === Set.empty,
      "above the custom n128 the 4-bit plane-2 divergence must drop the pair")
  }
}
