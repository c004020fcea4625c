package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway profiling experiments (dev only). Current experiment:
  * round-16 task 1 — candidate CONTENT-DEFINED pixel boundaries for the
  * phash fake decode (bigram feature-hash pixels), measured for fixture
  * non-vacuity at all three SFs BEFORE wiring both engines (the
  * round-15 balanced-chunking lesson: a scale fix that erases the
  * fixture signal is a vacuous gate).
  */
object Scratch {

  /** Candidate phash: pixels are content-defined — each 2-word shingle
    * (bigram) is assigned to pixel (h32 div 256) % 32 by its OWN hash
    * and contributes its full h32 to that pixel's sum (mod 256). No
    * positional chunking at all, so no trailing-zero pixels and no
    * boundary shift under length edits.
    *
    * NOTE: this deliberately preserves the md5-per-BIGRAM DRAFT hash
    * (concat_ws + md5 per bigram — the 18/17/146 non-vacuity numbers)
    * for the round-16 A/B record; the SHIPPED Multimodal.phashOf uses
    * the arithmetic word-hash combine ((h32(w_i)·33 + h32(w_{i+1})) mod
    * 2^32 — 13/13/146, and 28 → 17 s at the 500k probe). Re-running
    * this measures the draft, not the registered scheme.
    */
  private def phashCdp(payloads: DataFrame): DataFrame = {
    val h32x = "CAST(conv(substr(md5(x), 1, 8), 16, 10) AS BIGINT)"
    payloads
      .select(col("doc_id"),
        graft.core.Text.words(decode(col("payload"), "UTF-8")).as("w"))
      .filter(size(col("w")) >= 32)
      .withColumn("hg", expr(
        s"transform(transform(sequence(1, size(w) - 1), " +
          s"i -> concat_ws(' ', slice(w, i, 2))), x -> $h32x)"))
      .withColumn("px", expr(
        "transform(sequence(1, 32), i -> " +
          "aggregate(filter(hg, h -> (h div 256) % 32 = i - 1), " +
          "CAST(0 AS BIGINT), (a, h) -> a + h) % 256)"))
      .withColumn("sp", expr("aggregate(px, CAST(0 AS BIGINT), (a, x) -> a + x)"))
      .withColumn("ph", expr(
        "aggregate(sequence(1, 32), CAST(0 AS BIGINT), (a, i) -> " +
          "a + IF(32 * element_at(px, i) >= sp, " +
          "shiftleft(CAST(1 AS BIGINT), i - 1), CAST(0 AS BIGINT)))"))
      .withColumn("dh", expr(
        "aggregate(sequence(1, 32), CAST(0 AS BIGINT), (a, i) -> " +
          "a + IF(element_at(px, i) > element_at(px, IF(i = 32, 1, i + 1)), " +
          "shiftleft(CAST(1 AS BIGINT), i - 1), CAST(0 AS BIGINT)))"))
      .select(col("doc_id"), col("ph"),
        expr("ph + shiftleft(dh, 32)").as("ph64"))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    dirs.foreach { d =>
      val ph = phashCdp(graft.ops.Multimodal.media(spark, d)
        .select(col("doc_id"), col("payload")))
        .persist()
      val n = ph.count()
      // fixture floor is 32-bit width (docs < 8192 at sf<=0.1 eligible set)
      val sig32 = ph.select(col("doc_id"), expr("ph64 & 4294967295").as("simhash"))
      val p32 = graft.ops.Extended.simhashPairsOf(sig32, 32, 4).persist()
      val le1 = p32.filter(col("hamming") <= 1).count()
      val le3 = p32.count()
      val h0 = p32.filter(col("hamming") === 0).count()
      val sig64 = ph.select(col("doc_id"), col("ph64").as("simhash"))
      val p64 = graft.ops.Extended.simhashPairsOf(sig64, 64, 4)
      val le1w = p64.filter(col("hamming") <= 1).count()
      println(s"[scratch-cdp] dir=$d eligible=$n pairs32: h0=$h0 le1=$le1 le3=$le3 pairs64 le1=$le1w")
      p32.unpersist(); ph.unpersist()
    }
    spark.stop()
  }
}
