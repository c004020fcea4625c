package graft.tools

import graft.core.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe for the persisted ANN index's APPEND cost (r15 verdict task 3,
  * SCALING.md round 16): the `ann_state_append` contract is that merging
  * a new embedding batch into the band-partitioned store is
  * BATCH-proportional — coding the batch at the store's persisted layout
  * version plus an append write, no corpus access. This measures, on a
  * large fixture dir (GenScale 10×/100×):
  *
  *  - build+write of the corpus store (the one-time cost appends avoid);
  *  - append of a SMALL batch (2% of ids) vs a LARGE batch (20% of ids)
  *    into the same store — batch-proportionality shows as the ratio of
  *    these two tracking the batch-size ratio, not the store size;
  *  - a full rebuild over corpus+large-batch for contrast (what a
  *    maintenance-free pipeline would pay per refresh).
  *
  * Usage: runMain graft.tools.AnnStateProbe <sfDir>
  * Unrecognized extra args fail loudly (round-14 harness rule).
  */
object AnnStateProbe {

  def main(args: Array[String]): Unit = {
    require(args.length == 1,
      s"usage: AnnStateProbe <sfDir>; got ${args.mkString(" ")}")
    val dir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .appName("graft-ann-state-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(tag: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[ann-state-probe] $tag%-34s $s%8.2f s")
      s
    }

    val all = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").as("v"))
    val corpus = all.filter(col("vec_id") % 10 < 8)
    val small = all.filter(col("vec_id") % 100 >= 98)
    val large = all.filter(col("vec_id") % 10 >= 8)
    println(s"[ann-state-probe] dir=$dir corpus=${corpus.count()} " +
      s"small=${small.count()} large=${large.count()}")

    val store = "target/ann_state_probe_store"
    def codes(vs: org.apache.spark.sql.DataFrame,
        layout: org.apache.spark.sql.DataFrame) =
      graft.ops.Extended.embBandCodesPinned(vs, layout)
        .select(col("vec_id"), col("code").cast("long").as("code"), col("band"))

    time("build+write corpus store") {
      codes(corpus, graft.ops.Extended.embLayoutOf(corpus))
        .write.mode("overwrite").partitionBy("band").parquet(store)
    }
    graft.ops.Extended.embLayoutOf(corpus)
      .write.mode("overwrite").parquet(s"$store/_layout")
    val layout = spark.read.parquet(s"$store/_layout")
    val tS = time("append small batch (2% ids)") {
      codes(small, layout)
        .write.mode("append").partitionBy("band").parquet(store)
    }
    val tL = time("append large batch (20% ids)") {
      codes(large, layout)
        .write.mode("append").partitionBy("band").parquet(store)
    }
    // corpus-sized batch: makes the append's DATA term visible over the
    // ~1.5 s fixed per-job overhead (2%/20% batches sit under it)
    val tX = time("append xl batch (80% ids)") {
      codes(corpus, layout)
        .write.mode("append").partitionBy("band").parquet(store)
    }
    time("full rebuild corpus+large") {
      codes(corpus.unionByName(large), layout)
        .write.mode("overwrite").partitionBy("band")
        .parquet("target/ann_state_probe_rebuild")
    }
    // r16 verdict task 1 — the SEARCH rows: a store-backed search must
    // track PROBE size (the fixed ≤201-query batch), not corpus size.
    // Run at sf1 vs sf10, the store-search row should stay ~flat while
    // the store (and the build row — what a fresh-recode search pays per
    // query batch, since every non-store ANN query re-codes the corpus)
    // grows 10×.
    val vecsAll = graft.ops.Extended.vecs(spark, dir)
    val searchStore = "target/ann_search_probe_store"
    val tB = time("build search store (sorted)") {
      graft.ops.Extended.annSearchStoreWrite(spark, vecsAll, searchStore)
    }
    val tQ = time("store search (fixed query batch)") {
      println(s"[ann-state-probe]   search top-5 rows=${
        graft.ops.Extended.annStoreSearchFrom(spark, vecsAll, searchStore)
          .count()}")
    }
    println(f"[ann-state-probe] search/build ratio ${tQ / tB}%.2f " +
      "(a fresh-recode search pays ~the build row per query batch)")
    // r17 multi-probe rows: recall@5 vs brute-force truth for the exact
    // vs the 1-bit-flip probe set — the "recall bought per probe" knob,
    // measured on the SAME store (probe list 9×, zero extra tables).
    val brute = graft.ops.Extended.cosineTopKAt(spark, dir, 5)
      .select(col("q_id"), col("nn_id")).localCheckpoint()
    val nTruth = brute.count().toDouble
    def recallOf(res: org.apache.spark.sql.DataFrame): Double =
      res.select(col("q_id"), col("nn_id"))
        .join(brute, Seq("q_id", "nn_id"), "semi").count() / nTruth
    val rEx = recallOf(
      graft.ops.Extended.annStoreSearchFrom(spark, vecsAll, searchStore))
    val tMp = time("store search, multi-probe (9x list)") {
      println(s"[ann-state-probe]   mp top-5 rows=${
        graft.ops.Extended.annStoreSearchFrom(spark, vecsAll, searchStore,
          flipBits = graft.ops.Extended.EmbBits).count()}")
    }
    val rMp = recallOf(graft.ops.Extended.annStoreSearchFrom(
      spark, vecsAll, searchStore, flipBits = graft.ops.Extended.EmbBits))
    println(f"[ann-state-probe] recall@5 exact ${rEx}%.3f -> multi-probe ${rMp}%.3f " +
      f"(mp/exact search time ${tMp / tQ}%.2f)")
    // r16 verdict task 3 — the GC rows: delete cost must track the
    // DELETED FRACTION. A below-trigger batch pays only the tombstone
    // append (batch-proportional, no data rewrite); the compacting batch
    // pays the threshold rewrite, amortized ≤ AnnGcTrigger × deletes.
    val gcStore = "target/ann_gc_probe_store"
    time("build gc store") {
      graft.ops.Extended.annGcStoreInit(spark, vecsAll, gcStore)
    }
    val tD1 = time("delete 0.5% + GC (tombstones only)") {
      graft.ops.Extended.annStoreDelete(spark,
        vecsAll.filter(col("vec_id") % 200 === 7), gcStore)
      graft.ops.Extended.annStoreGc(spark, gcStore)
    }
    val tD2 = time("delete 10% + GC (compaction)") {
      graft.ops.Extended.annStoreDelete(spark,
        vecsAll.filter(col("vec_id") % 10 === 3), gcStore)
      graft.ops.Extended.annStoreGc(spark, gcStore)
    }
    println(f"[ann-state-probe] compacting/tombstone-only GC ratio ${tD2 / tD1}%.2f " +
      "(deleted-fraction ratio 21.0)")
    // r17 upsert row: a re-embedding batch must cost two batch codings
    // plus changed-only writes — never a store pass. The batch picks
    // GC-surviving ids (% 50 == 21 avoids both delete batches above);
    // half re-embed to reverse(v) (codes move), half identically (zero
    // writes), mirroring the registered ann_store_upsert mix.
    val upOld = vecsAll.filter(col("vec_id") % 50 === 21)
    val upNew = upOld.withColumn("v",
      when(col("vec_id") % 100 === 21, reverse(col("v"))).otherwise(col("v")))
    val tU = time("upsert 2% ids (half changed)") {
      graft.ops.Extended.annStoreUpsert(spark, upOld, upNew, gcStore)
    }
    println(f"[ann-state-probe] upsert/small-append ratio ${tU / tS}%.2f " +
      "(upsert codes its batch twice + changed-only writes + stats fold)")
    println(f"[ann-state-probe] xl/large append ratio ${tX / tL}%.2f " +
      s"(batch-size ratio ${corpus.count().toDouble / large.count()})")
    println(f"[ann-state-probe] large/small append ratio ${tL / tS}%.2f " +
      s"(batch-size ratio ${large.count().toDouble / small.count()})")
    spark.stop()
  }
}
