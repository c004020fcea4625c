package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Probe for the ANN store's STREAMING maintenance twin
  * (EventStream.annStoreMaintainStream / mergeAnnStoreBatch): the
  * contract is that a maintenance batch costs BATCH-sized coding plus a
  * keys-only mask/write — never a state pass — except on the fold
  * batch, whose state-sized rewrite is amortized to 1/foldEvery of
  * batches (and bounds the view's read fan-in). This drives FIXED
  * 500-event batches (300 adds of new rotated ids, 100 deletes, 100
  * re-embeds) through 12 merges at foldEvery=8 over a base store built
  * from the dir's embeddings, so run at sf1 vs sf10 (20k vs 200k
  * vectors) the non-fold rows measure per-batch cost across a 10×
  * STATE decade at constant batch size; the fold row isolates the
  * amortized rewrite; the view rows bracket the delta fan-in effect.
  *
  * Usage: runMain graft.tools.AnnStreamProbe <sfDir>
  * Unrecognized extra args fail loudly (round-14 harness rule).
  */
object AnnStreamProbe {

  def main(args: Array[String]): Unit = {
    require(args.length == 1,
      s"usage: AnnStreamProbe <sfDir>; got ${args.mkString(" ")}")
    val dir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .appName("graft-ann-stream-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)

    def time(tag: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[ann-stream-probe] $tag%-34s $s%8.2f s")
      s
    }

    val vecs = graft.ops.Extended.vecs(spark, dir)
      .select(col("vec_id"), col("v"))
    val store = "target/ann_stream_probe_store"
    fs.delete(new org.apache.hadoop.fs.Path(store), true)
    time("build base store") {
      graft.ops.Extended.embBandCodesPinned(vecs,
          graft.ops.Extended.embLayoutOf(vecs))
        .select(col("vec_id"), col("code").cast("long").as("code"),
          col("band"))
        .write.mode("overwrite").partitionBy("band").parquet(s"$store/base")
      graft.ops.Extended.embLayoutOf(vecs)
        .write.mode("overwrite").parquet(s"$store/base/_layout")
    }
    println(s"[ann-stream-probe] dir=$dir base=${vecs.count()} vecs")

    // fixed-ABSOLUTE batch slices (id-count-independent, so the batch
    // stays 500 events while the state grows a decade across dirs)
    val ids = vecs.select(col("vec_id")).orderBy(col("vec_id"))
      .collect().map(_.getLong(0))
    val nB = 12
    require(ids.length >= 8000, s"corpus too small for the slices: ${ids.length}")
    def slice(off: Int, per: Int, k: Int): Seq[Long] =
      ids.slice(off + k * per, off + (k + 1) * per).toSeq
    val dim = vecs.select(size(col("v"))).head().getInt(0)
    val nullV = lit(null).cast("array<double>")
    def batchDf(k: Int): DataFrame = {
      val adds = vecs.filter(col("vec_id").isin(slice(4000, 300, k): _*))
        .select(lit("add").as("op"),
          (col("vec_id") + lit(10000000L)).as("vec_id"),
          concat(org.apache.spark.sql.functions.slice(col("v"), 2, dim - 1),
            org.apache.spark.sql.functions.slice(col("v"), 1, 1)).as("v"),
          nullV.as("v_old"))
      val dels = vecs.filter(col("vec_id").isin(slice(0, 100, k): _*))
        .select(lit("del").as("op"), col("vec_id"), col("v"),
          nullV.as("v_old"))
      val ups = vecs.filter(col("vec_id").isin(slice(1500, 100, k): _*))
        .select(lit("ups").as("op"), col("vec_id"),
          reverse(col("v")).as("v"), col("v").as("v_old"))
      adds.unionByName(dels).unionByName(ups)
    }

    val times = (0 until nB).map { k =>
      time(f"merge batch $k%2d (500 events)") {
        graft.streaming.EventStream.mergeAnnStoreBatch(
          batchDf(k), store, k.toLong, foldEvery = 8)
      }
    }
    val foldK = 7 // 8th live delta triggers the fold at foldEvery=8
    require(fs.exists(new org.apache.hadoop.fs.Path(
      s"$store/adds/bid=$foldK/_folded")), "expected fold did not happen")
    val nonFold = times.zipWithIndex.filter(_._2 != foldK).map(_._1).sorted
    println(f"[ann-stream-probe] non-fold batch median ${
      nonFold(nonFold.length / 2)}%.2f s, fold batch ${times(foldK)}%.2f s")
    time("view count (post-fold, 4 live deltas)") {
      println(s"[ann-stream-probe]   view rows=${
        graft.streaming.EventStream.annStoreStreamView(spark, store).count()}")
    }
    spark.stop()
  }
}
