package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** State-growth probe for the crossModalStream union-find snapshot store
  * (r15 verdict task 5, SCALING.md round 16): preload the state at a
  * given member count (one giant batch 0), then time FIXED-SIZE
  * micro-batches (5 000 docs, then 500 docs) against it. Ran at both the
  * 10× (50k) and 100× (500k) fixtures, the comparison separates the
  * batch-proportional work (banding + CC over the contracted edge space)
  * from the state-proportional work. Since r17 the state layout is
  * append-only deltas + a compact remap table (the full members/buckets/
  * verdicts OVERWRITE this probe measured at ~2.3 s/decade in r16 is
  * gone — amortized into the 1/XmFoldEvery fold); the remaining
  * state-sided terms are the columnar member/bucket view SCANS.
  *
  * Usage: runMain graft.tools.CrossModalProbe <sfDir>
  * Unrecognized extra args fail loudly (round-14 harness rule).
  */
object CrossModalProbe {

  def main(args: Array[String]): Unit = {
    require(args.length == 1,
      s"usage: CrossModalProbe <sfDir>; got ${args.mkString(" ")}")
    val dir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .appName("graft-crossmodal-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("n_chars"))
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val cut1 = maxId - 5500 // batch 0: everything below (the preload)
    val cut2 = maxId - 500  // batch 1: 5 000 docs; batch 2: the last 500
    val state = "target/crossmodal_probe_state"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(state), true)

    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[crossmodal-probe] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    println(s"[crossmodal-probe] dir=$dir docs=${docs.count()} preload=${
      docs.filter(col("doc_id") <= cut1).count()}")
    time("batch 0: preload state") {
      graft.streaming.EventStream.mergeCrossModalSnapshot(
        docs.filter(col("doc_id") <= cut1), state, 0L)
    }
    time("batch 1: 5000 docs") {
      graft.streaming.EventStream.mergeCrossModalSnapshot(
        docs.filter(col("doc_id") > cut1 && col("doc_id") <= cut2), state, 1L)
    }
    time("batch 2: 500 docs") {
      graft.streaming.EventStream.mergeCrossModalSnapshot(
        docs.filter(col("doc_id") > cut2), state, 2L)
    }
    spark.stop()
  }
}
