package graft

import org.apache.spark.sql.functions._

/** Physical-mechanism coverage for the ANN store tombstone/GC life cycle
  * (r16 verdict task 3). The registered `ann_store_gc` query proves the
  * READ VIEW equals a rebuild over survivors at every compaction state —
  * but the view is deliberately blind to WHICH branch the store took
  * (masked tombstones and compacted data read identically; that is the
  * point of tombstone masking). These tests pin the physical branches
  * the oracle cannot see, plus a PLANTED partial-trigger adversary the
  * fixtures never produce (uniform vector deletes tombstone every band
  * equally, so per-band trigger divergence needs a hand-skewed `_stats`
  * sidecar — the round-9 planted-adversary rule).
  */
class AnnGcSpec extends SparkSpec {

  private val fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  private def freshStore(tag: String): (org.apache.spark.sql.DataFrame, String, Long, Int) = {
    val dir = new java.io.File(s"target/ann_gc_spec_$tag").getAbsolutePath
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val all = ops.Extended.vecs(spark, sfDir)
    ops.Extended.annGcStoreInit(spark, all, dir)
    val n = all.count()
    val nbands = spark.read.parquet(s"$dir/_layout").collect()(0)
      .getAs[Int]("nbands")
    (all, dir, n, nbands)
  }

  private def rawRows(dir: String): Long =
    spark.read.parquet(dir).count()

  private def tombRows(dir: String): Long =
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_tombstones")))
      spark.read.parquet(s"$dir/_tombstones").count()
    else 0L

  test("below-trigger delete: tombstones retained, data partitions NOT rewritten") {
    val (all, dir, n, nbands) = freshStore("below")
    val before = rawRows(dir)
    assert(before === n * nbands)
    ops.Extended.annStoreDelete(spark, all.filter(col("vec_id") % 100 === 7), dir)
    ops.Extended.annStoreGc(spark, dir)
    // physical rows unchanged: the 1% batch sits under the 1/20 trigger,
    // so GC must not touch a single band directory
    assert(rawRows(dir) === before, "below-trigger GC rewrote data")
    assert(tombRows(dir) > 0, "tombstones were dropped without compaction")
    // ...and the view already masks the deleted ids
    val view = ops.Extended.annStoreView(spark, dir)
    assert(view.filter(col("vec_id") % 100 === 7).count() === 0)
    assert(view.count() === before - tombRows(dir))
  }

  test("over-trigger delete: every band compacts, tombstones drain") {
    val (all, dir, n, nbands) = freshStore("over")
    ops.Extended.annStoreDelete(spark, all.filter(col("vec_id") % 10 === 3), dir)
    ops.Extended.annStoreGc(spark, dir)
    val survivors = all.filter(col("vec_id") % 10 =!= 3).count()
    assert(rawRows(dir) === survivors * nbands,
      "compaction did not rewrite to exactly the surviving rows")
    assert(tombRows(dir) === 0, "compaction left tombstones behind")
    // stats sidecar follows the clearing (the next trigger computes
    // against post-GC physical rows)
    val stats = spark.read.parquet(s"$dir/_stats")
    assert(stats.agg(sum(col("nrows"))).head().getLong(0) === survivors * nbands)
  }

  test("PLANTED partial trigger: only the skewed band compacts; others keep masking") {
    val (all, dir, n, nbands) = freshStore("partial")
    assert(nbands >= 2)
    // plant: band 1 claims 19× fewer physical rows than reality, so the
    // same uniform 1% tombstone batch crosses ITS trigger alone —
    // the per-band divergence uniform deletes can never produce
    import spark.implicits._
    (0 until nbands).map(b => (b, if (b == 1) n / 19 else n))
      .toDF("band", "nrows")
      .write.mode("overwrite").parquet(s"$dir/_stats")
    ops.Extended.annStoreDelete(spark, all.filter(col("vec_id") % 100 === 7), dir)
    val del = all.filter(col("vec_id") % 100 === 7).count()
    val viewBefore = ops.Extended.annStoreView(spark, dir)
      .orderBy(col("band"), col("code"), col("vec_id")).collect()
    ops.Extended.annStoreGc(spark, dir)
    // band 1 physically compacted; every other band untouched
    val perBand = spark.read.parquet(dir)
      .groupBy(col("band").cast("int").as("band")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(perBand(1) === n - del, s"band 1 not compacted: ${perBand(1)}")
    (0 until nbands).filter(_ != 1).foreach { b =>
      assert(perBand(b) === n, s"band $b was rewritten below its trigger")
    }
    // uncompacted bands still carry their tombstones...
    val tombBands = spark.read.parquet(s"$dir/_tombstones")
      .select(col("band")).distinct().collect().map(_.getInt(0)).toSet
    assert(tombBands === (0 until nbands).filter(_ != 1).toSet)
    // ...and the READ VIEW is identical across the mixed compaction state
    val viewAfter = ops.Extended.annStoreView(spark, dir)
      .orderBy(col("band"), col("code"), col("vec_id")).collect()
    assert(viewAfter.toSeq === viewBefore.toSeq,
      "partial compaction changed the read view")
  }
}
