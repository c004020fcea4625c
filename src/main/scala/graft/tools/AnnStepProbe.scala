package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-step wall times of the persisted-ANN-store lifecycle
  * (the ann_store_gc sequence), to localize which store steps carry the
  * fixed-cost mass at fixture scale. Run twice; read the second pass.
  * Usage: runMain graft.tools.AnnStepProbe [sfDir]
  */
object AnnStepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STEP $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    (1 to 2).foreach { pass =>
      println(s"== pass $pass")
      val dir = graft.pipeline.Climate.sinkDir(sfDir, "ann_probe_store")
      val all = t("vecs()") { graft.ops.Extended.vecs(spark, sfDir) }
      t("gcStoreInit") { graft.ops.Extended.annGcStoreInit(spark, all, dir) }
      t("delete 1%") { graft.ops.Extended.annStoreDelete(
        spark, all.filter(col("vec_id") % 100 === 7), dir) }
      t("gc (no compaction)") { graft.ops.Extended.annStoreGc(spark, dir) }
      val v1 = t("view+checkpoint") {
        graft.ops.Extended.annStoreView(spark, dir)
          .withColumn("stage", lit(1)).localCheckpoint() }
      t("delete 10%") { graft.ops.Extended.annStoreDelete(
        spark, all.filter(col("vec_id") % 10 === 3), dir) }
      t("gc (compacting)") { graft.ops.Extended.annStoreGc(spark, dir) }
      t("final count") {
        v1.unionByName(graft.ops.Extended.annStoreView(spark, dir)
            .withColumn("stage", lit(2)))
          .orderBy(col("stage"), col("band"), col("code"), col("vec_id"))
          .count() }
    }
    spark.stop()
  }
}
