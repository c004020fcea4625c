package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling experiments (dev only). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    import graft.core.{Tables, Text}
    val P = Text.P
    val dw = Tables.documents(spark, sfDir)
      .select(col("doc_id"), Text.words(col("text")).as("w"))
      .filter(size(col("w")) >= 3)
    val hw = dw.select(col("doc_id"),
      expr("transform(w, x -> CAST(conv(substr(md5(x), 1, 8), 16, 10) AS BIGINT))").as("hw"))
    val hs = hw.select(col("doc_id"), expr(
      s"transform(sequence(1, size(hw) - 2), i -> " +
        s"(element_at(hw, i) * 961 + element_at(hw, i + 1) * 31 + element_at(hw, i + 2)) % $P)")
      .as("hs"))

    time("1 words")(dw.agg(sum(size(col("w")))).collect())
    time("2 hw")(hw.agg(sum(size(col("hw")))).collect())
    time("3 hs")(hs.agg(sum(size(col("hs")))).collect())
    time("4 hs+repart")(hs.repartition(col("doc_id")).agg(sum(size(col("hs")))).collect())
    val ex = hs.repartition(col("doc_id"))
      .select(col("doc_id"), explode(col("hs")).as("sh"))
    time("5 explode")(println("  rows=" + ex.count()))
    time("6 groupBy")(ex.groupBy(col("doc_id"), col("sh")).agg(count(lit(1))).count())
    val exNoRep = hs.select(col("doc_id"), explode(col("hs")).as("sh"))
    time("7 explode no-repart")(exNoRep.count())
    time("8 registered")(graft.SparkEntry.queries("repetition_score")(spark, sfDir).count())
    time("A explode parquet array")(
      Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), explode(col("embedding"))).count())
    val ck = hs.localCheckpoint()
    time("B explode after checkpoint")(
      ck.select(col("doc_id"), explode(col("hs"))).count())
    val hwOnly = hw.localCheckpoint()
    time("C explode hw after checkpoint")(
      hwOnly.select(col("doc_id"), explode(col("hw"))).count())
    val polyFromCk = hwOnly.select(col("doc_id"), expr(
      s"transform(sequence(1, size(hw) - 2), i -> " +
        s"(element_at(hw, i) * 961 + element_at(hw, i + 1) * 31 + element_at(hw, i + 2)) % $P)")
      .as("hs"))
    time("D explode poly-from-checkpointed-hw")(
      polyFromCk.select(col("doc_id"), explode(col("hs"))).count())
    spark.stop()
  }
}
