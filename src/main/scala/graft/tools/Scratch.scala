package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway profiling experiments (dev only). Current experiment:
  * round counts of the hub-min-init star CC loop at sf0.1 / sf0.01.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    Seq("/root/testdata/sf0.1", "/root/testdata/sf0.01").foreach { sfDir =>
      val star = {
        val bands = graft.ops.Extended.bandsOf(
          graft.ops.Extended.signatures(spark, sfDir))
        bands.groupBy(col("band"), col("bkey"))
          .agg(expr("array_sort(collect_list(doc_id))").as("ds"))
          .filter(size(col("ds")).between(2, 1000))
          .select(explode(expr(
            "transform(slice(ds, 2, size(ds) - 1), y -> struct(element_at(ds, 1) AS d1, y AS d2))"))
            .as("p"))
          .select(col("p.d1").as("d1"), col("p.d2").as("d2"))
      }
      val sym = star.union(star.select(col("d2").as("d1"), col("d1").as("d2")))
        .toDF("v", "n").repartition(col("n")).persist()
      def lblSum(df: DataFrame): Long =
        df.agg(coalesce(sum(col("lbl")), lit(0L))).head().getLong(0)
      var lbl = star.select(col("d2").as("v"), col("d1").as("l"))
        .union(star.select(col("d1").as("v"), col("d1").as("l")))
        .groupBy(col("v")).agg(min(col("l")).as("lbl")).localCheckpoint(false)
      var prevSum = -1L
      var converged = false
      var it = 0
      def step(l: DataFrame): DataFrame = {
        val nbrMin = sym
          .join(l.select(col("v").as("n"), col("lbl").as("nlbl")), Seq("n"))
          .groupBy(col("v")).agg(min(col("nlbl")).as("nmin"))
        l.join(nbrMin, Seq("v"), "left")
          .select(col("v"),
            least(col("lbl"), coalesce(col("nmin"), col("lbl"))).as("lbl"))
      }
      while (!converged && it < 13) {
        val next = step(step(lbl)).localCheckpoint(false)
        if (prevSum == -1L) {
          val sums = lbl.select(col("lbl")).withColumn("t", lit(0))
            .union(next.select(col("lbl")).withColumn("t", lit(1)))
            .groupBy(col("t")).agg(coalesce(sum(col("lbl")), lit(0L)).as("s"))
            .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
          converged = sums.getOrElse(0, 0L) == sums.getOrElse(1, 0L)
          prevSum = sums.getOrElse(1, 0L)
        } else {
          val s2 = lblSum(next)
          converged = s2 == prevSum
          prevSum = s2
        }
        lbl = next
        it += 1
      }
      println(s"SF $sfDir rounds=$it verts=${lbl.count()}")
      sym.unpersist(false)
    }
    spark.stop()
  }
}
