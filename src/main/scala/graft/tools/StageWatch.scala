package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev tool: run one query repeatedly with a stage-timing listener to
  * localize sporadic stalls (per-stage runtime vs scheduler gaps).
  */
object StageWatch {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 6
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var lastEvent = System.nanoTime()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = for {
          s <- si.submissionTime; c <- si.completionTime
        } yield (c - s) / 1000.0
        val gap = (System.nanoTime() - lastEvent) / 1e9
        lastEvent = System.nanoTime()
        if (wall.exists(_ > 2.0) || gap > 2.0)
          println(f"SLOW stage ${si.stageId}%4d wall=${wall.getOrElse(-1.0)}%.1f s sinceLast=$gap%.1f s ${si.name.take(60)}")
      }
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val gap = (System.nanoTime() - lastEvent) / 1e9
        lastEvent = System.nanoTime()
        if (gap > 2.0) println(f"GAP before job ${j.jobId}: $gap%.1f s (driver-side)")
      }
    })
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"ITER $i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
