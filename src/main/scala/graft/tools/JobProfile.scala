package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev tool: run one query a few times and print EVERY job's wall time
  * plus the driver-side gap since the previous job finished — the
  * breakdown StageWatch's 2 s threshold hides. For overhead-bound
  * driver-coordinated queries (iterative rounds, store round-trips) the
  * per-job list localizes whether time goes to task execution, to
  * broadcast builds, or to driver-side planning between jobs.
  * Usage: runMain graft.tools.JobProfile <name> [sfDir] [reps]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    @volatile var lastEnd = System.nanoTime()
    @volatile var verbose = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        t0.put(j.jobId, System.nanoTime())
        if (verbose) {
          val gap = (System.nanoTime() - lastEnd) / 1e9
          if (gap > 0.05) println(f"  gap $gap%6.2f s (driver)")
        }
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val w = (System.nanoTime() - t0.getOrDefault(j.jobId, System.nanoTime())) / 1e9
        lastEnd = System.nanoTime()
        if (verbose) println(f"  job ${j.jobId}%4d wall=$w%6.2f s")
      }
    })
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      verbose = i == reps // only the steady-state rep prints per-job lines
      val t = System.nanoTime()
      val df = fn(spark, sfDir)
      val tc = System.nanoTime()
      df.count()
      println(f"ITER $i ${(System.nanoTime() - t) / 1e9}%.2f s " +
        f"(construct ${(tc - t) / 1e9}%.2f s)")
    }
    spark.stop()
  }
}
