package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time one registered query and dump its formatted plan.
  * Usage: runMain graft.tools.BenchOne <name> [sfDir] [explain]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    if (args.contains("explain")) fn(spark, sfDir).explain("formatted")
    if (args.contains("reuse")) {
      val df = fn(spark, sfDir)
      df.collect()
      val fin = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      println("REUSED_EXCHANGE=" + fin.contains("ReusedExchange"))
    }
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"RUN$i $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
