package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM, one context). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Static conf, read from the SparkContext: must be set by whichever
      // builder creates the one test context, or ExtensionsSpec's fresh
      // session would (dis)inject based on suite ordering.
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

abstract class SparkSpec extends AnyFunSuite {
  // val (not def): a stable identifier, so `import spark.implicits._` works
  protected val spark: SparkSession = SparkTestSession.spark
  protected val sfDir: String = SparkTestSession.sfDir
}
