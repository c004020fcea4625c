package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions: graft_dot injected via spark.sql.extensions config. */
class ExtensionsSpec extends AnyFunSuite {
  test("spark.sql.extensions=graft.GraftExtensions injects graft_dot") {
    // Force a genuinely new SparkSession build (sharing the JVM's context)
    // so the extensions config is applied rather than a cached session
    // returned; restore the shared test session afterwards.
    // NOTE: spark.sql.extensions is a STATIC conf — Spark reads it from the
    // SparkContext, so it's set at context creation (here or in
    // SparkTestSession, whichever wins the race); this test proves a fresh
    // session on that context resolves the functions WITHOUT any
    // programmatic register call.
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.extensions", "graft.GraftExtensions")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val d = s.sql(
        "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .head().getDouble(0)
      assert(d === 11.0)
      // and it composes with builtins in a plan
      val n = s.sql(
        "SELECT graft_dot(v, v) AS d FROM (SELECT array(1.0d, 2.0d) AS v)")
        .head().getDouble(0)
      assert(n === 5.0)
      // graft_nfc rides the same injection path
      val nf = s.sql("SELECT graft_nfc('café') AS x").head().getString(0)
      assert(nf === "café")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach(SparkSession.setDefaultSession)
    }
  }
}
