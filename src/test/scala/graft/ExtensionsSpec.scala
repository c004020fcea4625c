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

  test("RangeJoinRewrite: pure interval join loses its nested loop, keeps its rows") {
    val spark = SparkTestSession.spark // extensions are on this context
    import spark.implicits._
    // points 0..999; intervals of width ~30, some null-bounded, some empty
    val pts = (0L until 1000L).map(i => (i, i % 7)).toDF("p", "tag")
    val ivs = Seq[(Long, java.lang.Long, java.lang.Long)](
      (1L, 10L, 40L), (2L, 95L, 130L), (3L, 400L, 400L), (4L, 500L, 499L),
      (5L, null, 100L), (6L, 990L, 1500L))
      .toDF("iv_id", "lo", "hi")
    val joined = pts.join(ivs, $"p" >= $"lo" && $"p" <= $"hi")
    val phys = joined.queryExecution.executedPlan.toString
    assert(!phys.contains("BroadcastNestedLoopJoin") &&
      !phys.contains("CartesianProduct"),
      s"interval join not rewritten to an equi-join:\n$phys")
    assert(phys.contains("graft_bin"), s"bin key missing from plan:\n$phys")
    // ground truth from a driver-side loop over the same data
    val expect = (for {
      (p, tag) <- (0L until 1000L).map(i => (i, i % 7))
      (iv, lo, hi) <- Seq((1L, Some(10L), Some(40L)), (2L, Some(95L), Some(130L)),
        (3L, Some(400L), Some(400L)), (4L, Some(500L), Some(499L)),
        (5L, None, Some(100L)), (6L, Some(990L), Some(1500L)))
      if lo.exists(p >= _) && hi.exists(p <= _)
    } yield (p, tag, iv, lo.get, hi.get)).toSet
    val got = joined.as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == expect)
    assert(got.size == 78) // 31 + 36 + 1 + 0 + 0 + 10
  }

  test("RangeJoinRewrite: strict bounds and flipped operand order both honored") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val pts = (0L until 100L).toDF("p")
    val ivs = Seq((1L, 10L, 20L)).toDF("iv_id", "lo", "hi")
    // lo < p AND hi >= p — strict lower, bound-on-left orientation
    val joined = pts.join(ivs, $"lo" < $"p" && $"hi" >= $"p")
    val phys = joined.queryExecution.executedPlan.toString
    assert(!phys.contains("BroadcastNestedLoopJoin"), phys)
    val got = joined.as[(Long, Long, Long, Long)].collect().map(_._1).sorted
    assert(got.toSeq == (11L to 20L)) // strict > 10, inclusive <= 20
  }

  test("RangeJoinRewrite: equi-joins and non-range thetas are left alone") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val a = (0L until 50L).toDF("x")
    val b = (0L until 50L).map(i => (i, i + 5)).toDF("y", "z")
    // equality present: rule must not touch it (no graft_bin in the plan)
    val equi = a.join(b, $"x" === $"y" && $"x" <= $"z")
    assert(!equi.queryExecution.executedPlan.toString.contains("graft_bin"))
    assert(equi.count() == 50)
    // one-sided bound only: not a containment pair, untouched
    val half = a.join(b, $"x" >= $"y")
    assert(!half.queryExecution.executedPlan.toString.contains("graft_bin"))
    assert(half.count() == (1L to 50L).sum)
  }

  test("check rule: unhinted cartesian rejected; hinted/bounded/opted-out pass") {
    val spark = SparkTestSession.spark // extensions are on this context
    import org.apache.spark.sql.functions._
    val a = spark.range(3).toDF("x")
    val b = spark.range(3).toDF("y")
    // naked cartesian: the check rule fails ANALYSIS (construction time)
    val e = intercept[Exception] { a.crossJoin(b) }
    assert(e.getMessage.contains("unhinted cartesian"))
    // explicitly hinted: allowed (the brute-force-baseline shape)
    assert(a.crossJoin(broadcast(b)).count() === 9)
    // hint under a unary node (filter): Spark's EliminateResolvedHint
    // still honors it, so the guard must too
    assert(a.crossJoin(broadcast(b).filter(col("y") >= 0)).count() === 9)
    // ...but a hint below a JOIN on that side governs that join, not
    // this cartesian — still rejected
    val e2 = intercept[Exception] {
      a.crossJoin(b.join(broadcast(spark.range(3).toDF("z")),
        col("y") === col("z")))
    }
    assert(e2.getMessage.contains("unhinted cartesian"))
    // one-row side (scalar cross join): allowed without a hint
    assert(a.crossJoin(b.agg(count(lit(1)).as("n"))).count() === 3)
    // per-session escape hatch
    spark.conf.set("spark.graft.failOnCartesian", "false")
    try assert(a.crossJoin(b).count() === 9)
    finally spark.conf.unset("spark.graft.failOnCartesian")
  }
}
