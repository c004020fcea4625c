package graft

import graft.ops.Analytics
import org.apache.spark.sql.functions._

/** Semantic invariants for the statistical/set-algebra operators (their
  * primary gate is the DuckDB oracle; these pin the math itself).
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("corr_regr: correlation in [-1,1]; slope/intercept reproduce built-in OLS") {
    val r = Analytics.corrRegr.fn(spark, sfDir)
      .select("l_returnflag", "corr_xy", "slope", "intercept")
      .as[(String, Double, Double, Double)].collect()
    assert(r.nonEmpty)
    r.foreach { case (g, c, m, b) =>
      assert(c >= -1.0 && c <= 1.0, s"group $g corr $c")
      // cross-check against Spark's built-in regression aggregates
      val Array(bm, bb) = graft.core.Tables.lineitem(spark, sfDir)
        .filter(col("l_returnflag") === g)
        .agg(expr("regr_slope(l_extendedprice, l_quantity)"),
          expr("regr_intercept(l_extendedprice, l_quantity)"))
        .head().toSeq.map(_.asInstanceOf[Double]).toArray
      assert(math.abs(m - bm) < 1e-3, s"group $g slope $m vs builtin $bm")
      assert(math.abs(b - bb) < 1e-2, s"group $g intercept $b vs builtin $bb")
    }
  }

  test("histogram_fixed: buckets partition the table (counts sum to total)") {
    val h = Analytics.histogram.fn(spark, sfDir)
      .select("bucket", "n", "lo", "hi")
      .as[(Int, Long, Double, Double)].collect()
    val total = graft.core.Tables.lineitem(spark, sfDir).count()
    assert(h.map(_._2).sum === total)
    h.foreach { case (b, _, lo, hi) =>
      assert(lo <= hi)
      if (b < 11) { assert(lo >= b * 5000.0 && hi < (b + 1) * 5000.0) }
      else assert(lo >= 55000.0)
    }
  }

  test("intersect_except: modes are disjoint and consistent with raw year sets") {
    val r = Analytics.setOps.fn(spark, sfDir)
      .select("mode", "o_custkey").as[(String, Long)].collect()
    val both = r.filter(_._1 == "both").map(_._2).toSet
    val only = r.filter(_._1 == "only_1995").map(_._2).toSet
    assert((both intersect only).isEmpty)
    val o = graft.core.Tables.orders(spark, sfDir)
    def ys(y: Int) = o.filter(year(col("o_orderdate")) === y)
      .select("o_custkey").as[Long].collect().toSet
    val (c95, c96) = (ys(1995), ys(1996))
    assert(both === (c95 intersect c96))
    assert(only === (c95 diff c96))
  }

  test("sessionize_batch: partitions events exactly like session_window") {
    // Both formulations must agree on (user, session start, event count):
    // the gap-island >= 30m break mirrors session_window's end-exclusive
    // [start, last + gap) — an exact-30m gap starts a NEW session in both.
    val batch = ops.Windows.sessionizeBatch.fn(spark, sfDir)
      .select("user_id", "sess_start", "n_events")
      .as[(Long, java.sql.Timestamp, Long)].collect().toSet
    val sw = streaming.EventStream.sessionWindow.fn(spark, sfDir)
      .select("user_id", "sess_start", "n_events")
      .as[(Long, java.sql.Timestamp, Long)].collect().toSet
    assert(batch.nonEmpty)
    assert(batch === sw, "gap-island sessions diverge from session_window")
  }

  test("bm25_topk: scores positive, descending, and rank-consistent with tf") {
    val r = ops.Extended.bm25TopK.fn(spark, sfDir)
      .select("doc_id", "n_terms", "score")
      .as[(Long, Long, Double)].collect()
    assert(r.length === 10)
    assert(r.forall(_._3 > 0.0))
    assert(r.map(_._3).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
      "top-10 not in descending score order")
    assert(r.forall(t => t._2 >= 1 && t._2 <= 3), "n_terms outside 1..3")
  }

  test("nullsafe_join: every order lands in exactly one group incl. the NULL key") {
    val r = Analytics.nullSafeJoin.fn(spark, sfDir)
      .select("grp", "n_orders").as[(String, Long)].collect().toMap
    val o = graft.core.Tables.orders(spark, sfDir)
    assert(r.values.sum === o.count(), "null-keyed rows were dropped")
    assert(r("open_default") ===
      o.filter(col("o_orderstatus") === "O").count())
  }
  test("kendall_tau: matches an independent JVM brute-force recomputation") {
    // independent oracle style: recompute C/D/ties/tau from the RAW
    // per-line fixture rows, aggregating in a plain Scala HashMap and
    // applying the documented half-up cents convention
    // floor(x*100+0.5) through the JVM's own floor — a different
    // evaluation AND aggregation path from the query's Spark fold, so
    // a regression to the old truncating cast on the Spark side breaks
    // here (r14 ADVICE: the old test mirrored the Spark cast verbatim)
    val raw = graft.core.Tables.lineitem(spark, sfDir)
      .select(col("l_suppkey"), col("l_quantity"), col("l_extendedprice"))
      .as[(Long, Double, Double)].collect()
    val acc = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    raw.foreach { case (sk, q, p) =>
      val cents = math.floor(p * 100 + 0.5).toLong
      val (x0, y0) = acc.getOrElse(sk, (0L, 0L))
      acc(sk) = (x0 + q.toLong, y0 + cents)
    }
    val sup = acc.toArray.map { case (sk, (x, y)) => (sk, x, y) }
      .sortBy(_._1)
    var (c, dd, tx, ty) = (0L, 0L, 0L, 0L)
    for (i <- sup.indices; j <- i + 1 until sup.length) {
      val (_, xi, yi) = sup(i); val (_, xj, yj) = sup(j)
      if ((xi < xj && yi < yj) || (xi > xj && yi > yj)) c += 1
      else if ((xi < xj && yi > yj) || (xi > xj && yi < yj)) dd += 1
      if (xi == xj) tx += 1
      if (yi == yj) ty += 1
    }
    val n = sup.length.toLong
    val n0 = n * (n - 1) / 2
    val tau = (c - dd).toDouble / math.sqrt(((n0 - tx) * (n0 - ty)).toDouble)
    val got = graft.ops.Analytics.kendallTau.fn(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Double)].head()
    assert(got === ((n, c, dd, tx, ty,
      math.floor(tau * 1e4 + 0.5) / 1e4)), s"query $got vs brute ($n,$c,$dd,$tx,$ty,$tau)")
  }

  test("anova_oneway: matches an independent JVM recomputation of F") {
    val g = graft.core.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("s"),
        sum((col("l_quantity") * col("l_quantity")).cast("long")).as("q"))
      .as[(String, Long, Long, Long)].collect()
    val n = g.map(_._2).sum
    val m = g.map(_._3).sum.toDouble / n
    // same 1e-4 quantization the query applies per group term
    val ssbU = g.map { case (_, ng, sg, _) =>
      val mg = sg.toDouble / ng
      math.floor(ng * (mg - m) * (mg - m) * 1e4 + 0.5).toLong }.sum
    val sswU = g.map { case (_, ng, sg, qg) =>
      val mg = sg.toDouble / ng
      math.floor((qg.toDouble - ng * mg * mg) * 1e4 + 0.5).toLong }.sum
    val k = g.length.toLong
    val f = (ssbU.toDouble / (k - 1)) / (sswU.toDouble / (n - k))
    val got = graft.ops.Analytics.anovaOneway.fn(spark, sfDir)
      .as[(Long, Long, Long, Long, Double, Double)].head()
    assert(got._1 === k && got._2 === n)
    assert(got._3 === ssbU && got._4 === sswU,
      s"quantized sums drifted: $got vs ($ssbU, $sswU)")
    assert(math.abs(got._5 - math.floor(f * 1e4 + 0.5) / 1e4) < 1e-12)
    // F strongly insignificant on uniform fixture quantities would be
    // suspicious; just assert it is finite and positive
    assert(got._5 > 0.0 && !got._5.isInfinite)
  }
}
