package graft

import graft.ops.Graph
import org.apache.spark.sql.functions._

/** Property check for the random-walk inverse-CDF edge choice
  * (`Graph.cdf` + `Graph.pick`) — the round-9 exact-machinery
  * discipline: for ANY weight shape and EVERY draw value, the
  * join+filter must keep EXACTLY one edge per node (a boundary bug —
  * `<=` for `<`, truncating div, a tie in the interval order — yields
  * 0 or 2 picks and silently drops or duplicates walkers), and the
  * picked edge must be the inverse-CDF edge an independent scan
  * reference selects. Planted shapes the fixture graph never hits:
  * unit weights, one dominant weight, weight-1 edges flanking a huge
  * one, a single-edge node, and draws at EVERY interval boundary
  * (u = 0, each cw−1/cw pair, wout−1, plus raw hashes ≥ wout that
  * exercise the modulo).
  */
class WalkPropertySpec extends SparkSpec {
  import spark.implicits._

  private def reference(edges: Seq[(Long, Long, Long)],
      uRaw: Long): Map[Long, Long] =
    edges.groupBy(_._1).map { case (node, es) =>
      val sorted = es.sortBy(_._2)
      val wout = sorted.map(_._3).sum
      val u = uRaw % wout
      var acc = 0L
      val chosen = sorted.find { case (_, _, w) => acc += w; u < acc }.get
      node -> chosen._2
    }

  test("every draw picks exactly one edge, matching the scan reference") {
    val edges: Seq[(Long, Long, Long)] = Seq(
      (1L, 10L, 1L), (1L, 11L, 1L), (1L, 12L, 1L),   // unit weights
      (2L, 10L, 1L), (2L, 11L, 1000000L), (2L, 12L, 1L), // dominant middle
      (3L, 10L, 999999L), (3L, 11L, 1L),             // dominant first
      (4L, 10L, 7L),                                 // single edge
      (5L, 10L, 2L), (5L, 11L, 3L), (5L, 12L, 5L))   // mixed
    val eDf = edges.toDF("c", "sp", "w")
    val wouts = edges.groupBy(_._1).map { case (k, es) => k -> es.map(_._3).sum }
    val maxW = wouts.values.max
    // every boundary draw for every node: 0, each cumulative edge
    // (cw-1, cw), wout-1, wout (wraps to 0), and a raw hash far above
    val cums = edges.groupBy(_._1).values.flatMap { es =>
      es.sortBy(_._2).scanLeft(0L)(_ + _._3).tail
    }
    val draws = (Seq(0L, maxW - 1, maxW, maxW + 12345L) ++
      cums.flatMap(c => Seq(c - 1, c))).distinct.filter(_ >= 0)
    draws.foreach { uRaw =>
      val got = Graph.pick(Graph.cdf(eDf, "c", "sp"), lit(uRaw))
        .select(col("c"), col("sp"))
        .as[(Long, Long)].collect()
      assert(got.map(_._1).distinct.length == got.length &&
        got.length == wouts.size,
        s"draw $uRaw: picked ${got.length} edges for ${wouts.size} nodes: " +
          got.sortBy(_._1).mkString(","))
      val want = reference(edges, uRaw)
      got.foreach { case (node, sp) =>
        assert(want(node) == sp,
          s"draw $uRaw node $node: picked $sp, reference ${want(node)}")
      }
    }
  }

  test("4-hop chain totality: every origin yields exactly one walk end-to-end") {
    // Adversarial bipartite shape: dominant weights, a single-edge node,
    // and a supplier (10) shared by every customer — walks funnel through
    // one hub and MUST still diverge by their (hop, origin, current) seed.
    // The reference replays the inverse-CDF draw in plain JVM code
    // (Text.jvmH32 is the bit-exact twin of the Column h32), alternating
    // c→sp / sp→c direction, so a lost or duplicated walker at ANY hop —
    // the composition bug the single-hop test can't see — fails loudly.
    val edges: Seq[(Long, Long, Long)] = Seq(
      (1L, 10L, 1L), (1L, 11L, 1000000L),
      (2L, 10L, 999999L), (2L, 12L, 1L),
      (3L, 10L, 7L),
      (4L, 10L, 2L), (4L, 11L, 3L), (4L, 12L, 5L))
    val eDf = edges.toDF("c", "sp", "w")
    val fwd = Graph.cdf(eDf, "c", "sp")
    val bwd = Graph.cdf(eDf, "sp", "c")
    def seed(h: Int, origin: org.apache.spark.sql.Column,
        cur: org.apache.spark.sql.Column) =
      graft.core.Text.h32(concat(lit(s"w4h$h-"), origin.cast("string"),
        lit("-"), cur.cast("string")))
    val hop1 = Graph.pick(fwd,
      graft.core.Text.h32(concat(lit("w4h1-"), col("c").cast("string"))))
      .select(col("c").as("origin"), col("sp"))
    val hop2 = Graph.pick(hop1.join(bwd, Seq("sp")),
      seed(2, col("origin"), col("sp")))
      .select(col("origin"), col("c").as("c2"))
    val hop3 = Graph.pick(hop2.join(fwd, col("c") === col("c2")),
      seed(3, col("origin"), col("c2")))
      .select(col("origin"), col("sp").as("sp2"))
    val hop4 = Graph.pick(hop3.join(bwd, col("sp") === col("sp2")),
      seed(4, col("origin"), col("sp2")))
      .select(col("origin"), col("c").as("dest"))

    // in-JVM reference replay of the full chain
    def refPick(byNode: Map[Long, Seq[(Long, Long)]], node: Long,
        s: String): Long = {
      val sorted = byNode(node)
      val wout = sorted.map(_._2).sum
      val u = graft.core.Text.jvmH32(s) % wout
      var acc = 0L
      sorted.find { case (_, w) => acc += w; u < acc }.get._1
    }
    val fwdM = edges.groupBy(_._1).map { case (k, es) =>
      k -> es.sortBy(_._2).map(e => (e._2, e._3)) }
    val bwdM = edges.groupBy(_._2).map { case (k, es) =>
      k -> es.sortBy(_._1).map(e => (e._1, e._3)) }
    val want = edges.map(_._1).distinct.map { o =>
      val s1 = refPick(fwdM, o, s"w4h1-$o")
      val c2 = refPick(bwdM, s1, s"w4h2-$o-$s1")
      val s2 = refPick(fwdM, c2, s"w4h3-$o-$c2")
      o -> refPick(bwdM, s2, s"w4h4-$o-$s2")
    }.toMap

    Seq(hop1, hop2, hop3, hop4).zipWithIndex.foreach { case (h, i) =>
      val n = h.count()
      assert(n == want.size, s"hop ${i + 1}: $n walkers, want ${want.size}")
    }
    val got = hop4.select(col("origin"), col("dest"))
      .as[(Long, Long)].collect().toMap
    assert(got == want, s"4-hop endpoints: got $got, want $want")
  }
}
