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
}
