package graft

import graft.ops.Learn
import org.apache.spark.sql.functions._

/** Property checks for the round-14 preference/evaluation family — the
  * exact candidate machinery rule (round 9): matchup canonicalization
  * gets PLANTED adversarial inputs (ties, transitive triples,
  * cross-order aggregation) that the fixtures don't guarantee, and the
  * fixture-driven queries get invariant sweeps at sf0.001.
  */
class PreferencePropertySpec extends SparkSpec {
  import spark.implicits._

  test("matchupPairs: tie goes to the lower suppkey, pairs are canonical i<j") {
    // order 1: exact tie (5 vs 9) → i=5 wins; order 2: reversed arrival
    // order must not matter (aggregation is over (ok, sk) totals)
    val osr = Seq((1L, 9L, 400L), (1L, 5L, 400L), (2L, 9L, 700L),
      (2L, 5L, 100L)).toDF("ok", "sk", "rev")
    val got = Learn.matchupPairs(osr)
      .as[(Long, Long, Long, Long)].collect().toSet
    // pair (5, 9): 2 games; order 1 tie → 5 wins; order 2 → 9 wins
    assert(got === Set((5L, 9L, 2L, 1L)), s"got $got")
  }

  test("matchupPairs: 3-supplier order expands to exactly its 3 canonical pairs") {
    val osr = Seq((1L, 3L, 300L), (1L, 1L, 100L), (1L, 2L, 200L))
      .toDF("ok", "sk", "rev")
    val got = Learn.matchupPairs(osr)
      .as[(Long, Long, Long, Long)].collect().toSet
    // rev 3 > 2 > 1: i wins iff rev_i >= rev_j under i<j
    assert(got === Set((1L, 2L, 1L, 0L), (1L, 3L, 1L, 0L), (2L, 3L, 1L, 0L)),
      s"got $got")
  }

  test("matchupPairs: single-supplier orders contribute no pairs") {
    val osr = Seq((1L, 7L, 100L), (2L, 7L, 200L)).toDF("ok", "sk", "rev")
    assert(Learn.matchupPairs(osr).count() === 0L)
  }

  test("bradley_terry invariants at sf0.001: normalization, win conservation, spread") {
    val rows = Learn.bradleyTerry.fn(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // every game is counted once per side and has exactly one winner
    assert(rows.map(_._3).sum === rows.map(_._2).sum / 2,
      "sum(wins) != sum(games)/2")
    // strengths positive and sum-normalized to |S| * 1e6 (integer floor
    // drops at most 1 unit per player)
    val tot = rows.map(_._4).sum
    assert(rows.forall(_._4 > 0L))
    assert(math.abs(tot - rows.length * 1000000L) <= rows.length,
      s"normalization drifted: $tot vs ${rows.length * 1000000L}")
    // the MM produced real discrimination, not a fixed point at uniform
    assert(rows.map(_._4).max > rows.map(_._4).min,
      "degenerate uniform strengths")
  }

  test("win_rate_matrix invariants at sf0.001: Wilson bound below the estimate") {
    val rows = Learn.winRateMatrix.fn(spark, sfDir)
      .as[(Long, Long, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (i, j, n, wi, phat, lo) =>
      assert(i < j, s"non-canonical pair ($i, $j)")
      assert(wi >= 0L && wi <= n)
      assert(lo <= phat + 1e-9, s"Wilson lower bound $lo above phat $phat")
      assert(lo >= -1e-9 && lo <= 1.0 + 1e-9, s"bound $lo outside [0, 1]")
    }
    // ordered by games desc (ties by (i, j)): the top-k rank selection rule
    val ns = rows.map(_._3)
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, "not n-desc")
  }

  test("preference_pairs invariants at sf0.001: margins, verdicts, tie discipline") {
    val rows = Learn.preferencePairs.fn(spark, sfDir)
      .as[(Long, Long, Long, Long, Double, Double, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach {
      case (cid, nm, chosen, rejected, qc, qr, mu, usable) =>
        assert(nm >= 2L, s"cluster $cid paired with < 2 scored members")
        assert(chosen != rejected, s"cluster $cid chose itself")
        assert(qc >= qr, s"cluster $cid: q_chosen $qc < q_rejected $qr")
        assert(mu === math.floor((qc - qr) * 1e4 + 0.5).toLong,
          s"cluster $cid margin quantization drifted")
        assert(usable === (mu >= 500L), s"cluster $cid usable verdict wrong")
        // equal-quality cluster: tie rule gives chosen the LOWER doc_id
        if (mu == 0L)
          assert(chosen < rejected,
            s"cluster $cid tie-break violated: chosen $chosen rejected $rejected")
    }
    assert(rows.exists(_._8), "no usable pair at sf0.001 — vacuous margin cut")
    assert(rows.exists(!_._8), "every pair usable — cut not discriminating")
  }
}
