package graft

import graft.functions.{KllSketch, KllBuf, KllSummary}
import org.scalatest.funsuite.AnyFunSuite

/** Bound-violation hunt for the deterministic KLL sketch — the trio
  * pattern (Ppjoin/Simhash/Cc property specs) applied to the rank
  * certificate: fixtures never produce adversarial value orders, so this
  * drives the Aggregator directly (no Spark session) with sorted,
  * reversed, constant, two-cluster, sawtooth and LCG streams, splits
  * them into partitions merged under THREE different merge trees, and
  * checks the self-certified contract at every percentile:
  *
  *   Σ ws == n  (weight conservation — the odd-leftover rule)
  *   the tie-safe selection contract for all p:
  *     count(x ≤ v_p) ≥ ⌈p·n⌉ − err  and  count(x < v_p) ≤ ⌈p·n⌉ − 1 + err
  *   and |estRank(t) − trueRank(t)| ≤ err at arbitrary thresholds t.
  *
  * The certificate must hold for ANY merge tree (err accumulates per
  * compaction, whichever history produced it) — that is what makes the
  * sketch safe under Spark's nondeterministic shuffle-arrival merges.
  * Tightness (err growth ~ log(n/k)/k) is asserted at the largest n so
  * a schedule regression (e.g. a capacity bug causing per-row
  * compaction) fails loudly instead of silently certifying a vacuous
  * bound.
  */
class KllPropertySpec extends AnyFunSuite {

  private val K = 1024

  private def lcg(n: Int): Array[Double] = {
    var s = 0x2545F4914F6CDD1DL
    Array.fill(n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 11).toDouble / (1L << 53).toDouble) * 1000.0
    }
  }

  private def streams(n: Int): Seq[(String, Array[Double])] = Seq(
    "sorted" -> Array.tabulate(n)(_.toDouble),
    "reversed" -> Array.tabulate(n)(i => (n - i).toDouble),
    "constant" -> Array.fill(n)(42.0),
    "two-cluster" -> Array.tabulate(n)(i =>
      if (i % 2 == 0) i.toDouble else 1e6 + i),
    "sawtooth" -> Array.tabulate(n)(i => (i % 97).toDouble),
    "lcg" -> lcg(n))

  /** Reduce xs into per-chunk partials, then merge under the given tree. */
  private def build(sk: KllSketch, xs: Array[Double], chunks: Int,
      tree: String): KllBuf = {
    val parts = xs.grouped(math.max(1, xs.length / chunks)).toArray
      .map(_.foldLeft(sk.zero)(sk.reduce))
    tree match {
      case "left" => parts.reduceLeft(sk.merge)
      case "right" => parts.reduceRight(sk.merge)
      case _ => // balanced
        var layer = parts
        while (layer.length > 1)
          layer = layer.grouped(2).map(g =>
            if (g.length == 2) sk.merge(g(0), g(1)) else g(0)).toArray
        layer(0)
    }
  }

  private def check(name: String, xs: Array[Double], s: KllSummary): Unit = {
    val n = xs.length.toLong
    assert(s.n == n, s"$name: n")
    assert(s.ws.sum == n, s"$name: weight conservation")
    val sorted = xs.sorted
    def trueRank(t: Double): Long = {
      // count of values <= t via binary search on the sorted copy
      var lo = 0; var hi = sorted.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (sorted(mid) <= t) lo = mid + 1 else hi = mid
      }
      lo.toLong
    }
    def trueRankLt(t: Double): Long = {
      var lo = 0; var hi = sorted.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (sorted(mid) < t) lo = mid + 1 else hi = mid
      }
      lo.toLong
    }
    // tie-safe quantile-selection contract at every percentile
    (1 to 99).foreach { pc =>
      val p = pc / 100.0
      val v = KllSketch.quantile(s, p)
      val target = math.ceil(p * n).toLong.max(1L)
      assert(trueRank(v) >= target - s.err,
        s"$name p=$p: rankLe=${trueRank(v)} target=$target err=${s.err}")
      assert(trueRankLt(v) <= target - 1 + s.err,
        s"$name p=$p: rankLt=${trueRankLt(v)} target=$target err=${s.err}")
    }
    // raw estRank contract at arbitrary thresholds (incl. off-sample)
    val probes = Seq(sorted(0) - 1, sorted(n.toInt / 3), sorted(n.toInt / 2),
      (sorted(0) + sorted(n.toInt - 1)) / 2, sorted(n.toInt - 1) + 1)
    probes.foreach { t =>
      var est = 0L; var i = 0
      while (i < s.vs.length) { if (s.vs(i) <= t) est += s.ws(i); i += 1 }
      assert(math.abs(est - trueRank(t)) <= s.err,
        s"$name estRank($t): est=$est true=${trueRank(t)} err=${s.err}")
    }
  }

  test("certificate holds on adversarial streams under all merge trees") {
    val sk = new KllSketch(K)
    for {
      n <- Seq(100, 5000, 60000)
      (name, xs) <- streams(n)
      tree <- Seq("left", "right", "balanced")
    } check(s"$name/n=$n/$tree", xs, sk.finish(build(sk, xs, 16, tree)))
  }

  test("certified bound stays tight: err <= 2.5% of n at n = 200k") {
    val sk = new KllSketch(K)
    streams(200000).foreach { case (name, xs) =>
      val s = sk.finish(build(sk, xs, 32, "balanced"))
      check(name, xs, s)
      assert(s.err * 40L <= s.n,
        s"$name: err=${s.err} n=${s.n} — bound not tight (schedule regression?)")
    }
  }

  test("KllMerge: finished summaries re-imported via bufOf keep the certificate") {
    val sk = new KllSketch(K)
    val mg = new graft.functions.KllMerge(K)
    streams(60000).foreach { case (name, xs) =>
      // 8 shard summaries (each its own full sketch), merged as SUMMARIES
      val summaries = xs.grouped(xs.length / 8 + 1).toSeq
        .map(chunk => sk.finish(chunk.foldLeft(sk.zero)(sk.reduce)))
      val merged = mg.finish(summaries.foldLeft(mg.zero)(mg.reduce))
      check(s"merge/$name", xs, merged)
      // the merged err composes additively: at least the partials' sum
      assert(merged.err >= summaries.map(_.err).max,
        s"merge/$name: err ${merged.err} lost partial certificates")
    }
  }

  test("small inputs are exact (no compaction below capacity)") {
    val sk = new KllSketch(K)
    val xs = lcg(64)
    val s = sk.finish(xs.foldLeft(sk.zero)(sk.reduce))
    assert(s.err == 0L && s.maxw == 1L)
    val sorted = xs.sorted
    (1 to 99).foreach { pc =>
      val p = pc / 100.0
      val exact = sorted((math.ceil(p * xs.length) - 1).toInt.max(0))
      assert(KllSketch.quantile(s, p) == exact, s"p=$p")
    }
  }
}
