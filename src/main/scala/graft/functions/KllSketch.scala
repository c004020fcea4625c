package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KLL item buffer: parallel (value, level) arrays with `used` slots
  * occupied (the arrays carry doubling-growth slack so reduce() appends
  * in place instead of copying per row — the MgBuf discipline at a
  * larger k). `n` is the exact item count, `err` the CERTIFIED
  * worst-case rank-error bound accumulated so far (+2^h per level-h
  * compaction — see [[KllSketch]]), `par` a per-level parity bitmask
  * driving the deterministic alternating compaction selector.
  */
final case class KllBuf(
    vs: Array[Double], hs: Array[Int], used: Int,
    n: Long, err: Long, par: Long)

/** Finished summary: items sorted by value with their weights (2^level),
  * plus the certified rank bound `err`, the largest single weight `maxw`
  * (the selection slack a quantile query adds on top of `err`), and the
  * exact count `n` (Σ ws == n — weight is conserved exactly because an
  * odd compaction input leaves its maximum behind at the same level).
  */
final case class KllSummary(
    vs: Array[Double], ws: Array[Long], err: Long, maxw: Long, n: Long)

/** Mergeable rank/quantile sketch — the fourth custom typed Aggregator
  * next to BottomKByHash / HLL-union / Misra-Gries, filling the gap the
  * sketch family had: `hist_quantiles` bounds error by a FIXED BIN WIDTH
  * over a known value range, while this bounds RANK error over any
  * real-valued stream with no range assumption.
  *
  * Design: the KLL compactor hierarchy (Karnin-Lang-Liberty, FOCS 2016)
  * with a DETERMINISTIC alternating selector instead of coin flips.
  * Items live at levels with weight 2^level; when level h exceeds its
  * capacity, its values are sorted and every other one (starting at the
  * level's parity bit, which flips each compaction) is promoted to
  * level h+1 — an odd leftover stays behind, so total weight is
  * conserved EXACTLY and the tracked `n` always equals Σ weights.
  * Capacities decay geometrically from k at the top level by 2/3 per
  * level down (floor 8), the KLL schedule that concentrates capacity
  * where item weights are largest.
  *
  * Why deterministic: Spark merges partial buffers in shuffle-arrival
  * order, so a randomized sketch would make the QUERY OUTPUT
  * nondeterministic. The alternating selector keeps every run's output
  * a pure function of (input partition contents, merge tree), and —
  * crucially — the error CERTIFICATE below holds for ANY merge tree.
  *
  * The certificate: one level-h compaction changes the estimated rank
  * of any threshold t by at most 2^h (of the 2m compacted items, c are
  * ≤ t; the kept ⌊c/2⌋ or ⌈c/2⌉ at double weight reconstruct c·2^h
  * within ±2^h). `err` accumulates exactly +2^h per compaction, so
  * after any reduce/merge history, for EVERY threshold t:
  *
  *     |estRank(t) − trueRank(t)| ≤ err        (estRank = Σ ws | v ≤ t)
  *
  * This is a per-run self-certifying bound — no distributional or
  * merge-order assumption — which is what lets the `kll_quantiles`
  * query emit oracle-checkable certified booleans (the cms_freq_bound
  * tolerance-contract pattern) and the property spec hunt for
  * violations on adversarial inputs. For the quantile SELECTION rule
  * (smallest summary value whose cumulative weight reaches the target
  * rank t = ⌈p·n⌉), the two-sided tie-safe contract follows directly:
  * lower, trueRank≤(v) ≥ estRank≤(v) − err ≥ t − err; upper, every
  * summary entry with value < v precedes the selected entry so
  * estRank<(v) < t, hence trueRank<(v) ≤ t − 1 + err. (`maxw`, the
  * largest single weight, is reported for rank-window consumers.)
  *
  * Growth: deterministic compaction pays a log factor over the
  * randomized KLL's O(1/k) — err accumulates +2^h per level-h
  * compaction, ≈ 2n/k per level across ~log2(n/k) levels. Notably the
  * bound is DATA-INDEPENDENT (a pure function of n and the merge tree;
  * sorted and pseudo-random streams measure identical err), so the
  * query-level tightness gate is stable across fixture regenerations.
  * Measured at the k = 1024 / floor = 256 default: ε ≈ 0.9% at
  * n = 2·10^5, 1.6% at 2·10^6, extrapolating ~+0.7 pp per decade to
  * ~5% at n = 10^12 — tighten with k (ε ∝ 1/k, buffer ∝ k) when a
  * 100 TB pipeline needs sub-percent certified ranks.
  *
  * At 100 TB: the shuffle carries the ~k·log(n/k)-item buffer per
  * partition — tens of KB — instead of the full value column; partial
  * aggregation is map-side (ObjectHashAggregate), and the merge is
  * associative under the certificate, so arbitrary executor trees work.
  */
final class KllSketch(k: Int = 1024, floor: Int = 256)
    extends Aggregator[Double, KllBuf, KllSummary] {
  require(k >= 16, "k >= 16 (error is ~log(n/k)/k; tiny k certifies nothing)")
  require(floor >= 4 && floor <= k)

  /** Capacity of level h when the top occupied level is `top`:
    * k·(2/3)^(top−h), floored at `floor`. The floor trades buffer size
    * for certified error: low levels are where compactions are cheapest
    * (weight 2^h small) but most FREQUENT, and their count scales with
    * the items flowing through ~ n/(2^h·cap), so raising the floor cuts
    * the dominant error terms linearly (measured in KllPropertySpec's
    * tightness gate) at the cost of `floor` extra buffered items per
    * level.
    */
  private def capOf(h: Int, top: Int): Int = {
    var c = k.toDouble
    var i = top - h
    while (i > 0 && c > floor) { c = c * 2.0 / 3.0; i -= 1 }
    math.max(floor, math.ceil(c).toInt)
  }

  override def zero: KllBuf =
    KllBuf(new Array[Double](64), new Array[Int](64), 0, 0L, 0L, 0L)

  /** Append one item in place (arrays double when full — amortized O(1)
    * per row, vs O(buffer) for the naive :+).
    */
  private def appended(b: KllBuf, x: Double, h: Int): KllBuf = {
    val bb =
      if (b.used < b.vs.length) b
      else {
        val nv = new Array[Double](b.vs.length * 2)
        val nh = new Array[Int](b.hs.length * 2)
        System.arraycopy(b.vs, 0, nv, 0, b.used)
        System.arraycopy(b.hs, 0, nh, 0, b.used)
        b.copy(vs = nv, hs = nh)
      }
    bb.vs(bb.used) = x
    bb.hs(bb.used) = h
    bb.copy(used = bb.used + 1)
  }

  /** Compact every over-capacity level, lowest first, until all levels
    * fit. Each level-h pass: sort that level's values, promote the
    * parity-selected half of an even prefix to h+1 (odd leftover = the
    * max stays at h), err += 2^h, flip the level's parity bit.
    */
  private def compacted(b0: KllBuf): KllBuf = {
    var b = b0
    var again = true
    while (again) {
      again = false
      var top = 0
      var i = 0
      while (i < b.used) { if (b.hs(i) > top) top = b.hs(i); i += 1 }
      // lowest over-capacity level, if any
      var h = -1
      var lvl = 0
      while (h < 0 && lvl <= top) {
        var c = 0
        var j = 0
        while (j < b.used) { if (b.hs(j) == lvl) c += 1; j += 1 }
        if (c >= capOf(lvl, top)) h = lvl else lvl += 1
      }
      if (h >= 0) {
        val level = new scala.collection.mutable.ArrayBuffer[Double]
        val keepV = new scala.collection.mutable.ArrayBuffer[Double]
        val keepH = new scala.collection.mutable.ArrayBuffer[Int]
        var j = 0
        while (j < b.used) {
          if (b.hs(j) == h) level += b.vs(j)
          else { keepV += b.vs(j); keepH += b.hs(j) }
          j += 1
        }
        val xs = level.toArray
        java.util.Arrays.sort(xs)
        val m2 = xs.length - (xs.length & 1)
        val start = ((b.par >> h) & 1L).toInt
        var i2 = start
        while (i2 < m2) { keepV += xs(i2); keepH += h + 1; i2 += 2 }
        if (m2 < xs.length) { keepV += xs(xs.length - 1); keepH += h }
        b = KllBuf(keepV.toArray, keepH.toArray, keepV.length,
          b.n, b.err + (1L << h), b.par ^ (1L << h))
        again = true
      }
    }
    b
  }

  override def reduce(b: KllBuf, x: Double): KllBuf = {
    val a = appended(b, x, 0).copy(n = b.n + 1)
    // compact only when level 0 is over its weakest-case capacity — the
    // full per-level scan in compacted() then runs rarely, not per row
    var c0 = 0
    var i = 0
    while (i < a.used) { if (a.hs(i) == 0) c0 += 1; i += 1 }
    if (c0 >= floor && c0 >= capOf(0, { var t = 0; var j = 0
        while (j < a.used) { if (a.hs(j) > t) t = a.hs(j); j += 1 }; t }))
      compacted(a)
    else a
  }

  override def merge(a: KllBuf, b: KllBuf): KllBuf = {
    if (a.used == 0 && a.n == 0) return b
    if (b.used == 0 && b.n == 0) return a
    val vs = new Array[Double](a.used + b.used)
    val hs = new Array[Int](a.used + b.used)
    System.arraycopy(a.vs, 0, vs, 0, a.used)
    System.arraycopy(b.vs, 0, vs, a.used, b.used)
    System.arraycopy(a.hs, 0, hs, 0, a.used)
    System.arraycopy(b.hs, 0, hs, a.used, b.used)
    compacted(KllBuf(vs, hs, a.used + b.used,
      a.n + b.n, a.err + b.err, a.par ^ b.par))
  }

  override def finish(b: KllBuf): KllSummary = {
    val idx = Array.range(0, b.used)
      .sortBy(i => (b.vs(i), b.hs(i)))
    val vs = idx.map(b.vs)
    val ws = idx.map(i => 1L << b.hs(i))
    KllSummary(vs, ws, b.err, if (ws.isEmpty) 0L else ws.max, b.n)
  }

  override def bufferEncoder: Encoder[KllBuf] = Encoders.product[KllBuf]
  override def outputEncoder: Encoder[KllSummary] =
    Encoders.product[KllSummary]
}

object KllSketch {
  /** Smallest summary value whose cumulative weight reaches ⌈p·n⌉ —
    * the selection rule both the batch query and the streaming
    * processor use (and whose slack is `maxw` in the certificate).
    */
  def quantile(s: KllSummary, p: Double): Double = {
    val target = math.ceil(p * s.n).toLong.max(1L)
    var cum = 0L
    var i = 0
    while (i < s.vs.length) {
      cum += s.ws(i)
      if (cum >= target) return s.vs(i)
      i += 1
    }
    if (s.vs.isEmpty) Double.NaN else s.vs(s.vs.length - 1)
  }

  /** Rebuild a compactor buffer from a finished summary: weights are
    * powers of two by construction, so level = log2(weight) recovers the
    * hierarchy exactly and a re-imported summary keeps participating in
    * compaction with the correct per-item weights. `par` restarts at 0 —
    * parity only steers WHICH alternate half survives, never the
    * certificate.
    */
  def bufOf(s: KllSummary): KllBuf = {
    val hs = new Array[Int](s.vs.length)
    var i = 0
    while (i < hs.length) {
      hs(i) = 63 - java.lang.Long.numberOfLeadingZeros(s.ws(i))
      i += 1
    }
    KllBuf(s.vs.clone(), hs, s.vs.length, s.n, s.err, 0L)
  }
}

/** Second-stage re-aggregation of FINISHED summaries — what makes the
  * sketch a true mergeable summary in the Agarwal et al. (PODS 2012)
  * sense at the API level, not just inside one aggregation: per-shard /
  * per-day sketches can be materialized (a KllSummary is a plain struct
  * of array/long columns, parquet-storable like the dedup bucket store),
  * then combined later by this Aggregator without touching raw data —
  * the incremental-percentile-maintenance pattern `kll_grouped_merge`
  * registers and certifies. The certificate composes: a merged buffer's
  * `err` is the SUM of the partials' errs plus any new compactions, and
  * the rank guarantee holds because each partial's guarantee holds for
  * its sub-stream and compaction error is additive across any tree.
  */
final class KllMerge(k: Int = 1024, floor: Int = 256)
    extends Aggregator[KllSummary, KllBuf, KllSummary] {
  private val sk = new KllSketch(k, floor)
  override def zero: KllBuf = sk.zero
  override def reduce(b: KllBuf, s: KllSummary): KllBuf =
    sk.merge(b, KllSketch.bufOf(s))
  override def merge(a: KllBuf, b: KllBuf): KllBuf = sk.merge(a, b)
  override def finish(b: KllBuf): KllSummary = sk.finish(b)
  override def bufferEncoder: Encoder[KllBuf] = Encoders.product[KllBuf]
  override def outputEncoder: Encoder[KllSummary] =
    Encoders.product[KllSummary]
}
