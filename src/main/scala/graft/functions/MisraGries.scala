package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries counter buffer: parallel arrays (term, weight), ≤ k
  * entries, no order invariant (k is small; lookups are linear scans).
  * A case class of primitive/string arrays so the partial-aggregation
  * buffer serializes as plain ArrayType columns.
  */
final case class MgBuf(terms: Array[String], ws: Array[Long])

/** Misra-Gries heavy-hitter sketch as a mergeable typed Aggregator —
  * the pass-1 candidate generator of a 2-pass exact heavy-hitter query.
  *
  * Why a sketch at all: the exact formulation (groupBy(term) over every
  * token, then HAVING) shuffles the FULL vocabulary. At 100 TB the token
  * vocabulary is billions of keys; this Aggregator reduces inside each
  * partition to ≤ k counters and merges partials pairwise, so the
  * shuffle carries k (term, weight) pairs PER PARTITION — constant, not
  * vocabulary-sized. The classic guarantee (Misra-Gries 1982; merge rule
  * from Agarwal et al., "Mergeable Summaries", PODS 2012): any term with
  * true count > N/(k+1) is GUARANTEED to survive in the sketch, under
  * arbitrary merge trees — so pass 2 (exact counts of the ≤ k surviving
  * candidates only, a broadcast semi-join) makes the final result exact
  * and merge-order-independent: precisely the terms with
  * count·(k+1) > N, which is what the DuckDB oracle computes directly.
  *
  * reduce: +1 to a present term, insert if room, else decrement ALL
  * (the k-way eviction). merge: sum weights; if over k entries, subtract
  * the (k+1)-th largest weight from all and drop non-positives. Both
  * O(k); the buffer never exceeds k entries.
  */
final class MisraGries(k: Int)
    extends Aggregator[String, MgBuf, Array[String]] {
  require(k > 0)

  override def zero: MgBuf =
    MgBuf(Array.empty[String], Array.emptyLongArray)

  override def reduce(b: MgBuf, term: String): MgBuf = {
    var i = 0
    while (i < b.terms.length && b.terms(i) != term) i += 1
    if (i < b.terms.length) { b.ws(i) += 1; b }
    else if (b.terms.length < k)
      MgBuf(b.terms :+ term, b.ws :+ 1L)
    else {
      // full and absent: decrement every counter, drop zeros (the new
      // term's +1 and the global -1 cancel — it is not inserted)
      var nz = 0
      var j = 0
      while (j < k) { if (b.ws(j) > 1) nz += 1; j += 1 }
      val ts = new Array[String](nz); val ws = new Array[Long](nz)
      var o = 0; j = 0
      while (j < k) {
        if (b.ws(j) > 1) { ts(o) = b.terms(j); ws(o) = b.ws(j) - 1; o += 1 }
        j += 1
      }
      MgBuf(ts, ws)
    }
  }

  override def merge(a: MgBuf, b: MgBuf): MgBuf = {
    if (a.terms.isEmpty) return b
    if (b.terms.isEmpty) return a
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    var i = 0
    while (i < a.terms.length) { m.update(a.terms(i), a.ws(i)); i += 1 }
    i = 0
    while (i < b.terms.length) {
      m.update(b.terms(i), m.getOrElse(b.terms(i), 0L) + b.ws(i)); i += 1
    }
    if (m.size <= k) MgBuf(m.keys.toArray, m.values.toArray)
    else {
      // subtract the (k+1)-th largest weight from all, keep positives:
      // at most k survive, and the summed-undercount bound telescopes
      val pivot = m.values.toArray.sortWith(_ > _).apply(k)
      val kept = m.iterator.map { case (t, w) => (t, w - pivot) }
        .filter(_._2 > 0).toArray
      MgBuf(kept.map(_._1), kept.map(_._2))
    }
  }

  /** Candidate terms, sorted for deterministic downstream plans. */
  override def finish(b: MgBuf): Array[String] = b.terms.sorted

  override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
  override def outputEncoder: Encoder[Array[String]] =
    ExpressionEncoder[Array[String]]()
}
