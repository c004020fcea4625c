package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded sorted sample buffer: parallel arrays (hash, id), ascending
  * by (hash, id), length ≤ k. A case class of primitive arrays so the
  * partial-aggregation buffer serializes as two ArrayType(LongType)
  * columns — no Kryo/java serialization in the shuffle.
  */
final case class ResBuf(hs: Array[Long], ids: Array[Long])

/** Deterministic "reservoir" sample as a mergeable typed Aggregator:
  * bottom-k ids by the 32-bit md5-prefix hash (bit-identical to
  * `graft.core.Text.h32` / the DuckDB `sqlH32` fragment, so the sample
  * is reproducible run-over-run AND engine-independent — the property
  * `rand()` reservoirs cannot give).
  *
  * Mergeability is the point of the exercise: Spark drives `reduce`
  * inside each input partition and `merge` on the partials, so the
  * shuffle carries at most k (hash, id) pairs PER PARTITION per group,
  * while the WindowGroupLimit formulation (`stratified_sample`) must
  * shuffle every row of every group before ranking. At 100 TB with
  * millions of rows per stratum that is a k·P-row exchange versus a
  * corpus-sized one. Both insert and merge are O(k) array merges.
  */
final class BottomKByHash(k: Int)
    extends Aggregator[Long, ResBuf, Array[Long]] {
  require(k > 0)

  /** [[graft.core.Text.jvmH32]] of the id's decimal string — exactly
    * `conv(substr(md5(CAST(id AS STRING)), 1, 8), 16, 10)`.
    */
  private def h32(id: Long): Long =
    graft.core.Text.jvmH32(java.lang.Long.toString(id))

  override def zero: ResBuf =
    ResBuf(Array.emptyLongArray, Array.emptyLongArray)

  override def reduce(b: ResBuf, id: Long): ResBuf = {
    val h = h32(id)
    val n = b.hs.length
    // common case first: buffer full and the new element sorts after it
    if (n == k && { val c = java.lang.Long.compare(h, b.hs(n - 1))
        c > 0 || (c == 0 && id > b.ids(n - 1)) }) return b
    var i = 0
    while (i < n && { val c = java.lang.Long.compare(b.hs(i), h)
        c < 0 || (c == 0 && b.ids(i) < id) }) i += 1
    val m = math.min(n + 1, k)
    val hs = new Array[Long](m); val ids = new Array[Long](m)
    System.arraycopy(b.hs, 0, hs, 0, i)
    System.arraycopy(b.ids, 0, ids, 0, i)
    hs(i) = h; ids(i) = id
    val rest = m - i - 1
    if (rest > 0) {
      System.arraycopy(b.hs, i, hs, i + 1, rest)
      System.arraycopy(b.ids, i, ids, i + 1, rest)
    }
    ResBuf(hs, ids)
  }

  override def merge(a: ResBuf, b: ResBuf): ResBuf = {
    if (a.hs.isEmpty) return b
    if (b.hs.isEmpty) return a
    val m = math.min(a.hs.length + b.hs.length, k)
    val hs = new Array[Long](m); val ids = new Array[Long](m)
    var i = 0; var j = 0; var o = 0
    while (o < m) {
      val takeA = j >= b.hs.length || (i < a.hs.length && {
        val c = java.lang.Long.compare(a.hs(i), b.hs(j))
        c < 0 || (c == 0 && a.ids(i) <= b.ids(j))
      })
      if (takeA) { hs(o) = a.hs(i); ids(o) = a.ids(i); i += 1 }
      else { hs(o) = b.hs(j); ids(o) = b.ids(j); j += 1 }
      o += 1
    }
    ResBuf(hs, ids)
  }

  /** Sampled ids, ascending by (hash, id) — rank order of the sample. */
  override def finish(b: ResBuf): Array[Long] = b.ids

  override def bufferEncoder: Encoder[ResBuf] = Encoders.product[ResBuf]
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
