package graft.functions

import graft.core.Text
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-min sketch buffer: depth × width counter matrix flattened to one
  * long array (row r occupies [r·width, (r+1)·width)) so the partial-
  * aggregation buffer serializes as a single ArrayType column.
  */
final case class CmsBuf(cells: Array[Long])

/** Count-min sketch (Cormode & Muthukrishnan 2005) as a mergeable typed
  * Aggregator — the frequency-estimation companion to [[MisraGries]]:
  * where MG keeps ≤ k candidate COUNTERS, CMS answers point-frequency
  * queries for ANY key from a CONSTANT-size matrix. reduce increments one
  * cell per row (pairwise-independent row hashes); merge is elementwise
  * addition, so partials combine under any merge tree and the shuffle
  * carries depth·width longs per partition — constant, never
  * vocabulary-sized. Estimates are biased UP only (est ≥ true always;
  * est ≤ true + ε·N with ε ≈ e/width, failure prob e^-depth per key —
  * the classic bound), which is what the paired query certifies.
  *
  * The row hash reuses the cross-engine md5-prefix primitive
  * ([[Text.jvmH32]]) composed with the (a·h + b) mod P family from the
  * MinHash constants — so a Catalyst Column expression ([[Text.h32]] +
  * integer ops) can address the SAME cells when probing the finished
  * sketch in-plan, without a UDF on the query side.
  */
final class CountMin(depth: Int, width: Int)
    extends Aggregator[String, CmsBuf, Array[Long]] {
  require(depth > 0 && depth <= CountMin.A.length && width > 0)

  override def zero: CmsBuf = CmsBuf(new Array[Long](depth * width))

  override def reduce(b: CmsBuf, item: String): CmsBuf = {
    val h = Text.jvmH32(item)
    var r = 0
    while (r < depth) {
      b.cells(r * width + CountMin.slot(h, r, width)) += 1L
      r += 1
    }
    b
  }

  override def merge(a: CmsBuf, b: CmsBuf): CmsBuf = {
    var i = 0
    while (i < a.cells.length) { a.cells(i) += b.cells(i); i += 1 }
    a
  }

  override def finish(b: CmsBuf): Array[Long] = b.cells
  override def bufferEncoder: Encoder[CmsBuf] = Encoders.product[CmsBuf]
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

object CountMin {
  /** Row-hash coefficients: first 4 MinHash primes / the 7r+1 offsets —
    * fixed constants shared with the Column-side probe expression.
    */
  val A: Array[Long] = Array(3L, 5L, 7L, 11L)
  def B(r: Int): Long = 7L * r + 1L

  /** Cell index of 32-bit hash `h` in row `r`: ((a·h + b) mod P) mod w.
    * a·h < 11·2³² so the product never overflows a long.
    */
  def slot(h: Long, r: Int, width: Int): Int =
    (((A(r) * h + B(r)) % Text.P) % width).toInt
}
