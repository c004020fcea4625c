package graft.ops

import graft.core.{QueryDef, Tables}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The typed `Dataset[T]` surface (brief: "use Dataset[T] with
  * case-class Encoders where type safety helps").
  *
  * Deliberate hybrid: the row filter stays a COLUMN expression — a typed
  * lambda filter (`_.l_quantity <= 25`) is opaque to Catalyst, so it
  * would kill predicate pushdown and column pruning at the scan; the
  * aggregation is a typed mergeable [[Aggregator]] over the case class —
  * partial aggregation still collapses each partition to one buffer per
  * group before the shuffle, exactly like a built-in agg. Type safety
  * where it pays (the aggregate's state machine), Catalyst visibility
  * where it matters (the scan).
  */
object Typed {

  /** The projected lineitem row the typed pipeline works on. */
  final case class Li(l_returnflag: String, l_quantity: Double,
      l_extendedprice: Double)

  /** Exact-decimal sum + count + max, one typed buffer per group.
    * Cents as Long: 2-dp inputs scale exactly, sums are associative
    * integer adds (order-independent — double sums are not), and the
    * final divide by 100 is exact for the same reason Num.dsum is.
    */
  final case class PriceBuf(cents: Long, n: Long, maxCents: Long)

  final class PriceStats
      extends Aggregator[Li, PriceBuf, (Double, Long, Double)] {
    override def zero: PriceBuf = PriceBuf(0L, 0L, Long.MinValue)
    override def reduce(b: PriceBuf, r: Li): PriceBuf = {
      val c = math.round(r.l_extendedprice * 100.0)
      PriceBuf(b.cents + c, b.n + 1, math.max(b.maxCents, c))
    }
    override def merge(a: PriceBuf, b: PriceBuf): PriceBuf =
      PriceBuf(a.cents + b.cents, a.n + b.n, math.max(a.maxCents, b.maxCents))
    override def finish(b: PriceBuf): (Double, Long, Double) =
      (b.cents / 100.0, b.n, b.maxCents / 100.0)
    override def bufferEncoder: Encoder[PriceBuf] = Encoders.product[PriceBuf]
    override def outputEncoder: Encoder[(Double, Long, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong,
        Encoders.scalaDouble)
  }

  val typedPipeline: QueryDef = QueryDef(
    "typed_pipeline",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        // Column filter BEFORE going typed: reaches the parquet scan
        .filter(col("l_quantity").between(1, 25))
        .select(col("l_returnflag"), col("l_quantity"),
          col("l_extendedprice"))
        .as[Li]
        .groupByKey(_.l_returnflag)
        .agg(new PriceStats().toColumn.name("stats"))
        .select(col("key").as("l_returnflag"),
          col("stats._1").as("sum_price"),
          col("stats._2").as("n_items"),
          col("stats._3").as("max_price"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      SELECT l_returnflag,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
             count(*) AS n_items,
             max(l_extendedprice) AS max_price
      FROM lineitem WHERE l_quantity BETWEEN 1 AND 25
      GROUP BY 1 ORDER BY 1
    """),
    doc = "typed Dataset pipeline: case-class rows + mergeable Aggregator, column filter kept for pushdown")

  val all: Seq[QueryDef] = Seq(typedPipeline)
}
