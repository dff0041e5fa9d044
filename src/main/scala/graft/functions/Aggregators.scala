package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface: a custom `Aggregator` (the modern replacement
  * for UserDefinedAggregateFunction). The buffer is a pair of exact
  * integer sums, so merge order across partitions cannot perturb the
  * result — the final division is the only floating-point step, making
  * the aggregate deterministic and oracle-comparable.
  */
object Vwap {
  final case class PriceQty(price: Int, qty: Int)
  final case class Sums(notional: Long, volume: Long)

  /** Volume-weighted average price: Σ(price·qty) / Σ(qty). */
  val agg: Aggregator[PriceQty, Sums, Double] =
    new Aggregator[PriceQty, Sums, Double] {
      override def zero: Sums = Sums(0L, 0L)
      override def reduce(b: Sums, a: PriceQty): Sums =
        Sums(b.notional + a.price.toLong * a.qty, b.volume + a.qty)
      override def merge(x: Sums, y: Sums): Sums =
        Sums(x.notional + y.notional, x.volume + y.volume)
      override def finish(r: Sums): Double =
        if (r.volume == 0) Double.NaN else r.notional.toDouble / r.volume
      override def bufferEncoder: Encoder[Sums] = Encoders.product[Sums]
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
}
