package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregates (the `Aggregator` extension point — SURVEY §7.4's
  * "custom aggregates become relevant" case).
  *
  * The engine's rule stands: built-in functions first (they codegen), a
  * Catalyst `Expression` second; an `Aggregator`/`udaf` is the right tool
  * only when the aggregate carries state no built-in composition can
  * express. It runs through ObjectHashAggregate (no whole-stage codegen),
  * but it IS map-side combined: `reduce` runs per partition and `merge`
  * combines partial buffers, so the shuffle carries one small buffer per
  * (partition, group) — the same partial/final shape as a built-in
  * aggregate, which is what survives 100 TB.
  *
  * State discipline mirrors [[Exact]]: inputs are floor-scaled to integer
  * grains held in Longs, so the buffer is exact and merge-order-independent
  * — the result is bit-identical under any partitioning AND expressible in
  * ANSI SQL for the DuckDB oracle.
  */
object TypedAggs {

  /** Exact accumulation state: Σ floor(price·100)·qty and Σ qty as Longs. */
  case class WMeanBuf(swx: Long, sw: Long)

  /** Quantity-weighted mean unit price: inputs (price, qty) with 2-dp price
    * and integral qty by data contract — both lossless as scaled Longs. At
    * 600k sf0.1 rows Σ floor(price·100)·qty ≤ ~3e14, far inside Long range;
    * a 100 TB deployment would widen the buffer to two Longs per decimal
    * limb (or DECIMAL(38,0) via the built-in path) before overflow. */
  object WeightedMeanPrice extends Aggregator[(Double, Double), WMeanBuf, Double] {
    override def zero: WMeanBuf = WMeanBuf(0L, 0L)

    override def reduce(b: WMeanBuf, in: (Double, Double)): WMeanBuf = {
      val cents = math.floor(in._1 * 100.0).toLong
      val qty = math.floor(in._2).toLong
      WMeanBuf(b.swx + cents * qty, b.sw + qty)
    }

    override def merge(a: WMeanBuf, b: WMeanBuf): WMeanBuf =
      WMeanBuf(a.swx + b.swx, a.sw + b.sw)

    override def finish(b: WMeanBuf): Double =
      if (b.sw == 0L) Double.NaN
      else b.swx.toDouble / b.sw.toDouble / 100.0

    override def bufferEncoder: Encoder[WMeanBuf] = Encoders.product[WMeanBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
