package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.B n_udaf_agg): weighted average as an
  * `Aggregator[IN, BUF, OUT]`, registered through
  * `functions.udaf(...)` — the Spark-4 replacement for the deprecated
  * `UserDefinedAggregateFunction`.
  *
  * Scale: Aggregators run as partial aggregation (merge is associative)
  * so the shuffle carries one (sum, wsum) pair per group per task —
  * identical plan shape to the built-in `sum(x*w)/sum(w)` it is
  * cross-checked against in UdfSurfaceSpec. */
case class WAvgBuf(var sum: Double, var wsum: Double)

object WeightedAvg extends Aggregator[(Double, Double), WAvgBuf, Double] {
  override def zero: WAvgBuf = WAvgBuf(0.0, 0.0)
  override def reduce(b: WAvgBuf, in: (Double, Double)): WAvgBuf = {
    b.sum += in._1 * in._2
    b.wsum += in._2
    b
  }
  override def merge(a: WAvgBuf, b: WAvgBuf): WAvgBuf = {
    a.sum += b.sum
    a.wsum += b.wsum
    a
  }
  override def finish(b: WAvgBuf): Double =
    if (b.wsum == 0.0) Double.NaN else b.sum / b.wsum
  override def bufferEncoder: Encoder[WAvgBuf] = Encoders.product[WAvgBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
