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

object WeightedAvg extends Aggregator[(Double, Double), WAvgBuf, java.lang.Double] {
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
  // NULL, not NaN, on an all-zero-weight group: the built-in
  // sum(x*w)/sum(w) this Aggregator is cross-checked against yields
  // NULL there (non-ANSI x/0), and so does the DuckDB oracle — NaN
  // would diverge from both in the very query proving their equality
  override def finish(b: WAvgBuf): java.lang.Double =
    if (b.wsum == 0.0) null else b.sum / b.wsum
  override def bufferEncoder: Encoder[WAvgBuf] = Encoders.product[WAvgBuf]
  override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
}
