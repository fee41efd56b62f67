package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** Pipeline observability (ref R23 structured log emission,
  * `/root/reference/common/logging.py:11-19` + per-record error logging
  * `api_gateway.py:115-118`), Spark-first: metrics ride INSIDE the job
  * via `Dataset.observe` — zero extra passes over the data, collected on
  * the driver when the action completes. The per-record log line of the
  * reference becomes per-batch aggregated counters (at 100 TB nobody
  * reads per-record logs; they read counters and samples). */
object Observe {

  /** Attach named metrics to a frame; returns the (wrapped frame,
    * observation handle). Call `obs.get` after an action. */
  def withMetrics(df: DataFrame, name: String, metrics: Seq[Column])
      : (DataFrame, Observation) = {
    require(metrics.nonEmpty, s"observation '$name' needs at least one metric")
    val obs = Observation(name)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
