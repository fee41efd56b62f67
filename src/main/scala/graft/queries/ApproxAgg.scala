package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Sketch-based aggregates — the 100 TB cardinality/quantile path
  * (SURVEY.md §2.B note: prefer `approx_count_distinct` over the
  * two-shuffle exact distinct at scale; `percentile_approx` over a full
  * sort).
  *
  * `no-oracle`: HLL++ and KLL sketches are deterministic for a given
  * input+parameters but implementation-specific — DuckDB's approx
  * functions use different sketches, so cross-engine hash parity is
  * impossible by construction. The accuracy contract (relative error vs
  * the exact answers) is asserted in ApproxAggSpec instead. */
object ApproxAgg {

  private def approxAgg(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        percentile_approx(col("value"), lit(0.5), lit(1000)).as("approx_p50"),
        round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("event_type"))

  val all: Seq[QueryDef] = Seq(
    QueryDef("n_agg_approx", approxAgg, None),
  )
}
