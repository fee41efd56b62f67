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

  /** Partial-sketch UNION — the pattern that makes approx distinct
    * counting compose at 100 TB: build an HLL sketch per group (here:
    * per event_type, standing in for per-partition / per-day / per-file
    * sketches), persist or ship the ~KB binary sketches, and answer
    * "distinct users overall" by UNIONING the sketches — no re-scan of
    * the raw data, no exact distinct's second shuffle. The per-type rows
    * carry their own estimates; the ALL row is `hll_union_agg` over the
    * same six sketches. ApproxAggSpec asserts every estimate is within
    * HLL++'s error envelope of the exact answer (no DuckDB oracle: its
    * approx sketches are a different implementation by construction). */
  private def sketchUnion(s: SparkSession, d: String): DataFrame = {
    val parts = Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"),
        countDistinct(col("user_id")).as("exact_users"))
    val perType = parts.select(col("event_type"),
      hll_sketch_estimate(col("sk")).as("approx_users"), col("exact_users"))
    val overall = parts.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"))
      .crossJoin(Tables.events(s, d)
        .agg(countDistinct(col("user_id")).as("exact_users")))
      .select(lit("ALL").as("event_type"), col("approx_users"),
        col("exact_users"))
    perType.unionByName(overall).orderBy(col("event_type"))
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("n_agg_approx", approxAgg, None),
    QueryDef("n_sketch_union", sketchUnion, None),
  )
}
