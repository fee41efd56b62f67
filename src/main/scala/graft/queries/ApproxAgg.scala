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

  /** Misra–Gries heavy hitters — the MERGEABLE frequent-items summary
    * (Misra & Gries 1982; mergeability per Agarwal et al. 2012,
    * "Mergeable Summaries") that finds the corpus's top tokens in ONE
    * narrow pass with O(capacity) state per partition, where the exact
    * top-k (q_text_topk's corpus form) shuffles the full
    * vocabulary. Each partition keeps ≤ `Capacity` counters (decrement-
    * all on overflow, at most N/Capacity triggers → amortized O(1) per
    * token); the per-partition summaries are merged by summation — each
    * partition undercounts any token by at most ⌊Nₚ/(Capacity+1)⌋, so
    * the merged estimate `est_freq` is a LOWER bound with total error
    * ≤ N/(Capacity+1), carried per row as `max_freq` (est + bound).
    * Every token with true frequency > N/(Capacity+1) is guaranteed
    * present. Top-k via TakeOrderedAndProject over the ≤
    * Capacity×|partitions| merged rows — the corpus never shuffles.
    *
    * `no-oracle`: counter contents depend on arrival order within each
    * partition (deterministic for a fixed file layout, but not a
    * cross-engine value); ScaleOpsSpec pins the guarantee instead —
    * exact heavy hitters are all present with exact ∈ [est, max_freq]. */
  private def topkSketch(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val Capacity = 64
    val K = 20
    val docs = Tables.documents(s, d)
    // total token count: one narrow scan, no explode — the audit scalar
    // that turns the per-row estimates into a certified error interval
    val total = docs
      .agg(sum(size(graft.operators.TextOps.tokens(col("text")))))
      .head().getLong(0)
    val bound = total / (Capacity + 1)
    val partials = docs
      .select(explode(graft.operators.TextOps.tokens(col("text"))).as("tok"))
      .as[String]
      .mapPartitions(it => graft.operators.FreqSketch.mgPartials(it, Capacity))
      .toDF("tok", "w")
    partials.groupBy(col("tok")).agg(sum(col("w")).as("est_freq"))
      .withColumn("max_freq", col("est_freq") + lit(bound))
      .orderBy(col("est_freq").desc, col("tok"))
      .limit(K)
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("n_agg_approx", approxAgg, None),
    QueryDef("n_sketch_union", sketchUnion, None),
    QueryDef("n_topk_sketch", topkSketch, None),
  )
}
