package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.functions.Parity.dround
import graft.operators.TextOps
import graft.sources.Tables

/** Sampling operators for training-data pipelines.
  *
  * The workhorse is DETERMINISTIC hash-mod sampling, not `rand()` /
  * TABLESAMPLE: at 100 TB a sample must be (a) reproducible across
  * reruns and engines, (b) stable under task retries (a reseeded
  * `rand()` in a retried task silently changes the sample), and
  * (c) a pure per-row predicate so it pushes into the scan and
  * composes with partition pruning. Hashing the row's natural key into
  * 10⁴ buckets and keeping `bucket < rate·10⁴` gives all three, plus
  * coordinated samples across tables (same key → same verdict) — the
  * standard trick for consistent join samples. The hash is the
  * library-wide md5-prefix portable hash, so DuckDB reproduces the
  * exact sample, not just its statistics.
  */
object Sampling {

  // ------------------------------------------------------- q_stratified_sample
  /** Per-stratum rates keyed on l_returnflag (A→5%, N→1%, R→10%) over
    * the deterministic bucket of the line's unique natural key; verified
    * by aggregating the sampled rows per stratum. One codegen'd
    * filter+agg pass, no shuffle wider than the group count. */
  private def stratifiedSample(s: SparkSession, d: String): DataFrame = {
    val bucket = pmod(TextOps.portableHash(
      concat(col("l_orderkey").cast("string"), lit(":"),
        col("l_linenumber").cast("string"))), lit(10000L))
    val rateE4 = when(col("l_returnflag") === "A", 500L)
      .when(col("l_returnflag") === "N", 100L)
      .otherwise(1000L)
    Tables.lineitem(s, d)
      .filter(bucket < rateE4)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_sampled"),
        dround(sum(col("l_quantity")), 2).as("sum_qty"),
        dround(avg(col("l_extendedprice")), 2).as("avg_price"))
      .orderBy(col("l_returnflag"))
  }

  private val stratifiedSampleSql =
    """SELECT l_returnflag,
      |  count(*) AS n_sampled,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(avg(l_extendedprice), 2) AS avg_price
      |FROM lineitem
      |WHERE CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':' ||
      |    CAST(l_linenumber AS VARCHAR)), 1, 8) AS BIGINT) % 10000
      |  < CASE l_returnflag WHEN 'A' THEN 500 WHEN 'N' THEN 100 ELSE 1000 END
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_stratified_sample", stratifiedSample, Some(stratifiedSampleSql)),
  )
}
