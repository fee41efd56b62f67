package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The engine is a library of pure DataFrame pipelines; each module under
  * `graft.queries` contributes `QueryDef`s (query id, implementation, DuckDB
  * oracle SQL) and this object is the single registry the driver consumes.
  */
object SparkEntry {

  private def registry: Seq[QueryDef] =
    Relational.all ++ Etl.all ++ Windows.all ++ Text.all ++ Dedup.all ++
      Similarity.all ++ Streaming.all ++ UdfSurface.all ++ MultimodalQ.all ++
      ApproxAgg.all ++ Sampling.all ++ Corpus.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_basic")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
