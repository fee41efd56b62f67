package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query obligation from SURVEY.md §2.B.
  *
  * @param name   query id — becomes the key in `SparkEntry.queries`
  * @param fn     pure function (session, sfDir) => result frame; must end in a
  *               total ORDER BY and round doubles to 2dp when `oracle` is set
  *               (SURVEY.md §5.3 parity rules)
  * @param oracle ANSI SQL DuckDB runs on the same parquet tables; None for
  *               non-SQL-expressible ops (streaming, UDF surface) → the driver
  *               records a weaker rows-only check
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
