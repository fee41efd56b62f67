package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.functions.{Parity, WeightedAvg}
import graft.sources.Tables

/** Phase 6 — the user-extension surface (SURVEY.md §7 phase 6): a Scala
  * UDF registered via `spark.udf.register` (ref R11's jwt-decode 3-way
  * try/except, `/root/reference/src/handlers.py:34-47`) and a typed
  * `Aggregator` UDAF via `functions.udaf`.
  *
  * Both queries are deterministic, so they carry oracles even though
  * SURVEY §2.B lists them as the weaker rows-only check — the UDF's
  * semantics are SQL-expressible (that equivalence is exactly what the
  * oracle asserts), and the UDAF reduces to sum(x·w)/sum(w).
  *
  * Scale notes: a JVM Scala UDF breaks whole-stage codegen at its call
  * site (unlike every other operator in this library) but stays in the
  * JVM — no serialization wall like a Python UDF. Rule of thumb encoded
  * here: UDF only for logic Catalyst can't express; q_token_classify is
  * the codegen'd twin of this query and the bench shows the gap. */
object UdfSurface {

  private val BearerRe = "Bearer\\s+(.+)".r

  /** The reference's 3-way token classification as opaque Scala — regex
    * arm ≡ jwt structural check, `expired` flag ≡ exp-claim check. */
  private[graft] def classifyToken(header: String, expired: Boolean): String =
    header match {
      case null           => "invalid"
      case BearerRe(_)    => if (expired) "expired" else "valid"
      case _              => "invalid"
    }

  // ----------------------------------------------------------------- n_udf_token
  /** R11 via the UDF surface: register + call a Scala UDF, with the
    * per-branch principal fallback (R22) on top. */
  private def udfToken(s: SparkSession, d: String): DataFrame = {
    val classify = udf(classifyToken _)
    s.udf.register("graft_classify_token", classify)
    val header = when(col("event_type") === "error", lit("garbage-header"))
      .otherwise(concat(lit("Bearer tok_"), col("user_id").cast("string")))
    Tables.events(s, d)
      .select(col("event_id"), header.as("hdr"), (col("value") < 1.0).as("expired"))
      .select(col("event_id"),
        call_udf("graft_classify_token", col("hdr"), col("expired")).as("token_status"))
      .orderBy(col("event_id"))
  }

  private val udfTokenSql =
    """SELECT event_id,
      |  CASE WHEN event_type = 'error' THEN 'invalid'
      |       WHEN "value" < 1.0 THEN 'expired'
      |       ELSE 'valid' END AS token_status
      |FROM events
      |ORDER BY event_id""".stripMargin

  // ----------------------------------------------------------------- n_udaf_agg
  /** Weighted average (price by quantity per return flag) through the
    * typed Aggregator, next to the built-in expression it must equal. */
  private def udafAgg(s: SparkSession, d: String): DataFrame = {
    val wavg = udaf(WeightedAvg)
    s.udf.register("graft_wavg", wavg)
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        Parity.dround(wavg(col("l_extendedprice"), col("l_quantity")), 2)
          .as("wavg_price"),
        Parity.dround(sum(col("l_extendedprice") * col("l_quantity")) /
          sum(col("l_quantity")), 2).as("wavg_builtin"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  private val udafAggSql =
    """SELECT l_returnflag,
      |  round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 2) AS wavg_price,
      |  round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 2) AS wavg_builtin,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("n_udf_token", udfToken, Some(udfTokenSql)),
    QueryDef("n_udaf_agg", udafAgg, Some(udafAggSql)),
  )
}
