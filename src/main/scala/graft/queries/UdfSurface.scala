package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.functions.{Jwt, Parity, WeightedAvg}
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

  /** Fixed verification context — literal constants keep the query
    * deterministic and oracle-reproducible. */
  private[graft] val Secret = "graft-demo-secret"
  private[graft] val Now = 1700000000L

  /** The reference's 3-way token classification with REAL cryptography:
    * Bearer-regex extraction (handlers.py:32), then full HS256
    * verification and exp-claim discrimination via [[Jwt.verify]]
    * (handlers.py:34-47). Returns (token_status, principal_id). */
  private[graft] def classifyToken(header: String): (String, String) =
    header match {
      case null            => ("invalid", "unknown_user")
      case BearerRe(tok)   => Jwt.verify(tok, Secret, Now)
      case _               => ("invalid", "unknown_user")
    }

  // ----------------------------------------------------------------- n_udf_token
  /** R11 via the UDF surface: per-event JWTs are constructed (signed)
    * and then verified with genuine HMAC-SHA256 — a signing UDF builds
    * each token from the event's user, an exp claim in the past or
    * future depending on `value`, and a FORGED signature for `click`
    * events; the verifying UDF must discriminate the three outcomes
    * cryptographically, exactly like the reference authorizer
    * (handlers.py:34-47, incl. the unverified-decode principal on the
    * expired arm and the R22 unknown_user fallback). The oracle
    * reproduces the end-to-end classification from the source columns —
    * asserting that the sign→verify round trip decides purely on the
    * construction inputs. */
  private def udfToken(s: SparkSession, d: String): DataFrame = {
    val mk = udf((uid: String, exp: Long, forge: Boolean) =>
      Jwt.sign(if (forge) "forged-secret" else Secret, uid, exp))
    val classify = udf(classifyToken _)
    // deliberately exercises the REGISTERED-name UDF path (`udf.register`
    // + `call_udf`) alongside `mk`'s direct-Column form — the module's
    // purpose is the UDF API surface, and these are its two halves
    s.udf.register("graft_verify_jwt", classify)
    val exp = when(col("value") < 1.0, lit(Now - 3600L))
      .otherwise(lit(Now + 3600L))
    val header = when(col("event_type") === "error", lit("garbage-header"))
      .otherwise(concat(lit("Bearer "),
        mk(concat(lit("u"), col("user_id").cast("string")), exp,
          col("event_type") === "click")))
    Tables.events(s, d)
      .select(col("event_id"), header.as("hdr"))
      .select(col("event_id"), call_udf("graft_verify_jwt", col("hdr")).as("r"))
      .select(col("event_id"),
        col("r._1").as("token_status"), col("r._2").as("principal_id"))
      .orderBy(col("event_id"))
  }

  private val udfTokenSql =
    """SELECT event_id,
      |  CASE WHEN event_type = 'error' THEN 'invalid'
      |       WHEN event_type = 'click' THEN 'invalid'
      |       WHEN "value" < 1.0 THEN 'expired'
      |       ELSE 'valid' END AS token_status,
      |  CASE WHEN event_type IN ('error', 'click') THEN 'unknown_user'
      |       ELSE 'u' || CAST(user_id AS VARCHAR) END AS principal_id
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

  // ---------------------------------------------------------------- q_cogroup_agg
  /** The typed `KeyValueGroupedDataset.cogroup` surface: orders and
    * lineitems grouped by order key meet in ONE co-partitioned pass
    * (both sides shuffle once on the key; no join row-multiplication),
    * the per-key closure folds the line iterator imperatively, and the
    * result is aggregated per customer back in Catalyst land. Use this
    * shape when the per-key merge logic doesn't reduce to join+agg; the
    * oracle proves this instance DOES reduce (left join + group by) —
    * which is exactly what makes it verifiable. */
  private def cogroupAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val orders = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .as[(Long, Long, Double)].groupByKey(_._1)
    val lines = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_quantity"))
      .as[(Long, Double)].groupByKey(_._1)
    val perOrder = orders.cogroup(lines) { (_, os, ls) =>
      val oList = os.toSeq
      if (oList.isEmpty) Iterator.empty // lines without an order: none in TPC-H
      else {
        val (_, cust, total) = oList.head
        var n = 0L
        var sq = 0.0
        ls.foreach { l => n += 1; sq += l._2 }
        Iterator((cust, total, n, sq))
      }
    }
    perOrder.toDF("custkey", "total", "n_lines", "sum_qty")
      .groupBy(col("custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("n_lines")).as("n_lines"),
        Parity.dround(max(col("total")), 2).as("max_total"),
        Parity.dround(sum(col("sum_qty")), 2).as("sum_qty"))
      .orderBy(col("custkey"))
  }

  private val cogroupAggSql =
    """WITH pl AS (
      |  SELECT l_orderkey, count(*) AS n_lines, sum(l_quantity) AS sum_qty
      |  FROM lineitem GROUP BY 1)
      |SELECT o_custkey AS custkey,
      |  count(*) AS n_orders,
      |  CAST(sum(coalesce(n_lines, 0)) AS BIGINT) AS n_lines,
      |  round(max(o_totalprice), 2) AS max_total,
      |  round(sum(coalesce(sum_qty, 0)), 2) AS sum_qty
      |FROM orders LEFT JOIN pl ON o_orderkey = l_orderkey
      |GROUP BY o_custkey
      |ORDER BY custkey""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("n_udf_token", udfToken, Some(udfTokenSql)),
    QueryDef("n_udaf_agg", udafAgg, Some(udafAggSql)),
    QueryDef("q_cogroup_agg", cogroupAgg, Some(cogroupAggSql)),
  )
}
