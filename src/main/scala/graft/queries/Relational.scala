package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.functions.Parity.dround
import graft.sources.Tables

/** Phase 0/1 relational core (SURVEY.md §7 phases 0–1).
  *
  * Every query is a pure `(SparkSession, sfDir) => DataFrame`, built on the
  * declarative DataFrame API so Catalyst gets predicate pushdown, column
  * pruning and join selection for free (SURVEY.md §4). Parity discipline
  * (SURVEY.md §5.3): total ORDER BY, `round(double, 2)`, timestamps cast to
  * date/epoch-seconds, aliases identical to the oracle SQL.
  *
  * Scale notes are per-query in the Scaladoc: these run on sf0.01 for the
  * oracle but are written for a 1000-executor cluster over ~100 TB.
  */
object Relational {

  /** revenue term used across TPC-H-shaped queries */
  private def rev: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  // ---------------------------------------------------------------- q_agg_basic
  /** TPC-H Q1 shape: scan → filter → project → hash agg → sort.
    * Scale: partial (map-side) aggregation on 5×2 grouping keys means the
    * shuffle carries one row per (flag, status) per task — O(groups), not
    * O(rows); survives any scale-up. */
  private def aggBasic(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dround(sum(col("l_quantity")), 2).as("sum_qty"),
        dround(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        dround(sum(rev), 2).as("sum_disc_price"),
        dround(sum(rev * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
        dround(avg(col("l_quantity")), 2).as("avg_qty"),
        dround(avg(col("l_extendedprice")), 2).as("avg_price"),
        dround(avg(col("l_discount")), 2).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val aggBasicSql =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
      |  round(avg(l_quantity), 2) AS avg_qty,
      |  round(avg(l_extendedprice), 2) AS avg_price,
      |  round(avg(l_discount), 2) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ------------------------------------------------------------- q_scan_project
  /** Narrow scan + projection with arithmetic (ref R1 →
    * `/root/reference/src/handlers.py:69`). Column pruning: only 6 of 11
    * lineitem columns are read (check ReadSchema in explain). Shuffle-free
    * except the final sort. */
  private def scanProject(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        dround(rev, 2).as("revenue"),
        dround(rev * (lit(1.0) + col("l_tax")), 2).as("charge"),
        dround(col("l_extendedprice") / col("l_quantity"), 2).as("unit_price"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("revenue"),
        col("charge"), col("unit_price"))

  private val scanProjectSql =
    """SELECT l_orderkey, l_linenumber,
      |  round(l_extendedprice * (1.0 - l_discount), 2) AS revenue,
      |  round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax), 2) AS charge,
      |  round(l_extendedprice / l_quantity, 2) AS unit_price
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, revenue, charge, unit_price""".stripMargin

  // -------------------------------------------------------------- q_filter_pred
  /** Compound predicates: AND/OR/NOT, IN, BETWEEN, null-safe equality, date
    * range (ref R6 numeric-check reject `src/handlers.py:82-83`, R26 edge
    * pre-filter `serverless.core.yml:42`). All predicates sit directly on scan
    * columns → Catalyst pushes them into the parquet reader (PushedFilters). */
  private def filterPred(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        (col("l_returnflag").isin("A", "R") || col("l_quantity").between(10, 20)) &&
        !(col("l_linestatus") === "F" && (col("l_discount") <=> lit(0.0))))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_linestatus"), round(col("l_quantity"), 2).as("qty"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_linestatus"), col("qty"))

  private val filterPredSql =
    """SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus,
      |  round(l_quantity, 2) AS qty
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND (l_returnflag IN ('A', 'R') OR l_quantity BETWEEN 10 AND 20)
      |  AND NOT (l_linestatus = 'F' AND l_discount IS NOT DISTINCT FROM 0.0)
      |ORDER BY l_orderkey, l_linenumber, l_returnflag, l_linestatus, qty""".stripMargin

  // --------------------------------------------------------------- q_sort_limit
  /** Multi-key sort with explicit null ordering + limit (top-k). Scale: Spark
    * plans orderBy+limit as TakeOrderedAndProject — each task keeps a k-row
    * heap, driver merges k×tasks rows; no full sort, no full shuffle. */
  private def sortLimit(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        nullif(col("o_orderstatus"), lit("P")).as("status_np"),
        round(col("o_totalprice"), 2).as("price"))
      .orderBy(col("status_np").asc_nulls_first, col("price").desc,
        col("o_orderkey").asc)
      .limit(100)

  private val sortLimitSql =
    """SELECT o_orderkey, o_custkey,
      |  nullif(o_orderstatus, 'P') AS status_np,
      |  round(o_totalprice, 2) AS price
      |FROM orders
      |ORDER BY status_np ASC NULLS FIRST, price DESC, o_orderkey ASC
      |LIMIT 100""".stripMargin

  // --------------------------------------------------------------- q_join_inner
  /** Equi inner hash join — the set-at-a-time form of the reference's per-row
    * enrichment lookup (R12, `/root/reference/common/aws_utils/ssm.py:46-73`).
    * Scale: both sides shuffle on the key unless one is broadcast-able; at
    * 100 TB orders⋈customer co-partitioned/bucketed on custkey avoids the
    * shuffle entirely. */
  private def joinInner(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.customer(s, d),
        col("o_custkey") === col("c_custkey"), "inner")
      .select(col("o_orderkey"), col("c_custkey"), col("c_name"),
        col("c_mktsegment"), round(col("o_totalprice"), 2).as("price"))
      .orderBy(col("o_orderkey"))

  private val joinInnerSql =
    """SELECT o_orderkey, c_custkey, c_name, c_mktsegment,
      |  round(o_totalprice, 2) AS price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_orderkey""".stripMargin

  // ----------------------------------------------------------- q_join_broadcast
  /** Explicit broadcast of the small dim (R12/R13 cached side-input —
    * `ssm.py:7`). `broadcast(part)` ships the dim to every executor once:
    * no shuffle of the 100 TB fact side, identical to the reference's
    * warm-container SSM cache amortization. */
  private def joinBroadcast(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).filter(col("p_brand") === "Brand#1")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("p_name"),
        col("p_brand"), round(col("l_extendedprice"), 2).as("price"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("price"),
        col("p_name"))

  private val joinBroadcastSql =
    """SELECT l_orderkey, l_linenumber, p_name, p_brand,
      |  round(l_extendedprice, 2) AS price
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand = 'Brand#1'
      |ORDER BY l_orderkey, l_linenumber, price, p_name""".stripMargin

  // ------------------------------------------------------------ q_join_bucketed
  /** Co-located large⋈large join over bucketed tables — the layout
    * answer where q_join_broadcast's answer (ship the small side) stops
    * applying because NEITHER side is small. Both sides are written once
    * hash-clustered into the same bucket count on the join key
    * (operators/Bucketing.scala); the join then reads matching buckets
    * pairwise with NO Exchange on either side — at 100 TB that deletes
    * the largest shuffle in the pipeline, paid for by a once-per-
    * snapshot layout write amortized over every downstream join on the
    * key. PlanSpec pins the zero-shuffle shape; the bench timing
    * includes the layout write each pass (the memo is evicted between
    * passes), so the number reported is the honest first-query cost.
    * The oracle sees straight parquet — bucketing changes the physical
    * plan, never the result. */
  private def joinBucketed(s: SparkSession, d: String): DataFrame = {
    val (li, ord) = graft.operators.Bucketing.bucketedJoinTables(s, d)
    s.table(li).join(s.table(ord), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        dround(sum(col("l_quantity")), 2).as("sum_qty"),
        dround(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  private val joinBucketedSql =
    """SELECT o_orderpriority, count(*) AS n_lines,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ------------------------------------------------- q_join_committed_bucketed
  /** Co-located join from the COMMITTED `bucket(n,key)` layout —
    * q_join_bucketed's table-format twin (round-13 verdict item 2).
    * There the zero-Exchange join came from a session `bucketBy` write;
    * here both sides are graft-table COMMITS whose `bucket(8, key)`
    * transform dirs hold rows by Spark's own murmur3 bucket-id
    * expression, and `TableCommit.registerBucketedView` redeems that
    * layout: each snapshot file hard-links (zero copy) into a flat
    * serve tree under a bucket-tagged name and one CLUSTERED BY DDL
    * registers it — the join then reads matching buckets pairwise with
    * NO Exchange on either side. At 100 TB this is the point of paying
    * the bucket layout at commit time: every subsequent key-join on
    * the committed fact table skips the cluster's largest shuffle.
    * PlanSpec pins the zero-Exchange plan; the oracle recomputes the
    * same join+agg from raw parquet (layout changes the physical plan,
    * never the result). */
  private def joinCommittedBucketed(s: SparkSession, d: String): DataFrame = {
    import graft.operators.TableCommit
    val base = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_jcb_${java.util.UUID.randomUUID().toString.replace("-", "")}")
    val liT = new java.io.File(base, "li").getAbsolutePath
    val ordT = new java.io.File(base, "ord").getAbsolutePath
    val tag = java.lang.Long.toHexString(
      java.util.UUID.nameUUIDFromBytes(base.getName.getBytes("UTF-8"))
        .getMostSignificantBits & Long.MaxValue)
    val (liV, ordV) = (s"graft_jcb_li_$tag", s"graft_jcb_ord_$tag")
    try {
      // independent table builds as concurrent driver jobs (guide
      // §2.6); the catalog registrations stay serial — session-catalog
      // DDL is not a surface to race
      locally {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        import scala.concurrent.duration.Duration
        val fLi = Future {
          TableCommit.appendRowsBy(s, liT, Seq("bucket(8,l_orderkey)"),
            Tables.lineitem(s, d).select(col("l_orderkey"), col("l_quantity"),
              col("l_extendedprice"), col("l_discount")))
        }
        val fOrd = Future {
          TableCommit.appendRowsBy(s, ordT, Seq("bucket(8,o_orderkey)"),
            Tables.orders(s, d).select(col("o_orderkey"),
              col("o_orderpriority")))
        }
        awaitBoth(fLi, fOrd)
      }
      TableCommit.registerBucketedView(s, liT, liV, "l_orderkey", 8,
        new java.io.File(base, "li_serve").getAbsolutePath)
      TableCommit.registerBucketedView(s, ordT, ordV, "o_orderkey", 8,
        new java.io.File(base, "ord_serve").getAbsolutePath)
      // agg-sized result, MATERIALIZED before the finally drops the
      // scratch trees the catalog entries point at
      val rows = s.table(liV)
        .join(s.table(ordV), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          dround(sum(col("l_quantity")), 2).as("sum_qty"),
          dround(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
            2).as("revenue"))
        .orderBy(col("o_orderpriority"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3))).toSeq
      import s.implicits._
      rows.toDF("o_orderpriority", "n_lines", "sum_qty", "revenue")
        .orderBy(col("o_orderpriority"))
    } finally {
      s.sql(s"DROP TABLE IF EXISTS `$liV`")
      s.sql(s"DROP TABLE IF EXISTS `$ordV`")
      graft.operators.Sinks.deleteRecursively(base)
    }
  }

  private val joinCommittedBucketedSql =
    """SELECT o_orderpriority, count(*) AS n_lines,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ------------------------------------------------------------------ q_join_spj
  /** STORAGE-PARTITIONED JOIN through the DSv2 catalog (round-14
    * verdict item 1 — the "real" successor to the bucketed-view link
    * trick): both sides are committed `bucket(8, key)` tables read as
    * `graft.`path`` catalog relations; their scans report
    * `KeyGroupedPartitioning(bucket(8, key))` resolved against the
    * catalog's own bucket function, so the equi-join runs with ZERO
    * Exchange straight from the committed trees — no serve-tree
    * links, no per-snapshot re-registration, and (unlike the view)
    * compatible with live deletion vectors and column mapping, which
    * the connector's readers apply themselves. At 100 TB this is the
    * end state of paying the bucket layout at commit time: the
    * nightly fact⋈fact join drops its largest shuffle with nothing
    * rebuilt between commits. The lineitem side carries a REAL
    * deletion vector here (a MoR delete of one order's lines, rows
    * the oracle's WHERE reproduces) to pin the composition. PlanSpec
    * pins zero-Exchange + KeyGroupedPartitioning; the oracle
    * recomputes from raw parquet. */
  private def joinSpj(s: SparkSession, d: String): DataFrame = {
    import graft.operators.TableCommit
    val base = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_spj_${java.util.UUID.randomUUID().toString.replace("-", "")}")
    val liT = new java.io.File(base, "li").getAbsolutePath
    val ordT = new java.io.File(base, "ord").getAbsolutePath
    val conf = s.conf
    val prev = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> scala.util.Try(conf.get(k)).toOption)
    try {
      graft.plans.GraftCatalog.register(s)
      // the two table builds are INDEPENDENT (different tables) — run
      // them as concurrent driver jobs (guide §2.6: overlap independent
      // jobs so one build's tail back-fills the other's; the ANN
      // trainer's pattern). Commits on distinct tables never contend.
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val fLi = Future {
        TableCommit.appendRowsBy(s, liT, Seq("bucket(8,l_orderkey)"),
          Tables.lineitem(s, d).select(col("l_orderkey"), col("l_quantity"),
            col("l_extendedprice"), col("l_discount")))
        TableCommit.evolvePartitioningBy(s, liT,
          Seq("bucket(8,l_orderkey)"))
      }
      val fOrd = Future {
        TableCommit.appendRowsBy(s, ordT, Seq("bucket(8,o_orderkey)"),
          Tables.orders(s, d).select(col("o_orderkey"),
            col("o_orderpriority")))
        TableCommit.evolvePartitioningBy(s, ordT,
          Seq("bucket(8,o_orderkey)"))
      }
      awaitBoth(fLi, fOrd)
      // the composition the view trick refuses: vector some lineitem
      // rows dead, then join THROUGH the vectors
      TableCommit.deleteWhereMorBy(s, liT, Seq("bucket(8,l_orderkey)"),
        "l_orderkey", BigDecimal(1), BigDecimal(32))
      conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled",
        "true")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val rows = s.sql(
        s"""SELECT o_orderpriority, count(*) AS n_lines,
           |  sum(l_quantity) AS sq,
           |  sum(l_extendedprice * (1 - l_discount)) AS rev
           |FROM graft.`$liT` l JOIN graft.`$ordT` o
           |  ON l.l_orderkey = o.o_orderkey
           |GROUP BY o_orderpriority""".stripMargin)
        .select(col("o_orderpriority"), col("n_lines"),
          dround(col("sq"), 2).as("sum_qty"),
          dround(col("rev"), 2).as("revenue"))
        .orderBy(col("o_orderpriority"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3))).toSeq
      import s.implicits._
      rows.toDF("o_orderpriority", "n_lines", "sum_qty", "revenue")
        .orderBy(col("o_orderpriority"))
    } finally {
      prev.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
      graft.operators.Sinks.deleteRecursively(base)
    }
  }

  private val joinSpjSql =
    """SELECT o_orderpriority, count(*) AS n_lines,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_orderkey NOT BETWEEN 1 AND 32
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ------------------------------------------------------------ q_join_spj_days
  /** MULTI-LEVEL storage-partitioned join (round-15 — the verdict's
    * `days(ts);bucket(n,key)` ask): both sides are committed tables
    * laid out by the TIME-SERIES fact spec this engine recommends at
    * 100 TB — `days(ts);bucket(8,user_id)`, exactly what the
    * streaming transform sink produces — and their scans report the
    * two-level `KeyGroupedPartitioning(days(ts), bucket(8, user_id))`
    * (both transforms bound against the catalog's canonical
    * functions), so the join ON (ts, user_id) runs with ZERO Exchange
    * straight from the committed trees: day-and-key co-located, no
    * serve links, snapshot-fresh. PlanSpec pins zero-Exchange for the
    * full join AND a day-scoped slice; the oracle recomputes from raw
    * parquet. */
  private def joinSpjDays(s: SparkSession, d: String): DataFrame = {
    import graft.operators.TableCommit
    val base = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_spjd_${java.util.UUID.randomUUID().toString.replace("-", "")}")
    val evT = new java.io.File(base, "ev").getAbsolutePath
    val sessT = new java.io.File(base, "sess").getAbsolutePath
    val conf = s.conf
    val prev = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> scala.util.Try(conf.get(k)).toOption)
    // a 10-day window bounds the SCAFFOLD (dirs = days × buckets; the
    // full 30-day span × 8 buckets staged 480 files across the two
    // tables — file count, not row count, dominated the build); the
    // join itself is layout-metadata-sized either way
    val slice = Tables.events(s, d)
      .filter(col("ts") < lit("2024-01-11 00:00:00").cast("timestamp"))
      .persist() // both table builds read it; one events scan, not two
    try {
      graft.plans.GraftCatalog.register(s)
      val spec = Seq("days(ts)", "bucket(4,user_id)")
      // materialize the shared cached slice ONCE before the concurrent
      // builds attach (both consume it; a pre-filled cache makes the
      // overlap read-only), then build the two independent tables as
      // concurrent driver jobs (guide §2.6)
      slice.count()
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val fEv = Future {
        TableCommit.appendRowsBy(s, evT, spec,
          slice.select(col("ts"), col("user_id"),
            col("event_type"), col("value")))
        TableCommit.evolvePartitioningBy(s, evT, spec)
      }
      val fSess = Future {
        TableCommit.appendRowsBy(s, sessT, spec,
          slice.groupBy(col("ts"), col("user_id"))
            .agg(count(lit(1)).as("n_ev")))
        TableCommit.evolvePartitioningBy(s, sessT, spec)
      }
      awaitBoth(fEv, fSess)
      conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled",
        "true")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val rows = s.sql(
        s"""SELECT e.event_type, count(*) AS n_rows,
           |  sum(c.n_ev) AS n_ev, sum(e.value) AS total_value
           |FROM graft.`$evT` e JOIN graft.`$sessT` c
           |  ON e.ts = c.ts AND e.user_id = c.user_id
           |GROUP BY e.event_type""".stripMargin)
        .select(col("event_type"), col("n_rows"), col("n_ev"),
          dround(col("total_value"), 2).as("total_value"))
        .orderBy(col("event_type"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSeq
      import s.implicits._
      rows.toDF("event_type", "n_rows", "n_ev", "total_value")
        .orderBy(col("event_type"))
    } finally {
      slice.unpersist()
      prev.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
      graft.operators.Sinks.deleteRecursively(base)
    }
  }

  /** Await BOTH concurrent build futures regardless of the first's
    * outcome (ADVICE r15): result-awaiting only the first left a
    * failed first build returning while the second kept writing
    * detached through the finally-block cleanup, its own failure
    * silently dropped on the global ExecutionContext. Both settle
    * first; then the first failure (if any) surfaces. */
  private def awaitBoth(a: scala.concurrent.Future[_],
      b: scala.concurrent.Future[_]): Unit = {
    import scala.concurrent.Await
    import scala.concurrent.duration.Duration
    Await.ready(a, Duration.Inf)
    Await.ready(b, Duration.Inf)
    a.value.get.get
    b.value.get.get
  }

  private val joinSpjDaysSql =
    """WITH ev AS (
      |  SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-11 00:00:00'),
      |sess AS (
      |  SELECT ts, user_id, count(*) AS n_ev FROM ev GROUP BY 1, 2)
      |SELECT e.event_type, count(*) AS n_rows,
      |  CAST(sum(c.n_ev) AS BIGINT) AS n_ev,
      |  round(sum(e.value), 2) AS total_value
      |FROM ev e JOIN sess c
      |  ON e.ts = c.ts AND e.user_id = c.user_id
      |GROUP BY e.event_type
      |ORDER BY e.event_type""".stripMargin

  // ----------------------------------------------------------- q_join_spj_trunc
  /** truncate() STORAGE-PARTITIONED JOIN (late round 15): both sides
    * are committed under `truncate(1000, custkey)` — the floor/prefix
    * layout a range-sharded dimension uses — and their scans report
    * `KeyGroupedPartitioning(truncate1000(custkey))` through the
    * catalog's WIDTH-BAKED function family: a literal width argument
    * would be a second expression LEAF, which catalyst's SPJ
    * compatibility refuses (only `bucket` gets its literal hoisted),
    * so the width rides in the function name and `canonicalName` and
    * two sides co-partition iff their widths agree. The join then
    * runs with ZERO Exchange straight from the committed trees —
    * range-sharded dim⋈fact without a shuffle, the third SPJ shape
    * next to `bucket` (q_join_spj) and `days;bucket`
    * (q_join_spj_days). PlanSpec pins zero-Exchange plans (including
    * a two-level integral+string truncate layout); the oracle
    * recomputes from raw parquet. */
  private def joinSpjTrunc(s: SparkSession, d: String): DataFrame = {
    import graft.operators.TableCommit
    val base = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_spjt_${java.util.UUID.randomUUID().toString.replace("-", "")}")
    val custT = new java.io.File(base, "cust").getAbsolutePath
    val ordT = new java.io.File(base, "ord").getAbsolutePath
    val conf = s.conf
    val prev = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> scala.util.Try(conf.get(k)).toOption)
    try {
      graft.plans.GraftCatalog.register(s)
      // independent table builds as concurrent driver jobs (guide §2.6)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val fCust = Future {
        TableCommit.appendRowsBy(s, custT, Seq("truncate(1000,c_custkey)"),
          Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment")))
        TableCommit.evolvePartitioningBy(s, custT,
          Seq("truncate(1000,c_custkey)"))
      }
      val fOrd = Future {
        TableCommit.appendRowsBy(s, ordT, Seq("truncate(1000,o_custkey)"),
          Tables.orders(s, d).select(col("o_custkey"), col("o_totalprice")))
        TableCommit.evolvePartitioningBy(s, ordT,
          Seq("truncate(1000,o_custkey)"))
      }
      awaitBoth(fCust, fOrd)
      conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled",
        "true")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val rows = s.sql(
        s"""SELECT c_mktsegment, count(*) AS n_orders,
           |  sum(o_totalprice) AS rev
           |FROM graft.`$ordT` o JOIN graft.`$custT` c
           |  ON o.o_custkey = c.c_custkey
           |GROUP BY c_mktsegment""".stripMargin)
        .select(col("c_mktsegment"), col("n_orders"),
          dround(col("rev"), 2).as("revenue"))
        .orderBy(col("c_mktsegment"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .toSeq
      import s.implicits._
      rows.toDF("c_mktsegment", "n_orders", "revenue")
        .orderBy(col("c_mktsegment"))
    } finally {
      prev.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
      graft.operators.Sinks.deleteRecursively(base)
    }
  }

  private val joinSpjTruncSql =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  round(sum(o_totalprice), 2) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  // --------------------------------------------------------------- q_join_multi
  /** TPC-H Q5-shaped 5-way join chain: lineitem⋈orders⋈customer⋈nation⋈region.
    * Scale: nation/region broadcast (tiny), customer broadcast at small SF /
    * shuffled at 100 TB; AQE re-plans join strategy from runtime sizes.
    * Filters on region + order date reach the scans before any join. */
  private def joinMulti(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA" &&
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(col("n_name"))
      .agg(dround(sum(rev), 2).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))

  private val joinMultiSql =
    """SELECT n_name, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // --------------------------------------------------------------- q_join_outer
  /** Outer joins with null handling (ref R22 fallback-on-missing,
    * `src/handlers.py:37-42`). Branch 'left': every customer kept, zero-count
    * for order-less customers. Branch 'full': both-sided unmatched rows with
    * coalesced keys. */
  private def joinOuter(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val customer = Tables.customer(s, d)
    val leftBr = customer
      .join(orders, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(col("o_orderkey")).as("n"))
      .select(lit("left").as("branch"), col("c_custkey").as("custkey"),
        col("c_name").as("name"), col("n"))
    val agg = orders.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
    val rich = customer.filter(col("c_acctbal") > 5000)
      .select(col("c_custkey"), col("c_name"))
    val fullBr = rich
      .join(agg, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(lit("full").as("branch"),
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        coalesce(col("c_name"), lit("(no customer)")).as("name"),
        coalesce(col("n_orders"), lit(0L)).as("n"))
    leftBr.unionByName(fullBr).orderBy(col("branch"), col("custkey"))
  }

  private val joinOuterSql =
    """SELECT * FROM (
      |  SELECT 'left' AS branch, c_custkey AS custkey, c_name AS name,
      |    count(o_orderkey) AS n
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey, c_name
      |  UNION ALL
      |  SELECT 'full' AS branch,
      |    coalesce(c_custkey, o_custkey) AS custkey,
      |    coalesce(c_name, '(no customer)') AS name,
      |    coalesce(n_orders, 0) AS n
      |  FROM (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000) rich
      |  FULL OUTER JOIN
      |    (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey) agg
      |  ON c_custkey = o_custkey
      |)
      |ORDER BY branch, custkey""".stripMargin

  // ----------------------------------------------------------- q_join_semi_anti
  /** Semi/anti join — the set-at-a-time good/bad record split (ref R19 error
    * routing, `api_gateway.py:99-123`). Scale: semi/anti joins shuffle only
    * the keys of the probe side; Spark plans them without materializing the
    * payload of the build side. */
  private def joinSemiAnti(s: SparkSession, d: String): DataFrame = {
    val customer = Tables.customer(s, d)
    val orderKeys = Tables.orders(s, d).select(col("o_custkey"))
    val semi = customer.join(orderKeys, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(lit("with_orders").as("branch"), col("c_custkey"), col("c_name"))
    val anti = customer.join(orderKeys, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(lit("no_orders").as("branch"), col("c_custkey"), col("c_name"))
    semi.unionByName(anti).orderBy(col("branch"), col("c_custkey"))
  }

  private val joinSemiAntiSql =
    """SELECT * FROM (
      |  SELECT 'with_orders' AS branch, c_custkey, c_name FROM customer
      |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |  UNION ALL
      |  SELECT 'no_orders' AS branch, c_custkey, c_name FROM customer
      |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |)
      |ORDER BY branch, c_custkey""".stripMargin

  // ------------------------------------------------------------- q_agg_distinct
  /** Distinct aggregation: count(distinct) + sum(distinct) per group. Scale:
    * Spark expands distinct aggs into a two-phase plan (partial distinct per
    * key, then merge); for approximate cardinality at 100 TB prefer
    * `approx_count_distinct` (HLL, no second shuffle). */
  private def aggDistinct(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"),
        dround(sum_distinct(col("value")), 2).as("sum_distinct_value"))
      .orderBy(col("event_type"))

  private val aggDistinctSql =
    """SELECT event_type,
      |  count(DISTINCT user_id) AS n_users,
      |  count(*) AS n_events,
      |  round(sum(DISTINCT "value"), 2) AS sum_distinct_value
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // --------------------------------------------------------- q_agg_rollup_cube
  /** Grouping sets via CUBE + grouping() bitmask; deterministic null ordering
    * in the sort key (SURVEY.md §5.3). gid built as grouping(a)*2+grouping(b)
    * in both engines rather than grouping_id() — DuckDB's GROUPING takes one
    * column. */
  private def aggRollupCube(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus"))).as("gid"),
        count(lit(1)).as("n"),
        dround(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  private val aggRollupCubeSql =
    """SELECT l_returnflag, l_linestatus,
      |  grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid,
      |  count(*) AS n,
      |  round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // --------------------------------------------------------------- q_agg_having
  /** Post-aggregation filter (HAVING). Catalyst keeps the filter above the
    * agg — it cannot push through — but partial aggregation still bounds the
    * shuffle at O(groups). */
  private def aggHaving(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), dround(avg(col("value")), 2).as("avg_value"))
      .where(col("n") > 100)
      .orderBy(col("event_type"))

  private val aggHavingSql =
    """SELECT event_type, count(*) AS n, round(avg("value"), 2) AS avg_value
      |FROM events
      |GROUP BY event_type
      |HAVING count(*) > 100
      |ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------------ q_set_ops
  /** union / intersect / except on projected keys, tagged per branch.
    * Scale: INTERSECT/EXCEPT plan as aggregations+joins on the projected key
    * only — project before the set op so the shuffle carries just the key. */
  private def setOps(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val a = orders.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    val b = orders.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
    val both = a.intersect(b).select(lit("both").as("branch"), col("o_custkey"))
    val onlyA = a.except(b).select(lit("only_f").as("branch"), col("o_custkey"))
    val either = a.union(b).distinct()
      .select(lit("either").as("branch"), col("o_custkey"))
    both.unionByName(onlyA).unionByName(either)
      .orderBy(col("branch"), col("o_custkey"))
  }

  private val setOpsSql =
    """SELECT * FROM (
      |  SELECT 'both' AS branch, o_custkey FROM
      |    (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |     INTERSECT
      |     SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      |  UNION ALL
      |  SELECT 'only_f' AS branch, o_custkey FROM
      |    (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |     EXCEPT
      |     SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      |  UNION ALL
      |  SELECT 'either' AS branch, o_custkey FROM
      |    (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |     UNION
      |     SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      |)
      |ORDER BY branch, o_custkey""".stripMargin

  // ---------------------------------------------------------------- q_cast_norm
  /** Cast normalization chains (ref R20 `str(int(code))`,
    * `api_gateway.py:95`): string↔int round-trip, double→cents bigint (round
    * first — Spark truncates double→int, DuckDB rounds, so never cast raw
    * doubles to ints), timestamp→date, date_trunc to month. */
  private def castNorm(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        concat(lit("00"), col("o_orderkey").cast("string")).cast("bigint").as("key_roundtrip"),
        round(col("o_totalprice") * 100, 0).cast("bigint").as("price_cents"),
        col("o_orderdate").cast("date").as("order_date"),
        date_trunc("month", col("o_orderdate")).cast("date").as("order_month"),
        (col("o_orderkey") % 100).cast("double").as("key_mod_dbl"))
      .orderBy(col("o_orderkey"))

  private val castNormSql =
    """SELECT o_orderkey,
      |  CAST('00' || CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
      |  CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents,
      |  CAST(o_orderdate AS DATE) AS order_date,
      |  CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
      |  CAST(o_orderkey % 100 AS DOUBLE) AS key_mod_dbl
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  // ----------------------------------------------------------------- q_datetime
  /** Date/time function family on o_orderdate: parts, date_add, datediff,
    * epoch seconds, week truncation. DuckDB `epoch()` returns fractional
    * seconds → floor+cast both sides. */
  private def datetimeFns(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("q"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("days_since"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        date_trunc("week", col("o_orderdate")).cast("date").as("week_start"))
      .orderBy(col("o_orderkey"))

  private val datetimeSql =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INT) AS y,
      |  CAST(month(o_orderdate) AS INT) AS m,
      |  CAST(day(o_orderdate) AS INT) AS dom,
      |  CAST(quarter(o_orderdate) AS INT) AS q,
      |  CAST(o_orderdate AS DATE) + 30 AS plus30,
      |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
      |  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s,
      |  CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  // ----------------------------------------------------------------- q_math_fns
  /** Math scalar functions. floor/ceil cast to BIGINT both sides (Spark
    * returns LONG, DuckDB DOUBLE); pmod spelled ((a % b) + b) % b for DuckDB. */
  private def mathFns(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        dround(col("c_acctbal"), 1).as("bal_r1"),
        floor(col("c_acctbal")).as("bal_floor"),
        ceil(col("c_acctbal")).as("bal_ceil"),
        round(abs(col("c_acctbal")), 2).as("bal_abs"),
        dround(pow(col("c_acctbal") / 1000.0, 2), 2).as("bal_pow"),
        dround(sqrt(abs(col("c_acctbal"))), 2).as("bal_sqrt"),
        pmod(col("c_custkey"), lit(7)).as("key_pmod"),
        round(greatest(col("c_acctbal"), lit(0.0)), 2).as("bal_pos"),
        round(least(col("c_acctbal"), lit(1000.0)), 2).as("bal_cap"))
      .orderBy(col("c_custkey"))

  private val mathFnsSql =
    """SELECT c_custkey,
      |  round(c_acctbal, 1) AS bal_r1,
      |  CAST(floor(c_acctbal) AS BIGINT) AS bal_floor,
      |  CAST(ceil(c_acctbal) AS BIGINT) AS bal_ceil,
      |  round(abs(c_acctbal), 2) AS bal_abs,
      |  round(pow(c_acctbal / 1000.0, 2), 2) AS bal_pow,
      |  round(sqrt(abs(c_acctbal)), 2) AS bal_sqrt,
      |  ((c_custkey % 7) + 7) % 7 AS key_pmod,
      |  round(greatest(c_acctbal, 0.0), 2) AS bal_pos,
      |  round(least(c_acctbal, 1000.0), 2) AS bal_cap
      |FROM customer
      |ORDER BY c_custkey""".stripMargin

  // --------------------------------------------------------------- q_string_fns
  /** String scalar functions (ref R9 interpolation `src/handlers.py:85`):
    * concat, printf-style format, case, substring, trim, length, lpad. */
  private def stringFns(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        concat(col("p_brand"), lit(":"), col("p_name")).as("brand_name"),
        format_string("Hello, %s!", col("p_name")).as("greeting"),
        upper(col("p_type")).as("type_upper"),
        lower(col("p_brand")).as("brand_lower"),
        substring(col("p_name"), 1, 5).as("name5"),
        trim(col("p_name")).as("name_trim"),
        length(col("p_name")).as("name_len"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("key_padded"))
      .orderBy(col("p_partkey"))

  private val stringFnsSql =
    """SELECT p_partkey,
      |  p_brand || ':' || p_name AS brand_name,
      |  printf('Hello, %s!', p_name) AS greeting,
      |  upper(p_type) AS type_upper,
      |  lower(p_brand) AS brand_lower,
      |  substring(p_name, 1, 5) AS name5,
      |  trim(p_name) AS name_trim,
      |  CAST(length(p_name) AS INT) AS name_len,
      |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  // ------------------------------------------------------------ q_supplier_rollup
  /** Supplier-side revenue rollup (completes table coverage: supplier ⋈
    * nation dims against the lineitem fact). ROLLUP gives the nation
    * subtotal rows; both dims broadcast (tiny), so the only wide shuffle
    * carries O(groups). */
  private def supplierRollup(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .rollup(col("n_name"), col("s_name"))
      .agg(
        (grouping(col("n_name")) * 2 + grouping(col("s_name"))).as("gid"),
        dround(sum(rev), 2).as("revenue"),
        count(lit(1)).as("n_items"),
        dround(avg(col("s_acctbal")), 2).as("avg_bal"))
      .orderBy(col("gid"), col("n_name").asc_nulls_first,
        col("s_name").asc_nulls_first)

  private val supplierRollupSql =
    """SELECT n_name, s_name,
      |  grouping(n_name) * 2 + grouping(s_name) AS gid,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |  count(*) AS n_items,
      |  round(avg(s_acctbal), 2) AS avg_bal
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY ROLLUP (n_name, s_name)
      |ORDER BY gid, n_name ASC NULLS FIRST, s_name ASC NULLS FIRST""".stripMargin

  // --------------------------------------------------------------- q_set_ops_all
  /** MULTISET set operations — `intersectAll` keeps min(countL, countR)
    * copies per value, `exceptAll` keeps countL − countR — the bag
    * semantics `q_set_ops`'s distinct forms don't exercise. Catalyst
    * plans both as a count-aggregation + generate (no distinct pass), so
    * the shuffle still carries only the projected key; the per-branch
    * count aggregation keeps the output bounded by |suppkeys|. */
  private def setOpsAll(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val a = li.filter(col("l_returnflag") === "A").select(col("l_suppkey"))
    val b = li.filter(col("l_returnflag") === "R").select(col("l_suppkey"))
    def counted(branch: String, df: DataFrame) =
      df.groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
        .select(lit(branch).as("branch"), col("l_suppkey"), col("n"))
    counted("intersect_all", a.intersectAll(b))
      .unionByName(counted("except_all", a.exceptAll(b)))
      .unionByName(counted("union_all", a.union(b)))
      .orderBy(col("branch"), col("l_suppkey"))
  }

  private val setOpsAllSql =
    """WITH a AS (SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'),
      |b AS (SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'),
      |ia AS (SELECT l_suppkey FROM a INTERSECT ALL SELECT l_suppkey FROM b),
      |ea AS (SELECT l_suppkey FROM a EXCEPT ALL SELECT l_suppkey FROM b),
      |ua AS (SELECT l_suppkey FROM a UNION ALL SELECT l_suppkey FROM b)
      |SELECT branch, l_suppkey, n FROM (
      |  SELECT 'intersect_all' AS branch, l_suppkey, count(*) AS n
      |  FROM ia GROUP BY l_suppkey
      |  UNION ALL
      |  SELECT 'except_all', l_suppkey, count(*) FROM ea GROUP BY l_suppkey
      |  UNION ALL
      |  SELECT 'union_all', l_suppkey, count(*) FROM ua GROUP BY l_suppkey)
      |ORDER BY branch, l_suppkey""".stripMargin

  // --------------------------------------------------------------- q_salted_agg
  /** The skew-mitigation aggregation path as a first-class ORACLE'D
    * query (round 1 had it spec-only): events aggregate per event_type —
    * 5 keys over the whole table is exactly the hot-key shape — through
    * `SkewOps.saltedAgg`'s two-phase deterministic salt (scatter each
    * key over 32 sub-keys, partial-aggregate, merge). The result is
    * identical to the direct groupBy by associativity — which is
    * precisely what the DuckDB oracle asserts, on the PLAIN form. */
  private def saltedAgg(s: SparkSession, d: String): DataFrame =
    graft.operators.SkewOps.saltedAgg(
      Tables.events(s, d),
      key = col("event_type"),
      saltBy = col("event_id"),
      salts = 32,
      partials = Seq(count(lit(1)).as("pn"), sum(col("value")).as("psum")),
      merges = Seq(sum(col("pn")).as("n"),
        dround(sum(col("psum")), 2).as("sum_value")))
      .select(col("key").as("event_type"), col("n"), col("sum_value"))
      .orderBy(col("event_type"))

  private val saltedAggSql =
    """SELECT event_type, count(*) AS n, round(sum("value"), 2) AS sum_value
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // -------------------------------------------------------------- q_salted_join
  /** The skew-mitigation JOIN path as a first-class oracle'd query
    * (round-3 verdict item 9; `SkewOps.saltedJoin` was spec-only):
    * events join their event-type statistics dim — 5 join keys over the
    * whole fact table is the textbook hot-key shape, the case AQE's
    * skew split can't always save (it only splits sort-merge sides) and
    * a broadcast can't when the dim is wide. The salt scatters each hot
    * key over 16 deterministic sub-keys derived from event_id (retry-
    * stable) at the cost of a 16× dim replication. Result = the plain
    * join by construction — exactly what the oracle asserts, on the
    * plain form. Output stays integer-exact (counts summed per user), so
    * parity is unconditional. */
  private def saltedJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val dim = ev.groupBy(col("event_type").as("dim_type"))
      .agg(countDistinct(col("user_id")).as("type_users"),
        count(lit(1)).as("type_events"))
    graft.operators.SkewOps.saltedJoin(
      ev, dim,
      factKey = col("event_type"), dimKey = col("dim_type"),
      salts = 16, saltBy = col("event_id"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("type_events")).as("w_type_events"),
        sum(col("type_users")).as("w_type_users"))
      .orderBy(col("user_id"))
  }

  private val saltedJoinSql =
    """WITH dim AS (
      |  SELECT event_type,
      |    count(DISTINCT user_id) AS type_users,
      |    count(*) AS type_events
      |  FROM events GROUP BY event_type)
      |SELECT user_id,
      |  count(*) AS n_events,
      |  CAST(sum(d.type_events) AS BIGINT) AS w_type_events,
      |  CAST(sum(d.type_users) AS BIGINT) AS w_type_users
      |FROM events e JOIN dim d ON e.event_type = d.event_type
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q_sql_entry
  /** Register the full TPC-H-ish table set as temp views whose names are
    * KEYED BY THE DATASET DIR (md5 tag) and return the tag. Keyed names
    * make registration idempotent per (session, dir): two invocations
    * against different dirs in one session register DISJOINT view
    * names, so neither depends on createOrReplaceTempView re-
    * registration ordering (the round-4 ADVICE hazard with the global
    * `graft_customer` names). The views are cheap plan aliases — no
    * data is materialized — so leaving them registered for the session
    * costs nothing and keeps repeated SQL-text queries stable. */
  private def sqlViews(s: SparkSession, d: String): String = {
    val tag = graft.operators.Sinks.datasetTag(d)
    // exactly the tables the SQL-text strings reference — events was
    // registered here once but never queried, paying its eager schema
    // read + nanos-conf mutation per invocation for nothing
    Seq[(String, DataFrame)](
      "customer" -> Tables.customer(s, d),
      "orders" -> Tables.orders(s, d),
      "lineitem" -> Tables.lineitem(s, d),
      "nation" -> Tables.nation(s, d))
      .foreach { case (n, df) => df.createOrReplaceTempView(s"graft_${n}_$tag") }
    tag
  }

  /** The SQL-TEXT entry path — every other query drives the engine
    * through the DataFrame API; this one registers the tables as views
    * and submits TPC-H Q3 as a SQL string, proving a SQL client gets
    * the identical engine: same Catalyst plan space, same pushdown/
    * pruning/join selection, same TakeOrderedAndProject for the
    * ORDER BY+LIMIT. The oracle is the query itself modulo dialect —
    * the purest statement of cross-engine parity in the registry. */
  private def sqlEntry(s: SparkSession, d: String): DataFrame = {
    val t = sqlViews(s, d)
    s.sql(
      s"""SELECT l_orderkey,
         |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         |  CAST(o_orderdate AS DATE) AS order_date, o_orderpriority
         |FROM graft_customer_$t
         |JOIN graft_orders_$t ON c_custkey = o_custkey
         |JOIN graft_lineitem_$t ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1995-03-15'
         |  AND l_shipdate > TIMESTAMP '1995-03-15'
         |GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
         |ORDER BY revenue DESC, l_orderkey
         |LIMIT 10""".stripMargin)
  }

  private val sqlEntrySql =
    """SELECT l_orderkey,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  CAST(o_orderdate AS DATE) AS order_date, o_orderpriority
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1995-03-15'
      |  AND l_shipdate > TIMESTAMP '1995-03-15'
      |GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  // --------------------------------------------------------------- q_sql_window
  /** SQL-text WINDOW query (round-4 verdict: exercise the SQL entry
    * beyond one shape): top-2 orders by price per customer, submitted as
    * a SQL string. PlanSpec pins that the text path plans the IDENTICAL
    * physical shape as its DataFrame twin (one Window over a single
    * hash-partition Exchange, rank filter pushed into the window's
    * output) — a SQL client and a DataFrame caller must share one plan
    * space, not two engines. Deterministic tiebreak on o_orderkey. */
  private def sqlWindow(s: SparkSession, d: String): DataFrame = {
    val t = sqlViews(s, d)
    s.sql(
      s"""SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
         |  SELECT o_custkey, o_orderkey, o_totalprice,
         |    row_number() OVER (
         |      PARTITION BY o_custkey
         |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
         |  FROM graft_orders_$t)
         |WHERE rnk <= 2
         |ORDER BY o_custkey, rnk""".stripMargin)
  }

  private val sqlWindowSql =
    """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (
      |      PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
      |  FROM orders)
      |WHERE rnk <= 2
      |ORDER BY o_custkey, rnk""".stripMargin

  // ------------------------------------------------------------- q_sql_subquery
  /** SQL-text CORRELATED-SUBQUERY shape: customers with ≥5 orders, the
    * count surfaced through a correlated scalar subquery. Catalyst
    * DECORRELATES both subqueries into one aggregate + equi-join on the
    * correlation key (q_subquery_corr documents the rewrite; here the
    * pin is that the TEXT path gets it too): the executed plan is
    * ordinary shuffle relational algebra — no per-outer-row re-scan,
    * which is the difference between one pass and O(n²) at 100 TB.
    * Integer-exact predicate (count ≥ 5), so no cross-engine boundary
    * risk. */
  private def sqlSubquery(s: SparkSession, d: String): DataFrame = {
    val t = sqlViews(s, d)
    s.sql(
      s"""SELECT c_custkey, c_mktsegment,
         |  (SELECT count(*) FROM graft_orders_$t o
         |   WHERE o.o_custkey = c.c_custkey) AS n_orders
         |FROM graft_customer_$t c
         |WHERE (SELECT count(*) FROM graft_orders_$t o
         |       WHERE o.o_custkey = c.c_custkey) >= 5
         |ORDER BY c_custkey""".stripMargin)
  }

  private val sqlSubquerySql =
    """SELECT c_custkey, c_mktsegment,
      |  (SELECT count(*) FROM orders o
      |   WHERE o.o_custkey = c.c_custkey) AS n_orders
      |FROM customer c
      |WHERE (SELECT count(*) FROM orders o
      |       WHERE o.o_custkey = c.c_custkey) >= 5
      |ORDER BY c_custkey""".stripMargin

  // -------------------------------------------------------------- q_sql_lateral
  /** SQL-text LATERAL correlated subquery — the remaining SQL front
    * door after window/scalar-subquery/MERGE: per customer, the lateral
    * derives a multi-column summary of that customer's orders (count,
    * latest date, max price) — the shape a scalar subquery cannot
    * return (one column per subquery) and the reason LATERAL exists.
    * Catalyst DECORRELATES the lateral into ONE aggregate + equi-join
    * on the correlation key (`DecorrelateInnerQuery`) — no per-outer-row
    * re-execution, the same one-pass guarantee q_sql_subquery pins for
    * the scalar form; PlanSpec pins the decorrelated shape (no
    * BroadcastNestedLoop/CartesianProduct arm). Outputs are counts,
    * a date, and a max that PICKS an existing double — no computed
    * float crosses the engine boundary. */
  private def sqlLateral(s: SparkSession, d: String): DataFrame = {
    val t = sqlViews(s, d)
    s.sql(
      s"""SELECT c.c_custkey, c.c_mktsegment,
         |  o.n_orders, o.last_order, o.max_price
         |FROM graft_customer_$t c,
         |LATERAL (
         |  SELECT count(*) AS n_orders,
         |    CAST(max(o_orderdate) AS DATE) AS last_order,
         |    max(o_totalprice) AS max_price
         |  FROM graft_orders_$t o
         |  WHERE o.o_custkey = c.c_custkey) o
         |WHERE o.n_orders >= 8
         |ORDER BY c.c_custkey""".stripMargin)
  }

  private val sqlLateralSql =
    """SELECT c.c_custkey, c.c_mktsegment,
      |  o.n_orders, o.last_order, o.max_price
      |FROM customer c,
      |LATERAL (
      |  SELECT count(*) AS n_orders,
      |    CAST(max(o_orderdate) AS DATE) AS last_order,
      |    max(o_totalprice) AS max_price
      |  FROM orders o
      |  WHERE o.o_custkey = c.c_custkey) o
      |WHERE o.n_orders >= 8
      |ORDER BY c.c_custkey""".stripMargin

  // --------------------------------------------------------- q_merge_upsert_sql
  /** SQL-TEXT twin of the batch MERGE (round-7 verdict item 7): the
    * last big ETL shape the SQL-entry family didn't cover. The CTE form
    * mirrors q_merge_upsert (Etl.scala) clause for clause — target CTE,
    * CDC-batch CTE with D/U/I derivation, one keyed full-outer join,
    * audit filter — submitted as a `spark.sql` string against the keyed
    * views, so a SQL client gets the identical merge plan a DataFrame
    * caller gets (PlanSpec pins physical-shape identity with the
    * DataFrame twin: same narrowed join, same no-BNLJ guarantee). The
    * update arm spells out the DuckDB-parity round (Parity.dround's
    * definition) in SQL text — Spark's own `round` half-ups the
    * SHORTEST-DECIMAL string, not the IEEE double (Parity.scala), and
    * the oracle would catch the divergence. */
  private def mergeUpsertSqlText(s: SparkSession, d: String): DataFrame = {
    val t = sqlViews(s, d)
    s.sql(
      s"""WITH t AS (
         |  SELECT o_orderkey, o_totalprice FROM graft_orders_$t
         |  WHERE o_orderdate < TIMESTAMP '1997-01-01'),
         |b AS (
         |  SELECT o_orderkey, op,
         |    CASE WHEN op = 'I' THEN o_totalprice END AS ins_price
         |  FROM (
         |    SELECT o_orderkey, o_totalprice,
         |      CASE WHEN o_orderdate < TIMESTAMP '1997-01-01'
         |             AND o_orderkey % 11 = 0 THEN 'D'
         |           WHEN o_orderdate < TIMESTAMP '1997-01-01'
         |             AND o_orderkey % 7 = 0 THEN 'U'
         |           WHEN o_orderdate >= TIMESTAMP '1997-01-01'
         |             AND o_orderkey % 13 = 0 THEN 'I' END AS op
         |    FROM graft_orders_$t)
         |  WHERE op IS NOT NULL)
         |SELECT coalesce(t.o_orderkey, b.o_orderkey) AS o_orderkey,
         |  CASE WHEN b.op = 'D' THEN 'delete' WHEN b.op = 'U' THEN 'update'
         |    ELSE 'insert' END AS action,
         |  CASE WHEN b.op = 'U' THEN
         |         CASE WHEN t.o_totalprice * 1.10 >= 0
         |           THEN floor(t.o_totalprice * 1.10 * 100.0 + 0.5) / 100.0
         |           ELSE -(floor(-(t.o_totalprice * 1.10) * 100.0 + 0.5) / 100.0)
         |         END
         |       WHEN b.op = 'I' THEN b.ins_price END AS merged_price
         |FROM t FULL OUTER JOIN b ON t.o_orderkey = b.o_orderkey
         |WHERE b.op IS NOT NULL
         |ORDER BY o_orderkey""".stripMargin)
  }

  private val mergeUpsertSqlTextSql =
    """WITH t AS (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_orderdate < TIMESTAMP '1997-01-01'),
      |b AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderdate < TIMESTAMP '1997-01-01' AND o_orderkey % 11 = 0
      |           THEN 'D'
      |         WHEN o_orderdate < TIMESTAMP '1997-01-01' AND o_orderkey % 7 = 0
      |           THEN 'U'
      |         WHEN o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderkey % 13 = 0
      |           THEN 'I' END AS op,
      |    o_totalprice AS ins_price
      |  FROM orders)
      |SELECT b.o_orderkey,
      |  CASE b.op WHEN 'D' THEN 'delete' WHEN 'U' THEN 'update'
      |    ELSE 'insert' END AS action,
      |  CASE b.op WHEN 'U' THEN round(t.o_totalprice * 1.10, 2)
      |    WHEN 'I' THEN b.ins_price END AS merged_price
      |FROM b LEFT JOIN t USING (o_orderkey)
      |WHERE b.op IS NOT NULL
      |ORDER BY b.o_orderkey""".stripMargin

  // ------------------------------------------------------------------ q_unpivot
  /** Unpivot/melt (wide → long) — the inverse of q_pivot, via Spark's
    * native `unpivot` API (Catalyst Expand: each input row fans out to
    * one row per value column IN the same task, no shuffle until the
    * downstream agg). The long shape is what metric stores and
    * column-profiling pipelines ingest; the per-metric rollup keeps the
    * verified output narrow. Static variable/value column names — the
    * melt never discovers columns from data (the schema stays fixed at
    * 100 TB exactly like q_pivot's explicit value list). */
  private def unpivotMetrics(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .unpivot(
        ids = Array(col("l_orderkey"), col("l_linenumber")),
        values = Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        variableColumnName = "metric",
        valueColumnName = "val")
      .groupBy(col("metric"))
      .agg(count(lit(1)).as("n"),
        dround(sum(col("val")), 2).as("sum_val"),
        dround(avg(col("val")), 4).as("avg_val"))
      .orderBy(col("metric"))

  private val unpivotSql =
    """WITH long AS (
      |  SELECT 'l_quantity' AS metric, l_quantity AS val FROM lineitem
      |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
      |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
      |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
      |SELECT metric, count(*) AS n,
      |  round(sum(val), 2) AS sum_val,
      |  round(avg(val), 4) AS avg_val
      |FROM long
      |GROUP BY metric
      |ORDER BY metric""".stripMargin

  // -------------------------------------------------------------------- q_pivot
  /** Pivot (long → wide): per-user value totals with one column per
    * event type. The pivot values are an EXPLICIT literal list — without
    * it Spark runs an extra distinct pass over the data to discover
    * them, and the output schema becomes data-dependent (a 100 TB
    * anti-pattern; schemas must be static for downstream consumers).
    * Catalyst compiles this to one hash aggregation with a
    * CASE-WHEN-per-value — exactly the SQL the oracle states. */
  private def pivotByType(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(dround(sum(col("value")), 2))
      .orderBy(col("user_id"))

  private val pivotSql =
    """SELECT user_id,
      |  round(sum(CASE WHEN event_type = 'click' THEN "value" END), 2) AS click,
      |  round(sum(CASE WHEN event_type = 'error' THEN "value" END), 2) AS error,
      |  round(sum(CASE WHEN event_type = 'purchase' THEN "value" END), 2) AS purchase,
      |  round(sum(CASE WHEN event_type = 'signup' THEN "value" END), 2) AS signup,
      |  round(sum(CASE WHEN event_type = 'view' THEN "value" END), 2) AS view
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // ------------------------------------------------------------ q_subquery_corr
  /** Correlated subqueries through the `spark.sql` surface: a correlated
    * scalar subquery (balance above the per-nation average) and a
    * correlated EXISTS, both of which Catalyst DECORRELATES into joins —
    * the scalar subquery becomes an aggregate + equi-join on the
    * correlation key, EXISTS a left-semi join — so the executed plan is
    * ordinary shuffle relational algebra, not a per-row re-execution
    * (the SQL-92 nested reading would be O(n²) scans at 100 TB). Also
    * exercises temp-view registration, the SQL-first entry path.
    *
    * Parity discipline: "balance > nation average" is evaluated in
    * INTEGER CENTS as bal_cents·n > Σcents — a raw `> avg(double)`
    * compares against a value that differs between engines (and across
    * Spark runs) by accumulation-order ulps, so a borderline customer
    * could flip engines nondeterministically. Balances are 2-decimal by
    * construction, so cents are exact. */
  private def subqueryCorr(s: SparkSession, d: String): DataFrame = {
    val t = sqlViews(s, d)
    s.sql(s"""
      SELECT c_custkey, n_name, c_acctbal
      FROM graft_customer_$t c JOIN graft_nation_$t n ON c_nationkey = n_nationkey
      WHERE CAST(round(c_acctbal * 100) AS BIGINT) *
              (SELECT count(*) FROM graft_customer_$t c2
               WHERE c2.c_nationkey = c.c_nationkey)
            > (SELECT sum(CAST(round(c2.c_acctbal * 100) AS BIGINT))
               FROM graft_customer_$t c2 WHERE c2.c_nationkey = c.c_nationkey)
        AND EXISTS (SELECT 1 FROM graft_customer_$t c3
                    WHERE c3.c_nationkey = c.c_nationkey
                      AND c3.c_acctbal < 0)
      ORDER BY c_custkey""")
  }

  private val subqueryCorrSql =
    """SELECT c_custkey, n_name, c_acctbal
      |FROM customer c JOIN nation n ON c_nationkey = n_nationkey
      |WHERE CAST(round(c_acctbal * 100) AS BIGINT) *
      |        (SELECT count(*) FROM customer c2
      |         WHERE c2.c_nationkey = c.c_nationkey)
      |      > (SELECT CAST(sum(CAST(round(c2.c_acctbal * 100) AS BIGINT)) AS BIGINT)
      |         FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
      |  AND EXISTS (SELECT 1 FROM customer c3
      |              WHERE c3.c_nationkey = c.c_nationkey
      |                AND c3.c_acctbal < 0)
      |ORDER BY c_custkey""".stripMargin

  // ------------------------------------------------------------ q_grouping_sets
  /** Explicit GROUPING SETS (completing the rollup/cube surface with
    * the general form): per-(nation, priority), per-nation and
    * per-priority aggregates in ONE pass — Catalyst expands the sets
    * into a single Expand + hash aggregation, not three scans. gid
    * disambiguates rows whose grouping keys are genuinely NULL. */
  private def groupingSets(s: SparkSession, d: String): DataFrame = {
    val t = sqlViews(s, d)
    s.sql(s"""
      SELECT n_name, o_orderpriority,
        CAST(grouping(n_name) * 2 + grouping(o_orderpriority) AS INT) AS gid,
        count(*) AS n,
        round(sum(o_totalprice), 2) AS revenue
      FROM graft_orders_$t JOIN graft_customer_$t ON o_custkey = c_custkey
                    JOIN graft_nation_$t ON c_nationkey = n_nationkey
      GROUP BY GROUPING SETS ((n_name, o_orderpriority), (n_name), (o_orderpriority))
      ORDER BY gid, n_name NULLS FIRST, o_orderpriority NULLS FIRST""")
  }

  private val groupingSetsSql =
    """SELECT n_name, o_orderpriority,
      |  CAST(grouping(n_name) * 2 + grouping(o_orderpriority) AS INT) AS gid,
      |  count(*) AS n,
      |  round(sum(o_totalprice), 2) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |            JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY GROUPING SETS ((n_name, o_orderpriority), (n_name), (o_orderpriority))
      |ORDER BY gid, n_name NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  // --------------------------------------------------------- q_grouping_sets_df
  /** The DataFrame-API twin of q_grouping_sets (round-5 verdict item 6
    * — the Expand-based grouping-sets plan was the last major plan
    * family covered by only one of the two front doors):
    * `Dataset.groupingSets` must compile to the SAME single
    * Expand + hash-aggregation tree the SQL text gets — one engine, two
    * entry surfaces. PlanSpec pins operator-sequence identity between
    * the two; the oracle is the identical GROUPING SETS statement. */
  private def groupingSetsDf(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .groupingSets(
        Seq(Seq(col("n_name"), col("o_orderpriority")), Seq(col("n_name")),
          Seq(col("o_orderpriority"))),
        col("n_name"), col("o_orderpriority"))
      .agg((grouping(col("n_name")) * 2 + grouping(col("o_orderpriority")))
          .cast("int").as("gid"),
        count(lit(1)).as("n"),
        dround(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy(col("gid"), col("n_name").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  // -------------------------------------------------------------- q_percentile
  /** Exact percentiles (continuous interpolation) + median per group —
    * the sort-based exact form next to ApproxAgg's sketches. Exact
    * percentile shuffles every value to its group; at 100 TB the
    * approx sketch (mergeable, bounded memory) is the default and this
    * is the auditing path. Spark `percentile` and DuckDB
    * `quantile_cont` use the same (n−1)·p linear interpolation; the
    * 4-dp rounding absorbs last-ulp differences. */
  private def percentiles(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        dround(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25"),
        dround(expr("percentile(l_extendedprice, 0.5)"), 4).as("median"),
        dround(expr("percentile(l_extendedprice, 0.75)"), 4).as("p75"),
        dround(expr("percentile(l_extendedprice, 0.75) - " +
          "percentile(l_extendedprice, 0.25)"), 4).as("iqr"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  private val percentilesSql =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
      |  round(quantile_cont(l_extendedprice, 0.5), 4) AS median,
      |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
      |  round(quantile_cont(l_extendedprice, 0.75)
      |        - quantile_cont(l_extendedprice, 0.25), 4) AS iqr,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // --------------------------------------------------------------- q_histogram
  /** Fixed-width histogram of event values per event type: bin =
    * floor(value / 10), capped into [0, 10] so the bin count — and the
    * output size — is a CONSTANT regardless of data scale (open-ended
    * top bin catches outliers). One hash aggregation; integer bin
    * arithmetic, no floating boundaries to disagree on. */
  private def histogram(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"),
        least(greatest(floor(col("value") / 10).cast("int"), lit(0)), lit(10))
          .as("bin"))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("bin"))

  private val histogramSql =
    """SELECT event_type,
      |  least(greatest(CAST(floor("value" / 10) AS INT), 0), 10) AS bin,
      |  count(*) AS n
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY event_type, bin""".stripMargin

  // ----------------------------------------------------------------- q_profile
  /** Column profiling — the ANALYZE/stats-collection pass every
    * warehouse runs before trusting a snapshot (null counts, exact
    * distinct cardinalities, min/max per column), as a UNION of
    * per-column two-level aggregations: each branch reads its single
    * pruned column, groupBy(value)→count keeps every aggregate buffer
    * primitive (hash-based, map-side partials, shuffles ≤|distinct|
    * rows), and the per-column stats reduce over the tiny distinct-
    * value frame. At 100 TB the exact distincts swap for
    * approx_count_distinct sketches (n_agg_approx holds that surface)
    * without changing this shape. Numeric and string columns carry
    * their min/max in typed column pairs (the other pair null), so
    * parity needs no number→string formatting contract. */
  private def profile(s: SparkSession, d: String): DataFrame = {
    // two-level per-column profile: groupBy(value)→counts (all-primitive
    // HashAggregate buffers, partial-agg'd, shuffles ≤|distinct| rows),
    // then one tiny agg over the distinct-value frame. A single-pass
    // multi-DISTINCT Expand would carry string min/max buffers and
    // degrade the whole 5×-expanded scan to SortAggregate (measured 5.6 s
    // warm vs <1 s for this shape at sf0.1).
    def one(valueCol: Column, name: String, numeric: Boolean): DataFrame = {
      val g = Tables.lineitem(s, d).groupBy(valueCol.as("v"))
        .agg(count(lit(1)).as("cnt"))
      val base = g.agg(
        sum(col("cnt")).as("n_rows"),
        sum(when(col("v").isNull, col("cnt")).otherwise(0L)).as("n_nulls"),
        count(when(col("v").isNotNull, 1)).as("n_distinct"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
      val typed =
        if (numeric) base.select(col("n_rows"), col("n_nulls"), col("n_distinct"),
          col("mn").cast("double").as("min_num"),
          col("mx").cast("double").as("max_num"),
          lit(null).cast("string").as("min_str"),
          lit(null).cast("string").as("max_str"))
        else base.select(col("n_rows"), col("n_nulls"), col("n_distinct"),
          lit(null).cast("double").as("min_num"),
          lit(null).cast("double").as("max_num"),
          col("mn").cast("string").as("min_str"),
          col("mx").cast("string").as("max_str"))
      typed.select(lit(name).as("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_num"), col("max_num"), col("min_str"),
        col("max_str"))
    }
    one(col("l_quantity"), "l_quantity", numeric = true)
      .unionAll(one(col("l_discount"), "l_discount", numeric = true))
      .unionAll(one(col("l_returnflag"), "l_returnflag", numeric = false))
      .unionAll(one(col("l_shipdate").cast("date").cast("string"),
        "l_shipdate", numeric = false))
      .orderBy(col("col_name"))
  }

  private val profileSql =
    """WITH a AS (
      |  SELECT count(*) AS n,
      |    sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS nn_q,
      |    count(DISTINCT l_quantity) AS nd_q,
      |    CAST(min(l_quantity) AS DOUBLE) AS mn_q,
      |    CAST(max(l_quantity) AS DOUBLE) AS mx_q,
      |    sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS nn_p,
      |    count(DISTINCT l_discount) AS nd_p,
      |    CAST(min(l_discount) AS DOUBLE) AS mn_p,
      |    CAST(max(l_discount) AS DOUBLE) AS mx_p,
      |    sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS nn_f,
      |    count(DISTINCT l_returnflag) AS nd_f,
      |    min(l_returnflag) AS mn_f,
      |    max(l_returnflag) AS mx_f,
      |    sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS nn_d,
      |    count(DISTINCT l_shipdate) AS nd_d,
      |    CAST(CAST(min(l_shipdate) AS DATE) AS VARCHAR) AS mn_d,
      |    CAST(CAST(max(l_shipdate) AS DATE) AS VARCHAR) AS mx_d
      |  FROM lineitem)
      |SELECT 'l_quantity' AS col_name, n AS n_rows,
      |  CAST(nn_q AS BIGINT) AS n_nulls, nd_q AS n_distinct,
      |  mn_q AS min_num, mx_q AS max_num,
      |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
      |FROM a
      |UNION ALL
      |SELECT 'l_discount', n, CAST(nn_p AS BIGINT), nd_p, mn_p, mx_p,
      |  NULL, NULL FROM a
      |UNION ALL
      |SELECT 'l_returnflag', n, CAST(nn_f AS BIGINT), nd_f,
      |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), mn_f, mx_f FROM a
      |UNION ALL
      |SELECT 'l_shipdate', n, CAST(nn_d AS BIGINT), nd_d,
      |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), mn_d, mx_d FROM a
      |ORDER BY col_name""".stripMargin

  // --------------------------------------------------------------- q_stats_agg
  /** Statistical aggregate surface: Pearson correlation, sample
    * covariance, sample stddev/variance per group — all single-pass
    * mergeable moment sketches in both engines (sum, sum², sum·xy), so
    * they scale exactly like plain sums. Sample (n−1) forms on both
    * sides; 4-dp rounding absorbs accumulation-order ulps. */
  private def statsAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        dround(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
        dround(covar_samp(col("l_quantity"), col("l_extendedprice")), 4)
          .as("covar_qp"),
        dround(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
        dround(var_samp(col("l_quantity")), 4).as("var_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  private val statsAggSql =
    """SELECT l_returnflag,
      |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
      |  round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qp,
      |  round(stddev_samp(l_extendedprice), 4) AS sd_price,
      |  round(var_samp(l_quantity), 4) AS var_qty,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_stats_agg", statsAgg, Some(statsAggSql)),
    QueryDef("q_profile", profile, Some(profileSql)),
    QueryDef("q_histogram", histogram, Some(histogramSql)),
    QueryDef("q_grouping_sets", groupingSets, Some(groupingSetsSql)),
    QueryDef("q_grouping_sets_df", groupingSetsDf, Some(groupingSetsSql)),
    QueryDef("q_percentile", percentiles, Some(percentilesSql)),
    QueryDef("q_subquery_corr", subqueryCorr, Some(subqueryCorrSql)),
    QueryDef("q_pivot", pivotByType, Some(pivotSql)),
    QueryDef("q_unpivot", unpivotMetrics, Some(unpivotSql)),
    QueryDef("q_sql_entry", sqlEntry, Some(sqlEntrySql)),
    QueryDef("q_sql_window", sqlWindow, Some(sqlWindowSql)),
    QueryDef("q_sql_subquery", sqlSubquery, Some(sqlSubquerySql)),
    QueryDef("q_sql_lateral", sqlLateral, Some(sqlLateralSql)),
    QueryDef("q_merge_upsert_sql", mergeUpsertSqlText, Some(mergeUpsertSqlTextSql)),
    QueryDef("q_agg_basic", aggBasic, Some(aggBasicSql)),
    QueryDef("q_supplier_rollup", supplierRollup, Some(supplierRollupSql)),
    QueryDef("q_scan_project", scanProject, Some(scanProjectSql)),
    QueryDef("q_filter_pred", filterPred, Some(filterPredSql)),
    QueryDef("q_sort_limit", sortLimit, Some(sortLimitSql)),
    QueryDef("q_join_inner", joinInner, Some(joinInnerSql)),
    QueryDef("q_join_broadcast", joinBroadcast, Some(joinBroadcastSql)),
    QueryDef("q_join_bucketed", joinBucketed, Some(joinBucketedSql)),
    QueryDef("q_join_spj", joinSpj, Some(joinSpjSql)),
    QueryDef("q_join_spj_days", joinSpjDays, Some(joinSpjDaysSql)),
    QueryDef("q_join_spj_trunc", joinSpjTrunc, Some(joinSpjTruncSql)),
    QueryDef("q_join_committed_bucketed", joinCommittedBucketed,
      Some(joinCommittedBucketedSql)),
    QueryDef("q_join_multi", joinMulti, Some(joinMultiSql)),
    QueryDef("q_join_outer", joinOuter, Some(joinOuterSql)),
    QueryDef("q_join_semi_anti", joinSemiAnti, Some(joinSemiAntiSql)),
    QueryDef("q_agg_distinct", aggDistinct, Some(aggDistinctSql)),
    QueryDef("q_agg_rollup_cube", aggRollupCube, Some(aggRollupCubeSql)),
    QueryDef("q_agg_having", aggHaving, Some(aggHavingSql)),
    QueryDef("q_set_ops", setOps, Some(setOpsSql)),
    QueryDef("q_set_ops_all", setOpsAll, Some(setOpsAllSql)),
    QueryDef("q_salted_agg", saltedAgg, Some(saltedAggSql)),
    QueryDef("q_salted_join", saltedJoin, Some(saltedJoinSql)),
    QueryDef("q_cast_norm", castNorm, Some(castNormSql)),
    QueryDef("q_datetime", datetimeFns, Some(datetimeSql)),
    QueryDef("q_math_fns", mathFns, Some(mathFnsSql)),
    QueryDef("q_string_fns", stringFns, Some(stringFnsSql)),
  )
}
