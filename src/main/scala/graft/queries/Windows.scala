package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.functions.Parity.dround
import graft.sources.Tables

/** Phase 3 — window functions, deterministic dedup, theta/range join
  * (SURVEY.md §7 phase 3).
  *
  * Scale notes: every window here partitions by a high-cardinality key
  * (custkey / user_id) so state per partition stays small at 100 TB; a window
  * partitioned by a low-cardinality key would funnel the table through few
  * tasks. The theta join pairs an equi key with a bounded time range —
  * Spark executes it as an equi shuffle join with the range as residual
  * predicate; unbounded-range pairing would be O(n²) per key and is the case
  * for time-bucketized pre-joining at scale.
  */
object Windows {

  // --------------------------------------------------------------- q_window_rank
  /** Ranking windows: top-3 orders per customer. Window ordering includes the
    * unique o_orderkey so row_number is deterministic under price ties
    * (SURVEY.md §5.3). */
  private def windowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rk"),
        dense_rank().over(w).as("drk"))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  private val windowRankSql =
    """SELECT * FROM (
      |  SELECT o_custkey, o_orderkey,
      |    round(o_totalprice, 2) AS price,
      |    row_number() OVER w AS rn,
      |    rank() OVER w AS rk,
      |    dense_rank() OVER w AS drk
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
      |)
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  // ----------------------------------------------------------- q_window_analytic
  /** Analytic windows: lag/lead, first/last and a running sum over an
    * explicit rows frame, per user in event-time order (unique event_id as
    * tiebreak). */
  private def windowAnalytic(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        round(col("value"), 2).as("v"),
        round(lag(col("value"), 1).over(w), 2).as("prev_v"),
        round(lead(col("value"), 1).over(w), 2).as("next_v"),
        round(first(col("value")).over(running), 2).as("first_v"),
        dround(sum(col("value")).over(running), 2).as("running_sum"),
        count(lit(1)).over(running).as("seq_no"))
      .orderBy(col("user_id"), col("seq_no"))
  }

  private val windowAnalyticSql =
    """SELECT event_id, user_id,
      |  round("value", 2) AS v,
      |  round(lag("value", 1) OVER w, 2) AS prev_v,
      |  round(lead("value", 1) OVER w, 2) AS next_v,
      |  round(first_value("value") OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS first_v,
      |  round(sum("value") OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_sum,
      |  count(*) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq_no
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
      |ORDER BY user_id, seq_no""".stripMargin

  // -------------------------------------------------------- q_window_range_frame
  /** Range frame over epoch seconds: per-user moving 10-minute window
    * (count + sum). Value-based frames are deterministic under ties by
    * construction — tied sort keys share the same frame. */
  private def windowRangeFrame(s: SparkSession, d: String): DataFrame = {
    val wr = Window.partitionBy(col("user_id")).orderBy(col("ts_s"))
      .rangeBetween(-600, 0)
    Tables.events(s, d)
      .withColumn("ts_s", unix_timestamp(col("ts")))
      .select(col("event_id"), col("user_id"), col("ts_s"),
        count(lit(1)).over(wr).as("n_10m"),
        dround(sum(col("value")).over(wr), 2).as("sum_10m"))
      .orderBy(col("event_id"))
  }

  private val windowRangeFrameSql =
    """SELECT event_id, user_id, ts_s,
      |  count(*) OVER w AS n_10m,
      |  round(sum("value") OVER w, 2) AS sum_10m
      |FROM (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events)
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
      |             RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  // -------------------------------------------------------------------- q_dedup
  /** Duplicate removal with a deterministic survivor: earliest (ts, event_id)
    * per (user_id, event_type) via row_number=1 — the reliable form of
    * dropDuplicates(subset), whose survivor is partition-order-dependent
    * (ref R24 TTL'd verdict cache: first event wins —
    * `serverless.core.yml:40`). */
  private def dedup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_timestamp(col("ts")).as("ts_s"))
      .orderBy(col("user_id"), col("event_type"))
  }

  private val dedupSql =
    """SELECT user_id, event_type, event_id,
      |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
      |FROM (
      |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
      |                               ORDER BY ts ASC, event_id ASC) AS rn
      |  FROM events)
      |WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin

  // ----------------------------------------------------------- q_join_theta_range
  /** Non-equi range join: events followed by other events of the same user
    * within one hour (ref R24 session pairing). Equi key (user_id) +
    * bounded range residual → Spark plans the shuffle on user_id only. */
  private def joinThetaRange(s: SparkSession, d: String): DataFrame = {
    val e1 = Tables.events(s, d).select(
      col("event_id").as("id1"), col("user_id").as("u1"), col("ts").as("ts1"))
    val e2 = Tables.events(s, d).select(
      col("event_id").as("id2"), col("user_id").as("u2"), col("ts").as("ts2"),
      col("value").as("v2"))
    e1.join(e2,
        col("u1") === col("u2") &&
        col("ts2") > col("ts1") &&
        col("ts2") <= col("ts1") + expr("INTERVAL 1 HOUR"))
      .groupBy(col("id1"))
      .agg(count(lit(1)).as("n_follow"),
        dround(sum(col("v2")), 2).as("follow_value"))
      .orderBy(col("id1"))
  }

  private val joinThetaRangeSql =
    """SELECT e1.event_id AS id1, count(*) AS n_follow,
      |  round(sum(e2."value"), 2) AS follow_value
      |FROM events e1 JOIN events e2
      |  ON e1.user_id = e2.user_id
      | AND e2.ts > e1.ts
      | AND e2.ts <= e1.ts + INTERVAL 1 HOUR
      |GROUP BY e1.event_id
      |ORDER BY id1""".stripMargin

  // ---------------------------------------------------------------- q_join_asof
  /** AS-OF join (the brief's flagship custom-operator example): for each
    * click, the most recent purchase of the same user at or before the
    * click's time. Implemented Spark-first with the UNION-WINDOW
    * technique — tag both sides, sort each user's merged timeline once,
    * and carry the last non-null purchase forward with
    * `last(_, ignoreNulls)`. One shuffle on user_id, O(n log n) per key,
    * versus the range self-join which explodes into per-key pairs (and
    * needs an arbitrary time bound to stay finite). Determinism:
    * purchases sort before clicks at equal ts (inclusive ≤ semantics)
    * and the unique purchase id breaks purchase-ts ties; click-vs-click
    * order can't change the purchase prefix each click sees. */
  private def joinAsof(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("ts_s"), col("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_s"), lit(0).as("m"),
        col("event_id").as("p_id"), col("value").as("p_val"),
        lit(null).cast("bigint").as("c_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_s"), lit(1).as("m"),
        lit(null).cast("bigint").as("p_id"),
        lit(null).cast("double").as("p_val"),
        col("event_id").as("c_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_s").asc, col("m").asc, col("p_id").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purchases.unionByName(clicks)
      .withColumn("last_p_id", last(col("p_id"), ignoreNulls = true).over(w))
      .withColumn("last_p_val",
        round(last(col("p_val"), ignoreNulls = true).over(w), 2))
      .filter(col("m") === 1)
      .select(col("c_id"), col("user_id"), col("ts_s"),
        col("last_p_id"), col("last_p_val"))
      .orderBy(col("c_id"))
  }

  private val joinAsofSql =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, "value"
      |  FROM events),
      |u AS (
      |  SELECT user_id, ts_s, 0 AS m, event_id AS p_id, "value" AS p_val,
      |    CAST(NULL AS BIGINT) AS c_id
      |  FROM ev WHERE event_type = 'purchase'
      |  UNION ALL
      |  SELECT user_id, ts_s, 1 AS m, NULL, NULL, event_id
      |  FROM ev WHERE event_type = 'click'),
      |wv AS (
      |  SELECT *,
      |    last_value(p_id IGNORE NULLS) OVER w AS last_p_id,
      |    round(last_value(p_val IGNORE NULLS) OVER w, 2) AS last_p_val
      |  FROM u
      |  WINDOW w AS (PARTITION BY user_id
      |               ORDER BY ts_s ASC, m ASC, p_id ASC NULLS LAST
      |               ROWS UNBOUNDED PRECEDING))
      |SELECT c_id, user_id, ts_s, last_p_id, last_p_val
      |FROM wv WHERE m = 1
      |ORDER BY c_id""".stripMargin

  // ------------------------------------------------------ q_window_distribution
  /** Distribution window functions — ntile quartiles, percent_rank,
    * cume_dist over account balance within each market segment. The
    * window order includes the unique custkey so every rank is
    * deterministic under balance ties; percent_rank/cume_dist are exact
    * rationals rounded with the DuckDB-parity dround. Partition key is
    * low-cardinality here (5 segments) but each partition is ranked by a
    * single pass — at 100 TB the same query partitions by a finer key or
    * pre-buckets by range. */
  private def windowDistribution(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        ntile(4).over(w).as("quartile"),
        graft.functions.Parity.dround(percent_rank().over(w), 4).as("pct_rank"),
        graft.functions.Parity.dround(cume_dist().over(w), 4).as("cdist"))
      .orderBy(col("c_custkey"))
  }

  private val windowDistributionSql =
    """SELECT c_custkey, c_mktsegment, c_acctbal,
      |  CAST(ntile(4) OVER w AS INT) AS quartile,
      |  round(percent_rank() OVER w, 4) AS pct_rank,
      |  round(cume_dist() OVER w, 4) AS cdist
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment
      |             ORDER BY c_acctbal ASC, c_custkey ASC)
      |ORDER BY c_custkey""".stripMargin

  // ------------------------------------------------------------------ q_gapfill
  /** Time-series resample + gap-fill: a complete (day × event_type)
    * spine via `sequence`, left-joined daily aggregates, zero-filled
    * counts and FORWARD-FILLED averages (`last(..., ignoreNulls)` over
    * a running frame) — the standard shape for regularizing event data
    * before feature extraction. The spine is generated, not scanned;
    * the window partitions by type and its state is one value, so the
    * fill is a single pass regardless of gap length. Days before a
    * type's first observation stay null — honest, not zero-invented. */
  private def gapfill(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select(to_date(col("ts")).as("day"), col("event_type"), col("value"))
    val daily = ev.groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.functions.Parity.dround(avg(col("value")), 2).as("avg_v"))
    val types = Seq("click", "error", "purchase", "signup", "view")
      .toDF("event_type")
    val spine = ev.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      .select(explode(expr("sequence(mn, mx, interval 1 day)")).as("day"))
      .crossJoin(types)
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("day", "event_type"), "left")
      .select(col("day"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("avg_v"), ignoreNulls = true).over(w).as("avg_filled"))
      .orderBy(col("event_type"), col("day"))
  }

  private val gapfillSql =
    """WITH ev AS (SELECT CAST(ts AS DATE) AS day, event_type, "value"
      |            FROM events),
      |daily AS (SELECT day, event_type, count(*) AS n,
      |            round(avg("value"), 2) AS avg_v
      |          FROM ev GROUP BY 1, 2),
      |b AS (SELECT min(day) AS mn, max(day) AS mx FROM ev),
      |spine AS (SELECT CAST(unnest(generate_series(CAST(mn AS TIMESTAMP),
      |            CAST(mx AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
      |          FROM b),
      |grid AS (SELECT day, t AS event_type FROM spine
      |         CROSS JOIN (VALUES ('click'), ('error'), ('purchase'),
      |                            ('signup'), ('view')) v(t)),
      |j AS (SELECT g.day, g.event_type, coalesce(n, 0) AS n, avg_v
      |      FROM grid g LEFT JOIN daily d USING (day, event_type))
      |SELECT day, event_type, n,
      |  last_value(avg_v IGNORE NULLS) OVER (PARTITION BY event_type
      |    ORDER BY day ROWS UNBOUNDED PRECEDING) AS avg_filled
      |FROM j
      |ORDER BY event_type, day""".stripMargin

  // ---------------------------------------------------------------- q_sessionize
  /** Batch sessionization — the window-function twin of the streaming
    * `session_window` query: a session break is a ≥5-minute gap to the
    * previous event of the same user (lag), and the session id is the
    * running count of breaks (an unbounded-preceding sum) — two window
    * passes over the same (user_id, ts) sort, so Spark sorts once and
    * pipelines both. Gaps compare at full MICROSECOND precision with
    * `>=` — exactly `session_window`'s end-exclusive [start, last+gap)
    * semantics — so the StreamingSpec equivalence holds by construction,
    * not by the data missing boundary gaps (truncating to whole seconds
    * would merge a 300.8 s gap the stream splits). Output aggregates per
    * session; tie-free ordering via event_id. */
  private def sessionize(s: SparkSession, d: String): DataFrame = {
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .withColumn("brk",
        when(col("ts_us") - lag(col("ts_us"), 1).over(order) >= 300000000L, 1L)
          .otherwise(lit(0L)))
      .withColumn("session_id", sum(col("brk")).over(running))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        (min(col("ts_us")) / 1000000L).cast("bigint").as("t_start"),
        (max(col("ts_us")) / 1000000L).cast("bigint").as("t_end"),
        graft.functions.Parity.dround(sum(col("value")), 2).as("session_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  private val sessionizeSql =
    """WITH ev AS (
      |  SELECT event_id, user_id,
      |    epoch_us(ts) AS ts_us, "value"
      |  FROM events),
      |flagged AS (
      |  SELECT *,
      |    CASE WHEN ts_us - lag(ts_us) OVER w >= 300000000 THEN 1 ELSE 0 END AS brk
      |  FROM ev
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |sess AS (
      |  SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id
      |    ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
      |    AS session_id
      |  FROM flagged)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  CAST(min(ts_us) // 1000000 AS BIGINT) AS t_start,
      |  CAST(max(ts_us) // 1000000 AS BIGINT) AS t_end,
      |  round(sum("value"), 2) AS session_value
      |FROM sess
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  // ------------------------------------------------------------- q_range_cooccur
  /** PURE range self-join (no equi key): for every event, how many
    * OTHER events — any user — happened within ±1 s. Naively this is an
    * O(n²) comparison; the scale shape is TIME-BUCKETIZATION: the probe
    * side replicates into its second-bucket and both neighbors, the
    * build side keys by its own bucket, so the equi-join on the bucket
    * makes candidate generation a hash join whose cost tracks events
    * per 3-second window, and the exact ±1 s predicate is a cheap
    * integer residual. Each true pair meets EXACTLY once (the build row
    * owns one bucket), so no dedup pass. The oracle states the naive
    * quadratic form — DuckDB's IEJoin handles it at oracle scale. */
  private def rangeCooccur(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("b", (col("us") / 1000000L).cast("bigint"))
    val probe = ev.select(col("event_id").as("id1"), col("us").as("us1"),
      explode(array(col("b") - 1, col("b"), col("b") + 1)).as("b"))
    val build = ev.select(col("event_id").as("id2"), col("us").as("us2"),
      col("b"))
    probe.join(build, Seq("b"))
      .filter(col("id1") =!= col("id2") &&
        abs(col("us1") - col("us2")) <= 1000000L)
      .groupBy(col("id1"))
      .agg(count(lit(1)).as("n_cooccur"))
      .orderBy(col("id1"))
  }

  private val rangeCooccurSql =
    """WITH ev AS (SELECT event_id, epoch_us(ts) AS us FROM events)
      |SELECT a.event_id AS id1, count(*) AS n_cooccur
      |FROM ev a JOIN ev b
      |  ON a.event_id <> b.event_id
      | AND b.us >= a.us - 1000000
      | AND b.us <= a.us + 1000000
      |GROUP BY a.event_id
      |ORDER BY id1""".stripMargin

  // -------------------------------------------------------------------- q_scd2
  /** Slowly-changing-dimension (type 2) history build: compress each
    * user's event stream into state-validity intervals — one row per
    * state CHANGE carrying [valid_from, valid_to) in epoch-µs and a
    * current flag. Two window passes over ONE (user_id, ts, event_id)
    * sort: lag() detects changes, then lead() over the filtered change
    * rows closes each interval — Spark sorts each user partition once
    * and pipelines both functions (same single-sort shape as
    * q_sessionize). At 100 TB: the only shuffle is by user_id; output
    * rows ∝ state changes, never events; and no self-join — the naive
    * interval construction is events×events per user. This is the
    * dimension-history twin of the streaming upsert sink
    * (n_stream_upsert keeps latest-state; SCD2 keeps the full
    * lineage). */
  private def scd2(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type").as("state"))
      .withColumn("prev", lag(col("state"), 1).over(byUser))
      .filter(col("prev").isNull || col("prev") =!= col("state"))
      .withColumn("valid_to_us", lead(col("ts_us"), 1).over(byUser))
      .select(col("user_id"), col("event_id"), col("state"),
        col("ts_us").as("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.as("is_current"))
      .orderBy(col("user_id"), col("valid_from_us"), col("event_id"))
  }

  private val scd2Sql =
    """WITH ev AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
      |    event_type AS state
      |  FROM events),
      |c AS (
      |  SELECT *, lag(state) OVER (PARTITION BY user_id
      |    ORDER BY ts_us, event_id) AS prev
      |  FROM ev),
      |chg AS (SELECT * FROM c WHERE prev IS NULL OR prev <> state)
      |SELECT user_id, event_id, state, ts_us AS valid_from_us,
      |  lead(ts_us) OVER w AS valid_to_us,
      |  lead(ts_us) OVER w IS NULL AS is_current
      |FROM chg
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
      |ORDER BY user_id, valid_from_us, event_id""".stripMargin

  // ------------------------------------------------------------------- q_funnel
  /** Ordered conversion funnel (view → click → purchase), the product-
    * analytics staple the engine lacked: a user reaches step N only
    * with an event STRICTLY AFTER their step-N−1 time — "clicked, then
    * viewed" does not convert, which is why a per-type min() agg alone
    * is wrong. Three chained conditional window-mins over the SAME
    * user partition resolve the stages: `v` = first view, `c` = first
    * click after `v`, `p` = first purchase after `c` — each frame is
    * the whole partition (no ORDER BY ⇒ no sort), so the plan is ONE
    * exchange by user_id with three pipelined window passes, then a
    * per-user collapse and a scalar aggregate. Output: 3 step rows
    * with reached-counts and step-over-step conversion (step 1
    * converts against the total user base). At 100 TB: user_id is the
    * only shuffle key; the step table is 3 rows. */
  private def funnel(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val staged = Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("v",
        min(when(col("event_type") === "view", col("us"))).over(w))
      .withColumn("c",
        min(when(col("event_type") === "click" && col("us") > col("v"),
          col("us"))).over(w))
      .withColumn("p",
        min(when(col("event_type") === "purchase" && col("us") > col("c"),
          col("us"))).over(w))
    val t = staged.groupBy(col("user_id"))
      .agg(min(col("v")).as("v"), min(col("c")).as("c"), min(col("p")).as("p"))
      .agg(count(lit(1)).as("n_total"), count(col("v")).as("nv"),
        count(col("c")).as("nc"), count(col("p")).as("np"))
    def conv(n: org.apache.spark.sql.Column, prev: org.apache.spark.sql.Column) =
      when(prev === 0L, lit(null).cast("double"))
        .otherwise(graft.functions.Parity.dround(n * lit(1.0) / prev, 4))
    t.select(explode(array(
        struct(lit(1L).as("step"), lit("view").as("stage"),
          col("nv").as("n_users"), conv(col("nv"), col("n_total")).as("conversion")),
        struct(lit(2L).as("step"), lit("click").as("stage"),
          col("nc").as("n_users"), conv(col("nc"), col("nv")).as("conversion")),
        struct(lit(3L).as("step"), lit("purchase").as("stage"),
          col("np").as("n_users"), conv(col("np"), col("nc")).as("conversion"))))
        .as("r"))
      .select(col("r.step"), col("r.stage"), col("r.n_users"),
        col("r.conversion"))
      .orderBy(col("step"))
  }

  private val funnelSql =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |s1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN us END)
      |         OVER (PARTITION BY user_id) AS v FROM ev),
      |s2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND us > v
      |         THEN us END) OVER (PARTITION BY user_id) AS c FROM s1),
      |s3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND us > c
      |         THEN us END) OVER (PARTITION BY user_id) AS p FROM s2),
      |u AS (SELECT user_id, min(v) AS v, min(c) AS c, min(p) AS p
      |      FROM s3 GROUP BY user_id),
      |t AS (SELECT count(*) AS n_total, count(v) AS nv, count(c) AS nc,
      |        count(p) AS np FROM u)
      |SELECT step, stage, n_users, conversion FROM (
      |  SELECT 1 AS step, 'view' AS stage, nv AS n_users,
      |    CASE WHEN n_total = 0 THEN NULL
      |      ELSE round(nv * 1.0 / n_total, 4) END AS conversion FROM t
      |  UNION ALL
      |  SELECT 2, 'click', nc,
      |    CASE WHEN nv = 0 THEN NULL ELSE round(nc * 1.0 / nv, 4) END FROM t
      |  UNION ALL
      |  SELECT 3, 'purchase', np,
      |    CASE WHEN nc = 0 THEN NULL ELSE round(np * 1.0 / nc, 4) END FROM t)
      |ORDER BY step""".stripMargin

  // --------------------------------------------------------- q_retention_cohort
  /** Cohort retention matrix — the other product-analytics staple: each
    * user's cohort is the epoch-WEEK of their first event (a
    * whole-partition window min, no sort), each activity row lands in
    * (cohort_week, week_offset), and retention is that cell's distinct
    * users over the cohort's size (its offset-0 cell — every user is
    * active in their own first week by definition, so offset 0 IS the
    * cohort size). Week bucketing is integer `div` on epoch-µs — a
    * double division rounds UP at exact week boundaries and would fork
    * the two engines' floors. Plan: one exchange by user_id (window),
    * the distinct-count agg, then the cohort size as a WINDOW MAX over
    * the aggregated |cohorts × offsets|-row frame (the q_freq_spectrum
    * bucket-totals pattern) — a self-JOIN back to the base frame would
    * duplicate the whole corpus subtree into the join's build side and
    * scan 100 TB twice. */
  private def retentionCohort(s: SparkSession, d: String): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    val w = Window.partitionBy(col("user_id"))
    val byCohort = Window.partitionBy(col("cohort_wk"))
    Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("wk", expr(s"us div ${weekUs}L"))
      .withColumn("cohort_wk", min(col("wk")).over(w))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .withColumn("n0",
        max(when(col("week_offset") === 0L, col("n_users"))).over(byCohort))
      .select(col("cohort_wk"), col("week_offset"), col("n_users"),
        graft.functions.Parity.dround(col("n_users") * lit(1.0) / col("n0"), 4)
          .as("retention"))
      .orderBy(col("cohort_wk"), col("week_offset"))
  }

  private val retentionCohortSql =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events),
      |c AS (SELECT *, min(wk) OVER (PARTITION BY user_id) AS cohort_wk
      |      FROM ev),
      |r AS (SELECT cohort_wk, wk - cohort_wk AS week_offset,
      |        count(DISTINCT user_id) AS n_users
      |      FROM c GROUP BY 1, 2),
      |z AS (SELECT *, max(CASE WHEN week_offset = 0 THEN n_users END)
      |        OVER (PARTITION BY cohort_wk) AS n0 FROM r)
      |SELECT cohort_wk, week_offset, n_users,
      |  round(n_users * 1.0 / n0, 4) AS retention
      |FROM z
      |ORDER BY cohort_wk, week_offset""".stripMargin

  // ----------------------------------------------------------- q_rolling_active
  /** Rolling active users — DAU, trailing-7-day WAU and the
    * DAU/WAU stickiness ratio per day: the third product-analytics
    * staple (funnel, retention, engagement). A rolling DISTINCT count
    * has no window-function form (frames can't deduplicate), and the
    * naive day×activity range self-join is quadratic in the window —
    * the scale shape is BOUNDED FAN-OUT: each distinct (user, day)
    * activity row contributes to exactly the ≤7 trailing windows it
    * covers, so it explodes into (user, day+0..6) and ONE aggregation
    * counts both measures — `wau7` as the plain distinct and `dau` as
    * the distinct over the offset-0 arm (CASE-null excludes the rest).
    * Day bucketing is integer `div` (the q_retention_cohort boundary
    * rule); the end-of-range guard joins ONE scalar max row. Plan: the
    * (user, day) distinct shuffle, the 7× fan-out (narrow), one
    * grouped agg — output ∝ observed days. */
  private def rollingActive(s: SparkSession, d: String): DataFrame = {
    val dayUs = 86400000000L
    val act = Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .select(col("user_id"), expr(s"us div ${dayUs}L").as("day"))
      .distinct()
    val mx = broadcast(Tables.events(s, d)
      .select(unix_micros(col("ts")).as("us"))
      .agg(max(expr(s"us div ${dayUs}L")).as("mx")))
    act.select(col("user_id"), col("day"),
        explode(sequence(lit(0L), lit(6L))).as("o"))
      .withColumn("wday", col("day") + col("o"))
      .crossJoin(mx).filter(col("wday") <= col("mx"))
      .groupBy(col("wday").as("day"))
      .agg(
        countDistinct(when(col("o") === 0L, col("user_id"))).as("dau"),
        countDistinct(col("user_id")).as("wau7"))
      .select(col("day"), col("dau"), col("wau7"),
        graft.functions.Parity.dround(
          col("dau") * lit(1.0) / col("wau7"), 4).as("stickiness"))
      .orderBy(col("day"))
  }

  private val rollingActiveSql =
    """WITH act AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
      |  FROM events),
      |b AS (SELECT max(epoch_us(ts) // 86400000000) AS mx FROM events),
      |fan AS (
      |  SELECT a.user_id, a.day + o.o AS wday, o.o
      |  FROM act a
      |  CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS o) o
      |  CROSS JOIN b
      |  WHERE a.day + o.o <= b.mx)
      |SELECT wday AS day,
      |  count(DISTINCT CASE WHEN o = 0 THEN user_id END) AS dau,
      |  count(DISTINCT user_id) AS wau7,
      |  round(count(DISTINCT CASE WHEN o = 0 THEN user_id END) * 1.0
      |    / count(DISTINCT user_id), 4) AS stickiness
      |FROM fan GROUP BY wday
      |ORDER BY day""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_rolling_active", rollingActive, Some(rollingActiveSql)),
    QueryDef("q_funnel", funnel, Some(funnelSql)),
    QueryDef("q_retention_cohort", retentionCohort, Some(retentionCohortSql)),
    QueryDef("q_scd2", scd2, Some(scd2Sql)),
    QueryDef("q_range_cooccur", rangeCooccur, Some(rangeCooccurSql)),
    QueryDef("q_sessionize", sessionize, Some(sessionizeSql)),
    QueryDef("q_gapfill", gapfill, Some(gapfillSql)),
    QueryDef("q_window_distribution", windowDistribution,
      Some(windowDistributionSql)),
    QueryDef("q_join_asof", joinAsof, Some(joinAsofSql)),
    QueryDef("q_window_rank", windowRank, Some(windowRankSql)),
    QueryDef("q_window_analytic", windowAnalytic, Some(windowAnalyticSql)),
    QueryDef("q_window_range_frame", windowRangeFrame, Some(windowRangeFrameSql)),
    QueryDef("q_dedup", dedup, Some(dedupSql)),
    QueryDef("q_join_theta_range", joinThetaRange, Some(joinThetaRangeSql)),
  )
}
