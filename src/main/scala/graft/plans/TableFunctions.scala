package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

import graft.operators.TableCommit

/** SQL TABLE-VALUED-FUNCTION front door for the committed table — the
  * "two front doors" discipline applied to the table format: every
  * read surface the Scala API exposes is reachable from a plain SQL
  * string (preference (c): `SparkSessionExtensions
  * .injectTableFunction`, the public seam Spark provides exactly for
  * relation-producing functions — no parser fork, no catalog plugin):
  *
  *  - `graft_table('<path>')`               — newest snapshot
  *  - `graft_table_at('<path>', <id>)`      — time travel
  *  - `graft_table_changes('<path>', <id>)` — CDC delta since snapshot
  *  - `graft_table_feed('<path>', a, b)`    — row-level CDF (ins/del)
  *  - `graft_table_feed4('<path>', a, b)`   — per-commit four-way CDF
  *  - `graft_table_where('<path>', c, lo, hi)`     — #stats-pruned read
  *  - `graft_table_where_lex('<path>', c, lo, hi)` — lexicographic twin
  *  - `graft_table_history('<path>')`       — DESCRIBE HISTORY
  *  - `graft_table_dv_debt('<path>')`       — REORG/PURGE audit
  *
  * Each builder folds its literal arguments at resolution time and
  * returns the SAME analyzed plan the Scala read produces — a pinned
  * manifest-subset parquet scan with schema-of-record and deletion
  * vectors applied — so Catalyst sees an ordinary relation (filters
  * push down, columns prune; the TVF adds zero plan overhead).
  * Arguments must be literals: a table path decided by row values
  * would make snapshot pinning undefined. */
object TableFunctions {

  /** Imperative twin of the `spark.sql.extensions` injection — register
    * the table functions on an EXISTING session (what a driver that
    * didn't pass `--conf spark.sql.extensions=graft.GraftExtensions`
    * calls; idempotent). */
  def register(s: SparkSession): Unit =
    all.foreach { case (ident, info, builder) =>
      s.sessionState.tableFunctionRegistry.registerFunction(
        ident, info, builder)
    }

  private def lit(e: Expression, what: String): Any = e match {
    case l: Literal => l.value
    // FOLDABLE expressions fold here: SQL renders a negative numeric
    // literal as UnaryMinus(Literal), so without this arm a band like
    // graft_table_where(p, c, -5, 10) would be rejected as non-literal
    case f if f.foldable => f.eval()
    case other => throw new IllegalArgumentException(
      s"graft table functions take literal arguments; $what was $other")
  }

  private def path(e: Expression): String =
    String.valueOf(lit(e, "the table path"))

  private def id(e: Expression): Long = lit(e, "the snapshot id") match {
    case n: Number => n.longValue
    case other => throw new IllegalArgumentException(
      s"snapshot id must be an integer literal, got $other")
  }

  private def session: SparkSession = SparkSession.active

  private def num(e: Expression, what: String): BigDecimal =
    lit(e, what) match {
      case d: java.math.BigDecimal => BigDecimal(d)
      case d: org.apache.spark.sql.types.Decimal => d.toBigDecimal
      case n: java.lang.Number => BigDecimal(n.toString)
      case other => throw new IllegalArgumentException(
        s"$what must be a numeric literal, got $other")
    }

  private def str(e: Expression, what: String): String =
    String.valueOf(lit(e, what))

  val all: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan)] = Seq(
    (FunctionIdentifier("graft_table"),
      new ExpressionInfo(getClass.getName, "graft_table"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_table(path)")
        TableCommit.read(session, path(args.head))
          .queryExecution.analyzed
      }),
    (FunctionIdentifier("graft_table_at"),
      new ExpressionInfo(getClass.getName, "graft_table_at"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_table_at(path, snapshotId)")
        TableCommit.readAt(session, path(args.head), id(args(1)))
          .queryExecution.analyzed
      }),
    (FunctionIdentifier("graft_table_changes"),
      new ExpressionInfo(getClass.getName, "graft_table_changes"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_table_changes(path, sinceId)")
        TableCommit.changesSince(session, path(args.head), id(args(1)))
          .queryExecution.analyzed
      }),
    (FunctionIdentifier("graft_table_feed"),
      new ExpressionInfo(getClass.getName, "graft_table_feed"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_table_feed(path, fromId, toId)")
        // row-level CDF with _change_type (Delta's table_changes)
        TableCommit.changeFeed(session, path(args.head), id(args(1)),
          id(args(2))).queryExecution.analyzed
      }),
    (FunctionIdentifier("graft_table_feed4"),
      new ExpressionInfo(getClass.getName, "graft_table_feed4"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_table_feed4(path, fromId, toId)")
        // PRECISE per-commit CDF with the FOUR-WAY classification
        // (insert / delete / update_preimage / update_postimage) +
        // _commit_version — MoR commits replay their writer-recorded
        // change data; others synthesize insert/delete per step
        TableCommit.changeFeedPrecise(session, path(args.head), id(args(1)),
          id(args(2))).queryExecution.analyzed
      }),
    (FunctionIdentifier("graft_table_where"),
      new ExpressionInfo(getClass.getName, "graft_table_where"),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_table_where(path, column, lo, hi)")
        // DATA-SKIPPING read from SQL: manifest `#stats` pruning drops
        // provably-excluded files before parquet sees them — the
        // pushdown Catalyst alone cannot do (parquet footers are
        // per-file; the manifest decision is zero-IO). Result equals
        // graft_table(path) WHERE lo <= col <= hi.
        TableCommit.readWhere(session, path(args.head),
          str(args(1), "the stats column"),
          num(args(2), "lo"), num(args(3), "hi"))
          .queryExecution.analyzed
      }),
    (FunctionIdentifier("graft_table_where_lex"),
      new ExpressionInfo(getClass.getName, "graft_table_where_lex"),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_table_where_lex(path, column, lo, hi)")
        // the STRING/temporal-key twin: code-point-ordered band against
        // the truncated lexicographic stats (typed guard included —
        // numeric columns are refused, temporal bounds re-render)
        TableCommit.readWhereLex(session, path(args.head),
          str(args(1), "the stats column"),
          str(args(2), "lo"), str(args(3), "hi"))
          .queryExecution.analyzed
      }),
    (FunctionIdentifier("graft_table_where_ts"),
      new ExpressionInfo(getClass.getName, "graft_table_where_ts"),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_table_where_ts(path, column, loMicros, hiMicros)")
        // the ZONED-TIMESTAMP twin (round-15): the band is UTC epoch
        // MICROS — the session-independent rendering zoned `#stats`
        // record; result equals graft_table(path) WHERE
        // timestamp_micros(lo) <= col <= timestamp_micros(hi)
        TableCommit.readWhereTs(session, path(args.head),
          str(args(1), "the stats column"), id(args(2)), id(args(3)))
          .queryExecution.analyzed
      }),
    (FunctionIdentifier("graft_table_dv_debt"),
      new ExpressionInfo(getClass.getName, "graft_table_dv_debt"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_table_dv_debt(path)")
        // REORG/PURGE audit: per-file deletion-vector debt, dead
        // counts from the compressed vectors (∝ their bytes)
        val s = session
        import s.implicits._
        TableCommit.dvDebt(s, path(args.head))
          .map(d => (d.file, d.liveRows, d.deadRows,
            // unknowable live count → NaN straight through (BigDecimal
            // would throw on it); consumers see "no ratio", not ~100%
            if (d.liveRows < 0L) Double.NaN
            else BigDecimal(d.deadRatio).setScale(6,
              BigDecimal.RoundingMode.HALF_EVEN).toDouble))
          .toDF("file", "live_rows", "dead_rows", "dead_ratio")
          .queryExecution.analyzed
      }),
    (FunctionIdentifier("graft_table_history"),
      new ExpressionInfo(getClass.getName, "graft_table_history"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_table_history(path)")
        // DESCRIBE HISTORY: one row per retained snapshot, metadata only
        val t = path(args.head)
        val s = session
        import s.implicits._
        val ops = TableCommit.operations(t).toMap
        TableCommit.history(t).map { case (snapId, files) =>
          (snapId, files.length.toLong,
            // LEAF partition dirs at any depth (a two-level layout's
            // d=1/s=a and d=1/s=b are two partitions, not one)
            files.map(TableCommit.partitionDirOf).distinct.length.toLong,
            TableCommit.rowCount(t, snapId).getOrElse(-1L),
            // #op commit annotation (advisory; pre-op manifests null)
            ops.get(snapId).flatten.map(_._1).orNull,
            ops.get(snapId).flatten.map(_._2).getOrElse(-1L))
        }.toDF("snapshot_id", "n_files", "n_partitions", "n_rows",
            "operation", "op_time_ms")
          .queryExecution.analyzed
      }))
}
