package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative DATA-QUALITY constraint checking — the validation gate
  * (the Deequ / Great Expectations capability class, reduced to its
  * load-bearing minimum) every production table passes before serving:
  * a set of declared constraints is evaluated into one violation-count
  * report row per check, and a gate reads `passed` off the report.
  *
  * Evaluation cost model (the 100 TB contract):
  *  - All ROW-LOCAL checks (`NotNull`, `NonNegative`, `InRange`,
  *    `Accepted`, `Matches`) fold into ONE aggregation over ONE scan —
  *    each check is a `sum(violation-predicate)` expression, so adding
  *    a check adds a codegen'd column, never a pass.
  *  - `Unique` needs a distinct count (its own shuffle by definition).
  *  - `ForeignKey` is a left-anti probe against the dimension —
  *    broadcast when the dimension is small, the usual join planning
  *    otherwise.
  * The report is |checks| rows of scalars — driver-safe at any table
  * size. Generalizes the reference's edge validation (RequestValidator
  * + Swagger required/type constraints, `serverless.core.yml:165-170`)
  * from one record at the gateway to a table-level contract. */
object QualityChecks {

  /** One declared constraint; `name` keys the report row. */
  sealed trait Check { def name: String }
  /** Column must never be null. */
  final case class NotNull(name: String, col: String) extends Check
  /** Column(s) must be unique across the table (nulls count as values:
    * two null keys are a duplicate). */
  final case class Unique(name: String, cols: Seq[String]) extends Check
  /** Numeric column within [lo, hi] (null = violation — compose with
    * NotNull to tell the two failure modes apart). */
  final case class InRange(name: String, col: String, lo: Double, hi: Double)
    extends Check
  /** Column value drawn from an accepted set (null = violation). */
  final case class Accepted(name: String, col: String, values: Seq[String])
    extends Check
  /** String column matches a regex (null = violation). */
  final case class Matches(name: String, col: String, regex: String)
    extends Check
  /** Every non-null value of `col` exists in `dim`'s `dimCol`
    * (referential integrity; the dim side is aggregated to distinct
    * keys before the anti-probe). */
  final case class ForeignKey(name: String, col: String, dim: DataFrame,
      dimCol: String) extends Check

  /** The ROW-LOCAL checks as CHECK-constraint SQL — the bridge between
    * detect-downstream (`report` / q_dq_report) and reject-at-write
    * ([[TableCommit.addConstraint]]): one declarative definition, both
    * enforcement points, with IDENTICAL violation semantics — the
    * report counts a NULL as a violation for InRange/Accepted/Matches
    * (this class declares "null = violation; compose with NotNull to
    * tell the failure modes apart"), and SQL CHECK passes NULL
    * predicates, so each emitted expression carries an explicit
    * `IS NOT NULL` conjunct to keep gate ≡ report. `Unique` and
    * `ForeignKey` return None — they are not row-local (a write-set
    * uniqueness check cannot see the rest of the table, so installing
    * them as write gates would promise more than it checks; they stay
    * report-side). */
  def toConstraintSql(c: Check): Option[(String, String)] = c match {
    case NotNull(n, col0) => Some(n -> s"$col0 IS NOT NULL")
    case InRange(n, col0, lo, hi) =>
      Some(n -> s"$col0 IS NOT NULL AND $col0 >= $lo AND $col0 <= $hi")
    case Accepted(n, col0, vs) =>
      // an EMPTY accepted set means every row violates (report counts
      // `not isin()` of nothing as a violation for all non-null values
      // and null as one too) — the gate twin is the constant FALSE
      // predicate, not an unparseable `IN ()`
      if (vs.isEmpty) Some(n -> "FALSE")
      else Some(n -> vs.map(v => s"'${sqlLit(v)}'")
        .mkString(s"$col0 IS NOT NULL AND $col0 IN (", ", ", ")"))
    case Matches(n, col0, re) =>
      Some(n -> (s"$col0 IS NOT NULL AND " +
        s"$col0 RLIKE '${sqlLit(re)}'"))
    case _ => None
  }

  /** Escape a value for embedding in a Spark SQL string literal.
    * Backslash FIRST: Spark's default literal parsing treats `\` as an
    * escape, so a regex like `^\d+$` would otherwise reach the gate as
    * `^d+$` — silently diverging from `report()`'s Column.rlike, which
    * sees the raw string (the gate ≡ report invariant). */
  private def sqlLit(v: String): String =
    v.replace("\\", "\\\\").replace("'", "''")

  /** Install every row-local check as a table CHECK constraint
    * (validating existing rows first — [[TableCommit.addConstraint]]'s
    * contract); returns the installed names. Non-row-local checks are
    * skipped, not errored: a pipeline declares ONE check list and gets
    * write-gating for the subset that can gate. */
  def installConstraints(s: SparkSession, table: String,
      checks: Seq[Check]): Seq[String] =
    checks.flatMap(toConstraintSql).map { case (name, sql) =>
      TableCommit.addConstraint(s, table, name, sql)
      name
    }

  /** Evaluate `checks` over `df` → report rows
    * (check_name, violations, n_rows, passed), one per check, ordered
    * by check name. */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    // coalesce: sum over ZERO rows is NULL, and a zero-row upstream is
    // exactly the breakage a gate must report as 0 violations / passed
    // (consistent with Unique/ForeignKey, whose counts are 0 when empty)
    def viol(c: Column): Column = coalesce(sum(when(c, 1L).otherwise(0L)), lit(0L))
    val rowLocal: Seq[(String, Column)] = checks.collect {
      case NotNull(n, c) => n -> viol(col(c).isNull)
      case InRange(n, c, lo, hi) =>
        n -> viol(col(c).isNull || col(c) < lo || col(c) > hi)
      case Accepted(n, c, vs) =>
        n -> viol(col(c).isNull ||
          !col(c).isin(vs.map(_.asInstanceOf[Any]): _*))
      case Matches(n, c, re) =>
        n -> viol(col(c).isNull || !col(c).rlike(re))
    }
    val total = count(lit(1L)).as("n_rows")
    val nRows = col("n_rows")
    // ONE pass for every row-local check + the row count; the 1-row
    // aggregate explodes into report rows via a map generator (a
    // union-of-selects here would plan one scan PER check)
    val scalarReport = Option.when(rowLocal.nonEmpty) {
      df.agg(total, rowLocal.map { case (n, e) => e.as(s"v_$n") }: _*)
        .select(explode(map(rowLocal.flatMap { case (n, _) =>
          Seq(lit(n), col(s"v_$n")) }: _*))
          .as(Seq("check_name", "violations")), nRows)
    }
    val uniqueReports = checks.collect { case Unique(n, cs) =>
      df.agg(count(lit(1L)).as("n_rows"),
        count_distinct(struct(cs.map(col): _*)).as("d"))
        .select(lit(n).as("check_name"),
          (col("n_rows") - col("d")).as("violations"), nRows)
    }
    val fkReports = checks.collect { case ForeignKey(n, c, dim, dc) =>
      val keys = dim.select(col(dc).as(c)).distinct()
      val orphans = df.filter(col(c).isNotNull)
        .join(keys, Seq(c), "left_anti")
        .agg(count(lit(1L)).as("violations"))
      df.agg(count(lit(1L)).as("n_rows")).crossJoin(orphans)
        .select(lit(n).as("check_name"), col("violations"), nRows)
    }
    (scalarReport.toSeq ++ uniqueReports ++ fkReports)
      .reduce(_.unionByName(_))
      .withColumn("passed", col("violations") === 0L)
      .orderBy(col("check_name"))
  }
}
