package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.EtlOps

/** Branch coverage for the reference-semantic ETL ops, mirroring the
  * reference's table-driven unit style
  * (`/root/reference/tests/common/aws_utils/test_api_gateway.py`). */
class EtlOpsSpec extends GraftSpec {
  import spark.implicits._

  private def props(df: Seq[String]) = df.toDF("props")

  test("paramOrDefault: present, missing key, null map") {
    val out = props(Seq("""{"k": 7}""", """{"other": 1}""", null))
      .select(EtlOps.paramOrDefault(EtlOps.propsMap($"props"), "k", lit(-1)).as("v"))
      .collect().map(_.getInt(0)).toSeq
    assert(out == Seq(7, -1, -1))
  }

  test("requiredStatus marks missing required fields") {
    val out = props(Seq("""{"k": 7}""", "{}"))
      .select(EtlOps.requiredStatus(EtlOps.propsMap($"props"), "k").as("s"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("OK", "MISSING_REQUIRED"))
  }

  test("bearerToken: valid header, malformed header, empty") {
    val out = Seq("Bearer tok123", "Basic abc", "Bearer  spaced", "")
      .toDF("h").select(EtlOps.bearerToken($"h").as("t"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("tok123", "", "spaced", ""))
  }

  test("classifyToken three arms") {
    val df = Seq(("tok", false), ("tok", true), ("", false))
      .toDF("tok", "expired")
    val out = df.select(EtlOps.classifyToken($"tok", $"expired").as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("valid", "expired", "invalid"))
  }

  test("principalOrUnknown falls back off the valid branch") {
    val df = Seq(("valid", "u1"), ("expired", "u2"), ("invalid", ""))
      .toDF("status", "tok")
    val out = df.select(EtlOps.principalOrUnknown($"status", $"tok").as("p"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("u1", "unknown_user", "unknown_user"))
  }

  test("effect Allow/Deny projection") {
    val out = Seq(true, false).toDF("a")
      .select(EtlOps.effect($"a").as("e")).collect().map(_.getString(0)).toSeq
    assert(out == Seq("Allow", "Deny"))
  }

  test("mergeHeaders: extra wins on duplicate keys (dict.update semantics)") {
    val df = Seq(1).toDF("x").select(
      EtlOps.mergeHeaders(
        map(lit("Content-Type"), lit("application/json"), lit("A"), lit("1")),
        map(lit("Content-Type"), lit("text/plain"))).as("h"))
    val m = df.collect()(0).getMap[String, String](0)
    assert(m("Content-Type") == "text/plain" && m("A") == "1")
  }

  test("normStatus accepts int-ish strings like str(int(x))") {
    val out = Seq("200", "404").toDF("c")
      .select(EtlOps.normStatus($"c").as("s")).collect().map(_.getString(0)).toSeq
    assert(out == Seq("200", "404"))
  }

  test("errorSplit routes rows and shapes ErrorResponse records") {
    val df = Seq((1, "ok"), (2, "bad"), (3, "ok")).toDF("id", "st")
    val routed = EtlOps.errorSplit(df, $"st" === "bad",
      lit("BadThing"), lit("desc"), lit(400))
    assert(routed.good.count() == 2)
    val errs = routed.errors.collect()
    assert(errs.toSeq == Seq(Row("BadThing", "desc", "400")))
    assert(routed.errors.columns.toSeq ==
      Seq("error", "description", "status_code"))
  }

  test("compaction collapses the small-file layout without touching content") {
    val rows = graft.SparkEntry.queries("n_compact")(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (before, after) = (r.getAs[Long]("files_before"),
        r.getAs[Long]("files_after"))
      assert(after == 1, s"${r.get(0)}: expected 1 compacted file, got $after")
      assert(before > after, s"${r.get(0)}: layout was not fragmented ($before)")
      assert(r.getAs[Long]("n_rows") > 0)
    }
    // content preserved: compacted per-partition rows equal the source's
    val src = graft.sources.Tables.events(spark, sfTiny)
      .groupBy(col("event_type")).count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    rows.foreach(r =>
      assert(r.getAs[Long]("n_rows") == src(r.getString(0)), r.toString))
  }

  test("merge apply: post-apply table equals the merge-predicted state " +
      "row-for-row; clean partitions are byte-untouched") {
    import graft.queries.Etl
    // first invocation: builds the scaffolding and applies the batch
    val audit1 = graft.SparkEntry.queries("n_merge_apply")(spark, sfTiny)
      .collect()
    assert(audit1.nonEmpty)
    val dirty = Etl.mergeApplyDirty.toSet
    assert(audit1.map(_.getAs[Long]("pt")).toSet.subsetOf(dirty),
      "audit rows outside the dirty partition set")
    val root = Etl.mergeApplyRoot(spark, sfTiny)
    val tableDir = new java.io.File(root, "table")
    def ptFiles(): Map[Long, Map[String, Long]] =
      Option(tableDir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("pt="))
        .map(f => f.getName.stripPrefix("pt=").toLong ->
          Option(f.listFiles()).getOrElse(Array.empty)
            .filter(_.getName.endsWith(".parquet"))
            .map(x => x.getName -> x.lastModified()).toMap)
        .toMap
    val before = ptFiles()
    graft.SparkEntry.queries("n_merge_apply")(spark, sfTiny).collect()
    val after = ptFiles()
    // the MERGE INTO write contract, half 1: write amplification is
    // bounded by the dirty set — clean partitions' files byte-untouched
    // (same names, same mtimes) across a full apply
    for (p <- before.keySet ++ after.keySet; if !dirty.contains(p))
      assert(before.get(p) == after.get(p), s"clean partition $p rewritten")
    assert(dirty.exists(p => before.get(p) != after.get(p)),
      "no dirty partition changed — the apply wrote nothing")
    // half 2: the applied table equals the predicted merged state —
    // dirty partitions carry f(base, batch), clean partitions carry
    // base unchanged — row for row
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("o_orderkey"), col("o_totalprice"),
        col("pt").cast("long").as("pt"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    // snapshot-pinned read: the raw dir retains one past generation of
    // the dirty partitions for in-flight readers (TableCommit retention)
    val applied = rows(graft.operators.TableCommit.read(
      spark, tableDir.getAbsolutePath))
    val baseClean = spark.read
      .parquet(new java.io.File(root, "base").getAbsolutePath)
      .filter(!col("pt").isin(Etl.mergeApplyDirty.map(Long.box): _*))
    val predicted = rows(Etl.mergeApplyMerged(spark, sfTiny)
      .unionByName(baseClean))
    assert(applied == predicted,
      s"applied table diverged from prediction: applied=${applied.size} " +
        s"predicted=${predicted.size}")
    // the audit actions must cover all three merge ops at this SF
    assert(audit1.map(_.getAs[String]("action")).toSet ==
      Set("delete", "update", "insert"))
  }

  test("QualityChecks: each constraint class counts its violations " +
      "exactly on a synthetic table with known defects") {
    import graft.operators.QualityChecks._
    import spark.implicits._
    val dim = Seq(1L, 2L).toDF("k")
    val df = Seq(
      (Option(1L), Option("A"), Option(5.0), "x1", 1L),
      (Option(1L), Option("B"), Option(50.0), "y2", 2L),
      (Option.empty[Long], Option.empty[String], Option.empty[Double], "zz", 3L))
      .toDF("id", "status", "price", "code", "fkc")
    val rep = report(df, Seq(
      NotNull("nn", "id"),
      Unique("uq", Seq("id")),
      InRange("rg", "price", 0, 10),
      Accepted("ac", "status", Seq("A", "B")),
      Matches("mt", "code", "^[a-z][0-9]$"),
      ForeignKey("fk", "fkc", dim, "k")))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(3)))).toMap
    assert(rep("nn") == ((1L, false)), rep.toString) // one null id
    assert(rep("uq") == ((1L, false))) // 1,1,null -> 2 distinct (null counts)
    assert(rep("rg") == ((2L, false))) // 50 out of range + null
    assert(rep("ac") == ((1L, false))) // null status
    assert(rep("mt") == ((1L, false))) // "zz" fails the format
    assert(rep("fk") == ((1L, false))) // fkc=3 has no dim key
    assert(rep.size == 6 && rep.values.forall(_._1 >= 0))
  }

  test("QualityChecks: a ZERO-ROW table reports 0 violations / passed " +
      "for every check class (no NULL sums — the broken-upstream case " +
      "a gate exists to catch must read consistently)") {
    import graft.operators.QualityChecks._
    import spark.implicits._
    val dim = Seq(1L).toDF("k")
    val df = Seq.empty[(Option[Long], Option[String], Long)]
      .toDF("id", "status", "fkc")
    val rep = report(df, Seq(
      NotNull("nn", "id"),
      Unique("uq", Seq("id")),
      Accepted("ac", "status", Seq("A")),
      ForeignKey("fk", "fkc", dim, "k")))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(3)))).toMap
    assert(rep.size == 4)
    assert(rep.values.forall(_ == ((0L, true))), rep.toString)
  }

  test("QualityChecks → table constraints: one declarative check list " +
      "detects downstream AND gates at write with identical semantics " +
      "(a frame the report flags is the frame the commit refuses)") {
    import graft.operators.{QualityChecks, TableCommit}
    import QualityChecks._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_qcc").toFile
    val t = new java.io.File(dir, "table").getAbsolutePath
    Seq((1L, "A", 5.0, 0), (2L, "B", 7.0, 1)).toDF("id", "st", "price", "pt")
      .repartition(col("pt"))
      .write.mode("overwrite").partitionBy("pt").parquet(t)
    TableCommit.initIfAbsent(t)
    val checks = Seq(
      NotNull("nn_id", "id"),
      InRange("rg_price", "price", 0, 10),
      Accepted("ac_st", "st", Seq("A", "B")),
      Unique("uq_id", Seq("id"))) // not row-local: skipped, not errored
    val installed = QualityChecks.installConstraints(spark, t, checks)
    assert(installed == Seq("nn_id", "rg_price", "ac_st"))
    assert(TableCommit.constraints(t).keySet ==
      Set("nn_id", "rg_price", "ac_st"))
    // gate ≡ report on each single-defect frame: the report flags it
    // AND the commit refuses it — incl. the NULL rows the report
    // counts as InRange/Accepted violations (the explicit IS NOT NULL
    // conjunct keeps SQL CHECK's null-passes rule from diverging)
    val bads = Seq(
      Seq((Option.empty[Long], Option("A"), Option(5.0), 0)), // null id
      Seq((Option(9L), Option("A"), Option(50.0), 0)), // out of range
      Seq((Option(9L), Option("A"), Option.empty[Double], 0)), // null price
      Seq((Option(9L), Option("C"), Option(5.0), 0)), // unaccepted
      Seq((Option(9L), Option.empty[String], Option(5.0), 0))) // null st
    for (rows <- bads) {
      val df = rows.toDF("id", "st", "price", "pt")
      val flagged = QualityChecks.report(df, checks.take(3))
        .filter(!col("passed")).count()
      assert(flagged > 0, s"report missed a defect in $rows")
      intercept[TableCommit.ConstraintViolationException] {
        TableCommit.appendRows(spark, t, "pt", df)
      }
    }
    // and a clean frame passes both
    val ok = Seq((Option(9L), Option("A"), Option(5.0), 1))
      .toDF("id", "st", "price", "pt")
    assert(QualityChecks.report(ok, checks.take(3))
      .filter(!col("passed")).count() == 0)
    TableCommit.appendRows(spark, t, "pt", ok)
    assert(TableCommit.read(spark, t).count() == 3)
  }

  test("QualityChecks gate ≡ report survives BACKSLASH regexes and an " +
      "empty Accepted set: the Matches constraint reaches the write gate " +
      "with its escapes intact (Spark literal parsing eats unescaped \\), " +
      "and Accepted(∅) gates as FALSE instead of unparseable IN ()") {
    import graft.operators.{QualityChecks, TableCommit}
    import QualityChecks._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_qcre").toFile
    val t = new java.io.File(dir, "table").getAbsolutePath
    Seq(("123", 0), ("456", 1)).toDF("code", "pt")
      .repartition(col("pt"))
      .write.mode("overwrite").partitionBy("pt").parquet(t)
    TableCommit.initIfAbsent(t)
    val digits = Matches("m_digits", "code", "^\\d+$")
    QualityChecks.installConstraints(spark, t, Seq(digits))
    // a non-digit write: report flags it AND the gate refuses it — an
    // escape-eaten gate (regex ^d+$) would let "ddd" through and
    // reject "789"
    val bad = Seq(("ddd", 0)).toDF("code", "pt")
    assert(QualityChecks.report(bad, Seq(digits))
      .filter(!col("passed")).count() == 1)
    intercept[TableCommit.ConstraintViolationException] {
      TableCommit.appendRows(spark, t, "pt", bad)
    }
    TableCommit.appendRows(spark, t, "pt", Seq(("789", 0)).toDF("code", "pt"))
    assert(TableCommit.read(spark, t).count() == 3)
    // Accepted with an EMPTY value list: the report counts every row a
    // violation; the gate twin must refuse every write, not fail to parse
    val nothing = Accepted("ac_none", "code", Seq.empty)
    assert(QualityChecks.toConstraintSql(nothing) ==
      Some("ac_none" -> "FALSE"))
    intercept[TableCommit.ConstraintViolationException] {
      QualityChecks.installConstraints(spark, t, Seq(nothing))
    }
  }

  test("n_table_history: generation 0 matches the live read; every " +
      "retained generation is pinned-readable with consistent counts") {
    import graft.queries.Etl
    graft.SparkEntry.queries("n_merge_apply")(spark, sfTiny).collect()
    val rows = graft.SparkEntry.queries("n_table_history")(spark, sfTiny)
      .collect()
    val table = new java.io.File(Etl.mergeApplyRoot(spark, sfTiny), "table")
      .getAbsolutePath
    // after an apply the retention window holds exactly current + previous
    assert(rows.map(_.getAs[Int]("generation")).toSeq == Seq(0, 1))
    val live = graft.operators.TableCommit.read(spark, table).count()
    assert(rows.find(_.getAs[Int]("generation") == 0).get
      .getAs[Long]("n_rows") == live)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_files") > 0 && r.getAs[Long]("n_partitions") > 0,
        r.toString)
    }
  }

  test("merge apply: a reader racing an apply never observes a torn table " +
      "(manifest snapshot isolation)") {
    import graft.queries.Etl
    // establish the table + its post-apply steady state (idempotent:
    // every apply produces the same snapshot content)
    graft.SparkEntry.queries("n_merge_apply")(spark, sfTiny).collect()
    val root = Etl.mergeApplyRoot(spark, sfTiny)
    val table = new java.io.File(root, "table").getAbsolutePath
    def observe(): (Long, Double) = {
      val r = graft.operators.TableCommit.read(spark, table)
        .agg(count(lit(1)), round(sum(col("o_totalprice")), 2))
        .collect()(0)
      (r.getLong(0), r.getDouble(1))
    }
    val steady = observe()
    // reader loop races concurrent applies: every snapshot it resolves
    // must be a COMMITTED state — with idempotent applies that is
    // exactly the steady state; a torn read (partial partition swap,
    // missing files, mixed generations) would change count or sum
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val torn = new java.util.concurrent.atomic.AtomicReference[String](null)
    val reader = new Thread(() => {
      while (!stop.get() && torn.get() == null) {
        val o = try Right(observe()) catch { case e: Throwable => Left(e) }
        o match {
          case Right(v) if v != steady =>
            torn.set(s"torn snapshot: $v != $steady")
          case Left(e) =>
            torn.set(s"reader failed mid-apply: ${e.getMessage.take(200)}")
          case _ => ()
        }
      }
    })
    reader.start()
    try
      for (_ <- 1 to 3)
        graft.SparkEntry.queries("n_merge_apply")(spark, sfTiny).collect()
    finally {
      stop.set(true)
      reader.join(60000)
    }
    assert(torn.get() == null, String.valueOf(torn.get()))
  }
}
