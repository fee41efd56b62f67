package graft

import org.apache.spark.sql.SparkSession

/** The `spark.sql.extensions` registration path: a session built with
  * [[GraftExtensions]] must expose the native expressions to plain SQL
  * (the cluster-wide `--conf spark.sql.extensions=graft.GraftExtensions`
  * story) — distinct from the per-session `register(s)` helpers the
  * query modules call themselves. */
class ExtensionsSpec extends GraftSpec {

  test("GraftExtensions registers the native expressions for SQL use") {
    val old = spark // force TestSession's session (and context) to exist
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // builder only applies extensions when it CREATES a session; with the
    // default cleared it builds a fresh session over the EXISTING context
    val s2 = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = s2.sql(
        "SELECT graft_dot_f(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))," +
          "                 array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d," +
          "       graft_sorted_icnt(array(1L, 2L, 5L), array(2L, 5L, 9L)) AS i," +
          "       graft_dot_fd(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))," +
          "                    array(CAST(0.5 AS DOUBLE), CAST(0.25 AS DOUBLE))) AS fd," +
          "       graft_qbucket(CAST(2.5 AS DOUBLE)," +
          "                     array(1.0D, 2.0D, 3.0D, 4.0D)) AS qb," +
          "       graft_nfc('cafe\u0301') AS nfc")
        .head()
      assert(math.abs(r.getDouble(0) - 11.0) < 1e-9)
      assert(r.getLong(1) == 2L)
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-9)
      assert(r.getLong(3) == 2L) // two cuts (1.0, 2.0) strictly below 2.5
      assert(r.getString(4) == "caf\u00e9") // decomposed e+U+0301 composed
      // the plain shared session must NOT have picked up the functions
      // through this path alone (they arrive there via register(s))
      assert(s2 ne old)
    } finally {
      // do NOT stop s2 — it shares TestSession's SparkContext
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }

  test("table-valued functions: graft_table / graft_table_at / " +
      "graft_table_changes read the committed table from plain SQL, " +
      "identically to the Scala API") {
    import org.apache.spark.sql.functions.col
    import graft.operators.TableCommit
    val old = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      import s2.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft_tvf").toFile
      val t = new java.io.File(dir, "table").getAbsolutePath
      Seq((1L, "a", 0), (2L, "b", 1)).toDF("id", "v", "pt")
        .repartition(col("pt"))
        .write.mode("overwrite").partitionBy("pt").parquet(t)
      TableCommit.initIfAbsent(t)
      val (id0, _) = TableCommit.resolve(t).get
      TableCommit.appendRows(s2, t, "pt",
        Seq((3L, "c", 1)).toDF("id", "v", "pt"))
      // newest snapshot via SQL ≡ Scala read
      val sqlRows = s2.sql(s"SELECT id, v FROM graft_table('$t') ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(sqlRows == Seq((1L, "a"), (2L, "b"), (3L, "c")))
      // time travel via SQL
      val atRows = s2.sql(
        s"SELECT id FROM graft_table_at('$t', $id0) ORDER BY id")
        .collect().map(_.getLong(0)).toSeq
      assert(atRows == Seq(1L, 2L))
      // CDC delta via SQL — exactly the appended row
      val delta = s2.sql(
        s"SELECT id, v FROM graft_table_changes('$t', $id0)")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(delta == Seq((3L, "c")))
      // the TVF is an ordinary relation to Catalyst: a filtered read
      // plans a plain parquet scan (predicate reaches the source)
      val plan = s2.sql(
        s"SELECT id FROM graft_table('$t') WHERE id = 2").queryExecution
        .executedPlan.toString
      assert(plan.contains("PushedFilters") || plan.contains("Scan parquet"),
        s"TVF read did not plan a parquet scan:\n$plan")
      // DESCRIBE HISTORY as a TVF: one row per retained snapshot,
      // metadata-exact row counts for protocol-written generations
      val hist = s2.sql(
        s"SELECT snapshot_id, n_files, n_rows FROM graft_table_history('$t') " +
          "ORDER BY snapshot_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(hist.map(_._1) == Seq(id0, id0 + 1), hist.toString)
      assert(hist.last._2 == hist.head._2 + 1, s"append added one file: $hist")
      // this table was ADOPTED (no #rows for generation-0 files), so the
      // metadata-only count is honestly unknown (-1), never a scan
      assert(hist.forall(_._3 == -1L), hist.toString)
      // the row-level change feed as SQL: the append surfaces as one
      // tagged insert and nothing else
      val feed = s2.sql(
        s"SELECT _change_type, id FROM graft_table_feed('$t', $id0, " +
          s"${id0 + 1}) ORDER BY id")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(feed == Seq(("insert", 3L)), feed.toString)
      // non-literal arguments refuse
      intercept[Exception] {
        s2.sql(s"SELECT * FROM graft_table_at('$t', id0 + 1)").collect()
      }
      // PLAN PIN (round-10 verdict item 6): the feed over a MERGE-ON-READ
      // change reads ONLY the vectored files' live rows and the fresh
      // successors — never the unchanged files. Build a 10-file keyed
      // layout, MoR-update a narrow band, and assert the TVF batch's
      // input set ⊆ (band's hit files ∪ fresh files ∪ their _dv
      // sidecars): metadata-diff planning, cost ∝ change volume.
      val t2 = new java.io.File(dir, "feedpin").getAbsolutePath
      Seq((0L, "s", 0)).toDF("id", "v", "pt")
        .write.mode("overwrite").partitionBy("pt").parquet(t2)
      TableCommit.initIfAbsent(t2)
      TableCommit.replacePartitions(s2, t2, "pt", Seq("pt=0", "pt=1"),
        (0 until 200).map(i => (i.toLong, s"v$i", i % 2)).toDF("id", "v", "pt"),
        clusterBy = Seq("id"), filesPerPartition = 5)
      val (fromId, filesFrom) = TableCommit.resolve(t2).get
      TableCommit.updateWhereMor(s2, t2, "pt", "id",
        BigDecimal(20), BigDecimal(39),
        Map("v" -> org.apache.spark.sql.functions.lit("X")))
      val (toId, filesTo) = TableCommit.resolve(t2).get
      val feedDf = s2.sql(
        s"SELECT _change_type, id, v FROM graft_table_feed('$t2', " +
          s"$fromId, $toId)")
      val changedOrFresh =
        filesTo.toSet.diff(filesFrom.toSet) ++ // fresh successors
          TableCommit.dvGrewFiles(t2, fromId, toId) // vectored files
      val scannedData = feedDf.inputFiles.toSeq
        .filterNot(_.contains("/_dv/"))
        .map(p => p.split('/').takeRight(2).mkString("/"))
      val allowed = changedOrFresh.map(r =>
        r.split('/').takeRight(2).mkString("/"))
      assert(scannedData.toSet.subsetOf(allowed),
        s"CDF TVF scanned unchanged files: ${scannedData.toSet -- allowed}")
      assert(scannedData.nonEmpty &&
        scannedData.toSet.size < filesTo.length,
        s"feed pin vacuous: scanned ${scannedData.toSet.size} of " +
          s"${filesTo.length}")
      // and the feed itself is the precise MoR change set
      val byType = feedDf.groupBy(org.apache.spark.sql.functions
        .col("_change_type")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byType == Map("delete" -> 20L, "insert" -> 20L), byType.toString)
      // DATA SKIPPING from SQL (round-13): graft_table_where prunes by
      // manifest #stats — strictly fewer files than the snapshot, rows
      // equal to the filtered read; t2's keyed 10-file layout serves
      val wdf = s2.sql(
        s"SELECT id, v FROM graft_table_where('$t2', 'id', 100, 119)")
      assert(wdf.count() == 20L)
      assert(wdf.inputFiles.count(f => !f.contains("/_dv/")) <
        filesTo.length,
        "graft_table_where pruned nothing")
      val wset = wdf.collect().map(_.getLong(0)).toSet
      assert(wset == (100L to 119L).toSet, wset.toString)
      // the lex twin over a string-keyed table
      val t3 = new java.io.File(dir, "lexpin").getAbsolutePath
      Seq((0L, "s", 0)).toDF("id", "v", "pt")
        .write.mode("overwrite").partitionBy("pt").parquet(t3)
      TableCommit.initIfAbsent(t3)
      TableCommit.replacePartitions(s2, t3, "pt", Seq("pt=0", "pt=1"),
        (0 until 200).map(i => (i.toLong, f"doc-$i%05d", i % 2))
          .toDF("id", "v", "pt"),
        clusterBy = Seq("v"), filesPerPartition = 5)
      val wlex = s2.sql(s"SELECT v FROM graft_table_where_lex('$t3', " +
        "'v', 'doc-00050', 'doc-00059')")
      assert(wlex.count() == 10L)
      assert(wlex.inputFiles.length <
        TableCommit.resolve(t3).get._2.length,
        "graft_table_where_lex pruned nothing")
      // the typed guard reaches SQL: a lex band over the NUMERIC id
      // column refuses loudly
      val e = intercept[Exception] {
        s2.sql(s"SELECT * FROM graft_table_where_lex('$t3', 'id', " +
          "'0', '9')").collect()
      }
      assert(e.getMessage.contains("code-point"), e.getMessage)
      // the REORG audit as SQL: t2's MoR update left 20 dead rows
      val debt = s2.sql(s"SELECT file, live_rows, dead_rows FROM " +
        s"graft_table_dv_debt('$t2')").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(debt.map(_._3).sum == 20L && debt.forall(_._2 > 0L),
        debt.toString)
    } finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }
}
