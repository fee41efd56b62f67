package graft

import org.apache.spark.sql.functions._
import graft.operators.TableCommit
import graft.plans.GraftCatalog

/** The NATIVE DSv2 write path (round-15): executor tasks write the
  * parquet files, per-task commit messages feed the same OCC publish
  * kernel as every verb. Pins the INSERT OVERWRITE lowering (static
  * PARTITION re-land with sibling partitions byte-untouched, truncate,
  * dynamic mode), the native-append opt-in, task-side CHECK
  * constraint enforcement, and transform-spec dir routing identical
  * to the staging path's. */
class GraftWriteSpec extends GraftSpec {
  import spark.implicits._

  private lazy val wh: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_w").toFile
    GraftCatalog.register(spark, "graftw", Some(dir.getAbsolutePath))
    dir.getAbsolutePath
  }

  private def mkTable(name: String): String = {
    val t = s"$wh/db/$name"
    TableCommit.appendRowsBy(spark, t, Seq("pt"),
      (0 until 90).map(i => (i.toLong, s"v$i", i % 3)).toDF("id", "v", "pt"),
      clusterBy = Seq("id"))
    t
  }

  private def rows(t: String): Set[(Long, String, Int)] =
    TableCommit.read(spark, t)
      .select(col("id"), col("v"), col("pt").cast("int"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet

  private def filesOfDir(t: String, dir: String): Set[String] =
    TableCommit.resolve(t).get._2.filter(_.startsWith(dir + "/")).toSet

  test("INSERT OVERWRITE PARTITION (static): the named partition is " +
      "replaced through the dirty-set contract; SIBLING partitions stay " +
      "byte-untouched (same manifest rels); op annotated") {
    val t = mkTable("ovr_static")
    val pt0Before = filesOfDir(t, "pt=0")
    val pt2Before = filesOfDir(t, "pt=2")
    spark.sql("INSERT OVERWRITE graftw.db.ovr_static PARTITION (pt = 1) " +
      "VALUES (9001, 'fresh1'), (9002, 'fresh2')")
    val got = rows(t)
    assert(got.count(_._3 == 1) == 2 &&
      got.contains((9001L, "fresh1", 1)) && got.contains((9002L, "fresh2", 1)),
      s"pt=1 not re-landed: ${got.filter(_._3 == 1)}")
    assert(got.count(_._3 == 0) == 30 && got.count(_._3 == 2) == 30,
      "a sibling partition changed row content")
    assert(filesOfDir(t, "pt=0") == pt0Before &&
      filesOfDir(t, "pt=2") == pt2Before,
      "sibling partitions were rewritten — the overwrite must not touch them")
    // the commit is annotated as the overwrite verb
    assert(TableCommit.operations(t).head._2.exists(
      _._1 == "INSERT OVERWRITE"))
    // #rows accounting holds through the native write
    assert(spark.sql("SELECT count(*) FROM graftw.db.ovr_static")
      .head().getLong(0) == 62L)
  }

  test("INSERT OVERWRITE without PARTITION (static mode) = truncate-" +
      "replace: the next snapshot is exactly the fresh files") {
    val t = mkTable("ovr_full")
    spark.sql("INSERT OVERWRITE graftw.db.ovr_full " +
      "VALUES (1, 'only', 0), (2, 'two', 1)")
    assert(rows(t) == Set((1L, "only", 0), (2L, "two", 1)))
    assert(TableCommit.resolve(t).get._2.forall(f =>
      f.startsWith("pt=0/") || f.startsWith("pt=1/")))
  }

  test("dynamic partitionOverwriteMode replaces exactly the dirs the " +
      "fresh rows landed in — untouched partitions keep rows AND bytes") {
    val t = mkTable("ovr_dyn")
    val pt2Before = filesOfDir(t, "pt=2")
    withSQLConf("spark.sql.sources.partitionOverwriteMode" -> "dynamic") {
      spark.sql("INSERT OVERWRITE graftw.db.ovr_dyn " +
        "VALUES (100, 'd0', 0), (101, 'd1', 1)")
    }
    val got = rows(t)
    assert(got.count(_._3 == 0) == 1 && got.count(_._3 == 1) == 1 &&
      got.count(_._3 == 2) == 30, got.toString)
    assert(filesOfDir(t, "pt=2") == pt2Before,
      "dynamic overwrite touched a partition it wrote no rows into")
    // the DataFrameWriterV2 twin rides the same lowering
    Seq((777L, "w", 2)).toDF("id", "v", "pt")
      .writeTo("graftw.db.ovr_dyn").overwritePartitions()
    assert(rows(t).count(_._3 == 2) == 1 && rows(t).size == 3)
  }

  test("native INSERT INTO (spark.graft.insert.native): the V2 write " +
      "path appends through per-task commit messages — same rows, " +
      "APPEND op, #rows metadata intact") {
    val t = mkTable("ins_native")
    withSQLConf("spark.graft.insert.native" -> "true") {
      spark.sql(
        "INSERT INTO graftw.db.ins_native VALUES (500, 'n1', 0), (501, 'n2', 1)")
    }
    assert(rows(t).contains((500L, "n1", 0)) && rows(t).size == 92)
    assert(TableCommit.operations(t).head._2.exists(_._1 == "APPEND"))
    assert(spark.sql("SELECT count(*) FROM graftw.db.ins_native")
      .head().getLong(0) == 92L,
      "#rows accounting broken by the native append")
    // a transform-spec table routes dirs identically to the staging
    // path: bucket dirs by pmod(hash, n)
    val tb = s"$wh/db/ins_native_b"
    TableCommit.appendRowsBy(spark, tb, Seq("bucket(4,id)"),
      (0 until 40).map(i => (i.toLong, s"x$i")).toDF("id", "v"),
      clusterBy = Seq("id"))
    TableCommit.evolvePartitioningBy(spark, tb, Seq("bucket(4,id)"))
    withSQLConf("spark.graft.insert.native" -> "true") {
      spark.sql("INSERT INTO graftw.db.ins_native_b VALUES (1000, 'nb')")
    }
    val expectBucket = spark.sql("SELECT pmod(hash(1000L), 4)").head().getInt(0)
    val nativeName = """.*_t\d+-a\d+-c\d+\.parquet$""".r
    val freshDirs = TableCommit.resolve(tb).get._2
      .filter(f => nativeName.pattern.matcher(f).matches())
      .map(TableCommit.partitionDirOf).distinct
    assert(freshDirs == Seq(s"p_id_bucket=$expectBucket"),
      s"native bucket routing diverged: $freshDirs")
    assert(TableCommit.read(spark, tb).count() == 41L)
  }

  test("column mapping through the native write: files carry PHYSICAL " +
      "names after a rename; reads translate back — both write modes") {
    val t = mkTable("mapped_native")
    TableCommit.renameColumn(t, "v", "label")
    withSQLConf("spark.graft.insert.native" -> "true") {
      spark.sql(
        "INSERT INTO graftw.db.mapped_native VALUES (600, 'nat', 0)")
    }
    spark.sql("INSERT OVERWRITE graftw.db.mapped_native PARTITION (pt = 1) " +
      "VALUES (601, 'ovr')")
    val got = spark.sql(
      "SELECT id, label FROM graftw.db.mapped_native WHERE id >= 600")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((600L, "nat"), (601L, "ovr")), got.toString)
    // the fresh files' footers carry the PHYSICAL name (the mapping
    // contract — logical renames never rewrite or re-encode files)
    val nativeName = """.*_t\d+-a\d+-c\d+\.parquet$""".r
    val fresh = TableCommit.resolve(t).get._2
      .filter(f => nativeName.pattern.matcher(f).matches())
    assert(fresh.nonEmpty)
    val footer = spark.read.parquet(s"$t/${fresh.head}").schema.fieldNames
    assert(footer.contains("v") && !footer.contains("label"),
      s"native write staged logical names into footers: " +
        footer.mkString(", "))
  }

  test("DEEP column mapping through the native write: a renamed NESTED " +
      "field's fresh files carry the physical inner name; reads translate") {
    val t = s"$wh/db/nested_native"
    TableCommit.appendRowsBy(spark, t, Seq("pt"),
      Seq((1L, 10, "a", 0)).toDF("id", "x", "y", "pt")
        .selectExpr("id", "named_struct('a', x, 'b', y) AS props", "pt"))
    TableCommit.renameColumn(t, "props.a", "score")
    withSQLConf("spark.graft.insert.native" -> "true") {
      spark.sql("INSERT INTO graftw.db.nested_native " +
        "SELECT 2L, named_struct('score', 20, 'b', 'fresh'), 1")
    }
    val got = spark.sql("SELECT id, props.score AS s, props.b AS b " +
      "FROM graftw.db.nested_native ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(got == Seq((1L, 10, "a"), (2L, 20, "fresh")), got.toString)
    // the native file's footer carries the PHYSICAL inner name — the
    // mapping contract at every depth (renames never rewrite files)
    val nativeName = """.*_t\d+-a\d+-c\d+\.parquet$""".r
    val fresh = TableCommit.resolve(t).get._2
      .filter(f => nativeName.pattern.matcher(f).matches())
    assert(fresh.nonEmpty)
    val inner = spark.read.parquet(s"$t/${fresh.head}").schema("props")
      .dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq
    assert(inner.contains("a") && !inner.contains("score"),
      s"native write staged logical nested names into footers: $inner")
  }

  test("CHECK constraints enforce IN THE TASK: a violating native write " +
      "aborts before publish — table untouched, no orphan rows visible") {
    val t = mkTable("cons_native")
    TableCommit.addConstraint(spark, t, "id_floor", "id >= 0")
    val before = rows(t)
    val beforeId = TableCommit.resolve(t).get._1
    intercept[Exception] {
      spark.sql("INSERT OVERWRITE graftw.db.cons_native PARTITION (pt = 0) " +
        "VALUES (-5, 'bad')")
    }
    assert(rows(t) == before, "a refused write mutated the table")
    assert(TableCommit.resolve(t).get._1 == beforeId,
      "a refused write published a commit")
  }

  test("the requested write distribution lands: a native multi-bucket " +
      "insert produces ~one file per partition dir (clustered by the " +
      "declared transforms), not tasks × dirs") {
    val tb = s"$wh/db/dist_probe"
    TableCommit.appendRowsBy(spark, tb, Seq("bucket(4,id)"),
      (0 until 8).map(i => (i.toLong, "seed")).toDF("id", "v"),
      clusterBy = Seq("id"))
    TableCommit.evolvePartitioningBy(spark, tb, Seq("bucket(4,id)"))
    val before = TableCommit.resolve(tb).get._2.toSet
    // 2000 rows spread over all 4 buckets, written natively from a
    // many-partition source — without the clustered distribution every
    // task would open writers for every bucket
    withSQLConf("spark.graft.insert.native" -> "true") {
      spark.range(0, 2000).repartition(8)
        .selectExpr("id", "concat('n', id) AS v")
        .writeTo("graftw.db.dist_probe").append()
    }
    val fresh = TableCommit.resolve(tb).get._2.filterNot(before)
    val perDir = fresh.groupBy(TableCommit.partitionDirOf)
      .map { case (d, fs) => d -> fs.size }
    assert(perDir.keySet.size == 4, s"expected 4 bucket dirs: $perDir")
    assert(fresh.size <= 8,
      s"clustered write distribution did not apply — ${fresh.size} files " +
        s"for 4 dirs ($perDir)")
    assert(TableCommit.read(spark, tb).count() == 2008L)
  }

  test("native write into a truncate() layout: the width-baked " +
      "truncate<w> distribution resolves and rows route to prefix dirs") {
    val tb = s"$wh/db/trunc_native"
    val spec = Seq("truncate(100,id)")
    TableCommit.appendRowsBy(spark, tb, spec,
      Seq((0L, "seed")).toDF("id", "v"))
    TableCommit.evolvePartitioningBy(spark, tb, spec)
    withSQLConf("spark.graft.insert.native" -> "true") {
      spark.range(0, 300).selectExpr("id", "concat('n', id) AS v")
        .writeTo(s"graftw.db.trunc_native").append()
    }
    val rels = TableCommit.resolve(tb).get._2
    val dirs = rels.map(_.split('/').head).toSet
    assert(dirs == Set("p_id_trunc=0", "p_id_trunc=100", "p_id_trunc=200"),
      s"unexpected prefix dirs: $dirs")
    assert(TableCommit.read(spark, tb).count() == 301L)
  }

  test("REPLACE TABLE AS SELECT runs through drop+create+the native " +
      "write (Spark's non-atomic RTAS path for non-staging catalogs)") {
    spark.sql("CREATE TABLE graftw.db.rtas PARTITIONED BY (pt) " +
      "AS SELECT 1L AS id, 'a' AS v, 0 AS pt")
    assert(spark.sql("SELECT id FROM graftw.db.rtas").head().getLong(0) == 1L)
    spark.sql("REPLACE TABLE graftw.db.rtas PARTITIONED BY (pt) " +
      "AS SELECT 2L AS id, 'b' AS v, 1 AS pt")
    val got = spark.sql("SELECT id, v, pt FROM graftw.db.rtas").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(got == Set((2L, "b", 1)), got.toString)
  }

  test("refusals are loud: non-partition overwrite filters, writes to a " +
      "pinned snapshot — nothing published") {
    val t = mkTable("ovr_refuse")
    val before = rows(t)
    // overwrite condition on a NON-partition column cannot map to dirs
    intercept[Exception] {
      Seq((1L, "x", 0)).toDF("id", "v", "pt")
        .writeTo("graftw.db.ovr_refuse").overwrite(col("id") === 1L)
    }
    assert(rows(t) == before)
  }
}
