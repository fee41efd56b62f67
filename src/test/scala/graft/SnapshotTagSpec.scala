package graft

import org.apache.spark.sql.functions._

import graft.operators.TableCommit
import graft.plans.GraftCatalog

/** SNAPSHOT TAGS (late round 15 — Iceberg's named refs re-derived on
  * the property mechanism): `tag` pins a snapshot under a name as a
  * metadata-only commit; `VERSION AS OF 'name'` resolves it through
  * the catalog; and the tag is a VACUUM RETENTION LEASE — the pinned
  * snapshot's manifest chain and data files survive past
  * `graft.retention.generations` until `dropTag`. The production
  * story: an audit/repro/model-training pin outlives the nightly
  * vacuum without raising the whole table's retention. */
class SnapshotTagSpec extends GraftSpec {
  import spark.implicits._

  private lazy val wh: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_tag").toFile
    GraftCatalog.register(spark, "grafttag", Some(dir.getAbsolutePath))
    dir.getAbsolutePath
  }

  private def gen(t: String, label: String): Unit =
    TableCommit.replacePartitions(spark, t, "pt", Seq("pt=0"),
      (0 until 20).map(i => (i.toLong, s"$label$i", 0)).toDF("id", "v", "pt"),
      clusterBy = Seq("id"))

  test("a tag is a retention lease: the pinned snapshot reads via " +
      "VERSION AS OF 'name' past the vacuum window, its files survive; " +
      "dropTag ends the lease and the next vacuum sweeps") {
    val t = s"$wh/db/leased"
    TableCommit.initIfAbsent(t)
    TableCommit.setProperties(t,
      Map("graft.retention.generations" -> "2"))
    gen(t, "gold")
    val (id0, files0) = TableCommit.resolve(t).get
    TableCommit.tag(t, "audit", id0)
    assert(TableCommit.tags(t) == Map("audit" -> id0))
    // churn WELL past the retention window — every commit's inline
    // vacuum gets a chance to sweep the pinned generation
    (1 to 4).foreach(g => gen(t, s"g$g"))
    TableCommit.vacuumRun(t)
    // the lease held: bytes on disk, snapshot readable BY NAME
    files0.foreach(f => assert(new java.io.File(t, f).isFile,
      s"vacuum swept a tagged snapshot's file $f"))
    val pinned = spark.sql(
      s"SELECT v FROM grafttag.db.leased VERSION AS OF 'audit' " +
        "WHERE id = 3")
    assert(pinned.head().getString(0) == "gold3")
    // numeric VERSION AS OF still resolves the same snapshot
    assert(spark.sql(
      s"SELECT v FROM grafttag.db.leased VERSION AS OF $id0 WHERE id = 3")
      .head().getString(0) == "gold3")
    // the newest read is unaffected
    assert(spark.sql("SELECT v FROM grafttag.db.leased WHERE id = 3")
      .head().getString(0) == "g43")
    // drop the tag: the lease ends; the sweep takes the old generation
    TableCommit.dropTag(t, "audit")
    assert(TableCommit.tags(t).isEmpty)
    TableCommit.vacuumRun(t)
    assert(files0.exists(f => !new java.io.File(t, f).isFile),
      "dropTag + vacuum left every leased file in place")
    val err = intercept[IllegalArgumentException] {
      spark.sql("SELECT v FROM grafttag.db.leased VERSION AS OF 'audit'")
        .collect()
    }
    assert(err.getMessage.contains("neither a snapshot id nor a tag"),
      err.getMessage)
  }

  test("the SQL front doors: CALL tag/drop_tag, an unknown-id tag " +
      "refuses, ALTER TABLE UNSET TBLPROPERTIES removes a property") {
    val t = s"$wh/db/sqltag"
    TableCommit.initIfAbsent(t)
    gen(t, "a")
    val id = TableCommit.resolve(t).get._1
    val out = spark.sql(
      s"CALL grafttag.system.tag('db.sqltag', 'rc1', $id)").collect()
    assert(out.head.getString(0) == "rc1" && out.head.getLong(1) == id)
    assert(TableCommit.tags(t) == Map("rc1" -> id))
    // re-tag moves the name (last writer wins)
    gen(t, "b")
    val id2 = TableCommit.resolve(t).get._1
    spark.sql(s"CALL grafttag.system.tag('db.sqltag', 'rc1', $id2)")
    assert(TableCommit.tags(t) == Map("rc1" -> id2))
    assert(spark.sql(
      s"CALL grafttag.system.drop_tag('db.sqltag', 'rc1')")
      .head().getBoolean(0))
    assert(TableCommit.tags(t).isEmpty)
    // tagging a snapshot that never existed refuses loudly
    intercept[Exception] {
      TableCommit.tag(t, "ghost", 99999L)
    }
    // UNSET TBLPROPERTIES rides the new removeProperties verb
    TableCommit.setProperties(t, Map("team" -> "etl"))
    spark.sql("ALTER TABLE grafttag.db.sqltag UNSET TBLPROPERTIES ('team')")
    assert(!TableCommit.properties(t).contains("team"))
  }

  test("clones do not inherit tags: a tag is a ref into the SOURCE's " +
      "manifest log — carried blindly it would dangle or mispoint in " +
      "the clone's single-manifest numbering") {
    val t = s"$wh/db/tagged_src"
    TableCommit.initIfAbsent(t)
    gen(t, "x")
    val idOld = TableCommit.resolve(t).get._1
    gen(t, "y")
    TableCommit.tag(t, "old", idOld)
    // non-tag properties still ride the clone
    TableCommit.setProperties(t, Map("team" -> "etl"))
    val c1 = s"$wh/db/tag_clone"
    TableCommit.cloneTo(t, c1)
    assert(TableCommit.tags(c1).isEmpty,
      s"clone carried source-log tags: ${TableCommit.tags(c1)}")
    assert(TableCommit.properties(c1).get("team").contains("etl"))
    val c2 = s"$wh/db/tag_reloc"
    TableCommit.cloneTo(t, c2, relocate = true)
    assert(TableCommit.tags(c2).isEmpty,
      TableCommit.tags(c2).toString)
  }
}
