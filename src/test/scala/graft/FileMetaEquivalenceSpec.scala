package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.operators.TableCommit

/** EQUIVALENCE SPEC for the footer-derived commit metadata
  * (optimization r16): `TableCommit.footerMeta` must reproduce the
  * aggregation path `TableCommit.fileMetaAgg` BYTE-FOR-BYTE — same
  * `#stats` renderings (numerics verbatim, strings truncated
  * code-point bounds, dates/NTZ era-guarded ISO, zoned timestamps as
  * unix-micros digit strings), same all-null omissions, same `#rows`
  * counts — across every stats type the engine records, or refuse
  * (None) so the caller falls back to the aggregation. The round-10
  * ordering trap (mixed compare orders between write-side rendering
  * and read-side band compare) is exactly what this spec guards: any
  * rendering drift between the two paths fails here before it can
  * skew pruning.
  */
class FileMetaEquivalenceSpec extends GraftSpec {
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_fmeq").toFile
    d.getAbsolutePath
  }

  /** Write `df` as a plain parquet tree under `table`/pt=… (the shape
    * fresh commit files take), return the rel paths. */
  private def writeTree(table: String, df: DataFrame,
      partCol: String = "pt"): Seq[String] = {
    df.write.mode("overwrite").partitionBy(partCol).parquet(table)
    val base = new java.io.File(table)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(base).filter(_.getName.endsWith(".parquet"))
      .map(f => base.toPath.relativize(f.toPath).toString)
      .sorted
  }

  private def assertEquivalent(table: String, rels: Seq[String],
      cols: Seq[String], wmap: Map[String, String] = Map.empty,
      expectFooterPath: Boolean = true): Unit = {
    val footer = TableCommit.footerMeta(table, rels, cols, wmap)
    val agg = TableCommit.fileMetaAgg(spark, table, rels, cols, wmap)
    if (expectFooterPath) {
      assert(footer.isDefined,
        s"footerMeta refused a certifiable fixture: $cols")
      val (fStats, fRows) = footer.get
      val (aStats, aRows) = agg
      assert(fRows == aRows, s"row counts diverge:\n$fRows\nvs\n$aRows")
      assert(fStats == aStats,
        s"stats renderings diverge:\nfooter: ${fStats.toSeq.sortBy(_._1)}" +
          s"\nagg:    ${aStats.toSeq.sortBy(_._1)}")
    } else {
      assert(footer.isEmpty,
        s"footerMeta accepted an uncertifiable fixture: $cols -> $footer")
    }
  }

  test("long / int / string / date / decimal bounds render identically " +
      "to the aggregation path (incl. multi-partition trees)") {
    val t = freshDir()
    val df = Seq(
      (5L, 42, "delta", java.sql.Date.valueOf("2024-03-01"),
        BigDecimal("12.34"), 0),
      (-17L, -7, "alpha", java.sql.Date.valueOf("1994-11-30"),
        BigDecimal("-0.05"), 0),
      (900L, 2000000000, "ωmega", java.sql.Date.valueOf("2031-01-15"),
        BigDecimal("99999.99"), 1),
      (0L, 0, "", java.sql.Date.valueOf("2024-03-01"),
        BigDecimal("0.00"), 1))
      .toDF("k_long", "k_int", "k_str", "k_date", "k_dec", "pt")
      .withColumn("k_dec", col("k_dec").cast("decimal(12,2)"))
    val rels = writeTree(t, df)
    assertEquivalent(t, rels,
      Seq("k_long", "k_int", "k_str", "k_date", "k_dec"))
  }

  test("wide decimal (>18 digits, FIXED_LEN_BYTE_ARRAY carrier) and " +
      "negative-scale values render identically") {
    val t = freshDir()
    val df = Seq(
      (BigDecimal("123456789012345678.9012"), 0),
      (BigDecimal("-999999999999999999.0001"), 0),
      (BigDecimal("0.0000"), 1))
      .toDF("k_dec", "pt")
      .withColumn("k_dec", col("k_dec").cast("decimal(22,4)"))
    val rels = writeTree(t, df)
    assertEquivalent(t, rels, Seq("k_dec"))
  }

  test("NTZ timestamps record era-guarded ISO bounds with trimmed " +
      "fractions — byte-identical to the cast rendering") {
    val t = freshDir()
    val df = Seq("2024-06-30 23:59:59.5", "1971-01-01 00:00:01.000001",
      "1999-05-05 00:00:00")
      .toDF("n")
      .select(col("n").cast("timestamp_ntz").as("k_ntz"), lit(0).as("pt"))
    val rels = writeTree(t, df)
    assertEquivalent(t, rels, Seq("k_ntz"))
  }

  test("ZONED timestamps under Spark's default INT96 output are refused " +
      "(deprecated stats ordering) — fallback; under TIMESTAMP_MICROS " +
      "output they certify as unix-micros digit strings") {
    val t96 = freshDir()
    val mk = Seq("1994-01-02 03:04:05.123456", "2031-12-31 00:00:00")
      .toDF("z")
      .select(col("z").cast("timestamp").as("k_ts"), lit(0).as("pt"))
    val rels96 = writeTree(t96, mk)
    assertEquivalent(t96, rels96, Seq("k_ts"), expectFooterPath = false)
    val t64 = freshDir()
    withSQLConf("spark.sql.parquet.outputTimestampType" ->
        "TIMESTAMP_MICROS") {
      val rels64 = writeTree(t64, mk)
      assertEquivalent(t64, rels64, Seq("k_ts"))
    }
  }

  test("NTZ outside the four-digit-year lex-safe era records NO stats on " +
      "either path (era guard parity)") {
    val t = freshDir()
    val df = spark.range(2)
      .select(when(col("id") === 0,
          expr("make_timestamp_ntz(10901, 1, 1, 0, 0, 0)"))
        .otherwise(expr("make_timestamp_ntz(2024, 1, 1, 0, 0, 0)"))
        .as("k_ntz"), lit(0).as("pt"))
      .coalesce(1)
    val rels = writeTree(t, df)
    assert(rels.length == 1, "fixture must land in ONE file so the " +
      "out-of-era value guards the whole file's entry")
    // both paths must drop the entry (isoLexSafe guard), keeping rows
    val footer = TableCommit.footerMeta(t, rels, Seq("k_ntz"), Map.empty)
    val agg = TableCommit.fileMetaAgg(spark, t, rels, Seq("k_ntz"), Map.empty)
    assert(footer.isDefined)
    assert(footer.get._1 == agg._1 && footer.get._1.isEmpty,
      s"era guard diverged: footer=${footer.get._1} agg=${agg._1}")
    assert(footer.get._2 == agg._2)
  }

  test("string truncation (>64 UTF-16 units) and supplementary characters " +
      "render the exact truncated code-point bounds of the agg path") {
    val t = freshDir()
    val longLo = "b" * 80
    val longHi = "y" * 100 + "z"
    val supp = new String(Character.toChars(0x1F600)) * 40 // 80 units
    val df = Seq((longLo, 0), (longHi, 0), (supp, 1), ("aaa", 1))
      .toDF("k_str", "pt")
    val rels = writeTree(t, df)
    assertEquivalent(t, rels, Seq("k_str"))
  }

  test("all-null column files get NO stats entry but keep their row " +
      "count; mixed null/non-null files record bounds over non-nulls") {
    val t = freshDir()
    val df = Seq[(java.lang.Long, Integer)]((null, 0), (null, 0),
      (7L, 1), (null, 1))
      .toDF("k_long", "pt")
    val rels = writeTree(t, df)
    assertEquivalent(t, rels, Seq("k_long"))
  }

  test("multi-row-group files merge chunk bounds exactly like one " +
      "aggregation over the file") {
    val t = freshDir()
    withSQLConf("parquet.block.size" -> "1024",
        "parquet.page.size" -> "256") {
      val df = spark.range(50000)
        .select(col("id").as("k_long"),
          concat(lit("doc_"), lpad(col("id").cast("string"), 8, "0"))
            .as("k_str"),
          lit(0).as("pt"))
      val rels = writeTree(t, df)
      // a single output file with several row groups
      assert(rels.length >= 1)
      assertEquivalent(t, rels, Seq("k_long", "k_str"))
    }
  }

  test("float/double stats columns are refused by the footer path (NaN-" +
      "blind footer vs NaN-aware aggregate) — the caller falls back") {
    val t = freshDir()
    val df = Seq((1.5d, 0), (Double.NaN, 0), (-3.25d, 1))
      .toDF("k_dbl", "pt")
    val rels = writeTree(t, df)
    assertEquivalent(t, rels, Seq("k_dbl"), expectFooterPath = false)
  }

  test("a stats column that is dir-encoded (absent from the payload) is " +
      "refused — fallback keeps the one rendering authority") {
    val t = freshDir()
    val df = Seq((1L, 0), (2L, 1)).toDF("k_long", "pt")
    val rels = writeTree(t, df)
    assertEquivalent(t, rels, Seq("pt"), expectFooterPath = false)
  }

  test("column mapping: physical-name files resolve stats under logical " +
      "keys identically on both paths") {
    val t = freshDir()
    val df = Seq((10L, "x", 0), (20L, "y", 1))
      .toDF("phys_k", "v", "pt")
    val rels = writeTree(t, df)
    // logical column "k" maps to physical "phys_k"
    assertEquivalent(t, rels, Seq("k"), wmap = Map("k" -> "phys_k"))
  }

  test("end-to-end: a clustered commit's manifest #stats and #rows are " +
      "unchanged by the footer path (the commit-level witness)") {
    val t = freshDir() + "/tbl"
    TableCommit.replacePartitions(spark, t, "pt", Seq("pt=0", "pt=1"),
      (0 until 200).map(i => (i.toLong, s"v_$i", i % 2))
        .toDF("id", "v", "pt"),
      clusterBy = Seq("id"), filesPerPartition = 3)
    val (id, files) = TableCommit.resolve(t).get
    assert(files.length == 6)
    // the published stats must equal what the aggregation would record
    val (aggStats, aggRows) =
      TableCommit.fileMetaAgg(spark, t, files, Seq("id"))
    val readBack = TableCommit.statsProbe(t, id)
    assert(readBack == aggStats,
      s"committed #stats diverge from the aggregation rendering:\n" +
        s"committed: ${readBack.toSeq.sortBy(_._1)}\n" +
        s"agg:       ${aggStats.toSeq.sortBy(_._1)}")
    val rowsBack = TableCommit.rowsProbe(t, id)
    assert(rowsBack == aggRows)
  }
}
