package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Schema-drift resilience of the `events` loader.
  *
  * The driver has regenerated `events.parquet` with different physical `ts`
  * encodings across rounds: TIMESTAMP(NANOS) (which Spark's vectorized
  * reader only surfaces as a raw long under `nanosAsLong`), then plain
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as TIMESTAMP_NTZ). A
  * loader pinned to one generation silently breaks EVERY events-based query
  * when the testdata is regenerated — exactly the round-6 bench/verify
  * regression. This spec pins `Tables.events` to normalize all encodings the
  * driver has produced (plus the already-normalized TIMESTAMP case) to the
  * same session-TZ TIMESTAMP micros.
  */
class TablesSchemaSpec extends GraftSpec {

  private def writeVariant(ts: org.apache.spark.sql.Column): String = {
    val root = Files.createTempDirectory("graft_events_schema").toString
    // orderBy before limit (round-7 ADVICE): an unordered limit samples
    // whatever physical row order the parquet happens to have, which the
    // driver's regeneration does not guarantee matches event_id order —
    // the `want` values below are the FIRST 200 rows BY event_id.
    Tables.events(spark, sfTiny)
      .orderBy(col("event_id"))
      .limit(200)
      .withColumn("ts", ts)
      .write.mode("overwrite").parquet(s"$root/events.parquet")
    root
  }

  private def epochMicros(sfDir: String): Array[(Long, Long)] = {
    val df = Tables.events(spark, sfDir)
    assert(df.schema("ts").dataType == TimestampType,
      s"loader must normalize to TIMESTAMP, got ${df.schema("ts").dataType}")
    df.select(col("event_id"), unix_micros(col("ts")))
      .orderBy(col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
  }

  test("events.ts normalizes identically across the driver's parquet encodings") {
    // Reference values straight from the current testdata generation.
    val want = epochMicros(sfTiny).take(200)

    // Raw long nanos-since-epoch: what the legacy nanosAsLong reader yields
    // for a TIMESTAMP(NANOS) column.
    val asNanosLong = writeVariant(unix_micros(col("ts")) * 1000L)
    // TIMESTAMP_NTZ micros: the current generation's encoding.
    val asNtz = writeVariant(col("ts").cast(TimestampNTZType))
    // Already session-TZ TIMESTAMP: the no-op case.
    val asLtz = writeVariant(col("ts"))

    for (dir <- Seq(asNanosLong, asNtz, asLtz)) {
      assert(epochMicros(dir).toSeq == want.toSeq,
        s"variant at $dir did not normalize to the reference epoch micros")
    }
  }

  test("events.ts normalizes a GENUINE TIMESTAMP(NANOS)-annotated parquet " +
      "(low-level writer fixture, not a stand-in long column)") {
    // Round-7/8 ADVICE leftover: the `asNanosLong` variant above writes a
    // PLAIN INT64, so it exercises the loader's LongType branch but not
    // the annotation that triggers it — Spark's vectorized reader only
    // surfaces TIMESTAMP(NANOS) as a raw long under
    // `spark.sql.legacy.parquet.nanosAsLong`, and without the real
    // annotation that rejection/fallback path was untested. Spark cannot
    // WRITE nanos timestamps, so build the fixture with the parquet-java
    // example writer (public API, ships inside Spark's parquet-hadoop).
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    val want = epochMicros(sfTiny).take(200)
    val root = Files.createTempDirectory("graft_events_schema").toString
    val schema = Types.buildMessage()
      .required(INT64).named("event_id")
      .required(INT64)
      .as(LogicalTypeAnnotation.timestampType(true,
        LogicalTypeAnnotation.TimeUnit.NANOS))
      .named("ts")
      .named("events")
    val factory = new SimpleGroupFactory(schema)
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(
        s"$root/events.parquet/part-00000.parquet"))
      .withConf(new org.apache.hadoop.conf.Configuration())
      .withType(schema)
      .build()
    try want.foreach { case (id, micros) =>
      val g = factory.newGroup()
      g.add("event_id", id)
      g.add("ts", micros * 1000L) // µs-aligned nanos, as the driver wrote
      writer.write(g)
    } finally writer.close()
    // sanity: the file really carries the NANOS annotation (otherwise
    // this test silently degrades back into the stand-in variant)
    val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
      new org.apache.hadoop.conf.Configuration(),
      new org.apache.hadoop.fs.Path(s"$root/events.parquet/part-00000.parquet"))
    assert(footer.getFileMetaData.getSchema.toString.contains("NANOS"),
      footer.getFileMetaData.getSchema.toString)
    assert(epochMicros(root).toSeq == want.toSeq,
      "genuine TIMESTAMP(NANOS) fixture did not normalize to reference micros")
  }

  test("user-table schema evolution: mergeSchema read unions the two " +
      "generations and null-defaults the added column") {
    // the round-6 drift class applied to DATA tables: snapshot gen=2
    // adds o_orderpriority; one mergeSchema scan must surface the union
    // schema with gen-1 rows carrying the null default — the read
    // contract q_snapshot_diff_evolve's oracle'd diff builds on
    val dir = graft.queries.Etl.evolveTree(spark, sfTiny)
    val m = spark.read.option("mergeSchema", "true").parquet(dir)
    val names = m.schema.fieldNames.toSet
    assert(Set("o_orderkey", "o_orderstatus", "o_totalprice",
      "o_orderpriority", "gen").subsetOf(names), names.toString)
    val g1 = m.filter(col("gen") === 1)
    assert(g1.filter(col("o_orderpriority").isNotNull).count() == 0,
      "gen-1 rows must surface the added column as its null default")
    assert(g1.count() > 0)
    val g2 = m.filter(col("gen") === 2)
    assert(g2.filter(col("o_orderpriority").isNull).count() == 0,
      "gen-2 rows lost their evolved-column values through the merge")
  }
}
