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
