package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.EtlOps
import graft.sources.Formats

/** Parse-mode semantics of the text-format sources, mirroring the
  * reference's malformed-JSON → 415 path (R18,
  * tests/common/aws_utils/test_api_gateway.py:171-178). */
class FormatsSpec extends GraftSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType)))

  private def jsonFixture(): String = {
    val dir = Files.createTempDirectory("graft_json")
    Files.writeString(Paths.get(dir.toString, "data.json"),
      """{"id": 1, "name": "a"}
        |{"id": 2, "name": "b"}
        |{"id": 3 "name": "broken"}
        |not json at all
        |{"id": 5, "name": "e"}
        |""".stripMargin)
    dir.toString
  }

  test("PERMISSIVE keeps bad rows with the raw text in _corrupt_record") {
    val df = Formats.readJsonLines(spark, jsonFixture(), schema).cache()
    assert(df.count() == 5)
    val bad = df.filter(col(Formats.CorruptCol).isNotNull)
    assert(bad.count() == 2)
    assert(bad.filter(col("id").isNotNull).count() == 0)
    // and it composes with the R19 error split
    val routed = EtlOps.errorSplit(df, col(Formats.CorruptCol).isNotNull,
      lit("UnsupportedMediaType"), lit("malformed JSON payload"), lit(415))
    assert(routed.good.count() == 3)
    assert(routed.errors.collect().forall(_.getString(2) == "415"))
    df.unpersist()
  }

  test("DROPMALFORMED silently drops bad rows") {
    val df = Formats.readJsonLines(spark, jsonFixture(), schema, "DROPMALFORMED")
    assert(df.count() == 3)
  }

  test("FAILFAST throws on the first bad record (gateway validation)") {
    val df = Formats.readJsonLines(spark, jsonFixture(), schema, "FAILFAST")
    intercept[SparkException] { df.count() }
  }

  test("CSV round-trips events with an explicit schema") {
    val dir = Files.createTempDirectory("graft_csv").toString
    val ev = graft.sources.Tables.events(spark, sfTiny)
      .select(col("event_id"), col("event_type"), col("value"))
    ev.write.mode("overwrite").option("header", "true").csv(dir)
    val csvSchema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    // cache: Spark disallows querying ONLY _corrupt_record off raw files
    val back = Formats.readCsv(spark, dir, csvSchema).cache()
    assert(back.count() == ev.count())
    assert(back.filter(col(Formats.CorruptCol).isNotNull).count() == 0)
    back.unpersist()
  }

  test("ORC round-trips a core table cell-exact (columnar interchange)") {
    val dir = Files.createTempDirectory("graft_orc").toString
    val src = graft.sources.Tables.customer(spark, sfTiny)
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      src.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.count() == src.count())
    assert(back.except(src).isEmpty && src.except(back).isEmpty)
  }
}
