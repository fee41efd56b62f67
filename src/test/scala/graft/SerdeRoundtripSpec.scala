package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Property-style serde checks (SURVEY.md §5.2): from_json ∘ to_json is
  * the identity on valid structs, and cast normalization (R20) is
  * idempotent — evaluated over seeded random frames in one pass each. */
class SerdeRoundtripSpec extends GraftSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(2026)

  test("from_json(to_json(struct)) round-trips typed structs") {
    val rows = Seq.fill(300)((rnd.nextLong(), rnd.nextInt(1000) - 500,
      rnd.alphanumeric.take(rnd.nextInt(12)).mkString,
      rnd.nextBoolean()))
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", IntegerType),
      StructField("s", StringType), StructField("f", BooleanType)))
    val df = rows.toDF("a", "b", "s", "f")
    val bad = df
      .withColumn("packed", to_json(struct($"a", $"b", $"s", $"f")))
      .withColumn("back", from_json($"packed", schema))
      .filter($"back.a" =!= $"a" || $"back.b" =!= $"b" ||
        $"back.s" =!= $"s" || $"back.f" =!= $"f")
    assert(bad.count() == 0)
  }

  test("json round-trip preserves null fields") {
    val df = Seq((1L, null: String), (2L, "x")).toDF("id", "s")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))
    val back = df
      .withColumn("back", from_json(to_json(struct($"id", $"s")), schema))
      .select($"back.id".as("rid"), $"back.s".as("rs")).collect()
    assert(back(0).getLong(0) == 1L && back(0).isNullAt(1))
    assert(back(1).getString(1) == "x")
  }

  test("R20 status normalization is idempotent across int/string forms") {
    val codes = Seq.fill(200)(rnd.nextInt(600)).map(_.toString) ++
      Seq("200", "404", "500")
    val df = codes.toDF("c")
    val once = graft.operators.EtlOps.normStatus($"c")
    val twice = graft.operators.EtlOps.normStatus(once)
    assert(df.filter(once =!= twice).count() == 0)
  }

  test("map round-trip via to_json/from_json keeps entries") {
    val df = Seq(Map("a" -> 1, "b" -> 2), Map.empty[String, Int]).toDF("m")
    val back = df
      .withColumn("back", from_json(to_json($"m"), MapType(StringType, IntegerType)))
      .filter(not(map_entries($"back") === map_entries($"m")))
    assert(back.count() == 0)
  }
}
