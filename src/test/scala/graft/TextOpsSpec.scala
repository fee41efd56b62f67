package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

class TextOpsSpec extends GraftSpec {
  import spark.implicits._

  private def one[T](dfv: String, c: org.apache.spark.sql.Column): Any =
    Seq(dfv).toDF("t").select(c.as("v")).collect()(0).get(0)

  test("tokens splits on any whitespace run") {
    val all = Seq("a  b\tc").toDF("t")
      .select(explode(TextOps.tokens($"t")).as("v")).collect().map(_.getString(0))
    assert(all.toSeq == Seq("a", "b", "c"))
  }

  test("normalize lowers, collapses and trims whitespace") {
    assert(one("  Hello   WORLD ", TextOps.normalize($"t")) == "hello world")
  }

  test("portableHash matches the DuckDB formula on a known value") {
    // DuckDB: CAST('0x'||substr(md5('hello'),1,8) AS BIGINT) = 1564557354
    assert(one("hello", TextOps.portableHash($"t")) == 1564557354L)
  }

  test("charShingles produces len-n+1 trigrams in order") {
    val out = Seq("abcde").toDF("t")
      .select(TextOps.charShingles($"t", 3).as("v"))
      .collect()(0).getSeq[String](0)
    assert(out == Seq("abc", "bcd", "cde"))
  }

  test("charShingles on text shorter than n yields one truncated shingle") {
    val out = Seq("ab").toDF("t")
      .select(TextOps.charShingles($"t", 3).as("v"))
      .collect()(0).getSeq[String](0)
    assert(out == Seq("ab"))
  }

  test("bpeishTokenCount counts alpha runs, digit runs, marks") {
    assert(one("ab 12 c!", TextOps.bpeishTokenCount($"t")) == 4L)
  }

  test("stopwordCount counts occurrences, not distinct membership") {
    val out = Seq("the cat the dog a x").toDF("t")
      .select(TextOps.stopwordCount(TextOps.tokens($"t"), Seq("a", "the")).as("v"))
      .collect()(0).getInt(0)
    assert(out == 3)
  }
}
