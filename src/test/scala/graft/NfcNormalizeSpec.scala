package graft

import org.apache.spark.sql.functions._
import graft.functions.NfcNormalize
import org.apache.spark.unsafe.types.UTF8String

/** Unit contract of the native NFC expression (all fixture strings are
  * explicit \\uXXXX escapes — an editor or tool that silently
  * renormalizes source text cannot corrupt the decomposed fixtures). */
class NfcNormalizeSpec extends GraftSpec {
  import spark.implicits._

  private val Decomposed = "cafe\u0301 u\u0308ber" // e+U+0301, u+U+0308
  private val Composed = "caf\u00e9 \u00fcber"     // U+00E9, U+00FC

  test("kernel: decomposed composes; composed and ASCII return the " +
      "INPUT object (zero-allocation fast paths); idempotent") {
    val ascii = UTF8String.fromString("plain ascii 123")
    assert(NfcNormalize.nfc(ascii) eq ascii)
    val composed = UTF8String.fromString(Composed)
    assert(NfcNormalize.nfc(composed) eq composed)
    val decomposed = UTF8String.fromString(Decomposed)
    val once = NfcNormalize.nfc(decomposed)
    assert(once.toString == Composed)
    assert(NfcNormalize.nfc(once) eq once)
  }

  test("registers and evaluates via SQL; null in, null out") {
    NfcNormalize.register(spark)
    val rows = spark.sql(
      "SELECT graft_nfc('cafe\u0301') AS a, " +
        "graft_nfc(CAST(NULL AS STRING)) AS b")
      .collect()(0)
    assert(rows.getString(0) == "caf\u00e9")
    assert(rows.isNullAt(1))
  }

  test("expression path agrees with java.text.Normalizer on mixed data " +
      "(incl. empty and stacked combining marks)") {
    NfcNormalize.register(spark)
    val data = Seq("ascii", Decomposed, Composed, "",
      "e\u0301\u0301") // stacked: only the first acute composes
    val viaExpr = data.toDF("t")
      .select(call_function("graft_nfc", col("t")).as("n"))
      .collect().map(_.getString(0)).toSeq
    val expected = data.map(s =>
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    assert(viaExpr == expected)
  }

  test("stays inside whole-stage codegen (no interpreted fallback)") {
    NfcNormalize.register(spark)
    val q = graft.sources.Tables.documents(spark, sfTiny)
      .select(call_function("graft_nfc", col("text")).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    // the `*(n)` stage prefix is the codegen marker in this rendering;
    // an interpreted fallback would print a bare Project
    assert(plan.contains("WholeStageCodegen") ||
      "\\*\\(\\d+\\) Project".r.findFirstIn(plan).isDefined, plan.take(2000))
    // the planning-time marker cannot see a Janino COMPILE failure
    // (codegen.fallback silently interprets at runtime) — execute with
    // the fallback disabled so broken generated code fails the test
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      assert(q.limit(5).collect().length == 5)
    } finally {
      prev.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
    }
  }
}
