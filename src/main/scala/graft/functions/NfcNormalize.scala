package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `graft_nfc(text)` — Unicode NFC
  * (canonical composition) normalization, the ingest-side
  * canonicalization every mixed-provenance corpus needs: crawled text
  * arrives with the same glyph in composed (U+00E9) and decomposed
  * (`e` + U+0301) forms, which hash, dedup, shingle and join as
  * DIFFERENT strings until normalized. One narrow codegen'd node: the
  * generated code is a single static call per row, with an
  * `isNormalized` fast path so the (overwhelmingly common) already-NFC
  * row costs one scan of its code points and ZERO allocation — at
  * 100 TB this runs at scan speed in the same whole-stage-codegen span
  * as the projections around it.
  *
  * Why a custom Expression (SURVEY.md §2 preference (b)): Spark ships
  * no Unicode-normalization builtin, and a Scala UDF would break the
  * codegen span and pay serialization per row. Cross-engine parity:
  * DuckDB's `nfc_normalize` implements the same Unicode canonical
  * composition, so results hash-match byte-for-byte. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(v: Any): Any =
    NfcNormalize.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.NfcNormalize.nfc($v);")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object NfcNormalize {
  /** Already-normalized input returns the INPUT UTF8String unchanged.
    * Pure-ASCII rows (numBytes == numChars — the bulk of a web corpus)
    * never materialize a java.lang.String at all; non-ASCII rows pay
    * one toString for the `isNormalized` check and allocate a result
    * only when composition actually changes the text. */
  def nfc(s: UTF8String): UTF8String = {
    if (s.numBytes == s.numChars) return s // ASCII is NFC by definition
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  val info = new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc")

  /** Shared by both registration paths (the BloomContains precedent).
    * Arity is checked HERE: `children.head` would silently drop extra
    * arguments and crash unhelpfully on zero. */
  val builder: Seq[Expression] => Expression = {
    case Seq(c) => NfcNormalize(c)
    case other => throw new IllegalArgumentException(
      s"graft_nfc expects exactly 1 argument, got ${other.length}")
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_nfc"), info, builder)
}
