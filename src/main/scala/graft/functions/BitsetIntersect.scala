package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.SparkSession

/** Native Catalyst expression: popcount of the bitwise AND of two packed
  * long-array bitmasks — the declarative/SQL-facing form of the
  * set-intersection kernel the dedup grid operators inline JVM-side
  * (`BlockPairScan.bitsetJaccardPairs` runs the identical
  * `Long.bitCount(a & b)` loop inside its block-pair tasks). Registered
  * via `GraftExtensions` so SQL and Column users of the library can
  * popcount packed bitsets without a grid operator.
  *
  * Why a custom Expression (SURVEY.md §2 preference (b)): the dedup
  * queries evaluate `Σ_w bit_count(m1[w] & m2[w])` for millions of
  * candidate pairs. Unrolling per word works while the vocabulary is
  * small (W = ⌈vocab/64⌉ ≤ ~10) but emits 3·W expression nodes PER PAIR
  * PREDICATE — at a web-scale vocabulary (W in the hundreds) that
  * janino-compiles kilobyte methods and eventually trips JVM method
  * limits. This expression is one node at ANY W and its generated code
  * is a tight fused `Long.bitCount` loop inside WholeStageCodegen.
  * Integer arithmetic — bit-identical to the unrolled form and the
  * oracle's count, at every W.
  *
  * Null semantics: null if either array is null (BinaryExpression
  * default); null ELEMENTS count as an empty word (masks are built
  * null-free). The shorter array bounds the loop (identical masks are
  * always equal-length by construction). */
case class BitsetIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bitset_icnt"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        acc += java.lang.Long.bitCount(x.getLong(i) & y.getLong(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += java.lang.Long.bitCount($a.getLong($i) & $b.getLong($i));
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitsetIntersectCount =
    copy(left = newLeft, right = newRight)
}

object BitsetIntersectCount {
  val info =
    new ExpressionInfo(classOf[BitsetIntersectCount].getName, "graft_bitset_icnt")

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_bitset_icnt"), info,
      (children: Seq[Expression]) => BitsetIntersectCount(children(0), children(1)))
}
