package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.SparkSession

/** Native Catalyst expression: dot product of two float-array columns in
  * double precision, with whole-stage code generation.
  *
  * Why a custom Expression (SURVEY.md §2 preference (b)): the
  * dimension-unrolled `VectorOps.dotF` works only for dimensions known
  * at plan-build time and emits dim× expression nodes (JVM codegen
  * method limits bite around dim ≈ 1000); an interpreted higher-order
  * `aggregate(zip_with(...))` costs ~10 µs per 64-dim dot. This
  * expression is one node, any dimension, and its generated code is a
  * tight fused loop inside WholeStageCodegen. Accumulation is
  * left-to-right in double — bit-identical to the unrolled form, the
  * Scala block-multiply kernels, and DuckDB's `list_dot_product` (the
  * oracle-parity contract).
  *
  * Null semantics: null if either array is null (BinaryExpression
  * default); null ELEMENTS contribute 0 (treated as 0.0f, matching
  * `zip_with` + `aggregate` over null-free testdata; documents must not
  * rely on null elements). Lengths may differ — the shorter bounds the
  * loop. */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // Seq[DataType] is a covariant override of Seq[AbstractDataType]
  // (AbstractDataType itself is private[sql])
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot_f"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
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
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)
}

/** float[] · double[] variant — used for projecting vectors onto
  * double-precision hyperplane constants (the LSH bucket stage). Same
  * left-to-right double accumulation as the unrolled
  * `VectorOps.dotLit`. */
case class DotProductFD(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot_fd"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        acc += x.getFloat(i).toDouble * y.getDouble(i)
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
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += (double) $a.getFloat($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductFD =
    copy(left = newLeft, right = newRight)
}

object DotProductF {
  val info = new ExpressionInfo(classOf[DotProductF].getName, "graft_dot_f")
  val infoFD = new ExpressionInfo(classOf[DotProductFD].getName, "graft_dot_fd")

  /** Register on a live session (our mains build their own sessions);
    * spark.sql.extensions users get the same via [[graft.GraftExtensions]]. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_dot_f"), info,
      (children: Seq[Expression]) => DotProductF(children(0), children(1)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_dot_fd"), infoFD,
      (children: Seq[Expression]) => DotProductFD(children(0), children(1)))
  }
}
