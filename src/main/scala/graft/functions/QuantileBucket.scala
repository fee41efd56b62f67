package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}
import org.apache.spark.sql.SparkSession

/** Native Catalyst expression: `graft_qbucket(value, cuts)` — the
  * bucket index of `value` among the SORTED cutpoint array `cuts`,
  * i.e. the count of cutpoints strictly below the value (lower bound).
  * The workhorse of `Layout.writeZOrdered`'s quantile grid.
  *
  * Why a custom Expression (SURVEY.md §2 preference (b)), by
  * measurement at sf0.1: a higher-order `aggregate` fold over the
  * 255-cut literal runs INTERPRETED per row per dimension (~6 s extra
  * on the layout job), and a balanced `when`-tree generates 2^depth
  * branch code that falls out of whole-stage codegen (~3 s extra plus
  * GC). This expression is ONE node whose generated code is a binary
  * search over a JVM double[] bound once per task — 8 compares/row,
  * no allocation.
  *
  * The cuts argument must be FOLDABLE (a literal array — the driver
  * computed it from approxQuantile); it is materialized to a double[]
  * once at plan time. Null value → null bucket (BinaryExpression
  * default), matching the arithmetic min/max normalization this
  * replaces. */
case class QuantileBucket(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(DoubleType, ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_qbucket"

  /** A non-foldable or null cuts argument must fail ANALYSIS, not
    * surface as an executor-side NPE when the first task forces the
    * lazy val (ADVICE r5): the contract "cuts is a literal array the
    * driver computed" is checkable at plan time, so check it there. */
  override def checkInputDataTypes(): TypeCheckResult = {
    val basic = super.checkInputDataTypes()
    if (basic.isFailure) basic
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_qbucket cuts must be a foldable literal array of doubles")
    else if (right.eval() == null)
      TypeCheckResult.TypeCheckFailure(
        "graft_qbucket cuts must not be null")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val cuts: Array[Double] = {
    require(right.foldable, "graft_qbucket cuts must be a literal array")
    right.eval().asInstanceOf[ArrayData].toDoubleArray()
  }

  override protected def nullSafeEval(v: Any, ignored: Any): Any =
    QuantileBucket.lowerBound(cuts, v.asInstanceOf[Double]).toLong

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val arr = ctx.addReferenceObj("cuts", cuts, "double[]")
      s"${ev.value} = (long) graft.functions.QuantileBucket.lowerBound($arr, $v);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantileBucket =
    copy(left = newLeft, right = newRight)
}

object QuantileBucket {
  /** First index i with cuts(i) >= v — equivalently |{i : cuts(i) < v}|,
    * the same count the interpreted fold produced. */
  def lowerBound(cuts: Array[Double], v: Double): Int = {
    var lo = 0
    var hi = cuts.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cuts(mid) < v) lo = mid + 1 else hi = mid
    }
    lo
  }

  val info = new ExpressionInfo(classOf[QuantileBucket].getName, "graft_qbucket")

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_qbucket"), info,
      (children: Seq[Expression]) => QuantileBucket(children(0), children(1)))
}
