package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}

/** Registration shim for Spark's INTERNAL `BloomFilterMightContain`
  * expression (the codegen'd probe the runtime-row-group-filter
  * machinery uses), which Spark does not expose in the public function
  * registry. Registering it as `graft_bloom_contains(bloomBinary,
  * longValue)` gives the library a codegen'd, UDF-free bloom probe: the
  * bloom side must be a foldable binary (a `lit(bytes)` of a serialized
  * `org.apache.spark.util.sketch.BloomFilter`, the same class
  * `DataFrameStatFunctions.bloomFilter` builds distributedly), the
  * value side a BIGINT — exactly the library's 60-bit portable gram
  * hashes. */
object BloomContains {
  val info =
    new ExpressionInfo(classOf[BloomFilterMightContain].getName,
      "graft_bloom_contains")

  /** Single builder shared by both registration paths (per-session
    * register and the spark.sql.extensions injection). */
  val builder: Seq[Expression] => Expression =
    children => BloomFilterMightContain(children(0), children(1))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_bloom_contains"), info, builder)
}
