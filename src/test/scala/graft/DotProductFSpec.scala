package graft

import org.apache.spark.sql.functions._
import graft.functions.DotProductF
import graft.operators.VectorOps

class DotProductFSpec extends GraftSpec {

  test("registers and evaluates via SQL on a live session") {
    DotProductF.register(spark)
    val r = spark.sql(
      "SELECT graft_dot_f(array(CAST(1.5 AS FLOAT), CAST(2 AS FLOAT))," +
        " array(CAST(3 AS FLOAT), CAST(0.5 AS FLOAT))) AS d")
      .collect()(0).getDouble(0)
    assert(r == 1.5 * 3 + 2 * 0.5)
  }

  test("bit-identical to the dimension-unrolled dotF on real embeddings") {
    DotProductF.register(spark)
    val e = graft.sources.Tables.embeddings(spark, sfTiny)
      .select(col("vec_id"), col("embedding"))
    val both = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .limit(200)
      .select(
        call_function("graft_dot_f", col("a.embedding"), col("b.embedding")).as("native"),
        VectorOps.dotF(col("a.embedding"), col("b.embedding"), 64).as("unrolled"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1),
        s"native=${r.getDouble(0)} unrolled=${r.getDouble(1)}")
    }
  }

  test("stays inside whole-stage codegen (no interpreted fallback)") {
    DotProductF.register(spark)
    val e = graft.sources.Tables.embeddings(spark, sfTiny)
    val plan = e.select(
      call_function("graft_dot_f", col("embedding"), col("embedding")).as("d"))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [graft_dot_f"), plan.take(500))
  }

  test("null array yields null; length mismatch bounds the loop") {
    DotProductF.register(spark)
    val r = spark.sql(
      "SELECT graft_dot_f(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1 AS FLOAT)))," +
        " graft_dot_f(array(CAST(2 AS FLOAT), CAST(9 AS FLOAT)), array(CAST(3 AS FLOAT)))")
      .collect()(0)
    assert(r.isNullAt(0))
    assert(r.getDouble(1) == 6.0)
  }
}
