package graft

import org.apache.spark.sql.functions._
import graft.functions.SortedIntersectCount

class SortedIntersectSpec extends GraftSpec {

  test("graft_sorted_icnt equals size(array_intersect) on sorted distinct arrays") {
    SortedIntersectCount.register(spark)
    import spark.implicits._
    val df = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 5L, 10L)),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      (Seq(1L, 2L), Seq(3L, 4L)),
      (Seq.empty[Long], Seq(1L)),
      (Seq(Long.MinValue, -5L, 0L, Long.MaxValue),
        Seq(Long.MinValue, 0L, 7L, Long.MaxValue))
    ).toDF("a", "b")
    val rows = df.select(
      call_function("graft_sorted_icnt", col("a"), col("b")).as("fused"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("builtin"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"fused=${r.getLong(0)} builtin=${r.getLong(1)}"))
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 3L, 0L, 0L, 3L))
  }

  test("merge scan agrees with builtin on random sorted hash-like arrays") {
    SortedIntersectCount.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val data = (0 until 200).map { _ =>
      def arr() = Array.fill(rnd.nextInt(40))(rnd.nextInt(1 << 20).toLong)
        .distinct.sorted.toSeq
      (arr(), arr())
    }
    val bad = data.toDF("a", "b").select(
      call_function("graft_sorted_icnt", col("a"), col("b")).as("fused"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("builtin"))
      .filter(col("fused") =!= col("builtin")).count()
    assert(bad == 0)
  }

  test("interpreted eval matches codegen result") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val a = Literal.create(ArrayData.toArrayData(Array(1L, 4L, 6L)),
      ArrayType(LongType))
    val b = Literal.create(ArrayData.toArrayData(Array(2L, 4L, 6L, 8L)),
      ArrayType(LongType))
    assert(SortedIntersectCount(a, b).eval(null) == 2L)
  }
}
