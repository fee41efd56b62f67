package graft

import org.apache.spark.sql.functions._
import graft.functions.BitsetIntersectCount

class BitsetIntersectSpec extends GraftSpec {

  test("graft_bitset_icnt equals the unrolled bit_count chain") {
    BitsetIntersectCount.register(spark)
    import spark.implicits._
    val df = Seq(
      (Seq(0xFFL, 0x0FL, 0L), Seq(0x0FL, 0xFFL, -1L)),
      (Seq(-1L, -1L), Seq(-1L, -1L)),
      (Seq(0L), Seq(-1L)),
      (Seq(0x5555555555555555L), Seq(0xAAAAAAAAAAAAAAAAL.toLong))
    ).toDF("a", "b")
    val unrolled = (0 until 3).map(i =>
      coalesce(expr(s"bit_count(get(a, $i) & get(b, $i))"), lit(0))).reduce(_ + _)
    val rows = df.select(
      call_function("graft_bitset_icnt", col("a"), col("b")).as("fused"),
      unrolled.cast("long").as("unrolled")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"fused=${r.getLong(0)} unrolled=${r.getLong(1)}"))
    // spot values: 0xFF&0x0F=4 bits, 0x0F&0xFF=4 bits, 0&-1=0 → 8
    assert(rows(0).getLong(0) == 8)
    assert(rows(1).getLong(0) == 128)
    assert(rows(2).getLong(0) == 0)
    assert(rows(3).getLong(0) == 0) // disjoint alternating masks
  }

  test("interpreted eval matches codegen result") {
    BitsetIntersectCount.register(spark)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val a = Literal.create(ArrayData.toArrayData(Array(0xF0F0L, 7L)),
      ArrayType(LongType))
    val b = Literal.create(ArrayData.toArrayData(Array(0xFF00L, 5L)),
      ArrayType(LongType))
    val e = BitsetIntersectCount(a, b)
    // 0xF0F0 & 0xFF00 = 0xF000 (4 bits); 7 & 5 = 5 (2 bits)
    assert(e.eval(null) == 6L)
  }
}
