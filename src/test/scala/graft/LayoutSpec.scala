package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Z-order layout: the Morton interleave must be the textbook bit
  * spread, and the written layout must buy min/max skipping on BOTH
  * dimensions where a single-key sort serves exactly one. */
class LayoutSpec extends GraftSpec {
  import spark.implicits._

  test("morton16 interleaves bits (known values, monotone locality)") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (0xFFFFL, 0L),
      (0L, 0xFFFFL), (3L, 5L))
      .toDF("a", "b")
      .select(Layout.morton16(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    // a→even bits, b→odd bits
    assert(rows(0) == 0L)
    assert(rows(1) == 1L)
    assert(rows(2) == 2L)
    assert(rows(3) == 3L)
    assert(rows(4) == 0x55555555L)
    assert(rows(5) == 0xAAAAAAAAL)
    // a=3 (0b11) → 0b0101; b=5 (0b101) → 0b100010 ⇒ z = 0b100111
    assert(rows(6) == 0x27L)
  }

  test("quantile grid survives a heavy-tailed dimension where linear " +
      "min/max normalization collapses") {
    // b is ~uniform on [0, 10000) with ONE enormous outlier. A linear
    // min/max grid maps every non-outlier b value to bucket 0 (the
    // outlier stretches the domain by ~10^15), so the Morton code
    // degenerates to a single-key sort on a and b-pruning dies (read
    // fraction ~1.0). Quantile cutpoints ignore the outlier's VALUE and
    // keep ~equal row mass per cell — both dims must still skip files.
    val n = 20000L
    val df = spark.range(n).select(
      col("id").as("a"),
      when(col("id") === 0, lit(Long.MaxValue / 2))
        .otherwise(pmod(col("id") * 7919L, lit(10000L))).as("b"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_layout_skew").toFile
    try {
      Layout.writeZOrdered(df, dir.getAbsolutePath, col("a"), col("b"), 16)
      val fa = Layout.overlapFraction(spark, dir.getAbsolutePath, "a",
        n * 7 / 16, n * 9 / 16)
      val fb = Layout.overlapFraction(spark, dir.getAbsolutePath, "b",
        4375L, 5625L)
      assert(fa <= 0.8, s"a stopped pruning under skew: $fa")
      assert(fb <= 0.8, s"b stopped pruning under skew: $fb")
    } finally graft.operators.Sinks.deleteRecursively(dir)
  }

  test("z-order prunes on both dims; single sort prunes only its key") {
    val rows = SparkEntry.queries("n_zorder")(spark, sfTiny).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    def frac(l: String, d: String): Double = rows((l, d))
    // single-key layout: perfect on its key, blind on the other
    assert(frac("single_sort", "user_id") <= 0.5)
    assert(frac("single_sort", "event_id") >= 0.9,
      "event_id should span every user_id-sorted file")
    // z layout: BOTH dims skip a real fraction of files
    assert(frac("zorder", "user_id") <= 0.8)
    assert(frac("zorder", "event_id") <= 0.8)
  }
}
