package graft

import org.apache.spark.sql.functions._
import graft.functions.Parity.dround

/** dround = DuckDB's half-away-from-zero double rounding (see
  * Parity.scala scaladoc for why Spark's round differs). Property cases
  * use a seeded sample evaluated in one DataFrame pass (the scalacheck
  * scalatest bridge isn't on the offline classpath). */
class ParitySpec extends GraftSpec {
  import spark.implicits._

  private def d2(x: Double, n: Int): Double =
    Seq(x).toDF("x").select(dround($"x", n).as("r")).collect()(0).getDouble(0)

  test("rounds the raw double, half away from zero on both signs") {
    // DuckDB-verified cases: round(CAST(x AS DOUBLE), 2) gives exactly
    // these. Note 2.675 → 2.68 (the ×100 product rounds up to exactly
    // 267.5) while 19570.815 → .81 (its product stays below the tie) —
    // the pair documents why "round the scaled double" is the contract,
    // not "round the decimal literal".
    assert(d2(2.675, 2) == 2.68)
    assert(d2(0.125, 2) == 0.13)   // 0.125 is exact in binary → ties away
    assert(d2(-0.125, 2) == -0.13)
    assert(d2(19570.815, 2) == 19570.81) // the q_agg_basic regression case
  }

  test("identity on already-rounded values") {
    assert(d2(3.14, 2) == 3.14)
    assert(d2(-42.0, 2) == -42.0)
  }

  test("properties on a seeded random sample: bounded error, sign kept") {
    val rnd = new scala.util.Random(42)
    val xs = Seq.fill(500)((rnd.nextDouble() - 0.5) * 2e6) ++
      Seq.fill(100)(rnd.nextDouble() - 0.5) // small magnitudes too
    val rows = xs.toDF("x")
      .select($"x", dround($"x", 2).as("r")).collect()
    rows.foreach { row =>
      val (x, r) = (row.getDouble(0), row.getDouble(1))
      assert(math.abs(r - x) <= 0.005 + math.ulp(x * 100) * 2, s"x=$x r=$r")
      if (math.abs(x) > 0.01)
        assert(math.signum(r) == math.signum(x), s"sign flip: x=$x r=$r")
    }
  }

  test("matches java.lang.Math.round semantics on the scaled double") {
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(300)((rnd.nextDouble() - 0.5) * 1e4)
    val rows = xs.toDF("x").select($"x", dround($"x", 2).as("r")).collect()
    rows.foreach { row =>
      val (x, r) = (row.getDouble(0), row.getDouble(1))
      val expect =
        if (x >= 0) math.floor(x * 100 + 0.5) / 100
        else -(math.floor(-x * 100 + 0.5) / 100)
      assert(r == expect, s"x=$x r=$r expect=$expect")
    }
  }
}
