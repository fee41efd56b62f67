package graft

import graft.queries.UdfSurface

class UdfSurfaceSpec extends GraftSpec {

  test("classifyToken covers all arms incl. null header") {
    assert(UdfSurface.classifyToken("Bearer tok", false) == "valid")
    assert(UdfSurface.classifyToken("Bearer tok", true) == "expired")
    assert(UdfSurface.classifyToken("garbage", false) == "invalid")
    assert(UdfSurface.classifyToken("garbage", true) == "invalid")
    assert(UdfSurface.classifyToken(null, false) == "invalid")
  }

  test("Aggregator weighted-avg equals the built-in expression") {
    val rows = graft.SparkEntry.queries("n_udaf_agg")(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val udafV = r.getAs[Double]("wavg_price")
      val builtin = r.getAs[Double]("wavg_builtin")
      assert(math.abs(udafV - builtin) < 1e-6,
        s"${r.getString(0)}: udaf=$udafV builtin=$builtin")
    }
  }

  test("WeightedAvg merge/finish semantics") {
    import graft.functions.{WAvgBuf, WeightedAvg}
    val b = WeightedAvg.merge(
      WeightedAvg.reduce(WeightedAvg.zero, (10.0, 2.0)),
      WeightedAvg.reduce(WeightedAvg.zero, (20.0, 6.0)))
    assert(WeightedAvg.finish(b) == (10.0 * 2 + 20.0 * 6) / 8.0)
    assert(WeightedAvg.finish(WeightedAvg.zero).isNaN)
  }
}
