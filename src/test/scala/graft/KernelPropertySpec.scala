package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._

/** Property-based checks for the pure scalar kernels the hot paths
  * lean on — the places where an off-by-one survives example tests:
  * QuantileBucket's binary search (tie handling at duplicate
  * cutpoints), Hive path-unescaping (the n_compact audit join), and
  * the Morton interleave (bit placement). Deterministic: scalacheck
  * runs with its default fixed-parameters seed path under `check`,
  * and the Spark-evaluated properties use seeded samples. */
class KernelPropertySpec extends GraftSpec {

  private def holds(p: Prop, n: Int = 500): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(r.passed, r.status.toString)
  }

  test("QuantileBucket.lowerBound equals the linear count of cuts " +
      "strictly below v, including ties and duplicates") {
    val genCuts = Gen.listOf(Gen.chooseNum(-1e6, 1e6))
      .map(_.sorted.toArray)
    // half the probes are exact cutpoint values — the tie path where a
    // biased binary search would disagree with the linear count
    def genV(cuts: Array[Double]) =
      if (cuts.isEmpty) Gen.chooseNum(-1e6, 1e6)
      else Gen.oneOf(Gen.chooseNum(-2e6, 2e6), Gen.oneOf(cuts.toSeq))
    holds(Prop.forAll(genCuts) { cuts =>
      Prop.forAll(genV(cuts)) { v =>
        graft.functions.QuantileBucket.lowerBound(cuts, v) ==
          cuts.count(_ < v)
      }
    })
  }

  test("QuantileBucket.lowerBound is monotone in v and bounded by the " +
      "cut count") {
    val genCuts = Gen.nonEmptyListOf(Gen.chooseNum(-1e3, 1e3))
      .map(_.sorted.toArray)
    holds(Prop.forAll(genCuts, Gen.chooseNum(-2e3, 2e3),
        Gen.chooseNum(0.0, 10.0)) { (cuts, v, d) =>
      val a = graft.functions.QuantileBucket.lowerBound(cuts, v)
      val b = graft.functions.QuantileBucket.lowerBound(cuts, v + d)
      a >= 0 && b <= cuts.length && a <= b
    })
  }

  test("unescapePathName inverts Hive-style %XX escaping and fixes " +
      "escape-free strings") {
    val reserved = "%/=: #\\'\"".toSet
    def escape(s: String): String = s.flatMap { c =>
      if (reserved(c) || c < ' ') f"%%${c.toInt}%02X" else c.toString
    }
    val genStr = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(reserved.toSeq))).map(_.mkString)
    holds(Prop.forAll(genStr) { s =>
      graft.operators.Sinks.unescapePathName(escape(s)) == s
    })
    holds(Prop.forAll(Gen.alphaNumStr) { s =>
      graft.operators.Sinks.unescapePathName(s) == s
    })
  }

  test("morton16 places a's bit i at 2i and b's at 2i+1 (Spark eval vs " +
      "reference interleave, seeded sample)") {
    import spark.implicits._
    def ref(a: Long, b: Long): Long = {
      var z = 0L
      for (i <- 0 until 16) {
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val rnd = new scala.util.Random(7)
    val sample = Seq.fill(300)((rnd.nextLong() & 0xFFFFL,
      rnd.nextLong() & 0xFFFFL))
    val got = sample.toDF("a", "b")
      .select(graft.operators.Layout.morton16(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    sample.zip(got).foreach { case ((a, b), z) =>
      assert(z == ref(a, b), s"morton16($a, $b) = $z, expected ${ref(a, b)}")
    }
  }

  test("graft_qbucket (codegen path) equals lowerBound over a seeded " +
      "sample against literal cuts") {
    import spark.implicits._
    graft.functions.QuantileBucket.register(spark)
    val rnd = new scala.util.Random(11)
    val cuts = Array.fill(255)(rnd.nextDouble() * 1000).sorted
    // mix exact cutpoints into the probes to hit the tie path in the
    // generated code too
    val vs = Seq.fill(500)(
      if (rnd.nextBoolean()) cuts(rnd.nextInt(cuts.length))
      else rnd.nextDouble() * 1200 - 100)
    val got = vs.toDF("v")
      .select(call_function("graft_qbucket", col("v"),
        array(cuts.map(lit(_)): _*)).as("b"))
      .collect().map(_.getLong(0))
    vs.zip(got).foreach { case (v, b) =>
      assert(b == graft.functions.QuantileBucket.lowerBound(cuts, v).toLong,
        s"qbucket($v) = $b")
    }
  }
}
