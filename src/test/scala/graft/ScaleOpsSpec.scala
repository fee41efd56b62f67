package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewOps
import graft.sources.Tables

/** Scale-path operators: sketch accuracy, salted skew handling, and
  * bucketed co-located joins (shuffle elimination). */
class ScaleOpsSpec extends GraftSpec {
  import spark.implicits._

  test("approx aggregates stay within sketch error of exact answers") {
    val rows = SparkEntry.queries("n_agg_approx")(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
  }

  test("sketch union estimates match exact distincts within HLL error") {
    val rows = SparkEntry.queries("n_sketch_union")(spark, sfTiny).collect()
    // 5 event types + the ALL union row
    assert(rows.length == 6, rows.mkString(","))
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
    // the union row must cover at least the largest single type (a
    // union that silently dropped sketches would undercount)
    val all = rows.find(_.getString(0) == "ALL").get.getAs[Long]("approx_users")
    val maxType = rows.filter(_.getString(0) != "ALL")
      .map(_.getAs[Long]("approx_users")).max
    assert(all >= maxType)
  }

  test("n_topk_sketch: exact heavy hitters all present with exact " +
      "inside [est_freq, max_freq]") {
    val sketch = SparkEntry.queries("n_topk_sketch")(spark, sfTiny).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(sketch.nonEmpty)
    val exact = Tables.documents(spark, sfTiny)
      .select(explode(split($"text", "\\s+")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"tok").limit(10).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    exact.foreach { case (tok, n) =>
      val (est, maxF) = sketch.getOrElse(tok,
        fail(s"heavy hitter '$tok' (freq $n) missing from sketch top-k"))
      assert(est <= n && n <= maxF,
        s"'$tok': exact $n outside [est $est, max $maxF]")
    }
  }

  test("Misra–Gries kernel honors capacity and the undercount bound " +
      "under forced eviction (vocabulary >> capacity)") {
    // skewed synthetic stream: 3 heavy items in a sea of 500 singletons
    val heavy = Seq("a" -> 400L, "b" -> 250L, "c" -> 120L)
    val stream = new scala.util.Random(7).shuffle(
      heavy.flatMap { case (t, n) => Seq.fill(n.toInt)(t) } ++
        (1 to 500).map(i => s"rare$i"))
    val cap = 16
    val out = graft.operators.FreqSketch.mgPartials(stream.iterator, cap).toMap
    assert(out.size <= cap, s"summary exceeded capacity: ${out.size}")
    val n = stream.length
    val bound = n / (cap + 1)
    // every item's estimate is a lower bound within n/(cap+1) of truth
    val truth = stream.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    out.foreach { case (t, est) =>
      val tr = truth(t)
      assert(est <= tr && tr - est <= bound, s"'$t': est $est true $tr bound $bound")
    }
    // items above the guarantee threshold must survive eviction
    heavy.filter(_._2 > bound).foreach { case (t, tr) =>
      assert(out.contains(t), s"guaranteed heavy hitter '$t' ($tr > $bound) evicted")
    }
  }

  test("saltedAgg matches the direct aggregation") {
    val ev = Tables.events(spark, sfTiny)
    val direct = ev.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("s"))
      .collect().map(r => (r.getString(0), (r.getLong(1),
        math.round(r.getDouble(2) * 100)))).toMap
    val salted = SkewOps.saltedAgg(ev, $"event_type", $"event_id", 8,
      partials = Seq(count(lit(1)).as("pn"), sum($"value").as("ps")),
      merges = Seq(sum($"pn").as("n"), sum($"ps").as("s")))
      .collect().map(r => (r.getString(0), (r.getLong(1),
        math.round(r.getDouble(2) * 100)))).toMap
    assert(salted == direct)
  }

  test("saltedJoin matches the plain join") {
    val fact = Tables.orders(spark, sfTiny).select($"o_orderkey", $"o_custkey")
    val dim = Tables.customer(spark, sfTiny).select($"c_custkey", $"c_name")
    val plain = fact.join(dim, $"o_custkey" === $"c_custkey").count()
    val salted = SkewOps.saltedJoin(fact, dim, $"o_custkey", $"c_custkey", 4,
      saltBy = $"o_orderkey").count()
    assert(salted == plain)
  }

  test("saltedJoin salt assignment is stable across repartitions") {
    val fact = Tables.orders(spark, sfTiny)
      .select($"o_orderkey", $"o_custkey")
    val dim = Tables.customer(spark, sfTiny).select($"c_custkey", $"c_name")
    def saltOf(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      df.withColumn("__salt", pmod(hash($"o_orderkey"), lit(4)))
        .select($"o_orderkey", $"__salt")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // the salt is a pure function of the natural key: any physical
    // layout — original, repartitioned, coalesced — yields the same
    // assignment (monotonically_increasing_id would not)
    assert(saltOf(fact) == saltOf(fact.repartition(7)))
    // and the join result is layout-invariant row-for-row
    val a = SkewOps.saltedJoin(fact, dim, $"o_custkey", $"c_custkey", 4,
      saltBy = $"o_orderkey")
      .select($"o_orderkey", $"c_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = SkewOps.saltedJoin(fact.repartition(7), dim, $"o_custkey",
      $"c_custkey", 4, saltBy = $"o_orderkey")
      .select($"o_orderkey", $"c_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }

  test("bucketed tables co-locate the join: no shuffle exchange") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    Tables.orders(spark, sfTiny).select($"o_orderkey", $"o_custkey")
      .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_b")
    Tables.customer(spark, sfTiny).select($"c_custkey", $"c_name")
      .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_b")
    val joined = spark.table("orders_b").join(
      spark.table("customer_b").hint("merge"),
      $"o_custkey" === $"c_custkey")
    val plan = joined.queryExecution.executedPlan.toString
    // both sides pre-bucketed on the join key → SMJ without Exchange
    assert(!plan.contains("Exchange hashpartitioning"),
      plan.linesIterator.take(12).mkString("\n"))
    assert(joined.count() > 0)
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
  }
}
