package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

class TextOpsSpec extends GraftSpec {
  import spark.implicits._

  private def one[T](dfv: String, c: org.apache.spark.sql.Column): Any =
    Seq(dfv).toDF("t").select(c.as("v")).collect()(0).get(0)

  test("n_perplexity_approx agrees with exact ntile bucketing and never " +
      "sorts doc scores") {
    def counts(name: String) =
      SparkEntry.queries(name)(spark, sfTiny).collect()
        .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val exact = counts("q_perplexity_bucket")
    val approx = counts("n_perplexity_approx")
    // same langs and the same total doc mass; individual (lang, bucket)
    // cells may be empty on ONE side only at boundary ties (ntile forces
    // equal sizes, the cutpoint form puts ties on one side — a sparse
    // lang can legally leave a middle bucket empty), so the per-cell
    // comparison below uses getOrElse(0) with tolerance instead of
    // demanding identical key sets
    assert(exact.keys.map(_._1).toSet == approx.keys.map(_._1).toSet)
    assert(exact.values.sum == approx.values.sum)
    for (k <- exact.keySet ++ approx.keySet) {
      val n = exact.getOrElse(k, 0L)
      val na = approx.getOrElse(k, 0L)
      assert(math.abs(na - n) <= math.max(2L, n / 5),
        s"$k: exact=$n approx=$na — beyond quantile-error tolerance")
    }
    // the scale property itself: no ntile window anywhere in the plan —
    // the per-lang sort is exactly what this variant exists to delete
    val p = SparkEntry.queries("n_perplexity_approx")(spark, sfTiny)
      .queryExecution.executedPlan.toString
    // "ntile(" — the window function call; plain "ntile" would also
    // match perce-ntile-_approx, the very aggregate this path uses
    assert(!p.contains("ntile("), "approx path re-introduced the ntile sort")
  }

  test("tokens splits on any whitespace run") {
    val all = Seq("a  b\tc").toDF("t")
      .select(explode(TextOps.tokens($"t")).as("v")).collect().map(_.getString(0))
    assert(all.toSeq == Seq("a", "b", "c"))
  }

  test("normalize lowers, collapses and trims whitespace") {
    assert(one("  Hello   WORLD ", TextOps.normalize($"t")) == "hello world")
  }

  test("portableHash matches the DuckDB formula on a known value") {
    // DuckDB: CAST('0x'||substr(md5('hello'),1,8) AS BIGINT) = 1564557354
    assert(one("hello", TextOps.portableHash($"t")) == 1564557354L)
  }

  test("charShingles produces len-n+1 trigrams in order") {
    val out = Seq("abcde").toDF("t")
      .select(TextOps.charShingles($"t", 3).as("v"))
      .collect()(0).getSeq[String](0)
    assert(out == Seq("abc", "bcd", "cde"))
  }

  test("charShingles on text shorter than n yields one truncated shingle") {
    val out = Seq("ab").toDF("t")
      .select(TextOps.charShingles($"t", 3).as("v"))
      .collect()(0).getSeq[String](0)
    assert(out == Seq("ab"))
  }

  test("bpeishTokenCount counts alpha runs, digit runs, marks") {
    assert(one("ab 12 c!", TextOps.bpeishTokenCount($"t")) == 4L)
  }

  test("stopwordCount counts occurrences, not distinct membership") {
    val out = Seq("the cat the dog a x").toDF("t")
      .select(TextOps.stopwordCount(TextOps.tokens($"t"), Seq("a", "the")).as("v"))
      .collect()(0).getInt(0)
    assert(out == 3)
  }

  test("winnowing guarantee: every pair sharing a >= W+K-1 token run has " +
      "a common selected fingerprint; corpus density stays near 2/(W+1)") {
    // 20 synthetic pairs, each embedding the same 8-token run (W+K-1
    // with K=4, W=5 — the paper's guarantee threshold) at random
    // offsets inside otherwise-unrelated filler; seeded → deterministic
    val rnd = new scala.util.Random(42)
    def filler(n: Int) = Seq.fill(n)("f" + rnd.nextInt(5000))
    val docs = (0 until 20).flatMap { i =>
      val shared = Seq.tabulate(8)(j => s"s${i}_${rnd.nextInt(50)}_$j")
      Seq(
        (i * 2L, filler(rnd.nextInt(40)) ++ shared ++ filler(rnd.nextInt(40))),
        (i * 2L + 1, filler(rnd.nextInt(40)) ++ shared ++ filler(rnd.nextInt(40))))
    }
    val df = docs.toDF("doc_id", "ts")
    val sel = TextOps.winnowSelect(df, 4, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val byDoc = sel.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    (0 until 20).foreach { i =>
      assert((byDoc(i * 2L) & byDoc(i * 2L + 1)).nonEmpty,
        s"pair $i shares an 8-token run but selected no common fingerprint")
    }
    // density: expected 2/(W+1) = 0.33 of gram positions for random
    // hashes; assert a loose corpus-average ceiling that a broken
    // selector (every position, or every window emitting its edge)
    // would blow through
    val nPositions = docs.map(_._2.length - 3).sum.toDouble
    assert(sel.length / nPositions < 0.5,
      s"selection density ${sel.length / nPositions} far above 2/(W+1)")
  }
}
