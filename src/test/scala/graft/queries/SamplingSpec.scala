package graft.queries

import graft.GraftSpec

/** Statistical + structural sanity for the deterministic samplers (the
  * value-exact check is the DuckDB oracle's job). */
class SamplingSpec extends GraftSpec {

  test("stratified sample rates land near their per-stratum targets") {
    import org.apache.spark.sql.functions._
    val totals = graft.sources.Tables.lineitem(spark, sfTiny)
      .groupBy(col("l_returnflag")).count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val sampled = graft.SparkEntry.queries("q_stratified_sample")(spark, sfTiny)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val target = Map("A" -> 0.05, "N" -> 0.01, "R" -> 0.10)
    sampled.foreach { case (flag, n) =>
      val rate = n.toDouble / totals(flag)
      val t = target.getOrElse(flag, 0.10)
      // hash-mod sampling is binomial around the target; tiny strata are
      // noisy, so accept a generous band — the point is "samples", not
      // "keeps everything" or "keeps nothing"
      assert(rate > t / 4 && rate < t * 4,
        s"$flag: rate $rate far from target $t (n=$n of ${totals(flag)})")
    }
  }

  test("stratified sample is deterministic across runs") {
    val q = graft.SparkEntry.queries("q_stratified_sample")
    val a = q(spark, sfTiny).collect().toSeq
    val b = q(spark, sfTiny).collect().toSeq
    assert(a == b)
  }

  test("corpus curation never yields more docs than the quality gate admits") {
    import org.apache.spark.sql.functions._
    val out = graft.SparkEntry.queries("q_corpus_curate")(spark, sfTiny)
      .agg(sum(col("n_docs"))).head.getLong(0)
    val total = graft.sources.Tables.documents(spark, sfTiny).count()
    assert(out > 0 && out <= total)
  }
}
