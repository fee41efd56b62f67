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

  test("temperature resampling: dominant source kept whole, rates " +
      "monotone in source size, kept within totals") {
    import org.apache.spark.sql.functions._
    val rows = graft.SparkEntry.queries("q_temp_resample")(spark, sfTiny)
      .collect()
      .map(r => (r.getAs[Long]("n_kept"), r.getAs[Long]("n_total"),
        r.getAs[Long]("rate_e4")))
    assert(rows.nonEmpty)
    rows.foreach { case (kept, total, rate) =>
      assert(kept <= total)
      assert(rate >= 1L && rate <= 10000L)
    }
    // the largest source's rate is exactly 10000 (n_max / n_max)
    val maxTotal = rows.map(_._2).max
    rows.filter(_._2 == maxTotal).foreach { case (kept, total, rate) =>
      assert(rate == 10000L)
      assert(kept == total, "rate 10000 must keep every doc")
    }
    // α-smoothing: rate never decreases as source size grows
    val byN = rows.sortBy(_._2)
    byN.sliding(2).foreach {
      case Array((_, _, r1), (_, _, r2)) => assert(r1 <= r2)
      case _ =>
    }
  }

  test("corpus curation never yields more docs than the quality gate admits") {
    import org.apache.spark.sql.functions._
    val out = graft.SparkEntry.queries("q_corpus_curate")(spark, sfTiny)
      .agg(sum(col("n_docs"))).head.getLong(0)
    val total = graft.sources.Tables.documents(spark, sfTiny).count()
    assert(out > 0 && out <= total)
  }

  test("bloom decontamination: superset of the exact screen, join-free " +
      "plan, bounded over-flagging") {
    import org.apache.spark.sql.functions._
    val exact = graft.SparkEntry.queries("q_decontaminate")(spark, sfTiny)
    val bloom = graft.SparkEntry.queries("n_bloom_decontam")(spark, sfTiny)
    // one-sided error: every exactly-contaminated doc must be flagged,
    // with at least the exact hit count (fp can only add hits)
    val exactHits = exact.select(col("doc_id"), col("n_hits").as("eh"))
    val missing = exactHits.join(bloom.select(col("doc_id"), col("n_hits")),
      Seq("doc_id"), "left")
      .filter(col("n_hits").isNull || col("n_hits") < col("eh"))
    assert(missing.isEmpty, "bloom screen lost an exact contamination hit")
    // fp budget: at fpp=1e-5 and ~300 grams/doc, false doc-flags are a
    // sliver — allow a generous 5% of the corpus on top of the exact set
    val total = graft.sources.Tables.documents(spark, sfTiny).count()
    val (ne, nb) = (exact.count(), bloom.count())
    assert(nb >= ne && nb <= ne + math.max(5L, total / 20),
      s"bloom flagged $nb vs exact $ne of $total docs")
    // the whole point: the corpus side probes a broadcast sketch — no
    // join anywhere in the bloom plan
    val plan = bloom.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(2000))
  }
}
