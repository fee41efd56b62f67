package graft.queries

import org.apache.spark.sql.functions._
import graft.GraftSpec

/** Structural + plan-shape sanity for the corpus-preparation operators
  * (value-exact checks are the DuckDB oracle's job). */
class CorpusSpec extends GraftSpec {

  test("chunk dedup removes something, keeps accounting consistent") {
    val rows = graft.SparkEntry.queries("q_chunk_dedup")(spark, sfTiny).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val (n, k) = (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_kept"))
      assert(k >= 0 && k <= n, s"doc ${r.get(0)}: kept $k of $n")
    }
    // the testdata plants near-duplicate docs → shared chunks exist
    assert(rows.exists(r => r.getAs[Long]("n_kept") < r.getAs[Long]("n_chunks")),
      "no chunk was ever removed — dedup is a no-op on planted duplicates")
    // a fully-kept doc's digest is the md5 of its whitespace-joined chunks,
    // i.e. of the original text re-joined — not some accidental constant
    assert(rows.map(_.getAs[String]("kept_md5")).distinct.length > 1)
  }

  test("pack_seqs: every sequence is CAP-full except the last; carry-in " +
      "counts docs spanning the left boundary") {
    val Cap = 256L
    val rows = graft.SparkEntry.queries("q_pack_seqs")(spark, sfTiny)
      .collect()
    val n = rows.length
    assert(n > 1)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("seq_id") == i, "seq ids dense from 0")
      val toks = r.getAs[Long]("n_tokens")
      if (i < n - 1) assert(toks == Cap, s"seq $i has $toks tokens")
      else assert(toks >= 1 && toks <= Cap)
      assert(r.getAs[Long]("n_carry_in") <= 1,
        "at most one doc can cross any single boundary")
      assert(r.getAs[Long]("n_docs") >= 1)
    }
    // total packed tokens == corpus token count (packing loses nothing)
    val total = rows.map(_.getAs[Long]("n_tokens")).sum
    val corpus = graft.sources.Tables.documents(spark, sfTiny)
      .select(sum(size(split(col("text"), "\\s+"))).cast("long"))
      .collect()(0).getLong(0)
    assert(total == corpus, s"packed $total vs corpus $corpus")
  }

  test("pack_seqs two-level prefix sum equals the naive global window") {
    import org.apache.spark.sql.expressions.Window
    val dn = graft.sources.Tables.documents(spark, sfTiny)
      .select(col("doc_id"), size(split(col("text"), "\\s+")).cast("bigint").as("n_tok"))
    val naive = dn.withColumn("off",
      coalesce(sum(col("n_tok")).over(
        Window.orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("doc_id"), col("off"))
    // reproduce the query's two-level computation
    val b = dn.withColumn("bkt", floor(col("doc_id") / lit(64.0)).cast("bigint"))
    val within = b.withColumn("woff",
      coalesce(sum(col("n_tok")).over(
        Window.partitionBy(col("bkt")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val boffs = b.groupBy(col("bkt")).agg(sum(col("n_tok")).as("btot"))
      .withColumn("boff", coalesce(sum(col("btot")).over(
        Window.orderBy(col("bkt")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("bkt"), col("boff"))
    val twoLevel = within.join(boffs, Seq("bkt"))
      .select(col("doc_id"), (col("boff") + col("woff")).as("off"))
    assert(naive.except(twoLevel).isEmpty && twoLevel.except(naive).isEmpty)
  }

  test("mix_budget: outputs bounded by epochs and epoch+1, balance holds") {
    val rows = graft.SparkEntry.queries("q_mix_budget")(spark, sfTiny).collect()
    assert(rows.length > 1)
    rows.foreach { r =>
      val (tin, e, dout, tout) = (r.getAs[Long]("tokens_in"),
        r.getAs[Long]("epochs"), r.getAs[Long]("n_docs_out"),
        r.getAs[Long]("tokens_out"))
      val din = r.getAs[Long]("n_docs_in")
      assert(tout >= e * tin, s"${r.get(0)}: below full-epoch floor")
      assert(tout <= (e + 1) * tin, s"${r.get(0)}: above epoch+1 ceiling")
      assert(dout >= e * din && dout <= (e + 1) * din)
    }
  }

  test("quality classifier plan: no explode, no join, shuffle only for the " +
      "presentation sort") {
    val df = graft.SparkEntry.queries("q_quality_classify")(spark, sfTiny)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), "classifier must not explode tokens")
    assert(!plan.contains("Join"), "classifier is a pure per-row fold")
    // one range-partitioning exchange for the ORDER BY, nothing else
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected at most the sort exchange, got:\n$plan")
    // and it classifies both ways on real data
    val labels = df.select(col("label")).distinct().collect().map(_.getString(0))
    assert(labels.toSet == Set("keep", "drop"))
  }

  test("chunk dedup plan: no cartesian fallback, duplicate-hash dim " +
      "AQE-decided (no hint)") {
    val df = graft.SparkEntry.queries("q_chunk_dedup")(spark, sfTiny)
    assert(!df.queryExecution.analyzed.toString.contains("ResolvedHint"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("pack_seqs plan: the corpus-width window is bucket-partitioned " +
      "(only the per-bucket totals frame runs unpartitioned)") {
    val p = graft.SparkEntry.queries("q_pack_seqs")(spark, sfTiny)
      .queryExecution.executedPlan.toString
    // the data-width prefix sum must carry the bkt partition spec
    assert("Window \\[[^\\]]*\\], \\[bkt".r.findFirstIn(p).isDefined,
      s"corpus-width window lost its bucket partitioning:\n${p.take(2000)}")
  }

  test("corpus queries are deterministic across runs") {
    for (name <- Seq("q_chunk_dedup", "q_pack_seqs", "q_mix_budget")) {
      val q = graft.SparkEntry.queries(name)
      assert(q(spark, sfTiny).collect().toSeq == q(spark, sfTiny).collect().toSeq,
        s"$name not deterministic")
    }
  }
}
