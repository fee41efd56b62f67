package graft.queries

import graft.GraftSpec

class SimilaritySpec extends GraftSpec {

  test("Lloyd's training sample: fraction unchanged below the row cap " +
      "(small-corpus retrains stay bit-identical), row-bounded above it") {
    // below the cap: exactly the historical 0.25 — the same (fraction,
    // seed) draws the IDENTICAL sample, so persisted models round-trip
    assert(Similarity.sampleFraction(0L) == 0.25)
    assert(Similarity.sampleFraction(1000L) == 0.25)
    assert(Similarity.sampleFraction(4 * Similarity.SampleCapRows) == 0.25)
    // above it: the expected sample is exactly the cap, however big the
    // corpus — 0.25 of 100 TB of embeddings must never feed Lloyd's
    for (n <- Seq(10000000L, 400000000L, 20000000000L)) {
      val f = Similarity.sampleFraction(n)
      assert(math.abs(f * n - Similarity.SampleCapRows.toDouble) < 1e-3,
        s"n=$n expected-cap drift: ${f * n}")
      assert(f < 0.25)
    }
    // and a real sample over a large synthetic frame is bounded (±20%
    // Bernoulli noise allowance, far below the uncapped 500k)
    val n = 2000000L
    val cnt = spark.range(n)
      .sample(withReplacement = false,
        fraction = Similarity.sampleFraction(n), seed = 7).count()
    assert(cnt < (Similarity.SampleCapRows * 1.2).toLong,
      s"sample not bounded: $cnt")
    assert(cnt > (Similarity.SampleCapRows * 0.8).toLong,
      s"sample suspiciously small: $cnt")
  }

  test("hpComponent is deterministic, 3-decimal rational in [-1, 1]") {
    val a = Similarity.hpComponent(0, 1, 2)
    val b = Similarity.hpComponent(0, 1, 2)
    assert(a == b)
    assert(a >= -1.0 && a <= 1.0)
    assert((a * 1000).round / 1000.0 == a) // exact 3-decimal rational
    // different coordinates give different values (not a constant plane)
    val distinct = (0 until 64).map(d => Similarity.hpComponent(0, 0, d)).distinct
    assert(distinct.size > 32)
  }

  test("exact knn: every vector gets exactly k neighbors, self excluded") {
    val df = graft.SparkEntry.queries("q_cosine_knn")(spark, sfTiny).cache()
    val perId = df.groupBy("id1").count().collect()
    assert(perId.forall(_.getLong(1) == 5))
    assert(df.filter("id1 = id2").count() == 0)
    // rank 1 neighbor has the max rounded sim for its query vector
    val viol = df.as("a").join(df.as("b"), "id1")
      .filter("a.rn = 1 AND b.cos_sim > a.cos_sim").count()
    assert(viol == 0)
    df.unpersist()
  }

  test("exact knn plan is distributed: no broadcast, no driver-side table") {
    // Round-1's kernel collect()ed the table to the driver and broadcast
    // it; the block-pair scan must keep everything in shuffled tasks.
    val plan = graft.SparkEntry.queries("q_cosine_knn")(spark, sfTiny)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastExchange"), s"broadcast in plan:\n$plan")
    assert(plan.contains("MapGroups"), s"expected MapGroups kernel:\n$plan")
  }

  test("semdedup: accounting is total, removals are witness-bounded, " +
      "and the trained pipeline is deterministic") {
    val run1 = graft.SparkEntry.queries("n_semdedup")(spark, sfTiny).collect()
    val total = graft.sources.Tables.embeddings(spark, sfTiny).count()
    // every vector lands in exactly one cell
    assert(run1.map(_.getAs[Long]("n_vecs")).sum == total)
    run1.foreach { r =>
      assert(r.getAs[Long]("n_kept") ==
        r.getAs[Long]("n_vecs") - r.getAs[Long]("n_removed"))
    }
    // a removed vector needs a lower-id IN-CELL neighbor with cos >= tau;
    // in-cell pairs are a subset of the global tau-pairs, so removals
    // are bounded by the distinct larger ids of q_embed_neardup (same
    // threshold) — more removals than global witnesses means the join
    // invented pairs
    val witnesses = graft.SparkEntry.queries("q_embed_neardup")(spark, sfTiny)
      .select("id2").distinct().count()
    assert(run1.map(_.getAs[Long]("n_removed")).sum <= witnesses)
    // sample-trained Lloyd's is seeded and hash-initialized — a second
    // invocation must reproduce the exact accounting
    val run2 = graft.SparkEntry.queries("n_semdedup")(spark, sfTiny).collect()
    assert(run1.map(_.toString).toSeq == run2.map(_.toString).toSeq)
  }

  test("ivf knn: per-cell search recovers a sane share of exact top-3") {
    val exact = graft.SparkEntry.queries("q_cosine_knn")(spark, sfTiny)
      .filter("rn <= 3").selectExpr("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = graft.SparkEntry.queries("n_cosine_knn_ivf")(spark, sfTiny)
      .selectExpr("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.nonEmpty)
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall > 0.1, s"IVF recall suspiciously low: $recall")
  }

  test("pq ann: 8-byte codes recover a sane share of exact top-3, " +
      "deterministically, with the corpus side never shuffled") {
    val pq = graft.SparkEntry.queries("n_pq_ann")(spark, sfTiny)
    val rows = pq.collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Int]("rn") <= 3))
    // recall against exact ground truth, restricted to the PQ query set
    val qids = rows.map(_.getLong(0)).toSet
    val exact = graft.SparkEntry.queries("q_cosine_knn")(spark, sfTiny)
      .filter("rn <= 3").selectExpr("id1", "id2").collect()
      .filter(r => qids.contains(r.getLong(0)))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // the bar siblings (IVF ~0.38, LSH ~0.27) meet on this near-uniform
    // synthetic data — measured PQ(8x64) lands ~0.27
    assert(recall > 0.1, s"PQ recall suspiciously low: $recall")
    // trained codebooks are hash-seeded → exact reproducibility
    val rows2 = graft.SparkEntry.queries("n_pq_ann")(spark, sfTiny).collect()
    assert(rows.map(_.toString).toSeq == rows2.map(_.toString).toSeq)
    // ADC scan shape: query tables broadcast, corpus codes never shuffled
    // before the per-query ranking window
    val plan = pq.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan.take(2000))
  }

  test("ivf_pq: composed routing recovers exact-top-3 pairs and the code " +
      "scan is a broadcast-pruned hash join, not a full scan") {
    val df = graft.SparkEntry.queries("n_ivf_pq")(spark, sfTiny)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Int]("rn") <= 3))
    // recall vs exact ground truth, restricted to the query set — the
    // composition stacks IVF's routing loss on PQ's quantization loss,
    // so the bar sits under either half alone (IVF ~0.38, PQ ~0.27)
    val qids = rows.map(_.getLong(0)).toSet
    val exact = graft.SparkEntry.queries("q_cosine_knn")(spark, sfTiny)
      .filter("rn <= 3").selectExpr("id1", "id2").collect()
      .filter(r => qids.contains(r.getLong(0)))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // measured 0.21 (residual encoding with the per-cell qc2 term; the
    // term's absence is a cross-cell ranking bug this floor would catch)
    assert(recall > 0.1, s"IVF-PQ recall suspiciously low: $recall")
    // every returned candidate shares a probed cell with its query by
    // construction; the output is capped at K per query
    assert(rows.groupBy(_.getLong(0)).values.forall(_.length <= 3))
    // deterministic: both models are persisted, hash-seeded artifacts
    val rows2 = graft.SparkEntry.queries("n_ivf_pq")(spark, sfTiny).collect()
    assert(rows.map(_.toString).toSeq == rows2.map(_.toString).toSeq)
    // THE plan pin: the code scan joins the corpus codes against the
    // BROADCAST probe frame on the cell key — a hash lookup that drops
    // unprobed cells, in place of n_pq_ann's deliberate full-scan
    // crossJoin. The K-row centroid frames still ride BNLJs (model
    // frames, deliberate); the cell join itself must be a
    // BroadcastHashJoin and nothing may plan a cartesian.
    val p = df.queryExecution.executedPlan.toString
    assert(p.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("cell#")),
      s"cell join is not a broadcast hash join:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("ann index persist: served-from-disk equals in-query n_ivf_pq " +
      "and the index scan prunes to the probed cells' partitions") {
    val served = graft.SparkEntry.queries("n_ann_index_persist")(spark, sfTiny)
    val rows = served.collect()
    assert(rows.nonEmpty)
    // the STRONGEST pin available: same deterministic models + routing
    // + ADC ranking ⇒ the disk-served rows must EQUAL the in-query
    // composition exactly, modulo one parquet round-trip
    val inQuery = graft.SparkEntry.queries("n_ivf_pq")(spark, sfTiny).collect()
    assert(rows.map(_.toString).toSeq == inQuery.map(_.toString).toSeq,
      "disk-served top-k diverged from the in-query IVF-PQ result")
    // file-level pruning: the index scan must carry the probed-cell
    // predicate as a PARTITION filter (directory pruning), not a data
    // filter evaluated after reading every cell
    val p = served.queryExecution.executedPlan.toString
    assert(p.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("cell")
        && !l.contains("PartitionFilters: []")),
      s"index scan does not prune cell partitions:\n${p.take(3000)}")
  }

  test("ann incr build: scaffold components partition the corpus and a " +
      "second invocation rebuilds nothing") {
    val acct = graft.SparkEntry.queries("n_ann_incr_build")(spark, sfTiny)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(acct.keySet == Set("base", "batch_ids", "table"))
    // base excludes exactly the batch ids: the two together are the corpus
    val corpus = graft.sources.Tables.embeddings(spark, sfTiny).count()
    assert(acct("base") + acct("batch_ids") == corpus,
      s"base ${acct("base")} + batch ${acct("batch_ids")} != corpus $corpus")
    // table starts as a byte clone of base and only ever grows by the
    // merged batch (if n_ann_index_incr already ran in this JVM)
    assert(acct("table") == acct("base") || acct("table") == corpus,
      s"table ${acct("table")} matches neither pristine base nor merged corpus")
    // idempotent: the scaffold's _SUCCESS guards mean a second build
    // invocation touches no base file (the 51 s cold line must be
    // once-per-snapshot, not once-per-invocation)
    def baseFiles(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(
        new java.io.File(Similarity.annIncrRoot(spark, sfTiny)), "base"))
        .map(f => f.getAbsolutePath -> f.lastModified()).toMap
    }
    val before = baseFiles()
    graft.SparkEntry.queries("n_ann_incr_build")(spark, sfTiny).collect()
    assert(baseFiles() == before, "second build invocation rewrote the base")
  }

  test("ann index incr: cell-sparse batch rewrites ONLY dirty partitions, " +
      "merged index equals the full rebuild, accounting independently verified") {
    val acct1 = graft.SparkEntry.queries("n_ann_index_incr")(spark, sfTiny)
      .collect()
    assert(acct1.nonEmpty)
    val dirty = acct1.map(_.getAs[Int]("cell")).toSet
    // CELL-SPARSE (round-5 verdict item 3): the batch must dirty
    // strictly fewer cells than K=16, or "rewrites B/K of the index"
    // is never demonstrated with B < K
    assert(dirty.nonEmpty && dirty.size < 16, s"dirty set not sparse: $dirty")
    val root = new java.io.File(Similarity.annIncrRoot(spark, sfTiny))
    val tableDir = new java.io.File(root, "table")
    def cellFiles(): Map[Int, Map[String, Long]] =
      Option(tableDir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("cell="))
        .map(f => f.getName.stripPrefix("cell=").toInt ->
          Option(f.listFiles()).getOrElse(Array.empty)
            .filter(_.getName.endsWith(".parquet"))
            .map(x => x.getName -> x.lastModified()).toMap)
        .toMap
    val before = cellFiles()
    val acct2 = graft.SparkEntry.queries("n_ann_index_incr")(spark, sfTiny)
      .collect()
    val after = cellFiles()
    // bounded write amplification made OBSERVABLE: a second invocation
    // (same batch, same dirty set) leaves every non-dirty cell's
    // partition files byte-untouched (same names, same mtimes) while
    // the dynamic overwrite rewrites the dirty cells (fresh part files)
    for (c <- before.keySet ++ after.keySet; if !dirty.contains(c))
      assert(before.get(c) == after.get(c),
        s"non-dirty cell $c was rewritten")
    assert(dirty.exists(c => before.get(c) != after.get(c)),
      "no dirty partition changed — the merge wrote nothing")
    // accounting: n_before must equal the BASE tree's own per-cell count
    // (ADVICE r5: the query derives n_before = n_after - n_added, so
    // checking that identity inside the output is tautological)
    val baseMap = spark.read.parquet(new java.io.File(root, "base").getAbsolutePath)
      .selectExpr("CAST(cell AS INT) AS cell")
      .groupBy("cell").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    acct2.foreach { r =>
      val c = r.getAs[Int]("cell")
      assert(r.getAs[Long]("n_before") == baseMap.getOrElse(c, 0L),
        s"cell $c: n_before=${r.getAs[Long]("n_before")} " +
          s"but base holds ${baseMap.getOrElse(c, 0L)}")
      assert(r.getAs[Long]("n_after") ==
        r.getAs[Long]("n_before") + r.getAs[Long]("n_added"))
    }
    // increment ≡ rebuild: per-vector encoding under frozen models is
    // independent, so base + merged batch must reproduce the
    // full-corpus index exactly. Read the table the query just merged
    // and compare to n_ann_index_persist's full index (same models).
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.selectExpr("id2", "CAST(cell AS INT) AS cell", "codes")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2).toList)).toSet
    // n_ann_index_persist builds/reuses the full index on disk
    graft.SparkEntry.queries("n_ann_index_persist")(spark, sfTiny).count()
    val full = rowsOf(spark.read.parquet(Similarity.annIndexPath(spark, sfTiny)))
    // the mutable serving table reads through its pinned manifest
    // snapshot (the raw dir retains one past generation for in-flight
    // readers — TableCommit's retention contract)
    val merged = rowsOf(graft.operators.TableCommit.read(
      spark, tableDir.getAbsolutePath))
    assert(merged == full,
      s"incremental merge diverged from rebuild: merged=${merged.size} " +
        s"full=${full.size} symm-diff=${(merged diff full).size + (full diff merged).size}")
  }

  test("ann index rebuild: fresh corpus is a no-op that leaves the index " +
      "untouched; forced staleness retrains and rebuilds a serving-identical index") {
    // invocation 1 establishes (or confirms) the baseline for the
    // current model generation; the index exists via the persist line
    graft.SparkEntry.queries("n_ann_index_rebuild")(spark, sfTiny).collect()
    graft.SparkEntry.queries("n_ann_index_persist")(spark, sfTiny).count()
    def snapshot(p: String): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(p))
        .map(f => f.getAbsolutePath -> f.lastModified()).toMap
    }
    val idxBefore = snapshot(Similarity.annIndexPath(spark, sfTiny))
    assert(idxBefore.nonEmpty)
    // static corpus + same models => fresh verdict, zero index writes
    val fresh = graft.SparkEntry.queries("n_ann_index_rebuild")(spark, sfTiny)
      .collect()
    assert(fresh.nonEmpty)
    assert(fresh.forall(_.getAs[String]("action") == "fresh_noop"),
      s"expected fresh_noop, got ${fresh.map(_.getAs[String]("action")).distinct.toSeq}")
    // the drift audit is total: every indexed vector counted once
    assert(fresh.map(_.getAs[Long]("n_now")).sum ==
      fresh.map(_.getAs[Long]("n_build")).sum)
    assert(fresh.map(_.getAs[Long]("n_now")).sum > 0)
    assert(snapshot(Similarity.annIndexPath(spark, sfTiny)) == idxBefore,
      "a fresh verdict must not touch the persisted index")
    // forced staleness: the full lifecycle — retrain the serving pair,
    // rebuild the index from scratch, re-baseline the stats
    val forced = Similarity.annIndexRebuild(spark, sfTiny, forceStale = true)
      .collect()
    assert(forced.forall(_.getAs[String]("action") == "retrain_rebuild"))
    val idxAfter = Similarity.annIndexPath(spark, sfTiny)
    assert(new java.io.File(idxAfter, "_SUCCESS").exists())
    assert(snapshot(idxAfter) != idxBefore,
      "forced rebuild did not rewrite the index tree")
    // rebuilt-index ≡ full build: the disk-served top-k must equal the
    // in-query composition, which recomputes the index from scratch
    val served = graft.SparkEntry.queries("n_ann_index_persist")(spark, sfTiny)
      .collect()
    val inQuery = graft.SparkEntry.queries("n_ivf_pq")(spark, sfTiny).collect()
    assert(served.map(_.toString).toSeq == inQuery.map(_.toString).toSeq,
      "rebuilt index diverged from the in-query composition")
    // and a re-check right after the rebuild is fresh again
    val again = graft.SparkEntry.queries("n_ann_index_rebuild")(spark, sfTiny)
      .collect()
    assert(again.forall(_.getAs[String]("action") == "fresh_noop"))
  }

  test("ann model store: disk-loaded artifacts equal freshly-trained, " +
      "and the serving queries reuse them") {
    graft.operators.ModelStore.evict(sfTiny)
    // first call trains and persists; second call loads from disk
    val trained = Similarity.ivfCentroids(spark, sfTiny)
    val loaded = Similarity.ivfCentroids(spark, sfTiny)
    assert(trained.map(_.toSeq).toSeq == loaded.map(_.toSeq).toSeq,
      "disk round-trip changed the IVF centroids")
    val pqTrained = Similarity.pqCodebooks(spark, sfTiny)
    val pqLoaded = Similarity.pqCodebooks(spark, sfTiny)
    assert(pqTrained.map(_.map(_.toSeq).toSeq).toSeq ==
      pqLoaded.map(_.map(_.toSeq).toSeq).toSeq,
      "disk round-trip changed the PQ codebooks")
    // query-level: the train path and the load path return identical rows
    graft.operators.ModelStore.evict(sfTiny)
    val fresh = graft.SparkEntry.queries("n_cosine_knn_ivf")(spark, sfTiny).collect()
    val fromDisk = graft.SparkEntry.queries("n_cosine_knn_ivf")(spark, sfTiny).collect()
    assert(fresh.map(_.toString).toSeq == fromDisk.map(_.toString).toSeq)
    // the explicit build line retrains + persists both artifacts
    val summary = graft.SparkEntry.queries("n_ann_build_models")(spark, sfTiny)
      .collect()
    assert(summary.map(_.getString(0)).toSeq ==
      Seq("ivf_k16", "ivfn_k16", "pq_m8x64", "pqr_m8x64"))
    assert(summary.forall(_.getAs[Double]("l2_checksum") > 0))
  }

  test("lsh knn: neighbors are a subset-quality approximation of exact") {
    val exact = graft.SparkEntry.queries("q_cosine_knn")(spark, sfTiny)
      .filter("rn <= 3").selectExpr("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = graft.SparkEntry.queries("q_cosine_knn_lsh")(spark, sfTiny)
      .selectExpr("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx.nonEmpty)
    // recall isn't guaranteed, but a sane LSH should recover a
    // non-trivial fraction of true top-3 pairs on tiny data
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall > 0.1, s"LSH recall suspiciously low: $recall")
  }
}
