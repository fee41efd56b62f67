package graft

/** CI twin of the official bench's honesty contract (round-4 verdict
  * item 10): catch CACHE-LIFETIME regressions — the round-3 bug class
  * where a session-lifetime memo let whichever family query ran first
  * absorb the shared cost and every later run ride its storage — before
  * the official run mis-times a round.
  *
  * Two teeth, one generous and one sharp:
  *   - timing: a second in-process run of each representative query,
  *     with the documented memos evicted at the pass boundary exactly
  *     like the bench does, must not be suspiciously free relative to
  *     the first (wide factor — host noise and tiny-SF planning
  *     dominance must never false-positive this);
  *   - storage: after the documented end-of-run evictions, the
  *     persistent-RDD map must drain to EMPTY. A deliberately-pinned
  *     cache anywhere in these query paths fails this check
  *     deterministically (verified by pinning one during development).
  */
class BenchSmokeSpec extends GraftSpec {

  // one per cache-bearing family: exact token kernel, bitset kernel with
  // one-shot release listeners, the memoized LSH pair build, and the
  // ANN model-store paths (single-model IVF and the composed IVF-PQ
  // serving scan — round-5 verdict item 8: a pinned stale artifact is
  // the cache-bug class the ModelStore era adds)
  private val names =
    Seq("q_minhash_dup", "q_ngram_jaccard", "q_minhash_lsh",
      "n_cosine_knn_ivf", "n_ivf_pq")

  test("second in-process run re-pays its own plan and the session " +
      "drains to zero persisted RDDs") {
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfTiny).count()
      (System.nanoTime() - t0) / 1e9
    }
    // snapshot the persistent-RDD set BEFORE the measured runs: the
    // assertion below is scoped to storage THESE queries created, so a
    // sibling suite's documented in-flight holder (one-shot release
    // listeners fire on ITS next action, which may be after this spec)
    // can never flake it — the official bench still asserts the global
    // zero at end of run
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // Pre-build q_minhash_lsh's once-per-snapshot DISK artifact (the
    // persisted pair table) untimed: a fresh tag would otherwise put
    // the full build in t1 and a KB-scale table read in t2 — the
    // documented pass-1 contract, not the hidden-cache class this
    // ratio exists to catch — and the ratio can cross 25× on a slow
    // host. Tradeoff acknowledged: for this ONE query the check then
    // verifies serve-vs-serve; the other names keep full teeth.
    SparkEntry.queries("q_minhash_lsh")(spark, sfTiny).count()
    graft.queries.Dedup.evictMemo(spark)
    for (name <- names) {
      val t1 = run(name)
      // mirror the bench's between-pass boundary: only the dedup memo's
      // session reader is dropped (it re-opens the persisted table).
      // The once-per-snapshot artifacts — ModelStore models, the
      // persisted pair table, the bucketed layout — deliberately
      // survive: serving queries' honest number is load-and-serve;
      // builds carry their own pass-1 lines (Bench.scala scaladoc)
      graft.queries.Dedup.evictMemo(spark)
      val t2 = run(name)
      assert(t2 * 25 >= t1,
        f"$name: second run $t2%.3f s vs first $t1%.3f s — riding a cache " +
          "the first run left behind")
    }
    // the bench's full end-of-run protocol: memo + layout evictions AND
    // the streaming memory-sink temp views (a documented session-
    // lifetime holder — in the full suite, earlier streaming specs'
    // sinks legitimately pin one cached RDD each)
    graft.queries.Dedup.evictMemo(spark)
    graft.operators.Bucketing.evict(spark)
    spark.catalog.listTables().collect()
      .filter(t => t.isTemporary && t.name.startsWith("graft_stream_"))
      .foreach(t => spark.catalog.dropTempView(t.name))
    // one trailing action lets any armed one-shot release listeners
    // fire, then poll: listener dispatch is async on the listener bus
    spark.range(16).count()
    val deadline = System.nanoTime() + 15e9.toLong
    def leaked = spark.sparkContext.getPersistentRDDs.filter {
      case (id, _) => !before.contains(id)
    }
    var remaining = leaked
    while (remaining.nonEmpty && System.nanoTime() < deadline) {
      Thread.sleep(200)
      spark.range(16).count()
      remaining = leaked
    }
    assert(remaining.isEmpty,
      s"leaked cached RDDs at end of run: ${remaining.values.map(_.name).mkString(", ")}")
  }

  test("ANN serving reads the CURRENT ModelStore artifacts — a pinned " +
      "stale model is caught, not silently served") {
    // The ModelStore era's cache-bug class (round-5 verdict item 8): a
    // JVM-pinned copy of a previously-loaded model would keep serving
    // after the on-disk artifact changes (n_ann_build_models overwrites
    // the store every bench pass). Tooth: perturb the routing centroids
    // ON DISK and require the serving output to react — a stale pin
    // returns the old rows and fails here deterministically.
    import graft.operators.ModelStore
    val base = SparkEntry.queries("n_ivf_pq")(spark, sfTiny).collect()
    val cents = graft.queries.Similarity.ivfUnitCentroids(spark, sfTiny)
    val perturbed = cents.map(_.map(_ * 0.5))
    ModelStore.save(spark, ModelStore.dir(sfTiny, "ivfn_k16"), Array(perturbed))
    try {
      val after = SparkEntry.queries("n_ivf_pq")(spark, sfTiny).collect()
      assert(after.map(_.toString).toSeq != base.map(_.toString).toSeq,
        "n_ivf_pq did not react to a model change on disk — " +
          "a stale pinned artifact is being served")
    } finally ModelStore.evict(sfTiny) // drop the perturbed store entirely
  }
}
