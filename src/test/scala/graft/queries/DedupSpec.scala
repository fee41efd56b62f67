package graft.queries

import graft.GraftSpec

/** Structural invariants of the dedup detectors on sf0.001. The
  * value-level correctness is the DuckDB oracle's job; these pin the
  * properties that survive any data change. */
class DedupSpec extends GraftSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sfTiny)

  test("pair outputs are strictly ordered id1 < id2, no self-pairs") {
    for (name <- Seq("q_minhash_dup", "q_minhash_lsh", "q_simhash_dup",
        "q_ngram_jaccard", "q_embed_neardup")) {
      assert(q(name).filter("id1 >= id2").count() == 0, s"$name emits unordered pairs")
    }
  }

  test("dedup caches are released once the owning query's action completes") {
    val sc = spark.sparkContext
    def persisted: Set[Int] = sc.getPersistentRDDs.keySet.toSet
    // the release listener fires asynchronously on the listener bus —
    // poll the storage registry instead of sleeping a fixed interval
    def drainTo(before: Set[Int], label: String): Unit = {
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      var extra = persisted -- before
      while (extra.nonEmpty && System.nanoTime() < deadline) {
        Thread.sleep(100); extra = persisted -- before
      }
      assert(extra.isEmpty, s"$label left cached RDDs pinned: $extra")
    }
    // bitset-dictionary path: sets/dict/masks caches (round-3 leaked
    // these from the session's LAST dedup query for its whole remainder)
    val before1 = persisted
    q("q_ngram_jaccard").count()
    drainTo(before1, "q_ngram_jaccard")
    // non-memoized LSH path: the sized band cache
    spark.conf.set("spark.graft.dedup.pairMemo", "false")
    try {
      val before2 = persisted
      q("q_minhash_lsh").count()
      drainTo(before2, "q_minhash_lsh")
    } finally spark.conf.set("spark.graft.dedup.pairMemo", "true")
  }

  test("q_dedup_persist: on-disk pair-table path equals the in-session memo path") {
    import org.apache.spark.sql.functions._
    val onDisk = q("q_dedup_persist").collect().toSeq
    // same survivor accounting computed straight off the memoized frame,
    // no parquet round-trip — the sink/scan must be value-transparent
    val losers = Dedup.lshDupPairsShared(spark, sfTiny)
      .select(col("id2").as("doc_id")).distinct()
    val direct = graft.sources.Tables.documents(spark, sfTiny)
      .join(losers, Seq("doc_id"), "left_anti")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("bigint").as("total_chars"))
      .orderBy(col("lang")).collect().toSeq
    assert(onDisk == direct)
  }

  test("jaccard values sit in (0, 1]") {
    val bad = q("q_minhash_dup")
      .filter("jaccard <= 0 OR jaccard > 1").count()
    assert(bad == 0)
  }

  test("bitset Jaccard equals an independent naive explode-join computation") {
    import org.apache.spark.sql.functions._
    val sets = graft.sources.Tables.documents(spark, sfTiny)
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("tok"))
      .distinct()
    val a = sets.select(col("doc_id").as("id1"), col("tok"))
    val b = sets.select(col("doc_id").as("id2"), col("tok"))
    val inter = a.join(b, Seq("tok")).filter(col("id1") < col("id2"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("icnt"))
    val sz = sets.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val naive = inter
      .join(sz.select(col("doc_id").as("id1"), col("sz").as("sz1")), "id1")
      .join(sz.select(col("doc_id").as("id2"), col("sz").as("sz2")), "id2")
      .select(col("id1"), col("id2"), col("icnt"),
        (col("icnt").cast("double") /
          (col("sz1") + col("sz2") - col("icnt"))).as("j"))
      .filter(col("icnt") * 20000L >= (col("sz1") + col("sz2") - col("icnt")) * 18999L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Number]("icnt").longValue())).toSet
    val bitset = q("q_minhash_dup")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Number]("icnt").longValue())).toSet
    assert(bitset == naive)
  }

  test("minhash LSH output is a subset of exact ground truth") {
    val exact = q("q_minhash_dup").selectExpr("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = q("q_minhash_lsh").selectExpr("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH emitted a pair exact Jaccard rejected")
  }

  test("simhash hamming distances are within the declared threshold") {
    assert(q("q_simhash_dup").filter("hamming > 3 OR hamming < 0").count() == 0)
  }

  test("embedding near-dup pairs respect the cosine threshold") {
    assert(q("q_embed_neardup").filter("cos_sim < 0.4").count() == 0)
  }

  test("embedding near-dup plan is distributed: no broadcast") {
    val plan = q("q_embed_neardup").queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastExchange"), s"broadcast in plan:\n$plan")
    assert(plan.contains("MapGroups"), s"expected MapGroups kernel:\n$plan")
  }

  test("dup clusters: labels are component minima and sizes consistent") {
    import org.apache.spark.sql.functions._
    val clusters = q("q_dup_clusters").cache()
    // every cluster id is itself a member doc of the cluster
    val orphanLabels = clusters.select(col("cluster_id").as("doc_id")).distinct()
      .join(clusters.select(col("doc_id")), Seq("doc_id"), "left_anti").count()
    assert(orphanLabels == 0, "a cluster_id is not a member doc")
    // cluster_id is the minimum doc_id of its cluster
    val badMin = clusters.groupBy(col("cluster_id"))
      .agg(min(col("doc_id")).as("mn"))
      .filter(col("mn") =!= col("cluster_id")).count()
    assert(badMin == 0)
    // every pair's endpoints carry the same label
    val pairs = q("q_minhash_dup").selectExpr("id1", "id2")
    val l1 = clusters.selectExpr("doc_id AS id1", "cluster_id AS cl1")
    val l2 = clusters.selectExpr("doc_id AS id2", "cluster_id AS cl2")
    val split = pairs.join(l1, "id1").join(l2, "id2")
      .filter(col("cl1") =!= col("cl2")).count()
    assert(split == 0, "an edge crosses two clusters")
    clusters.unpersist()
  }

  test("dup clusters: union-find and distributed fixpoint arms agree") {
    // default gate picks the single-task union-find at this size;
    // forcing the threshold to 0 exercises the distributed fixpoint
    val local = q("q_dup_clusters").collect().map(_.toSeq).toSeq
    spark.conf.set("spark.graft.cc.localEdgeMax", "0")
    try {
      val dist = q("q_dup_clusters").collect().map(_.toSeq).toSeq
      assert(dist == local)
    } finally spark.conf.unset("spark.graft.cc.localEdgeMax")
  }

  test("dup clusters: identical under reliable checkpointing") {
    val base = q("q_dup_clusters").collect().map(_.toSeq).toSeq
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ckpt").toAbsolutePath.toString
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set("spark.graft.checkpoint.reliable", "true")
    try {
      val reliable = q("q_dup_clusters").collect().map(_.toSeq).toSeq
      assert(reliable == base)
    } finally spark.conf.set("spark.graft.checkpoint.reliable", "false")
  }

  test("q_split_leakfree: no verified near-dup pair straddles splits, " +
      "and the 8/1/1 partition is total") {
    import org.apache.spark.sql.functions._
    val assign = Dedup.splitAssign(spark, sfTiny)
      .select(col("doc_id"), col("split"))
    val pairs = Dedup.lshDupPairsShared(spark, sfTiny)
      .select(col("id1"), col("id2"))
    // the leak-free contract itself: both ends of every near-dup edge
    // carry the same split label (transitively guaranteed through the
    // cluster key — this catches a regression in the coalesce/labeling)
    val straddling = pairs
      .join(assign.withColumnRenamed("doc_id", "id1")
        .withColumnRenamed("split", "s1"), "id1")
      .join(assign.withColumnRenamed("doc_id", "id2")
        .withColumnRenamed("split", "s2"), "id2")
      .filter(col("s1") =!= col("s2"))
      .count()
    assert(straddling == 0L, s"$straddling near-dup pairs straddle splits")
    // the split is a total partition of the corpus into the 3 labels
    val bynSplit = assign.groupBy(col("split")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bynSplit.keySet == Set("train", "val", "test"), bynSplit.toString)
    assert(bynSplit.values.sum ==
      graft.sources.Tables.documents(spark, sfTiny).count())
  }
}
