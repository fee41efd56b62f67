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

  test("jaccard values sit in (0, 1]") {
    val bad = q("q_minhash_dup")
      .filter("jaccard <= 0 OR jaccard > 1").count()
    assert(bad == 0)
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
}
