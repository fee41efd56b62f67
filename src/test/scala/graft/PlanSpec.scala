package graft

/** Plan-shape regression tests for the scale-relevant physical
  * properties the Scaladocs promise: predicate pushdown reaching the
  * parquet scan, column pruning in ReadSchema, broadcast joins where a
  * dim is known-small, and top-k running as TakeOrderedAndProject
  * instead of a global sort. A correctness-green query whose plan
  * silently degrades (filter lifted off the scan, broadcast fallback to
  * SMJ/BNLJ) is a 100 TB regression the oracle can't see — these pin
  * the plan, not the rows. */
class PlanSpec extends GraftSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfTiny)
      .queryExecution.executedPlan.toString

  test("q_filter_pred pushes its predicates into the parquet scan") {
    val p = plan("q_filter_pred")
    assert(p.contains("PushedFilters: ["), p.take(2000))
    assert(p.contains("IsNotNull"), "expected pushed null guards")
  }

  test("q_scan_project prunes the scan to the projected columns") {
    val p = plan("q_scan_project")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    // projection keeps a handful of lineitem columns; a full-width scan
    // would read all 16
    assert(!read.contains("l_comment"), s"unpruned scan: $read")
  }

  test("q_join_broadcast broadcasts the small dimension") {
    assert(plan("q_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("q_sort_limit is TakeOrderedAndProject, not a global sort") {
    val p = plan("q_sort_limit")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("q_minhash_dup pair scan is the block-pair grid: no full-relation " +
      "broadcast, no BNLJ, no CartesianProduct") {
    val p = plan("q_minhash_dup")
    assert(!p.contains("CartesianProduct"), "planner fell back to cartesian")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "pair scan regressed to a broadcast BNLJ")
    // the grid kernel runs as a typed flatMapGroups over block-pair keys
    assert(p.contains("MapGroups"), p.take(2000))
  }

  test("q_minhash_lsh verifies in-place: no full-relation mask broadcast, " +
      "no BNLJ") {
    val p = plan("q_minhash_lsh")
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
    // the only BroadcastHashJoins allowed are the vocab-bounded token
    // dictionary and the doc_id-keyed mask attach (both small by
    // contract); the round-2 plan re-attached the FULL mask table to the
    // candidate stream through two broadcast joins AFTER the band join —
    // that shape put a broadcast downstream of the band self-join, which
    // the in-place verify eliminates. The band joins themselves must be
    // shuffle joins (SortMerge or ShuffledHash), never broadcast: their
    // inputs scale with the corpus.
    val bandJoins = p.linesIterator
      .filter(l => l.contains("Join") && l.contains("band"))
      .filter(l => l.contains("BroadcastHashJoin"))
    assert(bandJoins.isEmpty, s"band self-join got broadcast: " +
      s"${bandJoins.mkString("; ")}")
  }

  test("q_simhash_dup candidates come from the banded equi-join") {
    val p = plan("q_simhash_dup")
    // the chunk join must be a real equi shuffle/broadcast hash join,
    // not an all-pairs nested loop
    assert(!p.contains("NestedLoop"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }
}
