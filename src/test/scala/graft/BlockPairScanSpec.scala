package graft

import graft.operators.BlockPairScan

/** Structural invariants of the block-pair grid, incl. the sparse-id
  * regression: ids congruent mod B must not duplicate pairs through
  * off-diagonal groups whose higher block is empty. */
class BlockPairScanSpec extends GraftSpec {

  private def vecs(ids: Seq[Long]) = {
    import spark.implicits._
    ids.map(i => (i, Array.tabulate(4)(d => (i + d + 1).toFloat))).toDS()
  }

  test("thresholdPairs emits each unordered pair exactly once (sparse ids)") {
    // all ids ≡ 0 mod 4: blocks 1..3 empty, every off-diagonal group
    // containing block 0 sees only block-0 members
    val ds = vecs(Seq(0L, 4L, 8L, 12L))
    val pairs = BlockPairScan.thresholdPairs(ds, -2.0, blocks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == 6, s"expected C(4,2)=6 pairs, got ${pairs.toSeq}")
    assert(pairs.distinct.length == 6)
    assert(pairs.forall { case (a, b) => a < b })
  }

  test("thresholdPairs: mixed-block ids still meet exactly once") {
    val ds = vecs(0L until 10L)
    val pairs = BlockPairScan.thresholdPairs(ds, -2.0, blocks = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == 45)
    assert(pairs.distinct.length == 45)
  }

  test("knnPartials contains no duplicate (query, candidate) rows per pair group") {
    val ds = vecs(Seq(0L, 4L, 8L, 12L, 1L, 5L))
    val rows = BlockPairScan.knnPartials(ds, 3, blocks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // a candidate may legitimately appear for several groups of the same
    // query only when it won a partial in each — with 6 vectors and k=3
    // every (q, c) should be unique after the per-group partials
    assert(rows.length == rows.distinct.length,
      s"duplicate partial rows: ${rows.groupBy(identity).filter(_._2.length > 1).keys}")
  }
}
