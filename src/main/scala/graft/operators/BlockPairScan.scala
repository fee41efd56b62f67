package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import graft.functions.Parity.dround4

/** Distributed exact all-pairs kernels over embedding blocks.
  *
  * Replaces the round-1 collect()+broadcast pattern: vectors land in B
  * blocks by `id mod B`, every unordered block pair {i,j} (i ≤ j) is
  * shuffled to one group, and a fused double[] kernel scans that pair.
  * Nothing materializes on the driver; shuffle volume is n·B vector
  * copies (each vector ships to the B pairs containing its block) and
  * the O(n²) flops spread over B(B+1)/2 independent tasks. B ≈
  * √(2·parallelism), so the grid saturates the cluster while keeping
  * replication √-bounded — the standard block-nested-loop layout for
  * exact similarity at scale (per-block memory is n/B vectors, set by
  * B, not by executor count).
  *
  * Determinism/parity: components widen float→double element-wise and
  * dots/norms accumulate left-to-right, identical to the round-1 kernel
  * and to DuckDB `list_dot_product` — results are bit-equal.
  */
object BlockPairScan {

  /** (id, doubled components, l2 norm) */
  private type V = (Long, Array[Double], Double)

  private def toV(id: Long, emb: Array[Float]): V = {
    val v = new Array[Double](emb.length)
    var i = 0; var sq = 0.0
    while (i < emb.length) { v(i) = emb(i); sq += v(i) * v(i); i += 1 }
    (id, v, math.sqrt(sq))
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var j = 0; var s = 0.0
    while (j < a.length) { s += a(j) * b(j); j += 1 }
    s
  }

  private def blockCount(raw: Dataset[_]): Int =
    math.max(2, math.round(
      math.sqrt(2.0 * raw.sparkSession.sparkContext.defaultParallelism)).toInt)

  /** One row per (block-pair, member): key (i,j) with i ≤ j, payload the
    * member's own block id + vector. A vector in block b replicates to
    * every pair containing b — including (b,b), once. */
  private def keyed(raw: Dataset[(Long, Array[Float])], b: Int)
      : Dataset[((Int, Int), (Int, V))] = {
    val sp = raw.sparkSession
    import sp.implicits._
    raw.flatMap { case (id, emb) =>
      val v = toV(id, emb)
      val bi = (((id % b) + b) % b).toInt
      (0 until b).map { o =>
        val k = if (o < bi) (o, bi) else (bi, o)
        (k, (bi, v))
      }
    }
  }

  /** Split a block-pair group back into its two member blocks (the same
    * buffer twice for a diagonal pair). Diagonality is decided by the
    * KEY (i == j), never by emptiness: an off-diagonal group whose
    * higher block happens to hold no vectors (sparse/filtered ids) has
    * no cross pairs — treating it as diagonal would re-emit the true
    * diagonal group's intra-block pairs. */
  private def sides(key: (Int, Int), it: Iterator[(Int, V)])
      : (Seq[V], Seq[V], Boolean) = {
    val xs = scala.collection.mutable.ArrayBuffer.empty[V]
    val ys = scala.collection.mutable.ArrayBuffer.empty[V]
    it.foreach { case (bi, v) => if (bi == key._1) xs += v else ys += v }
    if (key._1 == key._2) (xs.toSeq, xs.toSeq, true)
    else (xs.toSeq, ys.toSeq, false)
  }

  /** Per-block-pair partial top-k: for every query vector, its k best
    * candidates WITHIN the pair by (4-dp-rounded cosine desc, id asc).
    * The global top-k is a subset of the union of partials (a global
    * winner wins in its own block pair), so a thin downstream window
    * over `(id1, id2, cos_sim)` finishes the job exactly. */
  def knnPartials(raw: Dataset[(Long, Array[Float])], k: Int,
      blocks: Int = 0): DataFrame = {
    val sp = raw.sparkSession
    import sp.implicits._
    val b = if (blocks > 0) blocks else blockCount(raw)
    keyed(raw, b)
      .groupByKey(_._1)
      .flatMapGroups { (key: (Int, Int),
          it: Iterator[((Int, Int), (Int, V))]) =>
        val (ba, bb, diag) = sides(key, it.map(_._2))
        def partials(qs: Seq[V], cs: Seq[V]): Iterator[(Long, Long, Double)] =
          qs.iterator.flatMap { case (id1, v1, n1) =>
            val sims = cs.iterator.filter(_._1 != id1).map {
              case (id2, v2, n2) => (dround4(dot(v1, v2) / (n1 * n2)), id2)
            }.toArray
            scala.util.Sorting.stableSort(sims,
              (a: (Double, Long), c: (Double, Long)) =>
                a._1 > c._1 || (a._1 == c._1 && a._2 < c._2))
            sims.iterator.take(k).map { case (sim, id2) => (id1, id2, sim) }
          }
        if (diag) partials(ba, bb)
        else partials(ba, bb) ++ partials(bb, ba)
      }
      .toDF("id1", "id2", "cos_sim")
  }

  /** (id, packed bitset words, set size = popcount of own mask) */
  private type BS = (Long, Array[Long], Long)

  /** Exact Jaccard-≥-threshold pairs over dictionary-encoded BITSETS via
    * the same B×B block-pair grid — the de-broadcast form of the dedup
    * pair scan. No full-relation broadcast and no BroadcastNestedLoopJoin:
    * each doc's packed mask ships to the B block pairs containing its
    * block (√-bounded replication), every unordered pair meets in exactly
    * ONE block-pair task, and the intersection is a tight
    * `Long.bitCount(a & b)` loop per pair — the mapPartitions-class twin
    * of the fused `graft_bitset_icnt` expression, earned the same way
    * (the declarative alternative is a BNLJ that must broadcast one full
    * side, the round-2 scale-killer).
    *
    * Semantics are IDENTICAL to the former broadcast join: size-band
    * prune first (J ≥ t ⇒ t·max(|A|,|B|) ≤ min(|A|,|B|), integer form
    * sz·tNum ≤ sz·tDen both ways), then the integer-exact rounded
    * threshold round₄(icnt/union) ≥ t ⟺ icnt·20000 ≥ union·(2·tfE4−1)
    * (see Dedup.jaccardPairsFast for the derivation). Emits
    * (id1 < id2, icnt, sz1, sz2).
    *
    * Per-task memory is n/B masks (each W longs, W = ⌈vocab/64⌉) — set
    * by B, not by cluster size, so the grid holds at 100× the docs by
    * raising B; work stays the quadratic ground-truth contract. */
  def bitsetJaccardPairs(raw: Dataset[(Long, Array[Long], Long)],
      tNum: Int, tDen: Int, tfE4: Int, blocks: Int = 0): DataFrame = {
    val sp = raw.sparkSession
    import sp.implicits._
    val b = if (blocks > 0) blocks else blockCount(raw)
    raw.flatMap { case (id, mask, sz) =>
      val bi = (((id % b) + b) % b).toInt
      (0 until b).map { o =>
        val k = if (o < bi) (o, bi) else (bi, o)
        (k, (bi, id, mask, sz))
      }
    }
      .groupByKey(_._1)
      .flatMapGroups { (key: (Int, Int),
          it: Iterator[((Int, Int), (Int, Long, Array[Long], Long))]) =>
        val xs = scala.collection.mutable.ArrayBuffer.empty[BS]
        val ys = scala.collection.mutable.ArrayBuffer.empty[BS]
        it.foreach { case (_, (bi, id, m, sz)) =>
          if (bi == key._1) xs += ((id, m, sz)) else ys += ((id, m, sz))
        }
        // diagonality by KEY, not emptiness (see `sides`)
        val diag = key._1 == key._2
        val ba = xs
        val bb = if (diag) xs else ys
        val thr = 2L * tfE4 - 1 // 20000·t − 1
        ba.iterator.flatMap { case (ida, ma, sa) =>
          bb.iterator
            .filter { case (idb, _, _) => if (diag) ida < idb else ida != idb }
            .flatMap { case (idb, mb, sb) =>
              if (sa * tNum <= sb * tDen && sb * tNum <= sa * tDen) {
                var icnt = 0L
                var w = 0
                while (w < ma.length) {
                  icnt += java.lang.Long.bitCount(ma(w) & mb(w)); w += 1
                }
                if (icnt * 20000L >= (sa + sb - icnt) * thr) {
                  val (lo, hi, slo, shi) =
                    if (ida < idb) (ida, idb, sa, sb) else (idb, ida, sb, sa)
                  Some((lo, hi, icnt, slo, shi))
                } else None
              } else None
            }
        }
      }
      .toDF("id1", "id2", "icnt", "sz1", "sz2")
  }

  /** All unordered pairs with RAW cosine ≥ minSim, each emitted exactly
    * once as (lo_id, hi_id, sim) — a pair meets only in the one group
    * keyed by its blocks. Threshold on the raw double (callers round for
    * display), matching the oracle's WHERE-on-raw semantics. */
  def thresholdPairs(raw: Dataset[(Long, Array[Float])],
      minSim: Double, blocks: Int = 0): DataFrame = {
    val sp = raw.sparkSession
    import sp.implicits._
    val b = if (blocks > 0) blocks else blockCount(raw)
    keyed(raw, b)
      .groupByKey(_._1)
      .flatMapGroups { (key: (Int, Int),
          it: Iterator[((Int, Int), (Int, V))]) =>
        val (ba, bb, diag) = sides(key, it.map(_._2))
        ba.iterator.flatMap { case (ida, va, na) =>
          bb.iterator
            .filter { case (idb, _, _) => if (diag) ida < idb else ida != idb }
            .flatMap { case (idb, vb, nb) =>
              val sim = dot(va, vb) / (na * nb)
              if (sim >= minSim) {
                val (lo, hi) = if (ida < idb) (ida, idb) else (idb, ida)
                Some((lo, hi, sim))
              } else None
            }
        }
      }
      .toDF("id1", "id2", "sim")
  }
}
