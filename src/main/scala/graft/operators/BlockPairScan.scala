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
    * every pair containing b — including (b,b), once.
    *
    * ZERO-NORM contract: a zero vector has no cosine to anything —
    * sim = 0/0 = NaN, which Java comparisons silently drop while SQL
    * engines (DuckDB: NaN > everything) silently KEEP, a cross-engine
    * parity trap. Excluded from pairing entirely, here at the fan-out
    * so every kernel (threshold, knn) inherits the rule; the oracles
    * carry the mirroring `nrm > 0` guard. */
  private def keyed(raw: Dataset[(Long, Array[Float])], b: Int)
      : Dataset[((Int, Int), (Int, V))] = {
    val sp = raw.sparkSession
    import sp.implicits._
    raw.flatMap { case (id, emb) =>
      val v = toV(id, emb)
      if (v._3 == 0.0) Seq.empty
      else {
        val bi = (((id % b) + b) % b).toInt
        (0 until b).map { o =>
          val k = if (o < bi) (o, bi) else (bi, o)
          (k, (bi, v))
        }
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

  /** Shared scaffold of the two token-set kernels: B×B fan-out, group
    * split (diagonality by KEY — see `sides`), per-group LOCAL
    * dictionary, bitset pack, and the popcount pair loop. The kernels
    * differ ONLY in `prune` (size-band pre-filter, checked before the
    * popcount) and `accept` (the integer-exact threshold on
    * (icnt, sa, sb)) — parameterizing them keeps the diagonality rule,
    * id-order normalization and packing in ONE definition. Both
    * closures are cheap arithmetic; the shared call site stays
    * bimorphic and JIT-inlined. */
  private def tokenPairScan(raw: Dataset[(Long, Array[String])], blocks: Int)(
      prune: (Long, Long) => Boolean)(
      accept: (Long, Long, Long) => Boolean): DataFrame = {
    val sp = raw.sparkSession
    import sp.implicits._
    val b = if (blocks > 0) blocks else blockCount(raw)
    raw.flatMap { case (id, toks) =>
      val bi = (((id % b) + b) % b).toInt
      (0 until b).map { o =>
        val k = if (o < bi) (o, bi) else (bi, o)
        (k, (bi, id, toks))
      }
    }
      .groupByKey(_._1)
      .flatMapGroups { (key: (Int, Int),
          it: Iterator[((Int, Int), (Int, Long, Array[String]))]) =>
        val xs = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[String])]
        val ys = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[String])]
        it.foreach { case (_, (bi, id, toks)) =>
          if (bi == key._1) xs += ((id, toks)) else ys += ((id, toks))
        }
        // diagonality by KEY, not emptiness (see `sides`)
        val diag = key._1 == key._2
        val ba = xs
        val bb = if (diag) xs else ys
        // local dictionary: dense ids over THIS group's tokens only
        val dict = new java.util.HashMap[String, Integer]()
        def assign(docs: scala.collection.Seq[(Long, Array[String])]): Unit =
          docs.foreach { case (_, toks) =>
            var i = 0
            while (i < toks.length) {
              if (!dict.containsKey(toks(i))) dict.put(toks(i), dict.size)
              i += 1
            }
          }
        assign(ba); if (!diag) assign(bb)
        val w = (dict.size + 63) >>> 6
        def pack(docs: scala.collection.Seq[(Long, Array[String])])
            : (Array[Long], Array[Long], Array[Array[Long]]) = {
          val n = docs.length
          val ids = new Array[Long](n); val szs = new Array[Long](n)
          val masks = new Array[Array[Long]](n)
          var i = 0
          while (i < n) {
            val (id, toks) = docs(i)
            val m = new Array[Long](w)
            var j = 0
            while (j < toks.length) {
              val t = dict.get(toks(j)).intValue()
              m(t >>> 6) |= 1L << (t & 63)
              j += 1
            }
            ids(i) = id; szs(i) = toks.length.toLong; masks(i) = m
            i += 1
          }
          (ids, szs, masks)
        }
        val (aIds, aSzs, aMasks) = pack(ba)
        val (bIds, bSzs, bMasks) =
          if (diag) (aIds, aSzs, aMasks) else pack(bb)
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Long, Long, Long)]
        var i = 0
        while (i < aIds.length) {
          val ida = aIds(i); val sa = aSzs(i); val ma = aMasks(i)
          var j = if (diag) i + 1 else 0
          while (j < bIds.length) {
            val sb = bSzs(j)
            if (prune(sa, sb)) {
              val mb = bMasks(j)
              var icnt = 0L
              var k = 0
              while (k < w) { icnt += java.lang.Long.bitCount(ma(k) & mb(k)); k += 1 }
              if (accept(icnt, sa, sb)) {
                val idb = bIds(j)
                if (ida < idb) out += ((ida, idb, icnt, sa, sb))
                else out += ((idb, ida, icnt, sb, sa))
              }
            }
            j += 1
          }
          i += 1
        }
        out.iterator
      }
      .toDF("id1", "id2", "icnt", "sz1", "sz2")
  }

  /** Exact Jaccard-≥-threshold pairs over per-doc DISTINCT token arrays
    * via the same B×B block-pair grid — the de-broadcast, de-staged form
    * of the dedup pair scan. No full-relation broadcast, no
    * BroadcastNestedLoopJoin, and — unlike the round-2 bitset pipeline —
    * NO global token dictionary: each block-pair task builds a LOCAL
    * dictionary over just its group's tokens, packs each doc into a
    * local bitset, and popcounts pairs with a tight `Long.bitCount`
    * loop. Exactness is unchanged (token-string identity decides bit
    * identity; the dictionary's scope only changes bit POSITIONS, which
    * the intersection count never sees), but the three sequential
    * global stages the shared dictionary cost — exploded token
    * relation, distinct+zipWithIndex dictionary, mask aggregation,
    * measured 3.8 s of mostly fixed latency at sf0.1 — disappear; the
    * kernel's input is a narrow projection of the document scan.
    *
    * Work per pair: size-band prune first (J ≥ t ⇒ t·max(|A|,|B|) ≤
    * min(|A|,|B|), integer form sz·tNum ≤ sz·tDen both ways), then
    * popcount, then the integer-exact rounded threshold
    * round₄(icnt/union) ≥ t ⟺ icnt·20000 ≥ union·(2·tfE4−1) (see
    * Dedup.jaccardPairsFast for the derivation). Emits
    * (id1 < id2, icnt, sz1, sz2); survivors only are materialized (the
    * inner loops allocate nothing per rejected pair).
    *
    * Per-task memory is the group's docs (n/B token arrays) + the local
    * dictionary + masks of W_local = ⌈group vocab/64⌉ words — all set
    * by B, not by cluster size, so the grid holds at 100× the docs by
    * raising B; work stays the quadratic ground-truth contract. */
  def tokenJaccardPairs(raw: Dataset[(Long, Array[String])],
      tNum: Int, tDen: Int, tfE4: Int, blocks: Int = 0): DataFrame = {
    val thr = 2L * tfE4 - 1 // 20000·t − 1
    tokenPairScan(raw, blocks)(
      (sa, sb) => sa * tNum <= sb * tDen && sb * tNum <= sa * tDen)(
      (icnt, sa, sb) => icnt * 20000L >= (sa + sb - icnt) * thr)
  }

  /** Sibling of [[tokenJaccardPairs]] thresholding CONTAINMENT —
    * icnt / min(|A|,|B|) ≥ t — the asymmetric near-superset screen
    * (quotes, excerpts, doc-in-doc concatenations) that a Jaccard
    * threshold structurally misses: a small doc fully inside a huge one
    * has jaccard ≈ |A|/|B| ≈ 0 but containment 1. NO size band (wildly
    * different sizes are exactly the interesting case); the threshold
    * is integer-exact (icnt·10⁴ ≥ min·tE4 ⟺ icnt/min ≥ t for t with
    * ≤ 4 decimals — both sides integers, no rounding step needed).
    * Same B×B grid, local dictionary, and packed-word popcount as the
    * Jaccard form; quadratic flops by ground-truth contract — the
    * sub-quadratic production screen for containment is prefix
    * filtering over GLOBAL token frequencies (PPJoin-style), worth its
    * own operator when a Zipfian vocabulary makes rare-token prefixes
    * selective (this fixture corpus's ~30-word vocabulary would
    * degenerate it to all-pairs). */
  def tokenContainmentPairs(raw: Dataset[(Long, Array[String])],
      tE4: Int, blocks: Int = 0): DataFrame =
    // NO size band: wildly different sizes are exactly the interesting
    // case; threshold icnt·10⁴ ≥ min·tE4 ⟺ icnt/min ≥ t, integer-exact
    tokenPairScan(raw, blocks)((_, _) => true)(
      (icnt, sa, sb) => icnt * 10000L >= math.min(sa, sb) * tE4)

  /** (id, packed bitset words, set size = popcount of own mask) */
  private type BS = (Long, Array[Long], Long)

  /** Sibling of [[tokenJaccardPairs]] for GLOBALLY dictionary-encoded
    * bitsets — the right kernel when per-doc sets are LARGE (character
    * shingles: hundreds of elements per doc). There the local-dictionary
    * form loses: every block-pair replica re-serializes the full string
    * array and every group re-hashes it into its own dictionary
    * (measured 3× slower than this form on 3-gram sets at sf0.1), while
    * a one-off global dictionary encodes each doc ONCE into
    * W = ⌈vocab/64⌉ packed words and the grid ships 8-byte words
    * instead of strings. For small sets (whitespace tokens) the
    * trade flips — see tokenJaccardPairs. Same grid, same size-band
    * prune, same integer-exact threshold, same output columns. */
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
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Long, Long, Long)]
        var i = 0
        while (i < ba.length) {
          val (ida, ma, sa) = ba(i)
          var j = if (diag) i + 1 else 0
          while (j < bb.length) {
            val sb = bb(j)._3
            if (sa * tNum <= sb * tDen && sb * tNum <= sa * tDen) {
              val mb = bb(j)._2
              var icnt = 0L
              var k = 0
              while (k < ma.length) {
                icnt += java.lang.Long.bitCount(ma(k) & mb(k)); k += 1
              }
              if (icnt * 20000L >= (sa + sb - icnt) * thr) {
                val idb = bb(j)._1
                if (ida < idb) out += ((ida, idb, icnt, sa, sb))
                else out += ((idb, ida, icnt, sb, sa))
              }
            }
            j += 1
          }
          i += 1
        }
        out.iterator
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
