package graft.operators

/** Frequent-items partition summaries (Misra–Gries 1982). Kernel shared
  * by the `n_topk_sketch` query and its spec: the spec drives synthetic
  * streams with vocabulary ≫ capacity through the SAME code the query
  * runs, so the eviction path is pinned even where the test corpus's
  * dense vocabulary would make the sketch trivially exact. */
object FreqSketch {

  /** One partition's Misra–Gries summary: ≤ `capacity` (item, weight)
    * counters. Decrement-all on overflow (the arriving item is its own
    * implicit decrement — it never enters), zeros evicted; triggers at
    * most n/capacity times, so the pass stays amortized O(1) per item.
    * Guarantee: trueCount(x) − weight(x) ∈ [0, ⌊n/(capacity+1)⌋] for
    * every item x (weight 0 when absent). */
  def mgPartials(it: Iterator[String], capacity: Int): Iterator[(String, Long)] = {
    val mg = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { t =>
      mg.get(t) match {
        case Some(c) => mg(t) = c + 1
        case None if mg.size < capacity => mg(t) = 1L
        case None =>
          mg.keys.toArray.foreach { k =>
            val c = mg(k) - 1
            if (c == 0) mg.remove(k) else mg(k) = c
          }
      }
    }
    mg.iterator.map { case (k, v) => (k, v) }
  }
}
