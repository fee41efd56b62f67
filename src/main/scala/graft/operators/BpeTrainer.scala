package graft.operators

/** BPE tokenizer TRAINING — the full greedy merge loop of Sennrich,
  * Haddow & Birch, "Neural Machine Translation of Rare Words with
  * Subword Units" (ACL 2016), as a driver-side model fit over the
  * corpus's aggregated sufficient statistic (the distinct-word
  * frequency table).
  *
  * Scale shape — why the loop is DRIVER-side and that is the honest
  * design, not a shortcut: BPE merges are inherently SEQUENTIAL (merge
  * k+1's counts depend on merge k having been applied), so the only
  * distributable work is computing the sufficient statistic — one
  * corpus-scale `groupBy(word).count` (the caller's job). Everything
  * after operates on the vocabulary (|distinct words|, millions at
  * 100 TB — model-state-sized, the same class as the ANN trainer's
  * centroid set), where a Spark job per merge would pay 2 scheduler
  * round-trips per iteration for work a single core finishes in
  * microseconds. This is how production tokenizer trainers
  * (HuggingFace `tokenizers`, SentencePiece) are built: distributed
  * counting, single-node merging.
  *
  * Determinism: ties break on (count DESC, left ASC, right ASC), so
  * the merge table is a pure function of the vocabulary — reruns and
  * engines agree (the portable-hash discipline applied to model
  * fitting). */
object BpeTrainer {

  /** One learned merge: (rank, left, right, pair count at merge time). */
  final case class Merge(rank: Int, left: String, right: String, count: Long)

  private def applyMerge(syms: Array[String], a: String,
      b: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Learn `k` merges from `(word, frequency)` sufficient statistics.
    * Words split to characters plus the `</w>` end-of-word terminal
    * (so a suffix merged with `</w>` cannot glue across word
    * boundaries — the paper's construction). Stops early when no pair
    * remains. */
  def train(vocab: Seq[(String, Long)], k: Int): Seq[Merge] = {
    var words: Array[(Array[String], Long)] = vocab.toArray.map {
      case (w, c) => (w.toCharArray.map(_.toString) :+ "</w>", c)
    }
    val merges = Vector.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    while (rank < k && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        counts.updateWith((syms(i), syms(i + 1)))(v =>
          Some(v.getOrElse(0L) + c))
      if (counts.isEmpty) exhausted = true
      else {
        val ((a, b), cnt) = counts.minBy { case ((x, y), c) => (-c, x, y) }
        merges += Merge(rank, a, b, cnt)
        words = words.map { case (syms, c) =>
          var i = 0
          var hit = false
          while (!hit && i < syms.length - 1) {
            hit = syms(i) == a && syms(i + 1) == b; i += 1
          }
          if (hit) (applyMerge(syms, a, b), c) else (syms, c)
        }
        rank += 1
      }
    }
    merges.result()
  }

  /** Segment one word with a learned merge table (training's inverse —
    * what the spec uses to pin that the merges actually tokenize). */
  def segment(word: String, merges: Seq[Merge]): Seq[String] = {
    var syms = word.toCharArray.map(_.toString) :+ "</w>"
    merges.sortBy(_.rank).foreach(m =>
      syms = applyMerge(syms, m.left, m.right))
    syms.toSeq
  }
}
