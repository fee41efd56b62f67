package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BpeTrainer

/** Contract of the BPE trainer (pure driver-side kernel — no Spark):
  * the canonical Sennrich et al. 2016 example's merge sequence,
  * deterministic tie-breaks, early exhaustion, and segment() as
  * training's inverse. */
class BpeTrainerSpec extends AnyFunSuite {

  private val canon = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("the canonical low/lower/newest/widest vocabulary learns the " +
      "paper's merge sequence under (count DESC, pair ASC) tie-break") {
    val m = BpeTrainer.train(canon, 5)
    // hand-derived: (e,s)=9 ties (s,t)=9 and (t,</w>)=9 — 'e' wins;
    // then (es,t)=9, (est,</w>)=9, then (l,o)=7 ties (o,w)=7 — 'l'
    // wins; then (lo,w)=7
    assert(m.map(x => (x.left, x.right, x.count)) == Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("est", "</w>", 9L),
      ("l", "o", 7L), ("lo", "w", 7L)), m.toString)
    assert(m.map(_.rank) == Seq(0, 1, 2, 3, 4))
  }

  test("segment() applies the learned merges: trained words compress, " +
      "unseen words degrade gracefully to finer pieces") {
    val m = BpeTrainer.train(canon, 10)
    assert(BpeTrainer.segment("newest", m) == Seq("n", "e", "w", "est</w>")
      || BpeTrainer.segment("newest", m).last.endsWith("</w>"))
    // with enough merges the most frequent words become single symbols
    val full = BpeTrainer.train(canon, 40)
    assert(BpeTrainer.segment("low", full) == Seq("low</w>"))
    assert(BpeTrainer.segment("newest", full) == Seq("newest</w>"))
    // an unseen word still segments (no merge applies to 'zz')
    val unseen = BpeTrainer.segment("zz", full)
    assert(unseen.mkString == "zz</w>")
  }

  test("training is deterministic and exhausts cleanly when every word " +
      "is a single symbol") {
    val a = BpeTrainer.train(canon, 40)
    val b = BpeTrainer.train(canon.reverse, 40)
    assert(a == b, "merge table depends on input order")
    // exhaustion: fewer merges than requested once no pair remains
    val tiny = BpeTrainer.train(Seq(("ab", 1L)), 100)
    assert(tiny.length < 100)
    assert(BpeTrainer.segment("ab", tiny) == Seq("ab</w>"))
  }
}
