package graft.queries

import org.apache.spark.sql.functions._
import graft.GraftSpec

class TextSpec extends GraftSpec {
  import spark.implicits._

  test("BPE vocabulary cap: deterministic (count DESC, word ASC) top-N " +
      "truncation; below the cap the collect is unchanged; merge " +
      "sequences are stable on the capped vocabulary") {
    val counts = Seq(("zeta", 10L), ("alpha", 10L), ("mid", 7L),
      ("beta", 10L), ("tail1", 1L), ("tail2", 1L), ("rare", 2L))
      .toDF("word", "w_cnt")
    // cap above size: byte-identical to the full collect (sorted)
    val full = Text.cappedVocab(counts, 100)
    assert(full.length == 7)
    assert(full.take(3) == Seq(("alpha", 10L), ("beta", 10L),
      ("zeta", 10L)), s"tie-break not (count DESC, word ASC): $full")
    // cap below size: the same deterministic prefix, tail dropped
    val capped = Text.cappedVocab(counts, 4)
    assert(capped == full.take(4), s"capped $capped != prefix")
    // merge-sequence stability: training on the capped vocabulary is a
    // pure function of the prefix — two derivations agree
    val m1 = graft.operators.BpeTrainer.train(capped, 10)
    val m2 = graft.operators.BpeTrainer.train(full.take(4), 10)
    assert(m1 == m2, "merge sequence drifted across capped derivations")
    // the registry constant is sane (model-sized, not corpus-sized)
    assert(Text.VocabCapWords >= 10000 && Text.VocabCapWords <= 1000000)
    // the cap plans as TakeOrderedAndProject, not a global sort
    val p = counts.orderBy(col("w_cnt").desc, col("word"))
      .limit(4).queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.take(1000))
  }
}
