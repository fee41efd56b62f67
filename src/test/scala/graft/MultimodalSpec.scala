package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRecord

class MultimodalSpec extends GraftSpec {
  import spark.implicits._

  private val bytes = "hello world, this is a test payload that is longer than one hundred bytes so it spans two frames!!".getBytes("UTF-8")

  test("decodeStub is deterministic and shape-correct") {
    val r = MediaRecord(1L, "image", bytes, "src")
    val f1 = Multimodal.decodeStub(r)
    val f2 = Multimodal.decodeStub(r)
    assert(f1 == f2)
    assert(f1.n_bytes == bytes.length)
    assert(f1.n_frames == 1 + bytes.length / 100)
    assert(f1.frame_means.size == f1.n_frames)
    assert(f1.frame_means.forall(m => m >= 0.0 && m <= 255.0))
    assert(f1.width >= 64 && f1.width <= 64 + 15 * 32)
    assert(f1.height >= 64 && f1.height <= 64 + 15 * 32)
  }

  test("decodeAll distributes the stub decode over partitions") {
    val media = Multimodal.mediaFromDocuments(spark, sfTiny)
    val nDocs = media.count()
    val feats = Multimodal.decodeAll(media).cache()
    assert(feats.count() == nDocs)
    assert(feats.filter(f => f.n_bytes <= 0).count() == 0)
    // kinds round-robin over the three modalities
    val kinds = feats.groupByKey(_.kind).count().collect().toMap
    assert(kinds.keySet == Set("image", "audio", "video"))
    feats.unpersist()
  }

  test("media content bytes match the source text") {
    val media = Multimodal.mediaFromDocuments(spark, sfTiny)
    val row = media.filter(_.media_id == 0L).head()
    val txt = graft.sources.Tables.documents(spark, sfTiny)
      .filter($"doc_id" === 0).select($"text").head().getString(0)
    assert(new String(row.content, "UTF-8") == txt)
    assert(row.kind == "image")
  }
}
