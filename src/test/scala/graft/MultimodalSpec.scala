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

  test("resizeFit preserves aspect ratio, never upscales, floors at 1px") {
    assert(Multimodal.resizeFit(1024, 512, 256, 256) == ((256, 128)))
    assert(Multimodal.resizeFit(512, 1024, 256, 256) == ((128, 256)))
    // already inside the box: untouched (no upscale)
    assert(Multimodal.resizeFit(100, 50, 256, 256) == ((100, 50)))
    // extreme aspect ratio floors at 1, not 0
    assert(Multimodal.resizeFit(10000, 10, 100, 100)._2 >= 1)
    // aspect ratio preserved within rounding
    val (w, h) = Multimodal.resizeFit(640, 480, 100, 100)
    assert(math.abs(w.toDouble / h - 640.0 / 480.0) < 0.05)
  }

  test("decodeAndResize fits every record into the serving box") {
    val media = Multimodal.mediaFromDocuments(spark, sfTiny)
    val out = Multimodal.decodeAndResize(media, 128, 128).collect()
    assert(out.nonEmpty)
    out.foreach { case (f, rw, rh) =>
      assert(rw <= 128 && rh <= 128 && rw >= 1 && rh >= 1)
      assert(rw <= f.width && rh <= f.height)
    }
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
