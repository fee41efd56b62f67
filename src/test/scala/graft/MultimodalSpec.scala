package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRecord

class MultimodalSpec extends GraftSpec {
  import spark.implicits._

  private val bytes = "hello world, this is a test payload that is longer than one hundred bytes so it spans two frames!!".getBytes("UTF-8")

  test("decodeStub is deterministic and shape-correct") {
    val r = MediaRecord(1L, "audio", bytes, "src")
    val f1 = Multimodal.decodeStub(r)
    val f2 = Multimodal.decodeStub(r)
    assert(f1 == f2)
    assert(f1.n_bytes == bytes.length)
    assert(f1.n_frames == math.max(1, (bytes.length + 99) / 100))
    assert(f1.frame_means.size == f1.n_frames)
    assert(f1.frame_means.forall(m => m >= 0.0 && m <= 255.0))
    assert(f1.width >= 64 && f1.width <= 64 + 15 * 32)
    assert(f1.height >= 64 && f1.height <= 64 + 15 * 32)
  }

  test("image decode reads ACTUAL pixels: known raster round-trips") {
    // hand-built 5×7 constant-gray PNG: decode must report the true
    // dimensions and the exact mean luminance, proving the codec path
    // reads pixels rather than digests
    val img = new java.awt.image.BufferedImage(
      5, 7, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 7; x <- 0 until 5)
      img.setRGB(x, y, (100 << 16) | (100 << 8) | 100)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val f = Multimodal.decodeImage(MediaRecord(9L, "image", bos.toByteArray, "t"))
    assert(f.width == 5 && f.height == 7)
    assert(f.n_frames == 1)
    assert(math.abs(f.frame_means.head - 100.0) < 1e-9)
    // undecodable bytes fail loudly, never fall back to the stub
    intercept[IllegalArgumentException] {
      Multimodal.decodeImage(MediaRecord(10L, "image",
        "not a png".getBytes("UTF-8"), "t"))
    }
  }

  test("fixture PNGs decode to their synthesized dimensions") {
    val media = Multimodal.mediaFromDocuments(spark, sfTiny)
      .filter(_.kind == "image")
    val feats = Multimodal.decodeAll(media).collect()
    assert(feats.nonEmpty)
    val texts = graft.sources.Tables.documents(spark, sfTiny)
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    feats.foreach { f =>
      val (w, h) = Multimodal.fixtureDims(texts(f.media_id).getBytes("UTF-8"))
      assert(f.width == w && f.height == h,
        s"media ${f.media_id}: decoded ${f.width}x${f.height}, raster ${w}x$h")
    }
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

  private def raster(w: Int, h: Int)(px: (Int, Int) => Int) = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = px(x, y) & 0xff
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    img
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("phash64: identical rasters collide, mild noise stays close, " +
      "unrelated images land far apart") {
    val base = raster(40, 30)((x, y) => (x * 5 + y * 3) % 256)
    val same = raster(40, 30)((x, y) => (x * 5 + y * 3) % 256)
    // mild noise: small gray shift on a sparse pixel grid
    val noisy = raster(40, 30)((x, y) =>
      ((x * 5 + y * 3) % 256) + (if ((x + y) % 7 == 0) 2 else 0))
    // structurally different content
    val other = raster(40, 30)((x, y) => (x * x * 13 + y * 29) % 256)
    val hb = Multimodal.phash64(base)
    assert(hb == Multimodal.phash64(same), "identical rasters must collide")
    val hn = hamming(hb, Multimodal.phash64(noisy))
    assert(hn <= 8, s"mild noise moved the hash $hn bits")
    val ho = hamming(hb, Multimodal.phash64(other))
    assert(ho >= 12, s"unrelated images only $ho bits apart")
    // resolution robustness: the same pattern at 2x scale stays close
    val scaled = raster(80, 60)((x, y) => ((x / 2) * 5 + (y / 2) * 3) % 256)
    val hs = hamming(hb, Multimodal.phash64(scaled))
    assert(hs <= 8, s"2x upscale moved the hash $hs bits")
  }

  test("n_phash_dup: per-source accounting is total and consistent") {
    val rows = graft.SparkEntry.queries("n_phash_dup")(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    val nImages = rows.map(_.getAs[Long]("n_images")).sum
    // fixture corpus: every doc_id % 3 == 0 document is an image
    val expected = graft.sources.Tables.documents(spark, sfTiny)
      .filter("doc_id % 3 = 0").count()
    assert(nImages == expected)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_distinct_ph") <= r.getAs[Long]("n_images"))
      assert(r.getAs[Long]("n_dup_pairs") >= 0L)
      // distinct texts at this SF produce distinct rasters; identical
      // hashes would still be legitimate (pHash is lossy) but a dup
      // EXPLOSION would mean the hash degenerated to a constant
      assert(r.getAs[Long]("n_distinct_ph") > r.getAs[Long]("n_images") / 4,
        s"pHash degenerating on ${r.getAs[String]("source")}")
    }
  }

  test("media content: images are real PNGs, audio/video carry the text") {
    val media = Multimodal.mediaFromDocuments(spark, sfTiny)
    val img = media.filter(_.media_id == 0L).head()
    assert(img.kind == "image")
    // PNG magic number — the content is a genuine encoded image
    assert(img.content.take(4).toSeq ==
      Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val au = media.filter(_.media_id == 1L).head()
    assert(au.kind == "audio")
    val txt = graft.sources.Tables.documents(spark, sfTiny)
      .filter($"doc_id" === 1).select($"text").head().getString(0)
    assert(new String(au.content, "UTF-8") == txt)
  }
  test("MediaDecoder SPI: a registered codec replaces the reference " +
      "A/V decoder for its kind and rides the task closure") {
    import graft.operators.Multimodal
    import Multimodal.{MediaDecoder, MediaFeatures, MediaRecord}
    object FixedDecoder extends MediaDecoder {
      override def decode(r: MediaRecord): MediaFeatures =
        MediaFeatures(r.media_id, r.kind, r.content.length,
          width = 1920, height = 1080, n_frames = 42,
          frame_means = Seq(1.0))
    }
    Multimodal.registerDecoder("video", FixedDecoder)
    try {
      import spark.implicits._
      val media = Seq(
        Multimodal.MediaRecord(1L, "video", Array[Byte](1, 2, 3), "s"),
        Multimodal.MediaRecord(2L, "audio", Array[Byte](4, 5, 6), "s"))
        .toDS()
      val out = Multimodal.decodeAll(media).collect()
        .map(f => f.media_id -> f).toMap
      // video went through the registered codec…
      assert(out(1L).width == 1920 && out(1L).n_frames == 42)
      // …audio still through the reference decoder (unregistered kind)
      assert(out(2L).n_frames == 1)
      assert(out(2L).width != 1920 || out(2L).height != 1080)
    } finally Multimodal.registerDecoder("video",
      Multimodal.ReferenceAvDecoder)
  }

}
