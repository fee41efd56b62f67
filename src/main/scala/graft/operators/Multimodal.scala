package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata, processed in partition-sized batches.
  *
  * Spark-first layout for 100 TB of media:
  *   - content is a `BinaryType` column riding next to typed metadata —
  *     never parsed by Catalyst, so scans prune it unless asked for;
  *   - decode / feature-extract runs per-PARTITION (the Scala analogue
  *     of `mapInPandas`: one batch init per task — codec tables, model
  *     weights — amortized over thousands of records, not per-row);
  *   - downstream features are ordinary columns again, so joins/aggs on
  *     them stay in codegen'd Catalyst land.
  *
  * The decode itself is a clearly-marked DETERMINISTIC STUB (this
  * container ships no image/audio codecs): dimensions derive from the
  * content digest, "frames" are fixed-stride byte slices. The plumbing —
  * schema, batching, partition distribution, feature shape — is real and
  * is what the specs test.
  */
object Multimodal {

  /** One media record: opaque bytes + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String,          // "image" | "audio" | "video"
      content: Array[Byte],
      source: String)

  /** Decoded features per record (stub-decoded). */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      frame_means: Seq[Double])

  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString

  /** STUB decode — stands in for an image/audio codec. Deterministic:
    * dimensions from the first 8 hex chars of the content md5, frames as
    * 100-byte strides, per-frame mean byte value as the "feature". */
  private[graft] def decodeStub(r: MediaRecord): MediaFeatures = {
    val fp = java.lang.Long.parseLong(md5Hex(r.content).take(8), 16)
    // ceil(n_bytes/100) floored at 1 — matches MultimodalQ's n_frames;
    // an exact multiple of 100 has no trailing zero-length frame
    val nFrames = math.max(1, (r.content.length + 99) / 100)
    val frames = (0 until nFrames).map { i =>
      val slice = r.content.slice(i * 100, math.min((i + 1) * 100, r.content.length))
      if (slice.isEmpty) 0.0
      else slice.map(b => (b & 0xff).toDouble).sum / slice.length
    }
    MediaFeatures(
      r.media_id, r.kind, r.content.length,
      width = (64 + (fp % 16) * 32).toInt,
      height = (64 + ((fp / 16) % 16) * 32).toInt,
      nFrames, frames)
  }

  /** Batch decode: one task-level pass per partition. An expensive codec
    * would be initialized HERE, once per partition, before the iterator
    * is consumed — the whole point of the mapPartitions shape. */
  def decodeAll(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition init would go here (codec / model load)
      it.map(decodeStub)
    }
  }

  /** Aspect-preserving fit of (w, h) into a (maxW, maxH) box — the real
    * geometry of an image-resize stage (the pixel resampling itself
    * would live in the per-partition decode batch next to the codec;
    * only that kernel is stubbed in this container). Never upscales. */
  def resizeFit(w: Int, h: Int, maxW: Int, maxH: Int): (Int, Int) = {
    require(w > 0 && h > 0 && maxW > 0 && maxH > 0)
    val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
    (math.max(1, math.round(w * scale).toInt),
      math.max(1, math.round(h * scale).toInt))
  }

  /** [[decodeAll]] followed by the resize geometry — the decode batch a
    * production pipeline ships: features + output dimensions fitted to a
    * serving box, still one mapPartitions pass. */
  def decodeAndResize(ds: Dataset[MediaRecord], maxW: Int, maxH: Int)
      : Dataset[(MediaFeatures, Int, Int)] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val f = decodeStub(r)
        val (rw, rh) = resizeFit(f.width, f.height, maxW, maxH)
        (f, rw, rh)
      }
    }
  }

  /** Synthesize a media table from `documents` (UTF-8 bytes as content) —
    * the test-fixture entry point while no real media exists. */
  def mediaFromDocuments(s: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import s.implicits._
    graft.sources.Tables.documents(s, sfDir)
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("content"),
        col("source"))
      .as[MediaRecord]
  }
}
