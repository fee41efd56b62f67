package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Multimodal metadata derivation at the expression level — the
  * Catalyst-native half of `graft.operators.Multimodal`: binary content
  * column + digest + stub-decoded dimensions + frame count, all
  * codegen'd (no UDF, no mapPartitions). The per-frame feature
  * extraction that genuinely needs imperative batch code lives in
  * `Multimodal.decodeAll` and is spec-tested (no SQL oracle can express
  * a codec).
  *
  * Scale: binary columns are pruned unless selected; everything here is
  * a narrow map over the scan. */
object MultimodalQ {

  private def multimodalMeta(s: SparkSession, d: String): DataFrame = {
    val content = encode(col("text"), "UTF-8")
    val fp = conv(substring(md5(content), 1, 8), 16, 10).cast("bigint")
    Tables.documents(s, d)
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        length(content).as("n_bytes"),
        md5(content).as("content_md5"),
        (lit(64) + pmod(fp, lit(16)) * 32).as("width"),
        // height derives from the SAME fp column (shiftright 4 ==
        // div 16 for the non-negative 32-bit hash) — the fingerprint
        // formula must have exactly one definition per side
        (lit(64) + pmod(shiftright(fp, 4), lit(16)) * 32).as("height"),
        // ceil(n_bytes/100), floored at 1 for empty content: an exact
        // multiple of 100 must NOT produce a trailing zero-length frame
        greatest(lit(1L),
          ((length(content).cast("bigint") + 99) / lit(100)).cast("bigint"))
          .as("n_frames"))
      .orderBy(col("media_id"))
  }

  private val multimodalMetaSql =
    """SELECT doc_id AS media_id,
      |  ['image', 'audio', 'video'][(doc_id % 3) + 1] AS kind,
      |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
      |  md5(text) AS content_md5,
      |  64 + (fp % 16) * 32 AS width,
      |  64 + ((fp // 16) % 16) * 32 AS height,
      |  greatest(1, (octet_length(encode(text)) + 99) // 100) AS n_frames
      |FROM (SELECT *, CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) AS fp
      |      FROM documents)
      |ORDER BY media_id""".stripMargin

  // -------------------------------------------------------------- q_frame_sample
  /** Deterministic uniform frame sampling — the planning half of video
    * feature extraction: pick k=4 evenly-spaced frame indices per media
    * record and emit the BYTE RANGE each sampled frame occupies
    * (start offset + length), i.e. exactly the seek table a real codec
    * task needs. Everything is codegen'd integer arithmetic over the
    * metadata — the binary column itself is never touched, so at 100 TB
    * the scan reads only `n_bytes`-class columns and the expensive
    * decode runs later, only on the sampled ranges
    * (`Multimodal.decodeAll` is that imperative half). Short media
    * (fewer frames than samples) dedups to its real frame count. */
  private def frameSample(s: SparkSession, d: String): DataFrame = {
    val content = encode(col("text"), "UTF-8")
    Tables.documents(s, d)
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        length(content).cast("bigint").as("n_bytes"))
      // ceil(n_bytes/100) floored at 1 (see q_multimodal_meta): no
      // zero-length trailing seek range on exact-multiple media
      .withColumn("n_frames",
        greatest(lit(1L), ((col("n_bytes") + 99) / lit(100)).cast("bigint")))
      .withColumn("frame_idx", explode(array_distinct(
        expr("transform(sequence(0, 3), j -> (j * n_frames) div 4)"))))
      .select(col("media_id"), col("kind"), col("n_frames"), col("frame_idx"),
        (col("frame_idx") * 100).as("byte_start"),
        least(lit(100), col("n_bytes") - col("frame_idx") * 100).as("byte_len"))
      .orderBy(col("media_id"), col("frame_idx"))
  }

  private val frameSampleSql =
    """WITH base AS (
      |  SELECT doc_id AS media_id,
      |    ['image', 'audio', 'video'][(doc_id % 3) + 1] AS kind,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |    greatest(1, (octet_length(encode(text)) + 99) // 100) AS n_frames
      |  FROM documents)
      |SELECT media_id, kind, n_frames, frame_idx,
      |  frame_idx * 100 AS byte_start,
      |  least(100, n_bytes - frame_idx * 100) AS byte_len
      |FROM (
      |  SELECT *, unnest(list_distinct(
      |    list_transform(generate_series(0, 3), j -> (j * n_frames) // 4))) AS frame_idx
      |  FROM base)
      |ORDER BY media_id, frame_idx""".stripMargin

  // ----------------------------------------------------------------- n_phash_dup
  /** IMAGE-LEVEL perceptual dedup — the multimodal half of the dedup
    * suite: real PNG decode → real DCT pHash (Multimodal.phash64,
    * 32×32 luminance DCT, 8×8 low-frequency block, median-thresholded
    * bits) in one mapPartitions batch, then the SimHash banding trick
    * in Catalyst land: the 64-bit hash splits into 4×16-bit chunks and
    * by pigeonhole any pair at Hamming ≤ 3 agrees exactly on ≥ 1 chunk,
    * so a (chunk, value) equi-join generates candidates without an
    * all-pairs scan; bit_count(xor) verifies. Output: per-source image
    * accounting (images, distinct hashes, verified within-source dup
    * pairs) — the corpus report an image-dedup pass ships.
    *
    * No DuckDB oracle (no codec in SQL); MultimodalSpec pins the hash
    * mechanics instead: identical rasters collide exactly, mild noise
    * stays within the Hamming budget, unrelated images land far apart,
    * and the fixture corpus accounting is internally consistent. */
  private def phashDup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // pHash extraction is score-once-serve-many (the LM-score-table
    // contract): encode+decode+DCT per image is the expensive half, and
    // this query's frame used it THREE times per invocation (both sides
    // of the candidate self-join plus the accounting scan) — so the
    // (media_id, source, ph) table is a content-keyed persisted
    // artifact built once per corpus snapshot, and every invocation
    // serves the banding/verify/accounting from the tiny hash table.
    // Exactly what a production image-dedup pass ships at 100 TB: one
    // decode pass, many downstream consumers.
    val ph = s.read.parquet(graft.operators.Sinks.artifact("phashes", d) { p =>
      graft.operators.Multimodal.imagePhashes(
        graft.operators.Multimodal.mediaFromDocuments(s, d))
        .toDF("media_id", "source", "ph")
        .coalesce(4)
        .write.mode("overwrite").parquet(p)
    })
    val chunks = ph.select(col("media_id"), col("source"), col("ph"),
      explode(expr(
        "transform(sequence(0, 3), c -> struct(c AS c, shiftright(ph, CAST(c * 16 AS INT)) & 65535 AS v))"))
        .as("ck"))
      .select(col("media_id"), col("source"), col("ph"),
        col("ck.c").as("c"), col("ck.v").as("v"))
    val pairs = chunks.as("x")
      .join(chunks.as("y"),
        col("x.c") === col("y.c") && col("x.v") === col("y.v") &&
          col("x.source") === col("y.source") &&
          col("x.media_id") < col("y.media_id"))
      .filter(bit_count(col("x.ph").bitwiseXOR(col("y.ph"))) <= 3)
      .select(col("x.source").as("source"),
        col("x.media_id").as("id1"), col("y.media_id").as("id2"))
      .distinct()
      .groupBy(col("source")).agg(count(lit(1)).as("n_dup_pairs"))
    ph.groupBy(col("source"))
      .agg(count(lit(1)).as("n_images"),
        countDistinct(col("ph")).as("n_distinct_ph"))
      .join(pairs, Seq("source"), "left")
      .withColumn("n_dup_pairs", coalesce(col("n_dup_pairs"), lit(0L)))
      .orderBy(col("source"))
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_multimodal_meta", multimodalMeta, Some(multimodalMetaSql)),
    QueryDef("q_frame_sample", frameSample, Some(frameSampleSql)),
    QueryDef("n_phash_dup", phashDup, None),
  )
}
