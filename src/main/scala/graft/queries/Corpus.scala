package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.functions.Parity.dround
import graft.operators.TextOps
import graft.sources.Tables

/** Corpus-preparation operators: the document-level transforms a
  * training-data pipeline runs between raw crawl and tokenizer — exact
  * span-level dedup, sequence packing, mixture balancing, and
  * model-based quality scoring. Each is a pure declarative DAG over the
  * `documents` table with an exact DuckDB oracle; the hashing discipline
  * is the library-wide md5-prefix portable hash (TextOps.portableHash)
  * so the oracle reproduces every verdict bit-for-bit.
  */
object Corpus {

  // -------------------------------------------------------------- q_chunk_dedup
  /** C4-style exact span-level dedup. C4 removes any LINE that repeats
    * verbatim across the corpus (boilerplate footers, license blurbs);
    * this corpus has no line structure, so the unit is a fixed 10-token
    * chunk — same algorithm, same shape. One pass:
    *
    *   tokens → consecutive 10-token chunks (posexplode keeps the
    *   in-doc position) → 32-bit portable chunk hash → global
    *   count(DISTINCT doc) per hash → chunks seen in ≥2 docs are
    *   boilerplate → anti-flag → per-doc reconstruction of the
    *   surviving text (position-ordered) + removal accounting.
    *
    * Scale shape: chunks shuffle as 8-byte hashes (the chunk string
    * stays only on the reconstruction side); the duplicate-hash dim is
    * orders of magnitude smaller than the corpus (only repeated hashes
    * survive the HAVING), so AQE broadcasts it at this scale and falls
    * back to a shuffle join when corpus-scale boilerplate outgrows the
    * threshold — no hint. Reconstruction is a single groupBy(doc_id):
    * collect_list skips the nulled-out duplicate chunks, array_sort
    * restores document order. Everything is linear in corpus size —
    * this is the cheap exact pass that runs BEFORE near-dup LSH.
    * The emitted digest (md5 of the surviving text) keeps the verified
    * output narrow; a production pass emits the text itself. */
  private def chunkDedup(s: SparkSession, d: String): DataFrame = {
    val C = 10
    val docs = Tables.documents(s, d)
      .withColumn("ts", TextOps.tokens(col("text")))
    val chunks = docs.select(
      col("doc_id"),
      posexplode(transform(
        sequence(lit(0), ceil(size(col("ts")) / lit(C.toDouble)).cast("int") - 1),
        i => concat_ws(" ", slice(col("ts"), i * C + 1, lit(C)))))
        .as(Seq("pos", "chunk")))
      .withColumn("chash", TextOps.portableHash(col("chunk")))
    val dup = chunks.groupBy(col("chash"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("chash"), lit(1).as("is_dup"))
    chunks.join(dup, Seq("chash"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("is_dup").isNull, 1L).otherwise(0L)).as("n_kept"),
        md5(array_join(transform(
          array_sort(collect_list(
            when(col("is_dup").isNull, struct(col("pos"), col("chunk"))))),
          x => x.getField("chunk")), " ")).as("kept_md5"))
      .orderBy(col("doc_id"))
  }

  private val chunkDedupSql =
    """WITH tk AS (
      |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS ts FROM documents),
      |ch0 AS (
      |  SELECT doc_id, ts,
      |    unnest(generate_series(0, CAST(ceil(len(ts) / 10.0) AS INT) - 1)) AS pos
      |  FROM tk),
      |ch AS (
      |  SELECT doc_id, pos,
      |    array_to_string(ts[pos*10+1:pos*10+10], ' ') AS chunk,
      |    CAST('0x' || substr(md5(array_to_string(ts[pos*10+1:pos*10+10], ' ')), 1, 8)
      |         AS BIGINT) AS chash
      |  FROM ch0),
      |dup AS (
      |  SELECT chash FROM ch GROUP BY chash HAVING count(DISTINCT doc_id) >= 2),
      |fl AS (
      |  SELECT c.doc_id, c.pos, c.chunk, d.chash IS NOT NULL AS is_dup
      |  FROM ch c LEFT JOIN dup d USING (chash))
      |SELECT doc_id,
      |  count(*) AS n_chunks,
      |  CAST(sum(CASE WHEN NOT is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  md5(coalesce(
      |    string_agg(CASE WHEN NOT is_dup THEN chunk END, ' ' ORDER BY pos), ''))
      |    AS kept_md5
      |FROM fl GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q_pack_seqs
  /** Sequence PACKING — the concat-and-chunk step that turns a curated
    * corpus into fixed-length training sequences (GPT-style: documents
    * are concatenated in a deterministic order and sliced every CAP
    * tokens; a document may span a boundary). Emits per-sequence
    * accounting: how many docs touch it, its token count (== CAP except
    * the tail), and how many docs carried in across its left boundary.
    *
    * The global token offset is a prefix sum. A naive
    * `Window.orderBy(doc_id)` collapses the corpus to ONE task, so the
    * offset is computed with the two-level scan pattern instead:
    * per-bucket prefix sums (wide parallelism, bucket = doc_id/64 keeps
    * the deterministic order because ids are monotone) + a cumsum over
    * the per-bucket totals (|buckets| rows — the only narrow step,
    * 64-fold smaller than the data; production sizes the bucket width so
    * this frame stays in one task's memory, or recurses one more level).
    * The bucket-offset join is a tiny dim joined on bkt — AQE
    * broadcasts it. Everything downstream is integer arithmetic. */
  private def packSeqs(s: SparkSession, d: String): DataFrame = {
    val Cap = 256L
    val BucketW = 64L
    val dn = Tables.documents(s, d)
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("bigint").as("n_tok"))
      .withColumn("bkt", floor(col("doc_id") / lit(BucketW)).cast("bigint"))
    val withinW = Window.partitionBy(col("bkt")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val within = dn.withColumn("woff", coalesce(sum(col("n_tok")).over(withinW), lit(0L)))
    val bucketW = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val boffs = dn.groupBy(col("bkt")).agg(sum(col("n_tok")).as("btot"))
      .withColumn("boff", coalesce(sum(col("btot")).over(bucketW), lit(0L)))
      .select(col("bkt"), col("boff"))
    within.join(boffs, Seq("bkt"))
      .withColumn("off", col("boff") + col("woff"))
      .select(col("doc_id"), col("n_tok"), col("off"),
        explode(sequence(
          floor(col("off") / lit(Cap.toDouble)).cast("bigint"),
          floor((col("off") + col("n_tok") - 1) / lit(Cap.toDouble)).cast("bigint")))
          .as("seq"))
      .groupBy(col("seq"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(least((col("seq") + 1) * Cap, col("off") + col("n_tok")) -
          greatest(col("seq") * Cap, col("off"))).as("n_tokens"),
        sum(when(col("off") < col("seq") * Cap, 1L).otherwise(0L)).as("n_carry_in"))
      .select(col("seq").as("seq_id"), col("n_docs"), col("n_tokens"),
        col("n_carry_in"))
      .orderBy(col("seq_id"))
  }

  private val packSeqsSql =
    """WITH dn AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tok
      |  FROM documents),
      |o AS (
      |  SELECT doc_id, n_tok,
      |    CAST(COALESCE(sum(n_tok) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
      |  FROM dn),
      |e AS (
      |  SELECT doc_id, n_tok, off,
      |    unnest(generate_series(CAST(off // 256 AS BIGINT),
      |                           CAST((off + n_tok - 1) // 256 AS BIGINT))) AS seq
      |  FROM o)
      |SELECT seq AS seq_id, count(*) AS n_docs,
      |  CAST(sum(least((seq+1)*256, off+n_tok) - greatest(seq*256, off)) AS BIGINT)
      |    AS n_tokens,
      |  CAST(sum(CASE WHEN off < seq*256 THEN 1 ELSE 0 END) AS BIGINT) AS n_carry_in
      |FROM e GROUP BY seq ORDER BY seq""".stripMargin

  // -------------------------------------------------------------- q_mix_budget
  /** Mixture BALANCING to a uniform per-source token target — the
    * companion to q_temp_resample that can also UP-sample: a source
    * holding fewer tokens than target repeats whole epochs (the
    * standard practice for small high-quality sources) plus a
    * deterministically sampled fractional epoch; an over-target source
    * gets epochs=0 and only the fractional pass. n_copies per doc =
    * epochs + (portable hash-mod < fractional rate), materialized via a
    * guarded `sequence(1, n_copies)` explode (guarded because Spark's
    * sequence(1,0) counts DOWN — it is not empty).
    *
    * Scale shape: rates derive from one |sources|-row aggregate
    * (broadcast); the explode multiplies data by the epoch factor —
    * exactly the blow-up the training job itself would materialize; the
    * final accounting groupBy is on the low-cardinality source key.
    * Rate parity is IEEE-exact: both engines divide identical integers
    * and floor identical doubles (the q_temp_resample discipline). */
  private def mixBudget(s: SparkSession, d: String): DataFrame = {
    val dn = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).cast("bigint").as("n_tok"))
    val st = dn.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs_in"), sum(col("n_tok")).as("tokens_in"))
    val tgt = st.agg(
      (sum(col("tokens_in")) / count(lit(1)).cast("double")).as("target_tokens"))
    val rates = st.crossJoin(broadcast(tgt))
      .withColumn("rate", col("target_tokens") / col("tokens_in").cast("double"))
      .withColumn("epochs", floor(col("rate")).cast("bigint"))
      .withColumn("rem_e4",
        floor((col("rate") - floor(col("rate"))) * 10000).cast("bigint"))
      .select(col("source"), col("n_docs_in"), col("tokens_in"),
        col("epochs"), col("rem_e4"))
    val bucket = TextOps.hashBucket("mix:", col("doc_id"))
    val copies = dn.join(broadcast(rates), "source")
      .withColumn("n_copies",
        col("epochs") + when(bucket < col("rem_e4"), 1L).otherwise(0L))
      .select(col("source"), col("n_tok"),
        explode(when(col("n_copies") >= 1, sequence(lit(1L), col("n_copies")))
          .otherwise(array())).as("epoch"))
    val out = copies.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs_out"), sum(col("n_tok")).as("tokens_out"))
    rates.join(out, Seq("source"), "left")
      .select(col("source"), col("n_docs_in"), col("tokens_in"), col("epochs"),
        coalesce(col("n_docs_out"), lit(0L)).as("n_docs_out"),
        coalesce(col("tokens_out"), lit(0L)).as("tokens_out"))
      .orderBy(col("source"))
  }

  private val mixBudgetSql =
    """WITH dn AS (
      |  SELECT doc_id, source,
      |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tok
      |  FROM documents),
      |st AS (
      |  SELECT source, count(*) AS n_docs_in, sum(n_tok) AS tokens_in
      |  FROM dn GROUP BY source),
      |tgt AS (
      |  SELECT sum(tokens_in) / CAST(count(*) AS DOUBLE) AS target_tokens FROM st),
      |rates AS (
      |  SELECT source, n_docs_in, tokens_in,
      |    CAST(floor(target_tokens / tokens_in) AS BIGINT) AS epochs,
      |    CAST(floor((target_tokens / tokens_in - floor(target_tokens / tokens_in))
      |               * 10000) AS BIGINT) AS rem_e4
      |  FROM st, tgt),
      |cp AS (
      |  SELECT d.doc_id, d.source, d.n_tok,
      |    CAST(r.epochs + CASE WHEN
      |      CAST('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 8)
      |           AS BIGINT) % 10000 < r.rem_e4 THEN 1 ELSE 0 END AS BIGINT)
      |      AS n_copies
      |  FROM dn d JOIN rates r USING (source)),
      |out_rows AS (
      |  SELECT doc_id, source, n_tok
      |  FROM cp, unnest(generate_series(1, n_copies)) AS u(i))
      |SELECT s.source,
      |  CAST(any_value(s.n_docs_in) AS BIGINT) AS n_docs_in,
      |  CAST(any_value(s.tokens_in) AS BIGINT) AS tokens_in,
      |  any_value(r.epochs) AS epochs,
      |  CAST(count(o.doc_id) AS BIGINT) AS n_docs_out,
      |  CAST(coalesce(sum(o.n_tok), 0) AS BIGINT) AS tokens_out
      |FROM st s JOIN rates r USING (source)
      |LEFT JOIN out_rows o ON o.source = s.source
      |GROUP BY s.source ORDER BY s.source""".stripMargin

  // -------------------------------------------------------- q_quality_classify
  /** Model-based quality scoring — the fastText-style hashed-linear
    * classifier every production corpus filter runs (CCNet/LLaMA data
    * cards): score(doc) = Σ_t w[h(t)] / n_tokens with a hashed weight
    * table. Weights here are a deterministic pseudo-random table keyed
    * by the portable hash (a stand-in for trained weights — the
    * inference plan is identical), kept INTEGER (w ∈ [-1000, 1000]) so
    * the per-doc sum is order-free exact in both engines; the final
    * normalized score divides once at the end.
    *
    * Scale shape: the whole classifier is a single `aggregate()`
    * higher-order fold over the token array — no explode, no shuffle,
    * no UDF; it runs at scan speed inside whole-stage codegen and the
    * only exchange in the plan is the presentation sort. This is the
    * shape a learned filter needs at 100 TB: per-row arithmetic that
    * fuses into the read. */
  private def qualityClassify(s: SparkSession, d: String): DataFrame = {
    val w: org.apache.spark.sql.Column => org.apache.spark.sql.Column = t =>
      TextOps.portableHash(concat(lit("w:"), t)) % 2001 - 1000
    Tables.documents(s, d)
      .withColumn("ts", TextOps.tokens(col("text")))
      .select(
        col("doc_id"),
        size(col("ts")).cast("bigint").as("n_tok"),
        aggregate(col("ts"), lit(0L), (acc, t) => acc + w(t)).as("wsum"))
      .select(col("doc_id"), col("n_tok"),
        dround(col("wsum") / (lit(1000.0) * col("n_tok")), 4).as("score"),
        when(col("wsum") > 0, lit("keep")).otherwise(lit("drop")).as("label"))
      .orderBy(col("doc_id"))
  }

  private val qualityClassifySql =
    """WITH tk AS (
      |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS ts FROM documents),
      |sc AS (
      |  SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tok,
      |    list_sum(list_transform(ts, t ->
      |      CAST('0x' || substr(md5('w:' || t), 1, 8) AS BIGINT) % 2001 - 1000))
      |      AS wsum
      |  FROM tk)
      |SELECT doc_id, n_tok,
      |  round(wsum / (1000.0 * n_tok), 4) AS score,
      |  CASE WHEN wsum > 0 THEN 'keep' ELSE 'drop' END AS label
      |FROM sc ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q_doc_windows
  /** Context-window SHARDING with stride — the step between curation
    * and batching in every pretraining pipeline: long documents fan out
    * into overlapping fixed-size token windows (W=64, stride S=48, so a
    * 16-token overlap preserves cross-boundary context), short tails
    * kept as partial windows. One narrow map + explode, no shuffle
    * until the final presentation order-by — embarrassingly parallel at
    * 100 TB, output rows ∝ Σ tokens / S. Distinct from `q_pack_seqs`
    * (which PACKS short docs into fixed budgets) and `q_chunk_dedup`
    * (non-overlapping chunks keyed for dedup): this op turns long docs
    * into training samples. Output per window: index, token count, and
    * the boundary tokens (cheap content witnesses the oracle can
    * reproduce without hashing). */
  private def docWindows(s: SparkSession, d: String): DataFrame = {
    val W = 64
    val S = 48
    Tables.documents(s, d)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ts"))
      .withColumn("n", size(col("ts")).cast("long"))
      .filter(col("n") > 0)
      .select(col("doc_id"), col("ts"), col("n"),
        explode(sequence(lit(1L), col("n"), lit(S.toLong))).as("st"))
      .select(col("doc_id"),
        expr(s"CAST((st - 1) DIV $S AS BIGINT)").as("win_idx"),
        least(lit(W.toLong), col("n") - col("st") + 1).as("n_tok"),
        element_at(col("ts"), col("st").cast("int")).as("first_tok"),
        element_at(col("ts"),
          least(col("st") + lit((W - 1).toLong), col("n")).cast("int"))
          .as("last_tok"))
      .orderBy(col("doc_id"), col("win_idx"))
  }

  private val docWindowsSql =
    """WITH tk AS (
      |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS ts
      |  FROM documents),
      |w AS (
      |  SELECT doc_id, ts, len(ts) AS n,
      |    unnest(generate_series(1, len(ts), 48)) AS st
      |  FROM tk WHERE len(ts) > 0)
      |SELECT doc_id,
      |  CAST((st - 1) // 48 AS BIGINT) AS win_idx,
      |  CAST(least(64, n - st + 1) AS BIGINT) AS n_tok,
      |  ts[st] AS first_tok,
      |  ts[least(st + 63, n)] AS last_tok
      |FROM w
      |ORDER BY doc_id, win_idx""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_doc_windows", docWindows, Some(docWindowsSql)),
    QueryDef("q_chunk_dedup", chunkDedup, Some(chunkDedupSql)),
    QueryDef("q_pack_seqs", packSeqs, Some(packSeqsSql)),
    QueryDef("q_mix_budget", mixBudget, Some(mixBudgetSql)),
    QueryDef("q_quality_classify", qualityClassify, Some(qualityClassifySql)),
  )
}
