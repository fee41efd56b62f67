package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.functions.Parity.dround
import graft.operators.TextOps
import graft.sources.Tables

/** Sampling operators for training-data pipelines.
  *
  * The workhorse is DETERMINISTIC hash-mod sampling, not `rand()` /
  * TABLESAMPLE: at 100 TB a sample must be (a) reproducible across
  * reruns and engines, (b) stable under task retries (a reseeded
  * `rand()` in a retried task silently changes the sample), and
  * (c) a pure per-row predicate so it pushes into the scan and
  * composes with partition pruning. Hashing the row's natural key into
  * 10⁴ buckets and keeping `bucket < rate·10⁴` gives all three, plus
  * coordinated samples across tables (same key → same verdict) — the
  * standard trick for consistent join samples. The hash is the
  * library-wide md5-prefix portable hash, so DuckDB reproduces the
  * exact sample, not just its statistics.
  */
object Sampling {

  // ------------------------------------------------------- q_stratified_sample
  /** Per-stratum rates keyed on l_returnflag (A→5%, N→1%, R→10%) over
    * the deterministic bucket of the line's unique natural key; verified
    * by aggregating the sampled rows per stratum. One codegen'd
    * filter+agg pass, no shuffle wider than the group count. */
  private def stratifiedSample(s: SparkSession, d: String): DataFrame = {
    val bucket = pmod(TextOps.portableHash(
      concat(col("l_orderkey").cast("string"), lit(":"),
        col("l_linenumber").cast("string"))), lit(10000L))
    val rateE4 = when(col("l_returnflag") === "A", 500L)
      .when(col("l_returnflag") === "N", 100L)
      .otherwise(1000L)
    Tables.lineitem(s, d)
      .filter(bucket < rateE4)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_sampled"),
        dround(sum(col("l_quantity")), 2).as("sum_qty"),
        dround(avg(col("l_extendedprice")), 2).as("avg_price"))
      .orderBy(col("l_returnflag"))
  }

  private val stratifiedSampleSql =
    """SELECT l_returnflag,
      |  count(*) AS n_sampled,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(avg(l_extendedprice), 2) AS avg_price
      |FROM lineitem
      |WHERE CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':' ||
      |    CAST(l_linenumber AS VARCHAR)), 1, 8) AS BIGINT) % 10000
      |  < CASE l_returnflag WHEN 'A' THEN 500 WHEN 'N' THEN 100 ELSE 1000 END
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------- q_corpus_curate
  /** The end-to-end corpus-curation composite — the query an LLM-data
    * team actually ships, chaining the library's stages in ONE
    * declarative DAG (so Catalyst sees the whole pipeline: the quality
    * filter pushes below everything, the dedup anti-join and the
    * sampling predicate run in the same scan pass where possible):
    *
    *   1. quality gate — token count ≥ 20 and type-token ratio ≥ 0.3
    *      (drops degenerate/repetitive docs);
    *   2. language allowlist (en/de/fr/es);
    *   3. near-dup survivor — anti-join against docs that have a
    *      SMALLER near-duplicate (Jaccard ≥ 0.95): the pairwise
    *      keep-the-first rule used by most production dedup passes
    *      (q_dup_clusters holds the full component semantics). The
    *      loser set comes from the SUB-QUADRATIC LSH candidate+verify
    *      path (Dedup.lshDupPairs) — no stage of the composite is
    *      quadratic in docs — and the oracle mirrors the identical LSH
    *      CTE chain, so parity holds through the approximation;
    *   4. deterministic per-language downsample — the dominant language
    *      (en) capped at 80% via the hash-mod sampler, others kept;
    *   5. per-language corpus accounting (docs, tokens, sources).
    *
    * Every stage is the oracle-checked building block from its home
    * module, so the composite is exactly reproducible in DuckDB. */
  private def corpusCurate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .withColumn("ts", TextOps.tokens(col("text")))
      .withColumn("n_tokens", size(col("ts")))
      .withColumn("ttr",
        size(array_distinct(col("ts"))).cast("double") / size(col("ts")))
    val quality = docs.filter(
      col("n_tokens") >= 20 && col("ttr") >= 0.3 &&
        col("lang").isin("en", "de", "fr", "es"))
    val losers = Dedup.lshDupPairsShared(s, d)
      .select(col("id2").as("doc_id")).distinct()
    val keepE4 = when(col("lang") === "en", 8000L).otherwise(10000L)
    val bucket = TextOps.hashBucket("cur:", col("doc_id"))
    quality
      .join(losers, Seq("doc_id"), "left_anti")
      .filter(bucket < keepE4)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("bigint").as("total_tokens"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy(col("lang"))
  }

  private val corpusCurateSql =
    s"""WITH ${Dedup.lshDupCtes},
       |toks AS (SELECT doc_id, lang, source,
       |           regexp_split_to_array(text, '\\s+') AS ts
       |         FROM documents),
       |q AS (SELECT doc_id, lang, source,
       |        CAST(len(ts) AS INT) AS n_tokens,
       |        len(list_distinct(ts)) / CAST(len(ts) AS DOUBLE) AS ttr
       |      FROM toks),
       |qual AS (SELECT * FROM q
       |         WHERE n_tokens >= 20 AND ttr >= 0.3
       |           AND lang IN ('en', 'de', 'fr', 'es')),
       |losers AS (SELECT DISTINCT id2 AS doc_id FROM lshdup),
       |surv AS (SELECT qual.* FROM qual
       |         LEFT JOIN losers USING (doc_id)
       |         WHERE losers.doc_id IS NULL),
       |samp AS (SELECT * FROM surv
       |  WHERE CAST('0x' || substr(md5('cur:' || CAST(doc_id AS VARCHAR)), 1, 8)
       |          AS BIGINT) % 10000
       |    < CASE WHEN lang = 'en' THEN 8000 ELSE 10000 END)
       |SELECT lang, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources
       |FROM samp
       |GROUP BY lang
       |ORDER BY lang""".stripMargin

  // ----------------------------------------------------------- q_temp_resample
  /** Temperature-based source re-weighting (the multinomial
    * α-smoothing every multi-source training mix uses, α = 0.5): a
    * source with n_s docs keeps docs at a rate ∝ n_s^α / n_max^α, so
    * the dominant source keeps everything… relatively less and rare
    * sources are up-weighted toward a flatter mix. Rates are derived
    * per-source in one tiny aggregation (|sources| rows — broadcast),
    * membership stays the deterministic hash-mod predicate (retry- and
    * engine-stable), and the verdict per doc is a pure function of
    * (doc_id, source stats) — reproducible across reruns and engines.
    *
    * Cross-engine parity of the rate itself: sqrt/divide/multiply are
    * IEEE-754 exactly-rounded, so both engines compute bit-identical
    * doubles from identical integers, and floor() of identical doubles
    * is identical — the rate is then an exact integer comparison, the
    * same discipline as the library's other samplers. */
  private def tempResample(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.documents(s, d)
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
    val nMax = counts.agg(max(col("n")).as("n_max"))
    val rates = counts.crossJoin(broadcast(nMax))
      .withColumn("rate_e4",
        floor(lit(10000.0) * sqrt(col("n").cast("double")) /
          sqrt(col("n_max").cast("double"))).cast("bigint"))
    val bucket = TextOps.hashBucket("tmp:", col("doc_id"))
    Tables.documents(s, d)
      .join(broadcast(rates), "source")
      .filter(bucket < col("rate_e4"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
        first(col("n")).as("n_total"),
        first(col("rate_e4")).as("rate_e4"))
      .withColumn("kept_frac",
        dround(col("n_kept").cast("double") / col("n_total"), 4))
      .orderBy(col("source"))
  }

  private val tempResampleSql =
    """WITH counts AS (
      |  SELECT source, count(*) AS n FROM documents GROUP BY source),
      |rates AS (
      |  SELECT source, n,
      |    CAST(floor(10000.0 * sqrt(CAST(n AS DOUBLE))
      |               / sqrt(CAST((SELECT max(n) FROM counts) AS DOUBLE)))
      |         AS BIGINT) AS rate_e4
      |  FROM counts),
      |kept AS (
      |  SELECT d.source, r.n, r.rate_e4
      |  FROM documents d JOIN rates r ON d.source = r.source
      |  WHERE CAST('0x' || substr(md5('tmp:' || CAST(d.doc_id AS VARCHAR)), 1, 8)
      |          AS BIGINT) % 10000 < r.rate_e4)
      |SELECT source, count(*) AS n_kept,
      |  any_value(n) AS n_total, any_value(rate_e4) AS rate_e4,
      |  round(count(*) / CAST(any_value(n) AS DOUBLE), 4) AS kept_frac
      |FROM kept
      |GROUP BY source
      |ORDER BY source""".stripMargin

  // ----------------------------------------------------------- q_decontaminate
  /** Benchmark DECONTAMINATION — the screen every training corpus runs
    * before an eval is trustworthy: flag training docs sharing any
    * 8-token n-gram with a held-out benchmark set (here: the `src0`
    * source plays the benchmark; production swaps in the eval suite's
    * text). The standard exact-substring screen (GPT-3's 13-gram /
    * Llama-style n-gram overlap, published in their data cards) as one
    * declarative DAG:
    *
    *   tokens → sliding 8-grams → 60-bit md5-prefix gram hash →
    *   LEFT JOIN against the benchmark's DISTINCT gram hashes →
    *   per-doc occurrence counts → contaminated docs + fraction.
    *
    * Scale shape: grams shuffle as 8-byte hashes, never strings (the
    * join key is the hash; the oracle hashes identically so parity is
    * exact by construction, the LSH-verify discipline). The benchmark
    * side is DISTINCT'd and orders of magnitude smaller than the
    * corpus — AQE broadcasts it at this scale and falls back to a
    * shuffle join when a giant eval suite outgrows the threshold (no
    * hint, the library's round-4 stance on dim sizing). 60-bit hashes
    * keep the collision expectation ≪ 1 through corpus-scale gram
    * counts (~2⁻⁶⁰·n²/2); a production screen can rehash survivors on
    * the raw gram for certainty — the flagged set here is tiny. */
  /** (doc_id, source, gh): every sliding 8-token gram of every doc as a
    * 60-bit md5-prefix hash — the shared front half of the exact
    * (q_decontaminate) and bloom (n_bloom_decontam) screens. */
  private def gramHashes(s: SparkSession, d: String): DataFrame = {
    val N = 8
    Tables.documents(s, d)
      .withColumn("ts", TextOps.tokens(col("text")))
      .filter(size(col("ts")) >= N)
      .select(col("doc_id"), col("source"),
        explode(transform(sequence(lit(1), size(col("ts")) - (N - 1)),
          i => conv(substring(md5(concat_ws(" ", slice(col("ts"), i, lit(N)))), 1, 15),
            16, 10).cast("bigint"))).as("gh"))
  }

  private def decontaminate(s: SparkSession, d: String): DataFrame = {
    val Holdout = "src0"
    val grams = gramHashes(s, d)
    // the holdout's distinct gram set is folded ONCE per snapshot (the
    // same fold-holdout-once contract as n_bloom_decontam's persisted
    // Bloom — that is the whole point of a benchmark screen: the eval
    // side is settled, each incoming batch pays only its own grams +
    // the probe join); previously both sides re-ran the full n-gram
    // explode per invocation
    val bench = s.read.parquet(
      graft.operators.Sinks.artifact("evgrams", d) { p =>
        grams.filter(col("source") === Holdout)
          .select(col("gh")).distinct()
          .coalesce(4).write.mode("overwrite").parquet(p)
      }).withColumn("is_ev", lit(1))
    grams.filter(col("source") =!= Holdout)
      .join(bench, Seq("gh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("is_ev"), lit(0))).as("n_hits"))
      .filter(col("n_hits") > 0)
      .withColumn("contam_frac",
        dround(col("n_hits").cast("double") / col("n_grams"), 4))
      .orderBy(col("doc_id"))
  }

  private val decontaminateSql =
    """WITH tk AS (
      |  SELECT doc_id, source, regexp_split_to_array(text, '\s+') AS ts
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id, source,
      |    unnest(list_transform(generate_series(1, len(ts) - 7),
      |      i -> CAST('0x' || substr(md5(array_to_string(ts[i:i+7], ' ')), 1, 15)
      |           AS BIGINT))) AS gh
      |  FROM tk WHERE len(ts) >= 8),
      |bench AS (SELECT DISTINCT gh FROM grams WHERE source = 'src0'),
      |agg AS (
      |  SELECT g.doc_id, count(*) AS n_grams,
      |    CAST(sum(CASE WHEN b.gh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_hits
      |  FROM grams g LEFT JOIN bench b ON g.gh = b.gh
      |  WHERE g.source <> 'src0'
      |  GROUP BY g.doc_id)
      |SELECT doc_id, n_grams, n_hits,
      |  round(n_hits / CAST(n_grams AS DOUBLE), 4) AS contam_frac
      |FROM agg
      |WHERE n_hits > 0
      |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------- n_bloom_decontam
  /** Bloom-filter decontamination — the SPACE-BOUNDED form of
    * q_decontaminate for when the benchmark side must not be shuffled
    * against the corpus at all: the held-out set's gram hashes are
    * folded into ONE Bloom sketch (distributed `stat.bloomFilter`
    * treeAggregate; ~24 bits/item at fpp=1e-5, so even a 10M-gram eval
    * suite is a ~30 MB broadcast), and the corpus probes it at scan
    * speed through the codegen'd `graft_bloom_contains` expression — no
    * join, no shuffle of the corpus grams, one aggregation for the
    * per-doc verdict. One-sided error: every exact hit is flagged
    * (no false negatives), a ~1e-5 per-gram false-positive rate adds a
    * bounded sliver of over-flagging — the right trade for a screen
    * whose flagged set is re-checked exactly anyway (SamplingSpec pins
    * the superset relation against q_decontaminate and the FP budget).
    * No oracle: the FP set is implementation-defined (seed/hash of the
    * sketch), so correctness is spec-verified against the exact screen
    * instead. */
  private def bloomDecontam(s: SparkSession, d: String): DataFrame = {
    val Holdout = "src0"
    graft.functions.BloomContains.register(s)
    val grams = gramHashes(s, d)
    // The eval-suite sketch is a once-per-snapshot ARTIFACT (the
    // ModelStore/pair-table contract): production folds the held-out
    // set into its Bloom once and every ingest batch probes it — so
    // the serialized sketch persists under the content-keyed tag and
    // the per-invocation cost is load + the corpus-side probe scan
    // (the actual serving op). Deterministic bytes: Bloom insertion
    // OR-s bits, so the treeAggregate's merge order cannot change the
    // sketch — disk-loaded ≡ freshly built, and SamplingSpec's
    // superset/FP pins hold identically.
    val bfDir = graft.operators.Sinks.artifact("bloom", d) { p =>
      // cache across the two actions (size count + sketch build) —
      // the holdout gram explode is the expensive half of the build
      val bench = grams.filter(col("source") === Holdout)
        .select(col("gh")).persist()
      val nBench = bench.count()
      val bf = bench.stat.bloomFilter("gh", math.max(nBench, 1000L), 1e-5)
      bench.unpersist(blocking = false)
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      new java.io.File(p).mkdirs()
      java.nio.file.Files.write(
        new java.io.File(p, "bf.bin").toPath, bos.toByteArray)
    }
    val bytes = java.nio.file.Files.readAllBytes(
      new java.io.File(bfDir, "bf.bin").toPath)
    grams.filter(col("source") =!= Holdout)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(call_function("graft_bloom_contains", lit(bytes), col("gh")),
          1L).otherwise(0L)).as("n_hits"))
      .filter(col("n_hits") > 0)
      .withColumn("contam_frac",
        dround(col("n_hits").cast("double") / col("n_grams"), 4))
      .orderBy(col("doc_id"))
  }

  // -------------------------------------------------------- q_weighted_sample
  /** Weighted sampling WITHOUT replacement, per stratum — the
    * quality-weighted subset selection step of corpus curation (keep
    * the best-k docs per language, where "best" is stochastic but
    * longer/higher-quality docs are proportionally likelier). Uses the
    * Efraimidis–Spirakis (2006) exponential-key trick: each row draws
    * u ∈ (0,1) and ranks by u^(1/w); the top-k per stratum is then an
    * exact weighted sample without replacement. Two library
    * disciplines make it engine-portable and retry-safe: (1) u comes
    * from the deterministic md5-prefix hash of the row key, not
    * `rand()` — reproducible across reruns, task retries, and engines
    * (the file-header contract); (2) ranking uses ln(u)/w (monotone in
    * u^(1/w), no underflow for large w) rounded to 8 dp with a doc_id
    * tiebreak, the same rounded-rank determinism rule as q_tfidf.
    * Plan: one narrow codegen'd map computes the key, one lang-hash
    * shuffle feeds the per-stratum top-k window; output is k·|langs|
    * rows. At 100 TB: no global sort, no driver involvement, and the
    * sample is coordinated — rerunning on any subset of partitions
    * selects the same winners. */
  private def weightedSample(s: SparkSession, d: String): DataFrame = {
    val u = (TextOps.portableHash(concat(lit("ws:"),
      col("doc_id").cast("string"))) + lit(0.5)) / lit(4294967296.0)
    val key = dround(log(u) / col("n_chars"), 8)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("es_key").desc, col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars"), key.as("es_key"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("lang"), col("rn"), col("doc_id"), col("n_chars"),
        col("es_key"))
      .orderBy(col("lang"), col("rn"))
  }

  private val weightedSampleSql =
    """WITH keyed AS (
      |  SELECT doc_id, lang, n_chars,
      |    round(ln((CAST('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)),
      |          1, 8) AS BIGINT) + 0.5) / 4294967296.0) / n_chars, 8)
      |      AS es_key
      |  FROM documents),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY lang
      |    ORDER BY es_key DESC, doc_id) AS rn
      |  FROM keyed)
      |SELECT lang, rn, doc_id, n_chars, es_key
      |FROM ranked
      |WHERE rn <= 5
      |ORDER BY lang, rn""".stripMargin

  // -------------------------------------------------------------- q_epoch_shuffle
  /** Deterministic EPOCH SHUFFLE — the data-ordering contract a
    * multi-epoch training run needs: each epoch presents the corpus in
    * a different but fully REPRODUCIBLE order (job restarts, preemption
    * and re-runs resume the exact same sequence — the same
    * retry-stability argument as the stratified sampler, applied to
    * ordering). Sample order is a pure function of (epoch, doc_id):
    * shard = hash mod 8 spreads the corpus over writers, and the
    * within-shard rank orders each shard file. One narrow map + one
    * shuffle by (epoch, shard) + a per-shard sort — exactly the work a
    * shard writer pays at 100 TB, with shard count scaled to the
    * cluster, never a global single-partition sort. The window
    * partitions on (epoch, shard), so no WindowExec-on-one-partition
    * degradation. Two epochs emitted to make the different-order
    * property visible in the output itself. */
  private def epochShuffle(s: SparkSession, d: String): DataFrame = {
    val Shards = 8
    Tables.documents(s, d)
      .select(col("doc_id"), explode(expr("sequence(0, 1)")).as("epoch"))
      .withColumn("k", TextOps.portableHash(
        concat(lit("ep"), col("epoch").cast("string"), lit(":"),
          col("doc_id").cast("string"))))
      .withColumn("shard", pmod(col("k"), lit(Shards.toLong)))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("epoch"), col("shard"))
          .orderBy(col("k"), col("doc_id"))))
      .select(col("epoch").cast("long").as("epoch"), col("shard"),
        col("pos").cast("long").as("pos"), col("doc_id"))
      .orderBy(col("epoch"), col("shard"), col("pos"))
  }

  private val epochShuffleSql =
    """WITH e AS (
      |  SELECT doc_id, unnest(generate_series(0, 1)) AS epoch
      |  FROM documents),
      |k AS (
      |  SELECT doc_id, epoch,
      |    CAST('0x' || substr(md5('ep' || CAST(epoch AS VARCHAR) || ':' ||
      |      CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS k
      |  FROM e)
      |SELECT CAST(epoch AS BIGINT) AS epoch, k % 8 AS shard,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY epoch, k % 8
      |    ORDER BY k, doc_id) AS BIGINT) AS pos,
      |  doc_id
      |FROM k
      |ORDER BY epoch, shard, pos""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_epoch_shuffle", epochShuffle, Some(epochShuffleSql)),
    QueryDef("q_weighted_sample", weightedSample, Some(weightedSampleSql)),
    QueryDef("q_stratified_sample", stratifiedSample, Some(stratifiedSampleSql)),
    QueryDef("q_temp_resample", tempResample, Some(tempResampleSql)),
    QueryDef("q_corpus_curate", corpusCurate, Some(corpusCurateSql)),
    QueryDef("q_decontaminate", decontaminate, Some(decontaminateSql)),
    QueryDef("n_bloom_decontam", bloomDecontam, None),
  )
}
