package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for LLM training-data pipelines.
  *
  * These generalize the reference's record-level string handling (regex
  * extraction `/root/reference/src/handlers.py:32`, validation predicates
  * `src/handlers.py:82-83`) to corpus-scale operators: tokenization,
  * portable content hashing, shingling, quality features.
  *
  * Everything is built from codegen'd `org.apache.spark.sql.functions` —
  * no UDFs — so whole-stage codegen spans the entire map side and the
  * operators vectorize over 100 TB of documents unchanged.
  */
object TextOps {

  /** Whitespace tokenization. At scale this is a narrow map — no shuffle. */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** Normalized text: lowercase, collapsed internal whitespace, trimmed.
    * The canonical form fed to fingerprints and shingles so that
    * whitespace-only variants dedup together. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Deterministic, engine-portable 32-bit hash: first 8 hex chars of md5
    * as a BIGINT in [0, 2^32). Identical value is computable in DuckDB as
    * `CAST('0x' || substr(md5(x),1,8) AS BIGINT)` — the property the
    * oracle-parity of every hashing query (minhash, simhash, fingerprint)
    * rests on. md5 is codegen'd in Spark (no UDF). */
  def portableHash(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("bigint")

  /** Deterministic 1e4-bucket assignment for coordinated sampling —
    * THE one definition of the hash-mod discipline every sampler keys
    * on (curation keep-rate, temperature resample, mixture fractional
    * pass): bucket(prefix, key) = portableHash(prefix||key) mod 10000,
    * compared against a per-stratum rate×1e4 threshold. The prefix
    * namespaces samplers so their decisions are independent; the same
    * (prefix, key) always lands in the same bucket — retry-stable and
    * coordinated across tables. DuckDB twin:
    * `CAST('0x'||substr(md5(prefix||key),1,8) AS BIGINT) % 10000`. */
  def hashBucket(prefix: String, key: Column): Column =
    pmod(portableHash(concat(lit(prefix), key.cast("string"))), lit(10000L))

  /** Adjacent-bigram structs over a token-array column: one array pass
    * (no positional self-join), elements named (tok, nxt). THE one
    * definition both the corpus bigram LM (q_ngram_lm) and the CCNet
    * score table (lmScoresTable) extract with — the scorer's totality
    * invariant ("every observed doc bigram exists in the corpus LM")
    * holds BECAUSE both sides run this same expression. Callers filter
    * size(ts) > 1 first (a 1-token doc has no bigrams). */
  def bigrams(ts: Column): Column =
    transform(sequence(lit(1), size(ts) - 1),
      i => struct(element_at(ts, i).as("tok"),
        element_at(ts, i + 1).as("nxt")))

  /** Character n-gram shingles as an array column, via sequence +
    * transform (codegen'd; no explode until the caller wants one row per
    * shingle). Texts shorter than n yield the whole text as a single
    * shingle.
    *
    * Pass a PLAIN COLUMN (materialize `normalize` with a withColumn
    * first): an expression argument is inlined into the per-element
    * lambda and re-evaluated once per shingle — a normalize regex here
    * turns into |text| regex runs per document (measured 4× overall
    * slowdown on the ngram dedup bench). */
  def charShingles(text: Column, n: Int): Column =
    transform(
      sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
      i => text.substr(i, lit(n)))

  /** Count of BPE-ish tokens: alpha runs, digit runs, and single
    * non-alphanumeric marks — the standard pre-tokenizer regex shape. */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"))

  /** Exact stopword occurrence count over a token array (integer
    * arithmetic — exact parity across engines). */
  def stopwordCount(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => t.isin(stopwords.map(_.asInstanceOf[Any]): _*)))

  /** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken 2003)
    * over a frame carrying `doc_id` and a token-array column `ts`:
    * K-token gram hashes, min per sliding window of W with the
    * rightmost-tie rule, distinct selected (position, fingerprint) rows.
    * Shared by `q_winnow` (the corpus query) and the property spec,
    * which drives synthetic documents through the SAME code to pin the
    * paper's guarantees (common fingerprint for any shared ≥ W+K−1
    * token run; ≤ 2/(W+1) selection density). The min-with-rightmost-tie
    * is ONE window min over the packed key gh·2²¹ + (2²¹−1−pos): gram
    * hashes are 32-bit, positions < 2²¹, so key order is (hash asc,
    * pos desc) and the packing is reproducible in SQL (q_winnow's
    * oracle decodes the identical key). */
  def winnowSelect(docs: org.apache.spark.sql.DataFrame, K: Int, W: Int)
      : org.apache.spark.sql.DataFrame = {
    val M = 1L << 21
    val grams = docs
      .filter(size(col("ts")) >= K)
      .select(col("doc_id"), (size(col("ts")) - (K - 1)).as("n_grams"),
        posexplode(transform(sequence(lit(1), size(col("ts")) - (K - 1)),
          i => portableHash(concat_ws(" ", slice(col("ts"), i, lit(K)))))))
      .select(col("doc_id"), col("n_grams"),
        (col("pos") + 1).as("pos"), col("col").as("gh"))
    val wspec = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow, W - 1)
    grams
      .withColumn("selkey",
        min(col("gh") * M + (lit(M - 1) - col("pos"))).over(wspec))
      .filter(col("pos") <= greatest(lit(1), col("n_grams") - (W - 1)))
      .select(col("doc_id"),
        (lit(M - 1) - pmod(col("selkey"), lit(M))).cast("int").as("sel_pos"),
        expr(s"selkey div $M").as("fp"))
      .distinct()
  }
}
