package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet testdata (TESTDATA.md).
  *
  * Maps the reference's event sources (SURVEY.md §2 R1/R2 —
  * `/root/reference/src/handlers.py:20,69`) onto columnar parquet scans: the
  * schema-on-read JSON event stream becomes `events.parquet` with a JSON
  * `props` column, and the relational tables stand in for enrichment dims
  * (R12/R13, `/root/reference/common/aws_utils/ssm.py:46-101`).
  *
  * At 100 TB these would be partitioned/bucketed external tables; the loader
  * keeps the API a plain scan so Catalyst can push filters and prune columns
  * into the parquet reader.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Resolved-relation memo (optimization r15): `spark.read.parquet`
    * lists the path and reads a footer for schema EVERY call, and the
    * bench invokes each loader hundreds of times per run — pure fixed
    * metadata overhead re-deriving an identical immutable relation.
    * The memo returns the SAME analyzed frame per (session, dir, name);
    * queries compose new operators on top, so plans are unchanged —
    * this caches relation METADATA, never data or results.
    *
    * Keyed by the SESSION OBJECT in a WeakHashMap (ADVICE r15): an
    * identity-hash key could alias a new session onto a stopped one's
    * frames after GC, and entries were never evicted — weak keys make
    * dead-session entries uncollectable to alias and collectable by
    * GC. SparkSession does not override equals, so WeakHashMap lookup
    * is reference identity. */
  private val frameCache = new java.util.WeakHashMap[SparkSession,
    scala.collection.concurrent.TrieMap[(String, String), DataFrame]]()

  private def cacheFor(spark: SparkSession)
      : scala.collection.concurrent.TrieMap[(String, String), DataFrame] =
    frameCache.synchronized {
      var m = frameCache.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty
        frameCache.put(spark, m)
      }
      m
    }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cacheFor(spark).getOrElseUpdate((sfDir, name),
      spark.read.parquet(s"$sfDir/$name.parquet"))

  /** Normalize `events.ts` to session-TZ `TIMESTAMP` across the schemas the
    * driver has generated so far — adapt to what the file actually holds
    * rather than assuming a generation:
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it, so read as a
    *    raw long (legacy nanosAsLong) and rebuild a microsecond timestamp
    *    with integer division (values are µs-aligned → lossless; integer div
    *    keeps full precision where a double's 53-bit mantissa would not).
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): reads as TIMESTAMP_NTZ;
    *    cast to TIMESTAMP. The session TZ is pinned to UTC everywhere
    *    (Bench/Verify/specs), so the cast re-tags the same wall-clock
    *    micros — identical epoch values to the NANOS path.
    *  - TIMESTAMP: already what downstream expects. */
  /** Normalized events frames, one per (session, dir): the conf-scoped
    * load below is NOT safe to run concurrently (two threads' set/
    * restore of a shared session conf interleave — the bench's
    * concurrent pre-build chains all touch events), so the load runs
    * once under a lock and every caller shares the resulting frame. */
  private val eventsCache = new java.util.WeakHashMap[SparkSession,
    scala.collection.concurrent.TrieMap[String, DataFrame]]()
  private val eventsLock = new Object

  private def eventsWithTs(spark: SparkSession, sfDir: String): DataFrame =
    eventsLock.synchronized {
      val perSession = {
        var m = eventsCache.get(spark)
        if (m == null) {
          m = scala.collection.concurrent.TrieMap.empty
          eventsCache.put(spark, m)
        }
        m
      }
      perSession.getOrElseUpdate(sfDir, {
          import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
          import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
          // nanosAsLong is scoped to THIS load, then restored: leaving
          // it set session-wide would silently read any FUTURE source's
          // TIMESTAMP(NANOS) column as raw longs, with the schema
          // depending on whether an events query ran first. The conf is
          // consumed at load time (schema resolution), so restoring
          // here does not affect the frame's later execution — the
          // genuine-NANOS fixture spec pins exactly that.
          val key = "spark.sql.legacy.parquet.nanosAsLong"
          val prev = spark.conf.getOption(key)
          val df =
            try { spark.conf.set(key, "true"); load(spark, sfDir, "events") }
            finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
          df.schema("ts").dataType match {
            case LongType =>
              df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
            case TimestampNTZType =>
              df.withColumn("ts", col("ts").cast(TimestampType))
            case _ => df
          }
        })
    }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = eventsWithTs(s, d)
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
