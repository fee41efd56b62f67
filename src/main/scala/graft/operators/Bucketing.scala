package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.sources.Tables

/** Bucketed-table layout — the co-located-join technique that deletes
  * the shuffle from a large⋈large equi-join: both sides are written
  * ONCE, hash-clustered into the same number of buckets on their join
  * key, and every subsequent join on that key reads matching buckets
  * pairwise with NO Exchange on either side (Spark recognizes the
  * scan's `HashPartitioning` as satisfying the join's distribution
  * requirement). At 100 TB this converts the nightly fact⋈fact join
  * from the cluster's largest shuffle into a partition-local merge —
  * the layout cost is paid once per snapshot, amortized over every
  * downstream query.
  *
  * Each side is `repartition(N, key)` before the write so every bucket
  * is exactly ONE file — the layout a downstream engine can trust for
  * sorted-scan reads (Spark itself re-sorts within the partition unless
  * the legacy `bucketedTableScan.outputOrdering` flag is set; the
  * Exchange, which is the cost that matters at scale, is gone either
  * way, and PlanSpec pins exactly that).
  *
  * The written LAYOUT is a content-tag-keyed persisted artifact
  * (round-10; previously per-JVM under a fresh temp dir, so every
  * driver run re-paid the two bucketed writes): the file trees build
  * once per corpus snapshot through the `Sinks.artifact` protocol and
  * survive across JVMs — only the catalog REGISTRATION (a `CREATE
  * TABLE … CLUSTERED BY … LOCATION` over the existing files, pure
  * metadata) is per-session. Bucket identity lives in the bucketed
  * part-file names, which the tree rename preserves byte-for-byte, so
  * a re-registered table scans with full bucketing info — PlanSpec's
  * zero-Exchange pin holds on the served path. [[evict]] is the
  * END-of-run / test-teardown hook that drops the catalog entries for
  * leak accounting; the artifact tree stays (the age-gated sweep owns
  * its lifecycle, like every other content-keyed store).
  */
object Bucketing {

  val NumBuckets = 8

  /** Memoized (li table, ord table) per (application, dataset dir) —
    * the registration, not the files. The build runs under a lock:
    * `TrieMap.getOrElseUpdate` does not guarantee a single evaluation
    * of the thunk, and two sessions of one application racing would
    * double-issue the same CREATE TABLE names. */
  private val built =
    scala.collection.mutable.Map.empty[(String, String), (String, String)]

  /** Returns catalog table names `(lineitemBucketed, ordersBucketed)`,
    * building the persisted layout on first use for this snapshot and
    * registering it on first use in this session. */
  def bucketedJoinTables(s: SparkSession, d: String): (String, String) =
    built.synchronized {
      built.getOrElseUpdate((s.sparkContext.applicationId, d), {
        val tag = java.lang.Long.toHexString(
          java.util.UUID.nameUUIDFromBytes(d.getBytes("UTF-8"))
            .getMostSignificantBits & Long.MaxValue)
        val li = s"graft_li_bkt_$tag"
        val ord = s"graft_ord_bkt_$tag"
        val root = Sinks.artifact("bucketed", d) { p =>
          // bucketBy REQUIRES saveAsTable — write through a throwaway
          // catalog name pointed at the build tree, then drop the
          // entry (external table: the files remain)
          def buildOne(df: org.apache.spark.sql.DataFrame, key: String,
              sub: String): Unit = {
            val tmpName = s"${sub}_build_$tag"
            df.repartition(NumBuckets, col(key))
              .write.mode("overwrite").format("parquet")
              .bucketBy(NumBuckets, key).sortBy(key)
              .option("path", s"$p/$sub").saveAsTable(tmpName)
            s.sql(s"DROP TABLE IF EXISTS $tmpName")
          }
          buildOne(Tables.lineitem(s, d)
            .select(col("l_orderkey"), col("l_quantity"),
              col("l_extendedprice"), col("l_discount")), "l_orderkey", "li")
          buildOne(Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderpriority")),
            "o_orderkey", "ord")
        }
        // metadata-only registration of the served trees: schema from
        // one footer read, bucket spec re-declared — Spark maps files
        // to buckets by their (preserved) bucketed part-file names
        def register(name: String, sub: String, key: String): Unit = {
          val path = s"$root/$sub"
          val ddl = s.read.parquet(path).schema.toDDL
          s.sql(s"DROP TABLE IF EXISTS $name")
          s.sql(s"CREATE TABLE $name ($ddl) USING parquet " +
            s"CLUSTERED BY ($key) SORTED BY ($key) INTO $NumBuckets BUCKETS " +
            s"LOCATION '$path'")
        }
        register(li, "li", "l_orderkey")
        register(ord, "ord", "o_orderkey")
        (li, ord)
      })
    }

  /** End-of-run/test-teardown hook: drop this application's catalog
    * entries and memo so cache/leak accounting ends at zero. The
    * persisted layout tree is NOT deleted — it is a content-keyed
    * once-per-snapshot artifact served across JVMs. NOT called between
    * bench passes. */
  def evict(s: SparkSession): Unit = built.synchronized {
    // drops happen INSIDE the lock: the table names are deterministic
    // per dataset, so an evict whose DROPs ran after releasing the lock
    // could race a concurrent re-registration of the same names and
    // drop the fresh entries while the memo still returned them
    val appId = s.sparkContext.applicationId
    built.keys.filter(_._1 == appId).toSeq
      .flatMap(built.remove)
      .foreach { case (li, ord) =>
        s.sql(s"DROP TABLE IF EXISTS $li")
        s.sql(s"DROP TABLE IF EXISTS $ord")
      }
  }
}
