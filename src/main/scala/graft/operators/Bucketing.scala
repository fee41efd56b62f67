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
  * The written tables are memoized per (application, dataset dir) —
  * the once-per-snapshot artifact contract (ModelStore, dedup pair
  * table): the layout survives bench passes, pass 1 pays (and its
  * verbatim per-pass map shows) the build, and the steady-state number
  * is the zero-Exchange join itself. [[evict]] is the END-of-run /
  * test-teardown hook that drops the catalog entries and files for
  * leak accounting.
  */
object Bucketing {

  val NumBuckets = 8

  /** Memoized (li table, ord table, external dir) per (application,
    * dataset dir). The dir lives INSIDE the memoized value (not a second
    * map) so evict always sees exactly the tree its entry owns, and the
    * build runs under a lock: `TrieMap.getOrElseUpdate` does not
    * guarantee a single evaluation of the thunk, and two sessions of one
    * application racing the build would double-write the same catalog
    * table names and orphan one temp directory. Builds are
    * once-per-snapshot, so the coarse lock costs nothing. */
  private val built =
    scala.collection.mutable.Map.empty[(String, String), (String, String, String)]

  /** Returns catalog table names `(lineitemBucketed, ordersBucketed)`,
    * writing them on first use for this (application, dir). */
  def bucketedJoinTables(s: SparkSession, d: String): (String, String) = {
    val (li, ord, _) = built.synchronized {
      built.getOrElseUpdate((s.sparkContext.applicationId, d), {
        val tag = java.lang.Long.toHexString(
          java.util.UUID.nameUUIDFromBytes(d.getBytes("UTF-8"))
            .getMostSignificantBits & Long.MaxValue)
        val li = s"graft_li_bkt_$tag"
        val ord = s"graft_ord_bkt_$tag"
        val base = java.nio.file.Files
          .createTempDirectory("graft_bucketed").toFile.getAbsolutePath
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_quantity"),
            col("l_extendedprice"), col("l_discount"))
          .repartition(NumBuckets, col("l_orderkey"))
          .write.mode("overwrite").format("parquet")
          .bucketBy(NumBuckets, "l_orderkey").sortBy("l_orderkey")
          .option("path", s"$base/$li").saveAsTable(li)
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderpriority"))
          .repartition(NumBuckets, col("o_orderkey"))
          .write.mode("overwrite").format("parquet")
          .bucketBy(NumBuckets, "o_orderkey").sortBy("o_orderkey")
          .option("path", s"$base/$ord").saveAsTable(ord)
        (li, ord, base)
      })
    }
    (li, ord)
  }

  /** End-of-run/test-teardown hook: drop this application's bucketed
    * tables and memo entries (catalog + external files) so cache/leak
    * accounting ends at zero. NOT called between bench passes — the
    * layout is a once-per-snapshot artifact (see object scaladoc). */
  def evict(s: SparkSession): Unit = built.synchronized {
    // drops happen INSIDE the lock: the table names are deterministic
    // per dataset, so an evict whose DROPs ran after releasing the lock
    // could race a concurrent rebuild of the same names and drop the
    // fresh tables while the memo still returned them
    val appId = s.sparkContext.applicationId
    built.keys.filter(_._1 == appId).toSeq
      .flatMap(built.remove)
      .foreach { case (li, ord, dir) =>
        s.sql(s"DROP TABLE IF EXISTS $li")
        s.sql(s"DROP TABLE IF EXISTS $ord")
        // the tables are EXTERNAL (option("path")) — DROP TABLE removes
        // only catalog entries; delete the files too, or a multi-pass
        // bench leaves one full copy of both projections per rebuild
        Sinks.deleteRecursively(new java.io.File(dir))
      }
  }
}
