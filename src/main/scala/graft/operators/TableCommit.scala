package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Minimal ATOMIC COMMIT protocol for the engine's mutable partitioned
  * tables (round-8 verdict item 4) — the "table format's commit
  * protocol" rung that `n_merge_apply` and `n_stream_upsert` scaladocs
  * named as their one missing piece: a dynamic-partition swap deletes
  * and renames files non-atomically, so a reader racing a writer could
  * observe a torn table (some partitions old, some new, some absent).
  *
  * The protocol is the core of what Delta/Iceberg buy, reduced to its
  * load-bearing minimum (public design: Armbrust et al., "Delta Lake:
  * High-Performance ACID Table Storage", VLDB 2020 — an ordered log of
  * atomically-published snapshots over immutable data files):
  *
  *  - Data files are IMMUTABLE once written; a mutation only ADDS files
  *    (`mode("append")` writes fresh uniquely-named part files).
  *  - A SNAPSHOT is a manifest file under `_manifests/manifest-<id>`:
  *    the list of relative data-file paths that constitute the table.
  *    Manifests are published with write-temp-then-ATOMIC_MOVE, so a
  *    manifest either exists completely or not at all.
  *  - Readers resolve the newest manifest and read EXACTLY its files —
  *    a pinned snapshot that no concurrent commit can tear.
  *  - Partition replacement = append the replacement rows, then commit
  *    a manifest that carries (previous files outside the dirty
  *    partitions) ∪ (the files the append just created). Clean
  *    partitions' files are never touched — the bounded-write-
  *    amplification contract is unchanged.
  *  - VACUUM runs inside the commit: files referenced only by
  *    manifests older than the previous one are deleted (readers get a
  *    one-generation grace window — the retention contract), as are
  *    never-referenced orphans from aborted appends once they are an
  *    hour old (a concurrent in-flight append's fresh files are
  *    younger and survive).
  *
  * Single-writer-per-table, many-reader — the deployment shape both
  * call sites have (one maintenance job mutates; serving reads). On a
  * cluster the ATOMIC_MOVE becomes the object store's
  * put-if-absent/rename primitive; everything else is unchanged. */
object TableCommit {

  private val ManifestDir = "_manifests"
  private val lock = new Object

  private def manifestDir(table: String) = new java.io.File(table, ManifestDir)

  private val ManifestName = "manifest-([0-9]{9})".r

  /** All (id, file) manifests present, unordered. */
  private def manifests(table: String): Seq[(Long, java.io.File)] =
    Option(manifestDir(table).listFiles()).getOrElse(Array.empty).toSeq
      .flatMap(f => f.getName match {
        case ManifestName(id) => Some(id.toLong -> f)
        case _ => None
      })

  private def filesOf(f: java.io.File): Seq[String] =
    new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      .linesIterator.filter(_.nonEmpty).toSeq

  /** Newest snapshot: (manifest id, relative data-file paths). */
  def resolve(table: String): Option[(Long, Seq[String])] =
    manifests(table).sortBy(-_._1).headOption.map { case (id, f) =>
      id -> filesOf(f)
    }

  /** Relative paths of all data files under `table` (manifest dir,
    * markers and hidden files excluded). */
  private def listDataFiles(table: String): Seq[String] = {
    val root = new java.io.File(table)
    def walk(f: java.io.File, rel: String): Seq[String] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).toSeq
          .filterNot(c => c.getName.startsWith("_") || c.getName.startsWith("."))
          .flatMap(c => walk(c, if (rel.isEmpty) c.getName else s"$rel/${c.getName}"))
      else Seq(rel)
    walk(root, "")
  }

  /** Publish `files` as manifest `id` — atomic via temp + ATOMIC_MOVE. */
  private def publish(table: String, id: Long, files: Seq[String]): Unit = {
    val dir = manifestDir(table)
    dir.mkdirs()
    val tmp = new java.io.File(dir, f".manifest-$id%09d.tmp")
    java.nio.file.Files.write(tmp.toPath,
      files.sorted.mkString("", "\n", "\n").getBytes("UTF-8"))
    java.nio.file.Files.move(tmp.toPath,
      new java.io.File(dir, f"manifest-$id%09d").toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Ensure the table has a snapshot: if no manifest exists yet,
    * publish manifest-0 listing the current tree (adopting a table
    * written by a plain batch writer into the protocol). */
  def initIfAbsent(table: String): Unit = lock.synchronized {
    if (manifests(table).isEmpty) publish(table, 0L, listDataFiles(table))
  }

  /** Snapshot read: the newest manifest's files, pinned — immune to a
    * concurrent commit. Falls back to a plain directory read for a
    * table that predates the protocol. basePath keeps the partition
    * directories' columns in the schema. */
  def read(s: SparkSession, table: String): DataFrame =
    resolve(table) match {
      case Some((_, files)) =>
        s.read.option("basePath", table)
          .parquet(files.map(f => s"$table/$f"): _*)
      case None => s.read.parquet(table)
    }

  /** TIME-TRAVEL read: the snapshot as of manifest `id` — available
    * while the manifest is inside the retention window (newest and
    * newest−1; older snapshots are vacuumed). The capability a
    * manifest log gives for free: an auditor or a slow consumer pins a
    * specific committed state instead of "whatever is newest". */
  def readAt(s: SparkSession, table: String, id: Long): DataFrame =
    manifests(table).find(_._1 == id) match {
      case Some((_, f)) =>
        s.read.option("basePath", table)
          .parquet(filesOf(f).map(p => s"$table/$p"): _*)
      case None => sys.error(
        s"snapshot $id of $table is outside the retention window")
    }

  /** First path segment of a relative data-file path — its partition
    * directory (`pt=5/part-x.parquet` → `pt=5`). */
  private def partDir(rel: String): String = rel.takeWhile(_ != '/')

  /** Atomically replace the contents of `dirtyDirs` (partition-dir
    * names like `pt=5`) with `df`'s rows: append `df` as fresh files,
    * commit a manifest carrying the previous snapshot minus the dirty
    * partitions plus the fresh files, then vacuum past-retention
    * generations. `df` must hold ONLY rows of the dirty partitions. */
  def replacePartitions(s: SparkSession, table: String, partCol: String,
      dirtyDirs: Seq[String], df: DataFrame): Unit = {
    initIfAbsent(table)
    val (prevId, prevFiles) = resolve(table).get
    val before = listDataFiles(table).toSet
    // the append's inputs may include the table's own current snapshot
    // (a merge reads prev state); that is safe by construction — the
    // snapshot's files are immutable and the append only creates new ones
    df.repartition(col(partCol))
      .write.mode("append").partitionBy(partCol).parquet(table)
    val fresh = listDataFiles(table).filterNot(before)
    val dirty = dirtyDirs.toSet
    lock.synchronized {
      val next = prevFiles.filterNot(f => dirty.contains(partDir(f))) ++ fresh
      publish(table, prevId + 1, next)
      vacuum(table, prevId + 1)
    }
  }

  /** Retention: keep manifests `newest` and `newest - 1`; delete older
    * manifests and every data file only they referenced, plus
    * never-referenced orphans (aborted appends) older than an hour. */
  private def vacuum(table: String, newest: Long): Unit = {
    val all = manifests(table)
    val (keepM, dropM) = all.partition(_._1 >= newest - 1)
    def filesOf(ms: Seq[(Long, java.io.File)]): Set[String] =
      ms.flatMap { case (_, f) =>
        new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
          .linesIterator.filter(_.nonEmpty)
      }.toSet
    val live = filesOf(keepM)
    val cutoff = System.currentTimeMillis() - 60L * 60 * 1000
    val dead = filesOf(dropM) -- live
    dead.foreach(f => new java.io.File(table, f).delete())
    // orphans: on-disk data files no kept manifest references — an
    // aborted append's leftovers — swept once stale
    (listDataFiles(table).toSet -- live -- dead)
      .map(f => new java.io.File(table, f))
      .filter(f => f.lastModified() < cutoff)
      .foreach(_.delete())
    dropM.foreach(_._2.delete())
  }
}
