package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** INCREMENTAL MATERIALIZED-VIEW MAINTENANCE over the commit protocol —
  * the consumer side of the CDC feed ([[TableCommit.changesSince]]'s
  * scaladoc names this as its purpose): keep a derived aggregate table
  * in sync with a committed source by processing each sync cycle ONLY
  * the manifest diff, never the source. The public design is the
  * self-maintainable-view rule of incremental view maintenance (Gupta &
  * Mumick, "Maintenance of Materialized Views", IEEE DE Bulletin 1995)
  * specialized to a partitioned log: per partition, a source commit is
  * either
  *
  *  - APPEND-ONLY (files added, none removed) → the view folds
  *    `aggregate(added files)` into its current state with `combine` —
  *    work ∝ the commit's write set; or
  *  - A REWRITE (replace / compact / delete / update removed files) →
  *    in-place row changes are not expressible as a delta against a
  *    distributive aggregate, so the view RECOMPUTES exactly the
  *    affected partitions from the newest snapshot (a partition-pruned
  *    file-subset read) — work ∝ the rewritten partitions; or
  *  - DELETION-VECTOR GROWTH ONLY (a merge-on-read delete/update
  *    vectored rows dead, no file removed) → with a caller-provided
  *    `retract`, the view SUBTRACTS exactly the newly-dead rows'
  *    contribution ([[TableCommit.dvNewlyDeadRows]] — the change
  *    feed's subtractive arm) — work ∝ the DELETED rows, never the
  *    partition. This is the Gupta–Mumick differential rule for
  *    self-maintainable aggregates: count/sum (and avg as sum+count)
  *    invert under deletion; without `retract` the DV-growth commit
  *    conservatively routes to recompute, min/max-style aggregates
  *    being the non-invertible case.
  *
  * Both reads pin the source's newest manifest, so a concurrent source
  * commit cannot tear a cycle. EXACTLY-ONCE: the cycle's position (the
  * source snapshot id it synced to) commits ATOMICALLY WITH the view
  * data through the sink's writer-transaction ledger
  * (`#txn <viewName>=<sourceSnapshot>`); a replayed cycle — a scheduler
  * re-firing after a crash between commit and ack — is a structural
  * no-op, and the position can never run ahead of or behind the data it
  * describes because they are one manifest line apart in one atomic
  * publish.
  *
  * Contract on `aggregate`: rows → keyed aggregate INCLUDING `partCol`
  * (the view is co-partitioned with the source — what makes partition-
  * level routing sound). Contract on `combine`: (current view state,
  * fresh partial) → merged state over the SAME partitions — associative
  * folding of a distributive/algebraic aggregate (count/sum/min/max, or
  * avg carried as sum+count). Partition-dir names are derived from
  * `partCol` values verbatim (`pt=<value>`) — the engine's partition
  * values are plain identifiers, never needing Hive escaping. */
object IncrementalView {

  /** One sync cycle's audit — all counts manifest-derived.
    * `mode` ∈ full | incremental | noop. */
  final case class SyncAudit(mode: String, sourceSnapshot: Long,
      filesProcessed: Int, partsRecomputed: Int, partsDelta: Int,
      partsRetracted: Int = 0)

  /** `retract`: (current view state, the newly-dead source rows) → new
    * state over the same partitions — the caller aggregates the dead
    * rows, NEGATES the partial, folds it with `combine`, and drops
    * groups whose count reached zero (a recompute would not emit
    * them). Only sound for aggregates that invert under deletion. */
  def sync(s: SparkSession, source: String, sink: String, viewName: String,
      partCol: String,
      aggregate: DataFrame => DataFrame,
      combine: (DataFrame, DataFrame) => DataFrame,
      retract: Option[(DataFrame, DataFrame) => DataFrame] = None)
      : SyncAudit = {
    TableCommit.initIfAbsent(source)
    val (srcId, srcFiles) = TableCommit.resolve(source).get
    val pos = TableCommit.lastTxnVersion(sink, viewName)
    if (pos.exists(_ >= srcId))
      return SyncAudit("noop", srcId, 0, 0, 0)

    def dirsOf(df: DataFrame): Seq[String] =
      df.select(col(partCol).cast("string")).distinct()
        .collect().map(r => s"$partCol=${r.getString(0)}").toSeq

    pos.filter(p => TableCommit.history(source).exists(_._1 == p)) match {
      case Some(p) =>
        // diff p → srcId, the SAME snapshot every read below pins — a
        // concurrent source commit landing mid-sync is simply next
        // cycle's work, never a torn read
        val (added, removed) = TableCommit.changedFileSets(source, p, srcId)
        // DV-growth-only files sit on BOTH sides of the diff; with a
        // retract they fold subtractively, without one they recompute
        val dvGrew =
          if (retract.isEmpty) Set.empty[String]
          else TableCommit.dvGrewFiles(source, p, srcId).toSet
        val recomputeParts =
          removed.filterNot(dvGrew).map(TableCommit.partitionDirOf).toSet
        val deltaFiles = added.filterNot(dvGrew)
          .filterNot(f => recomputeParts(TableCommit.partitionDirOf(f)))
        val deltaParts = deltaFiles.map(TableCommit.partitionDirOf).toSet
        val retractFiles = dvGrew.toSeq.sorted
          .filterNot(f => recomputeParts(TableCommit.partitionDirOf(f)))
        val retractParts =
          retractFiles.map(TableCommit.partitionDirOf).toSet
        // rewritten partitions: recompute from the pinned newest
        // snapshot — only their files are read
        val recomputeFiles = srcFiles
          .filter(f => recomputeParts(TableCommit.partitionDirOf(f)))
        val recomputed =
          if (recomputeFiles.nonEmpty)
            Some(aggregate(
              TableCommit.readFileSubset(s, source, srcId, recomputeFiles)))
          else None
        // append-only + retract partitions: fold the added files'
        // partial into the view's CURRENT state for exactly those
        // partitions (a pinned file-subset read of the sink — no
        // partition-value decoding, the dir names route directly),
        // then subtract the newly-dead rows' contribution
        val foldParts = deltaParts ++ retractParts
        val deltaState =
          if (foldParts.nonEmpty) {
            val (sinkId, sinkFiles) = TableCommit.resolve(sink).get
            val currentFiles = sinkFiles
              .filter(f => foldParts(TableCommit.partitionDirOf(f)))
            val current =
              if (currentFiles.nonEmpty)
                TableCommit.readFileSubset(s, sink, sinkId, currentFiles)
              else
                // schema via the live read's footers — an ADOPTED
                // source has no #schema directive for an empty subset
                aggregate(TableCommit.read(s, source).limit(0))
            val afterAdd =
              if (deltaFiles.isEmpty) current
              else combine(current, aggregate(
                TableCommit.readFileSubset(s, source, srcId, deltaFiles)))
            val afterRetract =
              if (retractFiles.isEmpty) afterAdd
              else retract.get(afterAdd, TableCommit.dvNewlyDeadRows(
                s, source, p, srcId, retractFiles)
                .drop("__graft_dvk", "__graft_dvp"))
            Some(afterRetract)
          } else None
        val dirty = (recomputeParts ++ foldParts).toSeq.sorted
        if (dirty.isEmpty) {
          // a commit that only vacuumed/no-op'd: advance the position
          // with an empty replace of nothing is impossible — record via
          // a zero-partition sync being a noop next cycle instead
          return SyncAudit("noop", srcId, 0, 0, 0)
        }
        // a pure-removal commit (partition emptied, nothing added) has
        // no state rows at all — the dirty partitions simply clear
        val stateParts = recomputed.toSeq ++ deltaState.toSeq
        val state =
          if (stateParts.nonEmpty) stateParts.reduce(_ unionByName _)
          else TableCommit.read(s, sink).limit(0)
        TableCommit.replacePartitions(s, sink, partCol, dirty, state,
          txn = Some((viewName, srcId)))
        SyncAudit("incremental", srcId,
          deltaFiles.length + recomputeFiles.length + retractFiles.length,
          recomputeParts.size, deltaParts.size, retractParts.size)
      case None =>
        // first sync, or the position left the retention window (the
        // consumer fell too far behind to diff) — full rebuild
        val full = aggregate(TableCommit.readAt(s, source, srcId))
        val sinkDirs = TableCommit.resolve(sink)
          .map(_._2.map(TableCommit.partitionDirOf).distinct)
          .getOrElse(Seq.empty)
        val dirty = (sinkDirs ++ dirsOf(full)).distinct.sorted
        TableCommit.replacePartitions(s, sink, partCol, dirty, full,
          txn = Some((viewName, srcId)))
        SyncAudit("full", srcId, srcFiles.length, 0, dirty.length)
    }
  }
}
