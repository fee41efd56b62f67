package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** The REAL-FILESYSTEM binding of the storage seam (round-13 verdict
  * item 3): [[TableStore]] implemented over Hadoop's `FileSystem`
  * API — the one storage interface Spark itself addresses every
  * scheme through (`file://`, `hdfs://`, `s3a://`, `abfs://`,
  * `gs://`) — so pointing a table root at any Hadoop-resolvable URI
  * binds the whole commit protocol to that store with ZERO protocol
  * changes. [[S3SemanticsStore]] is the in-memory template this
  * adapter realizes; the TableStoreSpec matrix (commits, OCC races,
  * DML, MERGE, restore, clone, vacuum, streaming ledger) runs green
  * over it on `file://` (HadoopStoreSpec).
  *
  * THE COMMIT CAS, per scheme family — the one primitive whose
  * atomicity is an adapter property, never a protocol assumption:
  *
  *  - `file` (and any [[org.apache.hadoop.fs.ChecksumFileSystem]]
  *    over POSIX): write-temp-then-HARD-LINK via NIO, exactly
  *    [[LocalTableStore]]'s EEXIST-atomic arbitration. POSIX
  *    rename(2) silently REPLACES an existing destination, so
  *    Hadoop's local `rename` cannot arbitrate a race — the link is
  *    the only local primitive that can.
  *  - rename-no-overwrite stores (`hdfs`, `abfs`, `viewfs`):
  *    write-temp-then-RENAME. Their rename is atomic in the
  *    namenode/metadata service and FAILS when the destination
  *    exists — a true CAS, and the temp write keeps a partial
  *    manifest from ever being visible under the final name
  *    (create-exclusive alone could not: bytes trickle in after the
  *    namenode grants the name).
  *  - conditional-PUT stores (`s3a`, `gs`): the correct primitive is
  *    the store's own `If-None-Match: *` / `ifGenerationMatch=0` PUT
  *    (one atomic object creation, no partial visibility by
  *    construction). Hadoop's generic API only exposes it from
  *    3.4.1's conditional-create `createFile().must(...)` options;
  *    PROTOCOL.md §11 documents the exact mapping, and
  *    [[S3SemanticsStore]] pins its semantics executable. Until a
  *    deployment enables it, `s3a` routes through the rename path,
  *    which S3A implements as HEAD + COPY + DELETE — NOT atomic
  *    under contention; [[putManifestIfAbsent]] therefore REFUSES
  *    schemes not on the [[RenameNoOverwriteSchemes]] allowlist
  *    unless `graft.store.hadoop.trustRename` says otherwise, so a
  *    misconfigured deployment fails loudly instead of losing a
  *    commit arbitration silently.
  *
  * Checksum note: `file://` resolves to Hadoop's ChecksumFileSystem,
  * which shadows every object with a `.crc` twin; this adapter
  * unwraps to the RAW filesystem (bytes are bytes — the object-store
  * semantics the seam promises), which also keeps the link CAS sound
  * (a linked manifest has no `.crc`, and a stale one would fail
  * verification). */
final class HadoopFsTableStore(conf: Configuration) extends TableStore {

  /** Schemes whose `FileSystem.rename` is atomic AND fails (returns
    * false) on an existing destination — the rename-CAS allowlist. */
  private val RenameNoOverwriteSchemes = Set("hdfs", "abfs", "abfss", "viewfs")

  private def fsOf(p: Path): FileSystem = p.getFileSystem(conf) match {
    case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
    case fs => fs
  }

  private def manifestPath(table: String, id: Long): Path =
    new Path(new Path(table, "_manifests"), f"manifest-$id%09d")

  private val ManifestName = "manifest-([0-9]{9})".r

  private def isLocal(p: Path): Boolean = {
    val s = fsOf(p).getUri.getScheme
    s == null || s == "file"
  }

  /** The local java.io twin of a `file`-scheme Hadoop path. */
  private def localFile(p: Path): java.io.File =
    new java.io.File(p.toUri.getPath)

  override def listManifestIds(table: String): Seq[Long] = {
    val dir = new Path(table, "_manifests")
    val fs = fsOf(dir)
    try fs.listStatus(dir).toSeq.flatMap(_.getPath.getName match {
      case ManifestName(id) => Some(id.toLong)
      case _ => None
    })
    catch { case _: java.io.FileNotFoundException => Seq.empty }
  }

  override def manifestIdentity(table: String, id: Long): Option[String] = {
    val p = manifestPath(table, id)
    if (isLocal(p))
      // POSIX: the (inode, size, mtime) triple — ms-granularity mtime
      // alone could alias a sub-millisecond drop-and-recreate
      try {
        val attrs = java.nio.file.Files.readAttributes(localFile(p).toPath,
          classOf[java.nio.file.attribute.BasicFileAttributes])
        Some(s"${attrs.fileKey()}#${attrs.size()}#" +
          s"${attrs.lastModifiedTime().toMillis}")
      } catch { case _: java.io.IOException => None }
    else
      try {
        val st = fsOf(p).getFileStatus(p)
        // object stores carry a content identity (the ETag /
        // generation) on the status — use it when present
        val etag = st match {
          case e: org.apache.hadoop.fs.EtagSource
            if e.getEtag != null && e.getEtag.nonEmpty => s"#${e.getEtag}"
          case _ => ""
        }
        Some(s"${st.getLen}#${st.getModificationTime}$etag")
      } catch { case _: java.io.FileNotFoundException => None }
  }

  override def readManifest(table: String, id: Long): String = {
    val p = manifestPath(table, id)
    val in = fsOf(p).open(p)
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      new String(bos.toByteArray, "UTF-8")
    } finally in.close()
  }

  override def putManifestIfAbsent(table: String, id: Long,
      content: String): Boolean = {
    val dst = manifestPath(table, id)
    val fs = fsOf(dst)
    val dir = dst.getParent
    fs.mkdirs(dir)
    val tmp = new Path(dir, f".manifest-$id%09d." +
      java.util.UUID.randomUUID().toString.take(8))
    val out = fs.create(tmp, false)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    try {
      if (isLocal(dst)) {
        // POSIX arbitration: hard-link create is EEXIST-atomic
        try {
          java.nio.file.Files.createLink(localFile(dst).toPath,
            localFile(tmp).toPath)
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      } else {
        val scheme = fs.getUri.getScheme
        require(RenameNoOverwriteSchemes.contains(scheme) ||
          conf.getBoolean("graft.store.hadoop.trustRename", false),
          s"scheme '$scheme' has no rename-no-overwrite contract — its " +
            "rename cannot arbitrate the commit CAS (S3A without " +
            "conditional writes is HEAD+COPY+DELETE). Use the store's " +
            "conditional PUT (PROTOCOL.md §11) or set " +
            "graft.store.hadoop.trustRename=true if this scheme's rename " +
            "really fails on an existing destination.")
        // rename-no-overwrite CAS: atomic in the metadata service,
        // false when the destination exists
        !fs.exists(dst) && fs.rename(tmp, dst)
      }
    } finally {
      // losing (or linked-from) temp never lingers
      try fs.delete(tmp, false) catch { case _: java.io.IOException => }
    }
  }

  override def deleteManifest(table: String, id: Long): Unit = {
    val p = manifestPath(table, id)
    val fs = fsOf(p)
    try fs.delete(p, false) catch { case _: java.io.FileNotFoundException => }
    // columnar sidecars ride with their manifest (any incarnation's)
    val dir = new Path(table, "_manifests")
    val stem = f".ckpt-$id%09d-"
    try fs.listStatus(dir).foreach { st =>
      if (st.getPath.getName.startsWith(stem)) fs.delete(st.getPath, false)
    } catch { case _: java.io.FileNotFoundException => }
  }

  override def sidecarPath(table: String, id: Long,
      identity: String): Option[String] =
    Some(new Path(new Path(table, "_manifests"),
      f".ckpt-$id%09d-${CheckpointSidecar.identityDigest(identity)}.parquet")
      .toString)

  override def sidecarExists(path: String): Boolean = {
    val p = new Path(path)
    try fsOf(p).getFileStatus(p).isFile
    catch { case _: java.io.FileNotFoundException => false }
  }

  override def listFilesUnder(table: String, relDir: String): Seq[String] = {
    val root = if (relDir.isEmpty) new Path(table) else new Path(table, relDir)
    val fs = fsOf(root)
    val out = Seq.newBuilder[String]
    val rootUriPath = root.toUri.getPath.stripSuffix("/")
    try {
      val it = fs.listFiles(root, true)
      while (it.hasNext) {
        val st = it.next()
        val full = st.getPath.toUri.getPath
        val sub = full.stripPrefix(rootUriPath).stripPrefix("/")
        // hidden segments BELOW the listing root only — the local
        // adapter's exact semantics (a staging dir lists its own
        // contents even though its own name is '_'-prefixed)
        if (sub.nonEmpty && sub.split('/').forall(seg =>
            !seg.startsWith("_") && !seg.startsWith(".")))
          out += (if (relDir.isEmpty) sub else s"$relDir/$sub")
      }
    } catch { case _: java.io.FileNotFoundException => }
    out.result()
  }

  override def listSubdirs(table: String, relDir: String): Seq[(String, Long)] = {
    val dir = if (relDir.isEmpty) new Path(table) else new Path(table, relDir)
    val fs = fsOf(dir)
    try fs.listStatus(dir).toSeq.filter(_.isDirectory)
      .map(st => st.getPath.getName -> st.getModificationTime)
    catch { case _: java.io.FileNotFoundException => Seq.empty }
  }

  override def fileMtime(table: String, rel: String): Long = {
    val p = new Path(table, rel)
    try fsOf(p).getFileStatus(p).getModificationTime
    catch { case _: java.io.FileNotFoundException => 0L }
  }

  override def fileSize(table: String, rel: String): Long = {
    val p = new Path(table, rel)
    try fsOf(p).getFileStatus(p).getLen
    catch { case _: java.io.FileNotFoundException => 0L }
  }

  override def deleteFile(table: String, rel: String): Unit = {
    val p = new Path(table, rel)
    try fsOf(p).delete(p, false)
    catch { case _: java.io.FileNotFoundException => }
  }

  override def moveFile(table: String, fromRel: String, toRel: String): Unit = {
    val from = new Path(table, fromRel)
    val to = new Path(table, toRel)
    val fs = fsOf(from)
    fs.mkdirs(to.getParent)
    // toRel never pre-exists (writer-unique names) — plain rename
    // suffices; object-store adapters implement it as COPY+DELETE
    require(fs.rename(from, to), s"move $fromRel -> $toRel failed")
  }

  override def deleteTree(table: String, relDir: String): Unit = {
    val p = new Path(table, relDir)
    try fsOf(p).delete(p, true)
    catch { case _: java.io.FileNotFoundException => }
  }

  override def shareFile(srcTable: String, rel: String,
      dstTable: String): Unit = {
    val from = new Path(srcTable, rel)
    val to = new Path(dstTable, rel)
    val (sfs, dfs) = (fsOf(from), fsOf(to))
    if (isLocal(from) && isLocal(to)) {
      // same-POSIX-store: the zero-copy hard link, degrading to a
      // copy across filesystems (LocalTableStore's contract)
      val lf = localFile(from)
      val lt = localFile(to)
      lt.getParentFile.mkdirs()
      try java.nio.file.Files.createLink(lt.toPath, lf.toPath)
      catch {
        case _: UnsupportedOperationException | _: java.io.IOException =>
          java.nio.file.Files.copy(lf.toPath, lt.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    } else {
      // object stores have no cross-object links: server-side COPY
      dfs.mkdirs(to.getParent)
      org.apache.hadoop.fs.FileUtil.copy(sfs, from, dfs, to,
        false /* deleteSource */, true /* overwrite */, conf)
    }
  }
}
