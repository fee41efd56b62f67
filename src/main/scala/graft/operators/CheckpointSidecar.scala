package graft.operators

import scala.jdk.CollectionConverters._

/** COLUMNAR (parquet) twin of a CHECKPOINT manifest — round-11
  * verdict item 3 (Delta's parquet checkpoints, re-derived): the text
  * manifest stays the format of RECORD (it is the conditional-put CAS
  * object), and every checkpoint commit additionally publishes a
  * parquet sidecar with ONE ROW PER DATA FILE
  * (`path, n_rows, n_bytes, dv, smin/smax per stats column`) plus the non-file
  * state (schema JSON, properties, txn ledger) in the parquet footer's
  * key-value metadata — so a COLD open that needs 3 files out of 10⁶
  * reads the sidecar with a PROJECTION and a pushed row-group filter
  * instead of parsing a ~100 MB text file into per-file strings.
  *
  * Stats ride in two forms per cluster column: the EXACT strings
  * (`smin_s_*` — what reconstruction equality needs) and WIDENED
  * doubles (`smin_d_*` = nextDown(parse), `smax_d_*` = nextUp(parse))
  * for the filter predicate — double rounding may only ever KEEP an
  * extra borderline file, never exclude an overlapping one, so
  * sidecar pruning stays sound exactly like the text path's
  * BigDecimal compare. Rows are sorted by the first stats column's
  * widened min, so row groups carry tight min/max and the pushed
  * filter skips whole groups.
  *
  * FRESHNESS is structural, not best-effort: the sidecar's file name
  * embeds a digest of the text manifest's store IDENTITY token, and a
  * reader only trusts a sidecar whose name matches the identity it
  * just stat'ed — a table dropped and recreated at the same path
  * (new identity) can never serve a stale sidecar, the same
  * incarnation defence the parse memos use. Writing is best-effort
  * (acceleration, not correctness): any failure falls back to the
  * text path. */
object CheckpointSidecar {

  import org.apache.parquet.example.data.Group
  import org.apache.parquet.example.data.simple.SimpleGroupFactory
  import org.apache.parquet.schema.{MessageType, PrimitiveType, Types}
  import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
  import org.apache.parquet.schema.LogicalTypeAnnotation.stringType

  /** Digest of a store identity token, safe for a file name. */
  def identityDigest(identity: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(identity.getBytes("UTF-8")).map("%02x".format(_))
      .mkString.take(16)

  private val SchemaKey = "graft.schema"
  private val PropsKey = "graft.props"
  private val TxnsKey = "graft.txns"
  private val StatsColsKey = "graft.statscols"
  private val CdcKey = "graft.cdc"
  private val RequiresKey = "graft.requires"

  private def fieldSafe(c: String): Boolean = c.matches("[A-Za-z0-9_]+")

  private def messageType(statsCols: Seq[String]): MessageType = {
    var b = Types.buildMessage()
      .addField(Types.required(PrimitiveTypeName.BINARY).as(stringType())
        .named("path"))
      .addField(Types.optional(PrimitiveTypeName.INT64).named("n_rows"))
      .addField(Types.optional(PrimitiveTypeName.INT64).named("n_bytes"))
      .addField(Types.optional(PrimitiveTypeName.BINARY).as(stringType())
        .named("dv"))
    statsCols.foreach { c =>
      b = b.addField(Types.optional(PrimitiveTypeName.BINARY).as(stringType())
          .named(s"smin_s_$c"))
        .addField(Types.optional(PrimitiveTypeName.BINARY).as(stringType())
          .named(s"smax_s_$c"))
        .addField(Types.optional(PrimitiveTypeName.DOUBLE)
          .named(s"smin_d_$c"))
        .addField(Types.optional(PrimitiveTypeName.DOUBLE)
          .named(s"smax_d_$c"))
    }
    b.named("graft_ckpt")
  }

  /** Write the sidecar for a checkpoint state. Throws on any problem —
    * the caller treats the sidecar as best-effort. */
  def write(path: String,
      files: Seq[String],
      stats: Map[(String, String), (String, String)],
      rows: Map[String, Long],
      bytes: Map[String, Long],
      dv: Map[String, Seq[String]],
      props: Map[String, String],
      txns: Map[String, Long],
      schemaJson: Option[String],
      cdc: Seq[String] = Nil,
      requires: Seq[String] = Nil): Unit = {
    val statsCols = stats.keysIterator.map(_._2).toSeq.distinct.sorted
    require(statsCols.forall(fieldSafe),
      s"stats column name not parquet-field-safe: $statsCols")
    val mt = messageType(statsCols)
    val meta = Map(
      PropsKey -> props.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k=$v" }.mkString("\n"),
      TxnsKey -> txns.toSeq.sortBy(_._1)
        .map { case (a, v) => s"$a=$v" }.mkString("\n"),
      StatsColsKey -> statsCols.mkString("\t"),
      CdcKey -> cdc.mkString("\t"),
      RequiresKey -> requires.mkString("\t")) ++
      schemaJson.map(SchemaKey -> _)
    val factory = new SimpleGroupFactory(mt)
    def widenLo(s: String): Option[Double] =
      scala.util.Try(BigDecimal(s)).toOption.map(d => Math.nextDown(d.toDouble))
    def widenHi(s: String): Option[Double] =
      scala.util.Try(BigDecimal(s)).toOption.map(d => Math.nextUp(d.toDouble))
    // sort by the first stats column's widened min so row-group stats
    // are tight and the pushed filter skips whole groups
    val sortKey: String => Double = statsCols.headOption match {
      case Some(c) => rel => stats.get((rel, c))
        .flatMap(v => widenLo(v._1)).getOrElse(Double.NegativeInfinity)
      case None => _ => 0.0
    }
    val ordered = files.distinct.sortBy(rel => (sortKey(rel), rel))
    val hPath = new org.apache.hadoop.fs.Path(
      new java.io.File(path).toURI)
    val w = org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(hPath)
      .withType(mt)
      .withExtraMetaData(meta.asJava)
      .withRowGroupRowCountLimit(64 * 1024)
      .withConf(new org.apache.hadoop.conf.Configuration())
      .withWriteMode(org.apache.parquet.hadoop.ParquetFileWriter.Mode.OVERWRITE)
      .build()
    try ordered.foreach { rel =>
      val g = factory.newGroup()
      g.add("path", rel)
      rows.get(rel).foreach(n => g.add("n_rows", n))
      bytes.get(rel).foreach(n => g.add("n_bytes", n))
      dv.get(rel).filter(_.nonEmpty).foreach(ds => g.add("dv", ds.mkString("\t")))
      statsCols.foreach { c =>
        stats.get((rel, c)).foreach { case (mn, mx) =>
          g.add(s"smin_s_$c", mn)
          g.add(s"smax_s_$c", mx)
          widenLo(mn).foreach(d => g.add(s"smin_d_$c", d))
          widenHi(mx).foreach(d => g.add(s"smax_d_$c", d))
        }
      }
      w.write(g)
    } finally w.close()
  }

  /** The non-file state a sidecar's footer carries. */
  final case class Meta(
      props: Map[String, String],
      txns: Map[String, Long],
      statsCols: Seq[String],
      schemaJson: Option[String],
      cdc: Seq[String],
      requires: Seq[String] = Nil)

  private def kvOf(path: String): Map[String, String] = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(new java.io.File(path).toURI),
      new org.apache.hadoop.conf.Configuration())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getFooter.getFileMetaData.getKeyValueMetaData.asScala.toMap
    finally r.close()
  }

  def readMeta(path: String): Meta = {
    val kv = kvOf(path)
    def lines(key: String): Seq[String] =
      kv.getOrElse(key, "").split("\n").toSeq.filter(_.nonEmpty)
    Meta(
      lines(PropsKey).flatMap(_.split("=", 2) match {
        case Array(k, v) => Some(k -> v); case _ => None
      }).toMap,
      lines(TxnsKey).flatMap(_.split("=", 2) match {
        case Array(a, v) => scala.util.Try(a -> v.toLong).toOption
        case _ => None
      }).toMap,
      kv.getOrElse(StatsColsKey, "").split("\t").toSeq.filter(_.nonEmpty),
      kv.get(SchemaKey),
      kv.getOrElse(CdcKey, "").split("\t").toSeq.filter(_.nonEmpty),
      kv.getOrElse(RequiresKey, "").split("\t").toSeq.filter(_.nonEmpty))
  }

  private def reader(path: String,
      projection: Option[MessageType],
      filter: Option[org.apache.parquet.filter2.predicate.FilterPredicate]) = {
    val conf = new org.apache.hadoop.conf.Configuration()
    projection.foreach(p => conf.set("parquet.read.schema", p.toString))
    val b = org.apache.parquet.hadoop.ParquetReader
      .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
        new org.apache.hadoop.fs.Path(new java.io.File(path).toURI))
      .withConf(conf)
    filter.fold(b)(f => b.withFilter(
      org.apache.parquet.filter2.compat.FilterCompat.get(f))).build()
  }

  private def optStr(g: Group, field: String): Option[String] =
    if (g.getFieldRepetitionCount(field) > 0) Some(g.getString(field, 0))
    else None
  private def optLong(g: Group, field: String): Option[Long] =
    if (g.getFieldRepetitionCount(field) > 0) Some(g.getLong(field, 0))
    else None

  /** FULL reconstruction — every column, every row. The spec's
    * text↔parquet equivalence probe and the slow-path fallback. */
  def readFull(path: String): (Seq[String],
      Map[(String, String), (String, String)], Map[String, Long],
      Map[String, Long], Map[String, Seq[String]], Meta) = {
    val meta = readMeta(path)
    val r = reader(path, None, None)
    val files = Seq.newBuilder[String]
    val stats = Map.newBuilder[(String, String), (String, String)]
    val rows = Map.newBuilder[String, Long]
    val bytes = Map.newBuilder[String, Long]
    val dv = Map.newBuilder[String, Seq[String]]
    try {
      var g = r.read()
      while (g != null) {
        val rel = g.getString("path", 0)
        files += rel
        optLong(g, "n_rows").foreach(n => rows += rel -> n)
        optLong(g, "n_bytes").foreach(n => bytes += rel -> n)
        optStr(g, "dv").foreach(ds => dv += rel -> ds.split("\t").toSeq)
        meta.statsCols.foreach { c =>
          for (mn <- optStr(g, s"smin_s_$c"); mx <- optStr(g, s"smax_s_$c"))
            stats += (rel, c) -> (mn, mx)
        }
        g = r.read()
      }
    } finally r.close()
    (files.result().sorted, stats.result(), rows.result(), bytes.result(),
      dv.result(), meta)
  }

  /** One kept row of a pruned sidecar read: the file, its registered
    * DV dirs, and its recorded size (`n_bytes`) — surfaced so the
    * cold-open read path can plan from recorded sizes instead of
    * statting every kept file (ADVICE r15: bytes were dropped here and
    * ManifestFileIndex fell back to one driver stat per file, twice). */
  final case class PrunedFile(path: String, dv: Seq[String],
      bytes: Option[Long])

  /** Shared scaffolding of the two pruned reads: project
    * (path, n_bytes, dv, + the given stats fields of `column`),
    * optionally push a row-group filter, and keep rows passing `keep`
    * (missing-stats rows always kept — stats only exclude on proof). */
  private def prunedReadWith(path: String, column: String,
      statsFields: String => Seq[(String, PrimitiveTypeName)],
      filter: Option[org.apache.parquet.filter2.predicate.FilterPredicate],
      keep: Group => Boolean): (Seq[PrunedFile], Meta) = {
    val meta = readMeta(path)
    val hasStats = meta.statsCols.contains(column)
    val projection: MessageType = {
      var b = Types.buildMessage()
        .addField(Types.required(PrimitiveTypeName.BINARY).as(stringType())
          .named("path"))
        .addField(Types.optional(PrimitiveTypeName.INT64).named("n_bytes"))
        .addField(Types.optional(PrimitiveTypeName.BINARY).as(stringType())
          .named("dv"))
      if (hasStats) statsFields(column).foreach { case (name, t) =>
        b = b.addField(
          if (t == PrimitiveTypeName.BINARY)
            Types.optional(t).as(stringType()).named(name)
          else Types.optional(t).named(name))
      }
      b.named("graft_ckpt")
    }
    val r = reader(path, Some(projection), if (hasStats) filter else None)
    val kept = Seq.newBuilder[PrunedFile]
    try {
      var g = r.read()
      while (g != null) {
        if (!hasStats || keep(g))
          kept += PrunedFile(g.getString("path", 0),
            optStr(g, "dv").map(_.split("\t").toSeq).getOrElse(Seq.empty),
            optLong(g, "n_bytes"))
        g = r.read()
      }
    } finally r.close()
    (kept.result(), meta)
  }

  /** PRUNED projected read — the cold-open fast path: only
    * (path, dv, smin_d/smax_d of `column`) are decoded, the band
    * predicate is pushed to row-group level, and rows lacking stats
    * for `column` are KEPT (null-safe OR — stats may only exclude on
    * proof). Returns (kept file, its dv dirs) pairs plus the footer
    * meta. */
  def prunedRead(path: String, column: String, lo: BigDecimal,
      hi: BigDecimal): (Seq[PrunedFile], Meta) = {
    import org.apache.parquet.filter2.predicate.FilterApi
    val mnCol = FilterApi.doubleColumn(s"smin_d_$column")
    val mxCol = FilterApi.doubleColumn(s"smax_d_$column")
    // overlap OR missing-stats (null) — stats only exclude on proof
    val filter = FilterApi.or(
      FilterApi.and(
        FilterApi.ltEq(mnCol, java.lang.Double.valueOf(
          Math.nextUp(hi.toDouble))),
        FilterApi.gtEq(mxCol, java.lang.Double.valueOf(
          Math.nextDown(lo.toDouble)))),
      FilterApi.eq(mnCol, null.asInstanceOf[java.lang.Double]))
    prunedReadWith(path, column,
      c => Seq(s"smin_d_$c" -> PrimitiveTypeName.DOUBLE,
        s"smax_d_$c" -> PrimitiveTypeName.DOUBLE),
      Some(filter),
      // parquet-mr applies the pushed predicate at row-group AND
      // record level, so every row that reaches the loop is kept
      _ => true)
  }

  /** LEXICOGRAPHIC pruned read — [[prunedRead]]'s twin for STRING
    * stats columns: projects only (path, dv, smin_s/smax_s of
    * `column`) and applies the band with the caller's comparator
    * driver-side. No pushed row-group filter: parquet's binary
    * comparison is UTF-8 BYTE order while the recorded bounds must
    * compare in the exact order the engine's aggregates used —
    * delegating the compare keeps one definition of "overlaps" (the
    * projection is still the cold-open win; the full file list never
    * decodes stats it doesn't need). Rows lacking stats for `column`
    * are KEPT. */
  def prunedReadLex(path: String, column: String, lo: String, hi: String,
      cmp: (String, String) => Int): (Seq[PrunedFile], Meta) =
    prunedReadWith(path, column,
      c => Seq(s"smin_s_$c" -> PrimitiveTypeName.BINARY,
        s"smax_s_$c" -> PrimitiveTypeName.BINARY),
      None,
      g => (optStr(g, s"smin_s_$column"), optStr(g, s"smax_s_$column")) match {
        case (Some(mn), Some(mx)) => cmp(mn, hi) <= 0 && cmp(mx, lo) >= 0
        case _ => true
      })
}
