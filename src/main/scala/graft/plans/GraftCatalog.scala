package graft.plans

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.TableCommit

/** CATALOG front door for committed tables (round-13 verdict item 1 —
  * the "real" alternative to the bucketed-view link trick): a DSv2
  * `TableCatalog` + `FunctionCatalog` plugin, so committed tables
  * resolve as first-class catalog identities —
  *
  * {{{
  *   spark.sql.catalog.graft           = graft.plans.GraftCatalog
  *   spark.sql.catalog.graft.warehouse = /data/warehouse
  *
  *   SELECT * FROM graft.db.events                       -- newest snapshot
  *   SELECT * FROM graft.db.events VERSION AS OF 7       -- time travel
  *   SELECT * FROM graft.`/abs/path/to/table`            -- path identity
  * }}}
  *
  * and — the 100-TB point — a table laid out by the committed
  * `bucket(n, key)` transform reports `KeyGroupedPartitioning` from
  * its scan, so two such tables equi-joined on `key` run a
  * STORAGE-PARTITIONED JOIN: zero Exchange on either side, straight
  * from the committed tree. Unlike `registerBucketedView` this needs
  * NO serve-tree links (nothing is copied or re-registered per
  * snapshot), and it composes with live deletion vectors and column
  * mapping, both of which the view trick must refuse
  * ([[GraftTable]]'s reader applies vectors and name mappings
  * itself). The FunctionCatalog half exists because Spark resolves a
  * reported `bucket` transform against the TABLE'S OWN catalog
  * ([[GraftBucketUnbound]]) — both sides binding to the same
  * canonical function is what makes their partitionings compatible.
  *
  * The catalog is deliberately READ-side + identity: the write/DML
  * surface stays with the `TableCommit` verbs (one OCC kernel), which
  * the SQL statement front door lowers onto (GraftSqlDml). Reference
  * behavior generalized: msoriadivvy/etl-8x8 `serverless.core.yml:171-210`
  * names tables by environment config; the catalog is that binding as
  * a queryable namespace. */
class GraftCatalog extends TableCatalog with FunctionCatalog
    with SupportsNamespaces with ProcedureCatalog {

  private var catalogName: String = "graft"
  private var warehouse: Option[String] = None

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse"))
  }

  override def name(): String = catalogName

  /** `db.t` → `<warehouse>/db/t`; a single-part identifier that is an
    * absolute path is its own location (the path-identity form). */
  private def locationOf(ident: Identifier): String = {
    val parts = ident.namespace().toSeq :+ ident.name()
    if (ident.namespace().isEmpty && (ident.name().startsWith("/") ||
        ident.name().contains("://")))
      ident.name()
    else warehouse match {
      case Some(w) => (w +: parts).mkString("/")
      case None => throw new IllegalArgumentException(
        s"catalog $catalogName has no warehouse configured " +
          s"(spark.sql.catalog.$catalogName.warehouse) — only absolute " +
          s"path identifiers can resolve: ${parts.mkString(".")}")
    }
  }

  private def tableAt(ident: Identifier, id: Option[Long]): Table = {
    val path = locationOf(ident)
    if (TableCommit.resolve(path).isEmpty)
      throw new NoSuchTableException(ident)
    new GraftTable(path, id)
  }

  override def loadTable(ident: Identifier): Table = tableAt(ident, None)

  /** `VERSION AS OF <id | 'tag'>` — a numeric version is the snapshot
    * id itself; anything else resolves as a TAG name against the
    * newest snapshot's `graft.tag.*` refs (vacuum-leased, so a tagged
    * version stays loadable past the retention window). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val id = scala.util.Try(java.lang.Long.parseLong(version)).toOption
      .orElse {
        val path = locationOf(ident)
        TableCommit.tags(path).get(version)
      }.getOrElse(throw new IllegalArgumentException(
        s"VERSION AS OF $version: neither a snapshot id nor a tag of " +
          s"${ident.name()} (tags: ${
            TableCommit.tags(locationOf(ident)).keys.toSeq.sorted
              .mkString(", ")})"))
    tableAt(ident, Some(id))
  }

  override def tableExists(ident: Identifier): Boolean =
    scala.util.Try(locationOf(ident)).toOption
      .exists(p => TableCommit.resolve(p).isDefined)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val w = warehouse.getOrElse(throw new NoSuchNamespaceException(namespace))
    // routed through the TableStore seam (not java.io.File), so a
    // warehouse on hdfs://… lists exactly like a local one
    val dir = (w +: namespace.toSeq).mkString("/")
    val st = graft.operators.TableStore.forTable(dir)
    st.listSubdirs(dir, "")
      .filter { case (name, _) =>
        st.listManifestIds(s"$dir/$name").nonEmpty }
      .map { case (name, _) => Identifier.of(namespace, name) }
      .sortBy(_.name()).toArray
  }

  /** CREATE TABLE: publish an empty snapshot carrying the declared
    * schema (+ the partition spec as `graft.partcols` when transforms
    * are declared) — the same manifest any verb would then evolve. */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String])
      : Table = {
    val path = locationOf(ident)
    require(TableCommit.resolve(path).isEmpty,
      s"table ${ident.name()} already exists at $path")
    val spec = partitions.toSeq.map(GraftCatalog.specEntryOf)
    require(spec.nonEmpty,
      "graft tables are partitioned by contract — declare PARTITIONED BY " +
        "(a column, bucket(n, col), days(col), …)")
    val s = SparkSession.active
    // an empty append pins the schema of record; the evolve commit
    // then records the spec as the table's declared layout contract
    TableCommit.appendRowsBy(s, path, spec,
      s.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        schema))
    TableCommit.evolvePartitioningBy(s, path, spec)
    new GraftTable(path, None)
  }

  /** `ALTER TABLE` lowered onto the metadata-only evolution verbs
    * (round-14 verdict item 5) — the SQL front door gets EXACTLY the
    * verbs' guarantees: rename/drop keep the column-mapping rules
    * (dropped physicals quarantined, renames re-key `#stats`), type
    * changes pass through the widen lattice (non-widenings refuse
    * loudly all the way out to the statement), ADD COLUMN rides the
    * schema-merge rule (an empty append re-declaring the schema plus
    * the new nullable field — retained files null-default). Unmapped
    * change kinds refuse loudly, never silently reinterpret. */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val path = locationOf(ident)
    if (TableCommit.resolve(path).isEmpty)
      throw new NoSuchTableException(ident)
    val s = SparkSession.active
    def dotted(fieldNames: Array[String]): String = fieldNames.mkString(".")
    changes.foreach {
      case c: TableChange.RenameColumn =>
        TableCommit.renameColumn(path, dotted(c.fieldNames()), c.newName())
      case c: TableChange.DeleteColumn =>
        TableCommit.dropColumn(path, dotted(c.fieldNames()))
      case c: TableChange.UpdateColumnType =>
        TableCommit.widenColumnType(path, dotted(c.fieldNames()),
          c.newDataType())
      case c: TableChange.SetProperty =>
        TableCommit.setProperties(path, Map(c.property() -> c.value()))
      case c: TableChange.RemoveProperty =>
        TableCommit.removeProperties(path, Set(c.property()))
      case c: TableChange.AddColumn =>
        require(c.fieldNames().length == 1,
          s"ADD COLUMN on graft tables adds top-level columns only, " +
            s"got ${dotted(c.fieldNames())}")
        require(c.isNullable,
          s"added column ${c.fieldNames().head} must be nullable — " +
            "retained files carry no value for it")
        val base = new GraftTable(path, None).logicalSchema
        require(!base.fieldNames.contains(c.fieldNames().head),
          s"column ${c.fieldNames().head} already exists in $path")
        val extended = StructType(base.fields :+
          StructField(c.fieldNames().head, c.dataType(), nullable = true))
        TableCommit.appendRowsBy(s, path, GraftSqlDml.specOf(path),
          s.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), extended))
      case other => throw new UnsupportedOperationException(
        s"ALTER TABLE change $other is not lowered — the TableCommit " +
          "verbs express the supported evolutions (rename/drop/widen/" +
          "set property/add nullable column)")
    }
    new GraftTable(path, None)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val path = locationOf(ident)
    val existed = TableCommit.resolve(path).isDefined
    // deletion goes through the TableStore seam: a java.io.File
    // recursion on an hdfs:///s3a:// location would delete NOTHING and
    // still report a destructive op as successful (the one lie a
    // catalog must never tell)
    if (existed)
      graft.operators.TableStore.forTable(path).deleteTree(path, "")
    existed
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft tables are addressed by location; copy via cloneTo instead")

  // ---- FunctionCatalog: the transforms committed layouts declare ----
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty)
      Array(Identifier.of(namespace, "bucket"),
        Identifier.of(namespace, "days"),
        Identifier.of(namespace, "truncate"))
    else throw new NoSuchNamespaceException(namespace)

  override def loadFunction(ident: Identifier): UnboundFunction =
    ident.name() match {
      case "bucket" => new GraftBucketUnbound
      case "days" => new GraftDaysUnbound
      case "truncate" => new GraftTruncUnbound
      case GraftCatalog.TruncNameRe(w) => new GraftTruncWUnbound(w.toInt)
      case _ => throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchFunctionException(ident)
    }

  // ---- ProcedureCatalog: CALL graft.system.<maintenance verb> ------
  /** The maintenance verbs as SQL procedures (see [[GraftProcedures]]);
    * `table` arguments resolve like table identifiers — absolute paths
    * directly, `db.t` names against the warehouse. */
  private lazy val procedures =
    GraftProcedures.all(arg =>
      if (arg.startsWith("/") || arg.contains("://")) arg
      else warehouse match {
        case Some(w) => (w +: arg.split('.').toSeq).mkString("/")
        case None => throw new IllegalArgumentException(
          s"catalog $catalogName has no warehouse configured — pass an " +
            s"absolute table path instead of '$arg'")
      })

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    procedures.getOrElse(ident.name(),
      throw new RuntimeException(
        s"unknown graft procedure ${ident.name()} — available: " +
          procedures.keys.toSeq.sorted.mkString(", ")))

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    procedures.keys.toSeq.sorted
      .map(Identifier.of(Array("system"), _)).toArray

  // ---- SupportsNamespaces (the minimal surface SHOW NAMESPACES needs)
  // Listings route through the TableStore seam (scheme-aware);
  // namespace CREATION/DELETION keeps directory semantics, which only
  // a local warehouse has — non-local warehouses refuse loudly rather
  // than silently no-op a verb the user will assume happened.
  private def requireLocalWarehouse(verb: String, w: String): Unit =
    require(!w.contains("://"),
      s"$verb on a non-local warehouse ($w) is not supported — object " +
        "stores have no directory objects; namespaces there are implicit " +
        "prefixes (create a table under the namespace path instead)")

  override def listNamespaces(): Array[Array[String]] =
    warehouse.map(w =>
      graft.operators.TableStore.forTable(w).listSubdirs(w, "")
        .map { case (name, _) => Array(name) }
        .sortBy(_.head).toArray)
      .getOrElse(Array.empty[Array[String]])

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces() else Array.empty

  override def loadNamespaceMetadata(namespace: Array[String])
      : util.Map[String, String] = {
    val w = warehouse.getOrElse(throw new NoSuchNamespaceException(namespace))
    val parent = (w +: namespace.toSeq.dropRight(1)).mkString("/")
    val present = graft.operators.TableStore.forTable(w)
      .listSubdirs(parent, "").exists(_._1 == namespace.last)
    if (!present) throw new NoSuchNamespaceException(namespace)
    java.util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    val w = warehouse.getOrElse(throw new NoSuchNamespaceException(namespace))
    requireLocalWarehouse("CREATE NAMESPACE", w)
    new java.io.File((w +: namespace.toSeq).mkString("/")).mkdirs()
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("namespace metadata is immutable")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    val w = warehouse.getOrElse(return false)
    val dir = (w +: namespace.toSeq).mkString("/")
    if (cascade) {
      // recursive namespace deletion is store-routed like dropTable
      val existed = graft.operators.TableStore.forTable(w)
        .listSubdirs((w +: namespace.toSeq.dropRight(1)).mkString("/"), "")
        .exists(_._1 == namespace.last) || new java.io.File(dir).isDirectory
      if (existed)
        graft.operators.TableStore.forTable(dir).deleteTree(dir, "")
      existed
    } else {
      requireLocalWarehouse("DROP NAMESPACE", w)
      val f = new java.io.File(dir)
      val existed = f.isDirectory
      if (existed) f.delete()
      existed
    }
  }
}

object GraftCatalog {
  /** The width-baked truncate function FAMILY (`truncate100`,
    * `truncate2`, …) the SPJ handshake binds — see
    * [[GraftTruncWUnbound]] for why the width cannot ride as a
    * function argument there. */
  private[plans] val TruncNameRe = """truncate(\d+)""".r

  /** Imperative session hookup — the twin of the `spark.sql.catalog.*`
    * conf lines for a session that already exists. Catalog instances
    * resolve lazily, so a runtime conf set is fully effective. */
  def register(s: SparkSession, name: String = "graft",
      warehouse: Option[String] = None): Unit = {
    s.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    warehouse.foreach(w =>
      s.conf.set(s"spark.sql.catalog.$name.warehouse", w))
  }

  /** A DSv2 Transform rendered as the committed spec's entry text. */
  private[plans] def specEntryOf(t: Transform): String = t match {
    case b if b.name() == "bucket" =>
      val n = b.arguments().collectFirst {
        case lit: org.apache.spark.sql.connector.expressions.Literal[_] =>
          lit.value().toString
      }.getOrElse(sys.error(s"bucket transform without a count: $t"))
      val col = b.references().head.fieldNames().mkString(".")
      s"bucket($n,$col)"
    case d if d.name() == "days" =>
      s"days(${d.references().head.fieldNames().mkString(".")})"
    case tr if tr.name() == "truncate" =>
      // accept either argument order (the SQL surface has seen both
      // `truncate(8, col)` and `truncate(col, 8)` in the wild)
      val w = tr.arguments().collectFirst {
        case lit: org.apache.spark.sql.connector.expressions.Literal[_] =>
          lit.value().toString
      }.getOrElse(sys.error(s"truncate transform without a width: $tr"))
      val col = tr.references().head.fieldNames().mkString(".")
      s"truncate($w,$col)"
    case i if i.name() == "identity" =>
      i.references().head.fieldNames().mkString(".")
    case other => sys.error(s"unsupported partition transform: $other")
  }
}

/** The catalog's `bucket` function: EXACTLY the committed layout's
  * bucket-id derivation — `pmod(hash(key), n)` with Spark's Murmur3
  * (seed 42), the hash PROTOCOL.md §8 pins as part of the format. The
  * scan reports `bucket(n, key)` partitioning; Spark resolves that
  * transform against this catalog function and two scans binding to
  * the same canonical function (same n, same key type) are
  * partition-compatible — the storage-partitioned join's handshake.
  * `produceResult` must agree with the layout bit-for-bit, because
  * the v2-bucketing shuffle-one-side feature evaluates it against
  * the unbucketed side's rows. */
class GraftBucketUnbound extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "graft committed-layout bucket id: pmod(murmur3_seed42(key), n)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket(numBuckets, key) takes 2 arguments, got ${inputType.length}")
    require(inputType.fields(0).dataType == IntegerType,
      s"bucket count must be INT, got ${inputType.fields(0).dataType}")
    val keyType = inputType.fields(1).dataType
    keyType match {
      case ByteType | ShortType | IntegerType | LongType | StringType
           | DateType =>
        new GraftBucketFunction(keyType)
      case other => throw new UnsupportedOperationException(
        s"bucket() over ${other.catalogString} keys is not part of the " +
          "committed layout contract (integral, string and date keys are)")
    }
  }
}

/** The catalog's `days` function: EXACTLY the committed layout's
  * day-dir derivation (TableCommit.specDirExpr), as a typed UTC
  * epoch-day — DATE keys pass through (their internal int IS the
  * epoch day), zoned timestamps floor their epoch micros over UTC
  * (session-independent, the same stability rule the dir rendering
  * follows), NTZ micros likewise. Two scans reporting `days(ts)`
  * partitioning bind here, making their groupings comparable — the
  * multi-level storage-partitioned-join handshake; the write path
  * clusters by it so each day's rows land in one task. */
class GraftDaysUnbound extends UnboundFunction {
  override def name(): String = "days"
  override def description(): String =
    "graft committed-layout day id: UTC epoch day of a date/timestamp"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1,
      s"days(col) takes 1 argument, got ${inputType.length}")
    inputType.fields(0).dataType match {
      case DateType | TimestampType | TimestampNTZType =>
        new GraftDaysFunction(inputType.fields(0).dataType)
      case other => throw new UnsupportedOperationException(
        s"days() over ${other.catalogString} keys is not part of the " +
          "committed layout contract (date and timestamp keys are)")
    }
  }
}

/** Bound days(key) — result is DATE (internally the epoch-day int). */
class GraftDaysFunction(keyType: DataType)
    extends ScalarFunction[java.lang.Integer] {
  override def name(): String = "days"
  override def inputTypes(): Array[DataType] = Array(keyType)
  override def resultType(): DataType = DateType
  override def canonicalName(): String =
    s"graft.days(${keyType.catalogString})"

  override def produceResult(input: InternalRow): java.lang.Integer =
    if (input.isNullAt(0)) null
    else keyType match {
      case DateType => input.getInt(0)
      // UTC calendar day via epoch arithmetic — the same derivation
      // the dir rendering uses (specDirExpr), so function grouping
      // and directory grouping agree exactly
      case TimestampType | TimestampNTZType =>
        java.lang.Math.floorDiv(input.getLong(0), 86400000000L).toInt
      case other => sys.error(s"unreachable: $other")
    }
}

/** Bound bucket(n, key) — one scalar, codegen-friendly through the
  * magic-method-less `produceResult` path (the SPJ handshake never
  * evaluates it; only the opt-in shuffle-one-side feature does). */
class GraftBucketFunction(keyType: DataType)
    extends ScalarFunction[java.lang.Integer] {
  override def name(): String = "bucket"
  override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
  override def resultType(): DataType = IntegerType
  override def isResultNullable: Boolean = false
  override def canonicalName(): String =
    s"graft.bucket(${keyType.catalogString})"

  override def produceResult(input: InternalRow): java.lang.Integer = {
    val n = input.getInt(0)
    // Spark's hash(col) semantics: Murmur3 seed 42, NULL hashes to the
    // seed itself (HashExpression folds nulls through unchanged)
    val h: Int =
      if (input.isNullAt(1)) 42
      else keyType match {
        case ByteType => Murmur3_x86_32.hashInt(input.getByte(1).toInt, 42)
        case ShortType => Murmur3_x86_32.hashInt(input.getShort(1).toInt, 42)
        case IntegerType => Murmur3_x86_32.hashInt(input.getInt(1), 42)
        case DateType => Murmur3_x86_32.hashInt(input.getInt(1), 42)
        case LongType => Murmur3_x86_32.hashLong(input.getLong(1), 42)
        case StringType =>
          val s = input.getUTF8String(1)
          Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
            s.numBytes(), 42)
        case other => sys.error(s"unreachable: $other")
      }
    val r = h % n
    if (r < 0) r + n else r
  }
}

/** The committed layout's `truncate(W,col)` derivation, shared by
  * both function shapes: EXACTLY TableCommit.specDirExpr's dir
  * column (Iceberg's truncate semantics per source type) — strings
  * keep their first W characters (`substringSQL`, the same
  * code-point rule the staged `substring(col,1,W)` dir column
  * follows); integral keys floor to the multiple of W
  * (`v - (((v % W) + W) % W)`), computed in LONG because the dir
  * rendering promotes through long arithmetic too (`-128` truncated
  * by 100 is `-200`, which no byte can carry). */
private[plans] object GraftTrunc {
  def supported(dt: DataType): Boolean = dt match {
    case StringType | ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  def resultTypeOf(keyType: DataType): DataType =
    if (keyType == StringType) StringType else LongType

  /** Derive over `input` position `pos` (null already handled). */
  def derive(keyType: DataType, w: Int, input: InternalRow,
      pos: Int): AnyRef = keyType match {
    case StringType => input.getUTF8String(pos).substringSQL(1, w)
    case _ =>
      val v = keyType match {
        case ByteType => input.getByte(pos).toLong
        case ShortType => input.getShort(pos).toLong
        case IntegerType => input.getInt(pos).toLong
        case LongType => input.getLong(pos)
        case other => sys.error(s"unreachable: $other")
      }
      java.lang.Long.valueOf(v - java.lang.Math.floorMod(v, w.toLong))
  }
}

/** The catalog's two-argument `truncate(width, col)` function — the
  * SQL-callable shape (`SELECT graft.truncate(2, tag)`), and what a
  * `PARTITIONED BY (truncate(2, tag))` clause resolves. NOT the SPJ
  * handshake shape: see [[GraftTruncWUnbound]]. */
class GraftTruncUnbound extends UnboundFunction {
  override def name(): String = "truncate"
  override def description(): String =
    "graft committed-layout truncate: string prefix / integral floor multiple"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"truncate(width, col) takes 2 arguments, got ${inputType.length}")
    require(inputType.fields(0).dataType == IntegerType,
      s"truncate width must be INT, got ${inputType.fields(0).dataType}")
    val keyType = inputType.fields(1).dataType
    if (!GraftTrunc.supported(keyType))
      throw new UnsupportedOperationException(
        s"truncate() over ${keyType.catalogString} keys is not part of " +
          "the committed layout contract (string and integral keys are)")
    new GraftTruncFunction(keyType)
  }
}

/** Bound truncate(w, key) — STRING keys yield the W-char prefix
  * (StringType); integral keys yield the floor multiple (LongType). */
class GraftTruncFunction(keyType: DataType) extends ScalarFunction[AnyRef] {
  override def name(): String = "truncate"
  override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
  override def resultType(): DataType = GraftTrunc.resultTypeOf(keyType)
  override def canonicalName(): String =
    s"graft.truncate(${keyType.catalogString})"

  override def produceResult(input: InternalRow): AnyRef =
    if (input.isNullAt(1)) null
    else GraftTrunc.derive(keyType, input.getInt(0), input, 1)
}

/** The WIDTH-BAKED truncate family (`truncate2`, `truncate100`, …) —
  * the storage-partitioned-join handshake shape. Catalyst's
  * `KeyGroupedPartitioning.satisfies` demands every partition
  * expression carry EXACTLY ONE leaf, and a literal width argument
  * is a leaf (only `bucket` gets its literal hoisted into
  * `numBucketsOpt` by Spark's translation) — so a two-argument
  * `truncate(2, tag)` transform can never satisfy a clustered
  * distribution, and the scan instead reports `truncate2(tag)`: one
  * column argument, the width in the NAME, and therefore in
  * `canonicalName` — two sides SPJ iff their widths agree, exactly
  * the compatibility rule the layout implies. */
class GraftTruncWUnbound(w: Int) extends UnboundFunction {
  override def name(): String = s"truncate$w"
  override def description(): String =
    s"graft committed-layout truncate($w, col) with the width baked in"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1,
      s"truncate$w(col) takes 1 argument, got ${inputType.length}")
    val keyType = inputType.fields(0).dataType
    if (!GraftTrunc.supported(keyType))
      throw new UnsupportedOperationException(
        s"truncate$w() over ${keyType.catalogString} keys is not part of " +
          "the committed layout contract (string and integral keys are)")
    new GraftTruncWFunction(w, keyType)
  }
}

/** Bound truncate<w>(key) — see [[GraftTruncWUnbound]]. */
class GraftTruncWFunction(w: Int, keyType: DataType)
    extends ScalarFunction[AnyRef] {
  override def name(): String = s"truncate$w"
  override def inputTypes(): Array[DataType] = Array(keyType)
  override def resultType(): DataType = GraftTrunc.resultTypeOf(keyType)
  override def canonicalName(): String =
    s"graft.truncate($w,${keyType.catalogString})"

  override def produceResult(input: InternalRow): AnyRef =
    if (input.isNullAt(0)) null
    else GraftTrunc.derive(keyType, w, input, 0)
}
