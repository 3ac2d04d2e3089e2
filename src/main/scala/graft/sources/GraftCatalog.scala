package graft.sources

import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Type => PType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, Literal, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.queries.Extras5

/** SQL front-end for the q78 snapshot protocol: a DataSource V2 catalog
  * whose tables resolve manifest versions, so the whole lakehouse-write
  * family is reachable from plain SQL —
  *
  *   SELECT ... FROM graft.t VERSION AS OF 1       (time travel)
  *   MERGE INTO graft.t USING src ON ... WHEN ...  (copy-on-write)
  *   UPDATE graft.t SET ... / DELETE FROM graft.t  (same machinery)
  *
  * Spark-first design, the Iceberg/Delta shape on our own protocol:
  *  - reads are a DSv2 Batch over the version's manifest file list,
  *    with file skipping from the per-file key stats the commit
  *    recorded (q78ResolvePruned) pushed down via V2 predicates;
  *  - MERGE/UPDATE/DELETE go through SupportsRowLevelOperations with
  *    GROUP-BASED (copy-on-write) semantics: Spark's
  *    RewriteMergeIntoTable plans a ReplaceData over the operation's
  *    scan, RowLevelOperationRuntimeGroupFiltering narrows that scan to
  *    the files whose rows actually match (an In(_file, <subquery>)
  *    runtime filter against our `_file` metadata column), and the
  *    operation's Write commits carried ++ rewritten through the
  *    optimistic q78TryCommit CAS — losing a race to a writer that
  *    touched disjoint files rebases the carried list and retries;
  *    overlap aborts (the merged rows were computed from a stale
  *    snapshot and must be recomputed by re-running the statement).
  *  - new files are committed WITH footer-equivalent key stats tracked
  *    during the write itself (min/max per writer task — the O(#files)
  *    metadata q94 reads prune on).
  *
  * At 100 TB the numbers work exactly like q88's API path: merge cost ∝
  * the delta's file footprint (runtime group filtering), commit cost ∝
  * #files of metadata, and time travel is a manifest lookup.
  *
  * Registration is an in-JVM map (a production catalog would back this
  * with a metastore); `GraftCatalog.install` wires the catalog name
  * into the active session.
  */
object GraftCatalog {
  private val tables = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The key column whose per-file stats commits record; fixed for the
    * protocol family's canonical orders shape. */
  val StatsColumn = "o_orderkey"

  def register(name: String, base: String): Unit = tables.put(name, base)

  private[sources] def baseFor(name: String): Option[String] =
    Option(tables.get(name))

  private[sources] def names: Seq[String] = tables.keys.asScala.toSeq

  /** Idempotently binds catalog name `graft` in the session. */
  def install(spark: SparkSession): Unit =
    if (!spark.conf.getOption("spark.sql.catalog.graft").isDefined)
      spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
}

class GraftCatalog extends TableCatalog {
  private var catalogName: String = "graft"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty)
      GraftCatalog.names.map(n => Identifier.of(Array.empty, n)).toArray
    else throw new NoSuchNamespaceException(namespace)

  override def loadTable(ident: Identifier): Table = make(ident, None)

  /** VERSION AS OF <v> lands here. */
  override def loadTable(ident: Identifier, version: String): Table =
    make(ident, Some(version.toInt))

  private def make(ident: Identifier, version: Option[Int]): Table =
    GraftCatalog.baseFor(ident.name) match {
      case Some(base) =>
        new GraftTable(s"$catalogName.${ident.name}", base, version)
      case None =>
        // `graft.<t>.changes` — the table's streaming change feed (the
        // Iceberg metadata-table addressing convention)
        val isChanges = ident.name == "changes" &&
          ident.namespace.length == 1
        val baseTable = if (isChanges)
          GraftCatalog.baseFor(ident.namespace.head) else None
        baseTable match {
          case Some(base) => new GraftChangeFeedTable(
            s"$catalogName.${ident.namespace.head}.changes", base)
          case None => throw new NoSuchTableException(ident)
        }
    }

  /** CREATE TABLE graft.t (...) — the table is born as an EMPTY v1
    * manifest commit plus a persisted schema (the manifest protocol's
    * only out-of-band metadata: with zero files there is no footer to
    * infer from). Location defaults to a scratch warehouse; a
    * `location` table property overrides it. Partition transforms are
    * rejected — layout in this protocol is a property of the files
    * (sorted/compacted), not of directory structure. */
  override def createTable(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    if (partitions.nonEmpty) throw new UnsupportedOperationException(
      "graft tables do not take PARTITIONED BY: layout is file-level " +
        "(sorted/compacted files + per-file stats), not directory-level")
    if (GraftCatalog.baseFor(ident.name).isDefined)
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(Seq(ident.name))
    val base = Option(properties.get("location"))
      .getOrElse(graft.Scratch.dir(s"graft_${ident.name}"))
    val schema = new StructType(columns.map(c =>
      StructField(c.name, c.dataType, c.nullable)))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(base))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(base, "_schema.json"),
      schema.json.getBytes("UTF-8"))
    Extras5.q78Commit(base, 1, Seq.empty)
    GraftCatalog.register(ident.name, base)
    new GraftTable(s"$catalogName.${ident.name}", base, None)
  }

  /** ALTER TABLE graft.t ADD COLUMN — schema evolution without history
    * rewrite: the persisted schema widens; files written before the
    * change simply lack the field and read back as NULL (the
    * Iceberg/Delta convention). Only top-level, nullable ADD COLUMN is
    * supported; anything else (drop/rename/retype) would need
    * field-id tracking this protocol does not carry. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val base = GraftCatalog.baseFor(ident.name)
      .getOrElse(throw new NoSuchTableException(ident))
    val current = new GraftTable(s"$catalogName.${ident.name}", base, None).schema
    val widened = changes.foldLeft(current) {
      case (sch, add: TableChange.AddColumn)
          if add.fieldNames.length == 1 && add.isNullable =>
        sch.add(StructField(add.fieldNames.head, add.dataType, nullable = true))
      case (_, other) => throw new UnsupportedOperationException(
        s"graft tables support only nullable top-level ADD COLUMN, got $other")
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(base, "_schema.json"),
      widened.json.getBytes("UTF-8"))
    new GraftTable(s"$catalogName.${ident.name}", base, None)
  }

  override def dropTable(ident: Identifier): Boolean =
    GraftCatalog.baseFor(ident.name) match {
      case Some(_) => GraftCatalog.tables.remove(ident.name); true
      case None => false
    }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("RENAME TABLE not supported")
}

/** One resolved snapshot of a registered table. `pinned` = VERSION AS
  * OF; otherwise the latest version AT LOAD TIME (a query sees one
  * consistent snapshot even if writers commit while it runs). */
private[sources] class GraftTable(tableName: String, val base: String,
    pinned: Option[Int])
    extends Table with SupportsRead with SupportsWrite
    with SupportsRowLevelOperations with SupportsMetadataColumns {

  /** Snapshot version (shadows Table.version()'s String default —
    * callers wanting the trait's form use versionString). */
  val snapshotVersion: Int = pinned.getOrElse(Extras5.q78Latest(base))
  override def version(): String = snapshotVersion.toString

  /** (path, committed key stats) for this snapshot. */
  val manifest: Seq[(String, Option[(Long, Long)])] =
    Extras5.q78ResolveStats(base, snapshotVersion)

  override def name(): String = tableName

  /** Footer inference from the first live file; tables created via SQL
    * CREATE TABLE persist their schema (an empty table has no footer). */
  override lazy val schema: StructType = {
    val sj = java.nio.file.Paths.get(base, "_schema.json")
    if (java.nio.file.Files.exists(sj))
      DataType.fromJson(new String(
        java.nio.file.Files.readAllBytes(sj), "UTF-8")).asInstanceOf[StructType]
    else GraftParquet.inferSchema(manifest.head._1)
  }

  override def partitioning(): Array[Transform] = Array.empty

  override def properties(): java.util.Map[String, String] =
    Map("format" -> "parquet", "protocol" -> "graft-manifest",
      "version" -> snapshotVersion.toString).asJava

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_BY_FILTER)

  override def metadataColumns(): Array[MetadataColumn] =
    Array(new MetadataColumn {
      override def name: String = "_file"
      override def dataType: DataType = StringType
      override def isNullable: Boolean = false
      override def comment: String = "data file the row lives in"
    })

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(this, None)

  /** INSERT INTO (append) / INSERT OVERWRITE (truncating overwrite) —
    * both commit through the same optimistic CAS as the merge path. */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsOverwriteV2 {
      private var replaceAll = false
      override def truncate(): WriteBuilder = { replaceAll = true; this }
      override def overwrite(predicates: Array[Predicate]): WriteBuilder = {
        val alwaysTrue = predicates.isEmpty ||
          predicates.forall(_.name == "ALWAYS_TRUE")
        if (!alwaysTrue) throw new UnsupportedOperationException(
          "graft tables support only full INSERT OVERWRITE " +
            "(use MERGE/UPDATE/DELETE for row-level changes)")
        replaceAll = true; this
      }
      override def build(): Write =
        new GraftAppendWrite(GraftTable.this, info, replaceAll)
    }

  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    () => new GraftCowOperation(this, info.command)
}

// ---------------------------------------------------------------------------
// Read path
// ---------------------------------------------------------------------------

private[sources] class GraftScanBuilder(table: GraftTable,
    owner: Option[GraftCowOperation])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownV2Filters {

  private var required: StructType = table.schema
  private var keyLo: Long = Long.MinValue
  private var keyHi: Long = Long.MaxValue
  private var pushed: Array[Predicate] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Key-range predicates narrow the manifest via committed stats; all
    * predicates stay post-scan residuals (pruning is a hint — rows are
    * still filtered exactly by Spark), so this is always sound. */
  override def pushPredicates(predicates: Array[Predicate]): Array[Predicate] = {
    predicates.foreach { p =>
      (p.name, p.children) match {
        case (op, Array(r: NamedReference, l: Literal[_]))
            if r.fieldNames.sameElements(Array(GraftCatalog.StatsColumn)) =>
          val lit = l.value match {
            case n: Number => Some(n.longValue)
            case _ => None
          }
          lit.foreach { n =>
            op match {
              case "=" => keyLo = math.max(keyLo, n); keyHi = math.min(keyHi, n)
              case ">=" => keyLo = math.max(keyLo, n)
              case ">" => keyLo = math.max(keyLo, n + 1)
              case "<=" => keyHi = math.min(keyHi, n)
              case "<" => keyHi = math.min(keyHi, n - 1)
              case _ => ()
            }
          }
          if (lit.isDefined) pushed :+= p
        case _ => ()
      }
    }
    predicates // everything remains a residual
  }

  override def pushedPredicates(): Array[Predicate] = pushed

  override def build(): Scan = {
    val files = table.manifest.collect {
      case (f, None) => f
      case (f, Some((mn, mx))) if mx >= keyLo && mn <= keyHi => f
    }
    val scan = new GraftScan(table, required, files)
    owner.foreach(_.configuredScan = scan)
    scan
  }
}

private[sources] class GraftScan(table: GraftTable, required: StructType,
    initialFiles: Seq[String]) extends Scan with Batch
    with SupportsRuntimeV2Filtering {

  /** Narrowed twice: statically by key-stats pruning (in the builder),
    * then at runtime by the group-filtering In(_file) subquery. After
    * execution this IS the replaced-files set a COW commit carries
    * against. */
  @volatile private[sources] var activeFiles: Seq[String] = initialFiles

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("_file"))

  override def filter(predicates: Array[Predicate]): Unit =
    predicates.foreach { p =>
      if (p.name == "IN" && p.children.nonEmpty) {
        p.children.head match {
          case r: NamedReference if r.fieldNames.sameElements(Array("_file")) =>
            val keep: Set[String] = p.children.tail.collect {
              case l: Literal[_] => String.valueOf(l.value)
            }.toSet
            activeFiles = activeFiles.filter(keep)
          case _ => ()
        }
      }
    }

  override def planInputPartitions(): Array[InputPartition] =
    activeFiles.map(f => GraftInputPartition(f)).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(required)

  override def description(): String =
    s"GraftScan(${table.name}, v${table.snapshotVersion}, files=${activeFiles.size})"
}

private[sources] case class GraftInputPartition(path: String)
    extends InputPartition

private[sources] class GraftReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftPartitionReader(
      partition.asInstanceOf[GraftInputPartition].path, required)
}

/** Parquet example-Group reader → InternalRow, flat primitive schemas
  * only (the protocol family's shape). `_file` is served from the
  * partition itself. */
private[sources] class GraftPartitionReader(path: String, required: StructType)
    extends PartitionReader[InternalRow] {

  private val reader: ParquetReader[Group] =
    ParquetReader.builder(new GroupReadSupport(), new HPath(path))
      .withConf(new Configuration()).build()

  private var current: Group = _

  override def next(): Boolean = {
    current = reader.read()
    current != null
  }

  override def get(): InternalRow = {
    val g = current
    val fileSchema = g.getType
    val values = required.fields.map { f =>
      if (f.name == "_file") UTF8String.fromString(path)
      // files written before an ALTER TABLE ADD COLUMN lack the new
      // field — they surface NULL for it (Iceberg/Delta evolution
      // semantics; no rewrite of history)
      else if (!fileSchema.containsField(f.name)) null
      else {
        val idx = fileSchema.getFieldIndex(f.name)
        if (g.getFieldRepetitionCount(idx) == 0) null
        else f.dataType match {
          case LongType => g.getLong(idx, 0)
          case IntegerType => g.getInteger(idx, 0)
          case DoubleType => g.getDouble(idx, 0)
          case BooleanType => g.getBoolean(idx, 0)
          case StringType => UTF8String.fromBytes(g.getBinary(idx, 0).getBytes)
          case d: DecimalType =>
            Decimal.createUnsafe(g.getLong(idx, 0), d.precision, d.scale)
          case other => throw new UnsupportedOperationException(
            s"graft catalog reader: unsupported type $other for ${f.name}")
        }
      }
    }
    new GenericInternalRow(values.asInstanceOf[Array[Any]])
  }

  override def close(): Unit = reader.close()
}

// ---------------------------------------------------------------------------
// Row-level operations (MERGE / UPDATE / DELETE), group-based COW
// ---------------------------------------------------------------------------

private[sources] class GraftCowOperation(table: GraftTable,
    cmd: RowLevelOperation.Command) extends RowLevelOperation {

  /** Set when Spark builds the operation's scan; read at commit time to
    * learn which files the (runtime-filtered) rewrite actually covers. */
  @volatile private[sources] var configuredScan: GraftScan = _

  override def command(): RowLevelOperation.Command = cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(table, Some(this))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new GraftCowWrite(table, GraftCowOperation.this, info)
    }

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column("_file"))

  override def description(): String = s"GraftCowOperation($cmd)"
}

private[sources] case class GraftSqlCommit(path: String, rows: Long,
    keyLo: Long, keyHi: Long, hasKey: Boolean) extends WriterCommitMessage

private[sources] class GraftCowWrite(table: GraftTable,
    op: GraftCowOperation, info: LogicalWriteInfo)
    extends Write with BatchWrite {

  private val outDir = s"${table.base}/files-sql-${info.queryId.take(8)}-" +
    UUID.randomUUID().toString.take(8)

  override def toBatch: BatchWrite = this

  override def createBatchWriterFactory(
      pinfo: PhysicalWriteInfo): DataWriterFactory =
    new GraftWriterFactory(info.schema(), outDir)

  /** Commit = optimistic CAS against the manifest protocol. The
    * replaced set is what the operation's scan READ (post runtime
    * filtering); carried = current manifest minus replaced, keeping
    * each carried file's committed stats; new files come in with the
    * stats their writers tracked. Losing the race to a DISJOINT writer
    * rebases and retries; to an OVERLAPPING writer aborts — our merged
    * rows were derived from files that no longer exist, so the
    * statement must be re-run (the caller's retry re-reads the new
    * snapshot, exactly Delta/Iceberg's conflict semantics). */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val commits = messages.collect { case m: GraftSqlCommit if m.rows > 0 => m }
    val newFiles = commits.map(_.path).toSeq.sorted
    val newStats = commits.collect {
      case m if m.hasKey => m.path -> (m.keyLo, m.keyHi)
    }.toMap
    val replaced = Option(op.configuredScan)
      .map(_.activeFiles.toSet)
      .getOrElse(table.manifest.map(_._1).toSet)
    var attempts = 0
    while (attempts < 10) {
      attempts += 1
      val latest = Extras5.q78Latest(table.base)
      val cur = Extras5.q78ResolveStats(table.base, latest)
      val curPaths = cur.map(_._1).toSet
      if (!replaced.subsetOf(curPaths))
        throw new IllegalStateException(
          s"concurrent write conflict on ${table.name}: " +
            s"${(replaced -- curPaths).size} of the files this statement " +
            "rewrote were replaced by another commit; re-run the statement")
      val carried = cur.filterNot { case (f, _) => replaced(f) }
      val stats = carried.collect { case (f, Some(s)) => f -> s }.toMap ++ newStats
      if (Extras5.q78TryCommit(table.base, latest + 1,
          carried.map(_._1) ++ newFiles, stats))
        return
      // lost the CAS to a concurrent commit — loop re-resolves and,
      // if our replaced files are still live there, rebases the carry
    }
    throw new IllegalStateException(
      s"gave up committing to ${table.name} after $attempts CAS attempts")
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case GraftSqlCommit(path, _, _, _, _) =>
        java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path))
      case _ => ()
    }

  override def description(): String = s"GraftCowWrite(${table.name})"
}

/** INSERT INTO / INSERT OVERWRITE write: appends never conflict (pure
  * addition — a lost CAS just rebases onto the new manifest and
  * retries), and a truncating overwrite replaces whatever is current
  * AT COMMIT TIME (last-writer-wins, the Hive/Delta overwrite
  * semantics). */
private[sources] class GraftAppendWrite(table: GraftTable,
    info: LogicalWriteInfo, replaceAll: Boolean)
    extends Write with BatchWrite {

  private val outDir = s"${table.base}/files-sql-${info.queryId.take(8)}-" +
    UUID.randomUUID().toString.take(8)

  override def toBatch: BatchWrite = this

  override def createBatchWriterFactory(
      pinfo: PhysicalWriteInfo): DataWriterFactory =
    new GraftWriterFactory(info.schema(), outDir)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val commits = messages.collect { case m: GraftSqlCommit if m.rows > 0 => m }
    val newFiles = commits.map(_.path).toSeq.sorted
    val newStats = commits.collect {
      case m if m.hasKey => m.path -> (m.keyLo, m.keyHi)
    }.toMap
    var attempts = 0
    while (attempts < 10) {
      attempts += 1
      val latest = Extras5.q78Latest(table.base)
      val cur = if (replaceAll) Seq.empty
        else Extras5.q78ResolveStats(table.base, latest)
      val stats = cur.collect { case (f, Some(s)) => f -> s }.toMap ++ newStats
      if (Extras5.q78TryCommit(table.base, latest + 1,
          cur.map(_._1) ++ newFiles, stats)) return
    }
    throw new IllegalStateException(
      s"gave up committing to ${table.name} after $attempts CAS attempts")
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case GraftSqlCommit(path, _, _, _, _) =>
        java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path))
      case _ => ()
    }

  override def description(): String = s"GraftAppendWrite(${table.name})"
}

private[sources] class GraftWriterFactory(schema: StructType, dir: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(schema, dir, partitionId, taskId)
}

/** Parquet example-Group writer; tracks the stats column's min/max so
  * the commit records per-file stats without any post-hoc footer read. */
private[sources] class GraftDataWriter(schema: StructType, dir: String,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {

  private val path = s"$dir/part-$partitionId-$taskId.parquet"
  private val messageType = GraftParquet.toMessageType(schema)
  private val keyIdx = schema.fieldNames.indexOf(GraftCatalog.StatsColumn)
  private var rows = 0L
  private var keyLo = Long.MaxValue
  private var keyHi = Long.MinValue

  private lazy val writer = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    ExampleParquetWriter.builder(new HPath(path))
      .withType(messageType)
      .withConf(new Configuration())
      .build()
  }

  override def write(row: InternalRow): Unit = {
    val g = new SimpleGroup(messageType)
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (!row.isNullAt(i)) f.dataType match {
        case LongType => g.add(i, row.getLong(i))
        case IntegerType => g.add(i, row.getInt(i))
        case DoubleType => g.add(i, row.getDouble(i))
        case BooleanType => g.add(i, row.getBoolean(i))
        case StringType => g.add(i, row.getUTF8String(i).toString)
        case d: DecimalType =>
          g.add(i, row.getDecimal(i, d.precision, d.scale).toUnscaledLong)
        case other => throw new UnsupportedOperationException(
          s"graft catalog writer: unsupported type $other for ${f.name}")
      }
    }
    if (keyIdx >= 0 && !row.isNullAt(keyIdx)) {
      val k = row.getLong(keyIdx)
      keyLo = math.min(keyLo, k); keyHi = math.max(keyHi, k)
    }
    rows += 1
    writer.write(g)
  }

  override def commit(): WriterCommitMessage = {
    if (rows > 0) writer.close()
    if (rows == 0) {
      // never opened (lazy) or opened empty: leave no file behind
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path))
    }
    GraftSqlCommit(path, rows, keyLo, keyHi, keyIdx >= 0 && rows > 0)
  }

  override def abort(): Unit = {
    try writer.close() catch { case _: Exception => () }
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path))
  }

  override def close(): Unit = ()
}

// ---------------------------------------------------------------------------
// Flat-schema parquet <-> Spark type plumbing
// ---------------------------------------------------------------------------

private[sources] object GraftParquet {

  /** StructType from a parquet footer — flat primitives only, which is
    * all the protocol family writes (Spark encodes DECIMAL(<=18,s) as
    * annotated INT64, strings as annotated BINARY). */
  def inferSchema(samplePath: String): StructType = {
    val in = HadoopInputFile.fromPath(new HPath(samplePath), new Configuration())
    val reader = ParquetFileReader.open(in)
    try {
      val msg = reader.getFooter.getFileMetaData.getSchema
      StructType(msg.getFields.asScala.map { f =>
        val p = f.asPrimitiveType()
        val dt = (p.getPrimitiveTypeName, p.getLogicalTypeAnnotation) match {
          case (PrimitiveTypeName.INT64,
              d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation) =>
            DecimalType(d.getPrecision, d.getScale)
          case (PrimitiveTypeName.INT64, _) => LongType
          case (PrimitiveTypeName.INT32, _) => IntegerType
          case (PrimitiveTypeName.DOUBLE, _) => DoubleType
          case (PrimitiveTypeName.BOOLEAN, _) => BooleanType
          case (PrimitiveTypeName.BINARY, _) => StringType
          case (other, _) => throw new UnsupportedOperationException(
            s"graft catalog: unsupported parquet type $other for ${f.getName}")
        }
        StructField(f.getName, dt,
          nullable = f.getRepetition != PType.Repetition.REQUIRED)
      }.toArray)
    } finally reader.close()
  }

  def toMessageType(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      val rep =
        if (f.nullable) PType.Repetition.OPTIONAL else PType.Repetition.REQUIRED
      f.dataType match {
        case LongType =>
          b.addField(Types.primitive(PrimitiveTypeName.INT64, rep).named(f.name))
        case IntegerType =>
          b.addField(Types.primitive(PrimitiveTypeName.INT32, rep).named(f.name))
        case DoubleType =>
          b.addField(Types.primitive(PrimitiveTypeName.DOUBLE, rep).named(f.name))
        case BooleanType =>
          b.addField(Types.primitive(PrimitiveTypeName.BOOLEAN, rep).named(f.name))
        case StringType =>
          b.addField(Types.primitive(PrimitiveTypeName.BINARY, rep)
            .as(LogicalTypeAnnotation.stringType()).named(f.name))
        case d: DecimalType if d.precision <= 18 =>
          b.addField(Types.primitive(PrimitiveTypeName.INT64, rep)
            .as(LogicalTypeAnnotation.decimalType(d.scale, d.precision))
            .named(f.name))
        case other => throw new UnsupportedOperationException(
          s"graft catalog: unsupported write type $other for ${f.name}")
      }
    }
    b.named("graft_row")
  }
}
