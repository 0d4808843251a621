package graft.sources.v2

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, MetadataColumn, SupportsMetadataColumns, SupportsRead, SupportsRowLevelOperations, SupportsWrite, Table, TableCapability, TableCatalog}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DataSource-V2 `TableCatalog` whose tables support the row-level
  * operation protocol (`MERGE INTO` / `UPDATE` / `DELETE` as SQL
  * statements) and versioned time-travel reads (`VERSION AS OF n`) —
  * the two warehouse front doors Spark's built-in file catalog lacks
  * (a v1 parquet table answers MERGE with UNSUPPORTED_FEATURE.
  * TABLE_OPERATION; reference analog: the reference pipeline only ever
  * overwrites whole tables, src/data_processor.py:237-269, so both
  * statements are capability-rounding on top of its surface).
  *
  * What is the PRODUCT here is the protocol wiring, which is exactly
  * what Iceberg/Delta implement over distributed storage:
  *
  *  - [[LakeTable.newRowLevelOperationBuilder]] declares GROUP-BASED
  *    (copy-on-write) execution: Spark's own RewriteMergeIntoTable /
  *    RewriteUpdateTable / RewriteDeleteFromTable rules plan the
  *    distributed join of target against source, apply the
  *    matched/not-matched actions row-by-row inside the join (the
  *    MergeRows operator), and hand the operation's write the FULL
  *    replacement content of every affected group. Nothing about that
  *    plan is driver-side; it is the same shuffle q97 executes by hand.
  *  - Every commit (append, overwrite, row-level replace) creates a new
  *    immutable SNAPSHOT; `loadTable(ident, version)` pins a scan to an
  *    old snapshot, which is all `VERSION AS OF` needs. Snapshots
  *    share nothing with the reference's mutable-dict state: a reader
  *    of v1 is byte-stable while v2 commits (MergeSqlSpec pins it).
  *
  * The STORAGE of this catalog is deliberately the simplest thing that
  * is correct under the protocol: rows held in a JVM-global store,
  * grouped by writing task (one write task's output = one read split,
  * so read parallelism mirrors write parallelism). That is a fixture
  * standing in for a distributed object store — at 100 TB the same
  * protocol runs over parquet+manifest storage (the layout q205/q65
  * already build); swapping the storage touches none of the plan-side
  * machinery, which is the part under test. The store is keyed by
  * catalog-qualified table name so session CLONES (the conf-isolation
  * device every lifecycle query uses) see one table state per JVM,
  * like an external metastore.
  */
object GraftLakeStore {

  /** Versioned table state. Snapshots are immutable arrays of row
    * groups; version k is the state after the k-th commit (v0 = empty
    * at CREATE). All mutation is synchronized; reads take a reference
    * to an immutable snapshot and never lock again. */
  final class TableState(val schema: StructType) {
    private val snapshots = ArrayBuffer[Array[Array[InternalRow]]](Array.empty)
    def latestVersion: Int = synchronized(snapshots.size - 1)
    def snapshot(v: Int): Array[Array[InternalRow]] = synchronized {
      require(v >= 0 && v < snapshots.size,
        s"no such version $v (have 0..${snapshots.size - 1})")
      snapshots(v)
    }
    def commit(parts: Array[Array[InternalRow]], replace: Boolean): Unit =
      synchronized {
        snapshots += (if (replace) parts else snapshots.last ++ parts)
      }
  }

  private val tables = new ConcurrentHashMap[String, TableState]()

  def create(key: String, schema: StructType): TableState = {
    val fresh = new TableState(schema)
    val prev = tables.putIfAbsent(key, fresh)
    if (prev != null) throw new IllegalStateException(s"table exists: $key")
    fresh
  }
  def get(key: String): Option[TableState] = Option(tables.get(key))
  def drop(key: String): Boolean = tables.remove(key) != null
  def list(prefix: String): Seq[String] =
    { import scala.jdk.CollectionConverters._
      tables.keySet().asScala.filter(_.startsWith(prefix)).toSeq.sorted }
}

class GraftLakeCatalog extends TableCatalog {
  private var catName: String = _
  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catName = name
  override def name(): String = catName

  private def key(ident: Identifier): String =
    (catName +: ident.namespace() :+ ident.name()).mkString(".")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val prefix = (catName +: namespace).mkString(".") + "."
    GraftLakeStore.list(prefix)
      .map(k => Identifier.of(namespace, k.stripPrefix(prefix))).toArray
  }

  override def loadTable(ident: Identifier): Table =
    GraftLakeStore.get(key(ident))
      .map(st => new LakeTable(key(ident), st, pinned = None))
      .getOrElse(throw new NoSuchTableException(ident))

  /** Time travel: `VERSION AS OF n` arrives here as a string. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val st = GraftLakeStore.get(key(ident))
      .getOrElse(throw new NoSuchTableException(ident))
    val v = try version.toInt catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"${key(ident)}: version must be an integer snapshot id, got '$version'")
    }
    require(v >= 0 && v <= st.latestVersion,
      s"${key(ident)}: no snapshot $v (have 0..${st.latestVersion})")
    new LakeTable(key(ident), st, pinned = Some(v))
  }

  /** `TIMESTAMP AS OF` — snapshots carry no wall-clock (deterministic
    * engine: nothing in a declared query may read the clock), so
    * timestamp travel is rejected loudly, not approximated. */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    throw new UnsupportedOperationException(
      s"${key(ident)}: TIMESTAMP AS OF is not supported (snapshots are " +
        "identified by version, not wall-clock); use VERSION AS OF")

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    if (partitions.nonEmpty) throw new UnsupportedOperationException(
      "graft_lake tables are unpartitioned (write-task groups are the read splits)")
    if (GraftLakeStore.get(key(ident)).isDefined)
      throw new TableAlreadyExistsException(ident)
    new LakeTable(key(ident), GraftLakeStore.create(key(ident), schema), pinned = None)
  }

  override def alterTable(ident: Identifier,
      changes: org.apache.spark.sql.connector.catalog.TableChange*): Table =
    throw new UnsupportedOperationException("ALTER TABLE is not supported")
  override def dropTable(ident: Identifier): Boolean =
    GraftLakeStore.drop(key(ident))
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("RENAME TABLE is not supported")
}

/** A table handle, optionally pinned to a snapshot version. Pinned
  * handles are read-only by construction (no write capability), so
  * `INSERT INTO t VERSION AS OF 1` cannot typecheck into existence. */
class LakeTable(ident: String, state: GraftLakeStore.TableState,
    pinned: Option[Int])
    extends Table with SupportsRead with SupportsWrite
    with SupportsRowLevelOperations with SupportsMetadataColumns {

  override def name(): String =
    pinned.fold(ident)(v => s"$ident@v$v")
  override def schema(): StructType = state.schema
  override def capabilities(): util.Set[TableCapability] =
    if (pinned.isDefined) util.EnumSet.of(TableCapability.BATCH_READ)
    else util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  /** `_split`: which write-task group (= read split) holds the row —
    * the in-memory analog of Iceberg's `_file`. Beyond its user value,
    * requesting it from the row-level write keeps the operation on
    * Spark's metadata-projecting write task, the path its own reference
    * tables exercise (the projection-less task hands the writer the
    * RAW MergeRows output, leading `__row_operation` column included —
    * the write schema no longer describes the physical rows). */
  override def metadataColumns(): Array[MetadataColumn] = Array(
    new MetadataColumn {
      override def name(): String = LakeTable.SplitCol
      override def dataType(): DataType = IntegerType
      override def isNullable: Boolean = false
      override def comment(): String =
        "index of the write-task group (read split) holding the row"
    })

  /** The snapshot is captured when the ScanBuilder is created
    * (analysis time): a MERGE's self-read of the target sees the
    * pre-merge state even though its write commits a new version. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val v = pinned.getOrElse(state.latestVersion)
    new LakeScanBuilder(state.snapshot(v), state.schema, s"${name()} v$v")
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(pinned.isEmpty, s"${name()}: a version-pinned read cannot be written")
    new LakeWriteBuilder(state, LakeTable.checkedSchema(state, info))
  }

  /** Group-based (copy-on-write) row-level operations. The operation
    * reports no runtime group filtering, so every group is affected and
    * the rewrite's output is the complete post-operation table — the
    * write below is therefore a full replace. (A storage with real
    * groups would add SupportsRuntimeV2Filtering on the scan and
    * replace only matched files — plan shape is identical.) */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    () => new RowLevelOperation {
      override def command(): RowLevelOperation.Command = info.command()
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
        new LakeScanBuilder(state.snapshot(state.latestVersion), state.schema,
          s"$ident row-level ${info.command()}")
      // see metadataColumns: requesting _split selects the projecting
      // write task, so the writer sees exactly the write schema
      override def requiredMetadataAttributes(): Array[NamedReference] =
        Array(Expressions.column(LakeTable.SplitCol))
      override def newWriteBuilder(writeInfo: LogicalWriteInfo): WriteBuilder =
        new WriteBuilder {
          override def build(): Write =
            new LakeWrite(state, LakeTable.checkedSchema(state, writeInfo),
              replace = true)
        }
    }
}

/** One write task's committed output is one read split: the scan's
  * parallelism mirrors the parallelism of the writes that built the
  * snapshot, the in-memory analog of one-file-per-task layouts. */
private[v2] case class LakeInputPartition(rows: Array[InternalRow], split: Int)
  extends InputPartition

private[v2] class LakeScanBuilder(parts: Array[Array[InternalRow]],
    tableSchema: StructType, desc: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = tableSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new LakeScan(parts, tableSchema, required, desc)
}

private[v2] class LakeScan(parts: Array[Array[InternalRow]],
    tableSchema: StructType, required: StructType, desc: String)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String = desc
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    parts.zipWithIndex.collect {
      case (rows, ix) if rows.nonEmpty => LakeInputPartition(rows, ix): InputPartition
    }
  override def createReaderFactory(): PartitionReaderFactory = {
    // resolved once on the driver: for each required column, the stored
    // ordinal, or -1 for the synthesized _split metadata column
    val ords = required.fields.map { f =>
      if (f.name == LakeTable.SplitCol) -1 else tableSchema.fieldIndex(f.name)
    }
    val types = required.fields.map(_.dataType)
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private val part = p.asInstanceOf[LakeInputPartition]
          private val rows = part.rows
          // reused output buffer, the standard reader contract
          // (consumers that buffer must copy, and do)
          private val out =
            new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(ords.length)
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow = {
            val r = rows(i)
            var j = 0
            while (j < ords.length) {
              out.update(j,
                if (ords(j) < 0) part.split else r.get(ords(j), types(j)))
              j += 1
            }
            out
          }
          override def close(): Unit = ()
        }
    }
  }
}

object LakeTable {
  private[v2] val SplitCol = "_split"

  /** The writer projects incoming rows with the WRITE schema — which
    * must be the table schema, column for column (Spark reorders INSERT
    * output and plans ReplaceData against the operation table schema;
    * anything else here is a wiring bug better caught loudly than
    * decoded as garbage). */
  private[v2] def checkedSchema(state: GraftLakeStore.TableState,
      info: LogicalWriteInfo): StructType = {
    val w = info.schema()
    require(w.length == state.schema.length &&
        w.fields.zip(state.schema.fields).forall { case (a, b) =>
          a.name == b.name && DataType.equalsIgnoreNullability(a.dataType, b.dataType) },
      s"write schema ${w.simpleString} does not match table schema " +
        s"${state.schema.simpleString}")
    w
  }
}

private[v2] class LakeWriteBuilder(state: GraftLakeStore.TableState,
    writeSchema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var replace = false
  override def truncate(): WriteBuilder = { replace = true; this }
  override def build(): Write = new LakeWrite(state, writeSchema, replace)
}

private[v2] class LakeWrite(state: GraftLakeStore.TableState,
    writeSchema: StructType, replace: Boolean)
    extends Write with BatchWrite {
  override def toBatch: BatchWrite = this
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new LakeWriterFactory(writeSchema)
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    state.commit(messages.map(_.asInstanceOf[LakeCommit].rows), replace)
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[v2] case class LakeCommit(rows: Array[InternalRow])
  extends WriterCommitMessage

private[v2] class LakeWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      // the incoming row may be any InternalRow over REUSED buffers
      // (a shallow copy() of such a row holds stale string offsets —
      // field reads later decode garbage); rendering through an
      // UnsafeProjection of the table schema materializes every value
      // into a fresh self-contained UnsafeRow
      private val toUnsafe =
        org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(schema)
      private val buf = ArrayBuffer[InternalRow]()
      override def write(row: InternalRow): Unit = buf += toUnsafe(row).copy()
      // the metadata-projecting write task hands (metadata, data) —
      // the split a row came from does not pin where it lands
      override def write(meta: InternalRow, row: InternalRow): Unit =
        write(row)
      override def commit(): WriterCommitMessage = LakeCommit(buf.toArray)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}
