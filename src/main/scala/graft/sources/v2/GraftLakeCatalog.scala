package graft.sources.v2

import java.util
import java.util.UUID

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, MetadataColumn, SupportsMetadataColumns, SupportsRead, SupportsRowLevelOperations, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.filter.{Predicate => V2Predicate}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, DeltaBatchWrite, DeltaWrite, DeltaWriteBuilder, DeltaWriter, DeltaWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, SupportsDelta, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{And, EqualNullSafe, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual, Not, Or}
import org.apache.spark.sql.types.{BooleanType, ByteType, DataType, IntegerType, LongType, ShortType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import GraftLakeStore.{LakeFile, PendingDv, PendingFile, Snapshot, TableHandle}

/** A DataSource-V2 `TableCatalog` whose tables support the row-level
  * operation protocol (`MERGE INTO` / `UPDATE` / `DELETE` as SQL
  * statements) and versioned time-travel reads (`VERSION AS OF n`) —
  * the two warehouse front doors Spark's built-in file catalog lacks
  * (a v1 parquet table answers MERGE with UNSUPPORTED_FEATURE.
  * TABLE_OPERATION; reference analog: the reference pipeline only ever
  * overwrites whole tables, src/data_processor.py:237-269, so both
  * statements are capability-rounding on top of its surface).
  *
  * Storage is [[GraftLakeStore]]: parquet data files + a JSON manifest
  * per snapshot under a table root — tables survive the process, and a
  * fresh catalog instance (another session, another JVM) pointed at the
  * same root reads every committed version (LakePersistenceSpec pins
  * it). Plan-side machinery:
  *
  *  - [[LakeTable.newRowLevelOperationBuilder]] declares GROUP-BASED
  *    (copy-on-write) execution: Spark's own RewriteMergeIntoTable /
  *    RewriteUpdateTable / RewriteDeleteFromTable rules plan the
  *    distributed join of target against source and apply the actions
  *    inside it (MergeRows). The operation's scan implements
  *    [[SupportsRuntimeV2Filtering]] on the `_split` file-id column, so
  *    Spark's RowLevelOperationRuntimeGroupFiltering rule plans a
  *    matching-groups subquery and the rewrite touches ONLY files that
  *    hold matched rows — a single-key UPDATE on a 100 TB table
  *    rewrites one file, with every untouched file carried into the new
  *    snapshot by manifest reference (RuntimeGroupFilterSpec pins the
  *    rewritten-file count).
  *  - Every commit creates a new immutable snapshot; `loadTable(ident,
  *    version)` pins a scan to an old snapshot (`VERSION AS OF`), and a
  *    row-level commit that discovers a concurrent commit landed after
  *    its scan fails loudly (optimistic concurrency) instead of
  *    last-writer-wins.
  *  - Identity-partitioned tables record partition values per file in
  *    the manifest; partition predicates prune files at planning
  *    (`pushedFilters` + a split-count metric pin in the spec).
  *  - `ALTER TABLE ADD COLUMN` is a metadata-only commit: old files
  *    read nulls for the new field, old snapshots keep their schema.
  */
class GraftLakeCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {
  private var catName: String = _
  private var root: String = _

  /** Maintenance procedures under the `system` namespace (`CALL
    * graft_lake.system.expire_snapshots(...)`, the Iceberg shape). */
  override def listProcedures(namespace: Array[String]):
      Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      LakeProcedures.names.map(n => Identifier.of(namespace, n)).toArray
    else Array.empty
  override def loadProcedure(ident: Identifier):
      org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    require(ident.namespace().sameElements(Array("system")),
      s"procedures live in the 'system' namespace, got ${ident.namespace().mkString(".")}")
    LakeProcedures(root, ident.name()).getOrElse(
      throw new IllegalArgumentException(
        s"no procedure '${ident.name()}' (have ${LakeProcedures.names.mkString(", ")})"))
  }

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catName = name
    root = Option(options.get("root")).getOrElse(GraftLakeStore.defaultRoot)
  }
  override def name(): String = catName

  /** Storage key = namespace + table name. The CATALOG name is a
    * session-local alias and deliberately not part of it: two sessions
    * registering the same root under different names read and write the
    * same tables (LakeStoreSpec pins it). */
  private def key(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(".")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val prefix = namespace.mkString(".") + "."
    GraftLakeStore.list(root, prefix)
      .map(k => Identifier.of(namespace, k.stripPrefix(prefix))).toArray
  }

  /** Plain loads resolve the table; a `$files` / `$history` / `$tags`
    * / `$refs` suffix resolves the base table's METADATA as a read-only table
    * (the Iceberg metadata-table convention): manifests rendered as
    * rows, so table introspection is plain SQL — and the oracle can
    * gate the manifests' accounting against the data. */
  override def loadTable(ident: Identifier): Table = {
    val name = ident.name()
    val dollar = name.lastIndexOf('$')
    if (dollar > 0) {
      val base = Identifier.of(ident.namespace(), name.substring(0, dollar))
      val kind = name.substring(dollar + 1)
      val h = GraftLakeStore.get(root, key(base))
        .getOrElse(throw new NoSuchTableException(base))
      return LakeMetaTable(key(ident), h, kind).getOrElse(
        throw new NoSuchTableException(ident))
    }
    GraftLakeStore.get(root, key(ident))
      .map(h => new LakeTable(key(ident), h, pinned = None))
      .getOrElse(throw new NoSuchTableException(ident))
  }

  /** Time travel: `VERSION AS OF n` arrives here as a string — an
    * integer snapshot id, or a TAG name (`VERSION AS OF 'release1'`)
    * resolved through the table's refs. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val h = GraftLakeStore.get(root, key(ident))
      .getOrElse(throw new NoSuchTableException(ident))
    val v = h.resolveVersion(version)
    val latest = h.latestVersion
    require(v >= 0 && v <= latest,
      s"${key(ident)}: no snapshot $v (have 0..$latest)")
    new LakeTable(key(ident), h, pinned = Some(v))
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
    // '$' is the metadata-table discriminator in loadTable — a data
    // table carrying it would be unreadable right after its CREATE
    require(!ident.name().contains('$'),
      s"table name '${ident.name()}' may not contain '$$' (reserved for " +
        "metadata tables: t$files / t$history / t$tags / t$refs / t$partitions)")
    val pfields = partitions.toSeq.map(LakeTable.parseTransform(schema, _))
    require(pfields.map(_.name).distinct.size == pfields.size,
      s"duplicate partition fields in ${pfields.map(_.name).mkString(", ")}")
    // a transform field's generated name must not shadow a schema
    // column — the collision would be permanently confusing in
    // t$files/t$partitions renderings
    pfields.filterNot(_.transform == "identity").foreach { f =>
      require(!schema.fieldNames.contains(f.name),
        s"partition field name ${f.name} collides with a schema column; " +
          "rename the column or change the transform parameter")
    }
    // persist only the properties the engine interprets; Spark adds
    // bookkeeping keys (owner, provider, …) a manifest need not carry
    val mode = Option(properties.get(LakeTable.DmlModeProp))
      .getOrElse(LakeTable.CopyOnWrite)
    require(mode == LakeTable.CopyOnWrite || mode == LakeTable.MergeOnRead,
      s"${LakeTable.DmlModeProp} must be '${LakeTable.CopyOnWrite}' or " +
        s"'${LakeTable.MergeOnRead}', got '$mode'")
    val advisory = Option(properties.get(LakeTable.AdvisoryBytesProp))
    advisory.foreach { v =>
      require(scala.util.Try(v.toLong).toOption.exists(_ >= 0L),
        s"${LakeTable.AdvisoryBytesProp} must be a non-negative byte " +
          s"count, got '$v'")
    }
    val props =
      (if (mode == LakeTable.CopyOnWrite) Map.empty[String, String]
       else Map(LakeTable.DmlModeProp -> mode)) ++
        advisory.map(LakeTable.AdvisoryBytesProp -> _)
    val h =
      try GraftLakeStore.create(root, key(ident), schema, pfields, props)
      catch {
        // both the pre-checked path and a lost CREATE race raise the
        // typed error Spark callers expect
        case _: java.nio.file.FileAlreadyExistsException =>
          throw new TableAlreadyExistsException(ident)
      }
    new LakeTable(key(ident), h, pinned = None)
  }

  /** Schema evolution — ALL metadata-only commits (no file rewritten,
    * old snapshots keep their schema + mapping):
    *
    *  - ADD COLUMN (nullable, top-level): old files read NULL for the
    *    new field. If the name was EVER used as a physical column in a
    *    current file (add → drop → re-add), the new column gets a fresh
    *    physical name so the dropped column's stale data cannot
    *    resurrect.
    *  - RENAME COLUMN: the logical name remaps onto the column's
    *    birth-assigned PHYSICAL name (Delta's column-mapping device) —
    *    data written before and after the rename shares one physical
    *    column, and `VERSION AS OF` reads under the old name.
    *  - DROP COLUMN: the field and its mapping vanish from the schema;
    *    files keep the physical data (time travel still reads it).
    *
    * Partition columns can be neither renamed nor dropped (their values
    * key the manifests); anything else is rejected loudly. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val h = GraftLakeStore.get(root, key(ident))
      .getOrElse(throw new NoSuchTableException(ident))
    val cur = h.snapshot(h.latestVersion)
    def oneField(names: Array[String], what: String): String = {
      require(names.length == 1,
        s"$what supports top-level columns only, got ${names.mkString(".")}")
      names(0)
    }
    val (nextSchema, nextPhys) = changes.foldLeft((cur.schema, cur.colPhys)) {
      case ((s, m), add: TableChange.AddColumn) =>
        require(add.isNullable,
          "ADD COLUMN must be nullable: existing rows have no value for it")
        val name = oneField(add.fieldNames(), "ADD COLUMN")
        require(!s.fieldNames.contains(name), s"column $name already exists")
        // physical names still reachable: any current file's columns
        // plus every live mapping target — a collision means stale data
        // under this name exists somewhere, so mint a fresh one (and
        // keep minting until free: a user column may literally carry
        // the minted shape, e.g. `note__v3`)
        val used = cur.files.flatMap(_.columns).toSet ++
          s.fieldNames.map(n => m.getOrElse(n, n))
        val m2 =
          if (!used.contains(name)) m
          else {
            var cand = s"${name}__v${cur.version + 1}"
            var i = 0
            while (used.contains(cand)) {
              i += 1
              cand = s"${name}__v${cur.version + 1}_$i"
            }
            m + (name -> cand)
          }
        (s.add(StructField(name, add.dataType(), nullable = true)), m2)
      case ((s, m), rn: TableChange.RenameColumn) =>
        val from = oneField(rn.fieldNames(), "RENAME COLUMN")
        val to = rn.newName()
        require(s.fieldNames.contains(from), s"column $from does not exist")
        require(!s.fieldNames.contains(to), s"column $to already exists")
        require(!cur.partFields.exists(_.col == from),
          s"cannot RENAME partition column $from (its values key the manifests)")
        val phys = m.getOrElse(from, from)
        val fields = s.fields.map(f => if (f.name == from) f.copy(name = to) else f)
        (StructType(fields), m - from + (to -> phys))
      case ((s, m), del: TableChange.DeleteColumn) =>
        val name = oneField(del.fieldNames(), "DROP COLUMN")
        if (!s.fieldNames.contains(name)) {
          require(del.ifExists() == java.lang.Boolean.TRUE,
            s"column $name does not exist")
          (s, m)
        } else {
          require(!cur.partFields.exists(_.col == name),
            s"cannot DROP partition column $name (its values key the manifests)")
          require(s.length > 1, "cannot DROP the last column")
          // a live equality-delete ref needs its key columns' types to
          // decode the delete file — dropping one would orphan the
          // deletes and resurrect rows; compact (INSERT OVERWRITE)
          // first, which purges eq refs
          require(!cur.eqDels.flatMap(_.keyCols)
              .contains(m.getOrElse(name, name)),
            s"cannot DROP column $name: it is an equality-delete key of a " +
              "live delete file (compact the table first)")
          (StructType(s.fields.filterNot(_.name == name)), m - name)
        }
      case (_, other) =>
        throw new UnsupportedOperationException(
          s"ALTER TABLE ${key(ident)}: only ADD/RENAME/DROP COLUMN are " +
            s"supported, got $other")
    }
    h.commitSchema(nextSchema, nextPhys)
    new LakeTable(key(ident), h, pinned = None)
  }

  override def dropTable(ident: Identifier): Boolean =
    GraftLakeStore.drop(root, key(ident))

  /** RENAME TABLE: a metadata move in the store — one atomic directory
    * rename, preserving every snapshot, tag, and data file (manifest
    * paths are relative). The old name fails with the typed
    * NoSuchTableException afterwards. */
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    try GraftLakeStore.rename(root, key(oldIdent), key(newIdent))
    catch {
      case _: java.nio.file.NoSuchFileException =>
        throw new NoSuchTableException(oldIdent)
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new TableAlreadyExistsException(newIdent)
    }
}

/** A table handle, optionally pinned to a snapshot version. Pinned
  * handles are read-only by construction (no write capability), so
  * `INSERT INTO t VERSION AS OF 1` cannot typecheck into existence. */
class LakeTable(ident: String, handle: TableHandle, pinned: Option[Int])
    extends Table with SupportsRead with SupportsWrite
    with SupportsRowLevelOperations with SupportsMetadataColumns {

  override def name(): String =
    pinned.fold(ident)(v => s"$ident@v$v")
  override def schema(): StructType =
    handle.snapshot(pinned.getOrElse(LakeTable.readVersion(handle))).schema
  override def properties(): util.Map[String, String] = {
    val m = new util.HashMap[String, String]()
    handle.snapshot(pinned.getOrElse(LakeTable.readVersion(handle))).props
      .foreach { case (k, v) => m.put(k, v) }
    m
  }
  private def mergeOnRead: Boolean =
    handle.snapshot(handle.latestVersion).props
      .get(LakeTable.DmlModeProp).contains(LakeTable.MergeOnRead)
  override def capabilities(): util.Set[TableCapability] =
    if (pinned.isDefined) util.EnumSet.of(TableCapability.BATCH_READ)
    else util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE)

  /** `_split`: the stable id of the data FILE holding the row — the
    * lake analog of Iceberg's `_file`, doubling as the GROUP identity
    * for copy-on-write row-level operations. Requesting it from the
    * row-level write also keeps the operation on Spark's
    * metadata-projecting write task, the path its own reference tables
    * exercise (the projection-less task hands the writer the RAW
    * MergeRows output, leading `__row_operation` column included — the
    * write schema no longer describes the physical rows).
    *
    * `_pos`: the row's position within its data file (Iceberg's `_pos`)
    * — with `_split` it forms the stable ROW IDENTITY merge-on-read
    * row-level operations delete by (a position-delete names exactly
    * one physical row, forever: data files are immutable). */
  override def metadataColumns(): Array[MetadataColumn] = Array(
    new MetadataColumn {
      override def name(): String = LakeTable.SplitCol
      override def dataType(): DataType = IntegerType
      override def isNullable: Boolean = false
      override def comment(): String =
        "stable id of the data file (write group) holding the row"
    },
    new MetadataColumn {
      override def name(): String = LakeTable.PosCol
      override def dataType(): DataType = LongType
      override def isNullable: Boolean = false
      override def comment(): String =
        "row position within the data file (with _split: the stable row id)"
    })

  /** The snapshot is captured when the ScanBuilder is created
    * (analysis time): a MERGE's self-read of the target sees the
    * pre-merge state even though its write commits a new version. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val snap = handle.snapshot(pinned.getOrElse(LakeTable.readVersion(handle)))
    new LakeScanBuilder(handle, snap, s"${name()} v${snap.version}")
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(pinned.isEmpty, s"${name()}: a version-pinned read cannot be written")
    new LakeWriteBuilder(handle, LakeTable.checkedSchema(handle, info),
      info.queryId())
  }

  /** Group-based (copy-on-write) row-level operations with RUNTIME
    * GROUP FILTERING: the operation's scan reports `_split` as its
    * filter attribute, Spark's RowLevelOperationRuntimeGroupFiltering
    * rule computes the matched file ids in a subquery, and the scan
    * drops every other file — so the rewrite's output (and the commit's
    * replaced set) covers exactly the files holding matched rows;
    * untouched files carry over by manifest reference. The scan and the
    * write share this operation instance: the write's commit replaces
    * precisely the files the (possibly runtime-filtered) scan read,
    * against the base version the scan resolved — any concurrent commit
    * in between fails the replace loudly (optimistic concurrency). */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    if (mergeOnRead) () => new LakeDeltaOperation(ident, handle, info)
    else () => new RowLevelOperation {
      @volatile private var builtScan: LakeScan = _
      override def command(): RowLevelOperation.Command = info.command()
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
        val snap = handle.snapshot(LakeTable.readVersion(handle))
        new LakeScanBuilder(handle, snap, s"$ident row-level ${info.command()}",
            rowLevel = true) {
          override def build(): Scan = {
            val s = super.build().asInstanceOf[LakeScan]
            builtScan = s
            s
          }
        }
      }
      // see metadataColumns: requesting _split selects the projecting
      // write task, so the writer sees exactly the write schema
      override def requiredMetadataAttributes(): Array[NamedReference] =
        Array(Expressions.column(LakeTable.SplitCol))
      override def newWriteBuilder(writeInfo: LogicalWriteInfo): WriteBuilder =
        new WriteBuilder {
          override def build(): Write = {
            val scan = builtScan
            require(scan != null,
              s"$ident: row-level write built before its scan — protocol wiring bug")
            new LakeWrite(handle, LakeTable.checkedSchema(handle, writeInfo),
              LakeWrite.Replace(scan))
          }
        }
    }
}

/** Merge-on-read row-level operation (Spark's DELTA-based protocol,
  * [[SupportsDelta]]): instead of rewriting matched GROUPS, the rewrite
  * plans produce a stream of per-ROW actions — delete(rowId) /
  * insert(row) — and the writer records deletes as position-delete
  * vectors keyed by the stable row identity `(_split, _pos)`. No data
  * file is rewritten, ever: a DELETE matching 0.1% of a 100 TB table
  * commits KBs of delete parquet, where copy-on-write would rewrite the
  * matched files. Updates are represented as delete+reinsert
  * ([[SupportsDelta.representUpdateAsDeleteAndInsert]]), the position-
  * delete storage model's native shape (Iceberg v2 does the same).
  * The static filter pushdown on the operation's scan still bounds
  * which files are READ (partition + min/max pruning); what changed vs
  * copy-on-write is only what gets WRITTEN. */
private[v2] class LakeDeltaOperation(ident: String, handle: TableHandle,
    info: RowLevelOperationInfo) extends RowLevelOperation with SupportsDelta {

  @volatile private var builtScan: LakeScan = _

  override def command(): RowLevelOperation.Command = info.command()

  /** Deliberately NOT runtime-filterable (rowLevel=false): Spark's
    * RowLevelOperationRuntimeGroupFiltering matches only group-based
    * ReplaceData plans — for WriteDelta there is no runtime
    * group-filtering rule to hook into (the delta plan's own join is
    * already per-row minimal on the WRITE side), so static partition +
    * min/max pruning is the read-side bound here, as in Iceberg. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val snap = handle.snapshot(LakeTable.readVersion(handle))
    new LakeScanBuilder(handle, snap, s"$ident merge-on-read ${info.command()}") {
      override def build(): Scan = {
        val s = super.build().asInstanceOf[LakeScan]
        builtScan = s
        s
      }
    }
  }

  /** The stable row identity a position delete names. */
  override def rowId(): Array[NamedReference] = Array(
    Expressions.column(LakeTable.SplitCol),
    Expressions.column(LakeTable.PosCol))

  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def requiredMetadataAttributes(): Array[NamedReference] = Array.empty

  override def newWriteBuilder(writeInfo: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = {
        val scan = builtScan
        require(scan != null,
          s"$ident: delta write built before its scan — protocol wiring bug")
        // the row schema (insert/reinsert payload) must be the table
        // schema; a DELETE-only plan may carry no row schema at all
        val rowSchema = writeInfo.schema()
        if (rowSchema.nonEmpty) LakeTable.checkedSchema(handle, writeInfo)
        new LakeDeltaWrite(handle, scan,
          rebaseAppends = info.command() != RowLevelOperation.Command.MERGE)
      }
    }
}

/** Read-only metadata tables (`t$files`, `t$history`, `t$tags`):
  * manifests rendered as rows at scan-planning time. Row volume is
  * metadata-sized (files per snapshot / history length / tag count),
  * never data-sized — the one place carrying rows through planning is
  * correct by construction. */
private[v2] object LakeMetaTable {
  import org.apache.spark.sql.connector.catalog.TableCapability

  def apply(name: String, h: TableHandle, kind: String): Option[Table] = {
    def str(s: String) = UTF8String.fromString(s)
    kind match {
      case "files" => Some(new LakeMetaTable(name, StructType(Seq(
        StructField("file_id", IntegerType, nullable = false),
        StructField("path", StringType, nullable = false),
        StructField("rows", LongType, nullable = false),
        StructField("live_rows", LongType, nullable = false),
        StructField("bytes", LongType, nullable = false),
        StructField("dels", LongType, nullable = false),
        StructField("dv_count", IntegerType, nullable = false),
        StructField("partition", StringType, nullable = true))),
        () => {
          val sn = h.snapshot(h.latestVersion)
          sn.files.map { f =>
            val part =
              if (f.partition.isEmpty) null
              else str(f.partition.toSeq.sortBy(_._1).map { case (k, v) =>
                s"$k=${v.getOrElse("null")}" }.mkString(","))
            Seq[Any](f.id, str(f.path), f.rows, f.liveRows, f.bytes,
              f.rows - f.liveRows, f.dvs.size, part)
          }
        }))
      case "history" => Some(new LakeMetaTable(name, StructType(Seq(
        StructField("version", IntegerType, nullable = false),
        StructField("operation", StringType, nullable = false),
        StructField("n_files", IntegerType, nullable = false),
        StructField("n_rows", LongType, nullable = false),
        StructField("live_rows", LongType, nullable = false))),
        () => (0 to h.latestVersion).flatMap { v =>
          try {
            val sn = h.snapshot(v)
            Some(Seq[Any](v, str(sn.op), sn.files.size,
              sn.files.map(_.rows).sum, sn.files.map(_.liveRows).sum))
          } catch { case _: IllegalStateException => None } // expired
        }))
      case "tags" => Some(new LakeMetaTable(name, StructType(Seq(
        StructField("tag", StringType, nullable = false),
        StructField("version", IntegerType, nullable = false))),
        () => h.tags().toSeq.sortBy(_._1).map { case (t, v) =>
          Seq[Any](str(t), v) }))
      // per-partition rollup from manifests (Iceberg's `partitions`
      // metadata table): one row per distinct partition-value tuple in
      // the CURRENT snapshot. After a partition-spec evolution, files
      // written under different specs render different tuples — the
      // table makes the mixed state inspectable from SQL. Row volume =
      // number of live partition values, metadata-sized.
      case "partitions" => Some(new LakeMetaTable(name, StructType(Seq(
        StructField("partition", StringType, nullable = true),
        StructField("n_files", IntegerType, nullable = false),
        StructField("rows", LongType, nullable = false),
        StructField("live_rows", LongType, nullable = false),
        StructField("bytes", LongType, nullable = false))),
        () => {
          val sn = h.snapshot(h.latestVersion)
          sn.files.groupBy { f =>
            if (f.partition.isEmpty) null
            else f.partition.toSeq.sortBy(_._1).map { case (k, v) =>
              s"$k=${v.getOrElse("null")}" }.mkString(",")
          }.toSeq.sortBy { case (p, _) => Option(p).getOrElse("") }
            .map { case (p, fs) =>
              Seq[Any](Option(p).map(str).orNull, fs.size,
                fs.map(_.rows).sum, fs.map(_.liveRows).sum,
                fs.map(_.bytes).sum)
            }
        }))
      // every named ref, tags AND branches (t$tags predates branches
      // and keeps its narrower schema for compatibility)
      case "refs" => Some(new LakeMetaTable(name, StructType(Seq(
        StructField("name", StringType, nullable = false),
        StructField("kind", StringType, nullable = false),
        StructField("version", IntegerType, nullable = false))),
        () => (h.tags().toSeq.map { case (t, v) =>
          Seq[Any](str(t), str("tag"), v) } ++
          h.branches().toSeq.map { case (b, v) =>
            Seq[Any](str(b), str("branch"), v) }).sortBy(_.head.toString)))
      case _ => None
    }
  }

  private class LakeMetaTable(name0: String, schema0: StructType,
      rows: () => Seq[Seq[Any]]) extends Table with SupportsRead {
    override def name(): String = name0
    override def schema(): StructType = schema0
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      () => new LakeRowsScan(name0, schema0, rows())
  }
}

/** A batch scan over pre-rendered catalyst rows — one synthetic
  * partition; used by the metadata tables and procedure results, both
  * metadata-sized by construction. */
private[v2] class LakeRowsScan(name0: String, schema0: StructType,
    rows: Seq[Seq[Any]]) extends Scan with Batch {
  override def readSchema(): StructType = schema0
  override def description(): String = name0
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(LakeMetaPartition(rows))
  override def createReaderFactory(): PartitionReaderFactory =
    (p: InputPartition) => {
      val it = p.asInstanceOf[LakeMetaPartition].rows.iterator
      new PartitionReader[InternalRow] {
        private var cur: InternalRow = _
        override def next(): Boolean = {
          if (!it.hasNext) return false
          cur = LakeRows.render(it.next())
          true
        }
        override def get(): InternalRow = cur
        override def close(): Unit = ()
      }
    }
}

private[v2] case class LakeMetaPartition(rows: Seq[Seq[Any]])
  extends InputPartition

/** One place renders pre-built catalyst values into an InternalRow —
  * shared by the metadata-table reader, the manifest-count reader, and
  * procedure results. */
private[v2] object LakeRows {
  def render(vals: Seq[Any]): InternalRow = {
    val row = new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(vals.length)
    vals.indices.foreach(i => row.update(i, vals(i)))
    row
  }
}

/** Maintenance procedures (`CALL graft_lake.system.<proc>(...)` —
  * Spark 4's DSv2 procedure protocol, the Iceberg convention): the
  * lifecycle actions that are statements in a warehouse, not handle
  * API calls. Each returns its effect as rows (what expired, what was
  * vacuumed, the tag written) so the action is auditable from SQL. */
private[v2] object LakeProcedures {
  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}

  val names: Seq[String] =
    Seq("expire_snapshots", "vacuum", "create_tag", "drop_tag",
      "create_branch", "drop_branch", "fast_forward",
      "add_partition_field", "drop_partition_field", "cherry_pick")

  private def str(s: String) = UTF8String.fromString(s)

  private def handle(root: String, table: String): TableHandle =
    GraftLakeStore.get(root, table).getOrElse(
      throw new IllegalArgumentException(s"no lake table '$table' under $root"))

  private def proc(name0: String, params: Seq[ProcedureParameter],
      out: StructType)(run: InternalRow => Seq[Seq[Any]]): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = name0
      override def description(): String = s"graft_lake maintenance: $name0"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = name0
          override def description(): String = s"graft_lake maintenance: $name0"
          override def parameters(): Array[ProcedureParameter] = params.toArray
          override def isDeterministic: Boolean = false // mutates table state
          // procedure output must be a LocalScan (Spark's temporary
          // restriction) — fine: results are effect reports, tiny by
          // construction
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val result = run(input)
            val local = new org.apache.spark.sql.connector.read.LocalScan {
              override def readSchema(): StructType = out
              override def description(): String = name0
              override def rows(): Array[InternalRow] =
                result.map(LakeRows.render).toArray
            }
            java.util.Collections.singletonList(local: Scan).iterator()
          }
        }
    }

  def apply(root: String, name: String): Option[UnboundProcedure] = name match {
    case "expire_snapshots" => Some(proc(name,
      Seq(ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("keep_last", IntegerType).build()),
      StructType(Seq(StructField("expired_version", IntegerType, nullable = false)))) {
      in =>
        handle(root, in.getUTF8String(0).toString)
          .expireSnapshots(in.getInt(1)).map(v => Seq[Any](v))
    })
    // min_age_seconds guards in-flight writes (their files are
    // unreferenced until commit): default one hour, pass 0 only in a
    // maintenance window with no writers
    case "vacuum" => Some(proc(name,
      Seq(ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("min_age_seconds", LongType)
          .defaultValue("3600").build()),
      StructType(Seq(StructField("removed_file", StringType, nullable = false)))) {
      in =>
        handle(root, in.getUTF8String(0).toString)
          .vacuumOrphans(minAgeMs = in.getLong(1) * 1000L)
          .map(n => Seq[Any](str(n)))
    })
    case "create_tag" => Some(proc(name,
      Seq(ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("tag", StringType).build(),
        ProcedureParameter.in("version", IntegerType).build()),
      StructType(Seq(StructField("tag", StringType, nullable = false),
        StructField("version", IntegerType, nullable = false)))) {
      in =>
        val t = in.getUTF8String(1).toString
        val v = in.getInt(2)
        handle(root, in.getUTF8String(0).toString).createTag(t, v)
        Seq(Seq[Any](str(t), v))
    })
    case "drop_tag" => Some(proc(name,
      Seq(ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("tag", StringType).build()),
      StructType(Seq(StructField("dropped", BooleanType, nullable = false)))) {
      in =>
        Seq(Seq[Any](handle(root, in.getUTF8String(0).toString)
          .dropTag(in.getUTF8String(1).toString)))
    })
    case "create_branch" => Some(proc(name,
      Seq(ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("branch", StringType).build(),
        ProcedureParameter.in("version", IntegerType).build()),
      StructType(Seq(StructField("branch", StringType, nullable = false),
        StructField("version", IntegerType, nullable = false)))) {
      in =>
        val b = in.getUTF8String(1).toString
        val v = in.getInt(2)
        handle(root, in.getUTF8String(0).toString).createBranch(b, v)
        Seq(Seq[Any](str(b), v))
    })
    case "drop_branch" => Some(proc(name,
      Seq(ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("branch", StringType).build()),
      StructType(Seq(StructField("dropped", BooleanType, nullable = false)))) {
      in =>
        Seq(Seq[Any](handle(root, in.getUTF8String(0).toString)
          .dropBranch(in.getUTF8String(1).toString)))
    })
    // PARTITION-SPEC EVOLUTION (Iceberg's signature migration): a
    // METADATA-ONLY commit — new files write under the new spec,
    // existing files keep and prune by the values of the spec they
    // were written under; old snapshots time-travel under their old
    // spec. `transform` = 'identity' (default) | 'bucket[N]' |
    // 'truncate[W]'. Returns the new spec and version.
    case "add_partition_field" => Some(proc(name,
      Seq(ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("column", StringType).build(),
        ProcedureParameter.in("transform", StringType)
          .defaultValue("'identity'").build()),
      StructType(Seq(StructField("partition_spec", StringType, nullable = false),
        StructField("version", IntegerType, nullable = false)))) {
      in =>
        val h = handle(root, in.getUTF8String(0).toString)
        val c = in.getUTF8String(1).toString
        val tf = in.getUTF8String(2).toString
        val cur = h.snapshot(h.latestVersion)
        val f = cur.schema.fields.find(_.name == c).getOrElse(
          throw new IllegalArgumentException(
            s"partition column $c not in schema"))
        val spec = "^(identity|bucket\\[(\\d+)\\]|truncate\\[(\\d+)\\])$".r
        val field = tf match {
          case spec("identity", _, _) => GraftLakeStore.PartField(c)
          case spec(t, b, w) if t.startsWith("bucket") =>
            GraftLakeStore.PartField(c, "bucket", b.toInt)
          case spec(t, _, w) if t.startsWith("truncate") =>
            GraftLakeStore.PartField(c, "truncate", w.toInt)
          case other => throw new IllegalArgumentException(
            s"transform must be identity | bucket[N] | truncate[W], got '$other'")
        }
        require(field.transform == "identity" || field.param > 0,
          s"${field.transform} parameter must be positive")
        require(LakeTransforms.supported(field.transform, f.dataType),
          s"partition column $c: ${f.dataType.simpleString} does not " +
            s"support the ${field.transform} transform")
        require(!cur.partFields.map(_.name).contains(field.name),
          s"${field.name} is already a partition field")
        require(field.transform == "identity" ||
            !cur.schema.fieldNames.contains(field.name),
          s"partition field name ${field.name} collides with a schema column")
        val next = cur.partFields :+ field
        val v = h.commitPartitionSpec(next)
        Seq(Seq[Any](str(next.map(_.name).mkString("[", ", ", "]")), v))
    })
    case "drop_partition_field" => Some(proc(name,
      Seq(ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("column", StringType).build()),
      StructType(Seq(StructField("partition_spec", StringType, nullable = false),
        StructField("version", IntegerType, nullable = false)))) {
      in =>
        val h = handle(root, in.getUTF8String(0).toString)
        val c = in.getUTF8String(1).toString
        val cur = h.snapshot(h.latestVersion)
        // match by FIELD name first (k_bucket_8), else by unique
        // source column
        val byName = cur.partFields.filter(_.name == c)
        val victims = if (byName.nonEmpty) byName
          else cur.partFields.filter(_.col == c)
        require(victims.size == 1,
          if (victims.isEmpty)
            s"$c is not a partition field (spec: " +
              s"${cur.partFields.map(_.name).mkString(", ")})"
          else s"$c names ${victims.size} partition fields " +
            s"(${victims.map(_.name).mkString(", ")}); drop by field name")
        val next = cur.partFields.filterNot(_ == victims.head)
        val v = h.commitPartitionSpec(next)
        Seq(Seq[Any](str(next.map(_.name).mkString("[", ", ", "]")), v))
    })
    // divergence repair: re-apply one PURE-APPEND snapshot's file delta
    // onto a branch head (data files shared by reference, fresh ids);
    // non-append snapshots are rejected loudly — their deltas were
    // computed against their own parent and cannot move bases
    case "cherry_pick" => Some(proc(name,
      Seq(ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("branch", StringType).build(),
        ProcedureParameter.in("version", IntegerType).build()),
      StructType(Seq(StructField("picked_version", IntegerType, nullable = false),
        StructField("new_version", IntegerType, nullable = false)))) {
      in =>
        val picked = in.getInt(2)
        val v = handle(root, in.getUTF8String(0).toString)
          .cherryPick(in.getUTF8String(1).toString, picked)
        Seq(Seq[Any](picked, v))
    })
    // the PUBLISH half of write-audit-publish: branch `to` (usually
    // 'main') jumps to branch `from`'s head (usually the audit branch)
    case "fast_forward" => Some(proc(name,
      Seq(ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("to", StringType).build(),
        ProcedureParameter.in("from", StringType).build()),
      StructType(Seq(StructField("previous_version", IntegerType, nullable = false),
        StructField("current_version", IntegerType, nullable = false)))) {
      in =>
        val (prev, cur) = handle(root, in.getUTF8String(0).toString)
          .fastForward(in.getUTF8String(1).toString, in.getUTF8String(2).toString)
        Seq(Seq[Any](prev, cur))
    })
    case _ => None
  }
}

object LakeTable {
  private[v2] val SplitCol = "_split"
  private[v2] val PosCol = "_pos"

  /** Session branch context (`SET spark.graft.lake.branch = audit` —
    * Iceberg's `spark.wap.branch` device): un-pinned reads of a table
    * carrying that branch resolve its head, and writes advance it. A
    * table without the named branch falls back to `main` if one exists
    * (the default lineage once a table opts into branching), else the
    * log head — so the conf is safe to leave set across tables. */
  private[v2] val BranchConf = "spark.graft.lake.branch"

  private def sessionBranch(): Option[String] =
    try Option(org.apache.spark.sql.internal.SQLConf.get
      .getConfString(BranchConf, null)).map(_.trim).filter(_.nonEmpty)
    catch { case _: Throwable => None } // no active session (tests/tools)

  /** The branch a default read/write follows on `handle`: the session
    * context branch if the table has it, else `main` if it exists —
    * (name, head). None = the table has no applicable branch and reads
    * and writes ride the log head (pre-branch behavior, unchanged).
    * Direct per-name file probes, NOT a directory listing — this runs
    * on every default read's planning, and most tables never branch. */
  private[v2] def contextRef(handle: TableHandle): Option[(String, Int)] =
    sessionBranch().flatMap(n => handle.branchHead(n).map(n -> _))
      .orElse(handle.branchHead("main").map("main" -> _))

  /** Version an un-pinned read resolves. */
  private[v2] def readVersion(handle: TableHandle): Int =
    contextRef(handle).map(_._2).getOrElse(handle.latestVersion)

  /** Table property selecting the row-level operation strategy:
    * `copy-on-write` (default — matched files are rewritten) or
    * `merge-on-read` (matched rows are recorded as position-delete
    * vectors; no data file is rewritten). */
  private[v2] val DmlModeProp = "write.dml.mode"

  /** Table property (bytes, default 0 = off): opt a partitioned
    * table's writes into AQE-rebalanced distribution with this
    * advisory partition size — the hot-value skew escape hatch (see
    * LakeWrite.advisoryPartitionSizeInBytes). */
  private[v2] val AdvisoryBytesProp = "write.distribution.advisory-bytes"
  private[v2] val CopyOnWrite = "copy-on-write"
  private[v2] val MergeOnRead = "merge-on-read"

  /** Rename each field to its PHYSICAL storage name (column mapping):
    * the parquet encoder sees physical names, so data written before
    * and after a RENAME COLUMN shares one physical column and a
    * re-added dropped name never aliases stale data. Types and order
    * are untouched — write-task row processing is ordinal-based. */
  private[v2] def physicalSchema(logical: StructType,
      snap: Snapshot): StructType =
    if (snap.colPhys.isEmpty) logical
    else StructType(logical.fields.map(f => f.copy(name = snap.phys(f.name))))

  private[v2] def partitionableType(dt: DataType): Boolean = dt match {
    case StringType | IntegerType | LongType | ShortType | ByteType | BooleanType => true
    case _ => false
  }

  /** The writer projects incoming rows with the WRITE schema — which
    * must be the table schema, column for column (Spark reorders INSERT
    * output and plans ReplaceData against the operation table schema;
    * anything else here is a wiring bug better caught loudly than
    * decoded as garbage). */
  private[v2] def checkedSchema(handle: TableHandle,
      info: LogicalWriteInfo): StructType = {
    val table = handle.snapshot(LakeTable.readVersion(handle)).schema
    val w = info.schema()
    require(w.length == table.length &&
        w.fields.zip(table.fields).forall { case (a, b) =>
          a.name == b.name && DataType.equalsIgnoreNullability(a.dataType, b.dataType) },
      s"write schema ${w.simpleString} does not match table schema " +
        s"${table.simpleString}")
    w
  }

  /** Render a partition value for the manifest: normalize the row's
    * source-column value, apply the field's transform. NULL source →
    * None (NULL partition value) for every transform — a NULL hashes
    * or truncates to nothing, it stays NULL (the Iceberg rule). */
  private[v2] def renderPartitionValue(row: InternalRow, ord: Int,
      dt: DataType, field: GraftLakeStore.PartField): Option[String] =
    if (row.isNullAt(ord)) None
    else {
      val norm: Any = dt match {
        case StringType => row.getUTF8String(ord).toString
        case IntegerType => java.lang.Long.valueOf(row.getInt(ord).toLong)
        case LongType => java.lang.Long.valueOf(row.getLong(ord))
        case ShortType => java.lang.Long.valueOf(row.getShort(ord).toLong)
        case ByteType => java.lang.Long.valueOf(row.getByte(ord).toLong)
        case BooleanType => java.lang.Boolean.valueOf(row.getBoolean(ord))
        case other => throw new IllegalStateException(s"unreachable: $other")
      }
      Some(LakeTransforms.render(field, norm))
    }

  /** Parse one DSv2 [[Transform]] into a [[GraftLakeStore.PartField]]:
    * identity / bucket(N, col) / truncate(W, col), top-level columns
    * only, types checked per transform. */
  private[v2] def parseTransform(schema: StructType,
      t: Transform): GraftLakeStore.PartField = {
    val refs = t.references()
    require(refs.length == 1 && refs(0).fieldNames().length == 1,
      s"graft_lake partition transforms take one top-level column, got $t")
    val col = refs(0).fieldNames()(0)
    val f = schema.fields.find(_.name == col).getOrElse(
      throw new IllegalArgumentException(s"partition column $col not in schema"))
    val param = t.arguments().collectFirst {
      case l: org.apache.spark.sql.connector.expressions.Literal[_]
          if l.value().isInstanceOf[Number] =>
        l.value().asInstanceOf[Number].intValue()
    }
    val field = t.name() match {
      case "identity" => GraftLakeStore.PartField(col)
      case "bucket" => GraftLakeStore.PartField(col, "bucket",
        param.getOrElse(throw new IllegalArgumentException(
          s"bucket transform needs a bucket count: $t")))
      case "truncate" => GraftLakeStore.PartField(col, "truncate",
        param.getOrElse(throw new IllegalArgumentException(
          s"truncate transform needs a width: $t")))
      case other => throw new IllegalArgumentException(
        s"graft_lake supports identity / bucket(N, col) / truncate(W, col) " +
          s"partitioning only, got transform '$other'")
    }
    require(field.transform == "identity" || field.param > 0,
      s"${field.transform} parameter must be positive, got ${field.param}")
    require(LakeTransforms.supported(field.transform, f.dataType),
      s"partition column $col: ${f.dataType.simpleString} does not support " +
        s"the ${field.transform} transform")
    field
  }
}

/** Partition-TRANSFORM evaluation — ONE implementation shared by the
  * write tasks (rendering a row's partition value) and the planner
  * (mapping a filter literal to the value it would land in), so
  * pruning can never disagree with placement. Normalized inputs:
  * java Long (all integrals), String, java Boolean.
  *
  * `bucket` hashes integrals through a splitmix64 finalizer and
  * strings through MurmurHash3 over UTF-8 bytes — graft's own stable
  * layout contract (documented: NOT Iceberg's murmur3_32; graft
  * manifests are graft's format). `truncate` floors longs to a
  * multiple of the width and prefixes strings — `truncate[7]` on ISO
  * date strings is month partitioning with no calendar anywhere. */
private[v2] object LakeTransforms {

  def supported(transform: String, dt: DataType): Boolean = transform match {
    case "identity" => LakeTable.partitionableType(dt)
    case "bucket" => dt match {
      case StringType | IntegerType | LongType | ShortType | ByteType => true
      case _ => false
    }
    case "truncate" => dt match {
      case StringType | IntegerType | LongType | ShortType | ByteType => true
      case _ => false
    }
    case _ => false
  }

  private def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Stable bucket of a normalized value. */
  def bucket(v: Any, n: Int): Int = {
    val h = v match {
      case l: java.lang.Long => mix64(l.longValue())
      case s: String => mix64(scala.util.hashing.MurmurHash3.bytesHash(
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8), 0).toLong)
      case other => throw new IllegalArgumentException(
        s"bucket transform over unsupported value class ${other.getClass}")
    }
    java.lang.Math.floorMod(h, n.toLong).toInt
  }

  /** The partition VALUE a normalized source value lands in. */
  def render(f: GraftLakeStore.PartField, v: Any): String = f.transform match {
    case "identity" => v.toString
    case "bucket" => bucket(v, f.param).toString
    case "truncate" => v match {
      case l: java.lang.Long =>
        (java.lang.Math.floorDiv(l.longValue(), f.param.toLong) * f.param).toString
      case s: String => s.substring(0, math.min(f.param, s.length))
      case other => throw new IllegalArgumentException(
        s"truncate transform over unsupported value class ${other.getClass}")
    }
    case other => throw new IllegalArgumentException(s"unknown transform $other")
  }

  /** Normalize a pushed-filter literal to the shared value forms. */
  def normalize(v: Any): Any = v match {
    case u: UTF8String => u.toString
    case s: String => s
    case n: java.lang.Integer => java.lang.Long.valueOf(n.longValue())
    case n: java.lang.Long => n
    case n: java.lang.Short => java.lang.Long.valueOf(n.longValue())
    case n: java.lang.Byte => java.lang.Long.valueOf(n.longValue())
    case b: java.lang.Boolean => b
    case other => other
  }
}

/** One data file is one read split. `dvAbsPaths` = position-delete
  * parquets applying to this file (merge-on-read deletes, usually
  * empty); `rows` = the file's physical row count, which bounds every
  * delete position — the reader sizes its skip bitmap by it. */
private[v2] case class LakeInputPartition(absPath: String, fileId: Int,
    fileColumns: Seq[String], rows: Long = 0L,
    dvAbsPaths: Seq[String] = Seq.empty,
    eqGroups: Seq[LakeEqGroup] = Seq.empty) extends InputPartition

private[v2] class LakeScanBuilder(handle: TableHandle, snap: Snapshot, desc: String,
    rowLevel: Boolean = false)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
  private var required: StructType = snap.schema
  private var pushed: Array[Filter] = Array.empty
  private var aggGroupCols: Seq[String] = Seq.empty
  private var aggCountCols: Int = 0
  private var aggPushed = false

  /** Does every file carry a value for every CURRENT partition column?
    * False after a partition-spec evolution until old-spec files are
    * compacted away: old files keep the values of the spec they were
    * written under (and prune by those), so partition predicates can
    * only be EXACT per file where the value exists — under a mixed
    * spec they stay residual and grouped COUNT pushdown disables
    * itself. */
  private val uniformSpec: Boolean =
    snap.files.forall(f => snap.partitionCols.forall(f.partition.contains))

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** COUNT(*) — optionally grouped by partition columns — is answered
    * ENTIRELY from manifests: live row counts (physical rows minus
    * delete-vector positions) are exact write-task metadata, and
    * identity partitioning makes per-file group values total. Complete
    * pushdown: no data file is opened (the spec deletes them from disk
    * and the count still answers). Spark only offers an aggregate when
    * every filter was fully pushed, i.e. exact partition predicates —
    * the conservative stats tier never reaches here. */
  private def canPushAgg(agg: org.apache.spark.sql.connector.expressions
      .aggregate.Aggregation): Boolean =
    !rowLevel &&
      // equality deletes kill an UNKNOWN number of rows per file (key
      // matches are discovered at read time) — a manifest-only count
      // would overcount, so the pushdown disables itself
      snap.eqDels.isEmpty &&
      agg.aggregateExpressions().nonEmpty &&
      agg.aggregateExpressions().forall(
        _.isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar]) &&
      // a GROUP BY over partition columns needs every file to carry the
      // group values — false mid-spec-evolution (ungrouped COUNT(*)
      // needs no values and stays pushable). IDENTITY fields only: a
      // transform field's per-file value is transform(col), not the
      // column — and matching by FIELD NAME would let a user column
      // that happens to share a transform field's name (k_bucket_4)
      // read transform values as its own
      (agg.groupByExpressions().isEmpty || uniformSpec) &&
      agg.groupByExpressions().forall {
        case f: NamedReference =>
          f.fieldNames().length == 1 &&
            snap.partFields.exists(pf => pf.transform == "identity" &&
              pf.col == f.fieldNames()(0))
        case _ => false
      }

  override def supportCompletePushDown(agg: org.apache.spark.sql.connector
      .expressions.aggregate.Aggregation): Boolean = canPushAgg(agg)

  override def pushAggregation(agg: org.apache.spark.sql.connector.expressions
      .aggregate.Aggregation): Boolean =
    if (!canPushAgg(agg)) false
    else {
      aggGroupCols = agg.groupByExpressions().toSeq.map(
        _.asInstanceOf[NamedReference].fieldNames()(0))
      aggCountCols = agg.aggregateExpressions().length
      aggPushed = true
      true
    }

  /** File pruning — two metadata tiers, both captured in
    * `pushedFilters` (so the plan shows them) and both only ever
    * dropping WHOLE files, never rows (ALL filters are returned as
    * residual; Spark re-evaluates them on the rows):
    *
    *  - partition-column filters evaluate EXACTLY against a file's
    *    identity-partition values ([[LakePartitionPruning]]);
    *  - data-column filters evaluate CONSERVATIVELY against the
    *    per-file min/max/null-count statistics the write tasks
    *    collected ([[LakeStatsPruning]] — Iceberg's file-metrics
    *    skipping): a file is dropped only when its stats PROVE no row
    *    can match.
    *
    * For ROW-LEVEL operations this same pruning bounds the
    * copy-on-write footprint statically (a pruned file is a group
    * never read, so it carries over by manifest reference) — sound by
    * the group-based contract, and it composes with the runtime
    * group filter. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // the EXACT tier covers identity fields' SOURCE columns only —
    // gating by field name would mistake a user column named like a
    // transform field (k_bucket_4) for partition values
    val pcols = snap.partFields
      .filter(_.transform == "identity").map(_.col).toSet
    val statCols = snap.schema.fields
      .filter(f => LakeStatsPruning.supportedType(f.dataType))
      .map(_.name).toSet -- pcols
    pushed = filters.filter { f =>
      f.references.nonEmpty && (
        (f.references.forall(pcols.contains) && LakePartitionPruning.supported(f)) ||
        (f.references.forall(statCols.contains) && LakeStatsPruning.supported(f)))
    }
    // partition predicates are decided EXACTLY per file (identity
    // partitioning: every row of a file shares the values), so they are
    // fully handled here — no residual row filter, which is also what
    // unlocks aggregate pushdown (Spark pushes aggregates only when no
    // post-scan filter remains). Stats predicates stay residual: file
    // pruning by min/max is conservative, rows must still be filtered.
    // EXCEPTION: after a partition-spec evolution (mixed spec), files
    // written under an old spec carry no value for a new partition
    // column — the predicate is only exact where the value exists, so
    // it stays residual until compaction re-unifies the spec.
    if (!uniformSpec) filters
    else filters.filterNot(f => f.references.nonEmpty &&
      f.references.forall(pcols.contains) && LakePartitionPruning.supported(f))
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    val schemaByName = snap.schema.fields.map(f => f.name -> f.dataType).toMap
    // exact tier = identity fields' source columns (see pushFilters)
    val pcols = snap.partFields
      .filter(_.transform == "identity").map(_.col).toSet
    // per-file stats are keyed by PHYSICAL column names (what the write
    // task saw); filters reference logical names — translate per file
    def logicalStats(f: LakeFile): Map[String, GraftLakeStore.ColStats] =
      if (snap.colPhys.isEmpty) f.stats
      else snap.schema.fieldNames.iterator
        .flatMap(n => f.stats.get(snap.phys(n)).map(n -> _)).toMap
    // TRANSFORM-field pruning: a filter on the SOURCE column of a
    // bucket/truncate field maps the literal through the SAME transform
    // the writer used and compares with the file's stored value —
    // equality/IN for both transforms, ranges additionally for truncate
    // (floor and prefix are monotone: col > v implies trunc(col) >=
    // trunc(v)). A file from a spec era without the field answers true
    // (no info — its column stats still prune); an all-NULL stored
    // value matches no non-null literal.
    val tfFields = snap.partFields.filterNot(_.transform == "identity")
    def tfEq(a: String, v: Any, f: LakeFile): Boolean =
      tfFields.filter(_.col == a).forall { fld =>
        f.partition.get(fld.name) match {
          case Some(Some(stored)) =>
            LakeTransforms.render(fld, LakeTransforms.normalize(v)) == stored
          case Some(None) => false // whole file's source is NULL
          case None => true // older spec: no info
        }
      }
    def tfRange(a: String, v: Any, f: LakeFile)(keep: Int => Boolean): Boolean =
      tfFields.filter(fl => fl.col == a && fl.transform == "truncate")
        .forall { fld =>
          f.partition.get(fld.name) match {
            case Some(Some(stored)) =>
              val tv = LakeTransforms.render(fld, LakeTransforms.normalize(v))
              val c = schemaByName(a) match {
                case StringType => stored.compareTo(tv)
                case _ => java.lang.Long.compare(stored.toLong, tv.toLong)
              }
              keep(c)
            case Some(None) => false
            case None => true
          }
        }
    def tfPrune(p: Filter, f: LakeFile): Boolean =
      if (tfFields.isEmpty) true
      else p match {
        case EqualTo(a, v) => v == null || tfEq(a, v, f)
        case EqualNullSafe(a, v) => v == null || tfEq(a, v, f)
        // IN matches only via a non-null member; a column no transform
        // field constrains answers true
        case In(a, vs) if vs != null =>
          tfFields.forall(_.col != a) ||
            vs.filter(_ != null).exists(v => tfEq(a, v, f))
        case GreaterThan(a, v) if v != null => tfRange(a, v, f)(_ >= 0)
        case GreaterThanOrEqual(a, v) if v != null => tfRange(a, v, f)(_ >= 0)
        case LessThan(a, v) if v != null => tfRange(a, v, f)(_ <= 0)
        case LessThanOrEqual(a, v) if v != null => tfRange(a, v, f)(_ <= 0)
        case And(l, r) => tfPrune(l, f) && tfPrune(r, f)
        case Or(l, r) => tfPrune(l, f) || tfPrune(r, f)
        case _ => true
      }
    val kept =
      if (pushed.isEmpty) snap.files
      else snap.files.filter(f => pushed.forall { p =>
        (if (p.references.forall(pcols.contains)) {
          // per-file spec: exact evaluation where the file recorded the
          // partition values; a file written under an OLDER spec (the
          // column was not a partition field then) falls back to its
          // column stats — conservative, never blind
          if (p.references.forall(f.partition.contains))
            LakePartitionPruning.mightMatch(p, f.partition, schemaByName)
          else if (LakeStatsPruning.supported(p))
            LakeStatsPruning.mayMatch(p, logicalStats(f), f.rows, schemaByName)
          else true
        }
        else LakeStatsPruning.mayMatch(p, logicalStats(f), f.rows, schemaByName)
        ) && tfPrune(p, f)
      })
    // logical → physical for every readable column (the column-mapping
    // indirection; metadata columns map to themselves)
    val physOf = snap.schema.fieldNames.map(n => n -> snap.phys(n)).toMap
    if (aggPushed)
      return new LakeCountScan(kept, aggGroupCols.map(n =>
        snap.schema.fields(snap.schema.fieldIndex(n))), aggCountCols,
        s"$desc [manifest count]")
    // physical name → type, for decoding equality-delete keys (EqRefs
    // store physical names; the commit validated the columns exist)
    val physTypes = snap.schema.fields
      .map(f => snap.phys(f.name) -> f.dataType).toMap
    // only the ROW-LEVEL scan is runtime-filterable: its relation always
    // carries _split (a required metadata attribute), where a plain
    // query's relation may not have requested it — Spark's v2 dynamic-
    // filtering rules resolve filterAttributes against the relation
    // output and fail loudly on a column that is not there
    if (rowLevel)
      new LakeRowScan(handle, snap.version, kept, physOf, required, desc,
        snap.eqDels, physTypes)
    else new LakeScan(handle, snap.version, kept, physOf, required, desc,
      snap.eqDels, physTypes)
  }
}

/** Exact evaluation of pushed filters against a file's identity-
  * partition values: every row in the file has EXACTLY these values,
  * so three-valued logic over them is precise, not conservative —
  * which is why Not() is safe here. Unsupported shapes are never
  * pushed (see LakeScanBuilder.pushFilters). */
private[v2] object LakePartitionPruning {

  def supported(f: Filter): Boolean = f match {
    case EqualTo(_, v) => comparable(v)
    case EqualNullSafe(_, v) => v == null || comparable(v)
    case GreaterThan(_, v) => comparable(v)
    case GreaterThanOrEqual(_, v) => comparable(v)
    case LessThan(_, v) => comparable(v)
    case LessThanOrEqual(_, v) => comparable(v)
    case In(_, vs) => vs.forall(v => v == null || comparable(v))
    case IsNull(_) | IsNotNull(_) => true
    case And(l, r) => supported(l) && supported(r)
    case Or(l, r) => supported(l) && supported(r)
    case Not(c) => supported(c)
    case _ => false
  }

  private def comparable(v: Any): Boolean = v match {
    case null => false
    case _: String | _: UTF8String | _: java.lang.Integer | _: java.lang.Long |
        _: java.lang.Short | _: java.lang.Byte | _: java.lang.Boolean => true
    case _ => false
  }

  /** SQL three-valued logic: Some(true/false) when the predicate
    * evaluates, None for NULL. A file is kept iff the result is
    * Some(true) — matching what Spark's row filter would keep. */
  def mightMatch(f: Filter, part: Map[String, Option[String]],
      types: Map[String, DataType]): Boolean =
    eval(f, part, types).getOrElse(false)

  private def eval(f: Filter, part: Map[String, Option[String]],
      types: Map[String, DataType]): Option[Boolean] = f match {
    case EqualTo(a, v) => cmp(a, v, part, types).map(_ == 0)
    case EqualNullSafe(a, v) =>
      val stored = part(a)
      if (v == null) Some(stored.isEmpty)
      else if (stored.isEmpty) Some(false)
      else cmp(a, v, part, types).map(_ == 0)
    case GreaterThan(a, v) => cmp(a, v, part, types).map(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(a, v, part, types).map(_ >= 0)
    case LessThan(a, v) => cmp(a, v, part, types).map(_ < 0)
    case LessThanOrEqual(a, v) => cmp(a, v, part, types).map(_ <= 0)
    case In(a, vs) =>
      val hits = vs.filter(_ != null).map(v => cmp(a, v, part, types))
      if (hits.exists(_.contains(0))) Some(true)
      else if (hits.exists(_.isEmpty) || vs.contains(null)) None
      else Some(false)
    case IsNull(a) => Some(part(a).isEmpty)
    case IsNotNull(a) => Some(part(a).isDefined)
    case And(l, r) => (eval(l, part, types), eval(r, part, types)) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true)) => Some(true)
      case _ => None
    }
    case Or(l, r) => (eval(l, part, types), eval(r, part, types)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false)) => Some(false)
      case _ => None
    }
    case Not(c) => eval(c, part, types).map(!_)
    case _ => Some(true) // unpushed shapes never reach here
  }

  /** Typed compare of the stored partition value against the filter
    * value; None when the stored value is NULL. */
  private def cmp(col: String, v: Any, part: Map[String, Option[String]],
      types: Map[String, DataType]): Option[Int] =
    part(col).map { stored =>
      types(col) match {
        case StringType =>
          val s = v match {
            case u: UTF8String => u.toString
            case other => other.toString
          }
          stored.compareTo(s)
        case BooleanType =>
          java.lang.Boolean.compare(stored.toBoolean, v.asInstanceOf[Boolean])
        case _ => // integral types
          java.lang.Long.compare(stored.toLong, v.asInstanceOf[Number].longValue())
      }
    }
}

/** CONSERVATIVE evaluation of pushed filters against per-file
  * min/max/null-count statistics (Iceberg's metrics-based file
  * skipping): `mayMatch` answers "could any row in this file satisfy
  * the predicate?" — false only when the stats PROVE it cannot.
  * Missing stats always answer true (never prune blind). Not() is
  * deliberately unsupported: negating a conservative answer is not
  * conservative.
  *
  * Orderings are chosen so the writer's collected bounds and this
  * evaluator agree with Spark's own comparison semantics: integrals
  * compare as Long, floating point as Double (files containing NaN
  * record no bounds), strings compare as java Strings and are bounded
  * ONLY when pure ASCII ≤ 64 bytes (ASCII is where UTF8String binary
  * order and String order coincide; anything else records no bound
  * rather than a lie). */
private[v2] object LakeStatsPruning {

  def supportedType(dt: DataType): Boolean = dt match {
    case StringType | IntegerType | LongType | ShortType | ByteType |
        BooleanType | org.apache.spark.sql.types.DoubleType |
        org.apache.spark.sql.types.FloatType => true
    case _ => false
  }

  def supported(f: Filter): Boolean = f match {
    case EqualTo(_, v) => v != null
    case EqualNullSafe(_, _) => true
    case GreaterThan(_, v) => v != null
    case GreaterThanOrEqual(_, v) => v != null
    case LessThan(_, v) => v != null
    case LessThanOrEqual(_, v) => v != null
    case In(_, vs) => vs != null
    case IsNull(_) | IsNotNull(_) => true
    case And(l, r) => supported(l) && supported(r)
    case Or(l, r) => supported(l) && supported(r)
    case _ => false
  }

  def mayMatch(f: Filter, stats: Map[String, GraftLakeStore.ColStats],
      rows: Long, types: Map[String, DataType]): Boolean = f match {
    case EqualTo(a, v) => inRange(a, v, stats, rows, types)
    case EqualNullSafe(a, null) => stats.get(a).forall(_.nulls > 0)
    case EqualNullSafe(a, v) => inRange(a, v, stats, rows, types)
    // c(stored) = sign(v − stored): "some value > v" needs max > v,
    // i.e. c(max) < 0 — the comparator reads filter-value-first
    case GreaterThan(a, v) =>
      bound(a, v, stats, rows, types)((min, max, c) => c(max) < 0)
    case GreaterThanOrEqual(a, v) =>
      bound(a, v, stats, rows, types)((min, max, c) => c(max) <= 0)
    case LessThan(a, v) =>
      bound(a, v, stats, rows, types)((min, max, c) => c(min) > 0)
    case LessThanOrEqual(a, v) =>
      bound(a, v, stats, rows, types)((min, max, c) => c(min) >= 0)
    case In(a, vs) =>
      // IN (NULL, …) matches only via a non-null member (SQL: x = NULL
      // is never true), so an all-null list proves no match
      vs.filter(_ != null).exists(v => inRange(a, v, stats, rows, types))
    case IsNull(a) => stats.get(a).forall(_.nulls > 0)
    case IsNotNull(a) => stats.get(a).forall(_.nulls < rows)
    case And(l, r) =>
      mayMatch(l, stats, rows, types) && mayMatch(r, stats, rows, types)
    case Or(l, r) =>
      mayMatch(l, stats, rows, types) || mayMatch(r, stats, rows, types)
    case _ => true
  }

  /** v within [min, max]? true when unbounded; false when the file is
    * all-NULL (an equality never matches NULL). */
  private def inRange(a: String, v: Any,
      stats: Map[String, GraftLakeStore.ColStats], rows: Long,
      types: Map[String, DataType]): Boolean =
    bound(a, v, stats, rows, types)((min, max, c) => c(min) >= 0 && c(max) <= 0)

  /** Evaluate `pred(min, max, cmpVagainst)` when bounds exist; an
    * all-NULL column answers false (no non-null value to compare), a
    * column without recorded bounds answers true. `c(x)` compares the
    * FILTER value v against stored bound x: sign of (v - x). */
  private def bound(a: String, v: Any,
      stats: Map[String, GraftLakeStore.ColStats], rows: Long,
      types: Map[String, DataType])(
      pred: (String, String, String => Int) => Boolean): Boolean =
    stats.get(a) match {
      case None => true
      case Some(st) =>
        if (st.nulls == rows) false // every value NULL: no comparison matches
        else (st.min, st.max) match {
          case (Some(mn), Some(mx)) =>
            val c = (stored: String) => compareTo(v, stored, types(a))
            pred(mn, mx, c)
          case _ => true // bounds invalidated (NaN / non-ASCII / long strings)
        }
    }

  /** Sign of (filter value − stored bound), typed by the column. */
  private def compareTo(v: Any, stored: String, dt: DataType): Int = dt match {
    case StringType =>
      val s = v match {
        case u: UTF8String => u.toString
        case other => other.toString
      }
      s.compareTo(stored)
    case BooleanType =>
      java.lang.Boolean.compare(v.asInstanceOf[Boolean], stored.toBoolean)
    case org.apache.spark.sql.types.DoubleType |
        org.apache.spark.sql.types.FloatType =>
      java.lang.Double.compare(v.asInstanceOf[Number].doubleValue(), stored.toDouble)
    case _ =>
      java.lang.Long.compare(v.asInstanceOf[Number].longValue(), stored.toLong)
  }

  /** Per-file stats collector the write task drives row by row. */
  final class Collector(schema: StructType) {
    private val cols = schema.fields.zipWithIndex
      .filter { case (f, _) => supportedType(f.dataType) }
    private val n = cols.length
    private val nulls = new Array[Long](n)
    private val mins = new Array[String](n)
    private val maxs = new Array[String](n)
    private val dead = new Array[Boolean](n) // bound invalidated

    def update(row: InternalRow): Unit = {
      var i = 0
      while (i < n) {
        val (f, ord) = cols(i)
        if (row.isNullAt(ord)) nulls(i) += 1
        else if (!dead(i)) {
          val rendered: String = f.dataType match {
            case StringType =>
              val u = row.getUTF8String(ord)
              // ASCII ≤ 64 bytes only: cheap, and the one regime where
              // binary order == String order (see object scaladoc)
              if (u.numBytes > 64 || !isAscii(u)) { dead(i) = true; null }
              else u.toString
            case IntegerType => row.getInt(ord).toString
            case LongType => row.getLong(ord).toString
            case ShortType => row.getShort(ord).toString
            case ByteType => row.getByte(ord).toString
            case BooleanType => row.getBoolean(ord).toString
            case org.apache.spark.sql.types.DoubleType =>
              val d = row.getDouble(ord)
              if (d.isNaN) { dead(i) = true; null } else d.toString
            case org.apache.spark.sql.types.FloatType =>
              val d = row.getFloat(ord)
              if (d.isNaN) { dead(i) = true; null } else d.toDouble.toString
            case other => throw new IllegalStateException(s"unreachable: $other")
          }
          if (rendered != null) {
            if (mins(i) == null || compareTo2(rendered, mins(i), f.dataType) < 0)
              mins(i) = rendered
            if (maxs(i) == null || compareTo2(rendered, maxs(i), f.dataType) > 0)
              maxs(i) = rendered
          }
        } // dead bound: nulls are still counted above; values need no work
        i += 1
      }
    }

    private def compareTo2(a: String, b: String, dt: DataType): Int = dt match {
      case StringType => a.compareTo(b)
      case BooleanType => java.lang.Boolean.compare(a.toBoolean, b.toBoolean)
      case org.apache.spark.sql.types.DoubleType |
          org.apache.spark.sql.types.FloatType =>
        java.lang.Double.compare(a.toDouble, b.toDouble)
      case _ => java.lang.Long.compare(a.toLong, b.toLong)
    }

    private def isAscii(u: UTF8String): Boolean = {
      var i = 0
      val nb = u.numBytes
      while (i < nb) {
        if ((u.getByte(i) & 0x80) != 0) return false
        i += 1
      }
      true
    }

    def result(): Map[String, GraftLakeStore.ColStats] =
      cols.indices.map { i =>
        val (f, _) = cols(i)
        val (mn, mx) =
          if (dead(i)) (None, None)
          else (Option(mins(i)), Option(maxs(i)))
        f.name -> GraftLakeStore.ColStats(mn, mx, nulls(i))
      }.toMap
  }
}

/** Completely-pushed COUNT(*) (optionally GROUP BY partition columns):
  * the "scan" never opens a data file — it folds the kept manifests'
  * live row counts, grouped by the files' identity-partition values.
  * One synthetic input partition whose row count is bounded by the
  * number of partition VALUES (metadata-sized, never data-sized). */
private[v2] class LakeCountScan(files: Seq[LakeFile],
    groupFields: Seq[StructField], countCols: Int, desc: String)
    extends Scan with Batch {

  private val out = StructType(
    groupFields ++ (0 until countCols).map(i =>
      StructField(s"count_$i", LongType, nullable = false)))

  override def readSchema(): StructType = out
  override def description(): String = desc
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val rows: Seq[(Seq[Option[String]], Long)] =
      if (groupFields.isEmpty) Seq((Seq.empty, files.map(_.liveRows).sum))
      else files.groupBy(f => groupFields.map(g => f.partition(g.name)))
        .map { case (k, fs) => (k, fs.map(_.liveRows).sum) }.toSeq
        // a group whose every row is delete-vectored has NO live rows:
        // vanilla execution emits no group at all, so neither do we
        // (the global count keeps its one row — COUNT(*) over an empty
        // table is 0, not absent)
        .filter(_._2 > 0L)
    Array(LakeCountPartition(rows, groupFields.map(_.dataType), countCols))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (p: InputPartition) => {
      val part = p.asInstanceOf[LakeCountPartition]
      new PartitionReader[InternalRow] {
        private val it = part.rows.iterator
        private var cur: InternalRow = _
        override def next(): Boolean = {
          if (!it.hasNext) return false
          val (gvals, count) = it.next()
          cur = LakeRows.render(
            gvals.indices.map(i => gvals(i).map(v => LakeCountScan
              .parsePartitionValue(v, part.groupTypes(i))).orNull) ++
            Seq.fill(part.countCols)(count))
          true
        }
        override def get(): InternalRow = cur
        override def close(): Unit = ()
      }
    }
}

private[v2] object LakeCountScan {
  /** Inverse of [[LakeTable.renderPartitionValue]]. */
  def parsePartitionValue(s: String, dt: DataType): Any = dt match {
    case StringType => UTF8String.fromString(s)
    case IntegerType => s.toInt
    case LongType => s.toLong
    case ShortType => s.toShort
    case ByteType => s.toByte
    case BooleanType => s.toBoolean
    case other => throw new IllegalStateException(s"unreachable: $other")
  }
}

private[v2] case class LakeCountPartition(rows: Seq[(Seq[Option[String]], Long)],
    groupTypes: Seq[DataType], countCols: Int) extends InputPartition

private[v2] class LakeScan(handle: TableHandle, val baseVersion: Int,
    initialFiles: Seq[LakeFile], physOf: Map[String, String],
    required: StructType, desc: String,
    eqDels: Seq[GraftLakeStore.EqRef] = Seq.empty,
    physTypes: Map[String, DataType] = Map.empty) extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  @volatile protected var files: Seq[LakeFile] = initialFiles

  /** File ids this scan will read — after any runtime group filtering.
    * For a row-level operation this IS the replaced-file set. */
  def plannedFileIds: Set[Int] = files.map(_.id).toSet

  /** Manifest-derived statistics, AFTER partition/stats pruning:
    * exact live row counts and on-disk bytes of the files this scan
    * will actually read. This is what lets Catalyst broadcast a
    * dimension-sized lake table (a DSv2 relation without statistics
    * reports the "unknown = huge" default and never broadcasts) and
    * size shuffles by real input, the Iceberg/Delta convention. */
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      private val fs = files
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(fs.map(_.liveRows).sum)
      override def sizeInBytes(): java.util.OptionalLong =
        if (fs.nonEmpty && fs.forall(_.bytes > 0L))
          java.util.OptionalLong.of(fs.map(_.bytes).sum)
        else java.util.OptionalLong.empty() // legacy files: unknown, never a lie
    }

  override def readSchema(): StructType = required
  override def description(): String = desc
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    files.map { f =>
      // equality deletes apply to files that existed when they
      // committed (id <= bound); later files — including the upsert's
      // own inserts — are exempt. Refs GROUP by their key-column list:
      // each group is evaluated against its own columns, so commits
      // with different keys all apply.
      val eqs = eqDels.filter(_.bound >= f.id)
      val groups = eqs.groupBy(_.keyCols).toSeq.sortBy(_._1.mkString(","))
        .map { case (cols, refs) => LakeEqGroup(
          refs.map(r => handle.tableDir.resolve(r.path).toString),
          cols, cols.map(physTypes)) }
      LakeInputPartition(handle.tableDir.resolve(f.path).toString, f.id,
        f.columns, f.rows,
        f.dvs.map(d => handle.tableDir.resolve(d.path).toString),
        groups): InputPartition
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new LakeReaderFactory(required, physOf)
}

/** The row-level operation's scan: runtime-filterable on `_split`, so
  * Spark's RowLevelOperationRuntimeGroupFiltering rule can shrink a
  * MERGE/UPDATE/DELETE's copy-on-write footprint to exactly the files
  * holding matched rows. */
private[v2] class LakeRowScan(handle: TableHandle, baseVersion: Int,
    initialFiles: Seq[LakeFile], physOf: Map[String, String],
    required: StructType, desc: String,
    eqDels: Seq[GraftLakeStore.EqRef] = Seq.empty,
    physTypes: Map[String, DataType] = Map.empty)
    extends LakeScan(handle, baseVersion, initialFiles, physOf, required,
      desc, eqDels, physTypes)
    with SupportsRuntimeV2Filtering {

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column(LakeTable.SplitCol))

  /** Runtime group filtering: Spark hands us `_split IN (ids…)` where
    * ids are the file ids holding rows matched by the operation's
    * condition (computed by its own subquery over this table). Keep
    * only those files. An unparseable predicate filters nothing —
    * always safe, the plan still re-filters rows. */
  override def filter(predicates: Array[V2Predicate]): Unit = {
    val ids = predicates.flatMap(LakeScan.inSplitIds)
    if (ids.nonEmpty) {
      val keep = ids.reduce(_ intersect _)
      files = files.filter(f => keep.contains(f.id))
    }
  }
}

private[v2] object LakeScan {
  /** Parse `_split IN (v1, v2, …)` / `_split = v`; None otherwise. */
  def inSplitIds(p: V2Predicate): Option[Set[Int]] = {
    def isSplit(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      e match {
        case r: NamedReference =>
          r.fieldNames().length == 1 && r.fieldNames()(0) == LakeTable.SplitCol
        case _ => false
      }
    val ch = p.children()
    p.name() match {
      case "IN" if ch.nonEmpty && isSplit(ch.head) =>
        val vals = ch.tail.collect {
          case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
            l.value.asInstanceOf[Number].intValue }
        if (vals.length == ch.length - 1) Some(vals.toSet) else None
      case "=" if ch.length == 2 && isSplit(ch.head) =>
        ch(1) match {
          case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
            Some(Set(l.value.asInstanceOf[Number].intValue))
          case _ => None
        }
      case _ => None
    }
  }
}

/** Position-delete vector IO: one DV file is a plain parquet of
  * `(file_id INT, pos BIGINT)` rows — Iceberg v2's position-delete
  * shape, readable by any engine. The loader unions every DV covering a
  * data file into a skip bitmap sized by the file's physical rows. */
private[v2] object LakeDv {
  val schema: StructType = StructType(Seq(
    StructField("file_id", IntegerType, nullable = false),
    StructField("pos", LongType, nullable = false)))

  /** Union of this file's deleted positions across `dvPaths`; null when
    * there are none (the common case — skip-test elided entirely). */
  def loadPositions(dvPaths: Seq[String], fileId: Int,
      rows: Long): java.util.BitSet = {
    if (dvPaths.isEmpty) return null
    require(rows <= Int.MaxValue,
      s"file row count $rows exceeds the position bitmap range")
    val set = new java.util.BitSet(rows.toInt)
    dvPaths.foreach { p =>
      // seek, don't scan: DV parquets are written sorted by (file_id,
      // pos) in small row groups, so this file's positions live in a
      // contiguous handful of groups and every foreign group is skipped
      // by footer min/max — one DV covering F files costs each reader
      // O(its own positions), not O(all F files' positions)
      val it = LakeParquet.readerForValue(p, Seq("file_id", "pos"),
        "file_id", fileId.toLong)
      try {
        while (it.next()) {
          val r = it.get()
          if (r.getInt(0) == fileId) {
            val pos = r.getLong(1)
            require(pos >= 0 && pos < rows,
              s"delete position $pos out of range [0, $rows) for file $fileId")
            set.set(pos.toInt)
          }
        }
      } finally it.close()
    }
    set
  }
}

/** Equality-delete IO: one eq-delete file is a plain parquet whose
  * columns are the (possibly composite) KEY — stored under the key
  * columns' PHYSICAL names with their table types, the value-matched
  * counterpart of LakeDv position deletes (Iceberg v2's second
  * delete-file kind with its equality field list). The loader unions
  * the key sets of every file covering a split; sets are change-sized
  * (an upsert batch of keys), never data-sized. */
private[v2] object LakeEq {

  /** Key-column types an equality delete supports: hashable and
    * exactly comparable (integrals widen to Long; floating point is
    * rejected — NaN/-0.0 equality would be a lie). */
  def supportedKeyType(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | StringType |
        BooleanType => true
    case _ => false
  }

  /** Eq-delete FILE schema for `keyCols` (logical names) of `snap`:
    * columns stored under their PHYSICAL names with their table types,
    * so the file matches what data files physically hold. */
  def fileSchema(snap: Snapshot, keyCols: Seq[String]): StructType =
    StructType(keyCols.map { c =>
      StructField(snap.phys(c), snap.schema(c).dataType, nullable = false) })

  /** One normalized key component: integrals widen to java Long,
    * strings COPY out of the reused row buffer, null stays null (the
    * caller drops the key — a NULL component never matches, SQL `=`
    * semantics). */
  private def component(r: InternalRow, i: Int, dt: DataType): AnyRef =
    if (r.isNullAt(i)) null
    else dt match {
      case LongType => java.lang.Long.valueOf(r.getLong(i))
      case IntegerType => java.lang.Long.valueOf(r.getInt(i).toLong)
      case ShortType => java.lang.Long.valueOf(r.getShort(i).toLong)
      case ByteType => java.lang.Long.valueOf(r.getByte(i).toLong)
      case StringType => r.getUTF8String(i).toString
      case BooleanType => java.lang.Boolean.valueOf(r.getBoolean(i))
      case other => throw new IllegalStateException(
        s"unreachable eq key type $other")
    }

  /** Hashable key for the row: the bare component for a single-column
    * key (the hot path — one box, same cost as the pre-composite code),
    * a List for composite keys. Null when any component is NULL. */
  def renderKey(r: InternalRow, idxs: Array[Int],
      types: Array[DataType]): AnyRef = {
    if (idxs.length == 1) return component(r, idxs(0), types(0))
    val b = List.newBuilder[AnyRef]
    var i = 0
    while (i < idxs.length) {
      val c = component(r, idxs(i), types(i))
      if (c == null) return null
      b += c
      i += 1
    }
    b.result()
  }

  /** Union of the key sets across `paths` (all sharing `keyPhys`). */
  def loadKeys(paths: Seq[String], keyPhys: Seq[String],
      keyTypes: Seq[DataType]): java.util.HashSet[AnyRef] = {
    val set = new java.util.HashSet[AnyRef]()
    val idxs = keyPhys.indices.toArray
    val tarr = keyTypes.toArray
    paths.foreach { p =>
      val it = LakeParquet.reader(p, keyPhys)
      try while (it.next()) {
        val k = renderKey(it.get(), idxs, tarr)
        if (k != null) set.add(k)
      } finally it.close()
    }
    set
  }
}

/** One group of equality-delete files sharing a key-column list: the
  * read side evaluates each group against ITS OWN columns, so two
  * commits with different key columns both apply — neither is silently
  * dropped. `keyPhys` are physical names; `keyTypes` their table
  * types. */
private[v2] case class LakeEqGroup(paths: Seq[String], keyPhys: Seq[String],
    keyTypes: Seq[DataType]) {
  /** Can `fileCols` (a data file's physical columns) hold a matching
    * row at all? A file predating any key column cannot. */
  def appliesTo(fileCols: Set[String]): Boolean = keyPhys.forall(fileCols.contains)
}

/** Probes one eq group's key set for the current row; `idxs` index the
  * READ columns (requested projection + appended key columns). */
private[v2] final class LakeEqProbe(keys: java.util.HashSet[AnyRef],
    idxs: Array[Int], types: Array[DataType]) {
  def matches(r: InternalRow): Boolean = {
    if (keys.isEmpty) return false
    val k = LakeEq.renderKey(r, idxs, types)
    k != null && keys.contains(k)
  }
}

private[v2] object LakeEqProbe {
  /** Build probes for the groups applicable to a file, given the read
    * column order. */
  def forGroups(groups: Seq[LakeEqGroup],
      readCols: Seq[String]): Array[LakeEqProbe] =
    groups.map { g =>
      new LakeEqProbe(LakeEq.loadKeys(g.paths, g.keyPhys, g.keyTypes),
        g.keyPhys.map(readCols.indexOf).toArray, g.keyTypes.toArray)
    }.toArray
}

/** Reads one parquet data file through Spark's vectorized reader,
  * projecting into the required schema: columns the file predates
  * (schema evolution) read NULL; `_split` reads the file id, `_pos` the
  * row's position within the file. Positions deleted by a delete
  * vector are skipped — the merge-on-read half of the read path — while
  * the position counter still advances over them (a position names a
  * PHYSICAL row, deleted or not). */
private[v2] class LakeReaderFactory(required: StructType,
    physOf: Map[String, String]) extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[LakeInputPartition]
    val fileCols = part.fileColumns.toSet
    // PHYSICAL names to request from the file, in required-schema order
    // (column mapping: a renamed column keeps its birth physical name)
    def phys(n: String): String = physOf.getOrElse(n, n)
    val requested = required.fields.map(f => phys(f.name))
      .filter(n => n != LakeTable.SplitCol && n != LakeTable.PosCol &&
        fileCols.contains(n))
    // for each output ordinal: >=0 index into `requested`, -1 = _split,
    // -2 = null (column added after this file was written), -3 = _pos
    val src = required.fields.map { f =>
      if (f.name == LakeTable.SplitCol) -1
      else if (f.name == LakeTable.PosCol) -3
      else {
        val i = requested.indexOf(phys(f.name))
        if (i >= 0) i else -2
      }
    }
    val types = required.fields.map(_.dataType)
    // equality deletes: the KEY columns must be read to test membership,
    // even when the projection does not include them. A file that
    // predates any of a group's key columns cannot hold a matching row —
    // that group does no work for this file.
    val eqGroups = part.eqGroups.filter(_.appliesTo(fileCols))
    val readCols: Seq[String] = requested.toSeq ++
      eqGroups.flatMap(_.keyPhys).distinct.filterNot(requested.contains)
    val probes = LakeEqProbe.forGroups(eqGroups, readCols)

    new PartitionReader[InternalRow] {
      private val it =
        if (readCols.nonEmpty) LakeParquet.reader(part.absPath, readCols)
        else null
      // a projection-to-nothing read (e.g. count(*) over only-new
      // columns) still needs the row COUNT — read the narrowest file
      // column just to drive iteration
      private val fallback =
        if (readCols.isEmpty) LakeParquet.reader(part.absPath,
          Seq(part.fileColumns.head)) else null
      private def rows = if (it != null) it else fallback
      private val deleted =
        LakeDv.loadPositions(part.dvAbsPaths, part.fileId, part.rows)
      private var pos: Long = -1L
      // reused output buffer, the standard reader contract
      // (consumers that buffer must copy, and do)
      private val out = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(src.length)
      override def next(): Boolean = {
        while (rows.next()) {
          pos += 1
          if (deleted == null || !deleted.get(pos.toInt)) {
            if (probes.isEmpty) return true
            val r = rows.get()
            var i = 0
            var killed = false
            while (i < probes.length && !killed) {
              killed = probes(i).matches(r)
              i += 1
            }
            if (!killed) return true
          }
        }
        false
      }
      override def get(): InternalRow = {
        val r = rows.get()
        var j = 0
        while (j < src.length) {
          out.update(j, src(j) match {
            case -1 => part.fileId
            case -3 => pos
            case -2 => null
            case i => if (r.isNullAt(i)) null else r.get(i, types(j))
          })
          j += 1
        }
        out
      }
      override def close(): Unit = rows.close()
    }
  }
}

private[v2] class LakeWriteBuilder(handle: TableHandle, writeSchema: StructType,
    queryId: String) extends WriteBuilder with SupportsTruncate {
  private var replace = false
  override def truncate(): WriteBuilder = { replace = true; this }
  override def build(): Write =
    new LakeWrite(handle, writeSchema,
      if (replace) LakeWrite.Truncate else LakeWrite.Append, queryId)
}

private[v2] object LakeWrite {
  sealed trait Mode
  case object Append extends Mode
  case object Truncate extends Mode
  /** Row-level copy-on-write: replaces exactly the files `scan` read
    * (post runtime group filtering) against the version it scanned. */
  final case class Replace(scan: LakeScan) extends Mode
}

private[v2] class LakeWrite(handle: TableHandle, writeSchema: StructType,
    mode: LakeWrite.Mode, queryId: String = "") extends Write with BatchWrite
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {

  /** Partitioned writes REQUEST a clustered distribution on the
    * partition fields' SOURCE columns (Iceberg's hash
    * write-distribution mode): equal source values land in one write
    * task, so an identity-partitioned ingest produces ONE file per
    * partition value instead of files-per-task × values — the
    * small-files problem solved where it starts, at the write. For
    * transform fields the co-location consolidates as far as value
    * equality (a bucket tuple spans many values by design; its file
    * count stays bounded by the task count). Unpartitioned tables
    * impose nothing — the input's parallelism is respected. */
  override def requiredDistribution():
      org.apache.spark.sql.connector.distributions.Distribution = {
    val pf = handle.snapshot(LakeTable.readVersion(handle)).partFields
    if (pf.isEmpty)
      org.apache.spark.sql.connector.distributions.Distributions.unspecified()
    else org.apache.spark.sql.connector.distributions.Distributions.clustered(
      pf.map(f => Expressions.identity(f.col):
        org.apache.spark.sql.connector.expressions.Expression).toArray)
  }

  override def requiredOrdering():
      Array[org.apache.spark.sql.connector.expressions.SortOrder] = Array.empty

  /** The skew escape hatch, OPT-IN per table
    * (`write.distribution.advisory-bytes`): with an advisory size,
    * Spark satisfies the clustered distribution with an AQE REBALANCE
    * instead of a strict repartition — small clusters coalesce into
    * shared tasks and a HOT partition value larger than the advisory
    * SPLITS across writers (trading one-file-per-value for
    * size-bounded files exactly there; a 5 TB hot date must not
    * serialize through one writer). Default 0 = strict clustering:
    * deterministic one-file-per-value layout, the right shape until a
    * value outgrows a writer. */
  override def advisoryPartitionSizeInBytes(): Long =
    handle.snapshot(LakeTable.readVersion(handle)).props
      .get(LakeTable.AdvisoryBytesProp).map(_.toLong).getOrElse(0L)

  override def toBatch: BatchWrite = this

  /** Streaming APPEND sink: every micro-batch epoch commits as one
    * snapshot, deduplicated by (queryId, epochId) so a replayed epoch
    * (retry after a commit that beat the checkpoint) appends nothing
    * twice — the lake-side half of exactly-once, complementing the
    * change-feed source. Append-only by design: Complete-mode
    * truncation per epoch is rejected loudly. */
  override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
    require(mode == LakeWrite.Append,
      s"graft_lake streaming writes are append-only (got $mode)")
    val write = this
    new org.apache.spark.sql.connector.write.streaming.StreamingWrite {
      override def createStreamingWriterFactory(info: PhysicalWriteInfo)
          : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory = {
        val batch = write.createBatchWriterFactory(info)
        new org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
          override def createWriter(partitionId: Int, taskId: Long,
              epochId: Long): DataWriter[InternalRow] =
            batch.createWriter(partitionId, taskId)
        }
      }
      override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
        val files = messages.flatMap(_.asInstanceOf[LakeCommit].files).toSeq
        // epoch appends base their content on the LOG head, so a
        // streaming sink cannot run against a diverged branch — loud,
        // not a silent lineage mix
        LakeTable.contextRef(handle).foreach { case (b, head) =>
          require(head == handle.latestVersion,
            s"streaming sink on branch '$b': branch head $head is behind " +
              s"the log head ${handle.latestVersion} (an unpublished " +
              "lineage is in flight) — fast-forward or drop it first")
        }
        val (v, committed) = handle.commitEpochAppend(queryId, epochId, files)
        // duplicate replay: this epoch's rows are already in the table;
        // the re-written files must not linger as orphans
        if (!committed) write.deleteFiles(files)
        else LakeTable.contextRef(handle).foreach { case (b, _) =>
          handle.advanceBranch(b, v) }
      }
      override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
        write.abort(messages)
    }
  }

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val snap = handle.snapshot(LakeTable.readVersion(handle))
    val pfs = snap.partFields.map(f => (f, writeSchema.fieldIndex(f.col)))
    new LakeWriterFactory(handle.dataDir.toString,
      LakeTable.physicalSchema(writeSchema, snap), pfs)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val newFiles = messages.flatMap(_.asInstanceOf[LakeCommit].files).toSeq
    // a branch-context commit rides the store's synchronized composite:
    // content from the branch head, pointer advanced under the interned
    // handle's monitor (same-JVM branch writers lose nothing)
    LakeTable.contextRef(handle) match {
      case Some((branch, _)) =>
        try {
          mode match {
            case LakeWrite.Append => handle.commitAppendOnBranch(branch, newFiles)
            case LakeWrite.Truncate => handle.commitTruncateOnBranch(branch, newFiles)
            case LakeWrite.Replace(scan) =>
              handle.commitReplaceOnBranch(branch, scan.baseVersion,
                scan.plannedFileIds, newFiles)
          }
        } catch { case e: GraftLakeStore.CommitConflictException =>
          deleteFiles(newFiles); throw e
        }
      case None => mode match {
        case LakeWrite.Append => handle.commitAppend(newFiles)
        case LakeWrite.Truncate => handle.commitTruncate(newFiles)
        case LakeWrite.Replace(scan) =>
          try handle.commitReplace(scan.baseVersion, scan.plannedFileIds, newFiles)
          catch { case e: GraftLakeStore.CommitConflictException =>
            // the write failed: its files must not leak into the data dir
            deleteFiles(newFiles); throw e
          }
      }
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    deleteFiles(messages.collect {
      case m: LakeCommit => m.files
    }.flatten.toSeq)

  private[v2] def deleteFiles(files: Seq[PendingFile]): Unit =
    files.foreach { f =>
      try java.nio.file.Files.deleteIfExists(handle.dataDir.resolve(f.name))
      catch { case _: java.io.IOException => }
    }
}

private[v2] case class LakeCommit(files: Seq[PendingFile])
  extends WriterCommitMessage

/** The shared task-side row sink: streams rows into one parquet file
  * per identity-partition value it encounters (one file total for
  * unpartitioned tables). Files are created lazily — an empty task
  * commits nothing. Used by both the plain batch writer and the
  * merge-on-read delta writer's insert path. */
private[v2] class LakeRowFileWriter(dataDir: String, schema: StructType,
    partFields: Seq[(GraftLakeStore.PartField, Int)], partitionId: Int,
    taskId: Long) {
  private val pTypes = partFields.map { case (_, ord) => schema.fields(ord).dataType }
  // the incoming row may be any InternalRow over REUSED buffers;
  // rendering through an UnsafeProjection of the table schema
  // materializes every value before the parquet encoder sees it
  private val toUnsafe =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(schema)
  private val open = mutable.LinkedHashMap[Seq[Option[String]],
    (org.apache.parquet.hadoop.ParquetWriter[InternalRow], String, Array[Long],
      LakeStatsPruning.Collector)]()

  private def writerFor(pvals: Seq[Option[String]]) =
    open.getOrElseUpdate(pvals, {
      val name = s"f-$partitionId-$taskId-${UUID.randomUUID().toString.take(12)}.parquet"
      (LakeParquet.writer(s"$dataDir/$name", schema), name, Array(0L),
        new LakeStatsPruning.Collector(schema))
    })

  def write(row: InternalRow): Unit = {
    val u = toUnsafe(row)
    val pvals = partFields.indices.map { i =>
      val (fld, ord) = partFields(i)
      LakeTable.renderPartitionValue(u, ord, pTypes(i), fld)
    }
    val (w, _, n, stats) = writerFor(pvals)
    w.write(u)
    stats.update(u)
    n(0) += 1
  }

  def commitFiles(): Seq[PendingFile] = {
    val files = open.map { case (pvals, (w, name, n, stats)) =>
      w.close()
      // on-disk size feeds the scan's reported statistics (broadcast
      // decisions); 0 on a stat failure = "unknown", never a lie
      val bytes =
        try java.nio.file.Files.size(java.nio.file.Paths.get(dataDir, name))
        catch { case _: java.io.IOException => 0L }
      PendingFile(name, n(0), pvals, stats.result(), bytes)
    }.toSeq
    open.clear()
    files
  }

  def abort(): Unit = {
    open.foreach { case (_, (w, name, _, _)) =>
      try w.close() catch { case _: Throwable => }
      try java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(dataDir, name))
      catch { case _: java.io.IOException => }
    }
    open.clear()
  }
}

private[v2] class LakeWriterFactory(dataDir: String, schema: StructType,
    partFields: Seq[(GraftLakeStore.PartField, Int)]) extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val sink =
        new LakeRowFileWriter(dataDir, schema, partFields, partitionId, taskId)
      override def write(row: InternalRow): Unit = sink.write(row)
      // the metadata-projecting write task hands (metadata, data) —
      // the file a row came from does not pin where it lands
      override def write(meta: InternalRow, row: InternalRow): Unit = sink.write(row)
      override def commit(): WriterCommitMessage = LakeCommit(sink.commitFiles())
      override def abort(): Unit = sink.abort()
      override def close(): Unit = ()
    }
}

/** Merge-on-read write: the rewrite plans hand per-row ACTIONS —
  * `delete(rowId)` for matched deletes (and the delete half of
  * updates), `insert(row)`/`reinsert(row)` for new and updated rows.
  * Deletes are buffered per data-file id and committed as ONE
  * position-delete parquet per task; inserts stream through the same
  * row sink batch appends use. The commit attaches the delete vectors
  * to the files they cover and appends the insert files — no data file
  * is rewritten (GraftLakeStore.commitDelta). */
private[v2] class LakeDeltaWrite(handle: TableHandle, scan: LakeScan,
    rebaseAppends: Boolean = true)
    extends DeltaWrite with DeltaBatchWrite {

  override def toBatch: DeltaBatchWrite = this

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory = {
    val snap = handle.snapshot(LakeTable.readVersion(handle))
    val pfs = snap.partFields.map(f => (f, snap.schema.fieldIndex(f.col)))
    new LakeDeltaWriterFactory(handle.dataDir.toString,
      LakeTable.physicalSchema(snap.schema, snap), pfs)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val ms = messages.collect { case m: LakeDeltaCommit => m }
    val inserts = ms.flatMap(_.files).toSeq
    val dvs = ms.flatMap(_.dv).toSeq
    try LakeTable.contextRef(handle) match {
      case Some((branch, _)) =>
        // never rebase under a branch context (an intervening append
        // may belong to another lineage); advance the branch after
        handle.commitDeltaOnBranch(branch, scan.baseVersion, dvs, inserts)
      case None =>
        handle.commitDelta(scan.baseVersion, dvs, inserts, rebaseAppends)
    }
    catch { case e: GraftLakeStore.CommitConflictException =>
      deleteAll(inserts, dvs); throw e
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val ms = messages.collect { case m: LakeDeltaCommit => m }
    deleteAll(ms.flatMap(_.files).toSeq, ms.flatMap(_.dv).toSeq)
  }

  private def deleteAll(files: Seq[PendingFile], dvs: Seq[PendingDv]): Unit =
    (files.map(_.name) ++ dvs.map(_.name)).foreach { n =>
      try java.nio.file.Files.deleteIfExists(handle.dataDir.resolve(n))
      catch { case _: java.io.IOException => }
    }
}

private[v2] case class LakeDeltaCommit(files: Seq[PendingFile],
    dv: Option[PendingDv]) extends WriterCommitMessage

private[v2] class LakeDeltaWriterFactory(dataDir: String, schema: StructType,
    partFields: Seq[(GraftLakeStore.PartField, Int)]) extends DeltaWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new DeltaWriter[InternalRow] {
      private val inserts =
        new LakeRowFileWriter(dataDir, schema, partFields, partitionId, taskId)
      // deleted positions per data-file id; sorted at commit so the
      // delete parquet is clustered by (file_id, pos)
      private val dels = mutable.TreeMap[Int, mutable.ArrayBuffer[Long]]()

      override def delete(meta: InternalRow, id: InternalRow): Unit =
        dels.getOrElseUpdate(id.getInt(0), mutable.ArrayBuffer.empty) += id.getLong(1)

      // unreachable with representUpdateAsDeleteAndInsert=true, but the
      // semantics are exactly delete-then-insert either way
      override def update(meta: InternalRow, id: InternalRow,
          row: InternalRow): Unit = {
        delete(meta, id)
        insert(row)
      }

      override def insert(row: InternalRow): Unit = inserts.write(row)

      // the DV parquet is written inside commit(); a failure BETWEEN
      // that write and the task's success must not orphan it — abort
      // remembers the name and deletes it
      private var pendingDvName: String = _

      override def commit(): WriterCommitMessage = {
        val dv =
          if (dels.isEmpty) None
          else {
            val name = s"dv-$partitionId-$taskId-${UUID.randomUUID().toString.take(12)}.parquet"
            pendingDvName = name
            // small row groups (vs the 128 MB default): sorted by
            // (file_id, pos), each covered file's positions land in few
            // groups and readers skip the rest by footer min/max
            val w = LakeParquet.writer(s"$dataDir/$name", LakeDv.schema,
              rowGroupBytes = 64 * 1024)
            val out = new org.apache.spark.sql.catalyst.expressions
              .GenericInternalRow(2)
            try dels.foreach { case (fileId, positions) =>
              out.update(0, fileId)
              positions.sorted.foreach { p =>
                out.update(1, p)
                w.write(out)
              }
            } finally w.close()
            Some(PendingDv(name, dels.map { case (id, ps) =>
              id -> ps.length.toLong }.toMap))
          }
        val msg = LakeDeltaCommit(inserts.commitFiles(), dv)
        dels.clear()
        msg
      }

      override def abort(): Unit = {
        inserts.abort()
        dels.clear()
        if (pendingDvName != null) {
          try java.nio.file.Files.deleteIfExists(
            java.nio.file.Paths.get(dataDir, pendingDvName))
          catch { case _: java.io.IOException => }
          pendingDvName = null
        }
      }
      override def close(): Unit = ()
    }
}
