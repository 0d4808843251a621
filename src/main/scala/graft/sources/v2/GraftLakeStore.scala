package graft.sources.v2

import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Durable storage behind [[GraftLakeCatalog]]: parquet data files under
  * a table root plus ONE JSON manifest per snapshot — the classic
  * lake-table layout (Iceberg/Delta shape, reduced to its essentials).
  *
  * ```
  * <root>/<catalog.ns.table>/
  *   manifest-v00000.json     # snapshot 0 (CREATE: schema, no files)
  *   manifest-v00001.json     # snapshot 1 = file list + schema
  *   data/f-<task>-<uuid>.parquet
  * ```
  *
  * Commit protocol — what makes concurrent writers safe without any
  * coordination service:
  *
  *  - A snapshot is IMMUTABLE: a manifest file, once visible, never
  *    changes, and data files are never rewritten in place (copy-on-
  *    write creates new files). Readers resolve a version once and are
  *    byte-stable under every later commit.
  *  - Publishing snapshot N+1 is a single atomic filesystem operation:
  *    the manifest is staged to a temp name and `Files.createLink`ed to
  *    its final name — link creation fails (EEXIST) iff some other
  *    writer already published that version. That failed link IS the
  *    optimistic-concurrency check: appends/truncates rebase and retry;
  *    a row-level operation (MERGE/UPDATE/DELETE), whose replacement
  *    content was computed against a scanned base version, FAILS LOUDLY
  *    instead — retrying would silently drop the concurrent commit
  *    (exactly the lost-update anomaly Delta/Iceberg reject).
  *  - Snapshots record schema PER VERSION (`ALTER TABLE ADD COLUMN` is
  *    a metadata-only commit carrying every file over), and each file
  *    records the columns it physically holds — readers of a widened
  *    table fill nulls for columns a pre-evolution file predates.
  *
  * At 100 TB nothing here changes shape: manifests stay KB-sized
  * (they hold file metadata, not data), data files are written by the
  * distributed write tasks and read by the distributed scan tasks, and
  * the only driver-side work per commit is one manifest write.
  */
object GraftLakeStore {

  /** One data file of one snapshot. `id` is the stable file identity —
    * the `_split` metadata column readers see, and the unit row-level
    * operations replace. `columns` = fields physically present (schema
    * evolution adds table columns no old file holds). `partition` =
    * identity-partition values rendered as strings (None = SQL NULL).
    * `dvs` = delete vectors applied to this file (merge-on-read DML):
    * each ref names a position-delete parquet and the count of THIS
    * file's positions it holds — append-only per file (a position can
    * be deleted once: the scan never surfaces already-deleted rows). */
  final case class LakeFile(id: Int, path: String, rows: Long,
      columns: Seq[String], partition: Map[String, Option[String]],
      stats: Map[String, ColStats] = Map.empty,
      dvs: Seq[DvRef] = Seq.empty, bytes: Long = 0L) {
    /** Rows visible to a reader: physical rows minus deleted positions. */
    def liveRows: Long = rows - dvs.map(_.dels).sum
  }

  /** One delete-vector reference: `path` (relative to the table dir)
    * names a position-delete parquet file — schema `(file_id INT, pos
    * BIGINT)`, plain parquet any engine reads, Iceberg v2's
    * position-delete shape — and `dels` counts the positions it holds
    * for the OWNING [[LakeFile]] (one delete parquet may cover several
    * data files; each references it with its own count). */
  final case class DvRef(path: String, dels: Long)

  /** Per-file column statistics collected by the write task — the
    * data-skipping metadata (Iceberg's file metrics). min/max are
    * present iff the file holds at least one non-null value AND the
    * writer could bound it (long strings invalidate the bound rather
    * than record a truncated lie); `nulls` is always exact. */
  final case class ColStats(min: Option[String], max: Option[String], nulls: Long)

  /** One PARTITION FIELD: the file-level partition VALUE is
    * `transform(source column)` — Iceberg's hidden partitioning,
    * reduced to the three transforms that cover the real layouts:
    *
    *  - `identity`: the value itself (the original tier);
    *  - `bucket[N]`: a stable hash mod N — point-lookup pruning for
    *    high-cardinality keys without value-explosion;
    *  - `truncate[W]`: long → floor to a multiple of W, string → the
    *    first W chars. `truncate[7]` on ISO date strings IS month
    *    partitioning; `truncate[4]` is year — the temporal transforms
    *    without a calendar in the manifest.
    *
    * `name` keys the per-file partition map (identity keeps the bare
    * column name — pre-transform manifests parse unchanged). */
  final case class PartField(col: String, transform: String = "identity",
      param: Int = 0) {
    def name: String =
      if (transform == "identity") col else s"${col}_${transform}_$param"
  }

  /** A parsed, immutable snapshot. `op` records what created it —
    * create/append/overwrite/replace/schema — purely descriptive
    * metadata surfaced by the history view (q222). `txn` is the
    * exactly-once marker of a STREAMING epoch commit: (queryId,
    * epochId) of the micro-batch that produced this snapshot, checked
    * by [[TableHandle.commitEpochAppend]] so a replayed epoch (task
    * retry after a commit that beat the checkpoint) commits nothing
    * twice — Delta's txn-version device. */
  final case class Snapshot(version: Int, schema: StructType,
      partFields: Seq[PartField], files: Seq[LakeFile], maxFileId: Int,
      op: String = "create", txn: Option[(String, Long)] = None,
      props: Map[String, String] = Map.empty,
      colPhys: Map[String, String] = Map.empty,
      pendingTxn: Option[String] = None,
      eqDels: Seq[EqRef] = Seq.empty) {
    /** Partition-field NAMES — the keys of each file's partition map
      * (for identity fields, the source column name). */
    def partitionCols: Seq[String] = partFields.map(_.name)
    /** Column mapping: the PHYSICAL name a logical column's data is
      * stored under in parquet. Assigned at column birth and never
      * changed — RENAME COLUMN remaps the logical name, DROP COLUMN
      * removes it, and a re-added name gets a FRESH physical name so a
      * dropped column's stale data can never resurrect (the Delta
      * column-mapping / Iceberg field-id device). Absent entry =
      * identity (CREATE-time columns, and every pre-mapping manifest). */
    def phys(logical: String): String = colPhys.getOrElse(logical, logical)
  }

  /** A file a write task produced, not yet committed: name is relative
    * to the table's data dir; partition values align with the table's
    * partitionCols. */
  final case class PendingFile(name: String, rows: Long,
      partition: Seq[Option[String]], stats: Map[String, ColStats] = Map.empty,
      bytes: Long = 0L)

  /** A position-delete parquet a merge-on-read write task produced, not
    * yet committed: `dels` maps each covered data-file id to the number
    * of its positions recorded in the file. */
  final case class PendingDv(name: String, dels: Map[Int, Long])

  /** One EQUALITY-delete file (Iceberg v2's second delete kind,
    * merge-on-read tier 2), snapshot-scoped: `path` names a parquet of
    * key VALUES under the columns `keyCols` — the PHYSICAL storage
    * names, resolved at commit time, so readers match file columns
    * directly and stay correct under any later RENAME COLUMN. A key may
    * be composite (Iceberg's equality field list): a row dies iff EVERY
    * component matches. The delete applies to any data file with id <=
    * `bound` — the files that existed when the delete committed
    * (Iceberg's sequence-number rule reduced to monotone file ids;
    * later files are exempt, so an upsert's own inserts never
    * self-delete). `rows` = key count, metadata only. */
  final case class EqRef(path: String, keyCols: Seq[String], bound: Int, rows: Long)

  /** An equality-delete parquet a writer produced, not yet committed.
    * `keyCols` are LOGICAL column names (commit resolves physical). */
  final case class PendingEq(name: String, keyCols: Seq[String], rows: Long)

  /** Default root: one per JVM (all catalog instances without an
    * explicit `root` option share it — session clones see one store,
    * like an external metastore), cleaned up at exit. */
  lazy val defaultRoot: String =
    graft.util.TempDirs.create("graft_lake_root_").toString

  private val mapper = new ObjectMapper()

  /** Parsed-manifest cache, keyed by absolute manifest path. Safe
    * because manifests are immutable; expiration invalidates entries. */
  private val cache = new ConcurrentHashMap[String, Snapshot]()

  /** Interned handles, one per normalized table dir: every `get`/
    * `create` for the same directory returns the SAME TableHandle, so
    * `synchronized` maintenance (expireSnapshots/vacuumOrphans) holds a
    * monitor that actually excludes concurrent maintenance within the
    * JVM. Cross-process, maintenance additionally takes a file LEASE
    * (TableHandle.withMaintenanceLease) — two daemons on one table
    * serialize, with documented takeover of a stale (dead-holder)
    * lease. */
  private val handles = new ConcurrentHashMap[Path, TableHandle]()

  private def intern(dir: Path): TableHandle =
    handles.computeIfAbsent(dir.toAbsolutePath.normalize, p => new TableHandle(p))

  private def manifestName(v: Int) = f"manifest-v$v%05d.json"

  // ---- multi-table transactions ------------------------------------
  // One decision marker per transaction, at the ROOT (shared by all
  // participating tables): `txn-<id>.json`, hard-linked once with
  // state committed|aborted — whoever links first decides, atomically
  // for every staged table at once.

  /** Grace window before a racing writer force-aborts an UNDECIDED
    * multi-table transaction that blocks its version slot
    * (TableHandle.resolveBlocker). A system property so deployments
    * under heavy GC/IO can lengthen it and tests can shrink it. */
  private[v2] def txnGraceMs: Long =
    java.lang.Long.getLong("graft.lake.txnGraceMs", 2000L)

  /** Decided states are immutable; cache them. Undecided (no marker) is
    * re-checked from disk every time. */
  private val txnDecisions = new ConcurrentHashMap[String, String]()

  private def txnMarker(root: Path, id: String): Path =
    root.resolve(s"txn-$id.json")

  private[v2] def txnState(root: Path, id: String): Option[String] = {
    val key = root.toString + "#" + id
    val c = txnDecisions.get(key)
    if (c != null) Some(c)
    else {
      val p = txnMarker(root, id)
      if (!Files.exists(p)) None
      else {
        val st = mapper.readTree(
          new String(Files.readAllBytes(p), "UTF-8")).get("state").asText()
        txnDecisions.put(key, st)
        Some(st)
      }
    }
  }

  /** Decide transaction `id`: link the marker with `state` — the first
    * link wins, atomically. Returns the WINNING state (which may be the
    * other outcome if a racer decided first). */
  private[v2] def decideTxn(root: Path, id: String, state: String): String = {
    val p = txnMarker(root, id)
    val tmp = Files.createTempFile(root, ".txn-", ".tmp")
    try {
      Files.write(tmp, s"""{"state":"$state"}""".getBytes("UTF-8"))
      try {
        Files.createLink(p, tmp)
        txnDecisions.put(root.toString + "#" + id, state)
        state
      } catch { case _: FileAlreadyExistsException => txnState(root, id).get }
    } finally Files.deleteIfExists(tmp)
  }

  /** Multi-table transactional commit — the one capability tier above
    * single-table OCC: stage appends/overwrites for N tables, publish
    * all-or-nothing.
    *
    *  1. Per table (in sorted key order), publish the next manifest
    *     carrying `pendingTxn = id`: the hard-link reserves the version
    *     slot, but readers hold the snapshot INVISIBLE until the
    *     transaction decides.
    *  2. Link `<root>/txn-<id>.json` with state `committed` — ONE
    *     atomic filesystem operation that flips every staged table's
    *     visibility together. Readers can never observe a torn pair:
    *     before the link both tables read old, after it both read new.
    *  3. On any failure the same marker links `aborted` and the pending
    *     manifests are deleted. A coordinator crash between 1 and 2
    *     leaves every table readable at its old version; the first
    *     writer needing the blocked slot aborts the orphan after a
    *     grace window (TableHandle.resolveBlocker).
    */
  final class Transaction private[GraftLakeStore](root: String) {
    private val ops =
      scala.collection.mutable.LinkedHashMap[String, (String, Seq[PendingFile])]()
    val id: String =
      java.util.UUID.randomUUID().toString.replace("-", "").take(16)
    private val rootPath = Paths.get(root).toAbsolutePath.normalize

    def stageAppend(key: String, files: Seq[PendingFile]): this.type = {
      ops(key) = ("append", files); this
    }
    def stageTruncate(key: String, files: Seq[PendingFile]): this.type = {
      ops(key) = ("overwrite", files); this
    }

    /** Publish every staged op atomically; returns table → version.
      * Throws [[CommitConflictException]] if a concurrent writer
      * aborted the transaction mid-publish (nothing became visible). */
    def commit(): Map[String, Int] = {
      require(ops.nonEmpty, "empty transaction")
      val published = scala.collection.mutable.ListBuffer[(TableHandle, Int)]()
      try {
        ops.toSeq.sortBy(_._1).foreach { case (key, (op, files)) =>
          val h = get(root, key).getOrElse(throw new IllegalArgumentException(
            s"transaction $id: no table $key under $root"))
          published += ((h, h.publishPendingOp(id, op, files)))
        }
        if (decideTxn(rootPath, id, "committed") != "committed")
          throw new CommitConflictException(
            s"transaction $id was aborted by a concurrent writer during " +
              "publish; nothing became visible")
        published.map { case (h, v) => h.tableName -> v }.toMap
      } catch { case e: Throwable =>
        try decideTxn(rootPath, id, "aborted")
        catch { case _: Throwable => () }
        if (txnState(rootPath, id).contains("aborted"))
          published.foreach { case (h, v) =>
            try h.clearPending(id, v) catch { case _: Throwable => () } }
        throw e
      }
    }
  }

  def beginTransaction(root: String): Transaction = new Transaction(root)

  /** Create table `key` under `root`. Directory creation is the
    * atomicity point: of two concurrent creators exactly one wins;
    * the loser gets [[FileAlreadyExistsException]] (the catalog maps it
    * to Spark's typed TableAlreadyExistsException). */
  def create(root: String, key: String, schema: StructType,
      partFields: Seq[PartField],
      props: Map[String, String] = Map.empty): TableHandle = {
    val dir = Paths.get(root, key)
    Files.createDirectories(Paths.get(root))
    Files.createDirectory(dir) // throws FileAlreadyExistsException if raced
    Files.createDirectory(dir.resolve("data"))
    val h = intern(dir)
    h.writeManifest(Snapshot(0, schema, partFields, Seq.empty, 0, props = props))
    h
  }

  def get(root: String, key: String): Option[TableHandle] = {
    val dir = Paths.get(root, key)
    if (Files.isDirectory(dir)) Some(intern(dir)) else None
  }

  /** Rename table `oldKey` → `newKey` under `root`: ONE atomic
    * directory move (same filesystem). Every manifest, tag/ref file,
    * and data file travels with the directory — manifest paths are
    * relative — so `VERSION AS OF` (numeric and named) is preserved
    * bit-for-bit. The old dir's interned handle and cached manifests
    * are evicted; a handle someone kept fails loudly on next use
    * (its directory is gone), never reads the wrong table. */
  def rename(root: String, oldKey: String, newKey: String): Unit = {
    val from = Paths.get(root, oldKey).toAbsolutePath.normalize
    val to = Paths.get(root, newKey).toAbsolutePath.normalize
    if (!Files.isDirectory(from))
      throw new java.nio.file.NoSuchFileException(from.toString)
    if (Files.exists(to))
      throw new FileAlreadyExistsException(to.toString)
    handles.remove(from)
    Files.move(from, to, StandardCopyOption.ATOMIC_MOVE)
    val stale = from.toString + java.io.File.separator
    cache.keySet().removeIf(_.startsWith(stale))
  }

  def drop(root: String, key: String): Boolean = {
    val dir = Paths.get(root, key)
    if (!Files.isDirectory(dir)) false
    else {
      handles.remove(dir.toAbsolutePath.normalize)
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach { p => cache.remove(p.toString); Files.deleteIfExists(p); () }
      true
    }
  }

  def list(root: String, prefix: String): Seq[String] = {
    val r = Paths.get(root)
    if (!Files.isDirectory(r)) Seq.empty
    else Files.list(r).iterator().asScala
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith(prefix))
      .map(_.getFileName.toString).toSeq.sorted
  }

  /** Raised when a row-level operation's base version is no longer the
    * latest at commit time — the concurrent commit would be silently
    * lost if this replace went through. */
  final class CommitConflictException(msg: String)
    extends RuntimeException(msg)

  final class TableHandle(val tableDir: Path) {

    def dataDir: Path = tableDir.resolve("data")
    def tableName: String = tableDir.getFileName.toString

    /** Root directory holding this table — where multi-table
      * transaction decision markers live. */
    private def rootDir: Path = tableDir.getParent

    /** Read (and cache) manifest `v` if its FILE exists. No visibility
      * check — parsed content is immutable and safe to cache even for
      * an undecided transaction's manifest (visibility is re-evaluated
      * per access from the decision marker). */
    private def readManifest(v: Int): Option[Snapshot] = {
      val p = tableDir.resolve(manifestName(v))
      val cached = cache.get(p.toString)
      if (cached != null) Some(cached)
      else if (!Files.exists(p)) None
      else {
        val s = parseManifest(new String(Files.readAllBytes(p), "UTF-8"))
        cache.put(p.toString, s)
        Some(s)
      }
    }

    /** A manifest is VISIBLE unless it belongs to a multi-table
      * transaction that has not committed (undecided or aborted). */
    private def isVisible(s: Snapshot): Boolean =
      s.pendingTxn.forall(id =>
        GraftLakeStore.txnState(rootDir, id).contains("committed"))

    /** Latest committed-and-visible version. The listing is the source
      * of truth — another process's commit is visible here with no
      * cache to go stale; an in-flight transaction's reserved top slot
      * is walked past (rare and short-lived by construction). */
    def latestVersion: Int = {
      val vs = Files.list(tableDir).iterator().asScala
        .map(_.getFileName.toString)
        .collect { case n if n.startsWith("manifest-v") && n.endsWith(".json") =>
          n.stripPrefix("manifest-v").stripSuffix(".json").toInt }
        .toSeq
      require(vs.nonEmpty, s"$tableName: no manifests (corrupt table dir)")
      vs.sorted(Ordering.Int.reverse)
        .find(v => readManifest(v).exists(isVisible))
        .getOrElse(throw new IllegalStateException(
          s"$tableName: no visible snapshot (every manifest belongs to " +
            "an undecided or aborted transaction)"))
    }

    def snapshot(v: Int): Snapshot = {
      val latest = latestVersion
      require(v >= 0 && v <= latest, s"$tableName: no snapshot $v (have 0..$latest)")
      readManifest(v) match {
        case None =>
          throw new IllegalStateException(
            s"$tableName: snapshot $v has been expired (latest is $latest); " +
              "expired versions are unreadable by design")
        case Some(s) if isVisible(s) => s
        case Some(s) =>
          throw new IllegalStateException(
            s"$tableName: snapshot $v belongs to transaction " +
              s"${s.pendingTxn.get}, which never committed — it is not " +
              "readable")
      }
    }

    /** Append: carried = latest snapshot's files. Rebase-and-retry on a
      * publish race (append order is immaterial, so rebasing is safe). */
    def commitAppend(newFiles: Seq[PendingFile]): Int =
      retryCommit { base =>
        val (entries, maxId) = assignIds(base, newFiles)
        base.copy(version = base.version + 1, files = base.files ++ entries,
          maxFileId = maxId, op = "append")
      }

    /** Append onto the CONTENT of snapshot `contentBase` (a branch
      * head), publishing at the log's next version — the branch-write
      * device: versions stay linear (commit order) while content
      * lineage follows the branch pointer, so a write to `audit`
      * leaves `main`'s content untouched even though it lands later in
      * the log. File ids are assigned from the LOG head (global
      * uniqueness across lineages); schema/partitioning come from the
      * content base. Rebase-and-retry on a publish race (only the
      * version number moves; the content is base-relative by intent). */
    def commitAppendOn(contentBase: Int, newFiles: Seq[PendingFile]): Int = {
      var attempts = 0
      while (true) {
        val base = snapshot(contentBase)
        val latest = snapshot(latestVersion)
        val (entries, maxId) =
          assignIds(base.copy(maxFileId = latest.maxFileId), newFiles)
        val next = base.copy(version = latest.version + 1,
          files = base.files ++ entries, maxFileId = maxId, op = "append")
        if (tryPublish(next)) return next.version
        attempts += 1
        resolveBlocker(next.version, attempts)
      }
      -1 // unreachable
    }

    /** Truncate-replace (INSERT OVERWRITE): the new content is the
      * whole table by intent, independent of what it replaces —
      * rebase-and-retry is semantically a no-op, so it is safe. */
    def commitTruncate(newFiles: Seq[PendingFile]): Int =
      retryCommit { base =>
        val (entries, maxId) = assignIds(base, newFiles)
        // a full replacement leaves nothing for old deletes to apply to
        base.copy(version = base.version + 1, files = entries,
          maxFileId = maxId, op = "overwrite", eqDels = Seq.empty)
      }

    /** Row-level replace: drop `replacedIds` (the files the operation's
      * scan actually read), add the rewrite's output, carry the rest.
      * FAILS on any commit that landed after `baseVersion` was scanned:
      * the replacement was computed against stale content and going
      * through would silently drop the concurrent commit. */
    def commitReplace(baseVersion: Int, replacedIds: Set[Int],
        newFiles: Seq[PendingFile]): Int = {
      val latest = latestVersion
      if (latest != baseVersion)
        throw new CommitConflictException(
          s"$tableName: row-level operation scanned version $baseVersion but " +
            s"version $latest is now latest — a concurrent commit landed mid-" +
            "operation; the statement must be retried against current state")
      val base = snapshot(baseVersion)
      val (entries, maxId) = assignIds(base, newFiles)
      val next = base.copy(version = base.version + 1,
        files = base.files.filterNot(f => replacedIds.contains(f.id)) ++ entries,
        maxFileId = maxId, op = "replace")
      if (!tryPublish(next))
        throw new CommitConflictException(
          s"$tableName: version ${next.version} was published concurrently " +
            "while this row-level operation committed; retry the statement")
      next.version
    }

    /** Merge-on-read row-level commit: NO data file is rewritten — the
      * snapshot carries every base file forward, attaching the new
      * position-delete vectors to the files they cover, plus the
      * operation's insert files. This is the Iceberg-v2/Delta-DV write
      * shape: a DELETE touching 0.1% of a 100 TB table commits KBs of
      * delete vectors, not a rewrite.
      *
      * Concurrency: a DELETE/UPDATE delta commit REBASES over
      * intervening pure appends (an appended file cannot hold a matched
      * row — it did not exist when the operation scanned — and delete
      * positions refer to immutable files, so replaying the same deltas
      * on the advanced base is exactly the operation's intent). A MERGE
      * (`rebaseAppends = false`) fails on ANY intervening commit,
      * appends included: its NOT MATCHED INSERT decisions were computed
      * against pre-append state, so a concurrent append of key K racing
      * a MERGE that decided K is unmatched would commit a duplicate K —
      * Iceberg defaults MERGE to serializable isolation for exactly
      * this anomaly, and this matches commitReplace's semantics. Any
      * other intervening op (replace/overwrite/delta/schema) fails
      * loudly for every command: the matched rows may have moved or
      * changed, and retrying silently would reintroduce the lost-update
      * anomaly. */
    def commitDelta(baseVersion: Int, dvFiles: Seq[PendingDv],
        insertFiles: Seq[PendingFile], rebaseAppends: Boolean = true): Int = {
      var attempts = 0
      while (true) {
        val latest = latestVersion
        if (latest != baseVersion) {
          val intervening = ((baseVersion + 1) to latest)
            .map(v => v -> snapshot(v).op)
          val conflicting =
            if (rebaseAppends) intervening.filterNot(_._2 == "append")
            else intervening
          if (conflicting.nonEmpty)
            throw new CommitConflictException(
              s"$tableName: merge-on-read operation scanned version " +
                s"$baseVersion but ${conflicting.map { case (v, op) => s"v$v($op)" }
                  .mkString(", ")} landed mid-operation; " +
                (if (rebaseAppends) "only concurrent appends are rebasable"
                 else "a MERGE's insert decisions cannot be rebased over ANY " +
                   "concurrent commit (serializable isolation)") +
                " — retry the statement against current state")
        }
        // rebase onto the version the conflict check APPROVED — reading
        // latestVersion again here would let a non-append that lands in
        // between be rebased over silently (TOCTOU); publishing against
        // `latest` makes any later commit lose the link race instead,
        // and the loop re-runs the check
        val base = snapshot(latest)
        val targetIds = dvFiles.flatMap(_.dels.keySet).toSet
        val baseIds = base.files.map(_.id).toSet
        require(targetIds.subsetOf(baseIds),
          s"$tableName: delete vectors target unknown file ids " +
            s"${(targetIds -- baseIds).toSeq.sorted.mkString(", ")}")
        val withDvs = base.files.map { f =>
          val refs = dvFiles.collect {
            case d if d.dels.contains(f.id) => DvRef(s"data/${d.name}", d.dels(f.id)) }
          if (refs.isEmpty) f else f.copy(dvs = f.dvs ++ refs)
        }
        val (entries, maxId) = assignIds(base, insertFiles)
        val next = base.copy(version = base.version + 1,
          files = withDvs ++ entries, maxFileId = maxId, op = "delta")
        if (tryPublish(next)) return next.version
        attempts += 1
        resolveBlocker(next.version, attempts)
      }
      -1 // unreachable
    }

    /** Equality-delete upsert commit (merge-on-read tier 2): the new
      * equality-delete files kill matching keys in every data file that
      * existed at the base (id <= base.maxFileId); `insertFiles` carry
      * the new row versions. NO position is read and NO data file is
      * rewritten — the streaming-upsert write shape (a CDC writer that
      * cannot compute positions cheaply commits key values instead).
      * Isolation is strict like MERGE: the upsert's delete-then-insert
      * decisions were computed against the base, so ANY intervening
      * commit conflicts loudly. */
    def commitEqDelta(baseVersion: Int, eqFiles: Seq[PendingEq],
        insertFiles: Seq[PendingFile]): Int = {
      val latest = latestVersion
      if (latest != baseVersion)
        throw new CommitConflictException(
          s"$tableName: equality-delete upsert scanned version $baseVersion " +
            s"but version $latest is now latest — retry against current state")
      val base = snapshot(baseVersion)
      eqFiles.foreach { e =>
        require(e.keyCols.nonEmpty,
          s"$tableName: equality-delete needs at least one key column")
        e.keyCols.foreach { c =>
          require(base.schema.fieldNames.contains(c),
            s"$tableName: equality-delete key '$c' is not a table column")
          val dt = base.schema(c).dataType
          require(LakeEq.supportedKeyType(dt),
            s"$tableName: equality-delete key '$c' has unsupported type " +
              s"${dt.simpleString} (supported: BIGINT/INT/SMALLINT/TINYINT/" +
              "STRING/BOOLEAN)")
        }
      }
      val bound = base.maxFileId
      val (entries, maxId) = assignIds(base, insertFiles)
      val next = base.copy(version = base.version + 1,
        files = base.files ++ entries, maxFileId = maxId, op = "delta",
        // store the PHYSICAL names (resolved NOW): readers match file
        // columns directly, immune to any later RENAME COLUMN — a
        // logical name would go stale after rename→re-rename and the
        // deletes would silently stop applying (rows resurrecting)
        eqDels = base.eqDels ++ eqFiles.map(e =>
          EqRef(s"data/${e.name}", e.keyCols.map(base.phys), bound, e.rows)))
      if (!tryPublish(next))
        throw new CommitConflictException(
          s"$tableName: version ${next.version} was published concurrently " +
            "while this upsert committed; retry the statement")
      next.version
    }

    /** Streaming epoch append with exactly-once replay protection:
      * if ANY retained snapshot already carries this (queryId,
      * epochId) txn marker, the epoch was committed before a failure
      * and this call is its replay — commit nothing and report the
      * duplicate so the caller can delete the re-written files.
      * Returns (version, committed?). */
    def commitEpochAppend(queryId: String, epochId: Long,
        newFiles: Seq[PendingFile]): (Int, Boolean) = {
      var attempts = 0
      while (true) {
        val latest = latestVersion
        val dup = (latest to 0 by -1).exists { v =>
          try snapshot(v).txn.contains((queryId, epochId))
          catch { case _: IllegalStateException => false } // expired: older than any replay window
        }
        if (dup) return (latest, false)
        val base = snapshot(latest)
        val (entries, maxId) = assignIds(base, newFiles)
        val next = base.copy(version = base.version + 1,
          files = base.files ++ entries, maxFileId = maxId,
          op = "append", txn = Some((queryId, epochId)))
        if (tryPublish(next)) return (next.version, true)
        attempts += 1
        resolveBlocker(next.version, attempts)
      }
      (-1, false) // unreachable
    }

    /** Metadata-only commit: new schema (and its column mapping),
      * every file carried over. */
    def commitSchema(newSchema: StructType,
        newColPhys: Map[String, String] = null): Int =
      retryCommit { base =>
        base.copy(version = base.version + 1, schema = newSchema,
          colPhys = Option(newColPhys).getOrElse(base.colPhys), op = "schema") }

    /** PARTITION-SPEC EVOLUTION, metadata-only (Iceberg's signature
      * migration feature): the new spec applies to files written AFTER
      * this commit; every existing file is carried over untouched and
      * keeps the partition VALUES of the spec it was written under —
      * the scan prunes each file by its own recorded values (old-spec
      * files additionally prune by column stats). A 100 TB table that
      * outgrew its day-partitioning re-partitions with ONE manifest
      * write, no data rewritten, and old snapshots time-travel under
      * their old spec (partitionCols is per-snapshot). Column-level
      * validation (existence, partitionable type) is the caller's —
      * LakeProcedures has the schema context. */
    def commitPartitionSpec(newFields: Seq[PartField]): Int =
      retryCommit { base =>
        val names = newFields.map(_.name)
        require(names.distinct.size == names.size,
          s"$tableName: duplicate partition fields in ${names.mkString(", ")}")
        base.copy(version = base.version + 1, partFields = newFields,
          op = "spec")
      }

    // ---- named refs (tags) -------------------------------------------
    // A tag is an immutable named pointer to a snapshot version
    // (Iceberg's refs, reduced to tags): `VERSION AS OF 'name'`
    // resolves it, and expiration RETAINS tagged snapshots — a tag is
    // how a table pins a release against nightly GC. One file per tag,
    // published with the same atomic hard-link device as manifests
    // (re-tagging an existing name fails loudly; drop then re-tag).

    private def tagName(name: String) = s"tag-$name.json"
    private def branchFileName(name: String) = s"branch-$name.json"

    /** Shared ref-name rules: SQL-literal/filename safe, and never
      * all-digit — resolveVersion tries toInt BEFORE ref lookup, so an
      * all-digit name would be permanently unreachable ('VERSION AS OF
      * "123"' silently reads snapshot 123). */
    private def validateRefName(name: String): Unit = {
      require(name.nonEmpty && name.forall(c => c.isLetterOrDigit || c == '_' || c == '-' || c == '.'),
        s"ref name must be [A-Za-z0-9_.-]+, got '$name'")
      require(!name.forall(_.isDigit),
        s"ref name '$name' is all digits and would be shadowed by the " +
          "integer snapshot id in VERSION AS OF; include a non-digit")
    }

    /** Tag `version` as `name`. Names must be usable in SQL string
      * literals and filenames; versions must exist and not be expired. */
    def createTag(name: String, version: Int): Unit = {
      validateRefName(name)
      require(!branches().contains(name),
        s"$tableName: a BRANCH named '$name' exists; tag and branch " +
          "names share one resolution namespace")
      snapshot(version) // exists + not expired, or throws
      val target = tableDir.resolve(tagName(name))
      val tmp = Files.createTempFile(tableDir, ".tag-", ".tmp")
      try {
        Files.write(tmp, s"""{"version":$version}""".getBytes("UTF-8"))
        try Files.createLink(target, tmp)
        catch { case _: FileAlreadyExistsException =>
          throw new IllegalStateException(
            s"$tableName: tag '$name' already exists (tags are immutable; " +
              "dropTag first)")
        }
      } finally Files.deleteIfExists(tmp)
      // close the race with a concurrent expireSnapshots: the version
      // was readable at the pre-check, but expiration may have deleted
      // its manifest before our tag file appeared (expiration reads
      // tags BEFORE deleting). Re-verify now the tag is visible; undo
      // and fail loudly rather than leave a ref to an expired snapshot.
      try snapshot(version)
      catch { case e: Throwable =>
        Files.deleteIfExists(target)
        throw new IllegalStateException(
          s"$tableName: snapshot $version was expired concurrently with " +
            s"createTag('$name') — the tag was not created", e)
      }
    }

    def dropTag(name: String): Boolean =
      Files.deleteIfExists(tableDir.resolve(tagName(name)))

    /** All tags: name → version. */
    def tags(): Map[String, Int] = {
      val l = Files.list(tableDir)
      try l.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case n if n.startsWith("tag-") && n.endsWith(".json") =>
          val name = n.stripPrefix("tag-").stripSuffix(".json")
          val v = mapper.readTree(new String(
            Files.readAllBytes(tableDir.resolve(n)), "UTF-8")).get("version").asInt()
          name -> v
        }.toMap
      finally l.close()
    }

    // ---- branches (mutable refs) -------------------------------------
    // A branch is a MUTABLE named pointer to a snapshot (Iceberg's
    // branch refs): commits made under a branch context advance it, the
    // version log itself stays linear (version = commit order; content
    // lineage follows the pointer). `main`, once created, is what
    // default reads resolve — the write-audit-publish device: write to
    // an `audit` branch, validate it, fast-forward `main`. Advancing is
    // an atomic same-directory file replace.

    /** Create branch `name` at `version`. Same name rules and
      * expire-race handling as tags; names are shared with tags (one
      * resolution namespace). */
    def createBranch(name: String, version: Int): Unit = {
      validateRefName(name)
      require(!tags().contains(name),
        s"$tableName: a TAG named '$name' exists; tag and branch names " +
          "share one resolution namespace")
      snapshot(version) // exists + not expired, or throws
      val target = tableDir.resolve(branchFileName(name))
      val tmp = Files.createTempFile(tableDir, ".branch-", ".tmp")
      try {
        Files.write(tmp, s"""{"version":$version}""".getBytes("UTF-8"))
        try Files.createLink(target, tmp)
        catch { case _: FileAlreadyExistsException =>
          throw new IllegalStateException(
            s"$tableName: branch '$name' already exists")
        }
      } finally Files.deleteIfExists(tmp)
      try snapshot(version) // the createTag expire-race close, same shape
      catch { case e: Throwable =>
        Files.deleteIfExists(target)
        throw new IllegalStateException(
          s"$tableName: snapshot $version was expired concurrently with " +
            s"createBranch('$name') — the branch was not created", e)
      }
    }

    /** Advance branch `name` to `version` (fast-forward by default:
      * in a linear log the ancestor check is `version >= head`).
      * Atomic: stage + same-directory ATOMIC_MOVE replace. */
    def advanceBranch(name: String, version: Int,
        allowRewind: Boolean = false): Unit = {
      val cur = branches().getOrElse(name, throw new IllegalArgumentException(
        s"$tableName: no branch '$name' (have ${branches().keys.toSeq.sorted
          .mkString(", ")})"))
      snapshot(version) // exists + not expired
      require(allowRewind || version >= cur,
        s"$tableName: branch '$name' is at $cur; advancing to $version is " +
          "not a fast-forward (pass allowRewind to rewind explicitly)")
      val target = tableDir.resolve(branchFileName(name))
      val tmp = Files.createTempFile(tableDir, ".branch-", ".tmp")
      try {
        Files.write(tmp, s"""{"version":$version}""".getBytes("UTF-8"))
        Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
      } finally Files.deleteIfExists(tmp)
      // expire-race re-verify (expiration reads refs BEFORE deleting;
      // if it read the OLD head, the new head may have been collected)
      try snapshot(version)
      catch { case e: Throwable =>
        throw new IllegalStateException(
          s"$tableName: snapshot $version was expired concurrently with " +
            s"advanceBranch('$name') — the branch now points at an " +
            "expired snapshot; repair with advanceBranch to a live version", e)
      }
    }

    def dropBranch(name: String): Boolean =
      Files.deleteIfExists(tableDir.resolve(branchFileName(name)))

    /** Head of ONE branch, by direct file probe — the hot-path lookup
      * (every default read resolves the context branch), cheaper than
      * listing the table dir as `branches()` does. */
    def branchHead(name: String): Option[Int] = {
      val p = tableDir.resolve(branchFileName(name))
      if (!Files.exists(p)) None
      else Some(mapper.readTree(
        new String(Files.readAllBytes(p), "UTF-8")).get("version").asInt())
    }

    /** All branches: name → head version. */
    def branches(): Map[String, Int] = {
      val l = Files.list(tableDir)
      try l.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case n if n.startsWith("branch-") && n.endsWith(".json") =>
          val name = n.stripPrefix("branch-").stripSuffix(".json")
          val v = mapper.readTree(new String(
            Files.readAllBytes(tableDir.resolve(n)), "UTF-8")).get("version").asInt()
          name -> v
        }.toMap
      finally l.close()
    }

    /** Fast-forward branch `to` onto branch `from`'s head (Iceberg's
      * fast_forward procedure — the PUBLISH half of write-audit-
      * publish). Returns (previous head, new head). */
    def fastForward(to: String, from: String): (Int, Int) = {
      val head = branches().getOrElse(from, throw new IllegalArgumentException(
        s"$tableName: no branch '$from' to fast-forward from"))
      val prev = branches().getOrElse(to, throw new IllegalArgumentException(
        s"$tableName: no branch '$to' to fast-forward"))
      require(head >= prev,
        s"$tableName: fast_forward '$to' (v$prev) onto '$from' (v$head) is " +
          "not a fast-forward — the branches have diverged; re-apply the " +
          "missing appends with CALL cherry_pick, or rewind explicitly")
      advanceBranch(to, head)
      (prev, head)
    }

    /** CHERRY-PICK snapshot `version`'s file delta onto branch
      * `branch`'s head — the one divergence-repair move a linear-log
      * branch model supports SAFELY: only a pure-APPEND snapshot can be
      * re-applied, because its delta is exactly "these new files",
      * valid against any base. Every other op (replace / overwrite /
      * delta / schema / spec) is rejected loudly — those deltas were
      * computed against their own parent's content, and re-applying
      * them to a diverged base would silently corrupt (the same
      * restriction shape as Iceberg's cherrypick_snapshot, which
      * supports appends and dynamic overwrites only). Data files are
      * shared BY REFERENCE (immutable — expiration ref-counts by path);
      * the picked files get fresh ids at the target, so existing
      * equality-delete bounds exempt them, exactly as a fresh append. */
    def cherryPick(branch: String, version: Int): Int = synchronized {
      branches().getOrElse(branch, throw new IllegalArgumentException(
        s"$tableName: no branch '$branch' to cherry-pick onto"))
      val src = snapshot(version)
      require(src.op == "append" || src.op == "cherrypick",
        s"$tableName: cherry-pick supports pure-append snapshots only; " +
          s"v$version is op='${src.op}' — its delta was computed against " +
          s"v${version - 1}'s content and cannot be re-applied to another base")
      val parentIds = snapshot(version - 1).files.map(_.id).toSet
      val added = src.files.filterNot(f => parentIds.contains(f.id))
      var attempts = 0
      while (true) {
        val base = snapshot(branches()(branch))
        val latest = snapshot(latestVersion)
        var id = latest.maxFileId
        val entries = added.map { f => id += 1; f.copy(id = id, dvs = Seq.empty) }
        val next = base.copy(version = latest.version + 1,
          files = base.files ++ entries, maxFileId = id, op = "cherrypick")
        if (tryPublish(next)) {
          advanceBranch(branch, next.version)
          return next.version
        }
        attempts += 1
        resolveBlocker(next.version, attempts)
      }
      -1 // unreachable
    }

    /** Branch-context APPEND: re-resolve the branch head, append onto
      * its content, advance the pointer — one interned-handle monitor,
      * so same-JVM appends racing on one branch lose nothing (the
      * second re-reads the first's head). Cross-process branch writers
      * remain unserialized (single-writer-per-branch is the documented
      * deployment shape, as in Iceberg's WAP). */
    def commitAppendOnBranch(branch: String,
        newFiles: Seq[PendingFile]): Int = synchronized {
      val head = branches().getOrElse(branch, throw new IllegalArgumentException(
        s"$tableName: no branch '$branch' to append onto"))
      val v = commitAppendOn(head, newFiles)
      advanceBranch(branch, v)
      v
    }

    /** Branch-context INSERT OVERWRITE: content is a full replacement
      * by intent; commit, then advance the branch. */
    def commitTruncateOnBranch(branch: String,
        newFiles: Seq[PendingFile]): Int = synchronized {
      branches().getOrElse(branch, throw new IllegalArgumentException(
        s"$tableName: no branch '$branch' to overwrite"))
      val v = commitTruncate(newFiles)
      advanceBranch(branch, v)
      v
    }

    /** Branch-context row-level replace: the inner commitReplace already
      * requires the LOG head to equal the scanned base, which under a
      * branch context additionally means "no lineage is ahead" — DML
      * during an in-flight divergence (e.g. an unpublished audit
      * branch) fails loudly rather than mixing lineages. */
    def commitReplaceOnBranch(branch: String, baseVersion: Int,
        replacedIds: Set[Int], newFiles: Seq[PendingFile]): Int = synchronized {
      val v = commitReplace(baseVersion, replacedIds, newFiles)
      advanceBranch(branch, v)
      v
    }

    /** Branch-context merge-on-read commit: never rebases (an
      * intervening append may belong to another lineage), then
      * advances the branch. */
    def commitDeltaOnBranch(branch: String, baseVersion: Int,
        dvFiles: Seq[PendingDv], insertFiles: Seq[PendingFile]): Int =
      synchronized {
        val v = commitDelta(baseVersion, dvFiles, insertFiles,
          rebaseAppends = false)
        advanceBranch(branch, v)
        v
      }

    /** Resolve a `VERSION AS OF` string: integer = version, otherwise a
      * tag or branch name (one namespace, creation-checked disjoint). */
    def resolveVersion(spec: String): Int =
      try spec.toInt
      catch { case _: NumberFormatException =>
        tags().get(spec).orElse(branches().get(spec)) match {
          case Some(v) => v
          case None => throw new IllegalArgumentException(
            s"$tableName: no tag or branch '$spec' (and it is not an " +
              s"integer snapshot id); have refs ${(tags().keys ++
                branches().keys).toSeq.sorted.mkString(", ")}")
        }
      }

    // ---- cross-process maintenance lease -----------------------------
    // expire/vacuum are serialized within a JVM by the interned handle's
    // monitor; ACROSS processes they take a FILE LEASE so two
    // maintenance daemons on one table cannot interleave an expire's
    // read-refs/delete phases with a vacuum's (each alone is
    // crash-consistent; interleaved they could GC a file the other just
    // decided to keep).

    private def leasePath: Path = tableDir.resolve("maintenance.lock")

    /** Acquire the table's maintenance lease, run `f`, release. The
      * lease is a hard-linked file holding a holder id (complete at
      * link time — the tag/txn device). A FRESH foreign lease blocks
      * loudly after `graft.lake.maintenanceLeaseWaitMs` (default 10 s);
      * a STALE one (holder died mid-maintenance, older than
      * `graft.lake.maintenanceLeaseStaleMs`, default 15 min) is taken
      * over: delete + re-race the link, exactly one racer wins. Release
      * removes the lease only if it is still OURS. */
    private def withMaintenanceLease[T](f: => T): T = {
      val me = java.util.UUID.randomUUID().toString
      val staleMs = java.lang.Long.getLong(
        "graft.lake.maintenanceLeaseStaleMs", 900000L)
      val waitMs = java.lang.Long.getLong(
        "graft.lake.maintenanceLeaseWaitMs", 10000L)
      val deadline = System.currentTimeMillis() + waitMs
      var acquired = false
      while (!acquired) {
        val tmp = Files.createTempFile(tableDir, ".lease-", ".tmp")
        try {
          Files.write(tmp, me.getBytes("UTF-8"))
          try { Files.createLink(leasePath, tmp); acquired = true }
          catch { case _: FileAlreadyExistsException =>
            val age =
              try System.currentTimeMillis() -
                Files.getLastModifiedTime(leasePath).toMillis
              catch { case _: java.io.IOException => 0L } // vanished: retry
            if (age > staleMs) {
              // takeover of a dead holder: remove the stale lease and
              // re-race the link — one racer wins the next create
              Files.deleteIfExists(leasePath)
              ()
            } else if (System.currentTimeMillis() >= deadline)
              throw new IllegalStateException(
                s"$tableName: maintenance lease held by another process " +
                  s"(age ${age} ms, stale after $staleMs ms) — refusing " +
                  "to take over a live lease; retry later or lengthen " +
                  "graft.lake.maintenanceLeaseWaitMs")
            else Thread.sleep(50)
          }
        } finally Files.deleteIfExists(tmp)
      }
      try f
      finally {
        try {
          if (Files.exists(leasePath) &&
              new String(Files.readAllBytes(leasePath), "UTF-8") == me)
            Files.deleteIfExists(leasePath)
        } catch { case _: java.io.IOException => () }
      }
    }

    /** Expire all snapshots except the newest `keepLast` — and any
      * TAGGED snapshot, which a ref pins against GC. Data files
      * referenced by a survivor are retained; files referenced only by
      * expired snapshots are deleted. Expired versions fail loudly on
      * read (their manifests are gone and their cache entries evicted). */
    def expireSnapshots(keepLast: Int): Seq[Int] = synchronized {
      withMaintenanceLease {
      require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
      val latest = latestVersion
      val cutoff = latest - keepLast + 1 // retain [cutoff, latest]
      val pinned = tags().values.toSet ++ branches().values.toSet
      val expired = (0 until cutoff)
        .filterNot(pinned.contains)
        .filter(v => Files.exists(tableDir.resolve(manifestName(v))))
      if (expired.isEmpty) Seq.empty
      else {
        def refs(s: Snapshot): Seq[String] =
          s.files.flatMap(f => f.path +: f.dvs.map(_.path)) ++
            s.eqDels.map(_.path)
        val survivorVs = ((math.max(cutoff, 0) to latest) ++
          pinned.filter(_ < cutoff)).distinct.sorted
        // a stale tag may pin a version already expired by an earlier
        // run (the createTag race, closed on its side too): skip the
        // unreadable pin instead of wedging every future expiration
        val survivors = survivorVs.flatMap { v =>
          try Some(snapshot(v))
          catch { case _: IllegalStateException => None }
        }
        val keepPaths = survivors.flatMap(refs).toSet
        // an aborted transaction's leftover manifest in range reads as
        // unreadable — expire it anyway, referencing nothing
        val dropPaths = expired.flatMap { v =>
          try refs(snapshot(v))
          catch { case _: IllegalStateException => Seq.empty }
        }.toSet -- keepPaths
        expired.foreach { v =>
          val m = tableDir.resolve(manifestName(v))
          cache.remove(m.toString)
          Files.deleteIfExists(m)
        }
        dropPaths.foreach(rel => Files.deleteIfExists(tableDir.resolve(rel)))
        expired
      }
      }
    }

    /** Delete data-dir files referenced by NO retained manifest — the
      * leftovers of writers that died between writing and committing
      * (the abort paths delete their own files, but a hard crash
      * cannot). Never touches referenced files; returns what it
      * removed.
      *
      * An IN-FLIGHT write's files are unreferenced too (they join a
      * manifest only at commit) — `minAgeMs` is the guard: only files
      * OLDER than it are collected, so a vacuum with a sane age bound
      * (the CALL procedure defaults to an hour) cannot eat a running
      * write's output. Age 0 is the test/maintenance-window setting. */
    def vacuumOrphans(minAgeMs: Long = 0L): Seq[String] = synchronized {
      withMaintenanceLease {
      val referenced = (0 to latestVersion).flatMap { v =>
        try {
          val s = snapshot(v)
          s.files.flatMap(f => f.path +: f.dvs.map(_.path)) ++
            s.eqDels.map(_.path)
        } catch { case _: IllegalStateException => Seq.empty } // expired
      }.map(_.stripPrefix("data/")).toSet
      val cutoff = System.currentTimeMillis() - minAgeMs
      val l = Files.list(dataDir)
      val onDisk = try {
        val b = Seq.newBuilder[String]
        l.iterator().forEachRemaining { p =>
          val old =
            try Files.getLastModifiedTime(p).toMillis <= cutoff
            catch { case _: java.io.IOException => false }
          if (old) b += p.getFileName.toString
        }
        b.result()
      } finally l.close()
      val orphans = onDisk.filterNot(referenced.contains).sorted
      orphans.foreach(n => Files.deleteIfExists(dataDir.resolve(n)))
      orphans
      }
    }

    private def assignIds(base: Snapshot,
        newFiles: Seq[PendingFile]): (Seq[LakeFile], Int) = {
      var id = base.maxFileId
      // files record the PHYSICAL columns they hold (write tasks encode
      // parquet under physical names; identity when no mapping exists)
      val physCols = base.schema.fieldNames.toSeq.map(base.phys)
      val entries = newFiles.map { pf =>
        // a partition-spec change racing this write would silently
        // mis-key the values (zip truncates) — conflict loudly instead
        require(pf.partition.size == base.partitionCols.size,
          s"$tableName: staged file ${pf.name} carries ${pf.partition.size} " +
            s"partition values but the current spec has " +
            s"${base.partitionCols.size} columns (a partition-spec change " +
            "landed mid-write; retry the statement)")
        id += 1
        LakeFile(id, s"data/${pf.name}", pf.rows, physCols,
          base.partitionCols.zip(pf.partition).toMap, pf.stats,
          bytes = pf.bytes)
      }
      (entries, id)
    }

    private def retryCommit(next: Snapshot => Snapshot): Int = {
      var attempts = 0
      while (true) {
        val candidate = next(snapshot(latestVersion))
        if (tryPublish(candidate)) return candidate.version
        attempts += 1
        resolveBlocker(candidate.version, attempts)
      }
      -1 // unreachable
    }

    /** Atomic publish: stage to a temp file, hard-link to the final
      * manifest name. Link creation is atomic and fails iff the target
      * exists — the loser of a race sees `false`, never a torn file.
      * Strips any pendingTxn carried over from a committed-transaction
      * base snapshot (a derived commit is its own, decided, snapshot —
      * only [[tryPublishPending]] publishes transactional manifests). */
    private def tryPublish(s: Snapshot): Boolean =
      publishManifest(s.copy(pendingTxn = None))

    private def tryPublishPending(s: Snapshot): Boolean = publishManifest(s)

    private def publishManifest(s: Snapshot): Boolean = {
      val target = tableDir.resolve(manifestName(s.version))
      if (Files.exists(target)) return false
      val tmp = Files.createTempFile(tableDir, ".manifest-", ".tmp")
      try {
        Files.write(tmp, renderManifest(s).getBytes("UTF-8"))
        try { Files.createLink(target, tmp); cache.put(target.toString, s); true }
        catch { case _: FileAlreadyExistsException => false }
      } finally Files.deleteIfExists(tmp)
    }

    /** Publish this table's half of multi-table transaction `txnId`:
      * `op` applied to the latest VISIBLE snapshot, at the next log
      * slot, carrying the pendingTxn id — readers hold it invisible
      * until the transaction's decision marker commits. */
    private[v2] def publishPendingOp(txnId: String, op: String,
        newFiles: Seq[PendingFile]): Int = {
      // transactions publish against the LOG head; a table that has
      // opted into branch lineage would silently never surface the
      // result to its default (main) readers — loud, not surprising
      require(branchHead("main").isEmpty,
        s"$tableName: has a 'main' branch — multi-table transactions " +
          "commit to the log head and do not advance branch pointers; " +
          "fast-forward explicitly or use branch-context writes")
      var attempts = 0
      while (true) {
        val base = snapshot(latestVersion)
        newFiles.foreach { pf =>
          require(pf.partition.size == base.partitionCols.size,
            s"$tableName: staged file ${pf.name} carries ${pf.partition.size} " +
              s"partition values; table has ${base.partitionCols.size} " +
              "partition columns")
        }
        val (entries, maxId) = assignIds(base, newFiles)
        val next = op match {
          case "append" => base.copy(version = base.version + 1,
            files = base.files ++ entries, maxFileId = maxId, op = "append",
            pendingTxn = Some(txnId))
          case "overwrite" => base.copy(version = base.version + 1,
            files = entries, maxFileId = maxId, op = "overwrite",
            pendingTxn = Some(txnId))
          case other => throw new IllegalArgumentException(
            s"transaction op must be append|overwrite, got $other")
        }
        if (tryPublishPending(next)) return next.version
        attempts += 1
        resolveBlocker(next.version, attempts)
      }
      -1 // unreachable
    }

    /** Delete transaction `txnId`'s pending manifest at `v` — ONLY if
      * it is ours and still pending (never a decided or foreign one). */
    private[v2] def clearPending(txnId: String, v: Int): Unit =
      readManifest(v) match {
        // only a DECIDED-aborted transaction's manifest may be cleared:
        // an undecided one may still commit (its coordinator decides),
        // and a committed one is live table state
        case Some(s) if s.pendingTxn.contains(txnId) &&
            GraftLakeStore.txnState(rootDir, txnId).contains("aborted") =>
          val p = tableDir.resolve(manifestName(v))
          cache.remove(p.toString)
          Files.deleteIfExists(p)
          ()
        case _ => ()
      }

    /** A publish lost the link race at version `v`. Usually the winner
      * is a committed snapshot and the caller just rebases. If the
      * occupant belongs to an UNDECIDED multi-table transaction, wait
      * for its decision with an ESCALATING backoff; only past the grace
      * window (default 2 s, `graft.lake.txnGraceMs`) decide ABORT on
      * its behalf (coordinator-crash recovery — the decision marker
      * makes abort-vs-commit one atomic link, so a racing coordinator
      * either beat us or sees the abort and rolls back) and clear the
      * manifest so the slot frees. The window is long enough that a
      * LIVE coordinator paused by GC or slow IO between publishing its
      * pending manifests and linking the decision marker is not
      * spuriously aborted by routine load. Throws once attempts
      * exhaust. */
    private def resolveBlocker(v: Int, attempts: Int): Unit = {
      if (attempts > 400) throw new IllegalStateException(
        s"$tableName: commit still racing after $attempts attempts")
      readManifest(v).foreach { s =>
        s.pendingTxn.foreach { id =>
          GraftLakeStore.txnState(rootDir, id) match {
            case None =>
              // escalating sleep: 5,10,…,50,50,… ms — cumulative wait
              // crosses graceMs around attempt graceMs/50 + 5
              val slept = (1 until attempts).map(a => math.min(a * 5L, 50L)).sum
              if (slept >= GraftLakeStore.txnGraceMs) {
                if (GraftLakeStore.decideTxn(rootDir, id, "aborted") == "aborted")
                  clearPending(id, v)
              } else Thread.sleep(math.min(attempts * 5L, 50L))
            case Some("aborted") => clearPending(id, v)
            case _ => () // committed: visible now; the retry rebases on it
          }
        }
      }
    }

    private[v2] def writeManifest(s: Snapshot): Unit = {
      require(tryPublish(s), s"$tableName: manifest v${s.version} already exists")
    }
  }

  // ---- manifest (de)serialization: hand-rendered, jackson-parsed ----

  private def esc(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"').toString
  }

  private def renderManifest(s: Snapshot): String = {
    val files = s.files.map { f =>
      val part = f.partition.toSeq.sortBy(_._1).map { case (k, v) =>
        s"${esc(k)}:${v.map(esc).getOrElse("null")}" }.mkString("{", ",", "}")
      val stats = f.stats.toSeq.sortBy(_._1).map { case (k, st) =>
        s"${esc(k)}:{" +
          s""""min":${st.min.map(esc).getOrElse("null")},""" +
          s""""max":${st.max.map(esc).getOrElse("null")},""" +
          s""""nulls":${st.nulls}}"""
      }.mkString("{", ",", "}")
      val dvs = f.dvs.map { d =>
        s"""{"path":${esc(d.path)},"dels":${d.dels}}""" }.mkString("[", ",", "]")
      s"""{"id":${f.id},"path":${esc(f.path)},"rows":${f.rows},"bytes":${f.bytes},""" +
        s""""columns":${f.columns.map(esc).mkString("[", ",", "]")},""" +
        s""""partition":$part,"stats":$stats,"dvs":$dvs}"""
    }.mkString("[", ",", "]")
    val txn = s.txn.map { case (q, e) =>
      s""""txnQuery":${esc(q)},"txnEpoch":$e,""" }.getOrElse("")
    val pend = s.pendingTxn.map(id =>
      s""""pendingTxn":${esc(id)},""").getOrElse("")
    val props = s.props.toSeq.sortBy(_._1).map { case (k, v) =>
      s"${esc(k)}:${esc(v)}" }.mkString("{", ",", "}")
    val colPhys = s.colPhys.toSeq.sortBy(_._1).map { case (k, v) =>
      s"${esc(k)}:${esc(v)}" }.mkString("{", ",", "}")
    val eq = s.eqDels.map { e =>
      s"""{"path":${esc(e.path)},"keyCols":${e.keyCols.map(esc)
        .mkString("[", ",", "]")},""" +
        s""""bound":${e.bound},"rows":${e.rows}}""" }.mkString("[", ",", "]")
    val pf = s.partFields.map { f =>
      s"""{"col":${esc(f.col)},"transform":${esc(f.transform)},"param":${f.param}}"""
    }.mkString("[", ",", "]")
    s"""{"version":${s.version},"maxFileId":${s.maxFileId},"op":${esc(s.op)},$txn$pend""" +
      s""""partFields":$pf,""" +
      s""""props":$props,"colPhys":$colPhys,"eqDels":$eq,""" +
      s""""schema":${s.schema.json},"files":$files}"""
  }

  private def parseManifest(json: String): Snapshot = {
    val n = mapper.readTree(json)
    def strs(a: JsonNode): Seq[String] =
      a.elements().asScala.map(_.asText()).toSeq
    val files = n.get("files").elements().asScala.map { f =>
      val part = f.get("partition").properties().asScala.map { e =>
        e.getKey -> (if (e.getValue.isNull) None else Some(e.getValue.asText()))
      }.toMap
      val stats = Option(f.get("stats")).map(_.properties().asScala.map { e =>
        def os(x: JsonNode) = if (x == null || x.isNull) None else Some(x.asText())
        e.getKey -> ColStats(os(e.getValue.get("min")), os(e.getValue.get("max")),
          e.getValue.get("nulls").asLong())
      }.toMap).getOrElse(Map.empty[String, ColStats])
      val dvs = Option(f.get("dvs")).map(_.elements().asScala.map { d =>
        DvRef(d.get("path").asText(), d.get("dels").asLong())
      }.toSeq).getOrElse(Seq.empty)
      LakeFile(f.get("id").asInt(), f.get("path").asText(), f.get("rows").asLong(),
        strs(f.get("columns")), part, stats, dvs,
        Option(f.get("bytes")).map(_.asLong()).getOrElse(0L))
    }.toSeq
    // "partFields" is current; bare "partitionCols" reads pre-transform
    // manifests as identity fields
    val partFields = Option(n.get("partFields")).map(_.elements().asScala.map { f =>
      PartField(f.get("col").asText(), f.get("transform").asText(),
        f.get("param").asInt())
    }.toSeq).getOrElse(
      Option(n.get("partitionCols")).map(strs).getOrElse(Seq.empty)
        .map(PartField(_)))
    Snapshot(
      n.get("version").asInt(),
      DataType.fromJson(n.get("schema").toString).asInstanceOf[StructType],
      partFields,
      files,
      n.get("maxFileId").asInt(),
      Option(n.get("op")).map(_.asText()).getOrElse("create"),
      Option(n.get("txnQuery")).map(q => (q.asText(), n.get("txnEpoch").asLong())),
      Option(n.get("props")).map(_.properties().asScala.map { e =>
        e.getKey -> e.getValue.asText() }.toMap).getOrElse(Map.empty),
      Option(n.get("colPhys")).map(_.properties().asScala.map { e =>
        e.getKey -> e.getValue.asText() }.toMap).getOrElse(Map.empty),
      Option(n.get("pendingTxn")).map(_.asText()),
      Option(n.get("eqDels")).map(_.elements().asScala.map { e =>
        // "keyCols" is current; "keyCol" reads pre-composite manifests
        val cols = Option(e.get("keyCols")).map(strs)
          .getOrElse(Seq(e.get("keyCol").asText()))
        EqRef(e.get("path").asText(), cols,
          e.get("bound").asInt(), e.get("rows").asLong())
      }.toSeq).getOrElse(Seq.empty))
  }
}
