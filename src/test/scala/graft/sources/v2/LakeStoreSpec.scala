package graft.sources.v2

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import graft.SparkSpec
import org.apache.spark.sql.{Row, SparkSession}

/** The storage contract behind the lake catalog now that it is file-
  * backed: snapshots survive the writing session (a FRESH catalog
  * instance in a second SparkSession reads every committed version from
  * disk), data files are plain parquet, expiration GCs only what no
  * survivor references, and the commit protocol is optimistic —
  * concurrent CREATEs raise the typed error and a row-level replace
  * over a stale base fails loudly instead of last-writer-wins. */
class LakeStoreSpec extends SparkSpec {

  /** A session with its own catalog name + explicit root, so each test
    * controls (and can inspect) the table directory. */
  private def lakeSession(cat: String, root: String,
      base: SparkSession): SparkSession = {
    val ss = base.newSession()
    ss.conf.set(s"spark.sql.catalog.$cat", classOf[GraftLakeCatalog].getName)
    ss.conf.set(s"spark.sql.catalog.$cat.root", root)
    ss
  }

  test("snapshots survive the session: a fresh catalog instance reads every VERSION AS OF") {
    val root = graft.util.TempDirs.create("graft_lake_persist_").toString
    val writer = lakeSession("lkw", root, spark)
    import writer.implicits._
    writer.sql("CREATE TABLE lkw.ns.t (k BIGINT, v STRING)")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").writeTo("lkw.ns.t").append()
    writer.sql("UPDATE lkw.ns.t SET v = 'z' WHERE k = 2")

    // a SECOND SparkSession: fresh SessionState, fresh GraftLakeCatalog
    // instance — everything it knows comes from the manifests on disk
    val reader = lakeSession("lkr", root, spark)
    assert(reader.sql("SELECT * FROM lkr.ns.t VERSION AS OF 0").count() === 0L)
    assert(reader.sql("SELECT * FROM lkr.ns.t VERSION AS OF 1 ORDER BY k")
      .collect().toSeq === Seq(Row(1L, "a"), Row(2L, "b")))
    assert(reader.sql("SELECT * FROM lkr.ns.t VERSION AS OF 2 ORDER BY k")
      .collect().toSeq === Seq(Row(1L, "a"), Row(2L, "z")))
    assert(reader.sql("SELECT * FROM lkr.ns.t ORDER BY k")
      .collect().toSeq === Seq(Row(1L, "a"), Row(2L, "z")))
    // and the reader can keep writing where the writer left off (the
    // INSERT must run on the READER session — its catalog registration)
    reader.sql("INSERT INTO lkr.ns.t VALUES (3, 'c')")
    assert(writer.sql("SELECT count(*) FROM lkw.ns.t").head().getLong(0) === 3L)
  }

  test("data files are plain parquet under the table root, one manifest per snapshot") {
    val root = graft.util.TempDirs.create("graft_lake_layout_").toString
    val ss = lakeSession("lkl", root, spark)
    import ss.implicits._
    ss.sql("CREATE TABLE lkl.ns.t (k BIGINT, v STRING)")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1).writeTo("lkl.ns.t").append()
    val dir = Paths.get(root, "ns.t")
    val manifests = Files.list(dir).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("manifest-")).toSeq.sorted
    assert(manifests === Seq("manifest-v00000.json", "manifest-v00001.json"))
    val data = Files.list(dir.resolve("data")).iterator().asScala.toSeq
    assert(data.size === 1)
    // any parquet reader sees the rows — the storage is not bespoke
    assert(spark.read.parquet(data.head.toString).orderBy("k").collect().toSeq
      === Seq(Row(1L, "a"), Row(2L, "b")))
  }

  test("expiration: retained versions unchanged, expired fail loudly, orphaned files GC'd") {
    val root = graft.util.TempDirs.create("graft_lake_expire_").toString
    val ss = lakeSession("lke", root, spark)
    import ss.implicits._
    ss.sql("CREATE TABLE lke.ns.t (k BIGINT, v STRING)")
    Seq((1L, "seed")).toDF("k", "v").coalesce(1).writeTo("lke.ns.t").append()
    // v2 truncate-replaces: v1's file is referenced by NO survivor once
    // v0/v1 expire
    ss.sql("INSERT OVERWRITE lke.ns.t SELECT k, 'over' FROM lke.ns.t")
    Seq((2L, "tail")).toDF("k", "v").coalesce(1).writeTo("lke.ns.t").append()

    val dir = Paths.get(root, "ns.t")
    def dataFiles() = Files.list(dir.resolve("data")).iterator().asScala.size
    assert(dataFiles() === 3)
    val pre = ss.sql("SELECT * FROM lke.ns.t VERSION AS OF 2 ORDER BY k").collect().toSeq

    val handle = GraftLakeStore.get(root, "ns.t").get
    assert(handle.expireSnapshots(keepLast = 2) === Seq(0, 1))

    // retained reads byte-identical
    assert(ss.sql("SELECT * FROM lke.ns.t VERSION AS OF 2 ORDER BY k")
      .collect().toSeq === pre)
    assert(ss.sql("SELECT * FROM lke.ns.t ORDER BY k").collect().toSeq
      === Seq(Row(1L, "over"), Row(2L, "tail")))
    // expired reads fail loudly
    val e = intercept[Throwable](
      ss.sql("SELECT * FROM lke.ns.t VERSION AS OF 1").collect())
    def msgs(t: Throwable): List[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) :: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("expired")), msgs(e))
    // v1's seed file was referenced only by expired snapshots — gone;
    // the overwrite + tail files survive
    assert(dataFiles() === 2)
  }

  test("raced CREATE TABLE raises the typed TableAlreadyExistsException for the loser") {
    val root = graft.util.TempDirs.create("graft_lake_race_").toString
    val ss = lakeSession("lkc", root, spark)
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val results =
      try Await.result(Future.sequence((0 until 4).map { _ =>
        Future {
          try { ss.sql("CREATE TABLE lkc.ns.raced (k BIGINT)"); "ok" }
          catch {
            case e: Throwable =>
              def chain(t: Throwable): List[Throwable] =
                if (t == null) Nil else t :: chain(t.getCause)
              if (chain(e).exists(
                _.isInstanceOf[org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException]))
                "exists" else s"unexpected: $e"
          }
        }
      }), 120.seconds).toList
      finally pool.shutdown()
    assert(results.count(_ == "ok") === 1, results)
    assert(results.count(_ == "exists") === 3, results)
  }

  test("a row-level replace over a stale base fails loudly (optimistic concurrency)") {
    val root = graft.util.TempDirs.create("graft_lake_conflict_").toString
    val ss = lakeSession("lkx", root, spark)
    import ss.implicits._
    ss.sql("CREATE TABLE lkx.ns.t (k BIGINT, v BIGINT)")
    Seq((1L, 10L), (2L, 20L)).toDF("k", "v").writeTo("lkx.ns.t").append()
    val handle = GraftLakeStore.get(root, "ns.t").get
    val scannedBase = handle.latestVersion // = 1, as a row-level scan would pin
    // a concurrent append lands between the scan and the commit
    Seq((3L, 30L)).toDF("k", "v").writeTo("lkx.ns.t").append()
    val e = intercept[GraftLakeStore.CommitConflictException] {
      handle.commitReplace(scannedBase, replacedIds = Set(1), newFiles = Seq.empty)
    }
    assert(e.getMessage.contains("concurrent commit"))
    // nothing was lost: the table still holds all three rows
    assert(ss.sql("SELECT count(*) FROM lkx.ns.t").head().getLong(0) === 3L)
  }

  test("appends racing appends lose no rows (rebase-and-retry commit)") {
    val root = graft.util.TempDirs.create("graft_lake_appendrace_").toString
    val ss = lakeSession("lka", root, spark)
    ss.sql("CREATE TABLE lka.ns.t (k BIGINT)")
    val pool = Executors.newFixedThreadPool(6)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try Await.result(Future.sequence((0 until 6).map { i =>
      Future {
        val s2 = ss.newSession()
        s2.conf.set("spark.sql.catalog.lka", classOf[GraftLakeCatalog].getName)
        s2.conf.set("spark.sql.catalog.lka.root", root)
        s2.sql(s"INSERT INTO lka.ns.t VALUES ($i)")
      }
    }), 120.seconds)
    finally pool.shutdown()
    assert(ss.sql("SELECT count(*) FROM lka.ns.t").head().getLong(0) === 6L)
    assert(GraftLakeStore.get(root, "ns.t").get.latestVersion === 6)
  }

  test("handles are interned: every get/create for one table dir returns the SAME object") {
    val root = graft.util.TempDirs.create("graft_lake_intern_").toString
    val ss = lakeSession("lki", root, spark)
    ss.sql("CREATE TABLE lki.ns.t (k BIGINT)")
    val a = GraftLakeStore.get(root, "ns.t").get
    val b = GraftLakeStore.get(root, "ns.t").get
    assert(a eq b,
      "maintenance synchronization is only real if get() interns handles")
    // a dropped-then-recreated table gets a fresh handle (no stale monitor)
    assert(GraftLakeStore.drop(root, "ns.t"))
    ss.sql("DROP TABLE IF EXISTS lki.ns.t")
  }

  /** The round-9 finding: expireSnapshots/vacuumOrphans were
    * `synchronized` on a PER-CALL handle, so the monitor excluded
    * nothing. With interned handles the lock is real — this race ran
    * red (interleaved tag-read/manifest-delete phases could strand
    * state) against fresh-handle semantics when run under a
    * yield-heavy schedule, and must stay green now. */
  test("racing maintenance: concurrent expires and an expire-vs-vacuum serialize on the interned handle") {
    val root = graft.util.TempDirs.create("graft_lake_mxrace_").toString
    val ss = lakeSession("lkm", root, spark)
    import ss.implicits._
    ss.sql("CREATE TABLE lkm.ns.t (k BIGINT)")
    (1 to 12).foreach(i => ss.sql(s"INSERT INTO lkm.ns.t VALUES ($i)"))
    val handle = GraftLakeStore.get(root, "ns.t").get
    handle.createTag("keep-v3", 3)
    // an uncommitted orphan for vacuum to find
    Files.write(handle.dataDir.resolve("orphan-crashed-writer.parquet"),
      Array[Byte](1, 2, 3))
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val ops = Seq(
        Future(handle.expireSnapshots(keepLast = 4)),
        Future(handle.expireSnapshots(keepLast = 4)),
        Future(handle.vacuumOrphans()),
        Future(handle.vacuumOrphans()))
      Await.result(Future.sequence(ops), 120.seconds)
    } finally pool.shutdown()
    // invariants after any interleaving: the retained window + the
    // tagged snapshot read exactly their committed content …
    assert(handle.latestVersion === 12)
    (9 to 12).foreach { v =>
      assert(ss.sql(s"SELECT count(*) FROM lkm.ns.t VERSION AS OF $v")
        .head().getLong(0) === v.toLong)
    }
    assert(ss.sql("SELECT count(*) FROM lkm.ns.t VERSION AS OF 'keep-v3'")
      .head().getLong(0) === 3L)
    // … expired versions are gone, the orphan is collected exactly once,
    // and no referenced data file was eaten
    assert(intercept[IllegalStateException](handle.snapshot(5))
      .getMessage.contains("expired"))
    assert(!Files.exists(handle.dataDir.resolve("orphan-crashed-writer.parquet")))
    assert(ss.sql("SELECT count(*) FROM lkm.ns.t").head().getLong(0) === 12L)
  }

  test("RENAME TABLE preserves every snapshot and tag; the old name raises the typed error") {
    val root = graft.util.TempDirs.create("graft_lake_rename_").toString
    val ss = lakeSession("lkn", root, spark)
    import ss.implicits._
    ss.sql("CREATE TABLE lkn.ns.src (k BIGINT, v STRING)")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").writeTo("lkn.ns.src").append()
    ss.sql("UPDATE lkn.ns.src SET v = 'z' WHERE k = 2")
    GraftLakeStore.get(root, "ns.src").get.createTag("rel-1", 1)

    ss.sql("ALTER TABLE lkn.ns.src RENAME TO ns.dst")

    // every VERSION AS OF (numeric AND named) survives the move
    assert(ss.sql("SELECT * FROM lkn.ns.dst VERSION AS OF 1 ORDER BY k")
      .collect().toSeq === Seq(Row(1L, "a"), Row(2L, "b")))
    assert(ss.sql("SELECT * FROM lkn.ns.dst VERSION AS OF 'rel-1' ORDER BY k")
      .collect().toSeq === Seq(Row(1L, "a"), Row(2L, "b")))
    assert(ss.sql("SELECT * FROM lkn.ns.dst ORDER BY k")
      .collect().toSeq === Seq(Row(1L, "a"), Row(2L, "z")))
    // a FRESH session sees only the new name (pure disk truth)
    val ss2 = lakeSession("lkn2", root, spark)
    assert(ss2.sql("SELECT count(*) FROM lkn2.ns.dst").head().getLong(0) === 2L)
    val e = intercept[Exception](ss2.sql("SELECT * FROM lkn2.ns.src").collect())
    assert(e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      e.toString.contains("NoSuchTable"), e.toString)
    // renaming over an existing table raises the typed conflict
    ss.sql("CREATE TABLE lkn.ns.other (k BIGINT)")
    val e2 = intercept[Exception](
      ss.sql("ALTER TABLE lkn.ns.dst RENAME TO ns.other"))
    assert(e2.toString.contains("TABLE_OR_VIEW_ALREADY_EXISTS") ||
      e2.toString.contains("AlreadyExists"), e2.toString)
    // and the reject left the source intact
    assert(ss.sql("SELECT count(*) FROM lkn.ns.dst").head().getLong(0) === 2L)
  }

  test("all-digit ref names are rejected at creation (VERSION AS OF would shadow them)") {
    val root = graft.util.TempDirs.create("graft_lake_digits_").toString
    val ss = lakeSession("lkd", root, spark)
    ss.sql("CREATE TABLE lkd.ns.t (k BIGINT)")
    val handle = GraftLakeStore.get(root, "ns.t").get
    val e = intercept[IllegalArgumentException](handle.createTag("123", 0))
    assert(e.getMessage.contains("digit"))
    handle.createTag("v123", 0) // a non-digit anywhere makes it resolvable
    assert(handle.resolveVersion("v123") === 0)
  }
}
