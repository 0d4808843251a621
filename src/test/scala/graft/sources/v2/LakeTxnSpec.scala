package graft.sources.v2

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import GraftLakeStore.PendingFile

/** Multi-table transactional commit: per-table pending manifests are
  * INVISIBLE until one root-level decision marker links `committed` —
  * the atomicity point for every participating table at once. The pins:
  *
  *  - a coordinator crash BETWEEN the two tables' publishes (or after
  *    both, before the marker) leaves readers on the old versions of
  *    BOTH tables — no torn pair, ever;
  *  - linking the marker flips both tables together;
  *  - an aborted transaction's manifests free their version slots and
  *    later writers proceed;
  *  - a writer blocked by a crashed coordinator's reservation aborts it
  *    after the grace window and commits (self-healing liveness);
  *  - Transaction.commit raced by an abort rolls back and throws,
  *    nothing visible.
  */
class LakeTxnSpec extends SparkSpec {

  private def lakeSession(cat: String, root: String): SparkSession = {
    val ss = spark.newSession()
    ss.conf.set(s"spark.sql.catalog.$cat", classOf[GraftLakeCatalog].getName)
    ss.conf.set(s"spark.sql.catalog.$cat.root", root)
    ss
  }

  /** One committed parquet data file for `tbl`, returned as a fresh
    * PendingFile for a later staged commit (same bytes, new name). */
  private def pendingFor(root: String, key: String, ss: SparkSession,
      tag: String): PendingFile = {
    val h = GraftLakeStore.get(root, key).get
    val existing = h.snapshot(h.latestVersion).files.head
    val src = h.tableDir.resolve(existing.path)
    val name = s"txnspec-$tag.parquet"
    Files.copy(src, h.dataDir.resolve(name))
    PendingFile(name, existing.rows, Seq.empty, Map.empty, Files.size(src))
  }

  test("crash between publishes: readers never see a torn pair; the marker flips both atomically") {
    val root = graft.util.TempDirs.create("graft_txn_crash_").toString
    val ss = lakeSession("txc", root)
    import ss.implicits._
    ss.sql("CREATE TABLE txc.ns.a (k BIGINT)")
    ss.sql("CREATE TABLE txc.ns.b (k BIGINT)")
    Seq(Tuple1(1L)).toDF("k").coalesce(1).writeTo("txc.ns.a").append()
    Seq(Tuple1(2L)).toDF("k").coalesce(1).writeTo("txc.ns.b").append()
    val ha = GraftLakeStore.get(root, "ns.a").get
    val hb = GraftLakeStore.get(root, "ns.b").get

    // simulate the coordinator: publish table a's pending manifest …
    val txnId = "txnspec-crash-01"
    val va = ha.publishPendingOp(txnId, "append", Seq(pendingFor(root, "ns.a", ss, "a")))
    assert(va === 2)
    // … CRASH before table b's publish: BOTH tables read old
    assert(ha.latestVersion === 1 && hb.latestVersion === 1)
    assert(ss.sql("SELECT count(*) FROM txc.ns.a").head().getLong(0) === 1L)
    assert(ss.sql("SELECT count(*) FROM txc.ns.b").head().getLong(0) === 1L)
    // the reserved snapshot is unreadable by version too
    assert(intercept[Exception](ha.snapshot(2)).getMessage.contains("no snapshot 2"))

    // resume: publish b, then link the decision marker — ONE atomic op
    val vb = hb.publishPendingOp(txnId, "append", Seq(pendingFor(root, "ns.b", ss, "b")))
    assert(hb.latestVersion === 1, "still invisible before the marker")
    assert(GraftLakeStore.decideTxn(
      Paths.get(root).toAbsolutePath.normalize, txnId, "committed") === "committed")
    // both tables flipped together
    assert(ha.latestVersion === va && hb.latestVersion === vb)
    assert(ss.sql("SELECT count(*) FROM txc.ns.a").head().getLong(0) === 2L)
    assert(ss.sql("SELECT count(*) FROM txc.ns.b").head().getLong(0) === 2L)
  }

  test("Transaction.commit is all-or-nothing end-to-end; an aborted txn frees its slots") {
    val root = graft.util.TempDirs.create("graft_txn_e2e_").toString
    val ss = lakeSession("txe", root)
    import ss.implicits._
    ss.sql("CREATE TABLE txe.ns.a (k BIGINT)")
    ss.sql("CREATE TABLE txe.ns.b (k BIGINT)")
    Seq(Tuple1(1L)).toDF("k").coalesce(1).writeTo("txe.ns.a").append()
    Seq(Tuple1(2L)).toDF("k").coalesce(1).writeTo("txe.ns.b").append()

    // happy path: both tables advance in one commit
    val versions = GraftLakeStore.beginTransaction(root)
      .stageAppend("ns.a", Seq(pendingFor(root, "ns.a", ss, "ok-a")))
      .stageAppend("ns.b", Seq(pendingFor(root, "ns.b", ss, "ok-b")))
      .commit()
    assert(versions === Map("ns.a" -> 2, "ns.b" -> 2))
    assert(ss.sql("SELECT count(*) FROM txe.ns.a").head().getLong(0) === 2L)
    assert(ss.sql("SELECT count(*) FROM txe.ns.b").head().getLong(0) === 2L)

    // raced abort: a concurrent writer decides 'aborted' BEFORE the
    // coordinator's marker — commit() must roll back and throw, and
    // nothing becomes visible
    val txn = GraftLakeStore.beginTransaction(root)
      .stageAppend("ns.a", Seq(pendingFor(root, "ns.a", ss, "bad-a")))
      .stageAppend("ns.b", Seq(pendingFor(root, "ns.b", ss, "bad-b")))
    assert(GraftLakeStore.decideTxn(
      Paths.get(root).toAbsolutePath.normalize, txn.id, "aborted") === "aborted")
    val e = intercept[GraftLakeStore.CommitConflictException](txn.commit())
    assert(e.getMessage.contains("aborted"))
    assert(ss.sql("SELECT count(*) FROM txe.ns.a").head().getLong(0) === 2L)
    assert(ss.sql("SELECT count(*) FROM txe.ns.b").head().getLong(0) === 2L)
    // the freed slots are writable again
    Seq(Tuple1(9L)).toDF("k").coalesce(1).writeTo("txe.ns.a").append()
    assert(GraftLakeStore.get(root, "ns.a").get.latestVersion === 3)
    // and the aborted transaction's staged data files are orphans that
    // vacuum collects (nothing references them)
    val vacA = GraftLakeStore.get(root, "ns.a").get.vacuumOrphans()
    val vacB = GraftLakeStore.get(root, "ns.b").get.vacuumOrphans()
    assert(vacA.exists(_.contains("bad-a")) && vacB.exists(_.contains("bad-b")),
      s"aborted txn files not collected: a=$vacA b=$vacB")
    assert(ss.sql("SELECT count(*) FROM txe.ns.a").head().getLong(0) === 3L)
  }

  test("a writer blocked by a crashed coordinator's reservation aborts it after the grace window") {
    val root = graft.util.TempDirs.create("graft_txn_heal_").toString
    val ss = lakeSession("txh", root)
    import ss.implicits._
    ss.sql("CREATE TABLE txh.ns.t (k BIGINT)")
    Seq(Tuple1(1L)).toDF("k").coalesce(1).writeTo("txh.ns.t").append()
    val h = GraftLakeStore.get(root, "ns.t").get
    // a crashed coordinator left an undecided reservation at v2
    val orphanTxn = "txnspec-orphan-01"
    h.publishPendingOp(orphanTxn, "append", Seq(pendingFor(root, "ns.t", ss, "orphan")))
    assert(h.latestVersion === 1)
    // an ordinary append self-heals: waits the grace window, aborts the
    // orphan, takes the slot
    Seq(Tuple1(2L)).toDF("k").coalesce(1).writeTo("txh.ns.t").append()
    assert(h.latestVersion === 2)
    assert(ss.sql("SELECT count(*) FROM txh.ns.t").head().getLong(0) === 2L)
    assert(GraftLakeStore.txnState(
      Paths.get(root).toAbsolutePath.normalize, orphanTxn).contains("aborted"))
    // and a resurrected coordinator cannot commit the aborted txn
    assert(GraftLakeStore.decideTxn(
      Paths.get(root).toAbsolutePath.normalize, orphanTxn, "committed") === "aborted")
  }
}
