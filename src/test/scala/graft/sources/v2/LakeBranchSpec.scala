package graft.sources.v2

import graft.SparkSpec
import org.apache.spark.sql.{Row, SparkSession}

/** Branch refs (mutable named pointers, Iceberg's branch kind) and the
  * write-audit-publish flow they exist for:
  *
  *  - once a `main` branch exists, DEFAULT reads resolve its head —
  *    commits on another branch are invisible until fast-forwarded;
  *  - `SET spark.graft.lake.branch = <b>` routes a session's reads AND
  *    writes through branch `<b>` (the `spark.wap.branch` device);
  *  - `CALL graft_lake.system.fast_forward(t, 'main', 'audit')` is the
  *    publish: main jumps to the audited head, one atomic pointer move;
  *  - a failed audit leaves main bit-identical and the branch (plus its
  *    orphan snapshots) GC-able;
  *  - branch heads pin their snapshots against expiration, like tags.
  */
class LakeBranchSpec extends SparkSpec {

  private def lakeSession(cat: String, root: String): SparkSession = {
    val ss = spark.newSession()
    ss.conf.set(s"spark.sql.catalog.$cat", classOf[GraftLakeCatalog].getName)
    ss.conf.set(s"spark.sql.catalog.$cat.root", root)
    ss
  }

  test("write-audit-publish on one table: audit writes invisible to main until fast_forward") {
    val root = graft.util.TempDirs.create("graft_branch_wap_").toString
    val ss = lakeSession("brw", root)
    import ss.implicits._
    ss.sql("CREATE TABLE brw.ns.t (k BIGINT, v STRING)")
    Seq((1L, "base")).toDF("k", "v").writeTo("brw.ns.t").append() // v1
    ss.sql("CALL brw.system.create_branch(table => 'ns.t', branch => 'main', version => 1)")
    ss.sql("CALL brw.system.create_branch(table => 'ns.t', branch => 'audit', version => 1)")

    // the WRITER session targets the audit branch
    val auditor = lakeSession("brw2", root)
    auditor.conf.set(LakeTable.BranchConf, "audit")
    locally {
      import auditor.implicits.{localSeqToDatasetHolder => auditorToDs}
      auditorToDs(Seq((2L, "candidate"), (3L, "candidate"))).toDF("k", "v")
        .writeTo("brw2.ns.t").append()
    }

    // the auditor sees its branch; main readers see NOTHING new
    assert(auditor.sql("SELECT count(*) FROM brw2.ns.t").head().getLong(0) === 3L)
    assert(ss.sql("SELECT count(*) FROM brw.ns.t").head().getLong(0) === 1L)
    assert(ss.sql("SELECT count(*) FROM brw.ns.t VERSION AS OF 'audit'")
      .head().getLong(0) === 3L)

    // PUBLISH: main fast-forwards to the audited head
    val ff = ss.sql("CALL brw.system.fast_forward(table => 'ns.t', " +
      "to => 'main', from => 'audit')").collect()
    assert(ff.toSeq === Seq(Row(1, 2)))
    assert(ss.sql("SELECT * FROM brw.ns.t ORDER BY k").collect().toSeq ===
      Seq(Row(1L, "base"), Row(2L, "candidate"), Row(3L, "candidate")))
  }

  test("failed audit: drop the branch, main is bit-identical and the orphans are GC-able") {
    val root = graft.util.TempDirs.create("graft_branch_fail_").toString
    val ss = lakeSession("brf", root)
    import ss.implicits._
    ss.sql("CREATE TABLE brf.ns.t (k BIGINT)")
    Seq(Tuple1(1L)).toDF("k").coalesce(1).writeTo("brf.ns.t").append() // v1
    ss.sql("CALL brf.system.create_branch(table => 'ns.t', branch => 'main', version => 1)")
    ss.sql("CALL brf.system.create_branch(table => 'ns.t', branch => 'bad', version => 1)")
    val before = ss.sql("SELECT * FROM brf.ns.t ORDER BY k").collect().toSeq

    val auditor = lakeSession("brf2", root)
    auditor.conf.set(LakeTable.BranchConf, "bad")
    locally {
      import auditor.implicits.{localSeqToDatasetHolder => auditorToDs}
      auditorToDs(Seq(Tuple1(-999L))).toDF("k").coalesce(1)
        .writeTo("brf2.ns.t").append() // v2 on 'bad'
    }

    // audit fails → drop the branch; main never saw the commit
    ss.sql("CALL brf.system.drop_branch(table => 'ns.t', branch => 'bad')")
    assert(ss.sql("SELECT * FROM brf.ns.t ORDER BY k").collect().toSeq === before)
    // a follow-up good write lands on main CONTENT (not on the orphan's)
    Seq(Tuple1(2L)).toDF("k").coalesce(1).writeTo("brf.ns.t").append() // v3
    assert(ss.sql("SELECT * FROM brf.ns.t ORDER BY k").collect().toSeq ===
      Seq(Row(1L), Row(2L)))
    // and the orphan snapshot (v2) is expirable: nothing pins it
    val handle = GraftLakeStore.get(root, "ns.t").get
    val expired = handle.expireSnapshots(keepLast = 1)
    assert(expired.contains(2), s"orphan audit snapshot not GC'd: $expired")
    assert(ss.sql("SELECT count(*) FROM brf.ns.t").head().getLong(0) === 2L)
  }

  test("branch heads pin snapshots against expiration; DML on main advances main") {
    val root = graft.util.TempDirs.create("graft_branch_pin_").toString
    val ss = lakeSession("brp", root)
    import ss.implicits._
    ss.sql("CREATE TABLE brp.ns.t (k BIGINT, v BIGINT)")
    Seq((1L, 10L), (2L, 20L)).toDF("k", "v").coalesce(1)
      .writeTo("brp.ns.t").append() // v1
    ss.sql("CALL brp.system.create_branch(table => 'ns.t', branch => 'main', version => 1)")
    // DML routes through main and advances it
    ss.sql("UPDATE brp.ns.t SET v = 99 WHERE k = 2") // v2, main → 2
    assert(ss.sql("SELECT v FROM brp.ns.t WHERE k = 2").head().getLong(0) === 99L)
    val handle = GraftLakeStore.get(root, "ns.t").get
    assert(handle.branches()("main") === 2)
    // park a branch at v1, stack commits, expire: v1 survives via the pin
    handle.createBranch("parked", 1)
    (3 to 6).foreach(i => ss.sql(s"INSERT INTO brp.ns.t VALUES ($i, 0)"))
    handle.expireSnapshots(keepLast = 1)
    assert(ss.sql("SELECT count(*) FROM brp.ns.t VERSION AS OF 'parked'")
      .head().getLong(0) === 2L)
    assert(intercept[IllegalStateException](handle.snapshot(2))
      .getMessage.contains("expired"))
  }

  test("ref namespace is shared: branch/tag name collisions and all-digit names rejected") {
    val root = graft.util.TempDirs.create("graft_branch_names_").toString
    val ss = lakeSession("brn", root)
    ss.sql("CREATE TABLE brn.ns.t (k BIGINT)")
    val handle = GraftLakeStore.get(root, "ns.t").get
    handle.createTag("rel", 0)
    assert(intercept[IllegalArgumentException](handle.createBranch("rel", 0))
      .getMessage.contains("TAG"))
    handle.createBranch("dev", 0)
    assert(intercept[IllegalArgumentException](handle.createTag("dev", 0))
      .getMessage.contains("BRANCH"))
    assert(intercept[IllegalArgumentException](handle.createBranch("42", 0))
      .getMessage.contains("digit"))
    // advance is fast-forward-only unless explicitly rewound
    ss.sql("INSERT INTO brn.ns.t VALUES (1)")
    handle.advanceBranch("dev", 1)
    assert(intercept[IllegalArgumentException](handle.advanceBranch("dev", 0))
      .getMessage.contains("fast-forward"))
    handle.advanceBranch("dev", 0, allowRewind = true)
    assert(handle.branches()("dev") === 0)
    // the t$refs metadata table lists tags AND branches with kinds
    assert(ss.sql("SELECT name, kind, version FROM brn.ns.`t$refs` ORDER BY name")
      .collect().toSeq === Seq(Row("dev", "branch", 0), Row("rel", "tag", 0)))
  }
}
