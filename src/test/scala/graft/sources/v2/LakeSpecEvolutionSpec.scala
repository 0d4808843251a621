package graft.sources.v2

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import GraftLakeStore.PendingFile

/** Partition-spec evolution (per-snapshot spec, metadata-only ALTER via
  * CALL procedures, per-file pruning by each file's OWN spec) and the
  * branch-divergence repair move (cherry-pick of pure-append
  * snapshots). The pins:
  *
  *  - add/drop_partition_field commit metadata only: every data file
  *    carries over by path, old snapshots keep their spec (time travel
  *    reads the OLD partitioning);
  *  - a filter on an old-spec column prunes old files EXACTLY by
  *    partition value and new files conservatively by stats — and vice
  *    versa for the new column;
  *  - mixed-spec tables keep partition predicates residual (row
  *    correctness can never depend on pruning) and disable grouped
  *    manifest-COUNT pushdown; compaction re-unifies the spec and
  *    restores both;
  *  - a write racing a spec change conflicts loudly (arity check), it
  *    cannot silently mis-key partition values;
  *  - cherry-pick re-applies ONE pure-append snapshot's files onto a
  *    diverged branch (shared by reference, fresh ids); any non-append
  *    snapshot is rejected loudly, and a diverged fast_forward names
  *    cherry_pick in its error.
  */
class LakeSpecEvolutionSpec extends SparkSpec {

  private def lakeSession(cat: String, root: String): SparkSession = {
    val ss = spark.newSession()
    ss.conf.set(s"spark.sql.catalog.$cat", classOf[GraftLakeCatalog].getName)
    ss.conf.set(s"spark.sql.catalog.$cat.root", root)
    ss
  }

  test("spec evolution: metadata-only, per-era pruning, time travel under the old spec") {
    val root = graft.util.TempDirs.create("graft_spec_evo_").toString
    val ss = lakeSession("spe", root)
    import ss.implicits._
    ss.sql("CREATE TABLE spe.ns.t (k BIGINT, region STRING, cat STRING) " +
      "PARTITIONED BY (region)")
    // era A under (region): r1-file all cat c1, r2-file all cat c2
    (Seq((1L, "r1", "c1"), (2L, "r1", "c1"), (3L, "r2", "c2"), (4L, "r2", "c2")))
      .toDF("k", "region", "cat").coalesce(1).writeTo("spe.ns.t").append() // v1
    val h = GraftLakeStore.get(root, "ns.t").get
    assert(h.snapshot(1).files.size === 2)

    // the migration: two metadata-only commits
    ss.sql("CALL spe.system.add_partition_field(table => 'ns.t', column => 'cat')")
    ss.sql("CALL spe.system.drop_partition_field(table => 'ns.t', column => 'region')")
    assert(h.snapshot(3).files.map(_.path) === h.snapshot(1).files.map(_.path),
      "spec change must rewrite nothing")
    assert(h.snapshot(1).partitionCols === Seq("region"))
    assert(h.snapshot(2).partitionCols === Seq("region", "cat"))
    assert(h.snapshot(3).partitionCols === Seq("cat"))

    // era B under (cat): c1-file all region r1, c2-file all region r2
    (Seq((5L, "r1", "c1"), (6L, "r1", "c1"), (7L, "r2", "c2")))
      .toDF("k", "region", "cat").coalesce(1).writeTo("spe.ns.t").append() // v4
    val files = h.snapshot(4).files
    assert(files.count(_.partition.keySet == Set("region")) === 2 &&
      files.count(_.partition.keySet == Set("cat")) === 2,
      "each era keeps the partition values of its OWN spec")

    // correctness across the boundary (partition predicates residual)
    assert(ss.sql("SELECT count(*) FROM spe.ns.t").head().getLong(0) === 7L)
    assert(ss.sql("SELECT count(*) FROM spe.ns.t WHERE region = 'r1'")
      .head().getLong(0) === 4L)
    assert(ss.sql("SELECT count(*) FROM spe.ns.t WHERE cat = 'c2'")
      .head().getLong(0) === 3L)

    // pruning: old-spec column → era A exact (r2 file dropped), era B by
    // stats (c2 file is all-r2 → dropped) = 2 of 4 files
    assert(ss.sql("SELECT k FROM spe.ns.t WHERE region = 'r1'")
      .rdd.getNumPartitions === 2)
    // new-spec column → era B exact (c2 file dropped), era A by stats
    // (r2 file is all-c2 → dropped) = 2 of 4 files
    assert(ss.sql("SELECT k FROM spe.ns.t WHERE cat = 'c1'")
      .rdd.getNumPartitions === 2)

    // time travel: v1 reads under the OLD spec — uniform, exact pruning
    assert(ss.sql("SELECT count(*) FROM spe.ns.t VERSION AS OF 1")
      .head().getLong(0) === 4L)
    assert(ss.sql("SELECT k FROM spe.ns.t VERSION AS OF 1 WHERE region = 'r1'")
      .rdd.getNumPartitions === 1)

    // grouped manifest-COUNT pushdown: disabled while mixed…
    val mixed = ss.sql("SELECT cat, count(*) FROM spe.ns.t GROUP BY cat")
    assert(!mixed.queryExecution.executedPlan.toString.contains("manifest count"),
      "grouped count cannot push down while old files lack the group value")
    assert(mixed.collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
      Set(("c1", 4L), ("c2", 3L)))
    // …global COUNT(*) stays pushable (needs no values)…
    assert(ss.sql("SELECT count(*) FROM spe.ns.t").queryExecution
      .executedPlan.toString.contains("manifest count"))
    // …and compaction re-unifies the spec, restoring the pushdown
    ss.sql("INSERT OVERWRITE spe.ns.t SELECT * FROM spe.ns.t")
    val unified = ss.sql("SELECT cat, count(*) FROM spe.ns.t GROUP BY cat")
    assert(unified.queryExecution.executedPlan.toString.contains("manifest count"))
    assert(unified.collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
      Set(("c1", 4L), ("c2", 3L)))
    assert(h.snapshot(h.latestVersion).files
      .forall(_.partition.keySet == Set("cat")))

    // a write racing a spec change conflicts loudly: staged arity is
    // validated against the CURRENT spec at commit
    assert(intercept[IllegalArgumentException](
      h.commitAppend(Seq(PendingFile("stale.parquet", 1L, Seq.empty))))
      .getMessage.contains("partition-spec change"))
  }

  /** Interplay: row-level DML on a MIXED-SPEC table. Copy-on-write
    * UPDATE matching rows in both eras rewrites only the matched files
    * (runtime group filtering composes with per-file-spec pruning);
    * reborn files carry the CURRENT spec's partition values. A
    * merge-on-read DELETE on an old-spec file commits a DV without
    * touching the spec machinery. */
  test("DML across a spec boundary: CoW rewrite adopts the current spec; MoR DVs apply per era") {
    val root = graft.util.TempDirs.create("graft_spec_dml_").toString
    val ss = lakeSession("spd", root)
    import ss.implicits._
    ss.sql("CREATE TABLE spd.ns.t (k BIGINT, region STRING, cat STRING) " +
      "PARTITIONED BY (region)")
    Seq((1L, "r1", "c1"), (2L, "r2", "c2")).toDF("k", "region", "cat")
      .coalesce(1).writeTo("spd.ns.t").append() // v1: 2 files under (region)
    ss.sql("CALL spd.system.add_partition_field(table => 'ns.t', column => 'cat')")
    ss.sql("CALL spd.system.drop_partition_field(table => 'ns.t', column => 'region')")
    Seq((3L, "r1", "c1"), (4L, "r2", "c2")).toDF("k", "region", "cat")
      .coalesce(1).writeTo("spd.ns.t").append() // v4: 2 files under (cat)
    val h = GraftLakeStore.get(root, "ns.t").get

    // CoW UPDATE matching one row in EACH era
    ss.sql("UPDATE spd.ns.t SET cat = 'cx' WHERE k IN (1, 3)")
    val snap = h.snapshot(h.latestVersion)
    assert(snap.op === "replace")
    // untouched files (k=2 era A, k=4 era B) carried by reference
    val v4 = h.snapshot(4).files.map(f => f.path -> f).toMap
    val carried = snap.files.filter(f => v4.contains(f.path))
    assert(carried.size === 2, "only the two matched files are rewritten")
    assert(carried.exists(_.partition.keySet == Set("region")) &&
      carried.exists(_.partition.keySet == Set("cat")),
      "one untouched file per era, each keeping its own spec")
    // reborn rows live under the CURRENT spec (cat)
    val reborn = snap.files.filterNot(f => v4.contains(f.path))
    assert(reborn.nonEmpty &&
      reborn.forall(_.partition.keySet == Set("cat")))
    assert(ss.sql("SELECT count(*) FROM spd.ns.t WHERE cat = 'cx'")
      .head().getLong(0) === 2L)
    assert(ss.sql("SELECT count(*) FROM spd.ns.t").head().getLong(0) === 4L)

    // merge-on-read on a mixed-spec table: DV on an OLD-spec file
    ss.sql("CREATE TABLE spd.ns.m (k BIGINT, region STRING) " +
      "PARTITIONED BY (region) " +
      "TBLPROPERTIES ('write.dml.mode'='merge-on-read')")
    Seq((1L, "r1"), (2L, "r2")).toDF("k", "region")
      .coalesce(1).writeTo("spd.ns.m").append()
    ss.sql("CALL spd.system.drop_partition_field(table => 'ns.m', column => 'region')")
    Seq((3L, "r3")).toDF("k", "region").coalesce(1).writeTo("spd.ns.m").append()
    ss.sql("DELETE FROM spd.ns.m WHERE k = 1") // position-delete on an era-A file
    val hm = GraftLakeStore.get(root, "ns.m").get
    val ms = hm.snapshot(hm.latestVersion)
    assert(ms.op === "delta" && ms.files.exists(_.dvs.nonEmpty),
      "MoR DELETE commits a DV, no rewrite, spec machinery untouched")
    assert(ss.sql("SELECT k FROM spd.ns.m ORDER BY k").collect()
      .map(_.getLong(0)).toSeq === Seq(2L, 3L))
  }

  test("procedure validation: duplicate/missing/unsupported partition fields rejected") {
    val root = graft.util.TempDirs.create("graft_spec_val_").toString
    val ss = lakeSession("spv", root)
    ss.sql("CREATE TABLE spv.ns.t (k BIGINT, s STRING, d DOUBLE) " +
      "PARTITIONED BY (s)")
    def call(sql: String) = intercept[Exception](ss.sql(sql)).getMessage
    assert(call("CALL spv.system.add_partition_field(table => 'ns.t', column => 's')")
      .contains("already a partition field"))
    assert(call("CALL spv.system.add_partition_field(table => 'ns.t', column => 'nope')")
      .contains("not in schema"))
    assert(call("CALL spv.system.add_partition_field(table => 'ns.t', column => 'd')")
      .contains("does not support the identity transform"))
    assert(call("CALL spv.system.drop_partition_field(table => 'ns.t', column => 'k')")
      .contains("not a partition field"))
  }

  /** Interplay: a multi-table transaction whose staged files were
    * prepared under an OLD partition spec conflicts loudly at publish
    * (the arity check) and the whole transaction aborts atomically —
    * the table that already published its pending half rolls back. */
  test("a multi-table transaction racing a spec change aborts atomically, nothing visible") {
    val root = graft.util.TempDirs.create("graft_spec_txn_").toString
    val ss = lakeSession("spt", root)
    import ss.implicits._
    ss.sql("CREATE TABLE spt.ns.a (k BIGINT)")
    ss.sql("CREATE TABLE spt.ns.b (k BIGINT, g STRING)")
    val ha = GraftLakeStore.get(root, "ns.a").get
    val hb = GraftLakeStore.get(root, "ns.b").get
    val fa = LakeTxn.stage(ha, Seq(1L).toDF("k"))
    val fb = LakeTxn.stage(hb, Seq((2L, "g0")).toDF("k", "g"))
    // the spec change lands BETWEEN staging and commit
    ss.sql("CALL spt.system.add_partition_field(table => 'ns.b', column => 'g')")
    val txn = GraftLakeStore.beginTransaction(root)
      .stageAppend("ns.a", fa).stageAppend("ns.b", fb)
    val e = intercept[IllegalArgumentException](txn.commit())
    assert(e.getMessage.contains("partition"))
    // atomic abort: both tables read their pre-transaction state, and
    // ns.a's already-published pending manifest is rolled back
    assert(ha.latestVersion === 0 && hb.latestVersion === 1)
    assert(ss.sql("SELECT count(*) FROM spt.ns.a").head().getLong(0) === 0L)
    assert(ss.sql("SELECT count(*) FROM spt.ns.b").head().getLong(0) === 0L)
    // and a correctly re-staged transaction (new spec arity) commits
    val fb2 = Seq(GraftLakeStore.PendingFile(fb.head.name, fb.head.rows,
      Seq(Some("g0")), fb.head.stats, fb.head.bytes))
    GraftLakeStore.beginTransaction(root)
      .stageAppend("ns.a", fa).stageAppend("ns.b", fb2).commit()
    assert(ss.sql("SELECT count(*) FROM spt.ns.a").head().getLong(0) === 1L)
    assert(ss.sql("SELECT k FROM spt.ns.b WHERE g = 'g0'").head().getLong(0) === 2L)
  }

  test("cherry-pick: re-applies a pure append onto a diverged branch; non-appends rejected loudly") {
    val root = graft.util.TempDirs.create("graft_cherry_").toString
    val ss = lakeSession("chp", root)
    import ss.implicits._
    ss.sql("CREATE TABLE chp.ns.t (k BIGINT, v STRING)")
    Seq((1L, "seed")).toDF("k", "v").coalesce(1).writeTo("chp.ns.t").append() // v1
    val h = GraftLakeStore.get(root, "ns.t").get
    h.createBranch("dev", 1)
    // the main lineage advances on the log head…
    Seq((2L, "mainline")).toDF("k", "v").coalesce(1).writeTo("chp.ns.t").append() // v2
    // …while dev gets its own commit: DIVERGED
    val devFiles = LakeTxn.stage(h, Seq((3L, "devline")).toDF("k", "v"))
    h.commitAppendOnBranch("dev", devFiles) // v3, dev → 3 (content v1+dev)
    assert(ss.sql("SELECT count(*) FROM chp.ns.t VERSION AS OF 'dev'")
      .head().getLong(0) === 2L, "dev must not see the mainline append")

    // a diverged fast_forward names the repair move in its error
    h.createBranch("m2", 2)
    assert(intercept[IllegalArgumentException](h.fastForward("dev", "m2"))
      .getMessage.contains("cherry_pick"))

    // the repair: re-apply v2's append onto dev
    val out = ss.sql("CALL chp.system.cherry_pick(" +
      "table => 'ns.t', branch => 'dev', version => 2)").head()
    assert(out.getInt(0) === 2 && out.getInt(1) === 4)
    assert(h.branchHead("dev") === Some(4))
    assert(ss.sql("SELECT v FROM chp.ns.t VERSION AS OF 'dev' ORDER BY k")
      .collect().map(_.getString(0)).toSeq === Seq("seed", "mainline", "devline"))
    // files are shared by REFERENCE with fresh ids
    val v2added = h.snapshot(2).files.map(_.path).toSet --
      h.snapshot(1).files.map(_.path).toSet
    val picked = h.snapshot(4).files.filterNot(f =>
      h.snapshot(3).files.map(_.id).toSet.contains(f.id))
    assert(picked.map(_.path).toSet === v2added)
    assert(picked.forall(_.id > h.snapshot(3).maxFileId))

    // a non-append snapshot cannot be cherry-picked — loud, with the why
    ss.sql("DELETE FROM chp.ns.t WHERE k = 1") // v5 (CoW replace on log head)
    val v5 = h.latestVersion
    assert(h.snapshot(v5).op === "replace")
    assert(intercept[IllegalArgumentException](h.cherryPick("dev", v5))
      .getMessage.contains("pure-append"))
  }
}
