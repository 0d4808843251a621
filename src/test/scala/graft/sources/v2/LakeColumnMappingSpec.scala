package graft.sources.v2

import graft.SparkSpec
import org.apache.spark.sql.{Row, SparkSession}

/** RENAME COLUMN / DROP COLUMN as metadata-only commits over the
  * column-mapping indirection (logical name → birth-assigned PHYSICAL
  * storage name — Delta's column-mapping / Iceberg's field-id device).
  * The contracts:
  *
  *  - a rename rewrites no file: data written before and after shares
  *    one physical column; `VERSION AS OF` reads under the old name;
  *  - a dropped column's data stays in the files (old versions read
  *    it) but a RE-ADDED column of the same name gets a fresh physical
  *    name, so the stale data can never resurrect as the new column;
  *  - everything composes: stats pruning, merge-on-read DML, and the
  *    change feed all resolve through the mapping;
  *  - partition columns can be neither renamed nor dropped.
  */
class LakeColumnMappingSpec extends SparkSpec {

  private def lakeSession(cat: String, root: String): SparkSession = {
    val ss = spark.newSession()
    ss.conf.set(s"spark.sql.catalog.$cat", classOf[GraftLakeCatalog].getName)
    ss.conf.set(s"spark.sql.catalog.$cat.root", root)
    ss
  }

  test("RENAME COLUMN: no file rewritten, both write eras share one physical column, time travel keeps the old name") {
    val root = graft.util.TempDirs.create("graft_cm_ren_").toString
    val ss = lakeSession("ren", root)
    ss.sql("CREATE TABLE ren.ns.t (k BIGINT, v STRING)")
    ss.sql("INSERT INTO ren.ns.t VALUES (1, 'a'), (2, 'b')")   // v1
    ss.sql("ALTER TABLE ren.ns.t RENAME COLUMN v TO label")    // v2 (metadata)
    ss.sql("INSERT INTO ren.ns.t VALUES (3, 'c')")             // v3
    val handle = GraftLakeStore.get(root, "ns.t").get
    // metadata-only: v2 carries v1's file untouched
    assert(handle.snapshot(2).files === handle.snapshot(1).files)
    // the mapping: label → physical 'v'; post-rename files store 'v'
    assert(handle.snapshot(2).phys("label") === "v")
    assert(handle.snapshot(3).files.forall(_.columns.contains("v")))
    // both eras read under the NEW name
    assert(ss.sql("SELECT k, label FROM ren.ns.t ORDER BY k").collect().toSeq
      === Seq(Row(1L, "a"), Row(2L, "b"), Row(3L, "c")))
    // predicates resolve through the mapping on pre-rename data
    assert(ss.sql("SELECT k FROM ren.ns.t WHERE label = 'b'").head().getLong(0) === 2L)
    // time travel: the pre-rename snapshot keeps the OLD schema
    val v1 = ss.sql("SELECT * FROM ren.ns.t VERSION AS OF 1")
    assert(v1.columns.toSeq === Seq("k", "v"))
    assert(v1.orderBy("k").collect().toSeq === Seq(Row(1L, "a"), Row(2L, "b")))
  }

  test("DROP then re-ADD: stale data cannot resurrect; old versions still read it") {
    val root = graft.util.TempDirs.create("graft_cm_drop_").toString
    val ss = lakeSession("drp", root)
    ss.sql("CREATE TABLE drp.ns.t (k BIGINT, v BIGINT)")
    ss.sql("INSERT INTO drp.ns.t VALUES (1, 10), (2, 20)")     // v1
    ss.sql("ALTER TABLE drp.ns.t DROP COLUMN v")               // v2
    assert(ss.sql("SELECT * FROM drp.ns.t").columns.toSeq === Seq("k"))
    ss.sql("ALTER TABLE drp.ns.t ADD COLUMN v BIGINT")         // v3: fresh physical
    ss.sql("INSERT INTO drp.ns.t VALUES (3, 300)")             // v4
    // the RE-ADDED v reads NULL on old rows — NOT the dropped 10/20
    assert(ss.sql("SELECT k, v FROM drp.ns.t ORDER BY k").collect().toSeq
      === Seq(Row(1L, null), Row(2L, null), Row(3L, 300L)))
    // while the pre-drop snapshot still reads the original values
    assert(ss.sql("SELECT k, v FROM drp.ns.t VERSION AS OF 1 ORDER BY k")
      .collect().toSeq === Seq(Row(1L, 10L), Row(2L, 20L)))
    // mechanics: the re-added column maps to a fresh physical name
    val handle = GraftLakeStore.get(root, "ns.t").get
    val phys = handle.snapshot(3).phys("v")
    assert(phys !== "v", s"re-added column must not alias the dropped one, got $phys")
    assert(handle.snapshot(4).files.exists(_.columns.contains(phys)))
  }

  test("rename composes with stats pruning and merge-on-read DML") {
    val root = graft.util.TempDirs.create("graft_cm_mor_").toString
    val ss = lakeSession("cmm", root)
    import ss.implicits._
    ss.sql("CREATE TABLE cmm.ns.t (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('write.dml.mode'='merge-on-read')")
    (0L until 400L).map(x => (x, x)).toDF("k", "v")
      .repartitionByRange(4, $"k").writeTo("cmm.ns.t").append()
    ss.sql("ALTER TABLE cmm.ns.t RENAME COLUMN k TO id")
    // stats pruning resolves the RENAMED column onto the stored
    // physical stats: a tight range plans 1 of 4 files
    val pruned = ss.sql("SELECT v FROM cmm.ns.t WHERE id BETWEEN 120 AND 140")
    assert(pruned.rdd.getNumPartitions === 1,
      s"expected 1 of 4 files, got ${pruned.rdd.getNumPartitions}")
    assert(pruned.count() === 21L)
    // merge-on-read DML under the new name: delete vector, no rewrite
    ss.sql("DELETE FROM cmm.ns.t WHERE id = 137")
    val handle = GraftLakeStore.get(root, "ns.t").get
    val sn = handle.snapshot(handle.latestVersion)
    assert(sn.op === "delta" && sn.files.map(_.dvs.map(_.dels).sum).sum === 1L)
    assert(ss.sql("SELECT count(*) FROM cmm.ns.t").head().getLong(0) === 399L)
    // post-rename inserts land under the ORIGINAL physical name
    ss.sql("INSERT INTO cmm.ns.t VALUES (1000, 1)")
    val latest = handle.snapshot(handle.latestVersion)
    assert(latest.files.forall(_.columns.contains("k")))
    assert(ss.sql("SELECT count(*) FROM cmm.ns.t WHERE id >= 1000").head().getLong(0) === 1L)
  }

  test("the change feed resolves renamed columns across both write eras") {
    val root = graft.util.TempDirs.create("graft_cm_feed_").toString
    val ss = lakeSession("cmf", root)
    ss.sql("CREATE TABLE cmf.ns.t (k BIGINT, v STRING)")
    ss.sql("INSERT INTO cmf.ns.t VALUES (1, 'a')")
    ss.sql("ALTER TABLE cmf.ns.t RENAME COLUMN v TO label")
    ss.sql("INSERT INTO cmf.ns.t VALUES (2, 'b')")
    val acc = graft.util.TempDirs.create("graft_cm_feed_acc_").toString
    val q = ss.readStream.format(classOf[LakeFeedProvider].getName)
      .option("root", root).option("table", "ns.t").load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        df.write.mode("overwrite").parquet(s"$acc/b$batchId")
      }
      .option("checkpointLocation", s"$acc/_chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.read.parquet(s"$acc/b*")
      .select("k", "label", LakeFeed.ChangeTypeCol).orderBy("k").collect().toSeq
    assert(rows === Seq(Row(1L, "a", "insert"), Row(2L, "b", "insert")))
  }

  test("guard rails: partition columns immovable, last column undropppable, collisions loud") {
    val root = graft.util.TempDirs.create("graft_cm_guard_").toString
    val ss = lakeSession("grd", root)
    ss.sql("CREATE TABLE grd.ns.t (k BIGINT, g STRING) PARTITIONED BY (g)")
    def fails(sql: String, needle: String): Unit = {
      val e = intercept[Throwable](ss.sql(sql))
      def msgs(t: Throwable): List[String] =
        if (t == null) Nil else String.valueOf(t.getMessage) :: msgs(t.getCause)
      assert(msgs(e).exists(_.contains(needle)), s"$sql → ${msgs(e)}")
    }
    fails("ALTER TABLE grd.ns.t RENAME COLUMN g TO h", "partition column")
    fails("ALTER TABLE grd.ns.t DROP COLUMN g", "partition column")
    ss.sql("ALTER TABLE grd.ns.t DROP COLUMN k")
    fails("ALTER TABLE grd.ns.t DROP COLUMN g", "partition column")
    // g is now the last column — add one back, then try dropping to zero
    ss.sql("ALTER TABLE grd.ns.t ADD COLUMN x BIGINT")
    ss.sql("ALTER TABLE grd.ns.t DROP COLUMN x")
    // rename onto an existing name is loud
    ss.sql("ALTER TABLE grd.ns.t ADD COLUMN a BIGINT")
    ss.sql("ALTER TABLE grd.ns.t ADD COLUMN b BIGINT")
    fails("ALTER TABLE grd.ns.t RENAME COLUMN a TO b", "already exists")
  }

  test("a minted physical name cannot collide with a user column carrying the minted shape") {
    val root = graft.util.TempDirs.create("graft_cm_mint_").toString
    val ss = lakeSession("mnt", root)
    // note + a column LITERALLY named like a minted physical name
    ss.sql("CREATE TABLE mnt.ns.t (k BIGINT, note BIGINT, note__v3 BIGINT)")
    ss.sql("INSERT INTO mnt.ns.t VALUES (1, 10, 99)")
    ss.sql("ALTER TABLE mnt.ns.t DROP COLUMN note")   // v2
    ss.sql("ALTER TABLE mnt.ns.t ADD COLUMN note BIGINT") // v3: must NOT mint note__v3
    val handle = GraftLakeStore.get(root, "ns.t").get
    val phys = handle.snapshot(3).phys("note")
    assert(phys != "note" && phys != "note__v3",
      s"minted name must avoid BOTH the dropped column and the literal user column, got $phys")
    // the re-added note reads NULL; note__v3 keeps its own data
    assert(ss.sql("SELECT note, note__v3 FROM mnt.ns.t").collect().toSeq
      === Seq(Row(null, 99L)))
  }
}
