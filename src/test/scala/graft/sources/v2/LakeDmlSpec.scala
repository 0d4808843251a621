package graft.sources.v2

import graft.SparkSpec
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** Row-level operations over the file-backed lake: runtime group
  * filtering bounds the copy-on-write footprint, ALTER TABLE ADD COLUMN
  * evolves schema without touching data, and identity partitioning
  * prunes files at planning. */
class LakeDmlSpec extends SparkSpec {

  private def lakeSession(cat: String, root: String): SparkSession = {
    val ss = spark.newSession()
    ss.conf.set(s"spark.sql.catalog.$cat", classOf[GraftLakeCatalog].getName)
    ss.conf.set(s"spark.sql.catalog.$cat.root", root)
    ss
  }

  test("runtime group filtering: a single-key UPDATE on a multi-file table rewrites exactly one file") {
    val root = graft.util.TempDirs.create("graft_lake_rgf_").toString
    val ss = lakeSession("rgf", root)
    import ss.implicits._
    ss.sql("CREATE TABLE rgf.ns.t (k BIGINT, v BIGINT)")
    // three write tasks -> three files with disjoint key ranges
    (0L until 300L).map(k => (k, k * 10)).toDF("k", "v")
      .repartitionByRange(3, $"k").writeTo("rgf.ns.t").append()
    val handle = GraftLakeStore.get(root, "ns.t").get
    val base = handle.snapshot(1)
    assert(base.files.size === 3)

    ss.sql("UPDATE rgf.ns.t SET v = -1 WHERE k = 137")

    val next = handle.snapshot(2)
    val baseIds = base.files.map(_.id).toSet
    val carried = next.files.map(_.id).toSet.intersect(baseIds)
    // exactly ONE of the three base files was replaced; the other two
    // carried over by manifest reference (no rewrite)
    assert(carried.size === 2,
      s"base=$baseIds next=${next.files.map(_.id).toSet} — runtime group " +
        "filtering did not bound the rewrite to the matched file")
    // the rewrite's output holds exactly the replaced file's row count
    val replacedRows = base.files.filterNot(f => carried.contains(f.id)).map(_.rows).sum
    val newRows = next.files.filterNot(f => baseIds.contains(f.id)).map(_.rows).sum
    assert(newRows === replacedRows)
    // and the answer is right
    assert(ss.sql("SELECT v FROM rgf.ns.t WHERE k = 137").collect().toSeq
      === Seq(Row(-1L)))
    assert(ss.sql("SELECT count(*) FROM rgf.ns.t").head().getLong(0) === 300L)
    assert(ss.sql("SELECT sum(v) FROM rgf.ns.t WHERE k <> 137").head().getLong(0)
      === (0L until 300L).filter(_ != 137L).map(_ * 10).sum)
  }

  test("runtime group filtering: a MERGE touching one file's keys carries the rest over") {
    val root = graft.util.TempDirs.create("graft_lake_rgfm_").toString
    val ss = lakeSession("rgm", root)
    import ss.implicits._
    ss.sql("CREATE TABLE rgm.ns.t (k BIGINT, v BIGINT)")
    (0L until 300L).map(k => (k, k)).toDF("k", "v")
      .repartitionByRange(3, $"k").writeTo("rgm.ns.t").append()
    Seq((5L, 500L), (7L, 700L)).toDF("k", "nv").createOrReplaceTempView("rgm_chg")
    ss.sql(
      """MERGE INTO rgm.ns.t t USING rgm_chg c ON t.k = c.k
        |WHEN MATCHED THEN UPDATE SET v = c.nv""".stripMargin)
    val handle = GraftLakeStore.get(root, "ns.t").get
    val base = handle.snapshot(1)
    val next = handle.snapshot(2)
    val carried = next.files.map(_.id).toSet.intersect(base.files.map(_.id).toSet)
    assert(carried.size === 2, "both keys live in the first range file; " +
      "only that file should be replaced")
    assert(ss.sql("SELECT sum(v) FROM rgm.ns.t").head().getLong(0)
      === (0L until 300L).sum - 5 - 7 + 500 + 700)
  }

  test("ALTER TABLE ADD COLUMN: old snapshots keep their schema, old files read NULL") {
    val root = graft.util.TempDirs.create("graft_lake_evo_").toString
    val ss = lakeSession("evo", root)
    ss.sql("CREATE TABLE evo.ns.t (k BIGINT, v STRING)")
    ss.sql("INSERT INTO evo.ns.t VALUES (1, 'a'), (2, 'b')")
    ss.sql("ALTER TABLE evo.ns.t ADD COLUMN note STRING")
    ss.sql("INSERT INTO evo.ns.t VALUES (3, 'c', 'fresh')")

    // current read spans the evolution boundary: old rows read NULL
    assert(ss.sql("SELECT k, v, note FROM evo.ns.t ORDER BY k").collect().toSeq
      === Seq(Row(1L, "a", null), Row(2L, "b", null), Row(3L, "c", "fresh")))
    // pre-evolution snapshot keeps the OLD schema
    val v1 = ss.sql("SELECT * FROM evo.ns.t VERSION AS OF 1")
    assert(v1.columns.toSeq === Seq("k", "v"))
    assert(v1.orderBy("k").collect().toSeq === Seq(Row(1L, "a"), Row(2L, "b")))
    // the new column is usable in predicates/aggregates
    assert(ss.sql("SELECT count(*) FROM evo.ns.t WHERE note IS NULL")
      .head().getLong(0) === 2L)
    // non-nullable / nested / other changes fail loudly (RENAME/DROP
    // are supported since the column-mapping wave — see
    // LakeColumnMappingSpec; a type change is not)
    val e = intercept[Throwable](
      ss.sql("ALTER TABLE evo.ns.t ALTER COLUMN v TYPE BIGINT"))
    def msgs(t: Throwable): List[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) :: msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("ADD/RENAME/DROP") ||
      m.contains("NOT_SUPPORTED_CHANGE_COLUMN")), msgs(e))
  }

  test("identity partitioning: a partition predicate prunes files at planning") {
    val root = graft.util.TempDirs.create("graft_lake_part_").toString
    val ss = lakeSession("prt", root)
    import ss.implicits._
    ss.sql("CREATE TABLE prt.ns.t (k BIGINT, m STRING) PARTITIONED BY (m)")
    (0L until 120L).map(k => (k, f"1995-${k % 12 + 1}%02d")).toDF("k", "m")
      .coalesce(1).writeTo("prt.ns.t").append()
    val handle = GraftLakeStore.get(root, "ns.t").get
    // one write task, one file per partition value it saw
    assert(handle.snapshot(1).files.size === 12)
    assert(handle.snapshot(1).files.forall(f => f.partition.keySet === Set("m")))

    val pruned = ss.sql("SELECT k FROM prt.ns.t WHERE m = '1995-03'")
    // the scan plans exactly ONE input split (file) under the predicate
    assert(pruned.rdd.getNumPartitions === 1)
    assert(pruned.count() === 10L)
    val range = ss.sql(
      "SELECT count(*) FROM prt.ns.t WHERE m >= '1995-10' AND m <= '1995-12'")
    assert(range.head().getLong(0) === 30L)
    val rangeScan = ss.sql("SELECT k FROM prt.ns.t WHERE m >= '1995-10' AND m <= '1995-12'")
    assert(rangeScan.rdd.getNumPartitions === 3)
    // pruning is visible in the plan (pushed filters on the scan)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan"), plan)
    // and partition-pruned answers equal unpruned recomputation
    assert(ss.sql("SELECT sum(k) FROM prt.ns.t WHERE m = '1995-03'").head().getLong(0)
      === (0L until 120L).filter(_ % 12 == 2).sum)
  }

  test("min/max data skipping: a key-range predicate plans only intersecting files") {
    val root = graft.util.TempDirs.create("graft_lake_skip_").toString
    val ss = lakeSession("skp", root)
    import ss.implicits._
    ss.sql("CREATE TABLE skp.ns.t (k BIGINT, v STRING)")
    (0L until 800L).map(k => (k, s"v$k")).toDF("k", "v")
      .repartitionByRange(8, $"k").writeTo("skp.ns.t").append()
    val handle = GraftLakeStore.get(root, "ns.t").get
    val files = handle.snapshot(1).files
    assert(files.size === 8)
    // every file carries tight long bounds and exact null counts
    files.foreach { f =>
      val st = f.stats("k")
      assert(st.min.isDefined && st.max.isDefined && st.nulls === 0L, f)
      assert(st.min.get.toLong <= st.max.get.toLong)
    }
    // a range inside one ~100-key stripe plans 1-2 files, not 8
    val pruned = ss.sql("SELECT k FROM skp.ns.t WHERE k BETWEEN 120 AND 140")
    assert(pruned.rdd.getNumPartitions <= 2,
      s"expected <=2 of 8 files under the range, got ${pruned.rdd.getNumPartitions}")
    assert(pruned.count() === 21L)
    // point lookup: exactly one file
    val point = ss.sql("SELECT v FROM skp.ns.t WHERE k = 555")
    assert(point.rdd.getNumPartitions === 1)
    assert(point.collect().map(_.getString(0)).toSeq === Seq("v555"))
    // skipping composes with DML: a ranged DELETE rewrites only the
    // intersecting file(s) even before runtime filtering
    ss.sql("DELETE FROM skp.ns.t WHERE k BETWEEN 120 AND 140")
    val next = handle.snapshot(2)
    val carried = next.files.map(_.id).toSet.intersect(files.map(_.id).toSet)
    assert(carried.size >= 6, s"ranged DELETE should carry >=6 of 8 files, " +
      s"carried ${carried.size}")
    assert(ss.sql("SELECT count(*) FROM skp.ns.t").head().getLong(0) === 779L)
  }

  test("stats honesty: all-NULL prunes equality, IsNull/IsNotNull prune by null counts") {
    val root = graft.util.TempDirs.create("graft_lake_nulls_").toString
    val ss = lakeSession("nul", root)
    import ss.implicits._
    ss.sql("CREATE TABLE nul.ns.t (k BIGINT, v BIGINT)")
    // file A: v all NULL; file B: v never NULL — written as two appends
    (1L to 5L).map(k => (k, None: Option[Long])).toDF("k", "v")
      .coalesce(1).writeTo("nul.ns.t").append()
    (6L to 9L).map(k => (k, Some(k * 10))).toDF("k", "v")
      .coalesce(1).writeTo("nul.ns.t").append()
    val eq = ss.sql("SELECT k FROM nul.ns.t WHERE v = 70")
    assert(eq.rdd.getNumPartitions === 1) // all-NULL file proves no match
    assert(eq.collect().map(_.getLong(0)).toSeq === Seq(7L))
    val isNull = ss.sql("SELECT k FROM nul.ns.t WHERE v IS NULL")
    assert(isNull.rdd.getNumPartitions === 1) // zero-nulls file pruned
    assert(isNull.count() === 5L)
    val isNotNull = ss.sql("SELECT k FROM nul.ns.t WHERE v IS NOT NULL")
    assert(isNotNull.rdd.getNumPartitions === 1) // all-null file pruned
    assert(isNotNull.count() === 4L)
  }

  test("z-ordered compaction makes stats selective in BOTH dimensions") {
    val root = graft.util.TempDirs.create("graft_lake_z_").toString
    val ss = lakeSession("zor", root)
    import ss.implicits._
    ss.sql("CREATE TABLE zor.ns.t (a BIGINT, b BIGINT)")
    // 32x32 grid, randomly placed across 8 files: every file spans the
    // whole key space, so a box predicate prunes nothing
    val grid = for (a <- 0L until 32L; b <- 0L until 32L) yield (a, b)
    grid.toDF("a", "b").repartition(8).writeTo("zor.ns.t").append()
    val box = "a BETWEEN 4 AND 7 AND b BETWEEN 20 AND 23"
    val before = ss.sql(s"SELECT a FROM zor.ns.t WHERE $box").rdd.getNumPartitions
    assert(before === 8, "random placement must defeat stats pruning")
    // OPTIMIZE ZORDER as one overwrite snapshot
    val z = graft.sources.ZOrderQueries.zvalue(col("a"), col("b"), bits = 6)
    ss.table("zor.ns.t").withColumn("__z", z)
      .repartitionByRange(8, col("__z")).sortWithinPartitions("__z")
      .drop("__z").writeTo("zor.ns.t").overwrite(lit(true))
    val after = ss.sql(s"SELECT a FROM zor.ns.t WHERE $box")
    assert(after.rdd.getNumPartitions <= 3,
      s"z-ordered files should bound the 4x4 box to <=3 of 8 files, " +
        s"got ${after.rdd.getNumPartitions}")
    assert(after.count() === 16L)
    // layout changed, answer did not; history records the rewrite
    assert(ss.sql("SELECT count(*) FROM zor.ns.t").head().getLong(0) === 1024L)
    val handle = GraftLakeStore.get(root, "ns.t").get
    assert(handle.snapshot(2).op === "overwrite")
  }

  test("q222's history matches per-version recomputes through the manifests") {
    val root = graft.util.TempDirs.create("graft_lake_hist_").toString
    val ss = lakeSession("hst", root)
    ss.sql("CREATE TABLE hst.ns.t (k BIGINT)")
    ss.sql("INSERT INTO hst.ns.t VALUES (1), (2), (3)")
    ss.sql("DELETE FROM hst.ns.t WHERE k = 2")
    ss.sql("INSERT OVERWRITE hst.ns.t VALUES (9)")
    ss.sql("ALTER TABLE hst.ns.t ADD COLUMN note STRING")
    val handle = GraftLakeStore.get(root, "ns.t").get
    val hist = (0 to handle.latestVersion).map { v =>
      val sn = handle.snapshot(v)
      (v, sn.op, sn.files.map(_.rows).sum)
    }
    assert(hist === Seq(
      (0, "create", 0L), (1, "append", 3L), (2, "replace", 2L),
      (3, "overwrite", 1L), (4, "schema", 1L)))
  }

  test("partitioned DML: UPDATE of one partition leaves other partitions' files untouched") {
    val root = graft.util.TempDirs.create("graft_lake_partdml_").toString
    val ss = lakeSession("pdm", root)
    import ss.implicits._
    ss.sql("CREATE TABLE pdm.ns.t (k BIGINT, m STRING) PARTITIONED BY (m)")
    (0L until 40L).map(k => (k, s"g${k % 4}")).toDF("k", "m")
      .coalesce(1).writeTo("pdm.ns.t").append()
    val handle = GraftLakeStore.get(root, "ns.t").get
    assert(handle.snapshot(1).files.size === 4)
    ss.sql("UPDATE pdm.ns.t SET k = k + 1000 WHERE m = 'g2'")
    val base = handle.snapshot(1).files.map(_.id).toSet
    val next = handle.snapshot(2)
    assert(next.files.map(_.id).toSet.intersect(base).size === 3,
      "only g2's file should be rewritten")
    assert(ss.sql("SELECT count(*) FROM pdm.ns.t WHERE k >= 1000").head().getLong(0) === 10L)
  }
}
