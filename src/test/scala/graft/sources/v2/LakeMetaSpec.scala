package graft.sources.v2

import graft.SparkSpec
import org.apache.spark.sql.{Row, SparkSession}

/** Manifest-powered metadata answers: COUNT(*) pushdown that opens no
  * data file, and scan statistics that let Catalyst broadcast a
  * dimension-sized lake table. The unfakeable pin: data files are
  * DELETED from disk and the counts still answer. */
class LakeMetaSpec extends SparkSpec {

  private def lakeSession(cat: String, root: String): SparkSession = {
    val ss = spark.newSession()
    ss.conf.set(s"spark.sql.catalog.$cat", classOf[GraftLakeCatalog].getName)
    ss.conf.set(s"spark.sql.catalog.$cat.root", root)
    ss
  }

  private def deleteDataFiles(root: String, table: String): Int = {
    val handle = GraftLakeStore.get(root, table).get
    val l = java.nio.file.Files.list(handle.dataDir)
    try {
      val files = l.iterator()
      var n = 0
      while (files.hasNext) { java.nio.file.Files.delete(files.next()); n += 1 }
      n
    } finally l.close()
  }

  test("COUNT(*) answers from manifests alone — data files deleted from disk") {
    val root = graft.util.TempDirs.create("graft_meta_cnt_").toString
    val ss = lakeSession("cnt", root)
    import ss.implicits._
    ss.sql("CREATE TABLE cnt.ns.t (k BIGINT, g STRING) PARTITIONED BY (g)")
    (0L until 120L).map(k => (k, s"g${k % 4}")).toDF("k", "g")
      .coalesce(1).writeTo("cnt.ns.t").append()
    // merge-on-read-style deletes? This is a CoW table: use plain DML
    ss.sql("DELETE FROM cnt.ns.t WHERE g = 'g3' AND k < 20")
    val plan = ss.sql("SELECT count(*) FROM cnt.ns.t").queryExecution
      .executedPlan.toString
    assert(plan.contains("manifest count"), plan)
    // the proof: no data file remains, the counts still answer
    assert(deleteDataFiles(root, "ns.t") > 0)
    assert(ss.sql("SELECT count(*) FROM cnt.ns.t").head().getLong(0) === 115L)
    // grouped by the partition column: also manifest-only
    assert(ss.sql("SELECT g, count(*) FROM cnt.ns.t GROUP BY g ORDER BY g")
      .collect().toSeq === Seq(Row("g0", 30L), Row("g1", 30L), Row("g2", 30L),
        Row("g3", 25L)))
    // with an exact partition predicate: fully pushed, still no read
    assert(ss.sql("SELECT count(*) FROM cnt.ns.t WHERE g = 'g1'")
      .head().getLong(0) === 30L)
  }

  test("a fully delete-vectored partition emits NO group from the manifest count") {
    val root = graft.util.TempDirs.create("graft_meta_zero_").toString
    val ss = lakeSession("zro", root)
    import ss.implicits._
    ss.sql("CREATE TABLE zro.ns.t (k BIGINT, g STRING) PARTITIONED BY (g) " +
      "TBLPROPERTIES ('write.dml.mode'='merge-on-read')")
    (0L until 20L).map(k => (k, s"g${k % 2}")).toDF("k", "g")
      .coalesce(1).writeTo("zro.ns.t").append()
    ss.sql("DELETE FROM zro.ns.t WHERE g = 'g1'") // DV covers every g1 row
    val grouped = ss.sql("SELECT g, count(*) FROM zro.ns.t GROUP BY g ORDER BY g")
    assert(grouped.queryExecution.executedPlan.toString.contains("manifest count"))
    // vanilla semantics: an all-deleted group is ABSENT, not (g1, 0)
    assert(grouped.collect().toSeq === Seq(Row("g0", 10L)))
    // the global count keeps its single row
    assert(ss.sql("SELECT count(*) FROM zro.ns.t").head().getLong(0) === 10L)
  }

  test("a data-table name may not contain the metadata-table discriminator") {
    val root = graft.util.TempDirs.create("graft_meta_dollar_").toString
    val ss = lakeSession("dlr", root)
    val e = intercept[Throwable](ss.sql("CREATE TABLE dlr.ns.`t$x` (k BIGINT)"))
    def msgs(t: Throwable): List[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) :: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("reserved for")), msgs(e))
  }

  test("merge-on-read delete vectors make the manifest count exact") {
    val root = graft.util.TempDirs.create("graft_meta_mor_").toString
    val ss = lakeSession("cmr", root)
    import ss.implicits._
    ss.sql("CREATE TABLE cmr.ns.t (k BIGINT) " +
      "TBLPROPERTIES ('write.dml.mode'='merge-on-read')")
    (0L until 100L).map(Tuple1(_)).toDF("k").coalesce(1).writeTo("cmr.ns.t").append()
    ss.sql("DELETE FROM cmr.ns.t WHERE k % 10 = 3")
    // delete the DATA file (keep the DV): count = live rows from manifest
    val handle = GraftLakeStore.get(root, "ns.t").get
    val dataPath = handle.snapshot(1).files.head.path
    java.nio.file.Files.delete(handle.tableDir.resolve(dataPath))
    assert(ss.sql("SELECT count(*) FROM cmr.ns.t").head().getLong(0) === 90L)
  }

  test("a COUNT with a data-column filter stays a real scan (residual filter guard)") {
    val root = graft.util.TempDirs.create("graft_meta_res_").toString
    val ss = lakeSession("res", root)
    import ss.implicits._
    ss.sql("CREATE TABLE res.ns.t (k BIGINT, g STRING) PARTITIONED BY (g)")
    (0L until 40L).map(k => (k, s"g${k % 2}")).toDF("k", "g")
      .coalesce(1).writeTo("res.ns.t").append()
    // k is a data column: the filter stays residual, so the aggregate
    // must NOT be pushed and the count reads rows
    val df = ss.sql("SELECT count(*) FROM res.ns.t WHERE k < 7")
    assert(!df.queryExecution.executedPlan.toString.contains("manifest count"))
    assert(df.head().getLong(0) === 7L)
  }

  test("reported statistics flip a lake-dimension join to broadcast") {
    val root = graft.util.TempDirs.create("graft_meta_bhj_").toString
    val ss = lakeSession("bhj", root)
    import ss.implicits._
    ss.sql("CREATE TABLE bhj.ns.dim (k BIGINT, name STRING)")
    (0L until 50L).map(k => (k, s"n$k")).toDF("k", "name")
      .coalesce(1).writeTo("bhj.ns.dim").append()
    val fact = (0L until 5000L).map(k => (k % 50, k)).toDF("fk", "v")
    val joined = fact.join(ss.table("bhj.ns.dim"), $"fk" === $"k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"a KB-sized lake dim with reported stats must broadcast:\n$plan")
    assert(joined.count() === 5000L)
    // and the stats are the manifest's, post-pruning: a pinned scan of
    // one partition reports only that partition's rows
    val handle = GraftLakeStore.get(root, "ns.dim").get
    val sn = handle.snapshot(1)
    assert(sn.files.forall(_.bytes > 0L), "write tasks must record file sizes")
  }
}
