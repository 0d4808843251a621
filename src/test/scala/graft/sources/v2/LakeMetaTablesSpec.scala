package graft.sources.v2

import graft.SparkSpec
import org.apache.spark.sql.{Row, SparkSession}

/** `t$files` / `t$history` / `t$tags` — manifests as SQL tables (the
  * Iceberg metadata-table convention). The accounting they render is
  * write-task metadata; the specs cross-check it against the data. */
class LakeMetaTablesSpec extends SparkSpec {

  private def lakeSession(cat: String, root: String): SparkSession = {
    val ss = spark.newSession()
    ss.conf.set(s"spark.sql.catalog.$cat", classOf[GraftLakeCatalog].getName)
    ss.conf.set(s"spark.sql.catalog.$cat.root", root)
    ss
  }

  test("$files renders the current snapshot's layout, delete vectors included") {
    val root = graft.util.TempDirs.create("graft_mt_files_").toString
    val ss = lakeSession("mtf", root)
    import ss.implicits._
    ss.sql("CREATE TABLE mtf.ns.t (k BIGINT, g STRING) PARTITIONED BY (g) " +
      "TBLPROPERTIES ('write.dml.mode'='merge-on-read')")
    (0L until 40L).map(k => (k, s"g${k % 2}")).toDF("k", "g")
      .coalesce(1).writeTo("mtf.ns.t").append()
    ss.sql("DELETE FROM mtf.ns.t WHERE g = 'g1' AND k < 10")
    val files = ss.sql(
      "SELECT partition, rows, live_rows, dels, dv_count FROM mtf.ns.`t$files` ORDER BY partition")
      .collect().toSeq
    assert(files === Seq(
      Row("g=g0", 20L, 20L, 0L, 0),
      Row("g=g1", 20L, 15L, 5L, 1)))
    // bytes recorded and the totals cross-check against the data
    assert(ss.sql("SELECT min(bytes) FROM mtf.ns.`t$files`").head().getLong(0) > 0L)
    assert(ss.sql("SELECT sum(live_rows) FROM mtf.ns.`t$files`").head().getLong(0)
      === ss.sql("SELECT count(*) FROM mtf.ns.t").head().getLong(0))
  }

  test("$history and $tags render the commit log and refs") {
    val root = graft.util.TempDirs.create("graft_mt_hist_").toString
    val ss = lakeSession("mth", root)
    ss.sql("CREATE TABLE mth.ns.t (k BIGINT)")
    ss.sql("INSERT INTO mth.ns.t VALUES (1), (2), (3)")
    ss.sql("DELETE FROM mth.ns.t WHERE k = 2")
    GraftLakeStore.get(root, "ns.t").get.createTag("rel", 1)
    val hist = ss.sql(
      "SELECT version, operation, n_rows FROM mth.ns.`t$history` ORDER BY version")
      .collect().toSeq
    assert(hist === Seq(Row(0, "create", 0L), Row(1, "append", 3L),
      Row(2, "replace", 2L)))
    assert(ss.sql("SELECT tag, version FROM mth.ns.`t$tags`").collect().toSeq
      === Seq(Row("rel", 1)))
    // metadata tables are read-only and join like any table
    val joined = ss.sql(
      """SELECT h.version, t.tag FROM mth.ns.`t$history` h
        |LEFT JOIN mth.ns.`t$tags` t ON h.version = t.version
        |ORDER BY h.version""".stripMargin).collect().toSeq
    assert(joined === Seq(Row(0, null), Row(1, "rel"), Row(2, null)))
    val e = intercept[Exception](
      ss.sql("SELECT * FROM mth.ns.`t$nope`").collect())
    assert(e.getMessage.toLowerCase.contains("table") ||
      e.getMessage.contains("t$nope"), e.getMessage)
  }

  /** `t$partitions`: per-partition rollup from manifests, and the SQL
    * window into a mixed partition spec after evolution. */
  test("$partitions rolls up per partition value; mixed specs render per era") {
    val root = graft.util.TempDirs.create("graft_mt_parts_").toString
    val ss = lakeSession("mtp", root)
    import ss.implicits._
    ss.sql("CREATE TABLE mtp.ns.t (k BIGINT, g STRING, c STRING) " +
      "PARTITIONED BY (g) TBLPROPERTIES ('write.dml.mode'='merge-on-read')")
    (0L until 30L).map(k => (k, s"g${k % 2}", s"c${k % 3}")).toDF("k", "g", "c")
      .coalesce(1).writeTo("mtp.ns.t").append()
    ss.sql("DELETE FROM mtp.ns.t WHERE g = 'g0' AND k < 6")
    val rows = ss.sql("SELECT partition, n_files, rows, live_rows " +
      "FROM mtp.ns.`t$partitions` ORDER BY partition").collect().toSeq
    assert(rows === Seq(
      Row("g=g0", 1, 15L, 12L),
      Row("g=g1", 1, 15L, 15L)))
    // live_rows cross-checks the data per partition value
    val data = ss.sql("SELECT g, count(*) FROM mtp.ns.t GROUP BY g ORDER BY g")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(data === Seq(("g0", 12L), ("g1", 15L)))

    // after a spec evolution, each era renders its OWN spec's tuple
    ss.sql("CALL mtp.system.add_partition_field(table => 'ns.t', column => 'c')")
    ss.sql("CALL mtp.system.drop_partition_field(table => 'ns.t', column => 'g')")
    Seq((100L, "g0", "c9")).toDF("k", "g", "c").coalesce(1)
      .writeTo("mtp.ns.t").append()
    val mixed = ss.sql("SELECT partition FROM mtp.ns.`t$partitions` ORDER BY partition")
      .collect().map(_.getString(0)).toSeq
    assert(mixed === Seq("c=c9", "g=g0", "g=g1"),
      "old files keep g=..., the new era renders c=...")
    // an unpartitioned table rolls up to ONE null-partition row
    ss.sql("CREATE TABLE mtp.ns.u (k BIGINT)")
    (0L until 7L).map(Tuple1(_)).toDF("k").coalesce(1).writeTo("mtp.ns.u").append()
    val u = ss.sql("SELECT partition, n_files, live_rows FROM mtp.ns.`u$partitions`")
      .collect().toSeq
    assert(u === Seq(Row(null, 1, 7L)))
  }
}
