package graft.sources.v2

import graft.SparkSpec
import org.apache.spark.sql.SparkSession

/** Write-side distribution: partitioned lake writes REQUEST a
  * clustered distribution on the partition fields' source columns
  * (DSv2 RequiresDistributionAndOrdering — Iceberg's hash
  * write-distribution mode), so the planner routes equal values to one
  * task and an ingest writes ONE file per partition value regardless
  * of the input's parallelism. Unpartitioned tables impose nothing. */
class LakeWriteDistributionSpec extends SparkSpec {

  private def lakeSession(cat: String, root: String): SparkSession = {
    val ss = spark.newSession()
    ss.conf.set(s"spark.sql.catalog.$cat", classOf[GraftLakeCatalog].getName)
    ss.conf.set(s"spark.sql.catalog.$cat.root", root)
    ss
  }

  test("a partitioned ingest writes one file per partition value, not per task x value") {
    val root = graft.util.TempDirs.create("graft_dist_").toString
    val ss = lakeSession("dst", root)
    import ss.implicits._
    ss.sql("CREATE TABLE dst.ns.t (k BIGINT, g STRING) PARTITIONED BY (g)")
    // 16 input partitions, every one holding rows of all 3 values —
    // without the requested distribution this would write up to 48 files
    (0L until 160L).map(k => (k, s"g${k % 3}")).toDF("k", "g")
      .repartition(16).writeTo("dst.ns.t").append()
    val h = GraftLakeStore.get(root, "ns.t").get
    val files = h.snapshot(1).files
    assert(files.size === 3,
      s"expected one file per partition value, got ${files.size}")
    assert(files.map(_.partition("g")).toSet ===
      Set(Some("g0"), Some("g1"), Some("g2")))
    assert(ss.sql("SELECT count(*) FROM dst.ns.t").head().getLong(0) === 160L)

    // unpartitioned: the input's parallelism is respected (no shuffle
    // imposed — a 4-partition input writes 4 files)
    ss.sql("CREATE TABLE dst.ns.u (k BIGINT)")
    (0L until 40L).map(Tuple1(_)).toDF("k").repartition(4)
      .writeTo("dst.ns.u").append()
    assert(GraftLakeStore.get(root, "ns.u").get.snapshot(1).files.size === 4)
  }

  /** The opt-in skew escape hatch: with `write.distribution.
    * advisory-bytes` set, the clustered distribution is satisfied by
    * an AQE rebalance — tiny clusters COALESCE into shared tasks (and
    * at real scale a hot value larger than the advisory splits). File
    * counts become size-driven; rows stay exactly right. */
  test("advisory-bytes opt-in: rebalance replaces strict clustering, correctness unchanged") {
    val root = graft.util.TempDirs.create("graft_dist_adv_").toString
    val ss = lakeSession("dsa", root)
    import ss.implicits._
    ss.sql("CREATE TABLE dsa.ns.t (k BIGINT, g STRING) PARTITIONED BY (g) " +
      "TBLPROPERTIES ('write.distribution.advisory-bytes'='134217728')")
    (0L until 160L).map(k => (k, s"g${k % 3}")).toDF("k", "g")
      .repartition(16).writeTo("dsa.ns.t").append()
    val h = GraftLakeStore.get(root, "ns.t").get
    // tiny clusters coalesce: AT MOST one task's worth of files per
    // value, and typically all three values in ONE rebalanced task
    assert(h.snapshot(1).files.size <= 3)
    assert(ss.sql("SELECT g, count(*) FROM dsa.ns.t GROUP BY g ORDER BY g")
      .collect().map(_.getLong(1)).toSeq === Seq(54L, 53L, 53L))
    // the property round-trips through the catalog
    assert(ss.sql("SHOW TBLPROPERTIES dsa.ns.t").collect().exists(r =>
      r.getString(0) == "write.distribution.advisory-bytes" &&
        r.getString(1) == "134217728"))
  }

  /** Interplay: the streaming APPEND sink on a PARTITIONED table. Each
    * epoch commits one snapshot with per-value files; the distribution
    * requirement must not break the micro-batch path (whether or not
    * the engine honors it per epoch, correctness and partition values
    * hold). */
  test("streaming sink into a partitioned table: epochs commit, partition values exact") {
    val root = graft.util.TempDirs.create("graft_dist_stream_").toString
    val ss = lakeSession("dss", root)
    import ss.implicits._
    ss.sql("CREATE TABLE dss.ns.t (k BIGINT, g STRING) PARTITIONED BY (g)")
    val srcDir = graft.util.TempDirs.create("graft_dist_stream_src_")
    (0 until 2).foreach { b =>
      (0L until 20L).map(k => (b * 100L + k, s"g${k % 2}")).toDF("k", "g")
        .coalesce(1).write.parquet(s"$srcDir/b$b")
      val l = java.nio.file.Files.list(java.nio.file.Paths.get(s"$srcDir/b$b"))
      val f = try l.filter(_.toString.endsWith(".parquet")).findFirst().get()
        finally l.close()
      java.nio.file.Files.move(f, srcDir.resolve(s"batch_$b.parquet"))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("g",
        org.apache.spark.sql.types.StringType)))
    val chk = graft.util.TempDirs.create("graft_dist_stream_chk_").toString
    val q = ss.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.toString)
      .writeStream
      .option("checkpointLocation", chk)
      .toTable("dss.ns.t")
    // AvailableNow is not settable via toTable's default; stop on idle
    val q2 = q
    try {
      q2.processAllAvailable()
    } finally q2.stop()
    val h = GraftLakeStore.get(root, "ns.t").get
    assert(h.latestVersion === 2, "one snapshot per epoch")
    assert(ss.sql("SELECT count(*) FROM dss.ns.t").head().getLong(0) === 40L)
    assert(h.snapshot(2).files.forall(_.partition.keySet == Set("g")))
    assert(ss.sql("SELECT g, count(*) FROM dss.ns.t GROUP BY g ORDER BY g")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("g0", 20L), ("g1", 20L)))
  }

  test("transform-partitioned ingest consolidates by value co-location") {
    val root = graft.util.TempDirs.create("graft_dist_tf_").toString
    val ss = lakeSession("dtf", root)
    import ss.implicits._
    ss.sql("CREATE TABLE dtf.ns.t (k BIGINT, od STRING) " +
      "PARTITIONED BY (truncate(7, od))")
    // 8 input partitions, 2 months: the clustered distribution on the
    // SOURCE column routes equal dates together; with few distinct
    // dates per month the per-month file count collapses to the tasks
    // that actually receive that month's values
    val rows = for (k <- 0L until 80L)
      yield (k, if (k % 2 == 0) "1995-01-15" else "1995-02-20")
    rows.toDF("k", "od").repartition(8).writeTo("dtf.ns.t").append()
    val h = GraftLakeStore.get(root, "ns.t").get
    val files = h.snapshot(1).files
    // one distinct date per month -> exactly one file per month
    assert(files.size === 2, s"got ${files.size} files")
    assert(files.map(_.partition("od_truncate_7")).toSet ===
      Set(Some("1995-01"), Some("1995-02")))
  }
}
