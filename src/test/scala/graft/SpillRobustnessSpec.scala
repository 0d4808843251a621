package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spill-path robustness: the gate's heaviest batch queries re-run
  * with the runtime SQL spill thresholds forced to a few dozen rows,
  * so window frames, sort-merge-join stream buffers, and typed
  * (ObjectHashAggregate) aggregations — the KMV/Misra-Gries family —
  * actually take their spillable/sort-based fallback paths, the
  * mechanism that makes "designed for 100 TB" true on a finite
  * executor. A listener confirms bytes really spill under these
  * thresholds (a threshold typo would otherwise turn the suite into a
  * no-op), and each query's rows must be bit-identical to its clean
  * run.
  *
  * The one spill knob this suite does NOT turn is
  * spark.shuffle.spill.numElementsForceSpillThreshold — it is a
  * static core conf, frozen at context creation; the runtime-settable
  * thresholds below cover the operator-owned buffers, which is where
  * correctness-under-spill can actually diverge (sorter spill merge is
  * content-agnostic). */
class SpillRobustnessSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** The heaviest non-streaming queries of the recorded bench tail,
    * plus the typed-aggregation sketch pair the fallback threshold
    * targets (streaming/JDBC lifecycles are gated end-to-end in their
    * own specs). */
  private val heaviest = Seq(
    "q56_minhash_pairs", "q83_neardup_clusters", "q68_clean_corpus",
    "q80_incremental_dedup", "q58_neardup_verified", "q82_decontaminate",
    "q78_simhash_portable", "q84_dup_gram_ratio", "q87_semdedup_corpus",
    "q59_embedding_neardup", "q73_heavy_hitters", "q199_kmv_intersect")

  private val spillConfs = Seq(
    // window frames and SMJ/cartesian stream buffers move to their
    // spillable representation after 32 rows and hit disk at 256
    "spark.sql.windowExec.buffer.in.memory.threshold" -> "32",
    "spark.sql.windowExec.buffer.spill.threshold" -> "256",
    "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold" -> "32",
    "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "256",
    "spark.sql.cartesianProductExec.buffer.in.memory.threshold" -> "32",
    "spark.sql.cartesianProductExec.buffer.spill.threshold" -> "256",
    // typed Aggregator plans (KMV, Misra-Gries) fall back to
    // sort-based aggregation after 4 distinct keys per task
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "4")

  private def withConfs[T](pairs: (String, String)*)(f: => T): T = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally saved.foreach { case (k, ov) =>
      ov.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("heaviest queries are bit-identical under forced operator spill") {
    assert(heaviest.forall(SparkEntry.queries.contains))
    for (name <- heaviest) {
      val clean = SparkEntry.queries(name)(spark, sf)
        .collect().map(_.toString).sorted.toSeq
      // fresh DataFrame inside the window: execution reads SQLConf at
      // run time and QueryExecution memoizes
      val under = withConfs(spillConfs: _*) {
        SparkEntry.queries(name)(spark, sf)
          .collect().map(_.toString).sorted.toSeq
      }
      assert(under === clean, s"$name changed under forced spill")
    }
  }

  test("the thresholds really force disk spills (listener-verified)") {
    val spilled = new java.util.concurrent.atomic.AtomicLong()
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try withConfs(spillConfs: _*) {
      // ~2k-row window partitions: far past the 32-row in-memory
      // threshold and the 256-row spill threshold
      val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_orderkey"))
      Tables(spark, sf, "lineitem")
        .select(col("l_returnflag"), col("l_orderkey"),
          row_number().over(w).as("rn"))
        .agg(sum(col("rn"))).collect()
      val deadline = System.nanoTime() + 10_000_000_000L
      while (spilled.get() == 0 && System.nanoTime() < deadline) Thread.sleep(50)
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(spilled.get() > 0,
      "forced-spill thresholds must produce real spill bytes — otherwise this suite pins nothing")
  }

  test("a MERGE INTO's rewrite join executes identically under forced SMJ spill") {
    // the lake catalog's row-level MERGE plans target⋈source; with the
    // SMJ stream buffers forced to spill and broadcast disabled, the
    // rewrite's join takes the spillable path and the committed
    // snapshot must still be the exact post-merge table
    val ss = org.apache.spark.sql.graft.SessionClone(spark)
    ss.conf.set("spark.sql.catalog.graft_lake",
      classOf[graft.sources.v2.GraftLakeCatalog].getName)
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spillConfs.foreach { case (k, v) => ss.conf.set(k, v) }
    ss.sql("CREATE TABLE graft_lake.spill.m1 (k BIGINT, v BIGINT)")
    ss.range(0, 10000).select(col("id").as("k"), col("id").as("v"))
      .writeTo("graft_lake.spill.m1").append()
    ss.range(5000, 15000).select(col("id").as("k"), lit(10L).as("dv"))
      .createOrReplaceTempView("spill_chg")
    ss.sql(
      """MERGE INTO graft_lake.spill.m1 t USING spill_chg c ON t.k = c.k
        |WHEN MATCHED THEN UPDATE SET v = t.v + c.dv
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (c.k, c.dv)""".stripMargin)
    val got = ss.sql(
      """SELECT count(*) AS n,
        |  sum(CASE WHEN k < 5000 AND v = k THEN 1 ELSE 0 END) AS carried,
        |  sum(CASE WHEN k >= 5000 AND k < 10000 AND v = k + 10 THEN 1 ELSE 0 END) AS updated,
        |  sum(CASE WHEN k >= 10000 AND v = 10 THEN 1 ELSE 0 END) AS inserted
        |FROM graft_lake.spill.m1""".stripMargin).collect().head
    assert(got.getLong(0) === 15000L)
    assert(got.getLong(1) === 5000L, "carry-over rows corrupted under spill")
    assert(got.getLong(2) === 5000L, "updated rows corrupted under spill")
    assert(got.getLong(3) === 5000L, "inserted rows corrupted under spill")
  }

  test("a merge-on-read MERGE's delta write executes identically under forced SMJ spill") {
    // same join shape, delta-write sink: with the SMJ buffers spilling,
    // the per-row delete/insert actions must still arrive exactly once
    // and the delete vectors record exactly the matched pre-images
    val ss = org.apache.spark.sql.graft.SessionClone(spark)
    ss.conf.set("spark.sql.catalog.graft_lake",
      classOf[graft.sources.v2.GraftLakeCatalog].getName)
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spillConfs.foreach { case (k, v) => ss.conf.set(k, v) }
    ss.sql("CREATE TABLE graft_lake.spill.mor1 (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('write.dml.mode'='merge-on-read')")
    ss.range(0, 10000).select(col("id").as("k"), col("id").as("v"))
      .writeTo("graft_lake.spill.mor1").append()
    ss.range(5000, 15000).select(col("id").as("k"), lit(10L).as("dv"))
      .createOrReplaceTempView("spill_mor_chg")
    ss.sql(
      """MERGE INTO graft_lake.spill.mor1 t USING spill_mor_chg c ON t.k = c.k
        |WHEN MATCHED THEN UPDATE SET v = t.v + c.dv
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (c.k, c.dv)""".stripMargin)
    val got = ss.sql(
      """SELECT count(*) AS n,
        |  sum(CASE WHEN k < 5000 AND v = k THEN 1 ELSE 0 END) AS carried,
        |  sum(CASE WHEN k >= 5000 AND k < 10000 AND v = k + 10 THEN 1 ELSE 0 END) AS updated,
        |  sum(CASE WHEN k >= 10000 AND v = 10 THEN 1 ELSE 0 END) AS inserted
        |FROM graft_lake.spill.mor1""".stripMargin).collect().head
    assert(got.getLong(0) === 15000L)
    assert(got.getLong(1) === 5000L, "carry-over rows corrupted under spill")
    assert(got.getLong(2) === 5000L, "updated rows corrupted under spill")
    assert(got.getLong(3) === 5000L, "inserted rows corrupted under spill")
    val handle = graft.sources.v2.GraftLakeStore
      .get(graft.sources.v2.GraftLakeStore.defaultRoot, "spill.mor1").get
    val sn = handle.snapshot(handle.latestVersion)
    assert(sn.op === "delta")
    assert(sn.files.map(_.dvs.map(_.dels).sum).sum === 5000L,
      "delete vectors must record exactly the matched pre-images under spill")
  }
}
