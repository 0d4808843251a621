package graft.sources.v2

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The change-feed source and the round-9 lifecycle queries (q216-
  * q220): feed semantics per commit kind, checkpointed incremental
  * consumption, and engine-side equality of each declared query with
  * its recompute. */
class LakeFeedSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def lakeSession(cat: String, root: String): SparkSession = {
    val ss = spark.newSession()
    ss.conf.set(s"spark.sql.catalog.$cat", classOf[GraftLakeCatalog].getName)
    ss.conf.set(s"spark.sql.catalog.$cat.root", root)
    ss
  }

  private def runFeed(ss: SparkSession, root: String, table: String,
      acc: String): Unit = {
    val q = ss.readStream.format(classOf[LakeFeedProvider].getName)
      .option("root", root).option("table", table).load()
      .writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        df.write.mode("overwrite").parquet(s"$acc/b$batchId")
      }
      .option("checkpointLocation", s"$acc/_chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("feed semantics: appends stream as inserts, CoW rewrites as delete+insert, by version") {
    val root = graft.util.TempDirs.create("graft_feed_sem_").toString
    val ss = lakeSession("fds", root)
    ss.sql("CREATE TABLE fds.ns.t (k BIGINT, v STRING)")
    ss.sql("INSERT INTO fds.ns.t VALUES (1, 'a'), (2, 'b')") // v1
    ss.sql("UPDATE fds.ns.t SET v = 'z' WHERE k = 2")        // v2 (CoW)
    val acc = graft.util.TempDirs.create("graft_feed_acc_").toString
    runFeed(ss, root, "ns.t", acc)
    val got = spark.read.parquet(s"$acc/b*")
      .select("k", "v", LakeFeed.ChangeTypeCol, LakeFeed.CommitVersionCol)
      .orderBy(LakeFeed.CommitVersionCol, LakeFeed.ChangeTypeCol, "k")
      .collect().toSeq
    // the two-row INSERT lands as two single-row files (two write
    // tasks), so runtime group filtering bounds the UPDATE's rewrite to
    // k=2's file alone — (1,'a') never cycles through the feed at all
    assert(got === Seq(
      Row(1L, "a", "insert", 1), Row(2L, "b", "insert", 1), // v1 append
      Row(2L, "b", "delete", 2),                            // v2 removes k=2's file
      Row(2L, "z", "insert", 2)                             // v2 rewrite of it
    ))
    // reconstruction: insert − delete by row content = current state
    val state = spark.read.parquet(s"$acc/b*")
      .groupBy("k", "v")
      .agg(sum(when(col(LakeFeed.ChangeTypeCol) === "insert", 1L)
        .otherwise(-1L)).as("net"))
      .filter(col("net") > 0).select("k", "v").orderBy("k")
      .collect().toSeq
    assert(state === Seq(Row(1L, "a"), Row(2L, "z")))
  }

  test("merge-on-read feed: a delta commit streams exactly the deleted rows — row-level CDC") {
    val root = graft.util.TempDirs.create("graft_feed_mor_").toString
    val ss = lakeSession("fdm", root)
    import ss.implicits._
    ss.sql("CREATE TABLE fdm.ns.t (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('write.dml.mode'='merge-on-read')")
    (0L until 10L).map(k => (k, k * 10)).toDF("k", "v")
      .coalesce(1).writeTo("fdm.ns.t").append()        // v1: one 10-row file
    ss.sql("DELETE FROM fdm.ns.t WHERE k IN (2, 5)")   // v2: DV, no rewrite
    ss.sql("UPDATE fdm.ns.t SET v = 700 WHERE k = 7")  // v3: DV + insert file
    ss.sql("INSERT OVERWRITE fdm.ns.t SELECT * FROM fdm.ns.t") // v4: rewrite
    val acc = graft.util.TempDirs.create("graft_feed_mor_acc_").toString
    runFeed(ss, root, "ns.t", acc)
    val byV = spark.read.parquet(s"$acc/b*")
      .select("k", "v", LakeFeed.ChangeTypeCol, LakeFeed.CommitVersionCol)
      .collect().toSeq.groupBy(_.getInt(3))
    // v1: the ten seed inserts
    assert(byV(1).size === 10 && byV(1).forall(_.getString(2) == "insert"))
    // v2: EXACTLY the two deleted rows — not the whole file cycling
    assert(byV(2).map(r => (r.getLong(0), r.getString(2))).sorted.toSeq
      === Seq((2L, "delete"), (5L, "delete")))
    // v3: the update's pre-image deletes, post-image inserts
    assert(byV(3).map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
      === Seq((7L, 70L, "delete"), (7L, 700L, "insert")))
    // v4: the rewrite cycles only LIVE rows — 2, 5 and the stale 7
    // never re-emit (their deletes already streamed in v2/v3)
    val v4 = byV(4).map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(v4.count(_._3 == "delete") === 8, v4.sorted)
    assert(!v4.exists(t => t._1 == 2L || t._1 == 5L), v4.sorted)
    assert(!v4.contains((7L, 70L, "delete")), v4.sorted)
    // reconstruction: fold insert − delete = current state
    val state = spark.read.parquet(s"$acc/b*")
      .groupBy("k", "v")
      .agg(sum(when(col(LakeFeed.ChangeTypeCol) === "insert", 1L)
        .otherwise(-1L)).as("net"))
      .filter(col("net") > 0).select("k", "v").orderBy("k")
      .collect().toSeq
    assert(state === ss.sql("SELECT k, v FROM fdm.ns.t ORDER BY k").collect().toSeq)
  }

  test("checkpointed incremental consumption: a restart consumes only new versions") {
    val root = graft.util.TempDirs.create("graft_feed_inc_").toString
    val ss = lakeSession("fdi", root)
    ss.sql("CREATE TABLE fdi.ns.t (k BIGINT)")
    ss.sql("INSERT INTO fdi.ns.t VALUES (1)") // v1
    val acc = graft.util.TempDirs.create("graft_feed_acc2_").toString
    runFeed(ss, root, "ns.t", acc)
    val afterFirst = spark.read.parquet(s"$acc/b*").count()
    assert(afterFirst === 1L)
    // two more commits land; the SAME checkpoint resumes mid-history
    ss.sql("INSERT INTO fdi.ns.t VALUES (2)") // v2
    ss.sql("INSERT INTO fdi.ns.t VALUES (3)") // v3
    runFeed(ss, root, "ns.t", acc)
    val rows = spark.read.parquet(s"$acc/b*")
      .select("k", LakeFeed.CommitVersionCol).orderBy("k").collect().toSeq
    // batch dirs are keyed by batchId, so a rescan-from-zero would have
    // OVERWRITTEN b0 with duplicate v1 rows; instead v2+v3 arrived as
    // the next batch
    assert(rows === Seq(Row(1L, 1), Row(2L, 2), Row(3L, 3)))
  }

  test("q216 change-feed reconstruction equals the q208 post-MERGE read") {
    val viaFeed = LakeLifecycle.changeFeedConsumer(spark, sf).collect().toSeq
    val viaTable = MergeQueries.sqlMergeInto(spark, sf).collect().toSeq
    assert(viaFeed.nonEmpty)
    assert(viaFeed === viaTable)
  }

  test("q217 expiration kept the rollback state byte-identical to the seed") {
    import org.apache.spark.sql.functions._
    val got = LakeLifecycle.snapshotExpiration(spark, sf).collect().toSeq
    val seed = graft.Tables(spark, sf, "customer")
      .select(col("c_custkey").cast("long").as("c_custkey"), col("c_name"),
        (graft.operators.Exact.cents(col("c_acctbal")) / 100.0)
          .cast("double").as("c_acctbal"))
      .orderBy("c_custkey").collect().toSeq
    assert(got === seed)
  }

  test("q218 compaction preserved the exact row multiset of three fragmented ingests") {
    import org.apache.spark.sql.functions._
    val got = LakeLifecycle.lakeCompaction(spark, sf).collect().toSeq
    val want = graft.Tables(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        (sum(graft.operators.Exact.cents(col("l_extendedprice"))) / 100.0)
          .cast("double").as("sum_price"))
      .orderBy("l_returnflag").collect().toSeq
    assert(got === want)
  }

  test("q223 streaming sink reconstructs the batch rollup over raw events") {
    import org.apache.spark.sql.functions._
    val got = LakeLifecycle.streamingLakeSink(spark, sf).collect().toSeq
    val want = graft.Tables(spark, sf, "events")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        (sum(graft.operators.Exact.cents(col("value"))) / 100.0)
          .cast("double").as("total_value")).collect().toSeq
    assert(got === want)
  }

  test("streaming sink: one snapshot per epoch, txn-marked, replays append nothing") {
    // self-contained staging (own root + tiny 3-file source), so the
    // history assertions cannot collide with other suites' memoized
    // q223 stagings at other scale factors
    val root = graft.util.TempDirs.create("graft_sink_hist_").toString
    val ss = lakeSession("snk", root)
    import ss.implicits._
    ss.sql("CREATE TABLE snk.ns.t (k BIGINT)")
    val src = graft.util.TempDirs.create("graft_sink_src_")
    (0 until 3).foreach { i =>
      val part = graft.util.TempDirs.create(s"graft_sink_part$i" + "_")
      Seq(Tuple1(i.toLong)).toDF("k").coalesce(1)
        .write.mode("overwrite").parquet(part.toString)
      val l = java.nio.file.Files.list(part)
      val f = try l.filter(_.toString.endsWith(".parquet")).findFirst().get()
        finally l.close()
      java.nio.file.Files.move(f, src.resolve(s"k_$i.parquet"))
    }
    val chk = graft.util.TempDirs.create("graft_sink_chk_").toString
    val q = ss.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType))))
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
      .writeStream.option("checkpointLocation", chk)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .toTable("snk.ns.t")
    q.awaitTermination()
    assert(ss.sql("SELECT sum(k) FROM snk.ns.t").head().getLong(0) === 3L)
    // v0 create + exactly one append per epoch, each txn-marked
    val handle = GraftLakeStore.get(root, "ns.t").get
    assert(handle.latestVersion === 3)
    val snaps = (1 to 3).map(handle.snapshot)
    assert(snaps.forall(_.op == "append"))
    val txns = snaps.flatMap(_.txn)
    assert(txns.size === 3 && txns.distinct.size === 3, txns)
    assert(txns.map(_._1).distinct.size === 1, "one query id across epochs")
    // exactly-once: replaying a committed epoch appends NOTHING
    val (qid, e) = txns.last
    val (v, committed) = handle.commitEpochAppend(qid, e, Seq.empty)
    assert(!committed && v === 3)
    assert(handle.latestVersion === 3)
    // while a genuinely new epoch commits
    val (v2, c2) = handle.commitEpochAppend(qid, e + 100, Seq.empty)
    assert(c2 && v2 === 4)
  }

  test("q219 reads across the evolution boundary; q220 equals the unpartitioned rollup") {
    val evo = LakeLifecycle.schemaEvolutionRead(spark, sf).collect().toSeq
    assert(evo.size === 25)
    assert(evo.count(_.isNullAt(2)) === 12) // pre-evolution rows: NULL tag
    assert(evo.filter(!_.isNullAt(2)).forall(_.getString(2) == "v2"))
    val bym = LakeLifecycle.partitionedLakeScan(spark, sf).collect().toSeq
    val base = graft.sources.LayoutQueries.partitionPrunedScan(spark, sf)
      .collect().toSeq
    assert(bym.map(r => (r.getString(0), r.getLong(1))) ===
      base.map(r => (r.getString(0), r.getLong(1))))
  }
}
