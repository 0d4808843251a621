package graft.sources.v2

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import GraftLakeStore.{PendingEq, PendingFile}

/** Equality deletes (merge-on-read tier 2, Iceberg v2's second delete
  * kind): a delete file of KEY VALUES kills matching rows in every data
  * file that existed at the commit (file id <= bound); later files —
  * including the upsert's own inserts — are exempt. The pins:
  *
  *  - a streaming-style upsert commits equality deletes WITHOUT reading
  *    positions: no data file rewritten, no DV written;
  *  - the read path applies the key filter even when the projection
  *    does not include the key column;
  *  - the upsert's own inserts never self-delete (bound rule);
  *  - manifest-only COUNT pushdown disables itself (eq deletes kill an
  *    unknown number of rows);
  *  - the change feed emits EXACT row-level CDC for an eq commit: the
  *    matched pre-images only, each physical row once;
  *  - compaction (INSERT OVERWRITE) purges eq refs; expiration retains
  *    eq files referenced by survivors and GCs them after compaction.
  */
class LakeEqSpec extends SparkSpec {

  private def lakeSession(cat: String, root: String): SparkSession = {
    val ss = spark.newSession()
    ss.conf.set(s"spark.sql.catalog.$cat", classOf[GraftLakeCatalog].getName)
    ss.conf.set(s"spark.sql.catalog.$cat.root", root)
    ss
  }

  /** Hand-stage one eq-delete parquet of (possibly composite) key rows:
    * columns carry the key columns' PHYSICAL names and table types
    * (LakeEq.fileSchema), values pre-rendered to catalyst form. */
  private def stageEqRows(h: GraftLakeStore.TableHandle, tag: String,
      keyCols: Seq[String], rows: Seq[Seq[Any]]): PendingEq = {
    val schema = LakeEq.fileSchema(h.snapshot(h.latestVersion), keyCols)
    val name = s"eq-spec-$tag.parquet"
    val w = LakeParquet.writer(h.dataDir.resolve(name).toString, schema)
    val r = new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(schema.length)
    try rows.foreach { vals =>
      vals.zipWithIndex.foreach { case (v, i) => r.update(i, v) }
      w.write(r)
    } finally w.close()
    PendingEq(name, keyCols, rows.size.toLong)
  }

  /** Single-BIGINT-key convenience (the pre-composite shape). */
  private def stageEq(h: GraftLakeStore.TableHandle, tag: String,
      keys: Seq[Long], keyCol: String): PendingEq =
    stageEqRows(h, tag, Seq(keyCol), keys.sorted.map(k => Seq[Any](k)))

  /** Copy an existing data file as a fresh pending insert. */
  private def pendingCopy(h: GraftLakeStore.TableHandle, tag: String,
      df: DataFrame): Seq[PendingFile] = LakeTxn.stage(h, df)

  test("equality upsert: no rewrite, no positions; inserts exempt; projection-free key filter") {
    val root = graft.util.TempDirs.create("graft_eq_core_").toString
    val ss = lakeSession("eqc", root)
    import ss.implicits._
    ss.sql("CREATE TABLE eqc.ns.t (k BIGINT, v STRING)")
    (0L until 100L).map(k => (k, s"v$k")).toDF("k", "v")
      .repartitionByRange(4, $"k").writeTo("eqc.ns.t").append() // v1, 4 files
    val h = GraftLakeStore.get(root, "ns.t").get
    assert(h.snapshot(1).files.size === 4)

    // upsert: delete keys {7, 33, 77}, re-insert 7 with a new value and
    // add a brand-new key 7777 WITH THE SAME key value as a deleted one
    // in its own insert file — the bound rule must exempt it
    val eq = stageEq(h, "u1", Seq(7L, 33L, 77L), "k")
    val ins = pendingCopy(h, "ins1",
      Seq((7L, "v7-new"), (7777L, "fresh")).toDF("k", "v"))
    val v = h.commitEqDelta(1, Seq(eq), ins)
    assert(v === 2)
    val snap = h.snapshot(2)
    assert(snap.eqDels.size === 1 && snap.files.forall(_.dvs.isEmpty))
    assert(h.snapshot(1).files.map(_.id).toSet
      .subsetOf(snap.files.map(_.id).toSet), "no data file rewritten")

    // read: 100 - 3 deleted + 2 inserted = 99
    assert(ss.sql("SELECT count(*) FROM eqc.ns.t").head().getLong(0) === 99L)
    assert(ss.sql("SELECT v FROM eqc.ns.t WHERE k = 7").collect().toSeq ===
      Seq(Row("v7-new")), "re-inserted row visible, old version dead")
    assert(ss.sql("SELECT count(*) FROM eqc.ns.t WHERE k IN (33, 77)")
      .head().getLong(0) === 0L)
    // projection WITHOUT the key column still applies the delete
    assert(ss.sql("SELECT count(v) FROM eqc.ns.t").head().getLong(0) === 99L)
    assert(ss.sql("SELECT count(*) FROM eqc.ns.t WHERE v = 'v33'")
      .head().getLong(0) === 0L)
    // time travel: the pre-upsert snapshot is untouched
    assert(ss.sql("SELECT count(*) FROM eqc.ns.t VERSION AS OF 1")
      .head().getLong(0) === 100L)
    // the delete file is plain parquet any engine reads, its column
    // named by the key column's physical name
    val eqPath = h.tableDir.resolve(snap.eqDels.head.path).toString
    assert(spark.read.parquet(eqPath).orderBy("k")
      .collect().map(_.getLong(0)).toSeq === Seq(7L, 33L, 77L))
  }

  test("manifest COUNT pushdown disables itself under equality deletes") {
    val root = graft.util.TempDirs.create("graft_eq_count_").toString
    val ss = lakeSession("eqn", root)
    import ss.implicits._
    ss.sql("CREATE TABLE eqn.ns.t (k BIGINT)")
    (0L until 50L).map(Tuple1(_)).toDF("k").coalesce(1).writeTo("eqn.ns.t").append()
    val h = GraftLakeStore.get(root, "ns.t").get
    // pre-eq: the count IS manifest-only (plan carries the marker)
    val pre = ss.sql("SELECT count(*) FROM eqn.ns.t")
    assert(pre.queryExecution.executedPlan.toString.contains("manifest count"))
    assert(pre.head().getLong(0) === 50L)
    h.commitEqDelta(1, Seq(stageEq(h, "c1", Seq(1L, 2L), "k")), Seq.empty)
    val post = ss.sql("SELECT count(*) FROM eqn.ns.t")
    assert(!post.queryExecution.executedPlan.toString.contains("manifest count"),
      "eq deletes kill an unknown number of rows; a manifest count would lie")
    assert(post.head().getLong(0) === 48L)
  }

  test("change feed emits EXACT row-level CDC for an equality-delete commit") {
    val root = graft.util.TempDirs.create("graft_eq_feed_").toString
    val ss = lakeSession("eqf", root)
    import ss.implicits._
    ss.sql("CREATE TABLE eqf.ns.t (k BIGINT, v STRING)")
    (0L until 40L).map(k => (k, s"v$k")).toDF("k", "v")
      .repartitionByRange(2, $"k").writeTo("eqf.ns.t").append() // v1
    val h = GraftLakeStore.get(root, "ns.t").get
    // v2: eq-delete {3, 25} + insert a replacement for 3
    h.commitEqDelta(1, Seq(stageEq(h, "f1", Seq(3L, 25L), "k")),
      pendingCopy(h, "f1i", Seq((3L, "v3-new")).toDF("k", "v")))
    // v3: a SECOND eq commit deleting {25 (already dead), 30} — 25 must
    // NOT re-emit (skipEq precision), 30 must
    h.commitEqDelta(2, Seq(stageEq(h, "f2", Seq(25L, 30L), "k")), Seq.empty)

    val acc = graft.util.TempDirs.create("graft_eq_feed_acc_").toString
    val q = ss.readStream
      .format(classOf[LakeFeedProvider].getName)
      .option("root", root).option("table", "ns.t")
      .load()
      .writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        df.write.mode("overwrite").parquet(s"$acc/b$batchId")
      }
      .option("checkpointLocation", s"$acc/_chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val feed = ss.read.parquet(s"$acc/b*")
    def deletes(v: Int) = feed
      .filter(col(LakeFeed.ChangeTypeCol) === "delete" &&
        col(LakeFeed.CommitVersionCol) === v)
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(deletes(2) === Seq((3L, "v3"), (25L, "v25")),
      "v2 must emit exactly the two matched pre-images")
    assert(deletes(3) === Seq((30L, "v30")),
      "v3 must emit 30 only — 25 was already dead (skipEq precision)")
    // the fold reconstructs the final state
    val inserts = feed.filter(col(LakeFeed.ChangeTypeCol) === "insert")
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val dels = feed.filter(col(LakeFeed.ChangeTypeCol) === "delete")
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val now = ss.sql("SELECT k, v FROM eqf.ns.t").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert((inserts -- dels) === now, "insert − delete must equal the table")
  }

  test("compaction purges eq refs; expiration GCs the eq file once unreferenced") {
    val root = graft.util.TempDirs.create("graft_eq_gc_").toString
    val ss = lakeSession("eqg", root)
    import ss.implicits._
    ss.sql("CREATE TABLE eqg.ns.t (k BIGINT)")
    (0L until 30L).map(Tuple1(_)).toDF("k").coalesce(1).writeTo("eqg.ns.t").append()
    val h = GraftLakeStore.get(root, "ns.t").get
    h.commitEqDelta(1, Seq(stageEq(h, "g1", Seq(5L), "k")), Seq.empty) // v2
    val eqPath = h.snapshot(2).eqDels.head.path
    // expiration retains the eq file while a survivor references it
    h.expireSnapshots(keepLast = 1)
    assert(Files.exists(h.tableDir.resolve(eqPath)))
    assert(ss.sql("SELECT count(*) FROM eqg.ns.t").head().getLong(0) === 29L)
    // compaction rewrites live rows; the new snapshot carries no eq refs
    ss.sql("INSERT OVERWRITE eqg.ns.t SELECT /*+ REPARTITION(1) */ * FROM eqg.ns.t")
    assert(h.snapshot(h.latestVersion).eqDels.isEmpty)
    assert(ss.sql("SELECT count(*) FROM eqg.ns.t").head().getLong(0) === 29L)
    // once the eq'd snapshot expires, the orphaned eq file is GC'd
    h.expireSnapshots(keepLast = 1)
    assert(!Files.exists(h.tableDir.resolve(eqPath)))
    assert(ss.sql("SELECT count(*) FROM eqg.ns.t").head().getLong(0) === 29L)
  }

  /** The verdict's exact scenario: a STREAMING upsert writer (a CDC
    * consumer that cannot compute positions) commits equality deletes
    * per micro-batch via foreachBatch, and the change feed still emits
    * exact row-level CDC across the epochs. */
  test("streaming upsert via foreachBatch commits equality deletes per epoch; feed CDC stays exact") {
    val root = graft.util.TempDirs.create("graft_eq_stream_").toString
    val ss = lakeSession("eqs", root)
    import ss.implicits._
    ss.sql("CREATE TABLE eqs.ns.t (k BIGINT, v BIGINT)")
    (0L until 20L).map(k => (k, 0L)).toDF("k", "v").coalesce(1)
      .writeTo("eqs.ns.t").append() // v1: seed
    val h = GraftLakeStore.get(root, "ns.t").get

    // a 3-batch CDC source: each batch upserts two keys with batch-id
    // values (maxFilesPerTrigger=1 → one epoch per file)
    val srcDir = graft.util.TempDirs.create("graft_eq_stream_src_")
    (0 until 3).foreach { b =>
      Seq((b * 2L, 100L + b), (b * 2L + 1L, 100L + b)).toDF("k", "v")
        .coalesce(1).write.parquet(s"$srcDir/b$b")
      val l = java.nio.file.Files.list(java.nio.file.Paths.get(s"$srcDir/b$b"))
      val f = try l.filter(_.toString.endsWith(".parquet")).findFirst().get()
        finally l.close()
      java.nio.file.Files.move(f, srcDir.resolve(s"batch_$b.parquet"))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))
    val chk = graft.util.TempDirs.create("graft_eq_stream_chk_").toString
    val q = ss.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.toString)
      .writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        // the upsert: delete-by-key + insert new versions, NO position
        // read, NO table scan — one commitEqDelta per epoch
        val base = h.latestVersion
        val eq = stageEq(h, s"s$batchId",
          df.select("k").collect().map(_.getLong(0)).toSeq, "k")
        val ins = LakeTxn.stage(h, df)
        h.commitEqDelta(base, Seq(eq), ins)
        ()
      }
      .option("checkpointLocation", chk)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // three epochs = versions 2..4; final state: keys 0..5 upserted
    assert(h.latestVersion === 4)
    val now = ss.sql("SELECT k, v FROM eqs.ns.t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(now.length === 20)
    (0 until 6).foreach { k =>
      assert(now(k) === (k.toLong, 100L + k / 2), s"k=$k -> ${now(k)}")
    }
    (6 until 20).foreach(k => assert(now(k) === (k.toLong, 0L)))
    // the feed reconstructs: insert − delete == table
    val acc = graft.util.TempDirs.create("graft_eq_stream_acc_").toString
    val fq = ss.readStream
      .format(classOf[LakeFeedProvider].getName)
      .option("root", root).option("table", "ns.t").load()
      .writeStream
      .foreachBatch { (df: DataFrame, b: Long) =>
        df.write.mode("overwrite").parquet(s"$acc/b$b")
      }
      .option("checkpointLocation", s"$acc/_chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    fq.awaitTermination()
    val feed = ss.read.parquet(s"$acc/b*")
    val ins2 = feed.filter(col(LakeFeed.ChangeTypeCol) === "insert")
      .select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dels = feed.filter(col(LakeFeed.ChangeTypeCol) === "delete")
      .select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((ins2 -- dels) === now.toSet,
      "streamed eq upserts: feed fold must equal the table")
  }

  /** Interplay: copy-on-write DML on a table carrying eq deletes. The
    * rewrite's scan applies the eq filter, replaced files are reborn
    * with fresh ids (exempt from old eq bounds), untouched files keep
    * their eq filtering through the carried refs. */
  test("CoW UPDATE on an eq-deleted table: rewrite drops dead rows, carried refs keep filtering") {
    val root = graft.util.TempDirs.create("graft_eq_cow_").toString
    val ss = lakeSession("eqw", root)
    import ss.implicits._
    ss.sql("CREATE TABLE eqw.ns.t (k BIGINT, v BIGINT)")
    (0L until 40L).map(k => (k, 0L)).toDF("k", "v")
      .repartitionByRange(2, $"k").writeTo("eqw.ns.t").append() // 2 files
    val h = GraftLakeStore.get(root, "ns.t").get
    // eq-delete keys 1 (file A) and 25 (file B)
    h.commitEqDelta(1, Seq(stageEq(h, "w1", Seq(1L, 25L), "k")), Seq.empty)
    // CoW UPDATE matching only file A (k < 20): A is rewritten eq-free,
    // B carries over and must STILL filter k=25
    ss.sql("UPDATE eqw.ns.t SET v = 7 WHERE k = 3")
    val snap = h.snapshot(h.latestVersion)
    assert(snap.op === "replace" && snap.eqDels.nonEmpty)
    assert(ss.sql("SELECT count(*) FROM eqw.ns.t").head().getLong(0) === 38L)
    assert(ss.sql("SELECT count(*) FROM eqw.ns.t WHERE k IN (1, 25)")
      .head().getLong(0) === 0L, "both eq-deleted keys stay dead")
    assert(ss.sql("SELECT v FROM eqw.ns.t WHERE k = 3").head().getLong(0) === 7L)
    // the rewritten file's rows (fresh ids) are exempt from the old
    // bound even though their keys overlap the eq file's range
    assert(ss.sql("SELECT count(*) FROM eqw.ns.t WHERE k < 20")
      .head().getLong(0) === 19L)
  }

  test("guard rails: unsupported key types, unknown and empty key lists rejected; strict isolation") {
    val root = graft.util.TempDirs.create("graft_eq_guard_").toString
    val ss = lakeSession("eqz", root)
    import ss.implicits._
    ss.sql("CREATE TABLE eqz.ns.t (k BIGINT, v STRING, d DOUBLE)")
    Seq((1L, "a", 0.5)).toDF("k", "v", "d").coalesce(1).writeTo("eqz.ns.t").append()
    val h = GraftLakeStore.get(root, "ns.t").get
    // DOUBLE is not a supported key type (NaN/-0.0 equality is a lie)
    assert(intercept[IllegalArgumentException](
      h.commitEqDelta(1, Seq(PendingEq("eq-z1.parquet", Seq("d"), 1L)), Seq.empty))
      .getMessage.contains("unsupported type"))
    assert(intercept[IllegalArgumentException](
      h.commitEqDelta(1, Seq(PendingEq("eq-z2.parquet", Seq("nope"), 1L)), Seq.empty))
      .getMessage.contains("not a table column"))
    assert(intercept[IllegalArgumentException](
      h.commitEqDelta(1, Seq(PendingEq("eq-z3.parquet", Seq.empty, 0L)), Seq.empty))
      .getMessage.contains("at least one key column"))
    // a live eq ref pins its key column against DROP COLUMN (the type
    // is needed to decode the delete file)
    h.commitEqDelta(1, Seq(stageEq(h, "z4", Seq(1L), "k")), Seq.empty) // v2
    // Spark wraps catalog requires in SparkException — match the message
    assert(intercept[Exception](
      ss.sql("ALTER TABLE eqz.ns.t DROP COLUMN k"))
      .getMessage.contains("equality-delete key"))
    // strict isolation: ANY intervening commit conflicts
    Seq((2L, "b", 1.5)).toDF("k", "v", "d").coalesce(1).writeTo("eqz.ns.t").append() // v3
    assert(intercept[GraftLakeStore.CommitConflictException](
      h.commitEqDelta(2, Seq(stageEq(h, "z5", Seq(1L), "k")), Seq.empty))
      .getMessage.contains("retry"))
  }

  /** Composite, typed keys (the Iceberg equality-field list): a
    * (STRING, BIGINT) key deletes exactly the rows where EVERY
    * component matches, and the change feed stays row-exact. */
  test("composite (string, long) equality key: exact deletes, exact feed CDC") {
    val root = graft.util.TempDirs.create("graft_eq_comp_").toString
    val ss = lakeSession("eqk", root)
    import ss.implicits._
    ss.sql("CREATE TABLE eqk.ns.t (tenant STRING, uid BIGINT, v STRING)")
    val seed = for (t <- Seq("a", "b"); u <- 0L until 10L)
      yield (t, u, s"$t$u")
    seed.toDF("tenant", "uid", "v").coalesce(1).writeTo("eqk.ns.t").append() // v1
    val h = GraftLakeStore.get(root, "ns.t").get
    def u8(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    // delete (a,3) and (b,7); (b,3) and (a,7) must SURVIVE — a partial
    // component match is not a match
    val eq = stageEqRows(h, "c1", Seq("tenant", "uid"),
      Seq(Seq[Any](u8("a"), 3L), Seq[Any](u8("b"), 7L)))
    val ins = pendingCopy(h, "c1i", Seq(("a", 3L, "a3-new")).toDF("tenant", "uid", "v"))
    h.commitEqDelta(1, Seq(eq), ins) // v2
    assert(ss.sql("SELECT count(*) FROM eqk.ns.t").head().getLong(0) === 19L)
    assert(ss.sql("SELECT v FROM eqk.ns.t WHERE tenant='a' AND uid=3")
      .collect().map(_.getString(0)).toSeq === Seq("a3-new"))
    assert(ss.sql("SELECT count(*) FROM eqk.ns.t WHERE tenant='b' AND uid=7")
      .head().getLong(0) === 0L)
    assert(ss.sql("SELECT count(*) FROM eqk.ns.t WHERE (tenant='b' AND uid=3) " +
      "OR (tenant='a' AND uid=7)").head().getLong(0) === 2L,
      "partial component matches must survive")
    // projection without either key column still applies the delete
    assert(ss.sql("SELECT count(v) FROM eqk.ns.t").head().getLong(0) === 19L)

    // feed exactness for the composite commit
    val acc = graft.util.TempDirs.create("graft_eq_comp_acc_").toString
    val q = ss.readStream
      .format(classOf[LakeFeedProvider].getName)
      .option("root", root).option("table", "ns.t").load()
      .writeStream
      .foreachBatch { (df: DataFrame, b: Long) =>
        df.write.mode("overwrite").parquet(s"$acc/b$b")
      }
      .option("checkpointLocation", s"$acc/_chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val feed = ss.read.parquet(s"$acc/b*")
    val dels = feed.filter(col(LakeFeed.ChangeTypeCol) === "delete")
      .select("tenant", "uid").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    assert(dels === Seq(("a", 3L), ("b", 7L)),
      "feed must emit exactly the two composite-matched pre-images")
  }

  /** Multiple eq files in ONE commit apply as the union (the per-task
    * write shape: a distributed change-set commits one file per task),
    * and commits with DIFFERENT key columns BOTH apply — each group is
    * evaluated against its own columns. */
  test("multi-file eq commits union; different keyCols across commits both apply") {
    val root = graft.util.TempDirs.create("graft_eq_multi_").toString
    val ss = lakeSession("eqm", root)
    import ss.implicits._
    ss.sql("CREATE TABLE eqm.ns.t (k BIGINT, tag STRING)")
    (0L until 30L).map(k => (k, s"t${k % 3}")).toDF("k", "tag")
      .coalesce(1).writeTo("eqm.ns.t").append() // v1
    val h = GraftLakeStore.get(root, "ns.t").get
    // one commit, TWO eq files on the same key: the union must apply
    h.commitEqDelta(1, Seq(
      stageEq(h, "m1", Seq(1L, 2L), "k"),
      stageEq(h, "m2", Seq(3L, 4L), "k")), Seq.empty) // v2
    assert(ss.sql("SELECT count(*) FROM eqm.ns.t").head().getLong(0) === 26L)
    assert(ss.sql("SELECT count(*) FROM eqm.ns.t WHERE k IN (1,2,3,4)")
      .head().getLong(0) === 0L, "both files' keys dead")
    // a SECOND commit keyed on a DIFFERENT column: both deletes apply
    // (neither silently over-deletes on the other's column)
    def u8(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    h.commitEqDelta(2, Seq(stageEqRows(h, "m3", Seq("tag"),
      Seq(Seq[Any](u8("t0"))))), Seq.empty) // v3: kills k ∈ {0,3,6,…,27} minus already-dead
    // survivors: k in 5..29 with tag != t0 → from 26 rows, remove the
    // 8 remaining t0 rows (0,6,9,12,…,27 → k%3==0 minus {3} dead = 9... compute below)
    val expect = (0L until 30L)
      .filterNot(Seq(1L, 2L, 3L, 4L).contains)
      .filterNot(k => k % 3 == 0)
    assert(ss.sql("SELECT count(*) FROM eqm.ns.t").head().getLong(0) ===
      expect.size.toLong)
    assert(ss.sql("SELECT count(*) FROM eqm.ns.t WHERE tag = 't0'")
      .head().getLong(0) === 0L, "the tag-keyed delete must apply")
    assert(ss.sql("SELECT count(*) FROM eqm.ns.t WHERE k = 5")
      .head().getLong(0) === 1L, "a row matching neither key survives")
  }

  /** Interplay: cherry-pick vs equality-delete bounds. The picked
    * files get FRESH ids at the target, above every existing eq ref's
    * bound — their rows are exempt exactly like a fresh append's, even
    * when their keys collide with eq-deleted keys. */
  test("cherry-picked rows are exempt from the target's prior equality deletes") {
    val root = graft.util.TempDirs.create("graft_eq_pick_").toString
    val ss = lakeSession("eqp", root)
    import ss.implicits._
    ss.sql("CREATE TABLE eqp.ns.t (k BIGINT, v STRING)")
    (0L until 10L).map(k => (k, s"v$k")).toDF("k", "v")
      .coalesce(1).writeTo("eqp.ns.t").append() // v1
    val h = GraftLakeStore.get(root, "ns.t").get
    h.createBranch("dev", 1)
    // dev kills key 5 by equality... on the LOG head lineage; then an
    // append of a NEW version of key 5 lands as v3 on the log
    h.commitEqDelta(1, Seq(stageEq(h, "p1", Seq(5L), "k")), Seq.empty) // v2
    Seq((5L, "v5-new")).toDF("k", "v").coalesce(1).writeTo("eqp.ns.t").append() // v3
    // dev is still at v1; cherry-pick v3's append onto dev: the picked
    // file's id must be fresh, so it would be exempt from any eq ref a
    // FUTURE dev-lineage commit carries — and the dev read (based on
    // v1 content, which has no eq refs) sees both 5-versions' rows as
    // plain data
    h.cherryPick("dev", 3)
    assert(ss.sql("SELECT v FROM eqp.ns.t VERSION AS OF 'dev' WHERE k = 5 ORDER BY v")
      .collect().map(_.getString(0)).toSeq === Seq("v5", "v5-new"),
      "dev's lineage has no eq refs: both physical rows are live")
    // and on a lineage that DOES carry the eq ref, picking the same
    // append keeps the bound rule: old 5 dead, picked 5 exempt
    h.createBranch("dev2", 2) // head = the eq-delete snapshot
    h.cherryPick("dev2", 3)
    assert(ss.sql("SELECT v FROM eqp.ns.t VERSION AS OF 'dev2' WHERE k = 5")
      .collect().map(_.getString(0)).toSeq === Seq("v5-new"),
      "the eq ref kills the covered row; the picked file's fresh id is exempt")
  }

  /** Schema-evolution interplay: an eq delete keyed on a column ADDED
    * mid-history cannot touch files that predate the column — neither
    * on the scan (no resurrect, no over-delete) nor in the change feed
    * (a file no group can match emits NOTHING as an eq-delete slice,
    * instead of everything). */
  test("eq delete keyed on an evolved column: pre-evolution files exempt, feed exact") {
    val root = graft.util.TempDirs.create("graft_eq_evo_").toString
    val ss = lakeSession("eqe", root)
    import ss.implicits._
    ss.sql("CREATE TABLE eqe.ns.t (k BIGINT, v STRING)")
    Seq((1L, "old1"), (2L, "old2")).toDF("k", "v")
      .coalesce(1).writeTo("eqe.ns.t").append() // v1: predates nk
    ss.sql("ALTER TABLE eqe.ns.t ADD COLUMN nk BIGINT") // v2
    Seq((3L, "new3", 30L), (4L, "new4", 40L)).toDF("k", "v", "nk")
      .coalesce(1).writeTo("eqe.ns.t").append() // v3: carries nk
    val h = GraftLakeStore.get(root, "ns.t").get
    h.commitEqDelta(3, Seq(stageEq(h, "e1", Seq(30L), "nk")), Seq.empty) // v4
    // scan: only the nk=30 row dies; the pre-evolution file is exempt
    assert(ss.sql("SELECT k FROM eqe.ns.t ORDER BY k").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 2L, 4L))
    // feed: the eq commit emits EXACTLY the one matched pre-image —
    // never the pre-evolution file's rows (which cannot match)
    val acc = graft.util.TempDirs.create("graft_eq_evo_acc_").toString
    val q = ss.readStream
      .format(classOf[LakeFeedProvider].getName)
      .option("root", root).option("table", "ns.t").load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, b: Long) =>
        df.write.mode("overwrite").parquet(s"$acc/b$b")
      }
      .option("checkpointLocation", s"$acc/_chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val feed = ss.read.parquet(s"$acc/b*")
    val dels = feed.filter(col(LakeFeed.ChangeTypeCol) === "delete")
      .select("k").collect().map(_.getLong(0)).toSeq
    assert(dels === Seq(3L), s"expected only the matched pre-image, got $dels")
  }

  /** Property: over random data and random composite delete keys, the
    * lake read equals a reference anti-join — including the NULL rule
    * (a row with any NULL key component is never deleted). */
  test("property: composite eq deletes equal a reference anti-join; NULL components never match") {
    val root = graft.util.TempDirs.create("graft_eq_prop_").toString
    val ss = lakeSession("eqq", root)
    import ss.implicits._
    ss.sql("CREATE TABLE eqq.ns.t (tenant STRING, uid BIGINT, payload BIGINT)")
    val rnd = new scala.util.Random(20260816L)
    val rows = (0 until 400).map { i =>
      val tenant = s"t${rnd.nextInt(5)}"
      val uid: java.lang.Long =
        if (rnd.nextInt(10) == 0) null else java.lang.Long.valueOf(rnd.nextInt(40).toLong)
      (tenant, uid, i.toLong)
    }
    rows.toDF("tenant", "uid", "payload")
      .repartition(3).writeTo("eqq.ns.t").append() // v1, several files
    val h = GraftLakeStore.get(root, "ns.t").get
    val dels = (0 until 60).map { _ =>
      (s"t${rnd.nextInt(6)}", rnd.nextInt(45).toLong) }.distinct
    def u8(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    val eq = stageEqRows(h, "prop", Seq("tenant", "uid"),
      dels.map { case (t, u) => Seq[Any](u8(t), u) })
    h.commitEqDelta(1, Seq(eq), Seq.empty)
    val delSet = dels.toSet
    val expected = rows.filterNot { case (t, u, _) =>
      u != null && delSet.contains((t, u.longValue())) }
      .map(_._3).sorted
    val got = ss.sql("SELECT payload FROM eqq.ns.t ORDER BY payload")
      .collect().map(_.getLong(0)).toSeq
    assert(got === expected)
    assert(expected.size < rows.size, "the random draw must delete something")
    assert(rows.exists(_._2 == null), "the draw must include NULL key rows")
  }

  /** RENAME COLUMN immunity: EqRefs store the PHYSICAL key name at
    * commit time, so rename→re-rename around an eq commit cannot orphan
    * the deletes (the verdict's resurrect scenario). */
  test("eq deletes survive RENAME COLUMN before and after the commit") {
    val root = graft.util.TempDirs.create("graft_eq_ren_").toString
    val ss = lakeSession("eqr", root)
    import ss.implicits._
    ss.sql("CREATE TABLE eqr.ns.t (k BIGINT, v STRING)")
    (0L until 10L).map(k => (k, s"v$k")).toDF("k", "v")
      .coalesce(1).writeTo("eqr.ns.t").append() // v1
    val h = GraftLakeStore.get(root, "ns.t").get
    ss.sql("ALTER TABLE eqr.ns.t RENAME COLUMN k TO id") // v2
    // eq commit keyed on the CURRENT logical name 'id'
    h.commitEqDelta(2, Seq(stageEq(h, "r1", Seq(4L), "id")), Seq.empty) // v3
    assert(h.snapshot(3).eqDels.head.keyCols === Seq("k"),
      "the ref must store the birth physical name")
    ss.sql("ALTER TABLE eqr.ns.t RENAME COLUMN id TO id2") // v4
    assert(ss.sql("SELECT count(*) FROM eqr.ns.t").head().getLong(0) === 9L,
      "the delete still applies after the second rename")
    assert(ss.sql("SELECT count(*) FROM eqr.ns.t WHERE id2 = 4")
      .head().getLong(0) === 0L)
  }
}
