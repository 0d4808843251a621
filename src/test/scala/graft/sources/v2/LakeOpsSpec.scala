package graft.sources.v2

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Lake lifecycle on top of the catalog: incremental MV refresh
  * (q210), snapshot change-feed (q212), and version rollback (q213).
  * Every assertion compares the lifecycle path against a from-scratch
  * recompute or a pinned earlier snapshot — the lifecycle must never
  * change an answer, only how cheaply it is reached. */
class LakeOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def lake(): org.apache.spark.sql.SparkSession =
    MergeQueries.lakeSession(spark)

  test("q210: incrementally-refreshed MV equals the full recompute") {
    val got = LakeOps.mvIncremental(spark, sf).collect().toSeq
    val full = graft.Tables(spark, sf, "orders")
      .groupBy(substring(col("o_orderdate").cast("string"), 1, 7).as("ym"))
      .agg(count(lit(1)).as("cnt"),
        (sum(graft.operators.Exact.cents(col("o_totalprice"))) / 100.0)
          .cast("double").as("total_price"))
      .orderBy("ym").collect().toSeq
    assert(got.nonEmpty)
    assert(got === full)
  }

  test("q210: both MERGE paths fired — boundary month updated, later months inserted, earlier months untouched") {
    val tbl = LakeOps.ensureMv(spark, sf) // stage (memoized)
    val ss = lake()
    val v1 = ss.sql(s"SELECT * FROM $tbl VERSION AS OF 1")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val v2 = ss.sql(s"SELECT * FROM $tbl")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // inserts: months the seed never saw exist only in v2
    assert(v2.keySet.size > v1.keySet.size)
    // update: the cutoff month existed in v1 and GREW in v2
    assert(v1.contains("1997-06") && v2("1997-06")._1 > v1("1997-06")._1)
    // untouched: every fully-ingested month carried over byte-identical
    v1.keys.filter(_ < "1997-06").foreach { k => assert(v2(k) === v1(k)) }
  }

  test("MV refresh equals the full recompute at EVERY cutoff, including empty seed and empty delta") {
    // the declared q210 pins one mid-month cutoff; this replays the
    // same seed→MERGE pipeline at the two degenerate boundaries (all
    // rows in the delta / all rows in the seed) and one more interior
    // cut — the incremental path may never depend on WHERE the batch
    // boundary falls
    import org.apache.spark.sql.DataFrame
    val ss = lake()
    val orders = graft.Tables(ss, sf, "orders")
    def rollup(df: DataFrame): DataFrame = df
      .groupBy(substring(col("o_orderdate").cast("string"), 1, 7).as("ym"))
      .agg(count(lit(1)).as("cnt"),
        sum(graft.operators.Exact.cents(col("o_totalprice"))).as("sum_cents"))
    val full = rollup(orders).orderBy("ym").collect().toSeq
    for ((cutoff, i) <- Seq("1990-01-01", "2000-01-01", "1994-09-10").zipWithIndex) {
      val tbl = s"graft_lake.spec.mv_cut$i"
      ss.sql(s"CREATE TABLE $tbl (ym STRING, cnt BIGINT, sum_cents BIGINT)")
      rollup(orders.filter(col("o_orderdate") < lit(cutoff))).writeTo(tbl).append()
      rollup(orders.filter(col("o_orderdate") >= lit(cutoff)))
        .createOrReplaceTempView(s"mv_cut_delta$i")
      ss.sql(
        s"""MERGE INTO $tbl m USING mv_cut_delta$i d ON m.ym <=> d.ym
           |WHEN MATCHED THEN UPDATE SET
           |  cnt = m.cnt + d.cnt, sum_cents = m.sum_cents + d.sum_cents
           |WHEN NOT MATCHED THEN
           |  INSERT (ym, cnt, sum_cents) VALUES (d.ym, d.cnt, d.sum_cents)""".stripMargin)
      val got = ss.sql(s"SELECT ym, cnt, sum_cents FROM $tbl ORDER BY ym").collect().toSeq
      assert(got === full, s"cutoff $cutoff diverged from the full recompute")
    }
  }

  test("q212: snapshot change-feed equals the recompute-based table diff (q105)") {
    val feed = LakeOps.snapshotDiff(spark, sf).collect().toSeq
    val diff = graft.operators.CdcOps.tableDiff(spark, sf).collect().toSeq
    assert(feed.nonEmpty)
    assert(feed === diff)
  }

  test("q213: rollback restores the seed; the deleted state stays visible at v2") {
    val got = LakeOps.rollback(spark, sf).collect().toSeq
    val seed = graft.Tables(spark, sf, "customer")
      .select(col("c_custkey").cast("long").as("c_custkey"), col("c_name"),
        (graft.operators.Exact.cents(col("c_acctbal")) / 100.0)
          .cast("double").as("c_acctbal"))
      .orderBy("c_custkey").collect().toSeq
    assert(got === seed)
    val ss = lake()
    val tbl = LakeOps.ensureRollback(spark, sf)
    // v2 = post-DELETE: strictly fewer rows, and none with key % 3 == 0
    val v2 = ss.sql(s"SELECT c_custkey FROM $tbl VERSION AS OF 2")
    assert(v2.count() < seed.size)
    assert(v2.filter(col("c_custkey") % 3 === 0).count() === 0)
    // the rollback is itself a commit: history is v0..v3
    assert(ss.sql(s"SELECT * FROM $tbl VERSION AS OF 3")
      .count() === seed.size)
    val err = intercept[Exception] {
      ss.sql(s"SELECT * FROM $tbl VERSION AS OF 4").collect()
    }
    assert(err.getMessage.contains("no snapshot 4"))
  }

  test("q215: published + quarantined partition the source exactly; routing is faithful") {
    val got = LakeOps.writeAuditPublish(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val li = graft.Tables(spark, sf, "lineitem")
    val bad = li.filter(!(col("l_quantity") <= 30 &&
      col("l_discount") >= 0 && col("l_discount") <= 0.10)).count()
    assert(got("published") + got("quarantined") === li.count())
    assert(got("quarantined") === bad)
    assert(got("published") > 0 && got("quarantined") > 0)
    // every routed row actually satisfies its destination's predicate
    val (pub, quar) = LakeOps.ensureWap(spark, sf)
    val ss = lake()
    assert(ss.sql(s"SELECT count(*) FROM $pub WHERE quantity > 30")
      .collect().head.getLong(0) === 0L)
    // on this fixture every violation is a quantity violation (the
    // discount check pins 0 in q211), so quarantine must hold ONLY
    // qty>30 rows — the count identity above is the predicate-exact pin
    assert(ss.sql(s"SELECT count(*) FROM $quar WHERE quantity <= 30")
      .collect().head.getLong(0) === 0L)
    // WAP-on-branch shape: the published table IS the branch table —
    // main and audit agree post-publish, and the staging lineage is
    // visible in the refs (one table, zero copies at publish time)
    val handle = GraftLakeStore.get(GraftLakeStore.defaultRoot,
      pub.stripPrefix("graft_lake.")).get
    val bs = handle.branches()
    assert(bs.contains("main") && bs.contains("audit") &&
      bs("main") === bs("audit"),
      s"post-publish refs: $bs")
  }
}
