package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantic invariants for the round-4 analytics extensions (q122–
  * q128) — properties the DuckDB oracle can't see (internal
  * consistency, equivalence to independently-computed truths).
  */
class AnalyticsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q122: recursive depth/root equal the direct digit computation") {
    val rows = AnalyticsQueries.recursiveHierarchy(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (key, depth, root) = (r.getLong(0), r.getInt(1), r.getLong(2))
      // parent = key DIV 10 until single digit: depth = #digits - 1,
      // root = leading digit
      val digits = key.toString.length
      assert(depth == digits - 1, s"key $key depth $depth")
      assert(root == key.toString.head.asDigit.toLong, s"key $key root $root")
    }
    // every customer walked
    val n = Tables(spark, sf, "customer").count()
    assert(rows.length.toLong == n)
  }

  test("q123: bloom-pruned join result equals the plain join (no false negatives)") {
    val bloom = AnalyticsQueries.bloomPrunedJoin(spark, sf).collect()
    val urgent = Tables(spark, sf, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
    val plain = Tables(spark, sf, "lineitem")
      .join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("n_lines"),
        (sum(Exact.cents(col("l_extendedprice"))) / lit(100.0)).as("urgent_revenue"))
      .orderBy("day").collect()
    assert(bloom.toSeq == plain.toSeq)
  }

  test("q124: SCD2 intervals are contiguous, compressed, and single-current per user") {
    val rows = AnalyticsQueries.scd2Build(spark, sf).collect()
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (user, hist) =>
      // already sorted by valid_from within the global sort
      hist.sliding(2).foreach {
        case Array(a, b) =>
          // contiguous: next interval starts where the previous ends
          assert(a.getTimestamp(3) == b.getTimestamp(2), s"gap in user $user history")
          // compressed: consecutive segments carry DIFFERENT attribute values
          assert(a.getString(1) != b.getString(1), s"uncompressed run in user $user")
        case _ => ()
      }
      assert(hist.count(_.getBoolean(4)) == 1, s"user $user current-row count")
      assert(hist.last.isNullAt(3), s"user $user open interval not last")
    }
    // row count == number of change points (first event + each type switch)
    assert(rows.length > byUser.size) // at least one change somewhere
  }

  test("q125: every event lands in exactly two sliding windows") {
    val agg = AnalyticsQueries.slidingWindow(spark, sf).collect()
    val events = Tables(spark, sf, "events")
    val n = events.count()
    assert(agg.map(_.getLong(1)).sum == 2 * n)
    val cents = events.select(sum(Exact.cents(col("value")))).head.getLong(0)
    val total = agg.map(_.getDouble(2)).sum
    assert(math.abs(total - 2.0 * cents / 100.0) < 1e-6 * math.abs(total))
  }

  test("q126: profile matches per-column direct aggregates") {
    val prof = AnalyticsQueries.columnProfile(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val o = Tables(spark, sf, "orders")
    val ck = prof("o_custkey")
    assert(ck.getLong(1) == o.filter(col("o_custkey").isNotNull).count())
    assert(ck.getLong(2) == o.select(col("o_custkey")).distinct().count())
    assert(ck.getDouble(3) == o.select(min(col("o_custkey"))).head.getLong(0).toDouble)
    val st = prof("o_orderstatus")
    assert(st.isNullAt(3) && st.isNullAt(4)) // numeric stats null for strings
    assert(st.getString(5) == o.select(min(col("o_orderstatus"))).head.getString(0))
  }

  test("q127: lateral top-2 equals the window-rank formulation") {
    val lateral = AnalyticsQueries.lateralTopPerGroup(spark, sf)
      .select(col("n_name"), col("c_custkey")).collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val direct = Tables(spark, sf, "customer")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .join(Tables(spark, sf, "nation"), col("c_nationkey") === col("n_nationkey"))
      .orderBy(col("n_name"), col("c_acctbal").desc, col("c_custkey"))
      .select(col("n_name"), col("c_custkey")).collect().toSeq
    assert(lateral == direct)
  }

  test("q128: z-scores agree with the built-in avg/stddev_samp formulation") {
    val declared = AnalyticsQueries.zscoreOutliers(spark, sf).collect()
    val cents = Exact.cents(col("value"))
    val stats = Tables(spark, sf, "events").groupBy(col("event_type"))
      .agg(avg(cents).as("m"), stddev_samp(cents).as("sd"))
    val direct = Tables(spark, sf, "events")
      .join(stats, Seq("event_type"))
      .withColumn("z", (cents - col("m")) / col("sd"))
      .filter(abs(col("z")) > 3.0)
      .select(col("event_id"), col("z")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(declared.map(_.getLong(0)).toSet == direct.keySet)
    declared.foreach { r =>
      assert(math.abs(r.getDouble(3) - direct(r.getLong(0))) < 1e-4)
    }
  }
}
