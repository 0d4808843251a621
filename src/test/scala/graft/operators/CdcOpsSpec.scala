package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("cdcMerge: row accounting, key uniqueness, and per-path semantics") {
    val base = graft.Tables(spark, sf, "customer")
    val orders1995 = graft.Tables(spark, sf, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01") &&
        col("o_orderdate") < lit("1996-01-01"))
    val perCust = orders1995.groupBy("o_custkey")
      .agg(max("o_orderstatus").as("st"),
        sum(Exact.cents(col("o_totalprice"))).as("delta"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val deletes = perCust.count(_._2._1 == "F")
    val inserts = base.filter(col("c_custkey") % 97 === 0).count()

    val merged = CdcOps.cdcMerge(spark, sf)
    val rows = merged.collect()

    // MERGE accounting: every base row survives except deletes; every
    // synthetic insert appears exactly once
    assert(rows.length === base.count() - deletes + inserts)
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)

    val byKey = rows.map(r => r.getLong(0) -> r).toMap
    // deleted keys are gone
    perCust.filter(_._2._1 == "F").keys.foreach(k => assert(!byKey.contains(k), s"key $k not deleted"))
    // an updated customer's balance moved by exactly its 1995 spend
    val someUpdate = perCust.find(_._2._1 != "F").get
    val baseBal = base.filter(col("c_custkey") === someUpdate._1)
      .select(Exact.cents(col("c_acctbal"))).collect().head.getLong(0)
    assert(byKey(someUpdate._1).getDouble(2) ===
      (baseBal + someUpdate._2._2) / 100.0)
    // inserts carry the synthetic negative key, generated name, zero
    // balance (negative key space cannot collide with real custkeys at
    // any scale factor)
    val ins = rows.filter(_.getLong(0) < 0L)
    assert(ins.length === inserts)
    ins.foreach { r =>
      assert(r.getString(1) === s"new#${r.getLong(0)}")
      assert(r.getDouble(2) === 0.0)
    }
  }

  test("tableDiff recovers exactly the merge's effective change-set") {
    val diff = CdcOps.tableDiff(spark, sf).collect()
    val byType = diff.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    // adds = synthetic inserts; removes = matched deletes; changes =
    // matched updates (every update moves the balance by a positive
    // 1995 spend, so each one must surface)
    val base = graft.Tables(spark, sf, "customer")
    val perCust = graft.Tables(spark, sf, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01") &&
        col("o_orderdate") < lit("1996-01-01"))
      .groupBy("o_custkey").agg(max("o_orderstatus").as("st"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byType.getOrElse("added", 0) ===
      base.filter(col("c_custkey") % 97 === 0).count().toInt)
    assert(byType.getOrElse("removed", 0) === perCust.count(_._2 == "F"))
    assert(byType.getOrElse("changed", 0) === perCust.count(_._2 != "F"))
    // every changed row really moved
    diff.filter(_.getString(1) == "changed").foreach { r =>
      assert(r.getDouble(2) !== r.getDouble(3), r.toString)
    }
  }

  test("funnel: window formulation equals the brute-force range self-join") {
    val ev = graft.Tables(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type")
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("ts").as("v_ts"),
        col("user_id").as("v_user"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("ts").as("p_ts"), col("user_id").as("p_user"),
        col("event_id").as("p_id"))
    // brute force: a view converts if ANY purchase by the same user is
    // in [v_ts, v_ts + 30 min] — with the same (ts, event_id) tie order
    // the window version uses
    val converted = views.join(purchases,
        col("v_user") === col("p_user") &&
          (col("p_ts") > col("v_ts") ||
            (col("p_ts") === col("v_ts") && col("p_id") > col("v_id"))) &&
          col("p_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES"), "left_semi")
      .select(col("v_id").as("c_id"), lit(1).as("c"))
    val expected = views
      .join(converted, col("v_id") === col("c_id"), "left")
      .groupBy(to_date(col("v_ts")).as("event_date"))
      .agg(count(lit(1)).as("n_views"), count(col("c")).as("n_converted"))
      .orderBy("event_date").collect().toSeq

    val got = CdcOps.funnel(spark, sf).collect().toSeq
    assert(got === expected)
  }
}
