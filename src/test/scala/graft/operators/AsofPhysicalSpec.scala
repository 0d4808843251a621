package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftPlans

/** The custom AsofJoinExec physical operator: plan shape, equivalence
  * with the union+window formulation on real data, and edge semantics
  * (ties, no-match, cross-partition keys). */
class AsofPhysicalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("AsofJoinExec plans as the custom exec over co-partitioned sorted children") {
    import spark.implicits._
    val l = Seq((1L, 5L, "e1")).toDF("k", "t", "tag")
    val r = Seq((1L, 3L, "o1")).toDF("rk", "rt", "pay")
    val p = GraftPlans.asofJoin(l, r, "k", "rk", "t", "rt")
      .queryExecution.executedPlan.toString
    assert(p.contains("AsofJoin"), p)
    assert(p.contains("Sort ["), "children must be sorted\n" + p)
  }

  test("ties match, missing keys and early lefts get nulls") {
    import spark.implicits._
    val l = Seq((1L, 5L, "tie"), (1L, 1L, "early"), (2L, 10L, "nokey"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 5L, "a"), (1L, 3L, "b")).toDF("rk", "rt", "pay")
    val got = GraftPlans.asofJoin(l, r, "k", "rk", "t", "rt")
      .select("tag", "pay").collect()
      .map(x => x.getString(0) -> (if (x.isNullAt(1)) null else x.getString(1)))
      .toMap
    // rt=5 <= t=5: the tie row wins over the earlier rt=3
    assert(got === Map("tie" -> "a", "early" -> null, "nokey" -> null))
  }

  test("string keys: stale matches never leak into the next key group") {
    import spark.implicits._
    // many adjacent key groups per partition: a stale lastMatch (or a
    // lastKey aliasing the recycled row buffer) would leak a previous
    // group's payload into a group with no qualifying right row
    val l = (1 to 500).map(i => (s"k${i % 50}", i.toLong, i)).toDF("k", "t", "id")
    val r = Seq(("k1", 0L, "p1"), ("k3", 0L, "p3")).toDF("rk", "rt", "pay")
    val got = GraftPlans.asofJoin(l, r, "k", "rk", "t", "rt").cache()
    assert(got.filter(col("pay").isNotNull && !col("k").isin("k1", "k3")).count() === 0)
    assert(got.filter(col("pay") === "p1").count() === 10)
    assert(got.filter(col("pay") === "p3").count() === 10)
    got.unpersist()
  }

  test("equals Ops.asofJoin (union+window) on the q36 data") {
    val events = graft.Tables(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    val rollup = RelationalQueries.ordersAsofRollup(spark, sf)
    val physical = GraftPlans.asofJoin(
        events,
        rollup.select(col("o_custkey").as("r_user"),
          col("o_orderdate").cast("timestamp").as("r_ts"), col("o_orderkey")),
        "user_id", "r_user", "ts", "r_ts")
      .select(col("event_id"), col("o_orderkey").as("last_order"))
      .orderBy("event_id").collect().toSeq
    val windowed = Ops.asofJoin(
        events,
        rollup.select(col("o_custkey").as("user_id"),
          col("o_orderdate").cast("timestamp").as("o_ts"), col("o_orderkey")),
        "user_id", "ts", "o_ts", Seq("o_orderkey"))
      .select(col("event_id"), col("o_orderkey").as("last_order"))
      .orderBy("event_id").collect().toSeq
    assert(physical === windowed)
  }
}
