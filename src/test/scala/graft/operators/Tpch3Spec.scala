package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariants and plan pins for the synthesized-partsupp TPC-H family
  * (Q2/Q9/Q11/Q16/Q20 — q194..q198). The DuckDB oracle gates values;
  * this suite pins the GENERATOR's contract (the properties the five
  * queries assume) and the plan shapes the 100 TB design depends on. */
class Tpch3Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  // NOT cached: a cached partsupp would be substituted (as an
  // InMemoryRelation that still prints its stored physical plan) into
  // the q194-q198 queries below, corrupting the plan-shape assertions.
  // The sf0.001 build is milliseconds; rebuilding per test is free.
  private def ps = Tpch3Queries.partsupp(spark, sf)

  private def distinctShuffles(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val p = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case x => x
    }
    p.collect { case e: ShuffleExchangeLike => e.canonicalized }.distinct.size
  }

  test("partsupp: every part has >= 4 distinct suppliers (coverage arm)") {
    val under = ps.groupBy("ps_partkey")
      .agg(countDistinct("ps_suppkey").as("n"))
      .filter(col("n") < 4).count()
    assert(under === 0L)
    // and the coverage arm really is the stride-1 ring: collision-free
    // for any supplier count >= 4, so exactly 0 parts can fall short
  }

  test("partsupp: referential integrity — every lineitem (partkey, suppkey) pair exists") {
    val missing = Tables(spark, sf, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(ps, col("l_partkey") === col("ps_partkey") &&
        col("l_suppkey") === col("ps_suppkey"), "left_anti")
      .count()
    assert(missing === 0L)
  }

  test("partsupp: (partkey, suppkey) is a primary key and attributes are in range") {
    val n = ps.count()
    assert(ps.select("ps_partkey", "ps_suppkey").distinct().count() === n)
    val bad = ps.filter(
      col("ps_availqty") < 1 || col("ps_availqty") > 1000 ||
        col("ps_costc") < 100 || col("ps_costc") > 99999 ||
        col("ps_supplycost") =!= col("ps_costc").cast("double") / 100.0).count()
    assert(bad === 0L)
  }

  test("partsupp: rebuild is deterministic (bit-identical rows)") {
    val again = Tpch3Queries.partsupp(spark, sf)
    assert(ps.exceptAll(again).count() === 0L && again.exceptAll(ps).count() === 0L)
  }

  test("q194 (Q2): decorrelated — one window, no subquery, dims broadcast, bounded shuffles") {
    val df = Tpch3Queries.tpchQ2(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // the canonical correlated min-cost subquery must NOT survive as a
    // per-row subquery plan; it is one partkey window over the EU frame
    assert(!p.contains("Subquery"), s"correlated subquery survived:\n$p")
    assert(p.contains("Window"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    // partsupp build (1) + window partitioning (1) + top-k sort side;
    // the limit must be a TakeOrderedAndProject, not a global sort
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(distinctShuffles(df) <= 4, s"shuffle explosion:\n$p")
    assert(df.count() > 0)
  }

  test("q195 (Q9): red-part filter broadcasts to both fact arms; no cartesian") {
    val df = Tpch3Queries.tpchQ9(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // the single allowed nested-loop is partsupp's 1-row n_supp scalar
    // broadcast (a constant probe, not a join blow-up)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.sliding("BroadcastNestedLoopJoin".length)
      .count(_ == "BroadcastNestedLoopJoin") <= 1, p)
    // partsupp distinct + orders fact join + final agg/sort: the chain
    // must stay within a fixed shuffle budget however AQE places joins
    assert(distinctShuffles(df) <= 6, s"shuffle explosion:\n$p")
    assert(df.count() > 0)
  }

  test("q196 (Q11): the grouped frame is computed once; scalar side is a broadcast") {
    val df = Tpch3Queries.tpchQ11(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // the total/count scalar joins back via a 1-row broadcast, never a
    // shuffled cross product
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // exactly the 5 the shape needs: n_supp scalar, partsupp distinct,
    // per-part value rollup, total 1-row aggregate, presentation sort —
    // the twice-referenced grouped frame's exchanges canonicalize equal
    // and execute once under AQE stage reuse
    assert(distinctShuffles(df) <= 5, s"shuffle explosion:\n$p")
    assert(df.count() > 0)
  }

  test("q197 (Q16): complaint exclusion is a broadcast LEFT ANTI join") {
    val df = Tpch3Queries.tpchQ16(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti"), s"NOT IN did not become an anti join:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(df.count() > 0)
  }

  test("q198 (Q20): the nested-IN pyramid flattens to semi/inner joins, bounded shuffles") {
    val df = Tpch3Queries.tpchQ20(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), s"supplier IN (...) did not become a semi join:\n$p")
    // one allowed nested-loop: partsupp's 1-row n_supp scalar broadcast
    assert(!p.contains("CartesianProduct"), p)
    assert(p.sliding("BroadcastNestedLoopJoin".length)
      .count(_ == "BroadcastNestedLoopJoin") <= 1, p)
    // partsupp build + shipment rollup + semi-probe distinct + sort
    assert(distinctShuffles(df) <= 6, s"shuffle explosion:\n$p")
    assert(df.count() > 0)
  }

  test("Q20 semantics: a pair with no 1996 shipments is excluded (NULL-scalar parity)") {
    // canonical: availqty > 0.5·(SELECT sum(...)) with an empty scalar
    // sum is NULL → row drops. The flattened plan uses an INNER join to
    // the rollup; equivalence holds iff no never-shipped pair leaks in.
    val out = Tpch3Queries.tpchQ20(spark, sf)
    val shipped = Tables(spark, sf, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("l_suppkey")).distinct()
    val leaked = out.select(col("s_name").as("out_name"))
      .join(Tables(spark, sf, "supplier"), col("out_name") === col("s_name"))
      .join(shipped, col("s_suppkey") === col("l_suppkey"), "left_anti").count()
    assert(leaked === 0L, "a supplier with zero 1996 shipments qualified")
  }
}
