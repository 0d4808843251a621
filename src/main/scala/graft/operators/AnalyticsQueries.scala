package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Round-4 analytics surface extensions: the SQL features an analytics
  * engine's users reach for next after joins/windows/subqueries —
  * recursive hierarchies, runtime-filter pruning, slowly-changing
  * dimensions, sliding windows, dataset profiling, correlated LATERAL,
  * and statistical outlier detection. Each query is deterministic
  * (total-order sort, exact integer money, one-shot IEEE closings) and
  * carries a DuckDB oracle.
  */
object AnalyticsQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** Recursive CTE — hierarchy walk through Spark 4's native
    * `WITH RECURSIVE` (UnionLoop execution: the recursion is a loop of
    * distributed batches, not a driver loop; each step is a full Spark
    * plan over the previous step's output). The hierarchy is the
    * base-10 prefix chain over customer keys (parent = key DIV 10) —
    * derived from the data, no synthetic input: every walk terminates
    * in ≤ ceil(log10(max key)) steps, so the recursion depth is bounded
    * by the KEY WIDTH, never the row count. Output: each customer's
    * depth and single-digit root. Reference analog: none (the
    * reference has no iterative SQL at all) — capability extension.
    */
  def recursiveHierarchy(s: SparkSession, dir: String): DataFrame =
    RelationalQueries.sqlOn(s, dir, Seq("customer")) { v =>
      s"""WITH RECURSIVE walk(custkey, node, depth) AS (
         |  SELECT c_custkey, c_custkey, 0 FROM ${v("customer")}
         |  UNION ALL
         |  SELECT custkey, node DIV 10, depth + 1 FROM walk WHERE node >= 10)
         |SELECT custkey, max(depth) AS depth, min(node) AS root
         |FROM walk GROUP BY custkey ORDER BY custkey""".stripMargin
    }

  /** Bloom-filter runtime join pruning (BloomFilterPrune.semiFilter):
    * lineitem is pre-filtered by a bloom sketch of the selective order
    * subset's keys BEFORE its shuffle, then joined for real. Bloom
    * filters have no false negatives, so the oracle is the plain join —
    * the sketch changes shuffled volume, never the result. PlanSpec
    * pins that the probe predicate actually sits on the fact side's
    * scan stage. */
  def bloomPrunedJoin(s: SparkSession, dir: String): DataFrame = {
    val urgent = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderdate"))
    val fact = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
    val pruned = org.apache.spark.sql.graft.BloomFilterPrune
      .semiFilter(fact, "l_orderkey", urgent, "o_orderkey")
    pruned.join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("n_lines"),
        (sum(Exact.cents(col("l_extendedprice"))) / lit(100.0)).as("urgent_revenue"))
      .orderBy("day")
  }

  /** SCD2 dimension build from a change stream — the warehouse
    * primitive for "what was this entity's attribute AT time t": each
    * user's event_type history is compressed to change points (drop
    * rows equal to their predecessor), then each surviving row gets
    * [valid_from, valid_to) from its own and its successor's
    * timestamps; the open row is current. Two windows over the same
    * (user, time) partitioning — ONE shuffle, both window passes reuse
    * the sort. At 100 TB this shape holds: per-key history fits the
    * window's streaming frame, nothing is collected. */
  def scd2Build(s: SparkSession, dir: String): DataFrame = {
    val byTime = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byTime))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("valid_to", lead(col("ts"), 1).over(byTime))
      .select(col("user_id"), col("event_type"), col("ts").as("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"))
      .orderBy("user_id", "valid_from")
  }

  /** Sliding (hopping) window aggregation — window(2h, slide 1h): each
    * event lands in exactly two overlapping hourly-aligned windows.
    * Spark's `window()` generator explodes each row to its covering
    * windows map-side (bounded by window/slide = 2), then a plain
    * partial-aggregated groupBy — the overlap factor, not the data,
    * bounds the expansion. Complements q30 (tumbling). */
  def slidingWindow(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "2 hours", "1 hour"))
      .agg(count(lit(1)).as("n"),
        (sum(Exact.cents(col("value"))) / lit(100.0)).as("total_value"))
      .select(col("window.start").as("win_start"), col("n"), col("total_value"))
      .orderBy("win_start")

  /** Single-pass dataset profiler — per-column null count, distinct
    * count, min/max — the first query anyone runs against an unknown
    * table. ONE scan computes every column's aggregates side by side
    * (Spark plans multi-distinct with one expand, still a single pass
    * over the data), then the wide row unpivots to the per-column
    * report. Numeric min/max surface as doubles, string min/max as
    * strings — never numeric-as-string (engines disagree on double
    * formatting, so that would be oracle-hostile). */
  def columnProfile(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    def num(c: String) = struct(
      count(col(c)).as("non_null"), countDistinct(col(c)).as("n_distinct"),
      min(col(c)).cast("double").as("min_num"), max(col(c)).cast("double").as("max_num"),
      lit(null).cast("string").as("min_str"), lit(null).cast("string").as("max_str"))
    def str(c: String) = struct(
      count(col(c)).as("non_null"), countDistinct(col(c)).as("n_distinct"),
      lit(null).cast("double").as("min_num"), lit(null).cast("double").as("max_num"),
      min(col(c)).as("min_str"), max(col(c)).as("max_str"))
    o.agg(
        num("o_custkey").as("o_custkey"), num("o_totalprice").as("o_totalprice"),
        str("o_orderstatus").as("o_orderstatus"), str("o_orderpriority").as("o_orderpriority"))
      .select(expr(
        "stack(4, 'o_custkey', o_custkey, 'o_totalprice', o_totalprice, " +
          "'o_orderstatus', o_orderstatus, 'o_orderpriority', o_orderpriority) " +
          "AS (column_name, p)"))
      .select(col("column_name"), col("p.*"))
      .orderBy("column_name")
  }

  /** Correlated LATERAL subquery with LIMIT — top-2 customers by
    * balance per nation, written the way a SQL user writes it.
    * Catalyst decorrelates the lateral limit into a per-key window
    * rank (DomainJoin rewrite) — one shuffle on the correlation key,
    * never a per-outer-row probe; PlanSpec pins no nested-loop
    * execution of the subquery. Same semantics as q14's salted top-k,
    * arrived at from the declarative side. */
  def lateralTopPerGroup(s: SparkSession, dir: String): DataFrame =
    RelationalQueries.sqlOn(s, dir, Seq("nation", "customer")) { v =>
      s"""SELECT n.n_name, top.c_custkey, top.c_acctbal
         |FROM ${v("nation")} n,
         |LATERAL (
         |  SELECT c_custkey, c_acctbal FROM ${v("customer")} c
         |  WHERE c.c_nationkey = n.n_nationkey
         |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) top
         |ORDER BY n.n_name, top.c_acctbal DESC, top.c_custkey""".stripMargin
    }

  /** Per-group z-score outlier detection — events whose value sits
    * more than 3 sample standard deviations from their type's mean.
    * Group moments come from EXACT integer cent sums (the q120
    * machinery: order-independent, mergeable, bit-identical across
    * engines), the z closing is one IEEE expression, and the >3 gate
    * compares the same doubles both engines computed from the same
    * integers — no float-accumulation boundary flakes. Two passes over
    * events (moments, then probe) — at 100 TB the moment side is a
    * tiny broadcast. */
  def zscoreOutliers(s: SparkSession, dir: String): DataFrame = {
    val cents = Exact.cents(col("value"))
    val moments = t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(cents).cast("double").as("s1"),
        sum((cents * cents).cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("double").as("s2"))
      .select(col("event_type"), (col("s1") / col("n")).as("mean_c"),
        sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - lit(1.0)))
          .as("sd_c"))
    t(s, dir, "events")
      .join(broadcast(moments), Seq("event_type"))
      .withColumn("z", (cents.cast("double") - col("mean_c")) / col("sd_c"))
      .filter(abs(col("z")) > 3.0)
      .select(col("event_id"), col("event_type"),
        round(col("value"), 2).as("value"), round(col("z"), 6).as("z"))
      .orderBy("event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q122_recursive_hierarchy" -> (recursiveHierarchy _),
    "q123_bloom_pruned_join" -> (bloomPrunedJoin _),
    "q124_scd2_build" -> (scd2Build _),
    "q125_sliding_window" -> (slidingWindow _),
    "q126_column_profile" -> (columnProfile _),
    "q127_lateral_topk" -> (lateralTopPerGroup _),
    "q128_zscore_outliers" -> (zscoreOutliers _),
  )

  val oracle: Map[String, String] = Map(
    "q122_recursive_hierarchy" ->
      """WITH RECURSIVE walk(custkey, node, depth) AS (
        |  SELECT c_custkey, c_custkey, 0 FROM customer
        |  UNION ALL
        |  SELECT custkey, node // 10, depth + 1 FROM walk WHERE node >= 10)
        |SELECT custkey, max(depth) AS depth, min(node) AS root
        |FROM walk GROUP BY custkey ORDER BY custkey""".stripMargin,
    // bloom filters have no false negatives: the oracle is the PLAIN join
    "q123_bloom_pruned_join" ->
      """SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_lines,
        | CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0
        |  AS urgent_revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT' AND o_orderdate >= TIMESTAMP '1997-01-01'
        |GROUP BY day ORDER BY day""".stripMargin,
    "q124_scd2_build" ->
      """WITH marked AS (
        |  SELECT user_id, event_type, ts, event_id,
        |   lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |changes AS (
        |  SELECT user_id, event_type, ts, event_id FROM marked
        |  WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id, event_type, ts AS valid_from,
        | lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        | lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
        |FROM changes ORDER BY user_id, valid_from""".stripMargin,
    // each event covers the two hourly-aligned starts in (ts-2h, ts]
    "q125_sliding_window" ->
      """SELECT wstart AS win_start, count(*) AS n,
        | CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS total_value
        |FROM (SELECT value,
        |       unnest([date_trunc('hour', ts), date_trunc('hour', ts) - INTERVAL 1 HOUR])
        |        AS wstart
        |      FROM events)
        |GROUP BY wstart ORDER BY wstart""".stripMargin,
    "q126_column_profile" ->
      """SELECT * FROM (
        |  SELECT 'o_custkey' AS column_name, count(o_custkey) AS non_null,
        |   count(DISTINCT o_custkey) AS n_distinct,
        |   CAST(min(o_custkey) AS DOUBLE) AS min_num,
        |   CAST(max(o_custkey) AS DOUBLE) AS max_num,
        |   CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_totalprice', count(o_totalprice), count(DISTINCT o_totalprice),
        |   CAST(min(o_totalprice) AS DOUBLE), CAST(max(o_totalprice) AS DOUBLE),
        |   NULL, NULL
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', count(o_orderstatus), count(DISTINCT o_orderstatus),
        |   NULL, NULL, min(o_orderstatus), max(o_orderstatus)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderpriority', count(o_orderpriority), count(DISTINCT o_orderpriority),
        |   NULL, NULL, min(o_orderpriority), max(o_orderpriority)
        |  FROM orders)
        |ORDER BY column_name""".stripMargin,
    "q127_lateral_topk" ->
      """SELECT n.n_name, top.c_custkey, top.c_acctbal
        |FROM nation n,
        |LATERAL (
        |  SELECT c_custkey, c_acctbal FROM customer c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) top
        |ORDER BY n.n_name, top.c_acctbal DESC, top.c_custkey""".stripMargin,
    "q128_zscore_outliers" ->
      """WITH m AS (
        |  SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
        |   CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE) AS s1,
        |   CAST(sum(CAST(round(value*100) AS BIGINT)
        |          * CAST(round(value*100) AS BIGINT)) AS DOUBLE) AS s2
        |  FROM events GROUP BY event_type),
        |stats AS (
        |  SELECT event_type, s1/n AS mean_c,
        |   sqrt((s2 - s1*s1/n) / (n - 1.0)) AS sd_c
        |  FROM m)
        |SELECT e.event_id, e.event_type, round(e.value, 2) AS value,
        | round((CAST(round(e.value*100) AS BIGINT) - s.mean_c) / s.sd_c, 6) AS z
        |FROM events e JOIN stats s ON e.event_type = s.event_type
        |WHERE abs((CAST(round(e.value*100) AS BIGINT) - s.mean_c) / s.sd_c) > 3.0
        |ORDER BY e.event_id""".stripMargin,
  )
}
