package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-5 surface extensions: the four remaining TPC-H idioms
  * expressible on these fixtures without a partsupp table — Q7 (volume
  * shipping between nation pairs), Q8 (national market share), Q10
  * (returned-item reporting), Q12 (priority counts by conditional
  * aggregation). Reference analog: none as literal queries (the
  * reference runs no TPC-H); these are the highest-frequency real-user
  * join/aggregate shapes on a star schema, per the round-4 review.
  *
  * Fixture adaptations, declared here once: the fixture lineitem has no
  * l_shipmode / l_commitdate / l_receiptdate, so Q12's shipmode becomes
  * l_returnflag (three values, two selected — same two-group CASE
  * aggregation) and its commit-vs-receipt lateness becomes a ship-lag
  * predicate (l_shipdate ≥ 90 days after o_orderdate). Q7/Q8's named
  * nations/regions/types use this fixture's vocabulary (NATION_n,
  * ASIA, STANDARD); dates sit inside the 1995-2001 span.
  *
  * Exactness contract as everywhere in the repo: revenue in exact
  * cent·percent longs (order-independent sums), ratios closed by ONE
  * IEEE division rounded to 6dp, counts as longs, every output totally
  * ordered.
  */
object Tpch2Queries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** Exact cent·percent revenue: sum(cents(price) · (100 − cents(disc))). */
  private def revenueExact: Column =
    sum(Exact.cents(col("l_extendedprice")) * (lit(100L) - Exact.cents(col("l_discount")))) / lit(10000.0)

  /** TPC-H Q7 (volume shipping): revenue flowing between a nation PAIR
    * in either direction, by ship year. The interesting predicate is the
    * pair condition — (supp=A ∧ cust=B) ∨ (supp=B ∧ cust=A) crosses the
    * two dimension arms, so no single join can evaluate it; what CAN
    * push down is the union of its supports: each nation dim is
    * pre-filtered to {A, B} (broadcast, and on a cluster the join
    * against the reduced dim semi-reduces supplier/customer before the
    * fact shuffle), leaving only the cross-arm OR as a post-join
    * residual on already-tiny intermediate rows. One fact-fact shuffle
    * (lineitem⋈orders); everything else broadcasts. */
  def tpchQ7(s: SparkSession, dir: String, nationA: String = "NATION_11",
      nationB: String = "NATION_19"): DataFrame = {
    val pair = Seq(nationA, nationB)
    val n1 = broadcast(t(s, dir, "nation").filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
    val n2 = broadcast(t(s, dir, "nation").filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(n1, col("s_nationkey") === col("s_nk"))
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(n2, col("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === nationA && col("cust_nation") === nationB) ||
        (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(revenueExact.as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q8 (national market share): of all ASIA-customer revenue in
    * STANDARD-type parts, the fraction supplied from NATION_1, by order
    * year — the two-level aggregate-of-join shape (an inner per-row
    * classification folded by an outer ratio-of-sums). Both numerator
    * and denominator come out of ONE aggregation pass (conditional sum
    * over the same exact cent·percent longs), so the "two levels"
    * cost one fact-fact shuffle + one group-by, not two query trees.
    * The part-type filter semi-reduces lineitem via the broadcast dim
    * before the orders shuffle. The share is a single IEEE division of
    * two exact longs, rounded to 6dp. */
  def tpchQ8(s: SparkSession, dir: String, nation: String = "NATION_1",
      region: String = "ASIA", ptype: String = "STANDARD"): DataFrame = {
    val volume = Exact.cents(col("l_extendedprice")) *
      (lit(100L) - Exact.cents(col("l_discount")))
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part").filter(col("p_type") === ptype)),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("s_nk"))
      .join(t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")).filter(col("r_name") === region),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        sum(when(col("supp_nation") === nation, volume).otherwise(0L)).as("nat_vol"),
        sum(volume).as("all_vol"))
      .select(col("o_year"),
        round(col("nat_vol") / col("all_vol"), 6).as("mkt_share"))
      .orderBy("o_year")
  }

  /** TPC-H Q10 (returned-item reporting): the top-20 customers by
    * revenue lost to returns in one quarter. Plan pins: the quarter
    * filter pushes into the orders scan, the returnflag filter into the
    * lineitem scan, customer/nation broadcast, and the final top-20 is
    * a TakeOrderedAndProject — no global sort materializes at any
    * scale. Revenue in exact units with c_custkey tie-break, so the
    * top-20 cut is engine-exact. */
  def tpchQ10(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .join(t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(revenueExact.as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  /** TPC-H Q12 (priority counts, fixture-adapted — see object scaladoc):
    * for the two selected returnflag classes, how many LATE lines
    * (shipped ≥ 90 days after the order date) carried urgent/high
    * order priority vs not, over one ship year. The canonical
    * conditional-aggregation shape: one fact-fact join, one group-by,
    * the priority split as two CASE sums in the same pass. The ship-lag
    * predicate references both sides, so it evaluates as a join
    * residual; the year + returnflag filters push into the lineitem
    * scan. */
  def tpchQ12(s: SparkSession, dir: String): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    t(s, dir, "lineitem")
      .filter(col("l_returnflag").isin("R", "A") &&
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("l_returnflag")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q178_tpch_q7" -> ((s: SparkSession, d: String) => tpchQ7(s, d)),
    "q179_tpch_q8" -> ((s: SparkSession, d: String) => tpchQ8(s, d)),
    "q180_tpch_q10" -> (tpchQ10 _),
    "q181_tpch_q12" -> (tpchQ12 _),
  )

  private val revenueSql =
    "sum(CAST(round(l_extendedprice*100) AS BIGINT)*(100 - CAST(round(l_discount*100) AS BIGINT)))/10000.0"

  val oracle: Map[String, String] = Map(
    "q178_tpch_q7" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        | year(l_shipdate) AS l_year, $revenueSql AS revenue
        |FROM lineitem
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation n1 ON s_nationkey = n1.n_nationkey
        | JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND ((n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_19')
        |    OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_11'))
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q179_tpch_q8" ->
      """WITH base AS (
        | SELECT year(o_orderdate) AS o_year, n1.n_name AS supp_nation,
        |  CAST(round(l_extendedprice*100) AS BIGINT)*(100 - CAST(round(l_discount*100) AS BIGINT)) AS volume
        | FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  JOIN region ON n2.n_regionkey = r_regionkey
        | WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
        |   AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01')
        |SELECT o_year,
        | round(CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END) AS DOUBLE)
        |   / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
        |FROM base GROUP BY o_year ORDER BY o_year""".stripMargin,
    "q180_tpch_q10" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name, $revenueSql AS revenue
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q181_tpch_q12" ->
      """SELECT l_returnflag,
        | count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) AS high_line_count,
        | count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_returnflag IN ('R', 'A')
        |  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate >= o_orderdate + INTERVAL 90 DAY
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  )
}
