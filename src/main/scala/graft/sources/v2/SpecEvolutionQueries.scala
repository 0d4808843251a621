package graft.sources.v2

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Exact

/** Partition-spec evolution (q234) — the one lake-format migration a
  * growing 100 TB table actually hits: the table outgrows its original
  * partitioning and is RE-PARTITIONED WITHOUT REWRITING HISTORY.
  *
  *  - `CALL graft_lake.system.add_partition_field / drop_partition_field`
  *    commit METADATA ONLY: one manifest write, zero data files touched.
  *  - Files written before the change keep the partition values of the
  *    spec they were written under and PRUNE BY THOSE; files written
  *    after carry the new spec's values. The scan evaluates partition
  *    predicates per file — exactly where the value exists, by column
  *    stats where it does not (old-spec files recorded min/max for the
  *    new column like any data column, so neither era is ever scanned
  *    blind).
  *  - Old snapshots time-travel under their old spec (`partitionCols`
  *    is per-snapshot, like schema).
  *  - Grouped manifest-COUNT pushdown and exact residual-free partition
  *    pruning disable themselves while the spec is mixed; compaction
  *    (INSERT OVERWRITE) re-unifies the spec and restores both.
  *
  * q234 stages a mid-history re-partitioned orders table — era A (1995)
  * under PARTITIONED BY (status), era B (1996) under (prio) — and the
  * declared read aggregates across the boundary; the oracle is a plain
  * rollup over raw orders, blind to any partitioning. Reference analog:
  * none (the reference overwrites whole unpartitioned tables,
  * src/data_processor.py:237-269) — capability-rounding on the lake.
  */
object SpecEvolutionQueries {

  private val staged = new ConcurrentHashMap[String, String]()
  private val nextId = new AtomicInteger()

  private[v2] def ensureSpecEvolution(s: SparkSession, dir: String): String = {
    val key = s.sparkContext.applicationId + ":" + dir
    staged.computeIfAbsent(key, { _ =>
      val ss = MergeQueries.lakeSession(s)
      val id = nextId.incrementAndGet()
      val tbl = s"lake.ord_spec$id"
      ss.sql(s"CREATE TABLE graft_lake.$tbl (od STRING, status STRING, " +
        "prio STRING, price_cents BIGINT) PARTITIONED BY (status)")
      def era(from: String, until: String): DataFrame =
        Tables(ss, dir, "orders")
          .filter(col("o_orderdate") >= lit(from) && col("o_orderdate") < lit(until))
          .select(col("o_orderdate").cast("string").as("od"),
            col("o_orderstatus").as("status"),
            col("o_orderpriority").as("prio"),
            Exact.cents(col("o_totalprice")).as("price_cents"))
      // v1: era A under the ORIGINAL spec (status)
      era("1995-01-01", "1996-01-01").writeTo(s"graft_lake.$tbl").append()
      // v2/v3: the migration — two metadata-only commits
      ss.sql("CALL graft_lake.system.add_partition_field(" +
        s"table => '$tbl', column => 'prio')")
      ss.sql("CALL graft_lake.system.drop_partition_field(" +
        s"table => '$tbl', column => 'status')")
      // v4: era B under the NEW spec (prio)
      era("1996-01-01", "1997-01-01").writeTo(s"graft_lake.$tbl").append()

      // loud staging contract: metadata-only migration, per-era specs
      val h = GraftLakeStore.get(GraftLakeStore.defaultRoot, tbl).get
      require(h.snapshot(3).files.map(_.path) == h.snapshot(1).files.map(_.path),
        "partition-spec evolution must carry every data file untouched")
      require(h.snapshot(1).partitionCols == Seq("status") &&
          h.snapshot(3).partitionCols == Seq("prio"),
        "per-snapshot spec: v1 under (status), v3 under (prio)")
      val files = h.snapshot(4).files
      require(files.exists(_.partition.keySet == Set("status")) &&
          files.exists(_.partition.keySet == Set("prio")),
        "both eras must keep the partition values of their OWN spec")
      s"graft_lake.$tbl"
    })
  }

  /** q234: rollup across the spec boundary with a filter on the OLD
    * partition column — era A prunes it exactly by partition value,
    * era B conservatively by stats; both eras' rows aggregate into one
    * answer the raw-table oracle must reproduce. */
  def specEvolutionRead(s: SparkSession, dir: String): DataFrame = {
    val tbl = ensureSpecEvolution(s, dir)
    MergeQueries.lakeSession(s).sql(
      s"""SELECT status, prio, count(*) AS n_orders,
         | CAST(sum(price_cents) / 100.0 AS DOUBLE) AS total_price
         |FROM $tbl WHERE status = 'F'
         |GROUP BY status, prio ORDER BY status, prio""".stripMargin)
  }

  private val stagedTf = new ConcurrentHashMap[String, String]()

  /** Staging for q237: orders H2-1995 into a HIDDEN-partitioned table —
    * `bucket(8, ckey)` for point lookups without value explosion,
    * `truncate(7, od)` for month partitioning straight off the ISO
    * string (no calendar in the manifest). Repartition(2) bounds the
    * file count to tasks × buckets × months at every sf. */
  private[v2] def ensureTransformTable(s: SparkSession, dir: String): String = {
    val key = s.sparkContext.applicationId + ":" + dir
    stagedTf.computeIfAbsent(key, { _ =>
      val ss = MergeQueries.lakeSession(s)
      val id = nextId.incrementAndGet()
      val tbl = s"lake.ord_tf$id"
      ss.sql(s"CREATE TABLE graft_lake.$tbl (od STRING, ckey BIGINT, " +
        "price_cents BIGINT) PARTITIONED BY (bucket(8, ckey), truncate(7, od))")
      Tables(ss, dir, "orders")
        .filter(col("o_orderdate") >= lit("1995-07-01") &&
          col("o_orderdate") < lit("1996-01-01"))
        .select(col("o_orderdate").cast("string").as("od"),
          col("o_custkey").cast("long").as("ckey"),
          Exact.cents(col("o_totalprice")).as("price_cents"))
        .repartition(2)
        .writeTo(s"graft_lake.$tbl").append()
      val h = GraftLakeStore.get(GraftLakeStore.defaultRoot, tbl).get
      require(h.snapshot(1).files.forall(
          _.partition.keySet == Set("ckey_bucket_8", "od_truncate_7")),
        "every file must carry both transform values")
      s"graft_lake.$tbl"
    })
  }

  /** q237: a month-range rollup (prunes by the truncate field — floor/
    * prefix transforms are monotone, so ranges prune) plus a key point
    * lookup (prunes to one bucket's files) — the two access patterns
    * hidden partitioning exists for, against a raw-orders oracle. */
  def transformPartitionRead(s: SparkSession, dir: String): DataFrame = {
    val tbl = ensureTransformTable(s, dir)
    MergeQueries.lakeSession(s).sql(
      s"""SELECT concat('month:', substr(od, 1, 7)) AS grp,
         | count(*) AS n_orders,
         | CAST(sum(price_cents) / 100.0 AS DOUBLE) AS total_price
         |FROM $tbl WHERE od >= '1995-10-01'
         |GROUP BY substr(od, 1, 7)
         |UNION ALL
         |SELECT 'cust:42' AS grp, count(*) AS n_orders,
         | CAST(sum(price_cents) / 100.0 AS DOUBLE) AS total_price
         |FROM $tbl WHERE ckey = 42
         |ORDER BY grp""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q234_partition_evolution" -> (specEvolutionRead _),
    "q237_transform_partitioning" -> (transformPartitionRead _))

  val oracle: Map[String, String] = Map(
    // plain rollup over raw orders, blind to partitioning: correct only
    // if BOTH eras read completely and correctly across the spec change
    "q234_partition_evolution" ->
      """SELECT o_orderstatus AS status, o_orderpriority AS prio,
        | count(*) AS n_orders,
        | CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) / 100.0 AS DOUBLE)
        |  AS total_price
        |FROM orders
        |WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1997-01-01'
        | AND o_orderstatus = 'F'
        |GROUP BY status, prio ORDER BY status, prio""".stripMargin,
    // the staged universe is H2-1995; the range arm narrows to Q4 and
    // the point arm reads one key — hidden partitioning must change
    // NOTHING about the answer (the transforms live only in the layout)
    "q237_transform_partitioning" ->
      """SELECT concat('month:', substr(CAST(o_orderdate AS STRING), 1, 7)) AS grp,
        | count(*) AS n_orders,
        | CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) / 100.0 AS DOUBLE)
        |  AS total_price
        |FROM orders
        |WHERE o_orderdate >= '1995-10-01' AND o_orderdate < '1996-01-01'
        |GROUP BY substr(CAST(o_orderdate AS STRING), 1, 7)
        |UNION ALL
        |SELECT 'cust:42' AS grp, count(*) AS n_orders,
        | CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) / 100.0 AS DOUBLE)
        |  AS total_price
        |FROM orders
        |WHERE o_custkey = 42
        | AND o_orderdate >= '1995-07-01' AND o_orderdate < '1996-01-01'
        |ORDER BY grp""".stripMargin)
}
