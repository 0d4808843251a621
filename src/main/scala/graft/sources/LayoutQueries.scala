package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Exact

/** Declared queries over ParquetLayout-written physical layouts — the
  * round-trip proof that the storage-side design actually prunes.
  *
  * q65 writes `orders` hive-partitioned by month, then answers a
  * 3-month question from the partitioned copy. Semantically identical
  * to the same aggregate over the original table (the DuckDB oracle),
  * but the physical plan reads 3 directories instead of the full
  * table — `PartitionFilters` in the scan, pinned by LayoutSpec. At
  * 100 TB this is the difference between scanning ~84 months and the
  * 3 the query asks about; the write itself is the one-off layout cost
  * a fact table pays to make every later time-range query cheap.
  */
object LayoutQueries {

  /** One write per (jvm, source dir): queries must be re-runnable and
    * concurrent suites must not race on the overwrite. */
  private val written = new ConcurrentHashMap[String, String]()

  private def monthlyOrdersPath(s: SparkSession, dir: String): String = {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_orders_by_month_" +
      Integer.toHexString(dir.hashCode)
    written.computeIfAbsent(path, { p =>
      ParquetLayout.writePartitioned(
        Tables(s, dir, "orders")
          .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM")),
        p, Seq("o_month"))
      p
    })
  }

  /** The partition-pruned read: only the 1995-01..1995-03 directories
    * are listed and scanned. */
  def partitionPrunedScan(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(monthlyOrdersPath(s, dir))
      .filter(col("o_month").between("1995-01", "1995-03"))
      .groupBy(col("o_month"))
      .agg(
        count(lit(1)).as("n_orders"),
        Exact.sumMoney(col("o_totalprice")).as("sum_total"))
      .orderBy(col("o_month"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q65_partition_pruning" -> (partitionPrunedScan _))

  /** Oracle runs on the ORIGINAL orders table — partitioning must not
    * change the answer, only the IO. */
  val oracle: Map[String, String] = Map(
    "q65_partition_pruning" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS o_month, count(*) AS n_orders,
        | sum(CAST(round(o_totalprice*100) AS BIGINT))/100.0 AS sum_total
        |FROM orders
        |WHERE strftime(o_orderdate, '%Y-%m') BETWEEN '1995-01' AND '1995-03'
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
