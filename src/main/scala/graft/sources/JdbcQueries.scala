package graft.sources

import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Exact

/** Declared query over the JDBC source/sink (SURVEY §2.1 S1/S2),
  * exercised end-to-end inside the correctness gate: the customer
  * table is written to an embedded Derby database (the reference's
  * MySQL stand-in — Derby ships with Spark), read back as a
  * PARTITIONED JDBC scan (4 range slices of c_custkey; without
  * partitioning a JDBC read is one task on one executor, the classic
  * cluster bottleneck), and aggregated. The oracle runs on the
  * original parquet: a database round-trip must never change the data.
  */
object JdbcQueries {

  /** One Derby database + load per (jvm, source dir); the database
    * directory is deleted on JVM exit so repeated runs don't
    * accumulate copies in /tmp. */
  private val loaded = new ConcurrentHashMap[String, Jdbc.JdbcConfig]()
  private val dbDirs = new ConcurrentHashMap[String, String]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    import scala.jdk.CollectionConverters._
    dbDirs.values.asScala.foreach { dir =>
      try {
        Files.walk(java.nio.file.Paths.get(dir))
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { Files.deleteIfExists(p); () })
      } catch { case _: Throwable => }
    }
  }))

  private def derbyFor(s: SparkSession, dir: String): Jdbc.JdbcConfig =
    loaded.computeIfAbsent(dir, { d =>
      val db = Files.createTempDirectory("graft_derby")
      dbDirs.put(dir, db.toString)
      val cfg = Jdbc.JdbcConfig(
        url = s"jdbc:derby:$db/graftdb;create=true",
        user = "", password = "",
        driver = "org.apache.derby.jdbc.EmbeddedDriver")
      Jdbc.write(
        Tables(s, d, "customer")
          .select("c_custkey", "c_nationkey", "c_acctbal"),
        cfg, "customer_rt", SaveMode.Overwrite)
      cfg
    })

  def jdbcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val cfg = derbyFor(s, dir)
    val maxKey = Tables(s, dir, "customer")
      .agg(max(col("c_custkey"))).head().getLong(0)
    Jdbc.readPartitioned(s, cfg, "customer_rt",
        partitionColumn = "c_custkey", lowerBound = 1L,
        upperBound = maxKey, numPartitions = 4)
      .groupBy(col("c_nationkey"))
      .agg(
        count(lit(1)).as("n_customers"),
        Exact.sumMoney(col("c_acctbal")).as("sum_acctbal"))
      .orderBy("c_nationkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q72_jdbc_roundtrip" -> (jdbcRoundtrip _))

  val oracle: Map[String, String] = Map(
    "q72_jdbc_roundtrip" ->
      """SELECT c_nationkey, count(*) AS n_customers,
        | sum(CAST(round(c_acctbal*100) AS BIGINT))/100.0 AS sum_acctbal
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
}
