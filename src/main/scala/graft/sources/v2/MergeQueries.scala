package graft.sources.v2

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Exact

/** SQL DML front door: a real `MERGE INTO` statement executed against a
  * [[GraftLakeCatalog]] table, plus a `VERSION AS OF` time-travel read
  * of the pre-merge snapshot.
  *
  * q97 (operators/CdcOps.scala) implements MERGE *semantics* as a
  * DataFrame full-outer join; these queries run the *statement* — the
  * warehouse user's actual first mutation — through Spark's own
  * RewriteMergeIntoTable rule and the catalog's group-based row-level
  * write, against the SAME deterministic change-set. q208's DuckDB
  * oracle is q97's oracle verbatim: the statement path must answer
  * exactly what the hand-built join answers, or one of them is wrong.
  *
  * Staging is memoized per (application, source dir) — the
  * CboQueries device: v0 = CREATE, v1 = seed INSERT of `customer`
  * (money as integer cents, Exact.cents, so the merged balance is
  * bit-identical to the oracle's), v2 = MERGE. Every declared call
  * then READS: q208 the current snapshot, q209 snapshot v1 — which, by
  * construction, is read only AFTER v2 exists, the actual time-travel
  * contract (a pinned reader is unaffected by later commits).
  *
  * 100 TB shape: the MERGE executes as one co-partitioned shuffle of
  * base and changes plus a rewrite of affected groups — the identical
  * plan q97 carries, now planned by Spark's rewrite rules instead of by
  * hand. The catalog confs live on a session clone; nothing leaks into
  * the caller's session.
  */
object MergeQueries {

  private val staged = new ConcurrentHashMap[String, String]()
  private val nextId = new AtomicInteger()

  private val catalogConf = "spark.sql.catalog.graft_lake"

  /** A clone with the lake catalog registered — per call, so the
    * caller's session conf is never touched. */
  private[v2] def lakeSession(s: SparkSession): SparkSession = {
    val ss = org.apache.spark.sql.graft.SessionClone(s)
    ss.conf.set(catalogConf, classOf[GraftLakeCatalog].getName)
    ss
  }

  /** Seed `tbl` (which must already exist with the customer_m shape)
    * with the base table and run q97's change-set MERGE against it —
    * the deterministic staging both the copy-on-write (q208) and
    * merge-on-read (q225) front doors share, so the two write
    * strategies answer the SAME oracle. */
  private[v2] def seedAndMerge(ss: SparkSession, dir: String, tbl: String,
      id: Int): Unit = {
    // v1: seed with the base table, money in integer cents
    Tables(ss, dir, "customer")
      .select(col("c_custkey").cast("long").as("c_custkey"), col("c_name"),
        Exact.cents(col("c_acctbal")).as("bal_cents"))
      .writeTo(tbl).append()
    // q97's change-set, verbatim: per customer with 1995 orders,
    // DELETE when the max status is 'F' else UPDATE adding the
    // year's spend; INSERTs in the negative key space (collision-free
    // at every scale factor)
    val chg = s"graft_lake_chg$id"
    Tables(ss, dir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01") &&
        col("o_orderdate") < lit("1996-01-01"))
      .groupBy(col("o_custkey").cast("long").as("k"))
      .agg(
        when(max(col("o_orderstatus")) === "F", lit("D")).otherwise(lit("U")).as("op"),
        sum(Exact.cents(col("o_totalprice"))).as("delta_cents"))
      .unionByName(Tables(ss, dir, "customer")
        .filter(col("c_custkey") % 97 === 0)
        .select((-col("c_custkey").cast("long") - 1L).as("k"),
          lit("I").as("op"), lit(0L).as("delta_cents")))
      .createOrReplaceTempView(chg)
    // v2: the statement under test. Clause order mirrors standard
    // MERGE semantics: matched+D deletes, matched otherwise updates,
    // unmatched inserts ONLY the 'I' rows (an unmatched U/D change
    // has nothing to update/delete), unmatched target rows carry over
    ss.sql(
      s"""MERGE INTO $tbl t USING $chg c ON t.c_custkey = c.k
         |WHEN MATCHED AND c.op = 'D' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET bal_cents = t.bal_cents + c.delta_cents
         |WHEN NOT MATCHED AND c.op = 'I' THEN
         |  INSERT (c_custkey, c_name, bal_cents)
         |  VALUES (c.k, concat('new#', CAST(c.k AS STRING)), c.delta_cents)
         |""".stripMargin)
  }

  /** Returns the staged table's fully qualified name; first caller per
    * (application, dir) runs CREATE → seed INSERT → MERGE INTO. */
  private[v2] def ensureStaged(s: SparkSession, dir: String): String = {
    val key = s.sparkContext.applicationId + ":" + dir
    staged.computeIfAbsent(key, { _ =>
      val ss = lakeSession(s)
      val id = nextId.incrementAndGet()
      val tbl = s"graft_lake.lake.customer_m$id"
      ss.sql(s"CREATE TABLE $tbl (c_custkey BIGINT, c_name STRING, bal_cents BIGINT)")
      seedAndMerge(ss, dir, tbl, id)
      tbl
    })
  }

  /** q208: the post-MERGE table, read back through the catalog. */
  def sqlMergeInto(s: SparkSession, dir: String): DataFrame = {
    val tbl = ensureStaged(s, dir)
    lakeSession(s).sql(
      s"""SELECT c_custkey, c_name,
         | CAST(bal_cents / 100.0 AS DOUBLE) AS c_acctbal
         |FROM $tbl ORDER BY c_custkey""".stripMargin)
  }

  /** q209: snapshot v1 (the seed), read AFTER the merge committed v2 —
    * must equal the pre-merge base exactly. */
  def timeTravelRead(s: SparkSession, dir: String): DataFrame = {
    val tbl = ensureStaged(s, dir)
    lakeSession(s).sql(
      s"""SELECT c_custkey, c_name,
         | CAST(bal_cents / 100.0 AS DOUBLE) AS c_acctbal
         |FROM $tbl VERSION AS OF 1 ORDER BY c_custkey""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q208_sql_merge_into" -> (sqlMergeInto _),
    "q209_time_travel" -> (timeTravelRead _))

  val oracle: Map[String, String] = Map(
    // q97's oracle verbatim (CdcOps.scala): statement path and
    // DataFrame path must agree to the byte
    "q208_sql_merge_into" -> graft.operators.CdcOps.oracle("q97_cdc_merge"),
    // v1 == the base table with cents-rounded balances
    "q209_time_travel" ->
      """SELECT c_custkey, c_name,
        | CAST(CAST(round(c_acctbal*100) AS BIGINT) / 100.0 AS DOUBLE) AS c_acctbal
        |FROM customer ORDER BY c_custkey""".stripMargin)
}
