package graft.sources.v2

import graft.SparkSpec
import org.apache.spark.sql.Row

/** The SQL DML front door (q208/q209) and the GraftLakeCatalog
  * contract behind it: a real MERGE INTO statement whose post-image
  * equals the hand-built q97 change-set application, UPDATE/DELETE
  * statements through the same row-level protocol, and versioned
  * time travel where an old snapshot is byte-stable under later
  * commits. */
class MergeSqlSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def lake(): org.apache.spark.sql.SparkSession = {
    val ss = org.apache.spark.sql.graft.SessionClone(spark)
    ss.conf.set("spark.sql.catalog.graft_lake", classOf[GraftLakeCatalog].getName)
    ss
  }

  test("q208: the MERGE INTO statement answers exactly what q97's DataFrame merge answers") {
    val viaSql = MergeQueries.sqlMergeInto(spark, sf).collect().toSeq
    val viaDf = graft.operators.CdcOps.cdcMerge(spark, sf).collect().toSeq
    assert(viaSql.nonEmpty)
    assert(viaSql === viaDf)
  }

  test("q209: VERSION AS OF 1 read after the merge equals the pre-merge seed") {
    import org.apache.spark.sql.functions._
    val v1 = MergeQueries.timeTravelRead(spark, sf).collect().toSeq
    val base = graft.Tables(spark, sf, "customer")
      .select(col("c_custkey").cast("long").as("c_custkey"), col("c_name"),
        (graft.operators.Exact.cents(col("c_acctbal")) / 100.0)
          .cast("double").as("c_acctbal"))
      .orderBy("c_custkey").collect().toSeq
    assert(v1 === base)
    // and the merged current state genuinely differs (v2 committed)
    val current = MergeQueries.sqlMergeInto(spark, sf).collect().toSeq
    assert(current !== v1)
  }

  test("MERGE effects: update, delete, and insert all took effect; carry-over intact") {
    val ss = lake()
    import ss.implicits._
    ss.sql("CREATE TABLE graft_lake.spec.fx (k BIGINT, name STRING, v BIGINT)")
    Seq((1L, "keep", 10L), (2L, "update_me", 20L), (3L, "delete_me", 30L))
      .toDF("k", "name", "v").writeTo("graft_lake.spec.fx").append()
    Seq((2L, "U", 99L), (3L, "D", 0L), (4L, "I", 40L))
      .toDF("k", "op", "nv").createOrReplaceTempView("fx_chg")
    ss.sql("""MERGE INTO graft_lake.spec.fx t USING fx_chg c ON t.k = c.k
             |WHEN MATCHED AND c.op = 'D' THEN DELETE
             |WHEN MATCHED THEN UPDATE SET v = c.nv
             |WHEN NOT MATCHED AND c.op = 'I' THEN
             |  INSERT (k, name, v) VALUES (c.k, 'ins', c.nv)""".stripMargin)
    val got = ss.sql("SELECT k, name, v FROM graft_lake.spec.fx ORDER BY k")
      .collect().toSeq
    assert(got === Seq(
      Row(1L, "keep", 10L),      // carry-over, untouched
      Row(2L, "update_me", 99L), // matched + U
      Row(4L, "ins", 40L)))      // not matched + I; k=3 deleted
  }

  test("UPDATE and DELETE statements run through the same row-level protocol") {
    val ss = lake()
    import ss.implicits._
    ss.sql("CREATE TABLE graft_lake.spec.dml (k BIGINT, v BIGINT)")
    Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
      .writeTo("graft_lake.spec.dml").append()
    ss.sql("UPDATE graft_lake.spec.dml SET v = v + 1 WHERE k <= 2")
    ss.sql("DELETE FROM graft_lake.spec.dml WHERE k = 3")
    val got = ss.sql("SELECT k, v FROM graft_lake.spec.dml ORDER BY k")
      .collect().toSeq
    assert(got === Seq(Row(1L, 11L), Row(2L, 21L)))
  }

  test("a snapshot is byte-stable under later commits; each commit is a new version") {
    val ss = lake()
    import ss.implicits._
    ss.sql("CREATE TABLE graft_lake.spec.tt (k BIGINT, v BIGINT)")
    Seq((1L, 10L), (2L, 20L)).toDF("k", "v").writeTo("graft_lake.spec.tt").append()
    val preWrite = ss.sql("SELECT * FROM graft_lake.spec.tt ORDER BY k").collect().toSeq
    ss.sql("UPDATE graft_lake.spec.tt SET v = 0")
    val v1AfterV2 = ss.sql(
      "SELECT * FROM graft_lake.spec.tt VERSION AS OF 1 ORDER BY k").collect().toSeq
    assert(v1AfterV2 === preWrite,
      "reading v1 after v2's write must be byte-identical to the pre-write read")
    val v2 = ss.sql(
      "SELECT * FROM graft_lake.spec.tt VERSION AS OF 2 ORDER BY k").collect().toSeq
    assert(v2 === Seq(Row(1L, 0L), Row(2L, 0L)))
    assert(v2 === ss.sql("SELECT * FROM graft_lake.spec.tt ORDER BY k").collect().toSeq)
    // v0 is the empty table at CREATE
    assert(ss.sql("SELECT * FROM graft_lake.spec.tt VERSION AS OF 0").count() === 0L)
  }

  test("unsupported corners fail loudly: TIMESTAMP AS OF, missing versions") {
    val ss = lake()
    import ss.implicits._
    ss.sql("CREATE TABLE graft_lake.spec.bad (k BIGINT)")
    Seq(Tuple1(1L)).toDF("k").writeTo("graft_lake.spec.bad").append()
    def msgs(t: Throwable): List[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) :: msgs(t.getCause)
    val e1 = intercept[Throwable](ss.sql(
      "SELECT * FROM graft_lake.spec.bad TIMESTAMP AS OF '2024-01-01'").collect())
    assert(msgs(e1).exists(_.contains("VERSION AS OF")), msgs(e1))
    val e2 = intercept[Throwable](ss.sql(
      "SELECT * FROM graft_lake.spec.bad VERSION AS OF 99").collect())
    assert(msgs(e2).exists(_.contains("no snapshot 99")), msgs(e2))
  }
}
