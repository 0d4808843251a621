package graft.sources.v2

import graft.SparkSpec
import org.apache.spark.sql.{Row, SparkSession}

/** `CALL graft_lake.system.<proc>(...)` — lifecycle maintenance as SQL
  * statements through Spark's DSv2 procedure protocol, each returning
  * its effect as rows. */
class LakeProcedureSpec extends SparkSpec {

  private def lakeSession(cat: String, root: String): SparkSession = {
    val ss = spark.newSession()
    ss.conf.set(s"spark.sql.catalog.$cat", classOf[GraftLakeCatalog].getName)
    ss.conf.set(s"spark.sql.catalog.$cat.root", root)
    ss
  }

  test("CALL expire_snapshots / create_tag / drop_tag / vacuum, effects and outputs") {
    val root = graft.util.TempDirs.create("graft_proc_").toString
    val ss = lakeSession("prc", root)
    import ss.implicits._
    ss.sql("CREATE TABLE prc.ns.t (k BIGINT)")
    (0L until 30L).map(Tuple1(_)).toDF("k").coalesce(1).writeTo("prc.ns.t").append()
    ss.sql("DELETE FROM prc.ns.t WHERE k % 3 = 0")

    // tag the seed by STATEMENT, read it back through VERSION AS OF
    assert(ss.sql("CALL prc.system.create_tag(table => 'ns.t', tag => 'seed', version => 1)")
      .collect().toSeq === Seq(Row("seed", 1)))
    assert(ss.sql("SELECT count(*) FROM prc.ns.t VERSION AS OF 'seed'")
      .head().getLong(0) === 30L)

    // expire: the tag pins v1, only v0 goes; the output reports it
    assert(ss.sql("CALL prc.system.expire_snapshots(table => 'ns.t', keep_last => 1)")
      .collect().toSeq === Seq(Row(0)))
    assert(ss.sql("SELECT count(*) FROM prc.ns.t VERSION AS OF 'seed'")
      .head().getLong(0) === 30L)

    // drop the tag by statement; the next expire collects v1
    assert(ss.sql("CALL prc.system.drop_tag(table => 'ns.t', tag => 'seed')")
      .collect().toSeq === Seq(Row(true)))
    assert(ss.sql("CALL prc.system.expire_snapshots(table => 'ns.t', keep_last => 1)")
      .collect().toSeq === Seq(Row(1)))

    // vacuum: plant an orphan — the DEFAULT min_age_seconds (an hour)
    // must protect it (an in-flight write's files look exactly like
    // this); the explicit maintenance-window 0 removes it
    val handle = GraftLakeStore.get(root, "ns.t").get
    java.nio.file.Files.write(handle.dataDir.resolve("f-0-0-orphan.parquet"),
      "junk".getBytes("UTF-8"))
    assert(ss.sql("CALL prc.system.vacuum(table => 'ns.t')").collect().isEmpty,
      "a fresh unreferenced file must survive the default age guard")
    assert(ss.sql("CALL prc.system.vacuum(table => 'ns.t', min_age_seconds => 0)")
      .collect().toSeq === Seq(Row("f-0-0-orphan.parquet")))
    assert(ss.sql("CALL prc.system.vacuum(table => 'ns.t', min_age_seconds => 0)")
      .collect().isEmpty)
    assert(ss.sql("SELECT count(*) FROM prc.ns.t").head().getLong(0) === 20L)

    // positional args work too; unknown procedures fail loudly
    assert(ss.sql("CALL prc.system.create_tag('ns.t', 'v2', 2)")
      .collect().toSeq === Seq(Row("v2", 2)))
    val e = intercept[Exception](ss.sql("CALL prc.system.nope('ns.t')").collect())
    assert(e.getMessage.contains("FAILED_TO_LOAD_ROUTINE") ||
      e.getMessage.contains("no procedure 'nope'"), e.getMessage)
  }
}
