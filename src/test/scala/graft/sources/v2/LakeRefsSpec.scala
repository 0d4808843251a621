package graft.sources.v2

import graft.SparkSpec
import org.apache.spark.sql.SparkSession

/** Named refs (tags) and orphan-file vacuum — the last two lifecycle
  * moves: a tag is an immutable name → version pointer that resolves
  * through `VERSION AS OF 'name'` and PINS its snapshot against
  * expiration; vacuum deletes data-dir files no retained manifest
  * references (crashed-writer leftovers) and nothing else. */
class LakeRefsSpec extends SparkSpec {

  private def lakeSession(cat: String, root: String): SparkSession = {
    val ss = spark.newSession()
    ss.conf.set(s"spark.sql.catalog.$cat", classOf[GraftLakeCatalog].getName)
    ss.conf.set(s"spark.sql.catalog.$cat.root", root)
    ss
  }

  test("a tag resolves through VERSION AS OF and pins its snapshot against expiration") {
    val root = graft.util.TempDirs.create("graft_refs_").toString
    val ss = lakeSession("ref", root)
    import ss.implicits._
    ss.sql("CREATE TABLE ref.ns.t (k BIGINT)")
    (0L until 90L).map(Tuple1(_)).toDF("k").coalesce(1).writeTo("ref.ns.t").append() // v1
    val handle = GraftLakeStore.get(root, "ns.t").get
    handle.createTag("baseline", 1)
    ss.sql("DELETE FROM ref.ns.t WHERE k % 3 = 0")                                   // v2
    ss.sql("INSERT INTO ref.ns.t VALUES (1000)")                                     // v3
    // the tag reads the pinned version by NAME
    assert(ss.sql("SELECT count(*) FROM ref.ns.t VERSION AS OF 'baseline'")
      .head().getLong(0) === 90L)
    // expiration keeps the tagged snapshot even though it is old
    val expired = handle.expireSnapshots(keepLast = 1)
    assert(expired === Seq(0, 2), s"v1 is tag-pinned, got expired=$expired")
    assert(ss.sql("SELECT count(*) FROM ref.ns.t VERSION AS OF 'baseline'")
      .head().getLong(0) === 90L)
    assert(ss.sql("SELECT count(*) FROM ref.ns.t").head().getLong(0) === 61L)
    // drop the tag: the next expiration collects the snapshot
    assert(handle.dropTag("baseline"))
    assert(handle.expireSnapshots(keepLast = 1) === Seq(1))
    val err = intercept[Exception](
      ss.sql("SELECT count(*) FROM ref.ns.t VERSION AS OF 1").collect())
    assert(err.getMessage.contains("expired"))
    // an unknown tag fails loudly with the available names
    val e2 = intercept[Exception](
      ss.sql("SELECT * FROM ref.ns.t VERSION AS OF 'nope'").collect())
    assert(e2.getMessage.contains("no tag or branch 'nope'"))
  }

  test("tags are immutable: re-tagging fails loudly, drop-then-retag moves the pointer") {
    val root = graft.util.TempDirs.create("graft_refs_imm_").toString
    val ss = lakeSession("rfi", root)
    ss.sql("CREATE TABLE rfi.ns.t (k BIGINT)")
    ss.sql("INSERT INTO rfi.ns.t VALUES (1)")
    val handle = GraftLakeStore.get(root, "ns.t").get
    handle.createTag("r1", 0)
    val e = intercept[IllegalStateException](handle.createTag("r1", 1))
    assert(e.getMessage.contains("immutable"))
    handle.dropTag("r1")
    handle.createTag("r1", 1)
    assert(handle.tags() === Map("r1" -> 1))
    // tagging a missing version fails loudly
    intercept[Exception](handle.createTag("r2", 99))
  }

  test("vacuum removes crashed-writer orphans and nothing else") {
    val root = graft.util.TempDirs.create("graft_refs_vac_").toString
    val ss = lakeSession("vac", root)
    import ss.implicits._
    ss.sql("CREATE TABLE vac.ns.t (k BIGINT) " +
      "TBLPROPERTIES ('write.dml.mode'='merge-on-read')")
    (0L until 50L).map(Tuple1(_)).toDF("k").coalesce(1).writeTo("vac.ns.t").append()
    ss.sql("DELETE FROM vac.ns.t WHERE k = 7") // a DV file: referenced, must stay
    val handle = GraftLakeStore.get(root, "ns.t").get
    // plant two orphans — a crashed writer's data file and DV file
    java.nio.file.Files.write(handle.dataDir.resolve("f-9-99-deadbeef.parquet"),
      "not a real parquet".getBytes("UTF-8"))
    java.nio.file.Files.write(handle.dataDir.resolve("dv-9-99-deadbeef.parquet"),
      "not a real parquet".getBytes("UTF-8"))
    val removed = handle.vacuumOrphans()
    assert(removed === Seq("dv-9-99-deadbeef.parquet", "f-9-99-deadbeef.parquet"))
    // every referenced file survived; the table still answers
    assert(ss.sql("SELECT count(*) FROM vac.ns.t").head().getLong(0) === 49L)
    assert(ss.sql("SELECT count(*) FROM vac.ns.t VERSION AS OF 1").head().getLong(0) === 50L)
    // idempotent: a second vacuum finds nothing
    assert(handle.vacuumOrphans() === Seq.empty)
  }
}
