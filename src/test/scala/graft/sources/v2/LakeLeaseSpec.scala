package graft.sources.v2

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import graft.SparkSpec
import org.apache.spark.sql.SparkSession

/** Cross-process maintenance lease: expire/vacuum take a file lease
  * (`maintenance.lock`, hard-linked holder id) so two maintenance
  * daemons on one table cannot interleave across processes. Pins:
  *
  *  - a FRESH foreign lease blocks maintenance loudly after the bounded
  *    wait (never silent interleaving, never takeover of a live lease);
  *  - a STALE lease (dead holder) is taken over and maintenance
  *    proceeds — documented crash recovery;
  *  - normal maintenance leaves no lease behind, and the lease file is
  *    invisible to the data-dir vacuum and the manifest listing.
  */
class LakeLeaseSpec extends SparkSpec {

  private def lakeSession(cat: String, root: String): SparkSession = {
    val ss = spark.newSession()
    ss.conf.set(s"spark.sql.catalog.$cat", classOf[GraftLakeCatalog].getName)
    ss.conf.set(s"spark.sql.catalog.$cat.root", root)
    ss
  }

  private def withProps(wait: Long, stale: Long)(f: => Unit): Unit = {
    System.setProperty("graft.lake.maintenanceLeaseWaitMs", wait.toString)
    System.setProperty("graft.lake.maintenanceLeaseStaleMs", stale.toString)
    try f
    finally {
      System.clearProperty("graft.lake.maintenanceLeaseWaitMs")
      System.clearProperty("graft.lake.maintenanceLeaseStaleMs")
    }
  }

  test("maintenance lease: fresh foreign lease blocks loudly; stale lease is taken over") {
    val root = graft.util.TempDirs.create("graft_lease_").toString
    val ss = lakeSession("lse", root)
    import ss.implicits._
    ss.sql("CREATE TABLE lse.ns.t (k BIGINT)")
    Seq(1L, 2L).toDF("k").coalesce(1).writeTo("lse.ns.t").append() // v1
    Seq(3L).toDF("k").coalesce(1).writeTo("lse.ns.t").append()     // v2
    val h = GraftLakeStore.get(root, "ns.t").get
    val lock = h.tableDir.resolve("maintenance.lock")

    withProps(wait = 300L, stale = 60000L) {
      // a FRESH foreign lease (another process, alive): block loudly
      Files.write(lock, "foreign-holder".getBytes("UTF-8"))
      val e = intercept[IllegalStateException](h.expireSnapshots(keepLast = 1))
      assert(e.getMessage.contains("maintenance lease held"))
      assert(new String(Files.readAllBytes(lock), "UTF-8") === "foreign-holder",
        "a live foreign lease must never be taken over")
      // vacuum takes the same lease
      assert(intercept[IllegalStateException](h.vacuumOrphans())
        .getMessage.contains("maintenance lease held"))
      Files.delete(lock)

      // a STALE lease (holder died mid-maintenance): take over, proceed
      Files.write(lock, "dead-holder".getBytes("UTF-8"))
      Files.setLastModifiedTime(lock,
        FileTime.fromMillis(System.currentTimeMillis() - 120000L))
      val expired = h.expireSnapshots(keepLast = 1)
      assert(expired === Seq(0, 1), "takeover must let maintenance run")
      assert(!Files.exists(lock), "the taken-over lease is released")

      // normal maintenance: runs and leaves no lease behind
      h.vacuumOrphans()
      assert(!Files.exists(lock))
    }
    // the table still reads correctly after the maintenance round
    assert(ss.sql("SELECT count(*) FROM lse.ns.t").head().getLong(0) === 3L)
  }
}
