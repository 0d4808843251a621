package graft.sources.v2

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import GraftLakeStore.PartField

/** Hidden (transform) partitioning — bucket[N] and truncate[W] beside
  * identity. The pins:
  *
  *  - the writer and the planner share ONE transform implementation
  *    (LakeTransforms): files land exactly where pruning expects them;
  *  - bucket: point lookups (=, IN) keep only the matching bucket's
  *    files; ranges fall through to column stats (hashes are not
  *    monotone);
  *  - truncate: equality AND ranges prune (floor/prefix are monotone);
  *    truncate[7] over ISO date strings is month partitioning;
  *  - NULL source values land in the NULL partition and never match a
  *    non-null literal;
  *  - grouped manifest-COUNT pushdown never fires for a transform
  *    field's source column (per-file source values are not total);
  *  - spec evolution composes: add_partition_field with a transform.
  */
class LakeTransformSpec extends SparkSpec {

  private def lakeSession(cat: String, root: String): SparkSession = {
    val ss = spark.newSession()
    ss.conf.set(s"spark.sql.catalog.$cat", classOf[GraftLakeCatalog].getName)
    ss.conf.set(s"spark.sql.catalog.$cat.root", root)
    ss
  }

  test("bucket + truncate partitioning: placement matches pruning, point and range") {
    val root = graft.util.TempDirs.create("graft_tf_").toString
    val ss = lakeSession("ltf", root)
    import ss.implicits._
    ss.sql("CREATE TABLE ltf.ns.t (k BIGINT, od STRING, v BIGINT) " +
      "PARTITIONED BY (bucket(4, k), truncate(7, od))")
    val rows = for (k <- 0L until 20L; m <- Seq("1995-01", "1995-02", "1995-03"))
      yield (k, s"$m-15", k * 100L)
    rows.toDF("k", "od", "v").coalesce(1).writeTo("ltf.ns.t").append() // v1
    val h = GraftLakeStore.get(root, "ns.t").get
    val files = h.snapshot(1).files
    assert(files.forall(_.partition.keySet == Set("k_bucket_4", "od_truncate_7")))
    // one writer task: one file per (bucket, month) value pair
    val buckets = (0L until 20L).map(k =>
      LakeTransforms.bucket(java.lang.Long.valueOf(k), 4)).distinct.sorted
    assert(files.size === buckets.size * 3)

    // point lookup on the bucketed key: only that bucket's files read
    val point = ss.sql("SELECT v FROM ltf.ns.t WHERE k = 7")
    assert(point.rdd.getNumPartitions === 3, "one bucket x three months")
    assert(point.collect().map(_.getLong(0)).toSeq === Seq(700L, 700L, 700L))
    // IN over two keys in (possibly) two buckets
    val b7 = LakeTransforms.bucket(java.lang.Long.valueOf(7L), 4)
    val b8 = LakeTransforms.bucket(java.lang.Long.valueOf(8L), 4)
    val expBuckets = Set(b7, b8).size
    assert(ss.sql("SELECT v FROM ltf.ns.t WHERE k IN (7, 8)")
      .rdd.getNumPartitions === expBuckets * 3)

    // truncate equality: one month's files only (all four buckets)
    val month = ss.sql("SELECT count(*) FROM ltf.ns.t WHERE od = '1995-02-15'")
    assert(month.head().getLong(0) === 20L)
    assert(ss.sql("SELECT v FROM ltf.ns.t WHERE od = '1995-02-15'")
      .rdd.getNumPartitions === buckets.size)
    // truncate range: months >= 1995-02 → two of three months survive
    val range = ss.sql("SELECT k FROM ltf.ns.t WHERE od >= '1995-02-01'")
    assert(range.rdd.getNumPartitions === buckets.size * 2)
    assert(range.count() === 40L)
    // conjunction composes: one bucket x one month (a value no row
    // holds, e.g. '1995-03-01', would prune to ZERO via column stats —
    // the tiers compose, they don't mask each other)
    assert(ss.sql("SELECT v FROM ltf.ns.t WHERE k = 7 AND od = '1995-03-15'")
      .rdd.getNumPartitions === 1)
    assert(ss.sql("SELECT v FROM ltf.ns.t WHERE k = 7 AND od = '1995-03-01'")
      .rdd.getNumPartitions === 0)

    // grouped COUNT on a transform source column must NOT push to
    // manifests (per-file source values are not total) — and stays right
    val grouped = ss.sql("SELECT od, count(*) FROM ltf.ns.t GROUP BY od")
    assert(!grouped.queryExecution.executedPlan.toString.contains("manifest count"))
    assert(grouped.collect().map(_.getLong(1)).sum === 60L)
  }

  test("NULL source values land in the NULL partition; non-null literals never match them") {
    val root = graft.util.TempDirs.create("graft_tf_null_").toString
    val ss = lakeSession("ltn", root)
    import ss.implicits._
    ss.sql("CREATE TABLE ltn.ns.t (k BIGINT, tag STRING) " +
      "PARTITIONED BY (bucket(4, tag))")
    Seq((1L, "a"), (2L, null), (3L, "b")).toDF("k", "tag")
      .coalesce(1).writeTo("ltn.ns.t").append()
    val h = GraftLakeStore.get(root, "ns.t").get
    assert(h.snapshot(1).files.exists(_.partition("tag_bucket_4").isEmpty),
      "NULL source -> NULL partition value")
    assert(ss.sql("SELECT k FROM ltn.ns.t WHERE tag = 'a'").collect()
      .map(_.getLong(0)).toSeq === Seq(1L))
    assert(ss.sql("SELECT count(*) FROM ltn.ns.t WHERE tag IS NULL")
      .head().getLong(0) === 1L)
  }

  test("spec evolution composes with transforms; guards hold") {
    val root = graft.util.TempDirs.create("graft_tf_evo_").toString
    val ss = lakeSession("lte", root)
    import ss.implicits._
    ss.sql("CREATE TABLE lte.ns.t (k BIGINT, od STRING)")
    Seq((1L, "1995-01-01")).toDF("k", "od").coalesce(1).writeTo("lte.ns.t").append()
    ss.sql("CALL lte.system.add_partition_field(" +
      "table => 'ns.t', column => 'k', transform => 'bucket[8]')")
    ss.sql("CALL lte.system.add_partition_field(" +
      "table => 'ns.t', column => 'od', transform => 'truncate[4]')")
    val h = GraftLakeStore.get(root, "ns.t").get
    assert(h.snapshot(h.latestVersion).partFields ===
      Seq(PartField("k", "bucket", 8), PartField("od", "truncate", 4)))
    Seq((2L, "1996-05-05")).toDF("k", "od").coalesce(1).writeTo("lte.ns.t").append()
    val newFile = h.snapshot(h.latestVersion).files.maxBy(_.id)
    assert(newFile.partition("od_truncate_4") === Some("1996"))
    assert(newFile.partition("k_bucket_8") ===
      Some(LakeTransforms.bucket(java.lang.Long.valueOf(2L), 8).toString))
    // correctness across the mixed spec
    assert(ss.sql("SELECT count(*) FROM lte.ns.t WHERE od >= '1996-01-01'")
      .head().getLong(0) === 1L)
    // drop by FIELD name; a second field on the same source would be
    // ambiguous by source name
    ss.sql("CALL lte.system.drop_partition_field(table => 'ns.t', column => 'k_bucket_8')")
    assert(h.snapshot(h.latestVersion).partFields ===
      Seq(PartField("od", "truncate", 4)))
    // guards: bad transform spec strings and unsupported types
    def msg(sql: String) = intercept[Exception](ss.sql(sql)).getMessage
    assert(msg("CALL lte.system.add_partition_field(" +
      "table => 'ns.t', column => 'k', transform => 'bucket[0]')")
      .contains("positive"))
    assert(msg("CALL lte.system.add_partition_field(" +
      "table => 'ns.t', column => 'k', transform => 'mod[3]')")
      .contains("identity | bucket[N] | truncate[W]"))
    // RENAME/DROP of a transform field's SOURCE column is rejected
    assert(msg("ALTER TABLE lte.ns.t RENAME COLUMN od TO od2")
      .contains("partition column"))
  }

  /** The bucket mixer must spread keys: sequential longs and
    * sequential-suffix strings land near-uniformly across buckets
    * (splitmix64 avalanche / murmur3 — a weak mixer here would silently
    * turn bucket pruning into one hot file per table). */
  test("bucket distribution is near-uniform over sequential keys") {
    val n = 16
    def spread(counts: Map[Int, Int], total: Int): Unit = {
      assert(counts.size === n, s"all $n buckets must be hit, got ${counts.size}")
      val mean = total.toDouble / n
      counts.values.foreach { c =>
        assert(c > mean * 0.5 && c < mean * 1.5,
          s"bucket count $c outside 50-150% of mean $mean")
      }
    }
    val longs = (0L until 16000L).map(k =>
      LakeTransforms.bucket(java.lang.Long.valueOf(k), n))
    spread(longs.groupBy(identity).view.mapValues(_.size).toMap, 16000)
    val strs = (0 until 16000).map(i =>
      LakeTransforms.bucket(s"user-$i", n))
    spread(strs.groupBy(identity).view.mapValues(_.size).toMap, 16000)
  }

  /** A transform field's generated name must never shadow a schema
    * column — the exact-pruning and COUNT-pushdown tiers key on
    * columns, and a collision would render confusingly everywhere. */
  test("transform field names colliding with schema columns are rejected") {
    val root = graft.util.TempDirs.create("graft_tf_shadow_").toString
    val ss = lakeSession("lts", root)
    def msg(sql: String) = intercept[Exception](ss.sql(sql)).getMessage
    assert(msg("CREATE TABLE lts.ns.bad (k BIGINT, k_bucket_4 STRING) " +
      "PARTITIONED BY (bucket(4, k))").contains("collides"))
    ss.sql("CREATE TABLE lts.ns.t (k BIGINT, k_bucket_4 STRING)")
    assert(msg("CALL lts.system.add_partition_field(" +
      "table => 'ns.t', column => 'k', transform => 'bucket[4]')")
      .contains("collides"))
    // a non-colliding parameter is fine
    ss.sql("CALL lts.system.add_partition_field(" +
      "table => 'ns.t', column => 'k', transform => 'bucket[8]')")
    import ss.implicits._
    Seq((1L, "x")).toDF("k", "k_bucket_4").coalesce(1).writeTo("lts.ns.t").append()
    // the SHADOW COLUMN is a plain data column: filters and grouped
    // counts on it read its values, never the transform's
    assert(ss.sql("SELECT count(*) FROM lts.ns.t WHERE k_bucket_4 = 'x'")
      .head().getLong(0) === 1L)
    val g = ss.sql("SELECT k_bucket_4, count(*) FROM lts.ns.t GROUP BY 1")
    assert(!g.queryExecution.executedPlan.toString.contains("manifest count"))
    assert(g.head().getString(0) === "x")
  }
}
