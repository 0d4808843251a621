package graft.operators

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.util.Checkpoints
import org.apache.spark.sql.functions._

/** Checkpoints.truncate: the one lineage-truncation mechanism behind
  * every iterative/multi-consumer operator. Unset conf → in-process
  * localCheckpoint (local/bench default). `spark.graft.checkpointDir`
  * set → RELIABLE checkpoint files under that directory, the form that
  * survives executor loss on a real cluster. */
class CheckpointSpec extends SparkSpec {

  import scala.jdk.CollectionConverters._

  private def filesUnder(dir: String): Seq[String] =
    if (!Files.exists(Paths.get(dir))) Seq.empty
    else Files.walk(Paths.get(dir)).iterator().asScala
      .filter(Files.isRegularFile(_)).map(_.toString).toSeq

  test("conf set: truncate writes reliable checkpoint files, results unchanged") {
    import spark.implicits._
    val dir = graft.util.TempDirs.create("graft_ckpt_").toString
    spark.conf.set(Checkpoints.DirConf, dir)
    try {
      val df = (1L to 100L).toDF("x").withColumn("y", col("x") * 2)
      val out = Checkpoints.truncate(df)
      assert(out.collect().map(_.getLong(1)).sum === 2 * (1L to 100L).sum)
      assert(filesUnder(dir).nonEmpty,
        "reliable checkpoint must persist RDD blocks under the conf dir")
    } finally spark.conf.unset(Checkpoints.DirConf)
  }

  test("conf unset: truncate takes the localCheckpoint path, not reliable files") {
    import spark.implicits._
    // point the CONTEXT at a fresh checkpoint dir: if truncate wrongly
    // used reliable checkpoint() with the conf unset, files would land
    // here — an unused-dir assertion alone would pass vacuously
    val dir = graft.util.TempDirs.create("graft_ckpt_unset_").toString
    spark.sparkContext.setCheckpointDir(dir)
    val out = Checkpoints.truncate((1L to 10L).toDF("x"))
    assert(out.count() === 10)
    assert(filesUnder(dir).isEmpty,
      "conf unset must localCheckpoint — no reliable checkpoint files")
  }

  test("connectedComponents under a reliable checkpoint dir: same labels, files written") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L), (7L, 7L)).toDF("a", "b")
    val plain = Ops.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dir = graft.util.TempDirs.create("graft_ckpt_cc_").toString
    spark.conf.set(Checkpoints.DirConf, dir)
    try {
      val ckpt = Ops.connectedComponents(edges).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(ckpt === plain, "checkpoint mechanism must never change labels")
      assert(ckpt === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L, 7L -> 7L))
      assert(filesUnder(dir).nonEmpty)
    } finally spark.conf.unset(Checkpoints.DirConf)
  }
}
