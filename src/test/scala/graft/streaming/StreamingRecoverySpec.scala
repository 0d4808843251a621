package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Checkpoint recovery — the property that makes a streaming pipeline
  * restartable: source offsets and operator state live in the
  * checkpoint, so a stopped query resumed with the same checkpoint
  * processes each input exactly once, never re-emitting what an
  * earlier incarnation already wrote. This is what a production
  * deployment leans on across deploys/crashes; neither the gate
  * queries (fresh checkpoints per run) nor the parity suites exercised
  * it. */
class StreamingRecoverySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("restart from checkpoint consumes only new files, output is exactly-once") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = graft.util.TempDirs.create("recovery_src_").toString
    val out = graft.util.TempDirs.create("recovery_out_").toString
    val ckpt = graft.util.TempDirs.create("recovery_ckpt_").toString
    val schema = spark.read.parquet(s"$sf/events.parquet").schema

    // incarnation 1: only file A visible
    Files.copy(Paths.get(s"$sf/events.parquet"), Paths.get(s"$src/a.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    def run(): Unit = {
      val q = spark.readStream.schema(schema).parquet(src)
        .transform(graft.Tables.normalizeEventTs)
        .select(col("event_id"), col("user_id"), col("value"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run()
    val afterA = spark.read.parquet(out).count()
    val nA = spark.read.parquet(s"$sf/events.parquet").count()
    assert(afterA === nA)

    // incarnation 2: file B (a shifted copy: distinct event ids) arrives
    // while the query is DOWN; the restart must emit B's rows exactly
    // once and none of A's again
    spark.read.parquet(s"$sf/events.parquet")
      .withColumn("event_id", col("event_id") + 1000000L)
      .write.parquet(s"$src/b_dir")
    // file source lists files recursively only within the dir; move the
    // parts up as one new file each
    val parts = Files.list(Paths.get(s"$src/b_dir"))
      .filter(p => p.toString.endsWith(".parquet")).toArray
    parts.zipWithIndex.foreach { case (p, i) =>
      Files.move(p.asInstanceOf[java.nio.file.Path],
        Paths.get(s"$src/b_$i.parquet"))
    }
    run()
    val finalDf = spark.read.parquet(out)
    assert(finalDf.count() === nA + nA)
    // exactly-once: every id appears exactly once, both generations
    assert(finalDf.select(countDistinct("event_id")).collect().head.getLong(0) === nA + nA)
    assert(finalDf.filter(col("event_id") >= 1000000L).count() === nA)
  }
}
