package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** foreachBatch MERGE sink: per-batch partial aggregates upsert into a
  * keyed target, with batchId-based replay detection making the sink
  * idempotent under at-least-once delivery — the pattern every
  * non-append streaming deployment (Delta/Iceberg MERGE INTO, JDBC
  * upsert) runs in production. */
class ForeachBatchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("per-batch upserts converge to batch truth; replayed batches are no-ops") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // stage the source as several files so AvailableNow produces
    // multiple micro-batches (one per file with maxFilesPerTrigger=1)
    val src = graft.util.TempDirs.create("febatch_src_").toString
    val ev = spark.read.parquet(s"$sf/events.parquet")
    ev.filter(col("event_id") % 3 === 0).write.parquet(s"$src/p0")
    ev.filter(col("event_id") % 3 === 1).write.parquet(s"$src/p1")
    ev.filter(col("event_id") % 3 === 2).write.parquet(s"$src/p2")
    Seq("p0", "p1", "p2").foreach { p =>
      val parts = Files.list(Paths.get(s"$src/$p"))
        .filter(f => f.toString.endsWith(".parquet")).toArray
      parts.zipWithIndex.foreach { case (f, i) =>
        Files.move(f.asInstanceOf[java.nio.file.Path],
          Paths.get(s"$src/${p}_$i.parquet"))
      }
      Files.walk(Paths.get(s"$src/$p"))
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { Files.deleteIfExists(f); () })
    }

    // the keyed target: user_id -> (n_events, total_value_cents-exact).
    // NO replay guard here — idempotence is the SINK's contract
    // (foreachBatchUpsert wraps applyBatch with replayGuarded), so the
    // callback is the naive fold a caller would actually write
    val target = scala.collection.mutable.Map[Long, (Long, Double)]()
    var batches = 0
    def applyBatch(batchId: Long, partials: Seq[(Long, Long, Double)]): Unit = {
      batches += 1
      partials.foreach { case (user, n, v) =>
        val (n0, v0) = target.getOrElse(user, (0L, 0.0))
        target(user) = (n0 + n, v0 + v)
      }
    }

    val schema = ev.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
      .transform(graft.Tables.normalizeEventTs)
    val guarded = StreamingOps.foreachBatchUpsert(stream, applyBatch)
    assert(batches >= 3, s"expected one micro-batch per staged file, got $batches")

    // redeliver every batch through the sink's own guard (at-least-once
    // delivery): each replayed batchId must be a no-op
    val before = target.toMap
    (0L until batches.toLong).foreach(id => guarded(id, Seq((0L, 99L, 9.9))))
    assert(target.toMap === before, "replayed batches must not change the target")

    // converged state equals the batch truth
    val truth = ev
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        (sum(graft.operators.Exact.cents(col("value"))) / 100.0).as("v"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(target.keySet === truth.keySet)
    truth.foreach { case (u, (n, v)) =>
      val (gn, gv) = target(u)
      assert(gn === n, s"user $u count")
      assert(math.abs(gv - v) < 1e-9, s"user $u value: $gv vs $v")
    }
  }
}
