package graft.streaming

import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Exact

/** Declared queries that run through the REAL StreamExecution engine —
  * readStream → transform → writeStream — and surface their final
  * result as a batch frame for the correctness gate. Until now the
  * streaming operators were pinned only by ScalaTest parity suites;
  * these make the streaming path itself a first-class CORRECTNESS row:
  * the oracle is the equivalent batch SQL, and a streaming run over
  * bounded input MUST converge to it exactly.
  */
object StreamingQueries {

  /** One staged copy of events.parquet per source dir (file streams
    * read directories, and queries must be re-runnable); deleted on JVM
    * exit (TempDirs) so repeated runs don't accumulate copies in /tmp. */
  private val staged = new ConcurrentHashMap[String, String]()
  private val runId = new AtomicInteger()

  /** Copy $dir/events.parquet into a staging dir under `prefix` —
    * handling BOTH layouts: the driver testdata's single file, and a
    * parquet DIRECTORY (what a generic Spark writer produces). A naive
    * Files.copy of a directory copies it EMPTY, and a file stream over
    * the result silently drains zero rows — the streaming queries
    * would "pass" on nothing. Directory streams are closed (they hold
    * an fd until GC otherwise). */
  private def copyEvents(dir: String, dst: java.nio.file.Path, prefix: String): Unit = {
    val src = Paths.get(s"$dir/events.parquet")
    if (Files.isDirectory(src)) {
      val s = Files.list(src)
      try {
        val parts = s.filter(_.toString.endsWith(".parquet")).iterator()
        var i = 0
        while (parts.hasNext) {
          Files.copy(parts.next(), dst.resolve(f"${prefix}_part$i%04d.parquet"))
          i += 1
        }
        require(i > 0, s"no parquet part files under $src")
      } finally s.close()
    } else Files.copy(src, dst.resolve(s"$prefix.parquet"))
  }

  private def stageDir(dir: String): String =
    staged.computeIfAbsent(dir, { d =>
      val p = graft.util.TempDirs.create("graft_stream_events")
      copyEvents(d, p, "events")
      p.toString
    })

  /** Run a streaming query with an explicitly-sized state-store count.
    *
    * A stateful streaming operator creates one state-store instance per
    * shuffle partition, and EVERY store pays a per-micro-batch commit
    * (snapshot + maintenance) regardless of how little state it holds —
    * so the store count is a fixed per-batch cost, not free parallelism.
    * Inheriting the batch shuffle setting (32 here) makes tiny local
    * state pay 32 commits/batch: measured 9.5 s → 3.5 s on the
    * stream-stream join at sf0.1 by sizing it to 8. On a cluster this
    * is the same knob a production job sets per-stream (to executors ×
    * cores, or to state volume / target-partition-size) — the point is
    * that it is a STREAM-scoped decision pinned into the checkpoint at
    * first run, never an inherited batch default. Restores the session
    * conf afterwards so batch queries in the same session are untouched.
    */
  private def withStatePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val old = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, old)
  }

  /** Staging dir holding events.parquet TWICE (distinct file names) —
    * the at-least-once-delivery fixture for the streaming dedup query. */
  private def stageDirDuplicated(dir: String): String =
    staged.computeIfAbsent(dir + "#dup", { _ =>
      val p = graft.util.TempDirs.create("graft_stream_events_dup")
      copyEvents(dir, p, "events")
      copyEvents(dir, p, "events_redelivered")
      p.toString
    })

  /** Daily rollup executed as a Structured Streaming job: micro-batched
    * file source, event-time tumbling window, exact integer-cents sums
    * (order-independent — a streaming engine gives no fold-order
    * guarantees across micro-batches), AvailableNow trigger draining
    * the bounded input, memory sink in complete mode. At cluster scale
    * the same dataflow runs unbounded with a watermark bounding state;
    * here the full-history complete mode is what makes the final table
    * comparable to the batch oracle. */
  def streamingDaily(s: SparkSession, dir: String): DataFrame = {
    // events.ts physical shape varies by fixture generation: same conf +
    // normalization contract as graft.Tables (the schema probe below
    // relies on the conf being set before the read)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    withStatePartitions(s, 8) {
    val events = s.readStream.schema(schema).parquet(stageDir(dir))
      .transform(graft.Tables.normalizeEventTs)
    val agg = events
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(
        count(lit(1)).as("num_events"),
        (sum(Exact.cents(col("value"))) / 100.0).cast("double").as("total_value"))
      .select(to_date(col("w.start")).as("event_date"),
        col("num_events"), col("total_value"))
    val name = s"graft_stream_daily_${runId.incrementAndGet()}"
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // materialize the final table and DROP the memory sink's temp view —
    // repeated invocations in one session (warmup + bench + tests) must
    // not accumulate result copies in the driver for the JVM's lifetime
    val result = s.table(name).orderBy("event_date")
    val rows = result.collect()
    val out = s.createDataFrame(
      java.util.Arrays.asList(rows: _*), result.schema)
    s.catalog.dropTempView(name)
    out
    }
  }

  /** Staging dir = events.parquet + a one-row far-future SENTINEL file.
    * Append-mode emission of session windows requires the watermark to
    * pass each session's END; a bounded input's final sessions would
    * otherwise never flush (the watermark stops at max(ts) - delay).
    * The sentinel (user_id = -1, filtered from output) pushes the
    * frontier past every real session — the standard flush pattern for
    * draining an event-time stream to completion. */
  /** Write the watermark-flushing sentinel row (user −1, event time
    * far past every real event) into staging dir `p` — factored so the
    * single-batch (q95) and time-split (q200) stagings share one
    * sentinel definition. The sentinel file must carry the SAME
    * physical ts type as the real event files (the stream reads both
    * under one probe schema). */
  private def writeSentinel(s: SparkSession, dir: String, p: java.nio.file.Path): Unit = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = s.read.parquet(s"$dir/events.parquet")
    val maxTsMicros = graft.Tables.normalizeEventTs(ev)
      .agg(max(unix_micros(col("ts")))).collect().head.getLong(0)
    // past max + gap(30 m) + watermark delay(1 h) + margin(1 h)
    val sentinelMicros = maxTsMicros + 9000L * 1000000L
    val sentinelTs = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => lit(sentinelMicros * 1000L)
      case t => timestamp_micros(lit(sentinelMicros)).cast(t)
    }
    val row = ev.limit(1)
      .withColumn("event_id", lit(-1L))
      .withColumn("ts", sentinelTs)
      .withColumn("user_id", lit(-1L))
      .withColumn("event_type", lit("sentinel"))
    val tmp = Files.createTempDirectory("graft_sentinel_write")
    row.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = {
      val l = Files.list(tmp)
      try l.filter(f => f.toString.endsWith(".parquet")).findFirst().get()
      finally l.close()
    }
    Files.copy(part, p.resolve("zz_sentinel.parquet"))
    val w = Files.walk(tmp)
    try w.sorted(java.util.Comparator.reverseOrder())
      .forEach(f => { Files.deleteIfExists(f); () })
    finally w.close()
  }

  private def stageDirWithSentinel(s: SparkSession, dir: String): String =
    staged.computeIfAbsent(dir + "#sentinel", { _ =>
      val p = graft.util.TempDirs.create("graft_stream_events_sn")
      copyEvents(dir, p, "events")
      writeSentinel(s, dir, p)
      p.toString
    })

  /** Stage events as THREE time-ordered slices (equal event-time
    * thirds) plus the sentinel, with strictly increasing modification
    * times so a maxFilesPerTrigger=1 stream replays them as four
    * micro-batches in event-time order — files arriving in time order
    * is how a real ingestion lands, and it is what lets the watermark
    * advance batch-over-batch WITHOUT declaring mid-stream rows late
    * (an event_id-based split interleaves times, so the batch-1
    * watermark would discard most of batches 2-3). q200's timers need
    * exactly this: sessions idle by batch N's watermark must fire
    * their timers while later batches are still arriving. */
  private def stageDirTimeSplitWithSentinel(s: SparkSession, dir: String): String =
    staged.computeIfAbsent(dir + "#timesplit", { _ =>
      val p = graft.util.TempDirs.create("graft_stream_events_tt")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = s.read.parquet(s"$dir/events.parquet")
      // raw-shape slice key: monotone in event time for every physical
      // ts shape the fixtures have shipped (int64 nanos / NTZ / TZ)
      val tsKey = ev.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => col("ts")
        case _ => unix_micros(col("ts").cast("timestamp"))
      }
      val mm = ev.agg(min(tsKey).as("lo"), max(tsKey).as("hi")).collect().head
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      val w = (hi - lo) / 3 + 1
      (0 until 3).foreach { i =>
        val part = graft.util.TempDirs.create(s"graft_stream_tpart$i")
        ev.filter(tsKey >= lo + i * w && tsKey < lo + (i + 1) * w)
          .coalesce(1).write.mode("overwrite").parquet(part.toString)
        val f = {
          val l = Files.list(part)
          try l.filter(_.toString.endsWith(".parquet")).findFirst().get()
          finally l.close()
        }
        val dst = Paths.get(s"$p/events_$i.parquet")
        Files.move(f, dst)
        Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(
            System.currentTimeMillis() + i * 2000L))
      }
      writeSentinel(s, dir, p)
      Files.setLastModifiedTime(p.resolve("zz_sentinel.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() + 10000L))
      p.toString
    })

  /** Gap-based sessionization through the REAL streaming engine:
    * session_window(ts, 30 min) per user with a 1-hour watermark,
    * append mode (the only mode session windows support), AvailableNow.
    * The sentinel staging flushes the final sessions; the gate then
    * rolls the emitted (user, session) rows up to per-user session and
    * event counts and compares against a batch recomputation. NOTE the
    * boundary semantics: session_window opens a NEW session when the
    * gap is >= the duration (windows [t, t+gap) merge only on
    * overlap), so the oracle uses >=, unlike q21's strictly-greater
    * lag formulation. */
  def streamingSessions(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    withStatePartitions(s, 8) {
    val events = s.readStream.schema(schema).parquet(stageDirWithSentinel(s, dir))
      .transform(graft.Tables.normalizeEventTs)
      .withWatermark("ts", "1 hour")
    val agg = events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
    val name = s"graft_stream_sessions_${runId.incrementAndGet()}"
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val result = s.table(name)
      .filter(col("user_id") >= 0) // drop the sentinel's own session
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n")).as("n_events"))
      .orderBy("user_id")
    val rows = result.collect()
    val out = s.createDataFrame(
      java.util.Arrays.asList(rows: _*), result.schema)
    s.catalog.dropTempView(name)
    out
    }
  }

  /** Streaming exactly-once dedup under at-least-once delivery: the
    * staged source contains every event TWICE (a redelivered file —
    * the failure mode any distributed ingestion has), and the stream
    * must emit each event_id exactly once. dropDuplicatesWithinWatermark
    * is the production shape: plain dropDuplicates without the
    * event-time column in its subset NEVER evicts state (the watermark
    * is inert for it — unbounded state on an unbounded stream), while
    * the WithinWatermark variant keeps an id only until the event-time
    * frontier passes its allowed lateness, which bounds memory and
    * still catches any redelivery inside the lateness window. The
    * gate then aggregates the emitted rows per day and must equal the
    * batch truth over the ORIGINAL (single-copy) events table. */
  def streamingDedup(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    withStatePartitions(s, 8) {
    val events = s.readStream.schema(schema).parquet(stageDirDuplicated(dir))
      .transform(graft.Tables.normalizeEventTs)
      .withWatermark("ts", "1 day")
      .dropDuplicatesWithinWatermark("event_id")
    val name = s"graft_stream_dedup_${runId.incrementAndGet()}"
    val q = events.select("event_id", "ts", "value").writeStream
      .format("memory").queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val result = s.table(name)
      .groupBy(to_date(col("ts")).as("event_date"))
      .agg(
        count(lit(1)).as("num_events"),
        (sum(Exact.cents(col("value"))) / 100.0).cast("double").as("total_value"))
      .orderBy("event_date")
    val rows = result.collect()
    val out = s.createDataFrame(
      java.util.Arrays.asList(rows: _*), result.schema)
    s.catalog.dropTempView(name)
    out
    }
  }

  /** Stream-STREAM inner join — the fourth streaming pillar (after
    * windowed aggregation q71, stateful dedup q92, sessionization
    * q95): two live streams of the same events joined on user with a
    * 10-minute follow window, per-user pair counts gated against the
    * batch self-join. Both sides carry watermarks so the join STATE is
    * bounded (a buffered row can be dropped once the other side's
    * frontier passes its maximum match window); emission needs no
    * sentinel because an inner join emits each match the moment both
    * rows have arrived. The a_id < b_id condition makes the pair set
    * well-defined; the oracle is the identical batch predicate. */
  /** State-store count sized to the SOURCE VOLUME, not a constant:
    * the stream-stream join buffers BOTH full sides in state until the
    * watermark passes, so per-store state grows linearly with the
    * input while the per-batch commit cost per store is fixed. A
    * constant that is right at one scale is wrong at another —
    * measured at 8 stores: 3.5 s at sf0.1 but 7.8 s at sf1 (stores too
    * fat); at 16: 6.8 s at sf1; at 32: 9.5 s at sf0.1 (commit-bound)
    * and 7.0 s at sf1. One store per ~MB of source parquet, floored at
    * 8 and capped at 32, lands on the measured optimum at both scales
    * — and is the same sizing rule (state volume / target partition
    * size) a production job applies. */
  private def pairJoinStatePartitions(dir: String): Int = {
    val p = Paths.get(s"$dir/events.parquet")
    val bytes =
      try {
        if (Files.isDirectory(p)) {
          val l = Files.list(p)
          try l.mapToLong(f => try Files.size(f) catch { case _: Exception => 0L }).sum()
          finally l.close()
        } else Files.size(p)
      } catch { case _: Exception => 0L }
    math.max(8, math.min(32, (bytes / (1L << 20)).toInt))
  }

  def streamingPairJoin(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    withStatePartitions(s, pairJoinStatePartitions(dir)) {
    val stream = () => s.readStream.schema(schema).parquet(stageDir(dir))
      .transform(graft.Tables.normalizeEventTs)
    val a = stream().select(col("event_id").as("a_id"), col("user_id").as("a_user"),
      col("ts").as("a_ts")).withWatermark("a_ts", "1 hour")
    val b = stream().select(col("event_id").as("b_id"), col("user_id").as("b_user"),
      col("ts").as("b_ts")).withWatermark("b_ts", "1 hour")
    val joined = a.join(b,
      col("a_user") === col("b_user") &&
        col("b_ts") >= col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 10 MINUTES") &&
        col("a_id") < col("b_id"))
    val name = s"graft_stream_pairs_${runId.incrementAndGet()}"
    val q = joined.select("a_user").writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val result = s.table(name)
      .groupBy(col("a_user").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("user_id")
    val rows = result.collect()
    val out = s.createDataFrame(
      java.util.Arrays.asList(rows: _*), result.schema)
    s.catalog.dropTempView(name)
    out
    }
  }

  /** Staging dir holding events.parquet split into THREE files so
    * maxFilesPerTrigger=1 produces multiple micro-batches — the
    * fixture that actually exercises state CARRY between batches
    * (a single-file source would fold everything in batch 0 and the
    * state machine would never resume). Split by event_id mod 3, each
    * slice coalesced to one file. */
  private def stageDirSplit(s: SparkSession, dir: String): String =
    staged.computeIfAbsent(dir + "#split3", { _ =>
      val p = graft.util.TempDirs.create("graft_stream_events_3")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = s.read.parquet(s"$dir/events.parquet")
      (0 until 3).foreach { i =>
        val part = graft.util.TempDirs.create(s"graft_stream_part$i")
        ev.filter(col("event_id") % 3 === i).coalesce(1)
          .write.mode("overwrite").parquet(part.toString)
        val f = {
          val l = Files.list(part)
          try l.filter(_.toString.endsWith(".parquet")).findFirst().get()
          finally l.close()
        }
        Files.move(f, Paths.get(s"$p/events_$i.parquet"))
      }
      p.toString
    })

  /** Running per-user totals through mapGroupsWithState — the fifth
    * streaming pillar: an UPDATE-mode state machine whose state
    * (exact integer cents + count) carries across micro-batches. The
    * source is staged as three files with maxFilesPerTrigger=1, so
    * the final emission per user is genuinely the product of state
    * resumption, not a single-batch fold; the memory sink's last
    * update per user (selected by max event count — the count is
    * strictly monotone per user) must equal the batch per-user
    * aggregate, which is the DuckDB oracle. */
  def streamingRunningTotals(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = stageDirSplit(s, dir)
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    withStatePartitions(s, 8) {
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
      .transform(graft.Tables.normalizeEventTs)
    val totals = StreamingOps.runningUserTotals(stream)
      .toDF("user_id", "total_value", "n_events")
    val name = s"graft_stream_totals_${runId.incrementAndGet()}"
    val q = totals.writeStream.format("memory").queryName(name)
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val result = s.table(name)
      .groupBy(col("user_id"))
      .agg(max_by(col("total_value"), col("n_events")).as("total_value"),
        max(col("n_events")).as("n_events"))
      .select(col("user_id"), col("n_events"), col("total_value"))
      .orderBy("user_id")
    val rows = result.collect()
    val out = s.createDataFrame(
      java.util.Arrays.asList(rows: _*), result.schema)
    s.catalog.dropTempView(name)
    out
    }
  }

  /** The foreachBatch MERGE sink as a declared query — the sixth
    * streaming pillar (the SINK side: everything else gates
    * transformations). Per-micro-batch keyed partials upsert into an
    * external keyed target through StreamingOps.foreachBatchUpsert
    * (batchId replay guard included); the converged target must equal
    * the batch per-user aggregate. The target fold reconstructs exact
    * integer cents from each partial (round(v·100) is exact for cent
    * values below 2^52), so accumulation order — which a streaming
    * sink never guarantees — cannot move the result. */
  def streamingForeachBatch(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = stageDirSplit(s, dir)
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    withStatePartitions(s, 8) {
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
      .transform(graft.Tables.normalizeEventTs)
    val target = new ConcurrentHashMap[Long, (Long, Long)]() // user -> (n, cents)
    StreamingOps.foreachBatchUpsert(stream, (_: Long, partials) =>
      partials.foreach { case (user, n, v) =>
        target.merge(user, (n, math.round(v * 100)),
          (a, b) => (a._1 + b._1, a._2 + b._2))
      })
    import scala.jdk.CollectionConverters._
    import s.implicits._
    target.asScala.toSeq
      .map { case (u, (n, cents)) => (u, n, cents / 100.0) }
      .sortBy(_._1)
      .toDF("user_id", "n_events", "total_value")
    }
  }

  /** Stream-static enrichment join — the most common production
    * streaming topology: an unbounded fact stream joined to a bounded
    * dimension table (here: events ⋈ customer on user key, rolled up
    * to market segment). The static side is a plain batch DataFrame;
    * Spark re-plans it into every micro-batch (picking up dimension
    * updates between batches on a real deployment) and broadcasts it,
    * so the stream side never shuffles for the join — state exists
    * only for the downstream aggregation. Inner join keeps the
    * unmatched-stream-row semantics identical to the batch oracle. */
  def streamingStaticJoin(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    withStatePartitions(s, 8) {
    val stream = s.readStream.schema(schema).parquet(stageDir(dir))
    val dim = broadcast(graft.Tables(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment")))
    val agg = stream
      .join(dim, col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        (sum(Exact.cents(col("value"))) / 100.0).cast("double").as("total_value"))
    val name = s"graft_stream_static_${runId.incrementAndGet()}"
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val result = s.table(name).orderBy("c_mktsegment")
    val rows = result.collect()
    val out = s.createDataFrame(
      java.util.Arrays.asList(rows: _*), result.schema)
    s.catalog.dropTempView(name)
    out
    }
  }

  /** Per-user profile through Spark 4's `transformWithState` (see
    * [[UserProfileProcessor]]) on the RocksDB state-store provider —
    * the modern arbitrary-stateful-processing path, gated exactly like
    * q115: a three-file staged source forces state RESUMPTION across
    * micro-batches, update-mode emissions land in the memory sink, and
    * the converged row per user (the emission with the highest
    * n_events — strictly increasing per user, so unique) must equal
    * the batch aggregate. The provider conf is stream-scoped: set for
    * this query, restored after (HDFS-backed stores elsewhere are
    * untouched — provider choice is pinned into each stream's
    * checkpoint at first run). */
  def streamingTransformWithState(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = stageDirSplit(s, dir)
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val oldProv = s.conf.getOption(provKey)
    s.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try withStatePartitions(s, 8) {
      import s.implicits._
      import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .transform(graft.Tables.normalizeEventTs)
      val typed = stream.select(col("user_id"), col("event_type"),
        Exact.cents(col("value")).as("cents")).as[ProfileEvent]
      val profiles = typed.groupByKey(_.user_id)
        .transformWithState(new UserProfileProcessor(),
          TimeMode.None(), OutputMode.Update())
      val name = s"graft_stream_tws_${runId.incrementAndGet()}"
      val q = profiles.toDF().writeStream.format("memory").queryName(name)
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val result = s.table(name)
        .groupBy(col("user_id"))
        .agg(
          max(col("n_events")).as("n_events"),
          max_by(col("cents"), col("n_events")).as("cents"),
          max_by(col("n_types"), col("n_events")).as("n_types"),
          max_by(col("n_errors"), col("n_events")).as("n_errors"))
        .select(col("user_id"), col("n_events"),
          (col("cents").cast("double") / 100.0).as("total_value"),
          col("n_types"), col("n_errors"))
        .orderBy("user_id")
      val rows = result.collect()
      val out = s.createDataFrame(
        java.util.Arrays.asList(rows: _*), result.schema)
      s.catalog.dropTempView(name)
      out
    } finally oldProv match {
      case Some(v) => s.conf.set(provKey, v)
      case None => s.conf.unset(provKey)
    }
  }

  /** State-store READER (Spark 4's `statestore` batch source) over a
    * transformWithState checkpoint — the ops surface a production
    * streaming deployment needs: inspect/audit/debug the keyed state a
    * running job has accumulated, as a plain DataFrame, without
    * touching the job. The stream (same processor as q184) drains into
    * an explicit checkpoint; the `totals` ValueState is then read BACK
    * through `spark.read.format("statestore")` and must equal the
    * batch per-user aggregate — a full end-to-end pin of state
    * PERSISTENCE (the memory-sink gates only check emissions; this
    * checks what RocksDB actually holds after the final commit). */
  def streamingStateStoreRead(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = stageDirSplit(s, dir)
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val oldProv = s.conf.getOption(provKey)
    s.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // 4 state partitions, not the streaming default 8: this query pays
    // every store TWICE (once per micro-batch commit, once for the
    // batch read's store restore) and holds tiny per-user state — the
    // restore cost is per-STORE, not per-row
    try withStatePartitions(s, 4) {
      import s.implicits._
      import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
      val ckpt = graft.util.TempDirs.create("graft_tws_ckpt").toString
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .transform(graft.Tables.normalizeEventTs)
      val typed = stream.select(col("user_id"), col("event_type"),
        Exact.cents(col("value")).as("cents")).as[ProfileEvent]
      val profiles = typed.groupByKey(_.user_id)
        .transformWithState(new UserProfileProcessor(),
          TimeMode.None(), OutputMode.Update())
      val name = s"graft_tws_ckpt_${runId.incrementAndGet()}"
      val q = profiles.toDF().writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.catalog.dropTempView(name)
      val state = s.read.format("statestore")
        .option("path", ckpt)
        .option("stateVarName", "totals")
        .load()
      val result = state
        .select(col("key.value").as("user_id"),
          col("value.n").as("n_events"),
          (col("value.cents").cast("double") / 100.0).as("total_value"))
        .orderBy("user_id")
      val rows = result.collect()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), result.schema)
    } finally oldProv match {
      case Some(v) => s.conf.set(provKey, v)
      case None => s.conf.unset(provKey)
    }
  }

  /** Sessionization by EVENT-TIME TIMERS through transformWithState —
    * the TWS feature q184 leaves untouched (it runs TimeMode.None).
    * The SessionTimerProcessor holds one open session per user and one
    * registered timer at (last event + gap); the time-split staging
    * replays events as four micro-batches in event-time order, so
    * sessions that go idle mid-stream are emitted BY TIMER EXPIRY in a
    * later batch (not by any end-of-input sweep), and the sentinel's
    * final watermark advance fires the rest. The gate rolls closed
    * sessions up per user and must equal q95's batch sessionization
    * oracle exactly — same semantics, third mechanism (q21 window
    * arithmetic, q95 session_window aggregation, q200 explicit timers). */
  def streamingSessionTimers(s: SparkSession, dir: String): DataFrame =
    closedSessionsRaw(s, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n")).as("n_events"))
      .orderBy("user_id")

  /** The raw closed-session stream output (one row per session, with
    * the by_timer mechanism flag) as a batch snapshot — package-private
    * so StreamingOpsSpec can assert the MECHANISM (every user's final
    * session closes via timer; inline gap closures also occur), which
    * the per-user rollup the gate sees necessarily erases. */
  private[streaming] def closedSessionsRaw(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = stageDirTimeSplitWithSentinel(s, dir)
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val oldProv = s.conf.getOption(provKey)
    s.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try withStatePartitions(s, 4) {
      import s.implicits._
      import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .transform(graft.Tables.normalizeEventTs)
        .withWatermark("ts", "1 hour")
      val typed = stream
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us")).as[SessEvent]
      val sessions = typed.groupByKey(_.user_id)
        .transformWithState(new SessionTimerProcessor(),
          TimeMode.EventTime(), OutputMode.Append())
      val name = s"graft_stream_timers_${runId.incrementAndGet()}"
      val q = sessions.toDF().writeStream.format("memory").queryName(name)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val result = s.table(name)
        .filter(col("user_id") >= 0) // the sentinel's session never closes anyway
      val rows = result.collect()
      val out = s.createDataFrame(
        java.util.Arrays.asList(rows: _*), result.schema)
      s.catalog.dropTempView(name)
      out
    } finally oldProv match {
      case Some(v) => s.conf.set(provKey, v)
      case None => s.conf.unset(provKey)
    }
  }

  /** Continuous incremental MV maintenance — q210's refresh run by the
    * STREAMING engine: each micro-batch's per-day partial aggregate is
    * MERGEd into a [[graft.sources.v2.GraftLakeCatalog]] table by a
    * real `MERGE INTO` statement executed inside foreachBatch (the
    * Delta/Iceberg production pattern for streaming upserts). Unlike
    * q118's pluggable in-memory target, NOTHING here touches the
    * driver: the partial aggregate stays a DataFrame, the upsert is a
    * distributed statement, and each micro-batch lands as one
    * immutable snapshot commit — so the MV's version history IS the
    * batch sequence, and sum/count monoid merging makes the converged
    * table equal the batch truth regardless of how the engine sliced
    * the stream. Replay idempotence per batchId is owned by
    * [[StreamingOps.replayGuarded]], same contract as q118. */
  private[streaming] def ensureStreamingMv(s: SparkSession, dir: String): String =
    staged.computeIfAbsent(dir + "#streaming_mv", { _ =>
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val src = stageDirSplit(s, dir)
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val tbl = s"graft_lake.lake.events_mv_${runId.incrementAndGet()}"
      val catConf = "spark.sql.catalog.graft_lake"
      val catCls = classOf[graft.sources.v2.GraftLakeCatalog].getName
      locally {
        val ss = org.apache.spark.sql.graft.SessionClone(s)
        ss.conf.set(catConf, catCls)
        ss.sql(s"CREATE TABLE $tbl (day DATE, n_events BIGINT, cents BIGINT)")
      }
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .transform(graft.Tables.normalizeEventTs)
      val guarded = StreamingOps.replayGuarded[DataFrame] { (batchId, batch) =>
        // the batch frame is bound to the engine's per-batch session;
        // register the catalog there and run the statement — the
        // temp view, the MERGE join, and the write are all planned
        // and executed distributed, nothing is collected
        val bs = batch.sparkSession
        bs.conf.set(catConf, catCls)
        val v = s"graft_mv_batch_$batchId"
        batch.groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n_events"),
            sum(Exact.cents(col("value"))).as("cents"))
          .createOrReplaceTempView(v)
        // null-safe key match: a NULL group key under plain equality
        // would never MATCH and re-insert every batch, silently
        // accumulating duplicate groups (the fixture has no null ts;
        // a 100 TB corpus will)
        bs.sql(
          s"""MERGE INTO $tbl m USING $v d ON m.day <=> d.day
             |WHEN MATCHED THEN UPDATE SET
             |  n_events = m.n_events + d.n_events, cents = m.cents + d.cents
             |WHEN NOT MATCHED THEN
             |  INSERT (day, n_events, cents) VALUES (d.day, d.n_events, d.cents)
             |""".stripMargin)
      }
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            batchId: Long) =>
          if (!batch.isEmpty) guarded(batchId, batch.toDF())
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      tbl
    })

  /** q214: the streaming-maintained MV, read back through the catalog;
    * oracle = the batch per-day rollup over the whole source. */
  def streamingMvRefresh(s: SparkSession, dir: String): DataFrame = {
    val tbl = ensureStreamingMv(s, dir)
    val ss = org.apache.spark.sql.graft.SessionClone(s)
    ss.conf.set("spark.sql.catalog.graft_lake",
      classOf[graft.sources.v2.GraftLakeCatalog].getName)
    ss.sql(
      s"""SELECT day, n_events, CAST(cents / 100.0 AS DOUBLE) AS total_value
         |FROM $tbl ORDER BY day""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q214_streaming_mv_refresh" -> (streamingMvRefresh _),
    "q200_streaming_timers" -> (streamingSessionTimers _),
    "q131_stream_static_join" -> (streamingStaticJoin _),
    "q184_transform_with_state" -> (streamingTransformWithState _),
    "q185_statestore_read" -> (streamingStateStoreRead _),
    "q71_streaming_daily" -> (streamingDaily _),
    "q92_streaming_dedup" -> (streamingDedup _),
    "q95_streaming_sessions" -> (streamingSessions _),
    "q96_stream_stream_join" -> (streamingPairJoin _),
    "q115_streaming_running_totals" -> (streamingRunningTotals _),
    "q118_streaming_foreachbatch" -> (streamingForeachBatch _))

  val oracle: Map[String, String] = Map(
    // the streaming-maintained MV must converge to the batch rollup
    // over the whole source, however the engine sliced the stream
    "q214_streaming_mv_refresh" ->
      """SELECT CAST(ts AS DATE) AS day, count(*) AS n_events,
        | CAST(sum(CAST(round(value*100) AS BIGINT)) / 100.0 AS DOUBLE) AS total_value
        |FROM events GROUP BY day ORDER BY day""".stripMargin,
    // identical semantics to q95 (>= gap starts a new session): the
    // timer-driven state machine must converge to the same batch truth
    "q200_streaming_timers" ->
      """SELECT user_id,
        | count(*) FILTER (WHERE gap_us IS NULL OR gap_us >= 1800000000) AS n_sessions,
        | count(*) AS n_events
        |FROM (SELECT user_id,
        |   epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |  FROM events)
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    // the static-join stream must converge to the plain batch join
    "q131_stream_static_join" ->
      """SELECT c_mktsegment, count(*) AS n_events,
        | CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS total_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q71_streaming_daily" ->
      """SELECT CAST(ts AS DATE) AS event_date, count(*) AS num_events,
        | sum(CAST(round(value*100) AS BIGINT))/100.0 AS total_value
        |FROM events GROUP BY event_date ORDER BY event_date""".stripMargin,
    // the oracle sees the SINGLE-copy table: streaming dedup over the
    // doubled input must converge to exactly this
    "q92_streaming_dedup" ->
      """SELECT CAST(ts AS DATE) AS event_date, count(*) AS num_events,
        | sum(CAST(round(value*100) AS BIGINT))/100.0 AS total_value
        |FROM events GROUP BY event_date ORDER BY event_date""".stripMargin,
    // >= on the gap: session_window merges [t, t+gap) windows only on
    // OVERLAP, so a gap of exactly the duration starts a new session
    "q95_streaming_sessions" ->
      """SELECT user_id,
        | count(*) FILTER (WHERE gap_us IS NULL OR gap_us >= 1800000000) AS n_sessions,
        | count(*) AS n_events
        |FROM (SELECT user_id,
        |   epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |  FROM events)
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q96_stream_stream_join" ->
      """SELECT a.user_id, count(*) AS n_pairs
        |FROM events a JOIN events b ON a.user_id = b.user_id
        | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
        | AND a.event_id < b.event_id
        |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin,
    // cumulative state must converge to the plain batch aggregate;
    // cents-exact accumulation makes the double engine-exact
    "q115_streaming_running_totals" ->
      """SELECT user_id, count(*) AS n_events,
        | CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS total_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // transformWithState's converged per-user profile = the batch
    // aggregate (counts, cents-exact total, distinct types, errors)
    "q184_transform_with_state" ->
      """SELECT user_id, count(*) AS n_events,
        | CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS total_value,
        | count(DISTINCT event_type) AS n_types,
        | count(*) FILTER (WHERE event_type = 'error') AS n_errors
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // the persisted ValueState read back through the statestore source
    // = the batch per-user totals
    "q185_statestore_read" ->
      """SELECT user_id, count(*) AS n_events,
        | CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS total_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // the sink's converged target = the same batch truth as q115
    "q118_streaming_foreachbatch" ->
      """SELECT user_id, count(*) AS n_events,
        | CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS total_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)
}
