package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class TestEvent(ts: Timestamp, user_id: Long, value: Double)

/** Streaming operator semantics via MemoryStream micro-batches:
  * event-time windows + watermark, session windows, and stateful
  * inventory replay carrying stock across batches.
  */
class StreamingOpsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dailySummary: event-time days, arrival order irrelevant within watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[TestEvent]
    val q = StreamingOps.dailySummary(in.toDF(), watermark = "10 days")
      .writeStream.format("memory").queryName("ds_out")
      .outputMode("complete").start()
    try {
      // batch 1: two days interleaved out of order
      in.addData(
        TestEvent(ts("2024-01-02 08:00:00"), 1, 10.0),
        TestEvent(ts("2024-01-01 09:00:00"), 1, 1.0),
        TestEvent(ts("2024-01-02 10:00:00"), 2, 20.0))
      q.processAllAvailable()
      // batch 2: more day-1 data arriving late (within watermark)
      in.addData(TestEvent(ts("2024-01-01 23:00:00"), 3, 2.0))
      q.processAllAvailable()
      val rows = spark.table("ds_out")
        .select("date", "num_events", "total_value")
        .orderBy("date").collect()
        .map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2)))
      assert(rows.toSeq === Seq(
        ("2024-01-01", 2L, 3.0),
        ("2024-01-02", 2L, 30.0)))
    } finally q.stop()
  }

  test("sessionize: 30-min gap splits sessions per user") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[TestEvent]
    val q = StreamingOps.sessionize(in.toDF(), gap = "30 minutes", watermark = "1 day")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("complete").start()
    try {
      in.addData(
        TestEvent(ts("2024-01-01 08:00:00"), 1, 1.0),
        TestEvent(ts("2024-01-01 08:10:00"), 1, 2.0), // same session
        TestEvent(ts("2024-01-01 09:30:00"), 1, 3.0), // new session (80-min gap)
        TestEvent(ts("2024-01-01 08:05:00"), 2, 4.0)) // other user
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .select("user_id", "n_events", "session_value")
        .orderBy("user_id", "session_start").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(rows.toSeq === Seq((1L, 2L, 3.0), (1L, 1L, 3.0), (2L, 1L, 4.0)))
    } finally q.stop()
  }

  test("inventoryDepletion: stock depletes across micro-batches; later smaller order fulfills") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[StreamItem]
    val q = StreamingOps.inventoryDepletion(in.toDS())
      .writeStream.format("memory").queryName("inv_out")
      .outputMode("append").start()
    try {
      // product 1 stock 10: batch1 takes 6, batch2 wants 5 (cancel), then 3 (ok)
      in.addData(StreamItem(1, 101, 1, 6, 2.5, 10))
      q.processAllAvailable()
      in.addData(
        StreamItem(1, 102, 2, 5, 2.5, 10),
        StreamItem(1, 103, 3, 3, 2.5, 10))
      q.processAllAvailable()
      val rows = spark.table("inv_out")
        .orderBy("seq").collect()
        .map(r => (r.getLong(1), r.getInt(3), r.getBoolean(5)))
      assert(rows.toSeq === Seq(
        (101L, 6, true),   // 10 → 4
        (102L, 0, false),  // 5 > 4 → cancelled, stock unchanged
        (103L, 3, true)))  // 3 ≤ 4 → fulfilled
    } finally q.stop()
  }

  test("file-source stream over testdata events == batch daily summary") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = "/root/testdata/sf0.001"
    // nanos-ts parquet must be read as long and truncated (see Tables)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the file stream source requires a DIRECTORY: stage the single
    // parquet file into one
    val staged = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("events.parquet"))
    val schema = spark.read.parquet(staged.toString).schema
    val stream = spark.readStream.schema(schema).parquet(staged.toString)
      .transform(graft.Tables.normalizeEventTs)
    val q = StreamingOps.dailySummary(stream, watermark = "365 days")
      .writeStream.format("memory").queryName("fs_out")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      assert(q.awaitTermination(120000), "stream did not drain in time")
      val streamed = spark.table("fs_out")
        .select("date", "num_events", "total_value").orderBy("date").collect()
        .map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2)))
      val batch = graft.Tables(spark, dir, "events")
        .groupBy(to_date(col("ts")).as("date"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("tv"))
        .orderBy("date").collect()
        .map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2)))
      assert(streamed.length === batch.length)
      streamed.zip(batch).foreach { case ((d1, n1, v1), (d2, n2, v2)) =>
        assert(d1 === d2); assert(n1 === n2)
        assert(math.abs(v1 - v2) < 0.02, s"$d1: $v1 vs $v2")
      }
    } finally q.stop()
  }

  test("dedupStream: duplicate ids dropped across batches within watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[TestEvent]
    val q = StreamingOps.dedupStream(in.toDF(), "1 hour", Seq("user_id"))
      .writeStream.format("memory").queryName("dd_out")
      .outputMode("append").start()
    try {
      in.addData(
        TestEvent(ts("2024-01-01 08:00:00"), 1, 1.0),
        TestEvent(ts("2024-01-01 08:01:00"), 1, 2.0), // dup user in batch
        TestEvent(ts("2024-01-01 08:02:00"), 2, 3.0))
      q.processAllAvailable()
      in.addData(TestEvent(ts("2024-01-01 08:03:00"), 1, 4.0)) // dup across batches
      q.processAllAvailable()
      assert(spark.table("dd_out").select("user_id").collect()
        .map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    } finally q.stop()
  }

  test("runningUserTotals: cumulative state across batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[TestEvent]
    val q = StreamingOps.runningUserTotals(in.toDF())
      .toDF("user_id", "total", "n")
      .writeStream.format("memory").queryName("rut_out")
      .outputMode("update").start()
    try {
      in.addData(TestEvent(ts("2024-01-01 08:00:00"), 1, 10.5))
      q.processAllAvailable()
      in.addData(TestEvent(ts("2024-01-01 09:00:00"), 1, 4.5),
        TestEvent(ts("2024-01-01 09:01:00"), 2, 7.0))
      q.processAllAvailable()
      // last update per user wins
      val rows = spark.table("rut_out")
        .groupBy("user_id").agg(max("total").as("total"), max("n").as("n"))
        .orderBy("user_id").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      assert(rows.toSeq === Seq((1L, 15.0, 2L), (2L, 7.0, 1L)))
    } finally q.stop()
  }

  test("q200 session timers: both closure mechanisms fire; rollup equals batch truth") {
    val sf = "/root/testdata/sf0.001"
    val raw = StreamingQueries.closedSessionsRaw(spark, sf).cache()
    val users = graft.Tables(spark, sf, "events")
      .select(countDistinct(col("user_id"))).collect().head.getLong(0)
    val byTimer = raw.filter(col("by_timer")).count()
    val inline = raw.filter(!col("by_timer")).count()
    // every user's FINAL session has no later event to close it inline —
    // only an expired event-time timer can emit it. A timer regression
    // (never firing, firing on stale state, emitting live sessions)
    // breaks this invariant before it breaks the rollup.
    assert(byTimer >= users, s"timer closures $byTimer < users $users")
    // and the intra-batch gap path must ALSO occur on a 30-day fixture
    assert(inline > 0L, "no inline gap closures — time-split staging broken?")
    // end-to-end: per-user rollup == batch lag-window sessionization
    val got = raw.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n")).as("n_events"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ev = graft.Tables(spark, sf, "events")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val expected = ev
      .withColumn("gap_us",
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .groupBy(col("user_id"))
      .agg(sum(when(col("gap_us").isNull ||
          col("gap_us") >= 1800L * 1000000L, 1L).otherwise(0L)).as("n_sessions"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    raw.unpersist()
    assert(got.toSeq === expected.toSeq)
  }
}
