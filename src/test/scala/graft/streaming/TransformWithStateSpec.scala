package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.operators.Exact

/** transformWithState (Spark 4 arbitrary stateful processing) contract:
  * the per-user profile's converged emissions equal the batch
  * aggregate, state genuinely RESUMES across micro-batches, and the
  * RocksDB provider conf is stream-scoped (restored after the run).
  */
class TransformWithStateSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q184: converged per-user profile equals the batch aggregate") {
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(provKey)
    val got = StreamingQueries.streamingTransformWithState(spark, sf)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4))))
      .toMap
    // provider conf restored — batch queries in the session untouched
    assert(spark.conf.getOption(provKey) === before)

    val want = graft.Tables(spark, sf, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (sum(Exact.cents(col("value"))).cast("double") / 100.0).as("total_value"),
        countDistinct(col("event_type")).as("n_types"),
        count(when(col("event_type") === "error", 1)).as("n_errors"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (u, g) => assert(g === want(u), s"user $u") }
  }

  test("q185: persisted ValueState read back via the statestore source equals batch totals") {
    val got = StreamingQueries.streamingStateStoreRead(spark, sf)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    val want = graft.Tables(spark, sf, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (sum(Exact.cents(col("value"))).cast("double") / 100.0).as("total_value"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(got === want)
  }

  test("state resumes across micro-batches: cumulative emissions, MapState type counts") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    implicit val sc = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[ProfileEvent]
      val q = in.toDS().groupByKey(_.user_id)
        .transformWithState(new UserProfileProcessor(),
          TimeMode.None(), OutputMode.Update())
        .toDF()
        .writeStream.format("memory").queryName("tws_out")
        .outputMode("update").start()
      try {
        in.addData(ProfileEvent(1L, "click", 100L), ProfileEvent(1L, "error", 50L))
        q.processAllAvailable()
        in.addData(ProfileEvent(1L, "click", 25L), ProfileEvent(2L, "view", 10L))
        q.processAllAvailable()
        val rows = spark.table("tws_out")
          .orderBy("user_id", "n_events").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        // user 1: batch 1 emits (2 events, 150c, 2 types, 1 error);
        // batch 2 RESUMES ValueState+MapState → (3, 175c, 2, 1).
        // user 2 first appears in batch 2.
        assert(rows.toSeq === Seq(
          (1L, 2L, 150L, 2L, 1L),
          (1L, 3L, 175L, 2L, 1L),
          (2L, 1L, 10L, 1L, 0L)))
      } finally q.stop()
    } finally before match {
      case Some(v) => spark.conf.set(provKey, v)
      case None => spark.conf.unset(provKey)
    }
  }
}
