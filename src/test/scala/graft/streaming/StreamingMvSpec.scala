package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q214 — continuous incremental MV maintenance: each micro-batch's
  * partial aggregate MERGEs (real statement, distributed, no driver
  * rows) into a lake-catalog table; the converged MV must equal the
  * batch rollup, and the MV's version history must mirror the batch
  * sequence (one snapshot commit per non-empty micro-batch). */
class StreamingMvSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def lake(): org.apache.spark.sql.SparkSession = {
    val ss = org.apache.spark.sql.graft.SessionClone(spark)
    ss.conf.set("spark.sql.catalog.graft_lake",
      classOf[graft.sources.v2.GraftLakeCatalog].getName)
    ss
  }

  test("q214: streaming-maintained MV converges to the batch rollup") {
    val got = StreamingQueries.streamingMvRefresh(spark, sf).collect().toSeq
    val batch = graft.Tables(spark, sf, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        (sum(graft.operators.Exact.cents(col("value"))) / 100.0)
          .cast("double").as("total_value"))
      .orderBy("day").collect().toSeq
    assert(got.nonEmpty)
    assert(got === batch)
  }

  test("q214: the MV's version history mirrors the micro-batch sequence") {
    val tbl = StreamingQueries.ensureStreamingMv(spark, sf)
    val ss = lake()
    // three staged files, maxFilesPerTrigger=1 → three MERGE commits
    // on top of v0 = CREATE; every intermediate version still readable
    assert(ss.sql(s"SELECT * FROM $tbl VERSION AS OF 0").count() === 0)
    val counts = (1 to 3).map(v =>
      ss.sql(s"SELECT coalesce(sum(n_events), 0) AS n FROM $tbl VERSION AS OF $v")
        .collect()(0).getLong(0))
    // event counts accumulate strictly across commits to the source total
    assert(counts.sorted === counts)
    assert(counts.last === graft.Tables(spark, sf, "events").count())
    assert(counts.head < counts.last)
    // and v4 does not exist: exactly one commit per micro-batch
    val err = intercept[Exception] {
      ss.sql(s"SELECT * FROM $tbl VERSION AS OF 4").collect()
    }
    assert(err.getMessage.contains("no snapshot 4"))
  }
}
