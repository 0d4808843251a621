package graft

import org.apache.spark.sql.SparkSession

// scratch profiling main — not part of the library surface. Times the
// streaming gate queries AS DECLARED (each internally pins its
// state-store count; see StreamingQueries.withStatePartitions — the
// 32-vs-8 store comparison that motivated that knob was measured before
// the pin existed and is recorded in its scaladoc).
object ProfStream {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    for (round <- 1 to 2) {
      time(s"daily r$round")(graft.streaming.StreamingQueries.streamingDaily(spark, dir).count())
      time(s"dedup r$round")(graft.streaming.StreamingQueries.streamingDedup(spark, dir).count())
      time(s"sessions r$round")(graft.streaming.StreamingQueries.streamingSessions(spark, dir).count())
      time(s"pairJoin r$round")(graft.streaming.StreamingQueries.streamingPairJoin(spark, dir).count())
    }
    spark.stop()
  }
}
