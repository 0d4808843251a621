package graft

import org.apache.spark.sql.SparkSession

// scratch profiling main — not part of the library surface
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
    time("warm pairJoin sp=32")(graft.streaming.StreamingQueries.streamingPairJoin(spark, dir).count())
    time("pairJoin sp=32")(graft.streaming.StreamingQueries.streamingPairJoin(spark, dir).count())
    spark.conf.set("spark.sql.shuffle.partitions", 8)
    time("pairJoin sp=8")(graft.streaming.StreamingQueries.streamingPairJoin(spark, dir).count())
    time("pairJoin sp=8 again")(graft.streaming.StreamingQueries.streamingPairJoin(spark, dir).count())
    spark.conf.set("spark.sql.shuffle.partitions", 4)
    time("pairJoin sp=4")(graft.streaming.StreamingQueries.streamingPairJoin(spark, dir).count())
    spark.conf.set("spark.sql.shuffle.partitions", 32)
    time("sessions sp=32")(graft.streaming.StreamingQueries.streamingSessions(spark, dir).count())
    spark.conf.set("spark.sql.shuffle.partitions", 8)
    time("sessions sp=8")(graft.streaming.StreamingQueries.streamingSessions(spark, dir).count())
    spark.conf.set("spark.sql.shuffle.partitions", 32)
    time("dedup sp=32")(graft.streaming.StreamingQueries.streamingDedup(spark, dir).count())
    spark.conf.set("spark.sql.shuffle.partitions", 8)
    time("dedup sp=8")(graft.streaming.StreamingQueries.streamingDedup(spark, dir).count())
    spark.stop()
  }
}
