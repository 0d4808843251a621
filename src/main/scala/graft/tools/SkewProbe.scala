package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch dev runner for the q207 AQE skew investigation: runs the
  * skewed join, prints the final adaptive plan and the AQE log lines
  * that explain the skew decision. Dev-only. */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("skewprobe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions().apply(_))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.log4j.Logger
      .getLogger("org.apache.spark.sql.execution.adaptive")
      .setLevel(org.apache.log4j.Level.DEBUG)
    val df = graft.operators.RelationalQueries.aqeSkewJoin(spark, dir)
    df.collect()
    println("==== FINAL PLAN ====")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
