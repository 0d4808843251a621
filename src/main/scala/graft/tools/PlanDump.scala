package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: print the executed plan of named declared queries. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions().apply(_))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (flags, names) = args.tail.partition(_.startsWith("--"))
    val exec = flags.contains("--exec")
    names.foreach { n =>
      println(s"===== $n =====")
      try {
        val df = graft.SparkEntry.queries(n)(spark, dir)
        if (exec) df.collect() // AQE-final plan (exchange reuse visible)
        println(df.queryExecution.executedPlan.toString)
      } catch { case e: Throwable => println("FAIL: " + e.getMessage) }
    }
    spark.stop()
  }
}
