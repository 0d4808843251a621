package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch dev runner: execute named declared queries at a given sf dir
  * and print row counts + a few rows (dev-only, not part of the
  * declared surface). Usage: Probe <sfDir> <queryName...>
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions().apply(_))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, dir)
        val rows = df.collect()
        println(s"$n: ${rows.length} rows | ${rows.take(3).mkString(" ; ")}")
      } catch {
        case e: Throwable =>
          println(s"$n FAIL: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(400)}")
      }
    }
    spark.stop()
  }
}
