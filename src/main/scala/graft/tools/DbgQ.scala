package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch dev runner: print a declared query's result table (TimeQ's
  * sibling — that one times, this one shows). Dev-only, not part of
  * the declared surface. Usage: DbgQ <queryName> <sfDir> [limit]
  */
object DbgQ {
  def main(args: Array[String]): Unit = {
    val limit = if (args.length > 2) args(2).toInt else 50
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(args(0))(spark, args(1)).show(limit, false)
    spark.stop()
  }
}
