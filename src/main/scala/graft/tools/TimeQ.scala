package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch dev runner: time named declared queries under the exact
  * Bench configuration (local[32], 32 shuffle partitions, 1 MB splits)
  * without paying the full 147-query sweep. Dev-only, not part of the
  * declared surface. Usage: TimeQ <sfDir> <queryName...> [+explain]
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val explain = args.contains("+explain")
    val names = args.tail.filterNot(_ == "+explain").toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_SPLIT", "1m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the table caches the way Bench does for a fair read
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, dir).count()
      catch { case e: Throwable => println(s"$n warm FAIL: $e") }
    }
    names.foreach { n =>
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, dir).count()
        println(f"$n run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      if (explain)
        graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
