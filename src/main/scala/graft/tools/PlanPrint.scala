package graft.tools
import org.apache.spark.sql.SparkSession
object PlanPrint {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val p = graft.SparkEntry.queries(args(0))(spark, args(1))
      .queryExecution.executedPlan.toString
    println(p.split("\n").filter(l => l.contains("FileScan") || l.contains("PushedFilters")).mkString("\n"))
    spark.stop()
  }
}
