package graft.candy

import graft.SparkSpec
import scala.io.Source
import java.nio.file.{Files, Paths}

/** Scheduled-rerun behavior: a scheduler (cron/Airflow/dagster) that
  * fires `process` then `forecast` repeatedly — including into the SAME
  * output directory — must get identical outputs every time, with no
  * state leaking between runs (the reference DAG re-runs its whole
  * pipeline per task, candy_dag.py:80-126; our stages must be safely
  * re-runnable for that schedule to be correct).
  */
class CandyRerunSpec extends SparkSpec {

  private val refData = "/root/reference/data/dataset_22"
  private def available: Boolean = Files.isDirectory(Paths.get(refData))

  private def lines(p: String): Vector[String] = {
    val src = Source.fromFile(p)
    try src.getLines().toVector finally src.close()
  }

  test("process → forecast reruns into the same directory are byte-identical") {
    assume(available)
    val out = Files.createTempDirectory("candy_rerun").toString
    val args = List("all", s"$refData/products.csv",
      s"$refData/transactions_*.json", out)

    CandyMain.run(spark, args)
    val first = Seq("orders.csv", "order_line_items.csv", "daily_summary.csv",
      "sales_profit_forecast.csv", "forecast_metrics.csv")
      .map(f => f -> lines(s"$out/$f")).toMap

    // second scheduled firing: same inputs, same (already-populated)
    // output dir — must overwrite cleanly and reproduce every file
    CandyMain.run(spark, args)
    first.foreach { case (f, expected) =>
      assert(lines(s"$out/$f") === expected, s"rerun changed $f")
    }
  }
}
