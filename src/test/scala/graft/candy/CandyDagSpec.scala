package graft.candy

import graft.SparkSpec
import graft.util.StageResult
import java.nio.file.{Files, Paths}

/** CandyDag against the reference's dataset_22: the four-stage chain
  * produces the full artifact set, and a re-run is all marker-skips.
  */
class CandyDagSpec extends SparkSpec {

  private val refData = "/root/reference/data/dataset_22"

  test("load >> process >> forecast >> cleanup produces all artifacts; rerun skips") {
    val out = Files.createTempDirectory("candy_dag_out").toString
    val dag = CandyDag.build(spark,
      s"$refData/products.csv", s"$refData/transactions_*.json", out)
    val r1 = dag.run().toMap
    assert(r1.values.forall(_ === StageResult.Ran), r1.toString)
    Seq("daily_summary.csv", "sales_profit_forecast.csv", "forecast_metrics.csv")
      .foreach { f =>
        assert(Files.exists(Paths.get(out, f)), s"missing artifact $f")
      }
    // second run: resume logic finds every stage done
    val r2 = CandyDag.build(spark,
      s"$refData/products.csv", s"$refData/transactions_*.json", out).run().toMap
    assert(r2.values.forall(_ === StageResult.SkippedDone), r2.toString)
  }

  test("a bad input fails load_data and skips the whole chain") {
    val out = Files.createTempDirectory("candy_dag_bad").toString
    val r = CandyDag.build(spark,
      s"$refData/products.csv", s"$out/no_such_*.json", out).run().toMap
    assert(r("load_data").isInstanceOf[StageResult.Failed])
    assert(r("process_data") === StageResult.SkippedUpstreamFailed)
    assert(r("generate_forecast") === StageResult.SkippedUpstreamFailed)
    assert(r("cleanup") === StageResult.SkippedUpstreamFailed)
  }
}
