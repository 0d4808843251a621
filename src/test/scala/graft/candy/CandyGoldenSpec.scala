package graft.candy

import graft.SparkSpec
import scala.io.Source
import java.nio.file.{Files, Paths}

/** Golden-output parity on the reference's own dataset (dataset_22 →
  * the CSVs under data/output, SURVEY.md §5). The golden files were produced by
  * the (skipEmptyOrders, reloadInventoryDaily, numOrders=line-items)
  * variant — CandyConfig's defaults.
  *
  * Skipped automatically if the read-only reference checkout is absent.
  */
class CandyGoldenSpec extends SparkSpec {

  private val refData = "/root/reference/data/dataset_22"
  private val refGolden = "/root/reference/data/output"
  private def available: Boolean = Files.isDirectory(Paths.get(refData))

  private def lines(p: String): Vector[String] = {
    val src = Source.fromFile(p)
    try src.getLines().toVector finally src.close()
  }

  private lazy val outDir = {
    val d = Files.createTempDirectory("candy_golden").toString
    // strictFloatParity reproduces the reference's per-day float
    // accumulation order — the daily money totals below were derived
    // with exactly that order (Python left-to-right fold + round)
    val out = CandyPipeline.run(spark,
      s"$refData/products.csv", s"$refData/transactions_*.json",
      CandyConfig(strictFloatParity = true))
    CandyPipeline.save(out, d)
    d
  }

  test("orders.csv matches golden byte-for-byte") {
    assume(available)
    val got = lines(s"$outDir/orders.csv")
    val exp = lines(s"$refGolden/orders.csv")
    assert(got.length === exp.length)
    assert(got === exp)
  }

  test("order_line_items.csv matches golden as a multiset, sorted by keys") {
    assume(available)
    val got = lines(s"$outDir/order_line_items.csv")
    val exp = lines(s"$refGolden/order_line_items.csv")
    assert(got.head === exp.head)
    // ties on (order_id, product_id) make row order within a tie
    // engine-dependent; compare as multisets + verify sort keys
    assert(got.tail.sorted === exp.tail.sorted)
    val keys = got.tail.map { l => val a = l.split(","); (a(0).toLong, a(1).toInt) }
    assert(keys === keys.sorted)
  }

  /** The golden daily_summary.csv is internally inconsistent with the
    * golden orders/order_line_items CSVs: re-aggregating the golden
    * line items gives day-1 sales 60,923.13, but the golden summary
    * says 217,492.91, and the ratio varies by day (3.57/3.53/3.40…) —
    * so the summary was generated from a different products/price
    * version than dataset_22. num_orders and dates DO agree with the
    * golden line items. We therefore pin: (a) dates + num_orders
    * against the golden file, (b) money totals against values
    * independently re-aggregated from the golden line items + the
    * dataset_22 products table (computed outside this engine).
    */
  test("daily_summary matches golden dates/num_orders and golden-line-item-derived totals") {
    assume(available)
    val got = lines(s"$outDir/daily_summary.csv")
    val exp = lines(s"$refGolden/daily_summary.csv")
    assert(got.head === "date,num_orders,total_sales,total_profit")
    assert(got.map(_.split(",").take(2).mkString(",")) ===
      exp.map(_.split(",").take(2).mkString(",")))
    val expected = Seq(
      ("2024-02-01", 60923.13, 26048.32), ("2024-02-02", 40988.37, 17461.63),
      ("2024-02-03", 11095.05, 4733.83), ("2024-02-04", 16407.66, 7073.4),
      ("2024-02-05", 74573.07, 31978.53), ("2024-02-06", 81704.92, 34772.3),
      ("2024-02-07", 34041.17, 14383.43), ("2024-02-08", 55915.97, 24152.26),
      ("2024-02-09", 22216.95, 9412.4), ("2024-02-10", 45455.11, 19492.94))
    val gotVals = got.tail.map { l =>
      val a = l.split(","); (a(0), a(2).toDouble, a(3).toDouble)
    }
    assert(gotVals === expected)
  }

  test("ordersEnriched left-joins customer attributes onto every order (J2)") {
    assume(available)
    val orders = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$outDir/orders.csv")
    val customers = CandySources.readCustomers(spark, s"$refData/customers.csv")
    val enriched = CandyPipeline.ordersEnriched(orders, customers)
    assert(enriched.count() === orders.count())
    assert(enriched.columns.toSeq === Seq("order_id", "order_datetime",
      "customer_id", "first_name", "last_name", "email", "total_amount", "num_items"))
    // every order's customer id (1..30) resolves
    assert(enriched.filter(org.apache.spark.sql.functions.col("email").isNull).count() === 0)
  }

  test("products_updated.csv has all products with sane stock") {
    assume(available)
    val got = lines(s"$outDir/products_updated.csv")
    assert(got.head === "product_id,product_name,current_stock")
    assert(got.tail.length === 36)
    val stocks = got.tail.map(_.split(",").last.toInt)
    assert(stocks.forall(_ >= 0))
  }
}
