package graft.candy

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Malformed-input behavior of the schema'd ingestion paths. A
  * production feed WILL eventually ship a truncated JSON file or a CSV
  * row with a non-numeric price; the engine's contract is Spark's
  * PERMISSIVE mode — damaged fields surface as nulls, valid documents
  * around them still load, and nothing throws at scan time. These pins
  * make that contract explicit instead of incidental. */
class CandyMalformedSpec extends SparkSpec {

  test("truncated multiLine JSON yields a null-field row, not a scan failure") {
    val dir = graft.util.TempDirs.create("candy_badjson_").toString
    Files.write(Paths.get(s"$dir/transactions_20240101.json"),
      """[{"transaction_id": 1, "customer_id": 7, "timestamp": "2024-01-01 10:00:00",
        |  "items": [{"product_id": 1, "product_name": "cola", "qty": 2}]}
        |""".stripMargin.getBytes("UTF-8")) // missing closing bracket
    val good =
      """[{"transaction_id": 2, "customer_id": 8, "timestamp": "2024-01-02 10:00:00",
        |  "items": [{"product_id": 1, "product_name": "cola", "qty": null}]}]
        |""".stripMargin
    Files.write(Paths.get(s"$dir/transactions_20240102.json"), good.getBytes("UTF-8"))

    val df = CandySources.readTransactions(spark, s"$dir/transactions_*.json")
    val rows = df.collect()
    // one row per file: the corrupt one PERMISSIVE-nulls its fields,
    // the good one parses fully (including its explicit null qty)
    assert(rows.length === 2)
    val byDay = rows.map(r => r.getString(r.fieldIndex("day")) -> r).toMap
    assert(byDay("20240101").isNullAt(0), "corrupt document should null out")
    val goodRow = byDay("20240102")
    assert(goodRow.getLong(0) === 2L)
    assert(df.filter(col("transaction_id").isNull).count() === 1)
  }

  test("non-numeric CSV fields null out under the explicit schema") {
    val dir = graft.util.TempDirs.create("candy_badcsv_").toString
    Files.write(Paths.get(s"$dir/products.csv"),
      """product_id,product_name,product_category,product_subcategory,product_shape,sales_price,cost_to_make,stock
        |1,cola bottle,gummy,bottle,round,0.55,0.21,1000
        |2,broken row,gummy,bear,bear,not_a_price,0.10,50
        |3,laces,liquorice,lace,string,1.20,0.60,200
        |""".stripMargin.getBytes("UTF-8"))
    val df = CandySources.readProducts(spark, s"$dir/products.csv")
    assert(df.count() === 3, "damaged row must not drop the others")
    val bad = df.filter(col("product_id") === 2).collect().head
    assert(bad.isNullAt(bad.fieldIndex("sales_price")))
    assert(df.filter(col("sales_price").isNotNull).count() === 2)
  }
}
