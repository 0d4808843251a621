package graft.candy

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming candy replay == batch carryover replay on the same daily
  * files (one micro-batch per day ⇒ identical state evolution).
  */
class CandyStreamingSpec extends SparkSpec {

  private val productsCsv =
    """product_id,product_name,product_category,product_subcategory,product_shape,sales_price,cost_to_make,stock
      |1,Alpha,C,S,Std,2.50,1.00,10
      |2,Beta,C,S,Std,4.00,2.50,3
      |""".stripMargin

  private val day1 =
    """[
      |{"transaction_id": 101, "customer_id": 1, "timestamp": "2024-01-01T08:00:00.000001",
      | "items": [{"product_id": 1, "product_name": "Alpha", "qty": 6},
      |            {"product_id": 2, "product_name": "Beta", "qty": 2}]},
      |{"transaction_id": 102, "customer_id": 2, "timestamp": "2024-01-01T09:00:00.000002",
      | "items": [{"product_id": 2, "product_name": "Beta", "qty": 2},
      |            {"product_id": 2, "product_name": "Beta", "qty": 1}]}
      |]""".stripMargin

  private val day2 =
    """[
      |{"transaction_id": 201, "customer_id": 1, "timestamp": "2024-01-02T01:00:00.000001",
      | "items": [{"product_id": 1, "product_name": "Alpha", "qty": 6},
      |            {"product_id": 1, "product_name": "Alpha", "qty": 3}]}
      |]""".stripMargin

  test("streaming day-per-batch replay equals batch carryover replay") {
    val d = Files.createTempDirectory("candy_stream")
    val txnDir = Files.createDirectory(d.resolve("txns"))
    Files.writeString(d.resolve("products.csv"), productsCsv)
    Files.writeString(txnDir.resolve("transactions_20240101.json"), day1)
    Files.writeString(txnDir.resolve("transactions_20240102.json"), day2)

    val q = CandyStreaming.lineItemsStream(spark,
      d.resolve("products.csv").toString, txnDir.toString)
      .writeStream.format("memory").queryName("candy_stream_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain")

    val streamed = spark.table("candy_stream_out")
      .select("order_id", "product_id", "quantity", "fulfilled")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getBoolean(3)))
      .sortBy(r => (r._1, r._2, r._3)).toSeq

    // batch carryover reference on the same files
    val batch = CandyPipeline.run(spark,
      d.resolve("products.csv").toString, s"$txnDir/transactions_*.json",
      CandyConfig(reloadInventoryDaily = false, skipEmptyOrders = false,
        numOrdersIsLineItems = false))
    val expected = batch.orderLineItems
      .select(col("order_id"), col("product_id"), col("quantity"),
        (col("quantity") > 0).as("fulfilled"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getBoolean(3)))
      .sortBy(r => (r._1, r._2, r._3)).toSeq

    assert(streamed === expected)
    // day-2: 10-6=4 left after day-1; 6 cancels, 3 fulfills (carryover)
    assert(streamed.filter(_._1 == 201L).map(r => (r._3, r._4)).sorted ===
      Seq((0, false), (3, true)))
  }
}
