package graft.candy

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.{StreamingOps, StreamItem, StreamLine}

/** The candy pipeline's per-day batch loop (src/data_processor.py:
  * 340-355 — a Python for-loop the reference calls "streaming") as an
  * actual Structured Streaming job: a file source over the daily
  * transaction JSONs, the same explode → null-filter → broadcast
  * product join, and the stateful inventory depletion carrying
  * remaining stock across micro-batches via flatMapGroupsWithState.
  *
  * With `maxFilesPerTrigger = 1` each daily file is one micro-batch in
  * file-name order, so day-over-day state evolution is EXACTLY the
  * reference's carryover-mode day loop. WITHIN a batch the stream
  * orders items by event time (monotonically_increasing_id is not
  * available on streams, and event-time order is the principled choice
  * for a stream anyway); the batch replay uses file order. The two
  * agree whenever a day's documents are time-ordered — pinned in
  * ScalaTest against the batch InventoryReplay on such a fixture.
  */
object CandyStreaming {

  /** Unbounded stream of replay outcomes. Start with e.g.
    * `.writeStream.format("memory").outputMode("append")
    *  .trigger(Trigger.AvailableNow).start()`. */
  def lineItemsStream(spark: SparkSession, productsCsv: String,
      txnDir: String, maxFilesPerTrigger: Int = 1): Dataset[StreamLine] = {
    import spark.implicits._
    val products = CandySources.readProducts(spark, productsCsv)
    val txns = spark.readStream
      .schema(CandySources.txnSchema)
      .option("multiLine", "true")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(txnDir)
    val items = txns
      .select(col("transaction_id").as("order_id"),
        unix_micros(to_timestamp(col("timestamp"))).as("ts_us"),
        posexplode(col("items")).as(Seq("pos", "item")))
      .filter(col("item.qty").isNotNull)
      .join(broadcast(products), col("item.product_id") === products("product_id"))
      .select(col("product_id"),
        col("order_id"),
        // orderable within-batch key: event time then item position
        // (items array length is bounded far below 1024)
        ((col("ts_us") * 1024) + col("pos")).as("seq"),
        col("item.qty").as("qty"),
        col("sales_price").as("unit_price"),
        col("stock"))
      .as[StreamItem]
    StreamingOps.inventoryDepletion(items)
  }
}
