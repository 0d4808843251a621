package graft.candy

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Variant flags for the semantics forks documented in SURVEY.md §5:
  * the golden outputs were produced by (skipEmptyOrders=true,
  * reloadInventoryDaily=true, numOrdersSemantics=LineItems); the
  * literal current reference code is (false, false, Transactions).
  */
case class CandyConfig(
    reloadInventoryDaily: Boolean = true,
    skipEmptyOrders: Boolean = true,
    numOrdersIsLineItems: Boolean = true,
    /** Reproduce the reference's float accumulation ORDER in the daily
      * money sums (collect_list + in-order fold — per-group state grows
      * with the day's order count; only for byte-parity experiments).
      * Default false: order-independent exact integer-cents sums
      * (operators/Exact) — O(1) aggregation state per group, the only
      * shape that survives 10⁶+ orders/day. The two differ by at most
      * one trailing cent on rounding-boundary days. */
    strictFloatParity: Boolean = false)

case class CandyOutputs(
    orders: DataFrame,
    orderLineItems: DataFrame,
    dailySummary: DataFrame,
    productsUpdated: DataFrame,
    /** Reference total_cancelled_items counter (data_processor.py:439,
      * reported at main.py:63-67) — a count over the replay output
      * rather than a mutable driver global. */
    totalCancelledItems: () => Long)

/** End-to-end candy-store ETL (reference src/main.py:141-219 +
  * data_processor.py), re-expressed as declarative Spark over the
  * nested-JSON transaction scan — no collect(), no driver loops, no
  * per-day union chain. The one genuinely sequential operator
  * (inventory depletion) is InventoryReplay; everything else is
  * groupBy/join/window built-ins.
  *
  * Float parity: the reference accumulates doubles left-to-right in
  * replay order (order totals at data_processor.py:433-436, daily sums
  * at 467-468). Plain sum() re-associates and can differ in the last
  * ulp, which format_number/round can then turn into a visible cent.
  * Order totals always fold collect_list'ed values in replay order —
  * per-order lists are tiny (≤5 items, bounded by the transaction
  * schema), so that state is O(1). Daily sums are gated by
  * CandyConfig.strictFloatParity: the default is order-independent
  * exact integer-cents sums (operators/Exact — O(1) per-group state,
  * the shape that survives 10⁶+ orders/day); strict mode reproduces
  * the reference's per-day accumulation order for byte-parity
  * experiments and is the one knowingly non-scalable path.
  */
object CandyPipeline {

  /** Left-to-right double fold of `field` from an array of structs
    * sorted by the struct's leading key fields. */
  private def foldInOrder(sortedStructs: Column, field: String): Column =
    aggregate(sortedStructs, lit(0.0), (acc, x) => acc + x.getField(field))

  def run(spark: SparkSession, productsCsv: String, transactionsGlob: String,
          config: CandyConfig = CandyConfig()): CandyOutputs = {

    val products = CandySources.readProducts(spark, productsCsv)
    val transactions = CandySources.readTransactions(spark, transactionsGlob)
    build(spark, products, transactions, config)
  }

  def build(spark: SparkSession, products: DataFrame, transactions: DataFrame,
            config: CandyConfig): CandyOutputs = {

    val lineItems = InventoryReplay.replay(
      InventoryReplay.itemEvents(transactions, products),
      config.reloadInventoryDaily)
      .toDF()
      .cache() // reused by orders, summary, and the final snapshot

    // A1 per-order rollup. total_amount folds line totals in item (pos)
    // order = the reference's accumulation order; cancelled items
    // contribute 0.0 exactly as in the loop.
    val perOrderAgg = lineItems
      .groupBy(col("order_id"))
      .agg(
        foldInOrder(sort_array(collect_list(struct(col("pos"), col("line_total")))),
          "line_total").as("total_amount"),
        foldInOrder(sort_array(collect_list(struct(col("pos"), col("line_profit")))),
          "line_profit").as("order_profit"),
        count(when(col("fulfilled"), 1)).cast("int").as("num_items"),
        count(lit(1)).cast("int").as("num_line_items"))

    // Every transaction yields an order row (all-null / unknown-only
    // transactions keep total 0.0, num_items 0 — data_processor.py
    // 457-465), unless the golden skip variant drops fulfilled-nothing
    // transactions (the commented block at 454-456).
    val ordersAll = transactions
      .select(col("transaction_id").as("order_id"), col("customer_id"),
        col("timestamp").as("order_datetime"), col("day"), col("seq"))
      .join(perOrderAgg, Seq("order_id"), "left")
      .select(col("order_id"), col("order_datetime"), col("customer_id"),
        coalesce(col("total_amount"), lit(0.0)).as("total_amount"),
        coalesce(col("order_profit"), lit(0.0)).as("order_profit"),
        coalesce(col("num_items"), lit(0)).as("num_items"),
        coalesce(col("num_line_items"), lit(0)).as("num_line_items"),
        col("day"), col("seq"))

    val orders =
      (if (config.skipEmptyOrders) ordersAll.filter(col("num_items") > 0) else ordersAll)
        .cache()

    // A2 daily summary. date = date of the day's first emitted order
    // (data_processor.py:478-480); sums fold per-order totals in seq
    // (replay) order; bround = Python round (HALF_EVEN). The golden
    // num_orders variant counts the line items emitted that day
    // (SURVEY.md §5.3) — from the lineItems frame, since line items of
    // skipped orders still exist (appended before the skip check).
    def dailyMoney(field: String): Column =
      if (config.strictFloatParity)
        bround(foldInOrder(sort_array(collect_list(struct(col("seq"), col(field)))),
          field), 2)
      else
        graft.operators.Exact.sumMoney(col(field))
    val dailyAgg = orders
      .groupBy(col("day"))
      .agg(
        to_date(substring(min_by(col("order_datetime"), col("seq")), 1, 10)).as("date"),
        count(lit(1)).cast("int").as("n_txn_orders"),
        dailyMoney("total_amount").as("total_sales"),
        dailyMoney("order_profit").as("total_profit"))
    val dailySummary = (if (config.numOrdersIsLineItems) {
      val lineCounts = lineItems.groupBy(col("day"))
        .agg(count(lit(1)).cast("int").as("n_line_items"))
      dailyAgg.join(lineCounts, Seq("day"), "left")
        .withColumn("num_orders", coalesce(col("n_line_items"), lit(0)))
    } else dailyAgg.withColumn("num_orders", col("n_txn_orders")))
      .select("date", "num_orders", "total_sales", "total_profit")
      .orderBy("date")

    // A4 products_updated: initial stock minus fulfilled quantity — all
    // days in carryover mode; only the final day's batch in daily-reload
    // mode (state after the last reload).
    val lastDay = if (config.reloadInventoryDaily)
      lineItems.agg(max(col("day"))).first().getString(0)
    else ""
    val consumed = (if (config.reloadInventoryDaily)
      lineItems.filter(col("day") === lastDay) else lineItems)
      .filter(col("fulfilled"))
      .groupBy(col("product_id"))
      .agg(sum(col("quantity")).as("sold"))
    val productsUpdated = products
      .join(consumed, Seq("product_id"), "left")
      .select(col("product_id"), col("product_name"),
        (col("stock") - coalesce(col("sold"), lit(0L))).cast("int").as("current_stock"))
      .orderBy("product_id")

    // Output projections/formatting (data_processor.py:518-551):
    // format_number 2dp strings for money, raw timestamp string kept.
    val ordersOut = orders
      .select(col("order_id"), col("order_datetime"), col("customer_id"),
        format_number(col("total_amount"), 2).as("total_amount"), col("num_items"))
      .orderBy("order_id")

    val lineItemsOut = lineItems
      .select(col("order_id"), col("product_id"), col("quantity"), col("unit_price"),
        format_number(col("line_total"), 2).as("line_total"))
      .orderBy("order_id", "product_id")

    CandyOutputs(ordersOut, lineItemsOut, dailySummary, productsUpdated,
      () => lineItems.filter(!col("fulfilled")).count())
  }

  /** Orders enriched with customer attributes — the join the reference
    * loads customers for but never executes (the comment at
    * data_processor.py:519 admits the intent; SURVEY.md §2.3 J2). Left
    * join: an order with an unknown customer id survives with null
    * attributes. The customer dim broadcasts. */
  def ordersEnriched(orders: DataFrame, customers: DataFrame): DataFrame =
    orders.join(
      broadcast(customers.select(col("customer_id"), col("first_name"),
        col("last_name"), col("email"))),
      Seq("customer_id"), "left")
      .select(col("order_id"), col("order_datetime"), col("customer_id"),
        col("first_name"), col("last_name"), col("email"),
        col("total_amount"), col("num_items"))
      .orderBy("order_id")

  /** Write the four output tables as single-file CSVs (reference
    * save_to_csv, data_processor.py:572-614). */
  def save(out: CandyOutputs, outputDir: String): Unit = {
    SingleFileCsv.write(out.orders, outputDir, "orders.csv")
    SingleFileCsv.write(out.orderLineItems, outputDir, "order_line_items.csv")
    SingleFileCsv.write(out.dailySummary, outputDir, "daily_summary.csv")
    SingleFileCsv.write(out.productsUpdated, outputDir, "products_updated.csv")
  }
}
