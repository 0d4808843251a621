package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** A transaction item event on the stream (the streaming analog of
  * candy.ItemEvent — already exploded/null-filtered/product-joined). */
case class StreamItem(
    product_id: Int,
    order_id: Long,
    seq: Long,
    qty: Int,
    unit_price: Double,
    stock: Int)

/** Replay outcome emitted by the streaming inventory operator. */
case class StreamLine(
    product_id: Int,
    order_id: Long,
    seq: Long,
    quantity: Int,
    line_total: Double,
    fulfilled: Boolean)

/** Per-product inventory state carried across micro-batches. */
case class InvState(remaining: Int)

/** Structured Streaming operators (SURVEY.md §1.1: the reference
  * simulates streaming with a Python for-loop over daily batches,
  * data_processor.py:340-355 — these are the real thing).
  *
  * All operators take an unbounded DataFrame (from readStream) and
  * return a transformed unbounded DataFrame for writeStream; they also
  * work unchanged on bounded frames, which is how the batch/streaming
  * parity tests pin their semantics.
  */
object StreamingOps {

  /** Event-time daily rollup with a watermark bounding state: the
    * streaming form of the candy daily_summary (A2). Late events beyond
    * the watermark are dropped; everything else lands in its event-time
    * day regardless of arrival order. */
  def dailySummary(events: DataFrame, watermark: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(
        count(lit(1)).as("num_events"),
        approx_count_distinct("user_id").as("approx_users"),
        round(sum("value"), 2).as("total_value"))
      .select(to_date(col("w.start")).as("date"),
        col("num_events"), col("approx_users"), col("total_value"))

  /** Gap-based sessionization with the native session_window — state
    * is bounded by the watermark, sessions close after `gap`
    * inactivity. Streaming analog of RelationalQueries.sessionize. */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
                 watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("session_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("session_value"))

  /** Streaming inventory depletion: the candy replay (A3) as a
    * flatMapGroupsWithState keyed by product — per-product remaining
    * stock is the only state, exactly as in the batch InventoryReplay,
    * but carried across micro-batches indefinitely. Items inside one
    * micro-batch are replayed in `seq` order (the iterator order within
    * a batch is not guaranteed, so the handler sorts its group buffer —
    * per product per batch, which is small by construction). */
  def inventoryDepletion(items: Dataset[StreamItem]): Dataset[StreamLine] = {
    import items.sparkSession.implicits._
    items
      .groupByKey(_.product_id)
      .flatMapGroupsWithState[InvState, StreamLine](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (productId: Int, batch: Iterator[StreamItem], state: GroupState[InvState]) =>
          val events = batch.toSeq.sortBy(e => (e.seq, e.order_id))
          if (events.isEmpty) Iterator.empty
          else {
            var remaining = state.getOption.map(_.remaining)
              .getOrElse(events.head.stock)
            val out = events.map { e =>
              if (remaining >= e.qty) {
                remaining -= e.qty
                StreamLine(productId, e.order_id, e.seq, e.qty,
                  e.unit_price * e.qty, fulfilled = true)
              } else
                StreamLine(productId, e.order_id, e.seq, 0, 0.0, fulfilled = false)
            }
            state.update(InvState(remaining))
            out.iterator
          }
      }
  }

  /** Streaming ingestion dedup: drop events whose `idCols` were already
    * seen, with state bounded by the event-time watermark — the
    * streaming form of exact dedup for an always-on ingestion pipeline
    * (state holds only ids newer than the watermark, so it doesn't grow
    * without bound). */
  def dedupStream(events: DataFrame, watermark: String, idCols: Seq[String]): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols)

  /** Wrap a batch-apply callback with a seen-batchId replay guard: a
    * redelivered batchId is a no-op, so at-least-once delivery (Spark
    * re-invoking foreachBatch for a batch whose commit didn't land in
    * the checkpoint) cannot double-count. The guard is in-process —
    * it covers redelivery within one query run, which is the case the
    * streaming engine actually produces; across a RESTART the
    * checkpoint replays at most the last uncommitted batch, and a
    * durable target must persist the max applied batchId alongside the
    * data (the transactional `txnVersion` pattern of lakehouse MERGE
    * sinks) — that half necessarily lives with the store. */
  def replayGuarded[T](applyBatch: (Long, T) => Unit): (Long, T) => Unit = {
    val applied = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    (batchId: Long, payload: T) =>
      if (applied.add(batchId)) applyBatch(batchId, payload)
  }

  /** Stream a keyed aggregate into an external table with foreachBatch
    * MERGE semantics — the production sink pattern for everything that
    * is not an append-only log: each micro-batch's per-key partials
    * upsert into the target keyed on `keyCol` (insert new keys, fold
    * into existing ones). Idempotence per batchId is owned HERE:
    * `applyBatch` is wrapped with [[replayGuarded]] before the sink
    * ever calls it, so a caller cannot forget the replay check and
    * silently double-count on at-least-once redelivery (see
    * replayGuarded's scaladoc for the restart caveat). The upsert
    * itself is the same full-outer-join MERGE shape as CdcOps.cdcMerge
    * — here applied per micro-batch, which is exactly what a
    * Delta/Iceberg `MERGE INTO` inside foreachBatch does at cluster
    * scale. The target is pluggable (a function) so tests can use an
    * in-memory map and production a parquet/lakehouse writer.
    *
    * Returns the guarded apply function the sink used, so callers can
    * feed it simulated redeliveries and observe the no-op. */
  def foreachBatchUpsert(
      events: DataFrame,
      applyBatch: (Long, Seq[(Long, Long, Double)]) => Unit
  ): (Long, Seq[(Long, Long, Double)]) => Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val guarded = replayGuarded(applyBatch)
    val q = events
      .writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // reduce INSIDE the batch first: the sink sees one row per key
        // per batch, never the raw stream volume
        val partials = batch
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"),
            (sum(graft.operators.Exact.cents(col("value"))) / 100.0).as("v"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          .toSeq
        guarded(batchId, partials)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    guarded
  }

  /** Running per-user spend with mapGroupsWithState (update-mode
    * analytics state machine: emits the latest cumulative value per
    * user per batch). State accumulates EXACT INTEGER CENTS — a
    * streaming engine gives no fold-order guarantees across
    * micro-batches, so a double accumulator would drift by arrival
    * order; integer cents make every emission order-independent and
    * engine-exact (the same Exact.cents stance as the batch
    * aggregates), which is what lets q115 gate this operator against
    * a batch DuckDB oracle. */
  def runningUserTotals(events: DataFrame): Dataset[(Long, Double, Long)] = {
    import events.sparkSession.implicits._
    events.select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long), (Long, Double, Long)](
        GroupStateTimeout.NoTimeout()) {
        (user: Long, batch: Iterator[(Long, Double)], state: GroupState[(Long, Long)]) =>
          val (prevCents, prevN) = state.getOption.getOrElse((0L, 0L))
          var c = prevCents; var n = prevN
          batch.foreach { case (_, v) => c += math.round(v * 100.0); n += 1 }
          state.update((c, n))
          (user, c / 100.0, n)
      }
  }
}
