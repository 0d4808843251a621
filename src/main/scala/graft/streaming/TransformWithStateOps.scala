package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Typed input to the per-user profile processor (cents pre-computed —
  * the processor never touches floating point, so accumulation order
  * across micro-batches cannot move the result). */
case class ProfileEvent(user_id: Long, event_type: String, cents: Long)

/** Exact-integer running totals held in ValueState. */
case class ProfileTotals(n: Long, cents: Long)

/** One per-user emission per micro-batch the user appears in. */
case class UserProfile(
    user_id: Long,
    n_events: Long,
    cents: Long,
    n_types: Long,
    n_errors: Long)

/** Per-user profile via `transformWithState` — Spark 4's arbitrary
  * stateful processing API (the successor to mapGroupsWithState:
  * typed, TTL-capable, multi-state, timer-driven, RocksDB-backed).
  * The engine's q115 covers the classic mapGroupsWithState path; this
  * processor covers the new API with BOTH state primitives a real
  * profile job needs:
  *
  *  - `ValueState[ProfileTotals]` — running (count, cents) totals;
  *  - `MapState[String, Long]` — per-event-type counts, read back for
  *    the distinct-type count and the error count. On the RocksDB
  *    provider a MapState entry is one store key per (user, type), so
  *    a 100 TB deployment pays state linear in OBSERVED (user, type)
  *    pairs, never in a dense user × type matrix.
  *
  * TimeMode.None: no timers — the gate drains bounded input with
  * AvailableNow, and expiry semantics (TTLConfig) are a deployment
  * choice orthogonal to correctness here.
  *
  * Reference scope: beyond the reference engine (batch-only ETL);
  * part of the streaming surface per SURVEY §2.5.
  */
class UserProfileProcessor extends StatefulProcessor[Long, ProfileEvent, UserProfile] {

  @transient private var totals: ValueState[ProfileTotals] = _
  @transient private var byType: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    totals = getHandle.getValueState[ProfileTotals](
      "totals", Encoders.product[ProfileTotals], TTLConfig.NONE)
    byType = getHandle.getMapState[String, Long](
      "byType", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(
      key: Long,
      rows: Iterator[ProfileEvent],
      timerValues: TimerValues): Iterator[UserProfile] = {
    var t = if (totals.exists()) totals.get() else ProfileTotals(0L, 0L)
    rows.foreach { e =>
      t = ProfileTotals(t.n + 1, t.cents + e.cents)
      val seen = if (byType.containsKey(e.event_type)) byType.getValue(e.event_type) else 0L
      byType.updateValue(e.event_type, seen + 1)
    }
    totals.update(t)
    var nTypes = 0L
    byType.keys().foreach(_ => nTypes += 1)
    val nErrors = if (byType.containsKey("error")) byType.getValue("error") else 0L
    Iterator.single(UserProfile(key, t.n, t.cents, nTypes, nErrors))
  }
}
