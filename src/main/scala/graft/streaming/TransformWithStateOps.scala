package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

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

/** Typed input to the timer-driven sessionizer (event time in exact
  * epoch micros — the processor never touches Timestamp objects). */
case class SessEvent(user_id: Long, ts_us: Long)

/** The open session per user: first/last event time + event count. */
case class OpenSession(start_us: Long, last_us: Long, n: Long)

/** One row per CLOSED session, emitted when the session ends — either
  * by a large-enough intra-batch gap (by_timer = false) or by an
  * event-time TIMER expiry (by_timer = true). The flag exists for the
  * spec's mechanism assertions (every user's FINAL session can only
  * close by timer — no later event exists to close it inline); the
  * declared gate ignores it. */
case class ClosedSession(user_id: Long, start_us: Long, n: Long, by_timer: Boolean)

/** Gap-based sessionization driven by EVENT-TIME TIMERS — the
  * transformWithState feature q184 doesn't touch. q95 sessionizes with
  * the built-in session_window aggregation; this processor implements
  * the same semantics (a gap ≥ 30 min starts a new session) as an
  * explicit state machine that EMITS ON EXPIRY: each input batch folds
  * the user's rows (sorted — shuffled rows arrive unordered) into the
  * open session, closing intermediate sessions inline when an
  * intra-batch gap crosses the threshold, then maintains EXACTLY ONE
  * registered timer per user at (last event + gap); when the watermark
  * passes it, [[handleExpiredTimer]] emits the now-idle session and
  * clears state. Stale timers cannot fire wrong output twice over:
  * input processing deletes-and-re-registers, and the expiry handler
  * re-checks idleness against the CURRENT watermark — if new events
  * extended the session after the timer was persisted, it re-arms
  * instead of emitting (self-healing under any timer/batch interleave).
  *
  * At 100 TB the state is one (start, last, n) triple plus one timer
  * per ACTIVE user — the minimal footprint gap-sessionization admits —
  * and expired users leave the store the moment their timer fires.
  */
class SessionTimerProcessor(gapUs: Long = 1800L * 1000000L)
    extends StatefulProcessor[Long, SessEvent, ClosedSession] {

  @transient private var open: ValueState[OpenSession] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    open = getHandle.getValueState[OpenSession](
      "open", Encoders.product[OpenSession], TTLConfig.NONE)

  private def expiryMs(lastUs: Long): Long = (lastUs + gapUs) / 1000 + 1

  override def handleInputRows(
      key: Long,
      rows: Iterator[SessEvent],
      timerValues: TimerValues): Iterator[ClosedSession] = {
    val ts = rows.map(_.ts_us).toArray
    java.util.Arrays.sort(ts)
    val closed = Seq.newBuilder[ClosedSession]
    var cur = if (open.exists()) Some(open.get()) else None
    ts.foreach { t =>
      cur match {
        case None => cur = Some(OpenSession(t, t, 1))
        case Some(s) if t - s.last_us >= gapUs =>
          closed += ClosedSession(key, s.start_us, s.n, by_timer = false)
          cur = Some(OpenSession(t, t, 1))
        case Some(s) =>
          cur = Some(OpenSession(s.start_us, math.max(s.last_us, t), s.n + 1))
      }
    }
    cur.foreach { s =>
      open.update(s)
      // exactly one armed timer per user: drop whatever was registered
      // by earlier batches, then arm the current session's expiry
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
      getHandle.registerTimer(expiryMs(s.last_us))
    }
    closed.result().iterator
  }

  override def handleExpiredTimer(
      key: Long,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[ClosedSession] = {
    if (!open.exists()) return Iterator.empty
    val s = open.get()
    if (timerValues.getCurrentWatermarkInMs * 1000L >= s.last_us + gapUs) {
      open.clear()
      Iterator.single(ClosedSession(key, s.start_us, s.n, by_timer = true))
    } else {
      // the session was extended after this timer persisted — re-arm
      // for the true expiry instead of emitting a live session
      getHandle.registerTimer(expiryMs(s.last_us))
      Iterator.empty
    }
  }
}
