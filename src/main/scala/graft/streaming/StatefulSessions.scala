package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Sessionization on the `transformWithState` API (Spark 4's arbitrary
  * stateful operator — the successor to `flatMapGroupsWithState`): same
  * 30-minute-gap semantics as [[EventStreams.sessionize]], re-expressed
  * with a named [[ValueState]] plus EXPLICIT event-time timers instead
  * of the single implicit timeout. `StatefulSessionsSpec` asserts the
  * two emit identical sessions on the same input.
  *
  * Why the new API matters at scale, beyond parity:
  *
  *   - state is a set of NAMED variables (value/list/map), each a
  *     separate RocksDB column family — a processor can keep a counter
  *     and a buffer without re-serializing one blob per event;
  *   - timers are first-class and plural per key (register/delete/list),
  *     not one timeout slot — the timer-rollover below is explicit
  *     bookkeeping instead of implicit overwrite;
  *   - per-state TTL ([[TTLConfig]]) evicts idle keys in the store
  *     itself (processing-time, so unused here where determinism is
  *     asserted — the session-close timer already bounds state);
  *   - initial state, schema evolution, and the state-reader format are
  *     only available on this operator.
  *
  * Requires the RocksDB state store provider (an operator contract of
  * transformWithState itself — HDFS-backed stores don't support column
  * families); the spec pins it the way deployment config would.
  */
object StatefulSessions {

  import EventStreams.{Event, Session, SessionGapMinutes}

  /** [[EventStreams.SessionState]] plus the expiry of the timer currently
    * armed for this key: registered timers are plural, so extending a
    * session must DELETE the stale close-timer by value before arming
    * the new one (the old one would fire first and close the live
    * session early). */
  final case class TwsSessionState(startUs: Long, lastUs: Long, nEvents: Long, timerMs: Long)

  private val GapUs = SessionGapMinutes * 60L * 1000000L
  private val GapMs = SessionGapMinutes * 60L * 1000L

  private def toUs(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  final class SessionProcessor extends StatefulProcessor[Long, Event, Session] {
    @transient private var state: ValueState[TwsSessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[TwsSessionState](
        "session", Encoders.product[TwsSessionState], TTLConfig.NONE)

    private def emit(userId: Long, st: TwsSessionState): Session =
      Session(userId, new Timestamp(st.startUs / 1000L),
        new Timestamp(st.lastUs / 1000L), st.nEvents)

    override def handleInputRows(
        userId: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[Session] = {
      val sorted = rows.toSeq.sortBy(e => (toUs(e.ts), e.event_id))
      var closed = List.empty[Session]
      var cur = if (state.exists()) Some(state.get()) else None
      val staleTimer = cur.map(_.timerMs).filter(_ > 0L)
      sorted.foreach { e =>
        val us = toUs(e.ts)
        cur match {
          case Some(st) if us - st.lastUs <= GapUs =>
            cur = Some(st.copy(lastUs = math.max(st.lastUs, us), nEvents = st.nEvents + 1))
          case Some(st) =>
            closed ::= emit(userId, st)
            cur = Some(TwsSessionState(us, us, 1L, 0L))
          case None =>
            cur = Some(TwsSessionState(us, us, 1L, 0L))
        }
      }
      cur.foreach { st =>
        // Same straggler clamp as the fMGWS form: last-event + gap can sit
        // behind the watermark; a timer there would never be a future fire.
        val want = math.max(st.lastUs / 1000L + GapMs,
          timerValues.getCurrentWatermarkInMs() + 1L)
        if (!staleTimer.contains(want)) {
          staleTimer.foreach(getHandle.deleteTimer)
          getHandle.registerTimer(want)
        }
        state.update(st.copy(timerMs = want))
      }
      closed.reverse.iterator
    }

    override def handleExpiredTimer(
        userId: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Session] = {
      // A fired timer that isn't the armed one is a leftover from a
      // rollover race; only the current deadline closes the session.
      if (state.exists() && state.get().timerMs == expiredTimerInfo.getExpiryTimeInMs()) {
        val out = emit(userId, state.get())
        state.clear()
        Iterator.single(out)
      } else Iterator.empty
    }
  }

  implicit private val sessionEnc: Encoder[Session] = Encoders.product[Session]
  implicit private val longEnc: Encoder[Long] = Encoders.scalaLong

  /** The transformWithState twin of [[EventStreams.sessionize]]. */
  def sessionize(events: Dataset[Event], watermarkDelay: String = "10 minutes"): Dataset[Session] =
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor, TimeMode.EventTime(), OutputMode.Append())
}
