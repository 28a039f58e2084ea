package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, MapState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Multi-variable keyed state on transformWithState: a per-user profile
  * kept as TWO named state variables — a [[MapState]] of per-event-type
  * running counts and a bounded [[ListState]] of the most recent event
  * ids — something the single-blob `flatMapGroupsWithState` API could
  * only fake by re-serializing one growing case class per event. Each
  * variable is its own RocksDB column family: the map counter update
  * touches ONE (type → count) entry, not the whole profile.
  *
  * Emission contract (what makes this testable): one row per input
  * event carrying the running count AFTER that event for its type plus
  * the recent-id window. Per user, events are processed in (ts,
  * event_id) order within a batch and state carries across batches, so
  * for per-key in-order arrival the output is INDEPENDENT of micro-
  * batch boundaries — `UserProfilesSpec` asserts the same input split
  * 1-batch vs N-batch emits identical rows, and that the running
  * counts replay the batch window query exactly.
  *
  * Scale posture: state per user is O(#types) map entries + a
  * RecentKeep-bounded list — both independent of stream length; keyed
  * by high-cardinality user_id; idle users are dropped wholesale by an
  * event-time timer past `stateHorizonMinutes` (map + list + timer in
  * one clear), the same bounded-state contract as the sessionizers.
  */
object UserProfiles {

  import EventStreams.Event

  /** Running profile row emitted per event. */
  final case class ProfileUpdate(
      user_id: Long, event_id: Long, event_type: String,
      n_type: Long, recent_ids: Seq[Long])

  /** Most recent event ids kept per user (newest last). */
  val RecentKeep = 3

  private def toUs(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  final class ProfileProcessor(stateHorizonMinutes: Long)
      extends StatefulProcessor[Long, Event, ProfileUpdate] {
    @transient private var counts: MapState[String, Long] = _
    @transient private var recent: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[String, Long](
        "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      recent = getHandle.getListState[Long]("recent", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        userId: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[ProfileUpdate] = {
      val sorted = rows.toSeq.sortBy(e => (toUs(e.ts), e.event_id))
      var window = recent.get().toVector
      var lastUs = -1L
      val out = sorted.map { e =>
        lastUs = toUs(e.ts)
        val n = (if (counts.containsKey(e.event_type)) counts.getValue(e.event_type)
                 else 0L) + 1L
        counts.updateValue(e.event_type, n)
        window = (window :+ e.event_id).takeRight(RecentKeep)
        ProfileUpdate(userId, e.event_id, e.event_type, n, window)
      }
      if (sorted.nonEmpty) {
        recent.put(window.toArray)
        // horizon timer: timers are plural, but an older fire just sees a
        // younger lastSeen and re-arms (see handleExpiredTimer) — no
        // delete-by-value bookkeeping needed for a pure-expiry timer
        getHandle.registerTimer(math.max(lastUs / 1000L + stateHorizonMinutes * 60000L,
          timerValues.getCurrentWatermarkInMs() + 1L))
      }
      out.iterator
    }

    override def handleExpiredTimer(
        userId: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[ProfileUpdate] = {
      // drop the whole profile only if no younger timer is still armed
      // (a younger one implies activity after this timer was set)
      val youngest = getHandle.listTimers().map(_.asInstanceOf[Long])
        .foldLeft(Long.MinValue)(math.max)
      if (youngest <= expiredTimerInfo.getExpiryTimeInMs()) {
        counts.clear()
        recent.clear()
      }
      Iterator.empty
    }
  }

  implicit private val updateEnc: Encoder[ProfileUpdate] = Encoders.product[ProfileUpdate]
  implicit private val longEnc: Encoder[Long] = Encoders.scalaLong

  def profile(
      events: Dataset[Event],
      watermarkDelay: String = "10 minutes",
      stateHorizonMinutes: Long = 24 * 60L): Dataset[ProfileUpdate] =
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new ProfileProcessor(stateHorizonMinutes),
        TimeMode.EventTime(), OutputMode.Append())
}
