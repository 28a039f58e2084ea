package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, MapState, OutputMode,
  StatefulProcessor, StatefulProcessorHandle, StatefulProcessorWithInitialState, TimeMode,
  TimerValues, TTLConfig}

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

  /** One row of batch-computed history: a (user, type) running count. */
  final case class TypeCount(user_id: Long, event_type: String, n: Long)

  /** Most recent event ids kept per user (newest last). */
  val RecentKeep = 3

  private def toUs(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  /** The state-variable logic, shared by the cold-start and the
    * initial-state processors (setHandle is final on StatefulProcessor,
    * so composition happens here rather than by wrapping). */
  sealed private[streaming] trait ProfileLogic {
    def getHandle: StatefulProcessorHandle
    def stateHorizonMinutes: Long

    @transient protected var counts: MapState[String, Long] = _
    @transient protected var recent: ListState[Long] = _

    protected def initState(): Unit = {
      counts = getHandle.getMapState[String, Long](
        "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      recent = getHandle.getListState[Long]("recent", Encoders.scalaLong, TTLConfig.NONE)
    }

    protected def processRows(
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
        // younger lastSeen and re-arms (see expireIfIdle) — no
        // delete-by-value bookkeeping needed for a pure-expiry timer
        getHandle.registerTimer(math.max(lastUs / 1000L + stateHorizonMinutes * 60000L,
          timerValues.getCurrentWatermarkInMs() + 1L))
      }
      out.iterator
    }

    protected def expireIfIdle(expiredTimerInfo: ExpiredTimerInfo): Unit = {
      // drop the whole profile only if no younger timer is still armed
      // (a younger one implies activity after this timer was set)
      val youngest = getHandle.listTimers().map(_.asInstanceOf[Long])
        .foldLeft(Long.MinValue)(math.max)
      if (youngest <= expiredTimerInfo.getExpiryTimeInMs()) {
        counts.clear()
        recent.clear()
      }
    }
  }

  final class ProfileProcessor(val stateHorizonMinutes: Long)
      extends StatefulProcessor[Long, Event, ProfileUpdate] with ProfileLogic {
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = initState()
    override def handleInputRows(
        userId: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[ProfileUpdate] =
      processRows(userId, rows, timerValues)
    override def handleExpiredTimer(
        userId: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[ProfileUpdate] = {
      expireIfIdle(expiredTimerInfo)
      Iterator.empty
    }
  }

  /** [[ProfileProcessor]] warm-started from batch history
    * (`StatefulProcessorWithInitialState`): `handleInitialState` is
    * invoked once per initial-state ROW before the first batch, seeding
    * the counts MapState so the stream continues numbering where the
    * batch backfill stopped — the migration path from a nightly batch
    * job to a live stream without resetting every counter to zero.
    * The recent-ids window deliberately starts cold: recency is
    * meaningful only for events the STREAM saw (a backfill has no
    * arrival order worth preserving), and a bootstrap that faked it
    * would change the emission contract. */
  final class ProfileProcessorWithInit(val stateHorizonMinutes: Long)
      extends StatefulProcessorWithInitialState[Long, Event, ProfileUpdate, TypeCount]
      with ProfileLogic {
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = initState()
    override def handleInitialState(
        userId: Long, row: TypeCount, timerValues: TimerValues): Unit =
      counts.updateValue(row.event_type, row.n)
    override def handleInputRows(
        userId: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[ProfileUpdate] =
      processRows(userId, rows, timerValues)
    override def handleExpiredTimer(
        userId: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[ProfileUpdate] = {
      expireIfIdle(expiredTimerInfo)
      Iterator.empty
    }
  }

  implicit private val updateEnc: Encoder[ProfileUpdate] = Encoders.product[ProfileUpdate]
  implicit private val typeCountEnc: Encoder[TypeCount] = Encoders.product[TypeCount]
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

  /** [[profile]] with the counts MapState seeded from `history` —
    * typically `SELECT user_id, event_type, count(*) FROM backfill
    * GROUP BY 1, 2`. */
  def profileWithHistory(
      events: Dataset[Event],
      history: Dataset[TypeCount],
      watermarkDelay: String = "10 minutes",
      stateHorizonMinutes: Long = 24 * 60L): Dataset[ProfileUpdate] =
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new ProfileProcessorWithInit(stateHorizonMinutes),
        TimeMode.EventTime(), OutputMode.Append(),
        history.groupByKey(_.user_id))
}
