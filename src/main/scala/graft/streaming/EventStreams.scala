package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming façade (SURVEY §2.8).
  *
  * The reference's only "streaming" is a driver-side chunk loop over
  * `index` ranges with append writes (`ingestToBronze.py:59-87`) — at-least
  * -once, resume via `max(index)`. The Spark-native equivalents here are:
  *
  *   - [[relayAvailableNow]]: checkpointed file-source → sink relay with
  *     `Trigger.AvailableNow` — the exactly-once version of the reference's
  *     incremental batch loop (checkpoint replaces the watermark query);
  *   - [[hourlyCounts]]: watermarked event-time tumbling-window aggregate —
  *     the streaming form of batch query q22;
  *   - [[sessionize]]: per-user session assembly via
  *     `flatMapGroupsWithState` with event-time timeout — the streaming
  *     form of batch query q24's 30-minute-gap sessionizer.
  *
  * Scale posture: state is keyed by high-cardinality `user_id` (even
  * distribution), watermarks bound state size, and every aggregate is a
  * built-in (partial-agg before shuffle). State store count follows
  * `spark.sql.shuffle.partitions`.
  */
object EventStreams {

  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

  final case class SessionState(startUs: Long, lastUs: Long, nEvents: Long)

  final case class Session(
      user_id: Long, session_start: Timestamp, session_end: Timestamp, n_events: Long)

  val SessionGapMinutes = 30L
  private val GapUs = SessionGapMinutes * 60L * 1000000L

  /** Timestamp → exact event-time micros. `getTime` already includes
    * the millis, so only the sub-milli remainder of `getNanos` is added
    * — this is load-bearing for every stateful operator's event
    * ordering, which is why there is exactly one copy of it. */
  private def toUs(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  implicit private val eventEnc: Encoder[Event] = Encoders.product[Event]
  implicit private val stateEnc: Encoder[SessionState] = Encoders.product[SessionState]
  implicit private val sessionEnc: Encoder[Session] = Encoders.product[Session]
  implicit private val longEnc: Encoder[Long] = Encoders.scalaLong

  /** Event-time tumbling-window counts per type: watermark bounds late
    * data (and state), window+groupBy is a standard streaming hash agg. */
  def hourlyCounts(events: Dataset[Event], watermarkDelay: String = "1 hour"): DataFrame =
    events.toDF()
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("n"), col("sum_value"))

  /** 30-minute-gap sessionization with explicit state: one `SessionState`
    * per user, closed + emitted when the event-time watermark passes
    * `last event + gap`. Exactly the q24 batch semantics, incrementally. */
  def sessionize(events: Dataset[Event], watermarkDelay: String = "10 minutes"): Dataset[Session] =
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          def emit(st: SessionState): Session =
            Session(userId, new Timestamp(st.startUs / 1000L),
              new Timestamp(st.lastUs / 1000L), st.nEvents)

          if (batch.isEmpty && state.hasTimedOut) {
            // Watermark passed last-event + gap: the session is final.
            val out = state.getOption.map(emit).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = batch.toSeq.sortBy(e => (toUs(e.ts), e.event_id))
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val us = toUs(e.ts)
              cur match {
                case Some(st) if us - st.lastUs <= GapUs =>
                  cur = Some(st.copy(lastUs = math.max(st.lastUs, us), nEvents = st.nEvents + 1))
                case Some(st) =>
                  closed ::= emit(st)
                  cur = Some(SessionState(us, us, 1L))
                case None =>
                  cur = Some(SessionState(us, us, 1L))
              }
            }
            cur.foreach { st =>
              state.update(st)
              // A straggler group's last event can be so late that
              // lastEvent+gap sits BEHIND the current watermark, and
              // setTimeoutTimestamp throws on that (killing the whole
              // query); clamp forward so the session closes on the next
              // watermark advance instead.
              val want = st.lastUs / 1000L + SessionGapMinutes * 60L * 1000L
              state.setTimeoutTimestamp(math.max(want, state.getCurrentWatermarkMs() + 1L))
            }
            closed.reverse.iterator
          }
      }

  /** Stream-stream interval join: each purchase matched to the same
    * user's views within the preceding `maxGap`. Both sides carry
    * watermarks and the join condition bounds event-time distance, so
    * Spark can evict state for rows too old to ever match — without the
    * interval bound a stream-stream join's state grows forever.
    *
    * `joinType = "left_outer"` preserves unmatched purchases: the null
    * row is emitted only once the watermark proves no matching view can
    * still arrive (outer results are watermark-DELAYED by construction —
    * the engine cannot know "no match" earlier). Same state bound. */
  def viewPurchaseJoin(
      views: Dataset[Event], purchases: Dataset[Event],
      watermarkDelay: String = "10 minutes", maxGapMinutes: Int = 30,
      joinType: String = "inner"): DataFrame = {
    val v = views.toDF()
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
      .withWatermark("view_ts", watermarkDelay)
    val p = purchases.toDF()
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("purchase_ts", watermarkDelay)
    p.join(v, expr(
      s"""v_user = p_user AND
         |view_ts <= purchase_ts AND
         |view_ts >= purchase_ts - INTERVAL $maxGapMinutes MINUTES""".stripMargin),
      joinType)
      .select(col("p_user").as("user_id"), col("purchase_id"), col("view_id"),
        col("purchase_ts"), col("view_ts"))
  }

  final case class ViewState(lastUs: Long, vid: Long)
  final case class Attribution(user_id: Long, purchase_id: Long, last_view_id: Option[Long])

  implicit private val viewStateEnc: Encoder[ViewState] = Encoders.product[ViewState]
  implicit private val attributionEnc: Encoder[Attribution] = Encoders.product[Attribution]

  /** Streaming AS-OF: the incremental form of the native batch as-of join
    * (q43/q46, `graft.plans.AsOf`) — each purchase attributed to the same
    * user's latest at-or-before view, with optional max staleness
    * (`toleranceMinutes`), as ONE value of per-user state (the latest
    * view), not a growing buffer.
    *
    * Semantics vs the batch operator: exact when each user's events
    * arrive in event-time order (the partitioned-log deployment this
    * targets — per-key ordered Kafka topics); a view arriving after a
    * later purchase was already emitted cannot retro-match it (inherent
    * to any online as-of). Within a micro-batch, events are processed in
    * (ts, event_id) order, so batch boundaries don't reorder.
    *
    * Scale posture: state is O(1) per active user (one `ViewState`),
    * keyed by high-cardinality user_id, and EXPIRED by event-time
    * timeout once a user idles past `stateHorizonMinutes` — bounded
    * state, the same trade-off as [[dedupDocs]]. An expired user's next
    * purchase attributes to null, which a `tolerance <= horizon` makes
    * exact rather than approximate. */
  def attributePurchases(
      events: Dataset[Event],
      watermarkDelay: String = "10 minutes",
      toleranceMinutes: Option[Long] = None,
      stateHorizonMinutes: Long = 24 * 60L): Dataset[Attribution] = {
    val tolUs = toleranceMinutes.map(_ * 60L * 1000000L)
    val horizonMs = stateHorizonMinutes * 60L * 1000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ViewState, Attribution](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[ViewState]) =>

          if (batch.isEmpty && state.hasTimedOut) {
            state.remove() // idle past horizon: drop the one state value
            Iterator.empty
          } else {
            // views sort BEFORE purchases at equal ts: the batch operator's
            // rightTime <= leftTime is inclusive, so a same-timestamp view
            // must be visible to the purchase regardless of event_id order
            val sorted = batch.toSeq.sortBy(e =>
              (toUs(e.ts), if (e.event_type == "view") 0 else 1, e.event_id))
            var out = List.empty[Attribution]
            var cur = state.getOption
            sorted.foreach { e =>
              val us = toUs(e.ts)
              e.event_type match {
                case "view" =>
                  // keep the LATEST view; equal-time ties keep the larger
                  // event_id (matches the batch right-side max pre-agg)
                  if (cur.forall(st => st.lastUs < us ||
                      (st.lastUs == us && st.vid < e.event_id)))
                    cur = Some(ViewState(us, e.event_id))
                case "purchase" =>
                  val hit = cur.filter(st =>
                    st.lastUs <= us && tolUs.forall(us - st.lastUs <= _))
                  out ::= Attribution(userId, e.event_id, hit.map(_.vid))
                case _ => () // other event types don't participate
              }
            }
            cur match {
              case Some(st) =>
                state.update(st)
                // clamp forward like sessionize: a straggler's horizon can
                // sit behind the watermark, and setTimeoutTimestamp throws
                state.setTimeoutTimestamp(
                  math.max(st.lastUs / 1000L + horizonMs, state.getCurrentWatermarkMs() + 1L))
              case None => ()
            }
            out.reverse.iterator
          }
      }
  }

  /** Per-user funnel progression: -1 = stage not yet reached. */
  final case class FunnelState(viewUs: Long, clickUs: Long, purchaseUs: Long)

  /** One row per user per stage, emitted when the stage is FIRST
    * reached: 1 = view, 2 = click-after-view, 3 = purchase-after-click. */
  final case class StageAdvance(user_id: Long, stage: Int, at_us: Long)

  implicit private val funnelStateEnc: Encoder[FunnelState] = Encoders.product[FunnelState]
  implicit private val stageEnc: Encoder[StageAdvance] = Encoders.product[StageAdvance]

  /** Incremental form of batch q51's ordered funnel: per-user monotone
    * stage progression, each stage emitted at most once PER STATE
    * LIFETIME when first reached, strictly-after semantics at equal
    * timestamps like the batch windows.
    *
    * Counting distinct users per emitted stage reproduces the batch
    * query's stage counts when events arrive per-user in event-time
    * order (within a micro-batch, (ts, event_id) processing order makes
    * batch boundaries irrelevant; the running first-view/first-click the
    * batch windows compute is exactly this state, carried across
    * batches). Parity is asserted on the full events fixture.
    *
    * Scale posture: state is one 24-byte row per active user — not an
    * event buffer — keyed by high-cardinality user_id and expired by
    * event-time timeout past `stateHorizonMinutes`, the same bounded-
    * state contract (and the same expiry caveat) as
    * [[attributePurchases]]: a user idling past the horizon restarts
    * the funnel on return and re-emits from stage 1, so size the
    * horizon to the funnel window you mean to measure, and dedup
    * downstream on (user_id, stage) if re-entry must not re-count. */
  def funnelStages(
      events: Dataset[Event],
      watermarkDelay: String = "10 minutes",
      stateHorizonMinutes: Long = 24 * 60L): Dataset[StageAdvance] = {
    val horizonMs = stateHorizonMinutes * 60L * 1000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StageAdvance](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[FunnelState]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            state.remove() // idle past horizon; see the re-entry caveat above
            Iterator.empty
          } else {
            val sorted = batch.toSeq.sortBy(e => (toUs(e.ts), e.event_id))
            var st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
            var out = List.empty[StageAdvance]
            var lastUs = -1L
            sorted.foreach { e =>
              val us = toUs(e.ts)
              lastUs = us
              e.event_type match {
                case "view" if st.viewUs < 0 =>
                  st = st.copy(viewUs = us); out ::= StageAdvance(userId, 1, us)
                case "click" if st.clickUs < 0 && st.viewUs >= 0 && us > st.viewUs =>
                  st = st.copy(clickUs = us); out ::= StageAdvance(userId, 2, us)
                case "purchase" if st.purchaseUs < 0 && st.clickUs >= 0 && us > st.clickUs =>
                  st = st.copy(purchaseUs = us); out ::= StageAdvance(userId, 3, us)
                case _ => () // later duplicates / other types don't advance
              }
            }
            state.update(st)
            state.setTimeoutTimestamp(math.max(
              (if (lastUs >= 0) lastUs / 1000L else 0L) + horizonMs,
              state.getCurrentWatermarkMs() + 1L))
            out.reverse.iterator
          }
      }
  }

  /** Stream-static enrichment: the streaming side of the broadcast-dim
    * star join (q11/q44's shape) — each micro-batch hash-joins against
    * the static dim with NO stream-side shuffle and no state; Spark
    * re-plans the static side per batch, so a small dim stays a
    * broadcast at any stream volume. */
  def enrichAgainstStatic(events: Dataset[Event], dim: DataFrame): DataFrame =
    events.toDF().join(broadcast(dim), Seq("user_id"), "left")

  /** Streaming exact dedup — the ingest-time form of the batch d01/d06
    * operators: key each document by its content hash and emit only the
    * first arrival, with `dropDuplicatesWithinWatermark` so the
    * dedup-state store is BOUNDED by the watermark horizon instead of
    * growing with corpus size (plain `dropDuplicates` on an unbounded
    * stream keeps every key forever — the state-blowup anti-pattern).
    * Within the horizon the semantics match the batch keep-first; docs
    * re-arriving later than the horizon are the accepted trade-off every
    * windowed streaming dedup makes. Input must carry an event-time `ts`
    * and a `text` column; emits the input rows minus in-horizon dups. */
  def dedupDocs(docs: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    docs
      // collision-proof internal name: a caller-supplied content_hash
      // column must survive untouched
      .withColumn("__graft_content_hash", md5(col("text")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("__graft_content_hash")
      .drop("__graft_content_hash")

  /** Checkpointed file-relay with `Trigger.AvailableNow`: reads whatever
    * files exist, processes them exactly once (offsets in the checkpoint),
    * and stops — re-running picks up only NEW files. `foreachBatch` gives
    * the sink side the same partitioned-append shape as the batch bronze
    * stage. Returns after the trigger drains. */
  def relayAvailableNow(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      checkpointDir: String)(writeBatch: (DataFrame, Long) => Unit): Unit = {
    val q = spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, id: Long) => writeBatch(df, id) }
      .start()
    q.awaitTermination()
  }
}
