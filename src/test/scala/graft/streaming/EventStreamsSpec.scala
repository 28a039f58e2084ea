package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import graft.streaming.EventStreams.{Event, Session}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Long): Timestamp = new Timestamp(1700000000000L + minute * 60000L)

  /** Stream the events fixture with whatever physical ts form this round's
    * file carries (nanos-long or TIMESTAMP_NTZ — see `Tables.events`): take
    * the schema from the parquet footer and run the SAME normalization as
    * the batch loader, so stream/batch parity tests compare identical
    * semantics. The file stream source wants a directory, so the single
    * fixture file is staged into a temp dir. */
  private def stagedEventsStream(dir: String): org.apache.spark.sql.DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val staged = Files.createTempDirectory("graft-events-staged")
    Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("events.parquet"))
    val footer = spark.read.parquet(staged.toString).schema
    graft.Tables.normalizeEventTs(
      spark.readStream.schema(footer).parquet(staged.toString))
  }

  test("hourlyCounts: watermarked tumbling window aggregates by type") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.hourlyCounts(input.toDS())
      .writeStream.format("memory").queryName("hourly").outputMode("complete").start()
    try {
      input.addData(
        Event(1, ts(0), 1, "view", 1.0),
        Event(2, ts(10), 1, "view", 2.5),
        Event(3, ts(70), 2, "click", 4.0))
      q.processAllAvailable()
      val rows = spark.table("hourly")
        .select("event_type", "n", "sum_value").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows === Set(("view", 2L, 3.5), ("click", 1L, 4.0)))
    } finally q.stop()
  }

  test("sessionize: 30-minute gap closes sessions as the watermark advances") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.sessionize(input.toDS(), watermarkDelay = "5 minutes")
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      // user 1: two events 10 min apart → one session
      input.addData(Event(1, ts(0), 1, "view", 0), Event(2, ts(10), 1, "click", 0))
      q.processAllAvailable()
      // 2 hours later: a new event for user 1 → closes the first session
      // in-batch; also pushes the watermark far past session-1 + gap.
      input.addData(Event(3, ts(120), 1, "view", 0))
      q.processAllAvailable()
      // one more batch so the event-time timeout for the second session
      // (timeout = 150 min < watermark 175 min) can fire.
      input.addData(Event(4, ts(180), 2, "view", 0))
      q.processAllAvailable()
      input.addData(Event(5, ts(300), 2, "view", 0))
      q.processAllAvailable()

      val sessions = spark.table("sessions").as[Session].collect()
        .map(s => (s.user_id, s.session_start, s.session_end, s.n_events)).toSet
      assert(sessions.contains((1L, ts(0), ts(10), 2L)), s"got $sessions")
      assert(sessions.contains((1L, ts(120), ts(120), 1L)), s"got $sessions")
    } finally q.stop()
  }

  test("stream-stream interval join pairs purchases with recent views only") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = EventStreams.viewPurchaseJoin(views.toDS(), purchases.toDS())
      .writeStream.format("memory").queryName("vp_join").outputMode("append").start()
    try {
      views.addData(
        Event(1, ts(0), 1, "view", 0),    // 40 min before purchase: too old
        Event(2, ts(25), 1, "view", 0),   // within 30 min: matches
        Event(3, ts(35), 1, "view", 0),   // 5 min before: matches
        Event(4, ts(10), 2, "view", 0))   // other user
      purchases.addData(Event(10, ts(40), 1, "purchase", 0))
      q.processAllAvailable()
      val got = spark.table("vp_join")
        .select("purchase_id", "view_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((10L, 2L), (10L, 3L)))
    } finally q.stop()
  }

  test("viewPurchaseJoin left_outer: unmatched purchase emits null once watermark proves it") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = EventStreams.viewPurchaseJoin(views.toDS(), purchases.toDS(),
      watermarkDelay = "5 minutes", joinType = "left_outer")
      .writeStream.format("memory").queryName("vp_outer").outputMode("append").start()
    try {
      views.addData(Event(1, ts(25), 1, "view", 0))
      purchases.addData(
        Event(10, ts(40), 1, "purchase", 0),  // matches view 1 (15 min gap)
        Event(11, ts(41), 2, "purchase", 0))  // user 2 never views
      q.processAllAvailable()
      // the unmatched purchase is NOT out yet: a view for user 2 could
      // still arrive until the watermark clears purchase_ts
      val early = spark.table("vp_outer").select("purchase_id").collect().map(_.getLong(0))
      assert(!early.contains(11L))

      // advance event time far enough that the watermark proves no view
      // can still match purchase 11 → the null row flushes
      views.addData(Event(2, ts(120), 3, "view", 0))
      purchases.addData(Event(12, ts(120), 3, "purchase", 0))
      q.processAllAvailable()
      views.addData(Event(3, ts(200), 3, "view", 0))
      purchases.addData(Event(13, ts(200), 3, "purchase", 0))
      q.processAllAvailable()

      val rows = spark.table("vp_outer")
        .select("purchase_id", "view_id").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      assert(rows(10L) === Some(1L))
      assert(rows.contains(11L) && rows(11L) === None,
        s"unmatched purchase should have flushed with a null view: $rows")
    } finally q.stop()
  }

  test("attributePurchases: streaming as-of matches latest prior view, state is O(1)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.attributePurchases(
      input.toDS(), watermarkDelay = "5 minutes", toleranceMinutes = Some(30L))
      .writeStream.format("memory").queryName("attrib").outputMode("append").start()
    try {
      // batch 1: views then a purchase in the same batch
      input.addData(
        Event(1, ts(0), 1, "view", 0),
        Event(2, ts(10), 1, "view", 0),
        Event(3, ts(12), 1, "purchase", 0), // latest prior view = id 2
        Event(4, ts(5), 2, "purchase", 0))  // user 2 never viewed → null
      q.processAllAvailable()
      // batch 2: the kept state (view id 2 at min 10) serves a later
      // purchase within tolerance; a second purchase 40 min after the
      // view is TOO STALE (tolerance 30) → null, no fallback; and a
      // same-timestamp view/purchase pair where the purchase has the
      // SMALLER event_id still matches (batch rightTime <= leftTime is
      // inclusive — views must sort before purchases at equal ts)
      input.addData(
        Event(5, ts(35), 1, "purchase", 0),  // 25 min after view 2 → match
        Event(6, ts(55), 1, "purchase", 0),  // 45 min after view 2 → null
        Event(9, ts(60), 3, "view", 0),
        Event(8, ts(60), 3, "purchase", 0))  // ties view 9 at ts 60 → match
      q.processAllAvailable()

      val got = spark.table("attrib").as[EventStreams.Attribution].collect()
        .map(a => a.purchase_id -> a.last_view_id).toMap
      assert(got === Map(
        3L -> Some(2L), 4L -> None, 5L -> Some(2L), 6L -> None, 8L -> Some(9L)))

      // agrees with the BATCH native as-of (same events, same tolerance)
      val ev = Seq(
        (1L, ts(0), 1L, "view"), (2L, ts(10), 1L, "view"),
        (3L, ts(12), 1L, "purchase"), (4L, ts(5), 2L, "purchase"),
        (5L, ts(35), 1L, "purchase"), (6L, ts(55), 1L, "purchase"),
        (9L, ts(60), 3L, "view"), (8L, ts(60), 3L, "purchase"))
        .toDF("event_id", "ts", "user_id", "event_type")
      val views = ev.filter(col("event_type") === "view")
        .groupBy("user_id", "ts").agg(max("event_id").as("vid"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "event_id")
      val batch = graft.plans.AsOf.join(purchases, views, Seq("user_id"), "ts", "ts",
          tolerance = Some(30L * 60L * 1000000L))
        .select(col("event_id"), col("vid")).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      assert(got === batch)
    } finally q.stop()
  }

  test("enrichAgainstStatic: stream-static broadcast join, no stream shuffle") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val input = MemoryStream[Event]
    val q = EventStreams.enrichAgainstStatic(input.toDS(), dim)
      .select("event_id", "tier")
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    try {
      input.addData(
        Event(1, ts(0), 1, "view", 0),
        Event(2, ts(1), 2, "view", 0),
        Event(3, ts(2), 9, "view", 0)) // no dim row → left join keeps it
      q.processAllAvailable()
      val got = spark.table("enriched").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got === Map(1L -> Some("gold"), 2L -> Some("basic"), 3L -> None))
      // the micro-batch plan must broadcast the dim, not shuffle the stream
      val lastPlan = q
        .asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan.toString
      assert(lastPlan.contains("BroadcastHashJoin"),
        s"expected a broadcast dim join in the micro-batch plan:\n$lastPlan")
      assert(!lastPlan.contains("Exchange hashpartitioning"),
        s"the stream side must not shuffle:\n$lastPlan")
    } finally q.stop()
  }

  test("dedupDocs: streaming keep-first by content hash across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = EventStreams.dedupDocs(
      input.toDF().toDF("doc_id", "ts", "text"), watermarkDelay = "1 hour")
      .writeStream.format("memory").queryName("dedup_docs").outputMode("append").start()
    try {
      input.addData((1L, ts(0), "aaa"), (2L, ts(1), "bbb"))
      q.processAllAvailable()
      // cross-batch duplicate within the watermark horizon is dropped;
      // fresh content passes
      input.addData((3L, ts(2), "aaa"), (4L, ts(3), "ccc"))
      q.processAllAvailable()
      val kept = spark.table("dedup_docs")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept === Set(1L, 2L, 4L))
    } finally q.stop()
  }

  test("funnelStages: monotone per-user progression, strictly-after, cross-batch state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.funnelStages(input.toDS(), watermarkDelay = "5 minutes")
      .writeStream.format("memory").queryName("funnel").outputMode("append").start()
    try {
      input.addData(
        Event(1, ts(0), 1, "view", 0),
        Event(2, ts(0), 1, "click", 0),   // same ts as the view: NOT after → no stage 2
        Event(3, ts(5), 2, "click", 0))   // click with no view → nothing
      q.processAllAvailable()
      // state carries across batches: the stage-2 click arrives later
      input.addData(
        Event(4, ts(10), 1, "click", 0),  // after view at ts 0 → stage 2
        Event(5, ts(11), 1, "view", 0),   // second view: no re-emit of stage 1
        Event(6, ts(12), 1, "purchase", 0), // after click → stage 3
        Event(7, ts(20), 2, "view", 0))   // user 2 finally views → stage 1
      q.processAllAvailable()
      val got = spark.table("funnel").as[EventStreams.StageAdvance].collect()
        .map(s => (s.user_id, s.stage)).toSet
      assert(got === Set((1L, 1), (1L, 2), (1L, 3), (2L, 1)))
    } finally q.stop()
  }

  test("funnelStages: stage counts match the batch q51 funnel on the fixture") {
    val dir = "/root/testdata/sf0.001"
    val batch = graft.SparkEntry.queries("q51_funnel_stages")(spark, dir).head()
    val expected = Map(1 -> batch.getLong(0), 2 -> batch.getLong(1), 3 -> batch.getLong(2))

    val q = EventStreams.funnelStages(
      stagedEventsStream(dir)
        .select("event_id", "ts", "user_id", "event_type", "value").as[Event])
      .writeStream.format("memory").queryName("funnel_parity").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("funnel_parity").groupBy("stage").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(got === expected)
    } finally q.stop()
  }

  test("streaming window aggregation matches the batch events query") {
    val dir = "/root/testdata/sf0.001"
    val expected = graft.SparkEntry.queries("q22_events_hourly")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet

    val q = stagedEventsStream(dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd HH:00").as("hr"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .writeStream.format("memory").queryName("stream_hourly").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("stream_hourly")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(got === expected)
    } finally q.stop()
  }

  test("relayAvailableNow: exactly-once file relay, incremental on re-run") {
    val root = Files.createTempDirectory("graft-stream").toString
    val src = s"$root/src"
    val out = s"$root/out"
    val ckpt = s"$root/ckpt"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType)))

    spark.range(0, 100).select(col("id"), (col("id") * 1.5).as("v"))
      .write.mode("overwrite").parquet(src)
    EventStreams.relayAvailableNow(spark, src, schema, ckpt) { (df, _) =>
      df.write.mode("append").parquet(out)
    }
    assert(spark.read.parquet(out).count() === 100)

    // re-run with no new files: checkpoint makes it a no-op
    EventStreams.relayAvailableNow(spark, src, schema, ckpt) { (df, _) =>
      df.write.mode("append").parquet(out)
    }
    assert(spark.read.parquet(out).count() === 100)

    // add a new file: only it is relayed
    spark.range(100, 120).select(col("id"), (col("id") * 1.5).as("v"))
      .write.mode("append").parquet(src)
    EventStreams.relayAvailableNow(spark, src, schema, ckpt) { (df, _) =>
      df.write.mode("append").parquet(out)
    }
    assert(spark.read.parquet(out).count() === 120)
  }

  test("sessionize under the RocksDB state store: same results, native backend active") {
    // At 100 TB the sessionizer's keyed state outgrows executor heaps;
    // RocksDB spills it to local disk with incremental checkpointing.
    // Same query, swapped provider: results must be identical, and the
    // operator must really be RocksDB-backed (not a silent fallback).
    implicit val sqlCtx = spark.sqlContext
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(confKey)
    spark.conf.set(confKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Event]
    val q = EventStreams.sessionize(input.toDS(), watermarkDelay = "5 minutes")
      .writeStream.format("memory").queryName("sessions_rocksdb").outputMode("append").start()
    try {
      input.addData(Event(1, ts(0), 1, "view", 0), Event(2, ts(10), 1, "click", 0))
      q.processAllAvailable()
      input.addData(Event(3, ts(120), 1, "view", 0))
      q.processAllAvailable()
      val sessions = spark.table("sessions_rocksdb").as[Session].collect()
        .map(s => (s.user_id, s.session_start, s.session_end, s.n_events)).toSet
      assert(sessions.contains((1L, ts(0), ts(10), 2L)), s"got $sessions")
      val metrics = q.lastProgress.stateOperators.head.customMetrics
      assert(metrics.keySet.iterator().hasNext &&
        { import scala.jdk.CollectionConverters._
          metrics.keySet.asScala.exists(_.toLowerCase.contains("rocksdb")) },
        s"state operator not RocksDB-backed: $metrics")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(confKey, v)
        case None => spark.conf.unset(confKey)
      }
    }
  }
}
