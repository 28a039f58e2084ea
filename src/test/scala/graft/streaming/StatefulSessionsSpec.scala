package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.streaming.EventStreams.{Event, Session}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StatefulSessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Long): Timestamp = new Timestamp(1700000000000L + minute * 60000L)

  /** transformWithState requires the RocksDB provider (column families). */
  private def withRocksDb[A](body: => A): A = {
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(confKey)
    spark.conf.set(confKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(confKey, v)
      case None => spark.conf.unset(confKey)
    }
  }

  test("transformWithState sessionizer: gap split, extension, timer close") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Event]
      val q = StatefulSessions.sessionize(input.toDS(), watermarkDelay = "5 minutes")
        .writeStream.format("memory").queryName("tws_sessions").outputMode("append").start()
      try {
        // one session extended across two micro-batches, then a >30 min
        // gap opens a second session; advancing the watermark far past
        // session-1's close-timer fires it
        input.addData(Event(1, ts(0), 1, "view", 0), Event(2, ts(10), 1, "click", 0))
        q.processAllAvailable()
        input.addData(Event(3, ts(20), 1, "view", 0))
        q.processAllAvailable()
        input.addData(Event(4, ts(120), 1, "purchase", 0))
        q.processAllAvailable()
        input.addData(Event(5, ts(300), 2, "view", 0))
        q.processAllAvailable()
        val sessions = spark.table("tws_sessions").as[Session].collect()
          .map(s => (s.user_id, s.session_start, s.session_end, s.n_events)).toSet
        // extension matters: a stale close-timer from batch 1 (armed at
        // ts(10)+30min) must NOT have split the session at ts(20); the
        // ts(120) singleton closed when the ts(300) watermark passed its
        // timer; user 2's session is still open (nothing advanced past it)
        assert(sessions === Set(
          (1L, ts(0), ts(20), 3L),
          (1L, ts(120), ts(120), 1L)), s"got $sessions")
      } finally q.stop()
    }
  }

  test("parity: transformWithState and flatMapGroupsWithState emit identical sessions") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      // interleaved users, in-session ties, cross-batch extension, gap
      // splits — the shapes where the two timer models could diverge
      val batches = Seq(
        Seq(Event(1, ts(0), 1, "view", 0), Event(2, ts(0), 1, "click", 0),
          Event(3, ts(5), 2, "view", 0)),
        Seq(Event(4, ts(25), 1, "view", 0), Event(5, ts(31), 2, "click", 0)),
        Seq(Event(6, ts(90), 1, "view", 0), Event(7, ts(95), 2, "view", 0)),
        Seq(Event(8, ts(400), 3, "view", 0)))

      def run(name: String,
          f: org.apache.spark.sql.Dataset[Event] => org.apache.spark.sql.Dataset[Session]) = {
        val input = MemoryStream[Event]
        val q = f(input.toDS())
          .writeStream.format("memory").queryName(name).outputMode("append").start()
        try {
          batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
          spark.table(name).as[Session].collect()
            .map(s => (s.user_id, s.session_start, s.session_end, s.n_events)).toSet
        } finally q.stop()
      }

      val tws = run("parity_tws", StatefulSessions.sessionize(_, "5 minutes"))
      val fmgws = run("parity_fmgws", EventStreams.sessionize(_, "5 minutes"))
      assert(tws === fmgws, s"tws=$tws fmgws=$fmgws")
      // both closed the first-wave sessions (watermark moved well past them)
      assert(tws.contains((1L, ts(0), ts(25), 3L)), s"got $tws")
      assert(tws.contains((2L, ts(5), ts(31), 2L)), s"got $tws")
    }
  }
}
