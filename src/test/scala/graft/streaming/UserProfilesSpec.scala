package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.streaming.EventStreams.Event
import graft.streaming.UserProfiles.ProfileUpdate
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class UserProfilesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Long): Timestamp = new Timestamp(1700000000000L + minute * 60000L)

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

  private val fixture = Seq(
    Event(1, ts(0), 1, "view", 0), Event(2, ts(1), 1, "view", 0),
    Event(3, ts(2), 1, "click", 0), Event(4, ts(3), 2, "view", 0),
    Event(5, ts(4), 1, "view", 0), Event(6, ts(5), 2, "purchase", 0),
    Event(7, ts(6), 1, "click", 0), Event(8, ts(7), 2, "view", 0))

  private def run(name: String, batches: Seq[Seq[Event]]): Set[(Long, Long, String, Long, Seq[Long])] =
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Event]
      val q = UserProfiles.profile(input.toDS())
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
        spark.table(name).as[ProfileUpdate].collect()
          .map(p => (p.user_id, p.event_id, p.event_type, p.n_type, p.recent_ids)).toSet
      } finally q.stop()
    }

  test("map+list state: per-event running counts and bounded recent window") {
    val got = run("profiles_one", Seq(fixture))
    // user 1 view counts run 1,2,3; clicks 1,2; recent window caps at 3
    assert(got.contains((1L, 1L, "view", 1L, Seq(1L))))
    assert(got.contains((1L, 2L, "view", 2L, Seq(1L, 2L))))
    assert(got.contains((1L, 5L, "view", 3L, Seq(2L, 3L, 5L))))
    assert(got.contains((1L, 7L, "click", 2L, Seq(3L, 5L, 7L))))
    assert(got.contains((2L, 8L, "view", 2L, Seq(4L, 6L, 8L))))
    assert(got.size === fixture.size)
  }

  test("emissions are independent of micro-batch boundaries") {
    val one = run("profiles_1b", Seq(fixture))
    val many = run("profiles_nb", fixture.grouped(3).toSeq)
    assert(one === many)
  }

  test("initial state: counters continue from batch history instead of restarting at 1") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      // batch backfill said user 1 already has 7 views and 2 clicks
      val history = Seq(
        UserProfiles.TypeCount(1L, "view", 7L),
        UserProfiles.TypeCount(1L, "click", 2L)).toDS()
      val input = MemoryStream[Event]
      val q = UserProfiles.profileWithHistory(input.toDS(), history)
        .writeStream.format("memory").queryName("profiles_init").outputMode("append").start()
      try {
        input.addData(Event(100, ts(0), 1, "view", 0), Event(101, ts(1), 1, "click", 0),
          Event(102, ts(2), 2, "view", 0))
        q.processAllAvailable()
        val got = spark.table("profiles_init").as[ProfileUpdate].collect()
          .map(p => (p.user_id, p.event_id, p.n_type)).toSet
        // user 1 continues at 8/3; user 2 had no history and starts at 1
        assert(got === Set((1L, 100L, 8L), (1L, 101L, 3L), (2L, 102L, 1L)), s"got $got")
      } finally q.stop()
    }
  }

  test("state store reader: the counts MapState is inspectable offline from the checkpoint") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val ckpt = java.nio.file.Files.createTempDirectory("graft-profiles-ckpt").toString
      val input = MemoryStream[Event]
      val q = UserProfiles.profile(input.toDS())
        .writeStream.format("memory").queryName("profiles_ckpt")
        .option("checkpointLocation", ckpt).outputMode("append").start()
      try {
        input.addData(fixture: _*)
        q.processAllAvailable()
      } finally q.stop()
      // Spark 4 state data source: read a named transformWithState
      // variable from the checkpoint with NO running query — the ops
      // path for "what does the store think user 1's counts are"
      val state = spark.read.format("statestore")
        .option("path", ckpt)
        .option("stateVarName", "counts")
        .load()
      val u1 = state.selectExpr("key.value AS user_id", "user_map_key.value AS event_type",
          "user_map_value.value AS n")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .filter(_._1 == 1L).map(t => (t._2, t._3)).toMap
      assert(u1 === Map("view" -> 3L, "click" -> 2L), s"got $u1")
    }
  }

  test("running counts replay the batch window query exactly") {
    val streamed = run("profiles_replay", fixture.grouped(2).toSeq)
      .map(p => (p._1, p._2, p._4)) // (user_id, event_id, n_type)
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val batch = fixture.toDF()
      .select(col("user_id"), col("event_id"), count(lit(1)).over(w).as("n_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batch)
  }
}
