package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

class BandedRangeJoinSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private val ConfKey = "spark.graft.rangeJoin.binSize"

  private def withBin[A](w: Long)(body: => A): A = {
    spark.conf.set(ConfKey, w.toString)
    try body finally spark.conf.unset(ConfKey)
  }

  // points at bucket edges, inside, far outside; intervals spanning
  // 0, 1, and many buckets, crossing zero, and touching boundaries
  private def points = Seq(-25L, -10L, -1L, 0L, 1L, 9L, 10L, 11L, 99L, 100L, 250L)
    .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("pid", "t")
  private def intervals = Seq(
    (1L, 0L, 10L), (2L, 10L, 10L), (3L, -20L, -5L), (4L, 5L, 95L),
    (5L, -100L, 300L), (6L, 100L, 100L), (7L, 11L, 11L))
    .toDF("iid", "lo", "hi")

  private def rangeJoined(): DataFrame =
    points.join(intervals, col("t") >= col("lo") && col("t") <= col("hi"))
      .select("pid", "iid")

  private def joinNodes(df: DataFrame): Seq[String] = {
    df.collect()
    collect(df.queryExecution.executedPlan) {
      case p if p.nodeName.contains("Join") || p.nodeName.contains("CartesianProduct") =>
        p.nodeName
    }
  }

  test("rewrite preserves results exactly and flips nested-loop to an equi join") {
    val expected = rangeJoined().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(joinNodes(rangeJoined()).exists(_.contains("NestedLoop")),
      "without the rule the inequality join must be a nested loop")
    withBin(10L) {
      val df = rangeJoined()
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected, "banding changed the result set")
      val joins = joinNodes(df)
      assert(joins.exists(j => j.contains("SortMergeJoin") || j.contains("ShuffledHashJoin")
        || j.contains("BroadcastHashJoin")), s"expected an equi join, got $joins")
      assert(!joins.exists(_.contains("NestedLoop")), s"nested loop survived: $joins")
    }
  }

  test("bucket width does not change results (1, 7, 64, huge)") {
    val expected = rangeJoined().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Seq(1L, 7L, 64L, 1000000L).foreach { w =>
      withBin(w) {
        val got = rangeJoined().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got === expected, s"width $w diverged")
      }
    }
  }

  test("flipped conjunct order and swapped sides (intervals on the left) also rewrite") {
    withBin(10L) {
      val swapped = intervals.join(points, col("lo") <= col("t") && col("hi") >= col("t"))
        .select("pid", "iid")
      val got = swapped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = rangeJoined().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected)
      assert(!joinNodes(swapped).exists(_.contains("NestedLoop")))
    }
  }

  test("a join that already has an equi key is left alone") {
    withBin(10L) {
      val keyedIntervals = intervals.withColumn("k", col("iid") % 2)
      val keyedPoints = points.withColumn("k", col("pid") % 2)
      val df = keyedPoints.join(keyedIntervals,
        keyedPoints("k") === keyedIntervals("k") &&
          col("t") >= col("lo") && col("t") <= col("hi"))
      df.collect()
      val gen = collect(df.queryExecution.executedPlan) {
        case p if p.nodeName.contains("Generate") => p.nodeName
      }
      assert(gen.isEmpty, s"keyed range join should not be banded, got $gen")
    }
  }

  test("reversed intervals (lo > hi) explode to zero rows, not a Sequence error") {
    // dirty-data rows the plain join silently no-matches; the rewrite
    // must not turn them into an illegal-sequence-boundaries failure
    val dirty = intervals.union(Seq((8L, 50L, -50L), (9L, 12L, 11L)).toDF("iid", "lo", "hi"))
    def q() = points.join(dirty, col("t") >= col("lo") && col("t") <= col("hi"))
      .select("pid", "iid")
    val expected = q().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    withBin(10L) {
      val df = q()
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected, "degenerate intervals changed the result set")
      assert(!joinNodes(df).exists(_.contains("NestedLoop")))
    }
  }

  test("DATE-typed range join bands correctly (binSize in days)") {
    // ADVICE r6: Cast(date, long) is NULL in Spark 4 — a date join
    // banded through a raw cast silently returned zero rows. unix_date
    // conversion restores parity.
    val dPoints = points.select(col("pid"),
      date_add(lit(java.sql.Date.valueOf("2024-01-15")), col("t").cast("int")).as("t"))
    val dIntervals = intervals.select(col("iid"),
      date_add(lit(java.sql.Date.valueOf("2024-01-15")), col("lo").cast("int")).as("lo"),
      date_add(lit(java.sql.Date.valueOf("2024-01-15")), col("hi").cast("int")).as("hi"))
    def q() = dPoints.join(dIntervals, col("t") >= col("lo") && col("t") <= col("hi"))
      .select("pid", "iid")
    val expected = q().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "fixture must produce matches")
    withBin(7L) { // 7-day buckets
      val df = q()
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected, "date banding changed the result set")
      assert(!joinNodes(df).exists(_.contains("NestedLoop")))
    }
  }

  test("TIMESTAMP-typed range join bands in MICROS (multi-bucket, not one giant bucket)") {
    // ADVICE r6: Cast(ts, long) is epoch SECONDS, so a micros binSize
    // would put everything in one bucket and restore the cross-product
    // work. unix_micros keeps the binSize contract.
    val base = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    val tsPoints = points.select(col("pid"),
      timestamp_micros(lit(base.getTime * 1000) + col("t") * 60000000L).as("t"))
    val tsIntervals = intervals.select(col("iid"),
      timestamp_micros(lit(base.getTime * 1000) + col("lo") * 60000000L).as("lo"),
      timestamp_micros(lit(base.getTime * 1000) + col("hi") * 60000000L).as("hi"))
    def q() = tsPoints.join(tsIntervals, col("t") >= col("lo") && col("t") <= col("hi"))
      .select("pid", "iid")
    val expected = q().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "fixture must produce matches")
    withBin(10L * 60000000L) { // 10-minute buckets, in micros
      val df = q()
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected, "timestamp banding changed the result set")
      assert(!joinNodes(df).exists(_.contains("NestedLoop")))
      // banding must actually spread rows across buckets: if the
      // conversion collapsed to seconds, interval 5 (-100..300 min)
      // would span 40 micro-buckets vs ~0 in the seconds reading
      df.collect()
      val generates = collect(df.queryExecution.executedPlan) {
        case p if p.nodeName.contains("Generate") => p
      }
      assert(generates.nonEmpty, "expected a Generate for the banded side")
      val exploded = generates.head.metrics.get("numOutputRows").map(_.value)
      assert(exploded.exists(_ > intervals.count()),
        s"banding produced $exploded rows — one-bucket collapse suspected")
    }
  }

  test("events point-in-maintenance-window join at sf0.001: parity against the nested loop") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), unix_micros(col("ts")).as("t"))
    val bounds = events.agg(min("t").as("mn"), max("t").as("mx")).head()
    val (mn, mx) = (bounds.getLong(0), bounds.getLong(1))
    val span = (mx - mn) / 50
    val windows = (0 until 50).map { i =>
      (i.toLong, mn + i * span, mn + i * span + span / 3) }.toDF("wid", "lo", "hi")
    def q() = events.join(windows, col("t") >= col("lo") && col("t") <= col("hi"))
      .groupBy("wid").agg(count(lit(1)).as("n"))
    val expected = q().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    withBin(span) {
      val df = q()
      assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet === expected)
      assert(!joinNodes(df).exists(_.contains("NestedLoop")))
    }
  }
}
