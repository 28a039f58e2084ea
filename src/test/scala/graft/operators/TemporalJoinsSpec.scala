package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin attaches the latest right row at or before each left time") {
    val trades = Seq(
      (1L, 10L, "t1"), (1L, 25L, "t2"), (1L, 5L, "t0"), (2L, 50L, "t3"))
      .toDF("key", "ts", "trade")
    val quotes = Seq(
      (1L, 8L, 100.0), (1L, 10L, 101.0), (1L, 20L, 102.0), (2L, 60L, 200.0))
      .toDF("key", "qts", "px")

    val out = TemporalJoins.asofJoin(trades, quotes, "key", "ts", "qts")
      .select(col("trade"), col("asof.px").as("px"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

    assert(out === Map(
      "t0" -> None,          // no quote at or before ts=5
      "t1" -> Some(101.0),   // tie: quote at ts=10 matches (inclusive)
      "t2" -> Some(102.0),   // latest of 8/10/20
      "t3" -> None))         // key 2's only quote is later
  }

  test("asofJoin equals the naive max-time formulation on generated data") {
    // deterministic pseudo-random frames; right times unique per key
    val left = (0 until 400).map(i => ((i % 7).toLong, (i * 13 % 211).toLong, i.toLong))
      .toDF("key", "lt", "lid")
    val right = (0 until 150).map(i => ((i % 7).toLong, (i * 29 % 199).toLong, (1000 + i).toLong))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique (key, rt)
      .toDF("key", "rt", "rid")

    val fast = TemporalJoins.asofJoin(left, right, "key", "lt", "rt")
      .select(col("lid"), col("asof.rid").as("rid"))

    val best = left.join(right, Seq("key"))
      .filter(col("rt") <= col("lt"))
      .groupBy("lid").agg(max(struct(col("rt"), col("rid"))).as("m"))
      .select(col("lid"), col("m.rid").as("rid"))
    val naive = left.select("lid").join(best, Seq("lid"), "left")

    assert(fast.count() === left.count())
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("rangeJoin equals the naive cross-join filter") {
    val points = (0L until 300L).map(i => (i % 3, i * 7 % 500)).toDF("key", "t")
    val intervals = Seq(
      (0L, 0L, 100L, "a"), (0L, 90L, 200L, "b"), (1L, 50L, 60L, "c"),
      (2L, 400L, 500L, "d"), (0L, 450L, 455L, "e"))
      .toDF("key", "s", "e", "tag")

    val banded = TemporalJoins.rangeJoin(points, intervals, "key", "t", "s", "e",
      bucketWidth = 64)
      .select("key", "t", "tag")
    val naive = points.join(intervals, "key")
      .filter(col("t") >= col("s") && col("t") < col("e"))
      .select("key", "t", "tag")

    assert(banded.count() === naive.count())
    assert(banded.exceptAll(naive).isEmpty && naive.exceptAll(banded).isEmpty)
    assert(banded.count() > 0)
  }

  test("rangeJoin guard: an interval spanning over the cap is dropped and observable") {
    val points = (0L until 200L).map(i => (0L, i * 5)).toDF("key", "t")
    val intervals = Seq(
      (0L, 10L, 50L, "ok"),          // 40/8 → 6 buckets, kept
      (0L, 0L, 10000L, "degenerate"),// 10000/8 → 1250 buckets > cap, dropped
      (0L, 30L, 30L, "empty"),       // end <= start: matches nothing, skipped
      (0L, 600L, 580L, "inverted"))  // end < start: skipped, no explode blowup
      .toDF("key", "s", "e", "tag")

    val out = TemporalJoins.rangeJoin(points, intervals, "key", "t", "s", "e",
      bucketWidth = 8, maxBucketsPerInterval = 64)
      .select("t", "tag")
    val rows = out.collect()

    // only the sub-cap interval contributes matches: t in [10, 50)
    assert(rows.forall(_.getString(1) == "ok"))
    assert(rows.map(_.getLong(0)).sorted.toSeq ===
      (0L until 200L).map(_ * 5).filter(t => t >= 10 && t < 50).sorted)

    val m = out.queryExecution.observedMetrics("range_join_guard")
    assert(m.getAs[Long]("intervals_over_cap") === 1L)
    assert(m.getAs[Long]("max_interval_buckets") === 1250L)
    assert(m.getAs[Long]("exploded_rows") === 6L) // only "ok" explodes
  }
}
