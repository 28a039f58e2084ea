package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Tiny test relations sit under the auto-broadcast threshold, so the
    * strategy plans [[BroadcastAsOfJoinExec]] by default; disabling the
    * threshold forces the shuffle-merge [[AsOfJoinExec]]. Semantics
    * tests run their body under BOTH physical forms. */
  private def underMerge[A](body: => A): A = {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }
  private def bothForms(body: => Unit): Unit = { body; underMerge(body) }

  test("native as-of join attaches the latest right row at or before each left time") {
    val trades = Seq(
      (1L, 10L, "t1"), (1L, 25L, "t2"), (1L, 5L, "t0"), (2L, 50L, "t3"))
      .toDF("key", "ts", "trade")
    val quotes = Seq(
      (1L, 8L, 100.0), (1L, 10L, 101.0), (1L, 20L, 102.0), (2L, 60L, 200.0))
      .toDF("key", "ts", "px")

    bothForms {
      val out = AsOf.join(trades, quotes, Seq("key"), "ts", "ts")
        .select(col("trade"), col("px"))
        .collect().map(r => r.getString(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

      assert(out === Map(
        "t0" -> None,          // no quote at or before ts=5
        "t1" -> Some(101.0),   // tie: quote at ts=10 matches (inclusive)
        "t2" -> Some(102.0),   // latest of 8/10/20
        "t3" -> None))         // key 2's only quote is later
    }
  }

  test("native as-of join equals the composed window form on generated data") {
    val left = (0 until 400).map(i => ((i % 7).toLong, (i * 13 % 211).toLong, i.toLong))
      .toDF("key", "lt", "lid")
    val right = (0 until 150).map(i => ((i % 7).toLong, (i * 29 % 199).toLong, (1000 + i).toLong))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique (key, rt)
      .toDF("key", "rt", "rid")

    val native = AsOf.join(left, right, Seq("key"), "lt", "rt")
      .select(col("lid"), col("rid"))
    val composed = graft.operators.TemporalJoins
      .asofJoin(left, right, "key", "lt", "rt")
      .select(col("lid"), col("asof.rid").as("rid"))

    assert(native.count() === left.count())
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty)
  }

  test("null keys and null times never match; rows survive left-outer") {
    val left = Seq(
      (Option(1L), Option(10L), "a"),
      (Option.empty[Long], Option(10L), "nullkey"),
      (Option(1L), Option.empty[Long], "nulltime"),
      (Option(1L), Option(30L), "b"))
      .toDF("key", "t", "tag")
    val right = Seq(
      (Option(1L), Option(5L), "r5"),
      (Option.empty[Long], Option(1L), "rnullkey"),
      (Option(1L), Option.empty[Long], "rnulltime"),
      (Option(1L), Option(20L), "r20"))
      .toDF("key", "t", "v")

    bothForms {
      val out = AsOf.join(left, right, Seq("key"), "t", "t")
        .select(col("tag"), col("v"))
        .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap

      assert(out === Map(
        "a" -> Some("r5"),
        "nullkey" -> None,     // null key joins nothing
        "nulltime" -> None,    // null left time matches nothing
        "b" -> Some("r20")))   // null-key / null-time right rows skipped
    }
  }

  test("multi-column keys join on all columns") {
    val left = Seq((1L, "x", 10L, "l1"), (1L, "y", 10L, "l2"), (2L, "x", 10L, "l3"))
      .toDF("k1", "k2", "t", "tag")
    val right = Seq((1L, "x", 5L, "rx"), (1L, "y", 5L, "ry"), (2L, "z", 5L, "rz"))
      .toDF("k1", "k2", "t", "v")

    bothForms {
      val out = AsOf.join(left, right, Seq("k1", "k2"), "t", "t")
        .select(col("tag"), col("v"))
        .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap

      assert(out === Map("l1" -> Some("rx"), "l2" -> Some("ry"), "l3" -> None))
    }
  }

  test("plan: AsOfJoinExec with one exchange per side; downstream agg reuses the layout") {
    val left = (0 until 1000).map(i => ((i % 13).toLong, i.toLong, i * 2.0)).toDF("key", "t", "x")
    val right = (0 until 500).map(i => ((i % 13).toLong, i.toLong, i * 3.0)).toDF("key", "t", "y")

    // aggregate on the join key AFTER the as-of join: outputPartitioning
    // passes the left hash layout through, so no third exchange appears
    val agg = underMerge {
      AsOf.join(left, right, Seq("key"), "t", "t")
        .groupBy("key").agg(sum("y").as("sy"))
    }

    spark.conf.set("spark.sql.adaptive.enabled", "false") // stable plan text
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // pin merge form
    try {
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("AsOfJoin"), s"native exec missing from plan:\n$plan")
      assert(!plan.contains("BroadcastAsOfJoin"), s"expected merge form:\n$plan")
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges === 2, s"expected exactly 2 exchanges, got $exchanges:\n$plan")
      assert(agg.count() === 13)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("broadcast form: hinted right side; zero exchange on the left, zero sort") {
    val left = (0 until 2000).map(i => ((i % 13).toLong, i.toLong, i * 2.0)).toDF("key", "t", "x")
    val right = (0 until 60).map(i => ((i % 13).toLong, (i * 17 % 97).toLong, i * 3.0))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      .toDF("key", "t", "y")

    // merge form is the semantic reference; the hinted broadcast form
    // must return the identical row set
    val merged = underMerge {
      AsOf.join(left, right, Seq("key"), "t", "t").collect().toSet
    }
    val bj = AsOf.join(left, broadcast(right), Seq("key"), "t", "t")
    assert(bj.collect().toSet === merged)

    spark.conf.set("spark.sql.adaptive.enabled", "false") // stable plan text
    try {
      val plan = bj.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastAsOfJoin"), s"broadcast exec missing:\n$plan")
      assert(plan.contains("BroadcastExchange"), s"broadcast exchange missing:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"left side must not shuffle:\n$plan")
      assert(!plan.contains("Sort "), s"broadcast form needs no sort:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("strategy picks broadcast vs shuffle-merge by right-side size") {
    val left = (0 until 500).map(i => ((i % 7).toLong, i.toLong)).toDF("key", "t")
    val right = (0 until 50).map(i => ((i % 7).toLong, i.toLong, i * 1.0)).toDF("key", "t", "v")

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // tiny local relation under the default 10 MB threshold → broadcast
      val auto = AsOf.join(left, right, Seq("key"), "t", "t")
        .queryExecution.executedPlan.toString
      assert(auto.contains("BroadcastAsOfJoin"), s"size rule should broadcast:\n$auto")
      // threshold disabled → shuffle-merge
      val merge = underMerge {
        AsOf.join(left, right, Seq("key"), "t", "t").queryExecution.executedPlan.toString
      }
      assert(merge.contains("AsOfJoin") && !merge.contains("BroadcastAsOfJoin"),
        s"disabled threshold should fall back to merge:\n$merge")
      // hint("merge") pins the merge form even under the size threshold —
      // the escape hatch when a small estimate won't hold in production
      val pinned = AsOf.join(left, right.hint("merge"), Seq("key"), "t", "t")
        .queryExecution.executedPlan.toString
      assert(pinned.contains("AsOfJoin") && !pinned.contains("BroadcastAsOfJoin"),
        s"merge hint should pin the merge form:\n$pinned")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("merge form under AQE: replanning + forced coalescing keep both sides aligned") {
    // zipPartitions requires equal partition counts after AQE coalesces —
    // both shuffles sit in one coalesce group, so the coalesced specs
    // must stay identical on both sides. Skewed side sizes + a tiny
    // advisory size force real (non-1) coalescing.
    val left = (0 until 20000).map(i => ((i % 131).toLong, i.toLong, "x" * 60 + i))
      .toDF("key", "t", "pad")
    val right = (0 until 300).map(i => ((i % 131).toLong, (i * 7 % 211).toLong, i.toLong))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      .toDF("key", "t", "rid")

    val expected = underMerge {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try AsOf.join(left, right, Seq("key"), "t", "t").drop("pad").collect().toSet
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }

    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
    try {
      val adaptive = underMerge {
        val df = AsOf.join(left, right, Seq("key"), "t", "t").drop("pad")
        assert(df.collect().toSet === expected)
        df.queryExecution.executedPlan.toString
      }
      assert(adaptive.contains("AdaptiveSparkPlan"), s"AQE not engaged:\n$adaptive")
      assert(adaptive.contains("AsOfJoin"), s"native exec missing under AQE:\n$adaptive")
      assert(adaptive.contains("AQEShuffleRead"),
        s"expected coalesced shuffle reads under AQE:\n$adaptive")
    } finally {
      spark.conf.unset("spark.sql.adaptive.coalescePartitions.parallelismFirst")
      spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    }
  }

  test("self-join: both sides from the same DataFrame (shared exprIds) dedup cleanly") {
    // q43's shape — purchases as-of-joined to views of the SAME events
    // relation. Without right-side re-aliasing, column pruning sees one
    // exprId on both children and empties the right side.
    val ev = Seq(
      (1L, 10L, "view", 100L), (1L, 20L, "purchase", 101L),
      (1L, 15L, "view", 102L), (2L, 5L, "purchase", 103L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id", "ts").agg(max("event_id").as("vid"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id")

    val out = AsOf.join(purchases, views, Seq("user_id"), "ts", "ts")
      .select(col("event_id"), col("vid"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    assert(out === Map(101L -> Some(102L), 103L -> None))
  }

  test("tolerance: stale matches yield null, never an older fallback") {
    val left = Seq(
      (1L, 100L, "fresh"),   // view at 95, staleness 5 <= 10 → match
      (1L, 200L, "stale"),   // latest view 95, staleness 105 > 10 → null
      (2L, 50L, "exact"))    // tie at 50, staleness 0 → match
      .toDF("key", "t", "tag")
    val right = Seq(
      (1L, 40L, "r40"), (1L, 95L, "r95"), (2L, 50L, "r50"))
      .toDF("key", "t", "v")

    bothForms {
      val out = AsOf.join(left, right, Seq("key"), "t", "t", tolerance = Some(10L))
        .select(col("tag"), col("v"))
        .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
      assert(out === Map(
        "fresh" -> Some("r95"),
        "stale" -> None, // r95 too old; must NOT fall back to r40
        "exact" -> Some("r50")))
    }
  }

  test("tolerance validation: negative and non-integral time types fail fast") {
    val l = Seq((1L, 10L)).toDF("key", "t")
    val r = Seq((1L, 5L)).toDF("key", "t")
    intercept[IllegalArgumentException] {
      AsOf.join(l, r, Seq("key"), "t", "t", tolerance = Some(-1L))
    }
    val ls = Seq((1L, "b")).toDF("key", "t")
    val rs = Seq((1L, "a")).toDF("key", "t")
    intercept[IllegalArgumentException] {
      AsOf.join(ls, rs, Seq("key"), "t", "t", tolerance = Some(1L))
    }
  }

  test("type mismatches and missing columns fail fast") {
    val l = Seq((1L, 10L)).toDF("key", "t")
    val r = Seq((1, 5L)).toDF("key", "t") // Int key vs Long key
    intercept[IllegalArgumentException] {
      AsOf.join(l, r.withColumnRenamed("key", "nope"), Seq("key"), "t", "t")
    }
    intercept[IllegalArgumentException] {
      AsOf.join(l, r, Seq("key"), "t", "t")
    }
  }
}
