package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.{PartitionedTable, VersionedTable}
import org.apache.spark.sql.functions._

/** The reader-side change feed: per-commit slices equal the table's own
  * diffs, the relay resumes from its checkpoint exactly once per
  * version (idempotent-per-id sink contract), and a downstream view
  * maintained purely from the source equals recompute.
  */
class ChangeFeedSpec extends SparkSpec {

  private def freshDirs(): (String, String) = {
    val base = Files.createTempDirectory("cdf").toString
    (s"$base/table", s"$base/ckpt")
  }

  private def table(n: Int) = spark.range(n).select(
    col("id").as("k"),
    concat(lit("p"), (col("id") % 4).cast("string")).as("part"),
    (col("id") * 10).as("v"))

  private def applyMerges(dir: String): Unit = {
    import spark.implicits._
    PartitionedTable.commit(spark, dir, table(100), "part") // v0
    PartitionedTable.merge(spark, dir, Seq(                  // v1: p1 mixed
      (1L, "p1", 111L, "upsert"), (5L, "p1", 0L, "delete"),
      (401L, "p1", 4010L, "upsert")).toDF("k", "part", "v", "op"), "k", "part")
    PartitionedTable.merge(spark, dir, Seq(                  // v2: p2 DV route
      (2L, "p2", 0L, "delete"), (6L, "p2", 0L, "delete"))
      .toDF("k", "part", "v", "op"), "k", "part")
    PartitionedTable.merge(spark, dir, Seq(                  // v3: new partition
      (500L, "p9", 5L, "upsert")).toDF("k", "part", "v", "op"), "k", "part")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .select("part", "k", "op", "v", ChangeFeed.VersionCol).collect()
    .map(r => (r.getString(0), r.getLong(1), r.getString(2),
      Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4)))
    .sortBy(t => (t._5, t._1, t._2, t._3)).toSeq

  test("batch feed: per-commit slices equal the table's own pairwise diffs, in commit order") {
    val (dir, _) = freshDirs()
    applyMerges(dir)

    val feed = ChangeFeed.batch(spark, dir, "k", "part")
    val manual = (1L to 3L).map { v =>
      PartitionedTable.changes(spark, dir, v - 1, v, "k", "part")
        .withColumn(ChangeFeed.VersionCol, lit(v))
    }.reduce(_ unionByName _)
    assert(rows(feed) === rows(manual),
      "the subscription feed must equal the committer-side diffs")

    // event content: the v1 slice carries exactly p1's three events
    val v1 = rows(feed).filter(_._5 == 1L)
    assert(v1.map(e => (e._2, e._3)).toSet ===
      Set((1L, "update"), (5L, "delete"), (401L, "insert")))

    // fromVersion = -1 includes the initial load as inserts
    val withLoad = ChangeFeed.batch(spark, dir, "k", "part", fromVersion = -1L)
    assert(withLoad.filter(col(ChangeFeed.VersionCol) === 0).count() === 100)
    assert(withLoad.filter(col(ChangeFeed.VersionCol) === 0)
      .select("op").distinct().collect().map(_.getString(0)).toSeq === Seq("insert"))

    // bounded range: (1, 2] is just the DV-route slice
    val mid = ChangeFeed.batch(spark, dir, "k", "part",
      fromVersion = 1L, toVersion = Some(2L))
    assert(rows(mid).forall(_._5 == 2L) && mid.count() === 2)
  }

  test("relay: drains in order, resumes from its checkpoint, never re-delivers a processed version") {
    val (dir, ckpt) = freshDirs()
    applyMerges(dir)

    val seen = collection.mutable.ArrayBuffer[Long]()
    val collected = collection.mutable.Map[Long, Seq[(String, Long, String)]]()
    def sink(df: org.apache.spark.sql.DataFrame, v: Long): Unit = {
      seen += v
      collected(v) = df.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    }

    assert(ChangeFeed.maintain(spark, dir, ckpt, "k", "part", sink)
      === Seq(1L, 2L, 3L))
    assert(seen.toSeq === Seq(1L, 2L, 3L), "commit order, one call per version")
    // streamed == batch over the same range
    val batchRows = ChangeFeed.batch(spark, dir, "k", "part")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(collected.values.flatten.toSet === batchRows)

    // caught up: a second drain delivers nothing
    assert(ChangeFeed.maintain(spark, dir, ckpt, "k", "part", sink).isEmpty)
    assert(seen.toSeq === Seq(1L, 2L, 3L))

    // new commits resume from the offset — only the new version arrives
    import spark.implicits._
    PartitionedTable.merge(spark, dir,
      Seq((9L, "p1", 999L, "upsert")).toDF("k", "part", "v", "op"), "k", "part")
    assert(ChangeFeed.maintain(spark, dir, ckpt, "k", "part", sink) === Seq(4L))
    assert(collected(4L) === Seq(("p1", 9L, "update")))
  }

  test("vacuum horizon: a pruned-past offset fails loud; -1 re-bootstraps from the oldest retained snapshot") {
    val (dir, ckpt) = freshDirs()
    applyMerges(dir) // versions 0..3
    // a consumer parks its offset at 0, then vacuum prunes to the last 2
    ChangeFeed.maintain(spark, dir, ckpt, "k", "part",
      (_, _) => (), startVersion = 0L) // drains 1..3, offset now 3
    val hfs = VersionedStore.fs(spark, ckpt)
    val out = hfs.create(new org.apache.hadoop.fs.Path(ckpt, "offset"), true)
    try out.write("0".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close() // park the offset back at 0
    PartitionedTable.vacuum(spark, dir, keep = 2) // retained: {2, 3}

    // version 2's diff base (v1) is gone: the pending slice CANNOT be
    // reconstructed, and batch/maintain must say so instead of silently
    // replaying a full-table insert snapshot that loses v1..v2 deletes
    val exB = intercept[IllegalArgumentException] {
      ChangeFeed.batch(spark, dir, "k", "part", fromVersion = 0L)
    }
    assert(exB.getMessage.contains("retention horizon"))
    val exM = intercept[IllegalArgumentException] {
      ChangeFeed.maintain(spark, dir, ckpt, "k", "part", (_, _) => ())
    }
    assert(exM.getMessage.contains("retention horizon"))
    // an offset exactly one below the oldest retained version lost its
    // diff base too (v1's data is pruned) — also loud
    intercept[IllegalArgumentException] {
      ChangeFeed.batch(spark, dir, "k", "part", fromVersion = 1L)
    }

    // a caught-up consumer keeps working (offset >= oldest retained)
    assert(ChangeFeed.batch(spark, dir, "k", "part", fromVersion = 2L)
      .select(col(ChangeFeed.VersionCol)).distinct()
      .collect().map(_.getLong(0)).toSeq === Seq(3L))

    // -1 bootstraps: snapshot of the OLDEST RETAINED version (which
    // already excludes everything pruned) + the retained deltas — a
    // replica folding the feed ends at exactly the live table
    val boot = ChangeFeed.batch(spark, dir, "k", "part", fromVersion = -1L)
    val snap = boot.filter(col(ChangeFeed.VersionCol) === 2L)
    assert(snap.select("op").distinct().collect().map(_.getString(0))
      .toSeq === Seq("insert"))
    assert(snap.count() === PartitionedTable.read(spark, dir, Some(2L)).count())
    val replica = snap.select("k", "part", "v").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSet ++
      boot.filter(col(ChangeFeed.VersionCol) === 3L && col("op") =!= "delete")
        .select("k", "part").collect().map(r => (r.getLong(0), r.getString(1)))
    val live = PartitionedTable.read(spark, dir).select("k", "part")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(replica.map(t => (t._1, t._2)) === live)
  }

  test("an incremental view maintained purely from the subscription feed equals recompute") {
    val (dir, ckpt) = freshDirs()
    import spark.implicits._
    PartitionedTable.commit(spark, dir, table(100), "part")

    def recompute() = PartitionedTable.read(spark, dir)
      .groupBy("part").agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
    def viewRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq

    // the consumer owns only the view and the checkpoint — it never
    // registers anything with the table's committer
    var view = recompute().localCheckpoint(true)
    def consume(): Unit = ChangeFeed.maintain(spark, dir, ckpt, "k", "part",
      (feed, _) => view = VersionedTable
        .maintainSumCount(view, feed, "part", "v").localCheckpoint(true),
      preImages = true)

    PartitionedTable.merge(spark, dir, Seq(
      (1L, "p1", 1001L, "upsert"), (2L, "p2", 0L, "delete"),
      (500L, "p9", 5L, "upsert")).toDF("k", "part", "v", "op"), "k", "part")
    PartitionedTable.merge(spark, dir,
      Seq((500L, "p9", 0L, "delete")).toDF("k", "part", "v", "op"), "k", "part")
    consume()
    assert(viewRows(view) === viewRows(recompute()),
      "two-commit drain must fold both slices in order")
    assert(!viewRows(view).exists(_._1 == "p9"), "emptied group drops out")

    PartitionedTable.merge(spark, dir,
      Seq((3L, "p3", 7777L, "upsert")).toDF("k", "part", "v", "op"), "k", "part")
    consume()
    assert(viewRows(view) === viewRows(recompute()))
  }
}
