package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.PartitionedTable
import graft.streaming.ChangeFeed
import org.apache.spark.sql.functions._

/** The change feed as a streaming source: streamed rows equal
  * ChangeFeed.batch over the same version range, a checkpointed query
  * resumes exactly where it stopped (drain → extend → re-drain, the
  * src03 offset-log contract), bootstrap mode includes the initial
  * load, and missing options fail loud. */
class GraftCdfSourceSpec extends SparkSpec {

  private def fresh(): String =
    Files.createTempDirectory("graftcdf").toString

  private def table(n: Int) = spark.range(n).select(
    col("id").as("k"),
    concat(lit("p"), (col("id") % 4).cast("string")).as("part"),
    (col("id") * 10).as("v"))

  private def commitAndMerge(dir: String): Unit = {
    import spark.implicits._
    PartitionedTable.commit(spark, dir, table(100), "part") // v0
    PartitionedTable.merge(spark, dir, Seq(                  // v1
      (1L, "p1", 111L, "upsert"), (5L, "p1", 0L, "delete"),
      (401L, "p1", 4010L, "upsert")).toDF("k", "part", "v", "op"), "k", "part")
    PartitionedTable.merge(spark, dir, Seq(                  // v2
      (2L, "p2", 0L, "delete")).toDF("k", "part", "v", "op"), "k", "part")
  }

  private def drain(root: String, tableDir: String, opts: Map[String, String] = Map.empty): Unit = {
    val q = spark.readStream.format("graft-cdf")
      .option("dir", tableDir).option("key", "k").option("part", "part")
      .options(opts)
      .load()
      .writeStream.format("parquet")
      .option("path", s"$root/out").option("checkpointLocation", s"$root/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .select("part", "k", "op", "v", ChangeFeed.VersionCol).collect()
    .map(r => (r.getString(0), r.getLong(1), r.getString(2),
      Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4)))
    .sortBy(t => (t._5, t._1, t._2, t._3)).toSeq

  test("streamed feed equals ChangeFeed.batch; checkpointed restart drains exactly the extension") {
    val dir = s"${fresh()}/t"; val root = fresh()
    commitAndMerge(dir)

    drain(root, dir)
    val streamed = spark.read.parquet(s"$root/out")
    assert(rows(streamed) === rows(ChangeFeed.batch(spark, dir, "k", "part")),
      "the streaming source must emit exactly the batch feed")
    assert(streamed.select(ChangeFeed.VersionCol).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))

    // caught up: another drain on the same checkpoint delivers nothing
    drain(root, dir)
    assert(spark.read.parquet(s"$root/out").count() === streamed.count())

    // extend the table; the same checkpoint drains ONLY the new commits
    import spark.implicits._
    PartitionedTable.merge(spark, dir, Seq(
      (9L, "p1", 999L, "upsert"), (500L, "p9", 5L, "upsert"))
      .toDF("k", "part", "v", "op"), "k", "part") // v3
    drain(root, dir)
    val after = spark.read.parquet(s"$root/out")
    assert(rows(after) === rows(
      ChangeFeed.batch(spark, dir, "k", "part", fromVersion = 0L)),
      "re-drain must append exactly v3's slice — no replay, no gap")
    assert(after.filter(col(ChangeFeed.VersionCol) === 3L).count() === 2)
  }

  test("startversion = -1 bootstraps with the initial load as inserts") {
    val dir = s"${fresh()}/t"; val root = fresh()
    commitAndMerge(dir)
    drain(root, dir, Map("startversion" -> "-1"))
    val got = spark.read.parquet(s"$root/out")
    assert(got.filter(col(ChangeFeed.VersionCol) === 0L).count() === 100)
    assert(got.filter(col(ChangeFeed.VersionCol) === 0L)
      .select("op").distinct().collect().map(_.getString(0)).toSeq ===
      Seq("insert"))
    assert(rows(got) === rows(
      ChangeFeed.batch(spark, dir, "k", "part", fromVersion = -1L)))
  }

  test("a downstream streaming aggregate over the feed equals the batch recompute") {
    val dir = s"${fresh()}/t"; val root = fresh()
    commitAndMerge(dir)
    // net insert count per partition, maintained by ordinary structured
    // streaming machinery over the subscription — the composition the
    // relay-only front door couldn't offer
    val q = spark.readStream.format("graft-cdf")
      .option("dir", dir).option("key", "k").option("part", "part").load()
      .groupBy("part", "op").count()
      .writeStream.format("memory").queryName("cdf_agg")
      .outputMode("complete")
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("cdf_agg").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = ChangeFeed.batch(spark, dir, "k", "part")
      .groupBy("part", "op").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === want)
  }

  test("composition: a replica maintained from the stream via mergeStream survives batch backfills AND full replays") {
    import spark.implicits._
    val src = s"${fresh()}/src"; val replica = s"${fresh()}/replica"
    val ckpt = s"${fresh()}/ckpt"
    PartitionedTable.commit(spark, src, table(100), "part") // src v0
    // explicit bootstrap: replica = src v0 snapshot; the stream then
    // subscribes to post-load changes only
    PartitionedTable.commit(spark, replica,
      PartitionedTable.read(spark, src), "part")

    def drainToReplica(): Unit = {
      val q = spark.readStream.format("graft-cdf")
        .option("dir", src).option("key", "k").option("part", "part")
        .load()
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          // a micro-batch can span several source commits: apply each
          // version's slice in order, exactly-once by its stream tag
          val vs = df.select(ChangeFeed.VersionCol).distinct()
            .collect().map(_.getLong(0)).sorted
          vs.foreach { v =>
            val slice = df.filter(col(ChangeFeed.VersionCol) === v)
              .withColumn("op", when(col("op").isin("insert", "update"),
                "upsert").otherwise(col("op")))
              .drop(ChangeFeed.VersionCol)
            PartitionedTable.mergeStream(spark, replica, slice,
              "k", "part", "replica_maint", v): Unit
          }
        }
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }

    PartitionedTable.merge(spark, src, Seq( // src v1
      (1L, "p1", 111L, "upsert"), (5L, "p1", 0L, "delete"))
      .toDF("k", "part", "v", "op"), "k", "part")
    drainToReplica()

    // a BATCH BACKFILL lands directly on the replica between drains —
    // the coexistence mergeAt's id==version contract could not survive
    PartitionedTable.merge(spark, replica,
      Seq((777L, "p7", 7770L, "upsert")).toDF("k", "part", "v", "op"),
      "k", "part")

    PartitionedTable.merge(spark, src, Seq( // src v2
      (2L, "p2", 0L, "delete"), (401L, "p1", 4010L, "upsert"))
      .toDF("k", "part", "v", "op"), "k", "part")
    drainToReplica()

    def snap(dir: String) = PartitionedTable.read(spark, dir)
      .select("k", "part", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val expected = snap(src) + ((777L, "p7", 7770L))
    assert(snap(replica) === expected,
      "replica = source content + the backfill overlay")

    // FULL REPLAY: wipe the engine checkpoint so every slice
    // redelivers — each no-ops on its stream tag despite the backfill
    // having shifted the replica's version numbers (mergeAt would
    // silently skip or double-apply here)
    val latest = PartitionedTable.latest(spark, replica).get
    val hfs = graft.streaming.VersionedStore.fs(spark, ckpt)
    hfs.delete(new org.apache.hadoop.fs.Path(ckpt), true)
    drainToReplica()
    assert(PartitionedTable.latest(spark, replica).get === latest,
      "replayed slices must not mint replica versions")
    assert(snap(replica) === expected, "replay must be a content no-op")
  }

  test("missing required options and empty tables fail loud") {
    val ex = intercept[Exception] {
      spark.readStream.format("graft-cdf").load()
    }
    assert(ex.getMessage.contains("required option") ||
      Option(ex.getCause).exists(_.getMessage.contains("required option")))
    val ex2 = intercept[Exception] {
      spark.readStream.format("graft-cdf").option("dir", "/nope")
        .option("key", "k").option("part", "part").load()
    }
    assert(ex2.getMessage.contains("no committed versions") ||
      Option(ex2.getCause).exists(_.getMessage.contains("no committed versions")))
  }

  test("maxversionsperbatch rate-limits the drain: N pending commits arrive over ceil(N/max) batches, nothing lost, resume intact") {
    import spark.implicits._
    val dir = s"${fresh()}/t"; val root = fresh()
    PartitionedTable.commit(spark, dir, table(100), "part") // v0
    (1 to 5).foreach { i => // v1..v5, one upsert each
      PartitionedTable.merge(spark, dir,
        Seq((i.toLong, s"p${i % 4}", i * 1000L, "upsert"))
          .toDF("k", "part", "v", "op"), "k", "part")
    }
    val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
    def drainLimited(): Unit = {
      val q = spark.readStream.format("graft-cdf")
        .option("dir", dir).option("key", "k").option("part", "part")
        .option("maxversionsperbatch", "2")
        .load()
        .writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          val vs = df.select(graft.streaming.ChangeFeed.VersionCol)
            .distinct().collect().map(_.getLong(0)).sorted.toSeq
          batches.synchronized { batches += ((id, vs)): Unit }
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    drainLimited()
    val versionsSeen = batches.flatMap(_._2).sorted.toSeq
    assert(versionsSeen === (1L to 5L),
      s"every commit drains exactly once, got $batches")
    assert(batches.forall(_._2.size <= 2),
      s"no batch may span more than 2 versions: $batches")
    assert(batches.size >= 3, // ceil(5/2)
      s"5 pending commits over max=2 need >= 3 batches: $batches")
    // versions drain in commit order across batches
    assert(batches.sortBy(_._1).flatMap(_._2).toSeq === (1L to 5L))

    // resume: extend by one commit; the same checkpoint drains ONLY it
    PartitionedTable.merge(spark, dir,
      Seq((9L, "p1", 9999L, "upsert")).toDF("k", "part", "v", "op"),
      "k", "part") // v6
    batches.clear()
    drainLimited()
    assert(batches.flatMap(_._2).toSeq === Seq(6L),
      s"resume must drain exactly the extension, got $batches")
  }

  test("a schema-evolving commit under a running stream fails loud with the restart message, not an opaque union error") {
    import spark.implicits._
    val dir = s"${fresh()}/t"; val root = fresh()
    commitAndMerge(dir)
    drain(root, dir) // healthy: v1-v2 land, schema pinned in the checkpoint

    // evolve the schema mid-stream (new column w), then extend again
    PartitionedTable.merge(spark, dir,
      Seq((3L, "p3", 33L, 7L, "upsert")).toDF("k", "part", "v", "w", "op"),
      "k", "part", allowSchemaEvolution = true) // v3
    val ex = intercept[Exception](drain(root, dir))
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    assert(messages(ex).exists(m => m != null &&
      m.contains("schema evolved under a running stream")),
      s"want the operable restart message, got: ${messages(ex).mkString(" | ")}")
  }
}
