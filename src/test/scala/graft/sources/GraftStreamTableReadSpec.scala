package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.PartitionedTable
import graft.streaming.ChangeFeed
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** `spark.readStream.table("graft.db.t")` — the identifier-bound
  * change feed: streamed rows equal ChangeFeed.batch, checkpointed
  * resume drains exactly the extension, options (admission control)
  * pass through, and the r14 sink's replication loop runs end to end
  * as readStream.table → writeStream.toTable with NO path or format
  * anywhere. */
class GraftStreamTableReadSpec extends SparkSpec {

  private def fresh(): String =
    Files.createTempDirectory("graftrst").toString

  private def table(n: Int) = spark.range(n).select(
    col("id").as("k"),
    concat(lit("p"), (col("id") % 4).cast("string")).as("part"),
    (col("id") * 10).as("v"))

  private var seq = 0
  private def reg(dir: String): String = {
    seq += 1
    val name = s"t$seq"
    GraftCatalog.register(spark, "strm", name, dir,
      partCol = Some("part"), keyCol = Some("k"))
    s"graft.strm.$name"
  }

  private def commitAndMerge(dir: String): Unit = {
    import spark.implicits._
    PartitionedTable.commit(spark, dir, table(100), "part") // v0
    PartitionedTable.merge(spark, dir, Seq(                  // v1
      (1L, "p1", 111L, "upsert"), (5L, "p1", 0L, "delete"),
      (401L, "p1", 4010L, "upsert")).toDF("k", "part", "v", "op"), "k", "part")
    PartitionedTable.merge(spark, dir, Seq(                  // v2
      (2L, "p2", 0L, "delete")).toDF("k", "part", "v", "op"), "k", "part")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .select("part", "k", "op", "v", ChangeFeed.VersionCol).collect()
    .map(r => (r.getString(0), r.getLong(1), r.getString(2),
      Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4)))
    .sortBy(t => (t._5, t._1, t._2, t._3)).toSeq

  test("readStream.table drains the change feed: equals batch, resumes exactly, options pass through") {
    val dir = s"${fresh()}/t"; val root = fresh()
    commitAndMerge(dir)
    val t = reg(dir)

    def drain(): Unit = {
      val q = spark.readStream.table(t)
        .writeStream.format("parquet")
        .option("path", s"$root/out")
        .option("checkpointLocation", s"$root/ckpt")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    drain()
    val streamed = spark.read.parquet(s"$root/out")
    assert(rows(streamed) === rows(ChangeFeed.batch(spark, dir, "k", "part")),
      "the identifier-bound stream must emit exactly the batch feed")

    // caught up: nothing re-delivers
    drain()
    assert(spark.read.parquet(s"$root/out").count() === streamed.count())

    // extend; the same checkpoint drains ONLY the new commit
    import spark.implicits._
    PartitionedTable.merge(spark, dir, Seq(
      (9L, "p1", 999L, "upsert")).toDF("k", "part", "v", "op"),
      "k", "part") // v3
    drain()
    assert(rows(spark.read.parquet(s"$root/out")) ===
      rows(ChangeFeed.batch(spark, dir, "k", "part", fromVersion = 0L)),
      "re-drain must append exactly v3's slice")

    // option passthrough: admission control through the identifier
    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    (1 to 3).foreach { i =>
      PartitionedTable.merge(spark, dir,
        Seq((100L + i, s"p${i % 4}", i * 7L, "upsert"))
          .toDF("k", "part", "v", "op"), "k", "part") // v4..v6
    }
    val q = spark.readStream
      .option("maxversionsperbatch", "1")
      .option("startversion", "3") // start past the drained history
      .table(t)
      .writeStream
      .option("checkpointLocation", s"$root/ckpt2")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val vs = df.select(ChangeFeed.VersionCol).distinct()
          .collect().map(_.getLong(0)).sorted.toSeq
        if (vs.nonEmpty) batches.synchronized { batches += vs: Unit }
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(batches.toSeq === Seq(Seq(4L), Seq(5L), Seq(6L)),
      s"maxversionsperbatch=1 must deliver one commit per batch: $batches")
  }

  test("replication loop purely by identifier: readStream.table → writeStream.toTable") {
    import spark.implicits._
    val src = s"${fresh()}/a"; val dst = s"${fresh()}/b"
    val ckpt = s"${fresh()}/ckpt"
    PartitionedTable.commit(spark, src, table(60), "part")
    val tSrc = reg(src)
    PartitionedTable.createEmpty(spark, dst,
      org.apache.spark.sql.types.StructType.fromDDL(
        "k BIGINT, part STRING, v BIGINT"), "part")
    val tDst = reg(dst)

    def drain(): Unit = {
      val q = spark.readStream
        .option("startversion", "-1") // bootstrap: initial load as inserts
        .option("maxversionsperbatch", "1")
        .table(tSrc)
        .filter(col("op").isin("insert", "update"))
        .select("k", "part", "v")
        .writeStream.option("checkpointLocation", ckpt)
        .option("upsert", "true")
        .trigger(Trigger.AvailableNow()).toTable(tDst)
      q.awaitTermination()
    }
    drain()
    def state(dir: String) = PartitionedTable.read(spark, dir)
      .select("k", "part", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(state(dst) === state(src), "bootstrap replication by identifier")

    PartitionedTable.merge(spark, src,
      Seq((1L, "p1", 111L, "upsert"), (77L, "p0", 770L, "upsert"))
        .toDF("k", "part", "v", "op"), "k", "part")
    drain()
    assert(state(dst) === state(src), "incremental replication by identifier")
  }

  test("a table registered without keycol refuses streaming reads with direction") {
    val dir = s"${fresh()}/t"
    PartitionedTable.commit(spark, dir, table(10), "part")
    GraftCatalog.register(spark, "strm", "nokey", dir, partCol = Some("part"))
    val ex = intercept[Exception] {
      val q = spark.readStream.table("graft.strm.nokey")
        .writeStream.format("noop").start()
      try q.processAllAvailable() finally q.stop()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    assert(messages(ex).exists(m => m != null && m.contains("keyCol")),
      s"got: ${messages(ex).mkString(" | ")}")
    GraftCatalog.unregister("strm", "nokey")
  }
}
