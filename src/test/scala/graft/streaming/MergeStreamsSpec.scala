package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming MERGE must equal the batch MERGE applied in arrival order,
  * collapse last-wins within a batch, and apply exactly once under
  * at-least-once redelivery.
  */
class MergeStreamsSpec extends SparkSpec {

  private def state(store: String): Map[Long, Long] =
    MergeStreams.tableState(spark, store).get
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("v")).toMap

  test("file-relay merge: collapse within batch, upsert/delete across batches, == batch merge") {
    import spark.implicits._
    val base = Files.createTempDirectory("merge-stream").toString
    val (src, store, ckpt) = (s"$base/src", s"$base/store", s"$base/ckpt")

    // batch 1: keys 1..4 inserted; key 2 appears twice — seq 11 wins
    val b1 = Seq(
      (1L, 10L, 1L, "upsert"), (2L, 20L, 2L, "upsert"),
      (2L, 21L, 11L, "upsert"), (3L, 30L, 3L, "upsert"),
      (4L, 40L, 4L, "upsert")).toDF("k", "v", "seq", "op")
    // batch 2: update 1, delete 3, insert 5; delete-then-reinsert of 4
    val b2 = Seq(
      (1L, 11L, 5L, "upsert"), (3L, 0L, 6L, "delete"),
      (5L, 50L, 7L, "upsert"), (4L, 0L, 8L, "delete"),
      (4L, 44L, 9L, "upsert")).toDF("k", "v", "seq", "op")

    b1.write.mode("append").parquet(src)
    MergeStreams.mergeMaintain(spark, src, b1.schema, store, ckpt,
      "k", "op", Seq("seq"))
    assert(state(store) === Map(1L -> 10L, 2L -> 21L, 3L -> 30L, 4L -> 40L))

    b2.write.mode("append").parquet(src)
    MergeStreams.mergeMaintain(spark, src, b2.schema, store, ckpt,
      "k", "op", Seq("seq"))
    assert(state(store) === Map(1L -> 11L, 2L -> 21L, 4L -> 44L, 5L -> 50L),
      "update applied, delete dropped, insert landed, delete-then-reinsert kept the reinsert")

    // equality with the BATCH merge path: replay the same two batches
    // through VersionedTable.merge (collapsing each batch the same way)
    val batchStore = s"$base/batch"
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("seq").desc)
    def collapsed(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn", "seq")
    graft.operators.VersionedTable.commit(spark, batchStore,
      collapsed(b1).filter(col("op") === "upsert").drop("op"))
    graft.operators.VersionedTable.merge(spark, batchStore, collapsed(b2), "k")
    val batchState = graft.operators.VersionedTable.read(spark, batchStore)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("v")).toMap
    assert(state(store) === batchState,
      "streamed merge must equal the batch merge of the same changelog")
  }

  test("a redelivered changelog batch applies exactly once") {
    import spark.implicits._
    val store = Files.createTempDirectory("merge-retry").toString + "/store"
    val b0 = Seq((1L, 10L, 1L, "upsert"), (2L, 20L, 2L, "upsert"))
      .toDF("k", "v", "seq", "op")
    val b1 = Seq((1L, 0L, 3L, "delete"), (3L, 30L, 4L, "upsert"))
      .toDF("k", "v", "seq", "op")

    MergeStreams.mergeBatch(spark, store, b0, 0L, "k", "op", Seq("seq"))
    MergeStreams.mergeBatch(spark, store, b1, 1L, "k", "op", Seq("seq"))
    val after = state(store)
    assert(after === Map(2L -> 20L, 3L -> 30L))
    val versionsAfter = VersionedStore.versions(spark, store).sorted

    // at-least-once: batch 1 arrives again — no new version, no
    // double-apply, the deleted key stays deleted
    MergeStreams.mergeBatch(spark, store, b1, 1L, "k", "op", Seq("seq"))
    assert(state(store) === after)
    assert(VersionedStore.versions(spark, store).sorted === versionsAfter,
      "a retry must not mint a new version")
  }
}
