package graft.streaming

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The streaming packer must (a) agree with batch t33 when files arrive
  * in doc_id order — same offsets, same chunk layout — and (b) survive
  * at-least-once redelivery: a retried batch re-emits identical offsets
  * and the store does not duplicate.
  */
class PackStreamsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streamed packing == batch t33 when arrivals follow doc_id order; second relay appends the delta") {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val mid = 250L
    val base = Files.createTempDirectory("pack-stream").toString
    val (src, store, ckpt) = (s"$base/src", s"$base/store", s"$base/ckpt")

    val emitted = collection.mutable.Map[Long, Long]()
    var batches = 0
    def run(): Unit = {
      PackStreams.packMaintain(spark, src, docs.schema, store, ckpt) { (df, _) =>
        batches += 1
        df.collect().foreach(r => emitted(r.getLong(0)) = r.getLong(2))
      }
    }

    docs.filter(col("doc_id") < mid).write.mode("append").parquet(src)
    run()
    val afterFirst = emitted.size
    assert(afterFirst > 0)

    docs.filter(col("doc_id") >= mid).write.mode("append").parquet(src)
    run()
    assert(emitted.size > afterFirst, "the second relay packed only the delta on top")

    val batch = graft.SparkEntry.queries("t33_sequence_packing")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(emitted.toMap === batch,
      "streamed offsets must equal the batch packing of the same doc_id order")

    val stored = PackStreams.packedStore(spark, store)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(stored === batch, "the store IS the batch assignment")

    // and the dataloader view derives identically from the maintained
    // store: manifest(store) == batch t34
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val fromStore = graft.operators.TextAnalysis
      .manifestOf(PackStreams.packedStore(spark, store))
      .collect().map(key).toSet
    val batchManifest = graft.SparkEntry.queries("t34_pack_manifest")(spark, dir)
      .collect().map(key).toSet
    assert(fromStore === batchManifest,
      "the manifest over the streamed store equals the batch manifest")
  }

  test("a retried micro-batch re-emits identical offsets and never duplicates the store") {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val store = Files.createTempDirectory("pack-retry").toString + "/store"
    val a = docs.filter(col("doc_id") < 100)
    val b = docs.filter(col("doc_id") >= 100 && col("doc_id") < 200)

    def deliver(df: org.apache.spark.sql.DataFrame, id: Long): Map[Long, Long] = {
      val got = collection.mutable.Map[Long, Long]()
      PackStreams.packBatch(spark, store, df, id) { (out, _) =>
        out.collect().foreach(r => got(r.getLong(0)) = r.getLong(2))
      }
      got.toMap
    }

    deliver(a, 0L)
    val first = deliver(b, 1L)
    val storeAfter = PackStreams.packedStore(spark, store).collect()
      .map(r => (r.getLong(0), r.getLong(2))).sorted

    val retried = deliver(b, 1L)
    assert(retried === first, "redelivery must re-emit byte-identical offsets")
    val storeRetry = PackStreams.packedStore(spark, store).collect()
      .map(r => (r.getLong(0), r.getLong(2))).sorted
    assert(storeRetry === storeAfter, "the retry must not append a duplicate version")

    // and the continuation invariant: batch 1 starts exactly where batch 0 ended
    val totalA = a.select(graft.functions.Exprs.tokens(col("text")).as("t"))
      .select(sum(size(col("t")).cast("long"))).head().getLong(0)
    assert(first.values.min === totalA, "batch 1's first offset continues batch 0's stream")

    // an EMPTY committed version (a batch whose docs all filter out)
    // must not lose the running total: the base falls through to the
    // newest non-empty predecessor
    val none = docs.filter(col("doc_id") < 0)
    assert(deliver(none, 2L).isEmpty)
    val c = docs.filter(col("doc_id") >= 200 && col("doc_id") < 300)
    val third = deliver(c, 3L)
    val totalAB = a.unionByName(b)
      .select(graft.functions.Exprs.tokens(col("text")).as("t"))
      .select(sum(size(col("t")).cast("long"))).head().getLong(0)
    assert(third.values.min === totalAB,
      "batch 3 continues through the empty version without resetting")
  }
}
