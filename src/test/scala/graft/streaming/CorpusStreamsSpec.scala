package graft.streaming

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The streaming incremental-dedup screen must (a) agree with the batch
  * d14 query on the same corpus split — same code path, asserted anyway —
  * and (b) be incremental: a second relay over the same checkpoint
  * screens only files added since the first.
  */
class CorpusStreamsSpec extends SparkSpec {

  test("screenIncoming: streamed screen == batch d14; re-run screens only the delta") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val index = docs.filter(col("doc_id") % 10 =!= 0).localCheckpoint(true)
    val incoming = docs.filter(col("doc_id") % 10 === 0)

    val base = Files.createTempDirectory("corpus-stream").toString
    val (src, ckpt) = (s"$base/src", s"$base/ckpt")
    // first drop: half the incoming docs
    incoming.filter(col("doc_id") % 20 === 0).write.mode("append").parquet(src)

    val got = collection.mutable.Map[Long, (Long, Long)]()
    var batches = 0
    def sink(df: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      batches += 1
      df.collect().foreach(r => got(r.getLong(0)) = (r.getLong(1), r.getLong(2)))
    }
    val schema = incoming.schema
    CorpusStreams.screenIncoming(spark, src, schema, index, ckpt)(sink)
    val afterFirst = got.size
    assert(afterFirst > 0)

    // second drop: the remaining incoming docs; same checkpoint → only
    // the new files are screened (no growth from re-screening the first)
    incoming.filter(col("doc_id") % 20 =!= 0).write.mode("append").parquet(src)
    CorpusStreams.screenIncoming(spark, src, schema, index, ckpt)(sink)

    val batch = graft.SparkEntry.queries("d14_incremental_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.toMap === batch)
    assert(afterFirst < got.size) // the second relay added the delta only
  }

  test("bloomMaintain: pre-insertion probes, bounded fold, and batch-equality of the final bit set") {
    import graft.operators.Dedup
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val a = docs.filter(col("doc_id") % 10 =!= 0)
    val b = docs.filter(col("doc_id") % 10 === 0)

    val base = Files.createTempDirectory("bloom-stream").toString
    val (src, bits, ckpt) = (s"$base/src", s"$base/bits", s"$base/ckpt")
    val schema = docs.schema

    val byRun = collection.mutable.ArrayBuffer[Map[Long, Long]]()
    def run(): Unit = {
      val got = collection.mutable.Map[Long, Long]()
      CorpusStreams.bloomMaintain(spark, src, schema, bits, ckpt) { (df, _) =>
        df.collect().foreach(r => got(r.getLong(0)) = r.getLong(1))
      }
      byRun += got.toMap
    }

    a.write.mode("append").parquet(src)
    run()
    // first fold: probes ran against an EMPTY filter — nothing can hit
    assert(byRun(0).nonEmpty && byRun(0).values.forall(_ == 0L))
    // the store now equals the batch-built bit set of exactly the A docs
    val storedA = CorpusStreams.bloomStore(spark, bits)
      .collect().map(_.getLong(0)).toSet
    assert(storedA === Dedup.bloomBits(a).collect().map(_.getLong(0)).toSet)

    b.write.mode("append").parquet(src)
    run()
    // second fold screens ONLY the delta, against the A-state filter —
    // byte-identical to the batch probe of B against bloomBits(A)
    val expectB = Dedup.bloomProbe(b, Dedup.bloomBits(a))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byRun(1) === expectB)
    // and the final store equals the batch-built set over A ∪ B
    val storedAll = CorpusStreams.bloomStore(spark, bits)
      .collect().map(_.getLong(0)).toSet
    assert(storedAll === Dedup.bloomBits(a.union(b)).collect().map(_.getLong(0)).toSet)
    assert(storedAll.size <= 65536)
  }

  test("bloomMaintain: a retried micro-batch re-emits pre-insertion verdicts and leaves the store unchanged") {
    // foreachBatch is at-least-once: drive the per-batch fold directly
    // with a duplicate delivery of the same batchId. The retry must probe
    // against the state as it was BEFORE the batch first ran (not see its
    // own insertions as hits) and must not re-fold.
    import graft.operators.Dedup
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val a = docs.filter(col("doc_id") % 10 =!= 0)
    val b = docs.filter(col("doc_id") % 10 === 0)
    val bits = Files.createTempDirectory("bloom-retry").toString + "/bits"

    def deliver(df: org.apache.spark.sql.DataFrame, id: Long): Map[Long, Long] = {
      val got = collection.mutable.Map[Long, Long]()
      CorpusStreams.bloomBatch(spark, bits, df, id) { (out, _) =>
        out.collect().foreach(r => got(r.getLong(0)) = r.getLong(1))
      }
      got.toMap
    }

    deliver(a, 0L)
    val first = deliver(b, 1L)
    assert(first === Dedup.bloomProbe(b, Dedup.bloomBits(a))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    val storeAfterFirst = CorpusStreams.bloomStore(spark, bits)
      .collect().map(_.getLong(0)).toSet

    val retried = deliver(b, 1L) // duplicate delivery of batch 1
    assert(retried === first,
      "a retry must re-emit byte-identical pre-insertion verdicts")
    val storeAfterRetry = CorpusStreams.bloomStore(spark, bits)
      .collect().map(_.getLong(0)).toSet
    assert(storeAfterRetry === storeAfterFirst, "the retry must not re-fold")
  }

  test("t21's chunker is batch/stream portable: stateless transform, identical rows") {
    // The chunk operator is one Generate — no state, no watermark — so
    // the SAME function body runs on a readStream unchanged; this is the
    // unified-engine contract that lets the ingest pipeline chunk docs
    // as they arrive instead of in a nightly sweep.
    val dir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    val toks = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("doc_id"), graft.functions.Exprs.tokens(col("text")).as("t"))
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val staged = Files.createTempDirectory("chunk-stream").toString
    docs.write.parquet(s"$staged/src")

    val streamed = graft.operators.TextAnalysis.chunked(
      toks(spark.readStream.schema(docs.schema).parquet(s"$staged/src")))
    val q = streamed.writeStream.format("memory").queryName("chunks_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))
    val fromStream = spark.table("chunks_stream").collect().map(key).toSet
    val fromBatch = graft.operators.TextAnalysis.chunked(toks(docs)).collect().map(key).toSet
    assert(fromStream === fromBatch)
    assert(fromBatch.nonEmpty)
  }
}
