package graft.streaming

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The streamed vocabulary fold must equal the batch word table it
  * replaces — and because the refits share the batch trainers' code,
  * BPE and unigram fits over the folded store must equal the t24/t38
  * board queries over the full corpus. Redelivery can never
  * double-count a word.
  */
class VocabStreamsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streamed word fold across batches == batch words; BPE and unigram refits match the board queries") {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val base = Files.createTempDirectory("vocab-stream").toString
    val (src, store, ckpt) = (s"$base/src", s"$base/store", s"$base/ckpt")

    val mid = 250L
    docs.filter(col("doc_id") < mid).write.mode("append").parquet(src)
    VocabStreams.vocabMaintain(spark, src, docs.schema, store, ckpt)
    docs.filter(col("doc_id") >= mid).write.mode("append").parquet(src)
    VocabStreams.vocabMaintain(spark, src, docs.schema, store, ckpt)

    // folded vocabulary == the batch word table, word for word
    val streamed = VocabStreams.wordStore(spark, store).collect()
      .map(r => r.getString(0) -> r.getLong(1)).sorted.toSeq
    val batch = graft.operators.Bpe.wordsOf(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).sorted.toSeq
    assert(streamed === batch)

    // refits from the live store == the board's batch fits
    val bpeStreamed = VocabStreams.bpeFit(spark, store).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val bpeBatch = graft.SparkEntry.queries("t24_bpe_train")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(bpeStreamed === bpeBatch,
      "BPE refit over the streamed vocabulary must equal batch t24")

    val uniStreamed = VocabStreams.unigramFit(spark, store).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    val uniBatch = graft.SparkEntry.queries("t38_unigram_train")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(uniStreamed === uniBatch,
      "unigram refit over the streamed vocabulary must equal batch t38")
  }

  test("a redelivered micro-batch folds exactly once") {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val store = Files.createTempDirectory("vocab-retry").toString + "/store"
    val a = docs.filter(col("doc_id") < 100)
    val b = docs.filter(col("doc_id") >= 100 && col("doc_id") < 200)

    VocabStreams.foldBatch(spark, store, a, 0L)
    VocabStreams.foldBatch(spark, store, b, 1L)
    val after = VocabStreams.wordStore(spark, store)
      .agg(sum("freq")).head.getLong(0)

    VocabStreams.foldBatch(spark, store, b, 1L) // at-least-once redelivery
    assert(VocabStreams.wordStore(spark, store)
      .agg(sum("freq")).head.getLong(0) === after)

    val streamed = VocabStreams.wordStore(spark, store).collect()
      .map(r => r.getString(0) -> r.getLong(1)).sorted.toSeq
    val batch = graft.operators.Bpe.wordsOf(a.unionByName(b)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).sorted.toSeq
    assert(streamed === batch)
  }
}
