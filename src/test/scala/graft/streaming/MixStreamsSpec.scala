package graft.streaming

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** The streamed composition fold must equal the batch snapshot it
  * replaces: rates/fit derived from the folded store after a multi-batch
  * relay are identical to the batch queries over the full corpus, and a
  * redelivered micro-batch can never double-count.
  */
class MixStreamsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rateRows(df: org.apache.spark.sql.DataFrame) =
    df.select("source", "n", "rate", "thr").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getString(3)))
      .sortBy(_._1).toSeq

  private def fitRows(df: org.apache.spark.sql.DataFrame) =
    df.select("lang", "source", "n_docs", "fitted").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("streamed fold across batches == batch totals; live rates and raking fit match the batch chains exactly") {
    val docs = Tables.documents(spark, dir).select("doc_id", "lang", "source")
    val base = Files.createTempDirectory("mix-stream").toString
    val (src, store, ckpt) = (s"$base/src", s"$base/store", s"$base/ckpt")

    // two relays of disjoint halves — the fold must accumulate, and the
    // second relay must see only the delta
    val mid = 250L
    docs.filter(col("doc_id") < mid).write.mode("append").parquet(src)
    MixStreams.mixMaintain(spark, src, docs.schema, store, ckpt)
    val partial = MixStreams.cellStore(spark, store)
      .agg(sum("n")).head.getLong(0)
    assert(partial === docs.filter(col("doc_id") < mid).count())

    docs.filter(col("doc_id") >= mid).write.mode("append").parquet(src)
    MixStreams.mixMaintain(spark, src, docs.schema, store, ckpt)

    // folded cells == the batch composition, cell for cell
    val streamedCells = MixStreams.cellStore(spark, store).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted.toSeq
    val batchCells = docs.groupBy("lang", "source").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(streamedCells === batchCells)

    // live temperature rates == t35's chain over the full corpus —
    // exact doubles, same code path on both sides
    assert(rateRows(MixStreams.temperatureRates(spark, store)) ===
      rateRows(TextAnalysis.temperatureRates(
        docs.groupBy("source").agg(count(lit(1)).as("n")))))

    // live raking fit == t30's chain over the full corpus
    assert(fitRows(MixStreams.rakedFit(spark, store)) ===
      fitRows(TextAnalysis.rakedFit(
        docs.groupBy("lang", "source").agg(count(lit(1)).cast("double").as("m")))))
  }

  test("a redelivered micro-batch folds exactly once") {
    val docs = Tables.documents(spark, dir).select("doc_id", "lang", "source")
    val store = Files.createTempDirectory("mix-retry").toString + "/store"
    val a = docs.filter(col("doc_id") < 100)
    val b = docs.filter(col("doc_id") >= 100 && col("doc_id") < 200)

    MixStreams.foldBatch(spark, store, a, 0L)
    MixStreams.foldBatch(spark, store, b, 1L)
    val after = MixStreams.cellStore(spark, store)
      .agg(sum("n")).head.getLong(0)

    // at-least-once: batch 1 arrives again — the fold must no-op
    MixStreams.foldBatch(spark, store, b, 1L)
    assert(MixStreams.cellStore(spark, store)
      .agg(sum("n")).head.getLong(0) === after)
    assert(after === a.count() + b.count())

    // and the retry folded from its true pre-batch state: per-cell
    // counts equal the batch composition of a ∪ b
    val streamed = MixStreams.cellStore(spark, store).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted.toSeq
    val batch = a.unionByName(b).groupBy("lang", "source")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(streamed === batch)
  }
}
