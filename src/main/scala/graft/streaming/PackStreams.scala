package graft.streaming

import graft.functions.{Exprs, Ranks}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Streaming front door for sequence packing (t33): the packed token
  * stream maintained as document files ARRIVE — each micro-batch's docs
  * are assigned absolute token offsets CONTINUING the stored stream, so
  * the concat-then-chunk layout grows append-only instead of being
  * recomputed in a nightly sweep. Packing order is arrival order across
  * batches (the streaming semantic: the stream is packed as it lands)
  * and doc_id order within a batch — when files arrive in doc_id order
  * the result is IDENTICAL to batch t33, the equality the spec pins.
  *
  * Scale shape: each batch pays t33's two-phase running sum on the
  * BATCH only (range exchange + P-row subtotal collect); the store
  * contributes one scalar per batch — the newest non-empty version's
  * max(start + n), a delta-sized read, never a scan over the whole
  * store. State lives in
  * a [[VersionedStore]] of per-batch DELTA versions (atomic
  * temp+rename commits; a retried batch recomputes its assignment from
  * the same pre-batch total and skips the re-append, so at-least-once
  * delivery cannot duplicate offsets).
  */
object PackStreams {

  /** Relay unseen files from `sourceDir` through the offset assignment,
    * handing each batch's (doc_id, n_toks, start_tok) rows to `sink`
    * and appending them to the store. Blocks until the AvailableNow
    * drain finishes. */
  def packMaintain(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      storeDir: String,
      checkpointDir: String)(sink: (DataFrame, Long) => Unit): Unit = {
    val q = spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        packBatch(batch.sparkSession, storeDir, batch, id)(sink)
      }
      .start()
    q.awaitTermination()
  }

  /** The packed stream so far: the union of all committed delta
    * versions — (doc_id, n_toks, start_tok), gapless in commit order. */
  def packedStore(spark: SparkSession, storeDir: String): DataFrame =
    VersionedStore.versions(spark, storeDir).sorted match {
      case Seq() => emptyAssignment(spark)
      case vs => vs.map(v => spark.read.parquet(
          VersionedStore.path(storeDir, v).toString))
        .reduce(_ unionByName _)
    }

  /** One (possibly retried) micro-batch: offsets continue from the
    * PRE-batch committed total, so a re-delivery recomputes the exact
    * same assignment and the commit no-ops. Package-visible so the spec
    * can drive a duplicate delivery directly. */
  private[streaming] def packBatch(
      spark: SparkSession,
      storeDir: String,
      batch: DataFrame,
      id: Long)(sink: (DataFrame, Long) => Unit): Unit = {
    val prior = VersionedStore.versions(spark, storeDir).filter(_ < id)
    // one scalar from history: the committed token total before this
    // batch. Offsets are gapless, so the NEWEST non-empty version's
    // max(start + n) IS the total — one delta-sized read in the common
    // case, never a scan over the whole store (empty committed versions
    // fall through to their predecessor).
    val base: Long = prior.sorted.reverseIterator
      .map { v =>
        spark.read.parquet(VersionedStore.path(storeDir, v).toString)
          .agg(max(col("start_tok") + col("n_toks"))).head().get(0)
      }
      .collectFirst { case x: java.lang.Long => x.longValue() }
      .getOrElse(0L)
    val nz = batch
      .select(col("doc_id"), size(Exprs.tokens(col("text"))).cast("long").as("n_toks"))
      .filter(col("n_toks") > 0)
    val assigned = Ranks.globalRunningSum(nz, "start_tok", col("n_toks"), col("doc_id"))
      .select(col("doc_id"), col("n_toks"), (col("start_tok") + base).as("start_tok"))
      .localCheckpoint(true) // materialized before any store mutation
    sink(assigned, id)
    VersionedStore.commit(spark, storeDir, id, assigned)
  }

  private def emptyAssignment(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").as("doc_id"),
      col("id").as("n_toks"), col("id").as("start_tok"))
}
