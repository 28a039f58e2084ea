package graft.streaming

import graft.operators.{Bpe, Unigram}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Streaming maintenance for the tokenizer trainers: BPE (t24) and the
  * unigram LM (t38) both fit from ONE corpus-derived table — the
  * (word, freq) vocabulary — which a batch snapshot freezes at fit
  * time. This front door folds arriving document batches into a live
  * versioned word-frequency store; refitting either tokenizer from the
  * folded store goes through the exact code the batch queries use
  * ([[Bpe.train]], [[Unigram.train]]), so a refit over the streamed
  * store equals the batch fit over the same corpus by construction.
  *
  * Durability is the [[VersionedStore]] FULL-SNAPSHOT contract (the
  * MixStreams/CorpusStreams pattern): each version is the complete
  * merged word table; a retried batch folds from the newest version
  * OLDER than its id and skips the commit if its own landed — an
  * at-least-once redelivery can never double-count a word.
  *
  * Scale shape: each batch pays one tokenize+groupBy over the BATCH
  * only; the fold union is vocab+vocab (the store is vocabulary-sized —
  * distinct words, not occurrences). Refits read one vocab-sized
  * snapshot and never touch the corpus; WHEN to refit (every batch, on
  * drift, nightly) is the caller's policy — the store makes any policy
  * cheap.
  */
object VocabStreams {

  /** Relay unseen files from `sourceDir` into the word-count fold at
    * `storeDir`. Blocks until the AvailableNow drain finishes. */
  def vocabMaintain(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      storeDir: String,
      checkpointDir: String): Unit = {
    val q = spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        foldBatch(batch.sparkSession, storeDir, batch, id)
      }
      .start()
    q.awaitTermination()
  }

  /** The live vocabulary: newest committed (word, freq) snapshot. */
  def wordStore(spark: SparkSession, storeDir: String): DataFrame =
    VersionedStore.versions(spark, storeDir).maxOption match {
      case Some(v) => spark.read.parquet(VersionedStore.path(storeDir, v).toString)
      case None => emptyWords(spark)
    }

  /** Refit the BPE merge list from the live vocabulary (t24's loop). */
  def bpeFit(spark: SparkSession, storeDir: String): DataFrame =
    Bpe.train(wordStore(spark, storeDir), Bpe.Rounds)

  /** Refit the unigram-LM vocab from the live vocabulary (t38's loop,
    * including its word-length cap). */
  def unigramFit(spark: SparkSession, storeDir: String): DataFrame =
    Unigram.train(spark,
      wordStore(spark, storeDir).filter(length(col("word")) <= Unigram.MaxWordLen))._1

  /** One (possibly retried) micro-batch of the vocabulary fold.
    * Package-visible so the spec can drive a duplicate delivery. */
  private[streaming] def foldBatch(
      spark: SparkSession,
      storeDir: String,
      batch: DataFrame,
      id: Long): Unit = {
    val prior = VersionedStore.versions(spark, storeDir).filter(_ < id)
    val words = prior.maxOption match {
      case Some(v) => spark.read.parquet(VersionedStore.path(storeDir, v).toString)
      case None => emptyWords(spark)
    }
    val merged = words
      .unionByName(Bpe.wordsOf(batch))
      .groupBy("word").agg(sum("freq").as("freq"))
      .localCheckpoint(true) // materialized before any store mutation
    if (VersionedStore.commit(spark, storeDir, id, merged)) {
      // superseded: everything older than this batch's own pre-fold
      // state (which a retry of THIS id still needs)
      VersionedStore.prune(spark, storeDir, prior.sorted.dropRight(1))
    }
  }

  private def emptyWords(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").cast("string").as("word"),
      col("id").as("freq"))
}
