package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Streaming maintenance for the mixture samplers: t35's temperature
  * rates and t30/t32's raking fit both start from corpus composition
  * tables — per-source totals and per-(lang, source) cells — which are
  * batch snapshots that go stale the moment new files land. This front
  * door folds arriving batches into ONE live cell-count store (the
  * per-source totals are its lang-marginal, so a single store serves
  * both samplers) and re-derives the rates/fit from the folded state
  * through the SAME code paths the batch queries use
  * ([[TextAnalysis.temperatureRates]], [[TextAnalysis.rakedFit]]) — the
  * streamed result equals the batch result by construction.
  *
  * Durability is the [[VersionedStore]] FULL-SNAPSHOT contract (the
  * Bloom-screen pattern, CorpusStreams): each version is the complete
  * merged cell table; a retried batch folds from the newest version
  * OLDER than its id and skips the commit if its own version landed, so
  * at-least-once delivery can never double-count a batch; superseded
  * versions are pruned only after this batch's commit actually lands.
  *
  * Scale shape: the store is cells-sized (|langs|×|sources| rows — KBs
  * at any corpus size), each batch pays one partial-agg shuffle over the
  * BATCH only, and the fold union is cells+cells. Deriving rates reads
  * one cells-sized snapshot — never the corpus.
  */
object MixStreams {

  /** Relay unseen files from `sourceDir` into the cell-count fold at
    * `storeDir`. Blocks until the AvailableNow drain finishes. */
  def mixMaintain(
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

  /** The live composition: newest committed (lang, source, n) snapshot,
    * empty before any fold. */
  def cellStore(spark: SparkSession, storeDir: String): DataFrame =
    VersionedStore.versions(spark, storeDir).maxOption match {
      case Some(v) => spark.read.parquet(VersionedStore.path(storeDir, v).toString)
      case None => emptyCells(spark)
    }

  /** Live temperature rates (t35's chain over the folded per-source
    * totals — the store's lang-marginal). */
  def temperatureRates(spark: SparkSession, storeDir: String): DataFrame =
    TextAnalysis.temperatureRates(
      cellStore(spark, storeDir).groupBy("source").agg(sum("n").as("n")))

  /** Live raking fit (t30's IPF chain over the folded cells). */
  def rakedFit(spark: SparkSession, storeDir: String): DataFrame =
    TextAnalysis.rakedFit(
      cellStore(spark, storeDir)
        .select(col("lang"), col("source"), col("n").cast("double").as("m")))

  /** One (possibly retried) micro-batch of the composition fold.
    * Package-visible so the spec can drive a duplicate delivery. */
  private[streaming] def foldBatch(
      spark: SparkSession,
      storeDir: String,
      batch: DataFrame,
      id: Long): Unit = {
    val prior = VersionedStore.versions(spark, storeDir).filter(_ < id)
    val cells = prior.maxOption match {
      case Some(v) => spark.read.parquet(VersionedStore.path(storeDir, v).toString)
      case None => emptyCells(spark)
    }
    val merged = cells
      .unionByName(batch.groupBy("lang", "source").agg(count(lit(1)).as("n")))
      .groupBy("lang", "source").agg(sum("n").as("n"))
      .localCheckpoint(true) // materialized before any store mutation
    if (VersionedStore.commit(spark, storeDir, id, merged)) {
      // superseded: everything older than this batch's own pre-fold
      // state (which a retry of THIS id still needs)
      VersionedStore.prune(spark, storeDir, prior.sorted.dropRight(1))
    }
  }

  private def emptyCells(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").cast("string").as("lang"),
      col("id").cast("string").as("source"), col("id").as("n"))
}
