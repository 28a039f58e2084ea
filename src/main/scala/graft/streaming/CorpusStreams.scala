package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Streaming front door for the incremental corpus-dedup screen: new
  * document files land in a directory, and each `AvailableNow` relay
  * screens ONLY the files the checkpoint has not seen against the
  * existing corpus index — the d14 operator
  * ([[Dedup.screenAgainstIndex]]) applied per micro-batch, so the
  * streaming and batch forms are the same code path by construction.
  *
  * Scale shape: the file-source checkpoint bounds each run to the delta
  * (exactly-once per file, restart-safe); the screen itself never pairs
  * corpus×corpus — exact membership is a content-hash probe and near-dup
  * candidates come from the (capped, observed) LSH band join. At 100 TB
  * the index side is a STORED band/signature table maintained by the
  * nightly merge; here it derives from the `index` DataFrame the caller
  * passes (checkpoint it if it is expensive to recompute per batch).
  */
object CorpusStreams {

  /** Relay unseen files from `sourceDir` through the d14 screen against
    * `index`, handing each screened micro-batch to `sink`. Blocks until
    * the AvailableNow drain finishes; re-running with the same
    * `checkpointDir` screens only files added since the last run. */
  def screenIncoming(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      index: DataFrame,
      checkpointDir: String)(sink: (DataFrame, Long) => Unit): Unit = {
    val q = spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(Dedup.screenAgainstIndex(batch, index), id)
      }
      .start()
    q.awaitTermination()
  }

  /** Maintain a PERSISTENT Bloom set-bit table as document files arrive:
    * each micro-batch is probed against the bits stored at `bitsDir`
    * (pre-insertion state — the verdict says "seen before this batch")
    * and then its own positions fold into the store. The store is at
    * most [[Dedup.BloomM]] rows regardless of how many petabytes have
    * flowed through, so the fold is a bounded union+distinct and the
    * probe side broadcasts — this is the always-on front gate that lets
    * the EXPENSIVE membership machinery (content-hash join, LSH bands)
    * run only on the rare bloom hits. Same exactly-once file-source
    * contract as [[screenIncoming]]. */
  def bloomMaintain(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      bitsDir: String,
      checkpointDir: String)(sink: (DataFrame, Long) => Unit): Unit = {
    import org.apache.spark.sql.functions.col
    val q = spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val bits =
          if (new java.io.File(bitsDir).exists()) spark.read.parquet(bitsDir)
          else spark.range(0).select(col("id").as("p"))
        sink(Dedup.bloomProbe(batch, bits), id)
        // materialize BEFORE overwriting the path the union reads from
        val merged = bits.union(Dedup.bloomBits(batch)).distinct()
          .localCheckpoint(true)
        merged.write.mode("overwrite").parquet(bitsDir)
      }
      .start()
    q.awaitTermination()
  }
}
