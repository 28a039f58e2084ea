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
    * contract as [[screenIncoming]].
    *
    * Durability contract (foreachBatch is at-least-once, so both matter):
    *  - Versions, not overwrites: batch `id` folds into
    *    `bitsDir/batch=<id>`, written to a temp path and RENAMED into
    *    place (atomic on HDFS-like stores) — a crash mid-write can never
    *    lose already-set bits, which would silently break the filter's
    *    no-false-negative guarantee for previously-seen docs.
    *  - Idempotent per batchId: a retried batch probes against the
    *    newest version OLDER than its id (its true pre-insertion state,
    *    still on disk) and skips the fold if its own version already
    *    landed — so retries re-emit byte-identical verdicts instead of
    *    seeing their own insertions as hits.
    * All store paths go through the Hadoop FileSystem API; the rename
    * atomicity the versioning relies on holds on HDFS-like filesystems
    * (HDFS, local). Object stores (`s3a://`) rename by copy+delete, so
    * they additionally need a marker-file commit — see the
    * [[VersionedStore]] scaladoc. */
  def bloomMaintain(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      bitsDir: String,
      checkpointDir: String)(sink: (DataFrame, Long) => Unit): Unit = {
    val q = spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        bloomBatch(batch.sparkSession, bitsDir, batch, id)(sink)
      }
      .start()
    q.awaitTermination()
  }

  /** The current Bloom set-bit table at `bitsDir` — the newest committed
    * version (empty relation before any fold has landed). Bloom versions
    * are FULL snapshots of the merged bit set. */
  def bloomStore(spark: SparkSession, bitsDir: String): DataFrame =
    VersionedStore.versions(spark, bitsDir).maxOption match {
      case Some(v) => spark.read.parquet(VersionedStore.path(bitsDir, v).toString)
      case None => emptyBits(spark)
    }

  /** One (possibly retried) micro-batch of the Bloom fold — see
    * [[bloomMaintain]] for the durability contract. Package-visible so
    * the spec can drive a duplicate delivery directly. */
  private[streaming] def bloomBatch(
      spark: SparkSession,
      bitsDir: String,
      batch: DataFrame,
      id: Long)(sink: (DataFrame, Long) => Unit): Unit = {
    // pre-insertion state for THIS batch: the newest version older than
    // its id — on a retry, the batch's own landed version is ignored
    val prior = VersionedStore.versions(spark, bitsDir).filter(_ < id)
    val bits = prior.maxOption match {
      case Some(v) => spark.read.parquet(VersionedStore.path(bitsDir, v).toString)
      case None => emptyBits(spark)
    }
    // materialized before any store mutation, so a sink that defers its
    // action never reads mid-rename state through lazy lineage
    sink(Dedup.bloomProbe(batch, bits).localCheckpoint(true), id)
    val merged = bits.union(Dedup.bloomBits(batch)).distinct()
      .localCheckpoint(true)
    if (VersionedStore.commit(spark, bitsDir, id, merged)) {
      // superseded versions: everything older than this batch's own
      // pre-insertion state (which a retry of THIS id still needs)
      VersionedStore.prune(spark, bitsDir, prior.sorted.dropRight(1))
    }
  }

  private def emptyBits(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.range(0).select(col("id").as("p"))
  }
}
