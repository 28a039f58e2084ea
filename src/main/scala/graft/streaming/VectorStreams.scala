package graft.streaming

import graft.functions.KMeans
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Streaming front door for ANN index ingest — the s18 upsert as it runs
  * in production: new embedding files land in a directory, and each
  * `AvailableNow` relay assigns ONLY the files the checkpoint has not
  * seen to the FROZEN centroid model, handing (vec_id, cluster) postings
  * to the sink. The fit never runs on the ingest path (it is the rare
  * offline job, s06); per batch the assignment is a zero-shuffle
  * projection — centroids travel as plan literals — so ingest cost is
  * one codegen pass over the delta, restart-safe and exactly-once per
  * file via the file-source checkpoint.
  */
object VectorStreams {

  /** Relay unseen embedding files from `sourceDir` through the
    * frozen-centroid assignment, handing each assigned micro-batch to
    * `sink`. Blocks until the AvailableNow drain finishes; re-running
    * with the same `checkpointDir` assigns only files added since the
    * last run. `distDecimals` mirrors the fit's quantization so stream
    * and batch assignments are identical. */
  def assignIncoming(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      model: KMeans.Model,
      checkpointDir: String,
      distDecimals: Int = 6)(sink: (DataFrame, Long) => Unit): Unit = {
    val q = spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(batch.select(col("vec_id"),
          model.clusterOf(col("embedding"), distDecimals).cast("long").as("cluster")), id)
      }
      .start()
    q.awaitTermination()
  }
}
