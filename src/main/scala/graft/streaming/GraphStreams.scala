package graft.streaming

import graft.operators.Similarity
import graft.functions.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Streaming maintenance of the s17 kNN graph — the index-update front
  * door that completes the graph-ANN lifecycle (build s17, search
  * s22/s23, maintain here): newly-landed embedding files fold into the
  * adjacency incrementally, so the graph the traversals read is kept
  * current per arrival batch instead of rebuilt by a nightly job.
  *
  * Per batch, against two state tables (the banded signature index and
  * the current adjacency):
  *   - the delta's banded signatures join the signature index (which
  *     includes the delta itself, covering within-batch pairs) on
  *     (band, bucket) — never corpus×corpus, the d14/s18 screen shape;
  *   - candidate pairs enter in BOTH directions: the new vector's own
  *     neighbor list, and REVERSE insertions into existing vectors'
  *     lists. The reverse direction is what makes incremental == batch
  *     BY INDUCTION: a vector's top-degree neighbor set over a growing
  *     corpus is exactly its insertion-maintained top-degree set, so
  *     after the last arrival the maintained adjacency equals the
  *     batch-built graph over the union (asserted in GraphStreamsSpec);
  *   - adjacency = rank-cut of (old edges ∪ new candidates) per vector
  *     — a map-side WindowGroupLimit over keys touched this batch.
  *
  * The mega-bucket cap is enforced on arrival in the batch build; the
  * incremental form inherits whatever the index already admitted (a
  * production deployment watches bucket sizes via the same observe
  * metrics and stops pairing into over-cap buckets — the fixtures here
  * sit far below the cap, which is what the equality spec relies on).
  */
object GraphStreams {

  /** One maintenance fold: merge `delta` (vec_id, embedding) into
    * `(sigState, adjState)` and return the new states. Pure function of
    * its inputs — the streaming relay just applies it per micro-batch,
    * so batch and stream are the same code path. */
  def fold(delta: DataFrame, sigState: Option[DataFrame], adjState: Option[DataFrame])
      : (DataFrame, DataFrame) = {
    val dsig = Similarity.bandedSig(delta).localCheckpoint(true)
    val allSig = sigState.map(_.unionByName(dsig)).getOrElse(dsig)
    // delta ⋈ everything-seen within (band, bucket), both directions
    val pairs = dsig.alias("a")
      .join(allSig.alias("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
          && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("nbr"),
        VectorOps.cosineR(col("a.embedding"), col("b.embedding")).as("cos"),
        col("b.embedding").as("ne"))
    val reverse = dsig.alias("a")
      .join(allSig.alias("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
          && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("b.vec_id").as("vec_id"), col("a.vec_id").as("nbr"),
        VectorOps.cosineR(col("b.embedding"), col("a.embedding")).as("cos"),
        col("a.embedding").as("ne"))
    val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("nbr"))
    val adj = adjState.map(_.unionByName(pairs).unionByName(reverse))
      .getOrElse(pairs.unionByName(reverse))
      .dropDuplicates("vec_id", "nbr")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= Similarity.GraphDegree)
      .drop("rk")
    (allSig.localCheckpoint(true), adj.localCheckpoint(true))
  }

  /** Streaming maintenance of the s30/s31 LAYER LADDER: the coarse
    * layer is the identical kNN construction over the promoted members
    * (vec_id ≡ 1 mod [[Similarity.HierCoarseMod]] — content-stable, so
    * the split of an arrival batch is deterministic), which makes its
    * maintenance the SAME [[fold]] applied to the delta's promoted
    * slice against the coarse state pair. One arrival batch therefore
    * updates BOTH layers the hierarchical search reads; the coarse
    * fold touches 1/mod of the delta and its own 1/mod-sized index.
    * Incremental == batch holds for each layer by the same induction
    * (asserted per layer in GraphStreamsSpec). */
  def ladderFold(
      delta: DataFrame,
      fine: Option[(DataFrame, DataFrame)],
      coarse: Option[(DataFrame, DataFrame)])
      : ((DataFrame, DataFrame), (DataFrame, DataFrame)) = {
    val f = fold(delta, fine.map(_._1), fine.map(_._2))
    val promoted = delta.filter(col("vec_id") % Similarity.HierCoarseMod === 1)
    val c = fold(promoted, coarse.map(_._1), coarse.map(_._2))
    (f, c)
  }

  /** Renders the maintained adjacency in s17's output shape
    * (vec_id, nbr, cos, rk). */
  def render(adj: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("nbr"))
    adj.select(col("vec_id"), col("nbr"), col("cos"))
      .withColumn("rk", row_number().over(w).cast("long"))
  }

  /** Relays unseen embedding files from `sourceDir` through [[fold]],
    * handing the updated rendered graph to `onGraph` after each batch.
    * Re-running with the same `checkpointDir` folds only new files
    * (seed `initial` with the prior states to resume). Returns the
    * final states. */
  def maintainGraph(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      checkpointDir: String,
      initial: Option[(DataFrame, DataFrame)] = None,
      maxFilesPerTrigger: Option[Int] = None)(
      onGraph: DataFrame => Unit): Option[(DataFrame, DataFrame)] = {
    var state = initial
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val q = reader.parquet(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val (sig, adj) = fold(batch, state.map(_._1), state.map(_._2))
        state = Some((sig, adj))
        onGraph(render(adj))
      }
      .start()
    q.awaitTermination()
    state
  }
}
