package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Incrementally-maintained dataset card — t28's per-release report kept
  * current per arrival batch instead of recomputed by a nightly sweep.
  *
  * The q50 mergeable-sketch pattern, made exact: the card's aggregates
  * are all expressible over two SMALL mergeable state tables, so each
  * micro-batch folds its delta in and re-renders without touching any
  * previously-seen document:
  *
  *   - `langs`  (lang → n_docs, total_tokens, quality sum as a scaled
  *     integer, n_quality_pass): purely additive counters;
  *   - `hashes` (content md5 → min doc_id seen, that doc's lang,
  *     arrivals): min/sum-mergeable — the min-merge makes "which copy is
  *     the original" independent of arrival order, so the streamed card
  *     equals the batch card BY ALGEBRA, not by luck of file ordering.
  *
  * Duplicate accounting derives from the states: a doc is a dup iff it
  * is not its hash's min-doc_id copy, so per-lang
  * `n_dups = n_docs − #hashes first-seen in that lang` — exactly t28's
  * window flag, without a window and without rescanning history.
  *
  * Scale shape: `langs` is nlang-sized; `hashes` is the corpus's
  * distinct-content index — the SAME stored table the d14/CorpusStreams
  * dedup front door maintains, so at 100 TB the card rides an index that
  * already exists (a production deployment persists both states as
  * versioned tables / MERGE targets; this in-memory fold documents the
  * algebra and keeps lineage truncated per batch).
  */
object CardStreams {

  /** Per-batch mergeable deltas from the shared t28 projection. */
  private def deltas(batch: DataFrame): (DataFrame, DataFrame) = {
    val per = TextAnalysis.cardPerDoc(batch)
    val dh = per.groupBy(md5(col("text")).as("h"))
      .agg(min(struct(col("doc_id"), col("lang"))).as("m"),
        count(lit(1)).as("n"))
      .select(col("h"), col("m.doc_id").as("first_doc"),
        col("m.lang").as("first_lang"), col("n"))
    val dl = per.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        sum(round(col("quality") * 1000000).cast("long")).as("q_scaled"),
        sum(when(col("quality") >= 0.5, 1L).otherwise(0L)).as("n_quality_pass"))
    (dh, dl)
  }

  private def mergeHashes(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta)
      .groupBy("h")
      .agg(min(struct(col("first_doc"), col("first_lang"))).as("m"),
        sum("n").as("n"))
      .select(col("h"), col("m.first_doc").as("first_doc"),
        col("m.first_lang").as("first_lang"), col("n"))

  private def mergeLangs(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta)
      .groupBy("lang")
      .agg(sum("n_docs").as("n_docs"), sum("total_tokens").as("total_tokens"),
        sum("q_scaled").as("q_scaled"), sum("n_quality_pass").as("n_quality_pass"))

  /** Renders the t28 card (lang incl. the ALL rollup row → n_docs,
    * total_tokens, avg_quality, n_dups, n_quality_pass) from the two
    * state tables. */
  def renderCard(hashes: DataFrame, langs: DataFrame): DataFrame = {
    val firsts = hashes.groupBy(col("first_lang").as("lang"))
      .agg(count(lit(1)).as("n_first"))
    val per = langs.join(firsts, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"), col("total_tokens"), col("q_scaled"),
        col("n_quality_pass"), coalesce(col("n_first"), lit(0L)).as("n_first"))
    val all = per.agg(sum("n_docs").as("n_docs"), sum("total_tokens").as("total_tokens"),
      sum("q_scaled").as("q_scaled"), sum("n_quality_pass").as("n_quality_pass"),
      sum("n_first").as("n_first"))
      .select(lit("ALL").as("lang"), col("n_docs"), col("total_tokens"),
        col("q_scaled"), col("n_quality_pass"), col("n_first"))
    per.unionByName(all)
      .select(col("lang"), col("n_docs"), col("total_tokens"),
        round(col("q_scaled") / 1000000.0 / col("n_docs"), 6).as("avg_quality"),
        (col("n_docs") - col("n_first")).as("n_dups"), col("n_quality_pass"))
  }

  /** Relays unseen document files from `sourceDir` and hands the
    * UPDATED card to `onCard` after folding in each micro-batch.
    * Blocks until the AvailableNow drain finishes; re-running with the
    * same `checkpointDir` folds in only files added since the last run
    * (pass the prior states to resume — the merge is associative, so
    * resumed and from-scratch cards agree). Returns the final states
    * for persistence/resume. */
  def cardIncremental(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      checkpointDir: String,
      initial: Option[(DataFrame, DataFrame)] = None,
      maxFilesPerTrigger: Option[Int] = None)(
      onCard: DataFrame => Unit): (DataFrame, DataFrame) = {
    var state = initial
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val q = reader.parquet(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val (dh, dl) = deltas(batch)
        val merged = state match {
          case Some((h, l)) => (mergeHashes(h, dh), mergeLangs(l, dl))
          case None => (dh, dl)
        }
        // truncate lineage per batch (the s06/s13 iterative contract) —
        // without this the state's plan grows with the batch count
        state = Some((merged._1.localCheckpoint(true), merged._2.localCheckpoint(true)))
        onCard(renderCard(state.get._1, state.get._2))
      }
      .start()
    q.awaitTermination()
    state.getOrElse((deltas(spark.emptyDataFrame.to(schema))._1,
      deltas(spark.emptyDataFrame.to(schema))._2))
  }
}
