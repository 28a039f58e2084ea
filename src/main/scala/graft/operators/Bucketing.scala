package graft.operators

import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins — the shuffle-elimination tool for the joins
  * that dominate at 100 TB (fact ⋈ fact, fact ⋈ big-dim on a shared key).
  *
  * Writing both sides bucketed (and sorted) by the join key registers the
  * physical layout in the catalog; Catalyst then plans a sort-merge join
  * with NO Exchange on either side — the shuffle is paid once at write
  * time and amortized across every subsequent join on that key. This is
  * the standing answer to "this join shuffles 100 TB every run".
  * (AQE cannot remove those shuffles; only layout can.)
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted catalog table. `buckets` should be
    * sized so one bucket of the LARGEST table fits an executor's memory
    * comfortably (at 100 TB: hundreds to thousands of buckets). */
  def writeBucketed(
      df: DataFrame, table: String, path: String, key: String, buckets: Int): Unit =
    df.write
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key. With matching
    * bucket counts the plan contains no Exchange (verify with
    * `.explain`); with AQE it stays a zero-shuffle sort-merge join. */
  def colocatedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Buckets for the LLM-table layout. Sized for the harness; at 100 TB
    * this is hundreds-to-thousands so one bucket of `documents` fits an
    * executor (see [[writeBucketed]]). */
  val LlmBuckets = 8

  // (session identity, source dir) → registered (documents, embeddings)
  // table names. The layout is written ONCE per source per session and
  // every subsequent join on doc_id/vec_id reuses it — the write is the
  // amortized shuffle.
  private val llmLayouts = new ConcurrentHashMap[String, (String, String)]()
  // table-name tag: a per-JVM counter, NOT a hash of the key — two
  // distinct (session, dir, buckets) keys must never share table names
  // (a 32-bit hash collision would silently overwrite one layout with
  // the other while both cache entries stay live)
  private val layoutSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** The bucketed layout for the LLM tables: `documents` bucket-sorted by
    * `doc_id`, `embeddings` by `vec_id`, SAME bucket count — so
    * `doc_id = vec_id` joins (m01, the dedup/ANN join family) plan with
    * zero Exchange on either side. This is the standing answer to "m01
    * shuffles both sides every run": at 100 TB the layout is paid once at
    * ingest and every downstream join/run reads it co-located. */
  def llmTables(spark: SparkSession, dir: String,
                buckets: Int = LlmBuckets): (DataFrame, DataFrame) = {
    val key = s"${System.identityHashCode(spark)}:$dir:$buckets"
    val (dTab, eTab) = llmLayouts.computeIfAbsent(key, _ => {
      spark.sql("CREATE DATABASE IF NOT EXISTS llm_bkt")
      // table names unique per source dir (sf0.001 vs sf0.01 coexist)
      val tag = s"v${layoutSeq.getAndIncrement()}"
      val root = Files.createTempDirectory("graft-llm-bkt").toString
      val d = s"llm_bkt.documents_$tag"
      val e = s"llm_bkt.embeddings_$tag"
      writeBucketed(Tables.documents(spark, dir), d, s"$root/documents", "doc_id", buckets)
      writeBucketed(Tables.embeddings(spark, dir), e, s"$root/embeddings", "vec_id", buckets)
      (d, e)
    })
    (spark.table(dTab), spark.table(eTab))
  }
}
