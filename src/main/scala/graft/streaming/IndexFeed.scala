package graft.streaming

import graft.{QueryDef, Tables}
import graft.functions.{KMeans, VectorOps}
import graft.operators.{Dedup, PartitionedTable}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Change-feed-driven ANN index maintenance — the lakehouse substrate
  * and the similarity family composed: an IVF index over an embedding
  * table, kept current purely by SUBSCRIBING to the table's change
  * feed, never by rebuilding.
  *
  *  - the index is itself a [[PartitionedTable]] PARTITIONED BY CLUSTER
  *    id (the inverted lists ARE the partitions): a probe-time search
  *    resolves the manifest and reads only the probed clusters'
  *    pinned dirs — first-level skipping, zero corpus shuffle;
  *  - each source commit's feed slice (pre-images on) maps to index
  *    changes with a FROZEN quantizer: insert/update_post → upsert at
  *    the row's cluster, delete/update_pre → delete at the OLD
  *    image's cluster — so an update whose embedding moved between
  *    clusters lands as (delete old list, insert new list), the
  *    partition-key-change case a naive keyed upsert gets wrong, and
  *    one that stayed put collapses to a plain upsert inside the
  *    merge; any unexpected op fails loud (a pre-images-off feed
  *    would silently corrupt the index otherwise);
  *  - EXACTLY-ONCE by composition: [[ChangeFeed.maintain]] delivers
  *    at-least-once per source version, and the slice lands via
  *    [[PartitionedTable.mergeAt]] with `id = source version` — a
  *    replayed slice meets its already-committed index manifest and
  *    no-ops. Index version N ≡ source version N, so index lag is
  *    readable straight off the two manifests.
  *
  * 100 TB posture: a drain costs the sum of the touched partitions of
  * the pending source commits (the feed contract) plus index merges
  * that rewrite only the clusters receiving changes; a search costs
  * nprobe inverted lists. The corpus is never rescanned, reshuffled,
  * or reassigned — the frozen-quantizer trade every IVF index makes
  * until drift forces a refit (s29's drift report is the trigger).
  */
object IndexFeed {

  /** Map one change-feed slice (pre-images ON) to IVF index changes:
    * (keyCol, embCol, cluster, op) with op ∈ upsert|delete. Fails loud
    * on any other feed op — in particular the collapsed `update` of a
    * pre-images-off feed, which carries no old image to delete. */
  private[streaming] def indexChanges(
      slice: DataFrame, model: KMeans.Model, keyCol: String, embCol: String,
      distDecimals: Int): DataFrame = {
    val cluster = model.clusterOf(col(embCol), distDecimals)
      .cast("long").cast("string").as("cluster")
    val mapped = when(col("op").isin("insert", "update_post"), "upsert")
      .when(col("op").isin("delete", "update_pre"), "delete")
      .otherwise(raise_error(concat(
        lit("IndexFeed: feed op must be insert|delete|update_pre|update_post" +
          " (pre-images on), got "), coalesce(col("op"), lit("NULL")))))
    slice.select(col(keyCol), col(embCol), cluster, mapped.as("op"))
  }

  /** Drain every not-yet-indexed commit of the table at `tableDir` into
    * the IVF index at `indexDir` (see object doc for the exactly-once
    * contract). Returns the source versions processed this drain. */
  def maintainIvf(
      spark: SparkSession,
      tableDir: String,
      checkpointDir: String,
      indexDir: String,
      model: KMeans.Model,
      keyCol: String,
      partCol: String,
      embCol: String = "embedding",
      distDecimals: Int = -1,
      startVersion: Long = -1L): Seq[Long] =
    ChangeFeed.maintain(spark, tableDir, checkpointDir, keyCol, partCol,
      (feed, v) => {
        PartitionedTable.mergeAt(spark, indexDir,
          indexChanges(feed, model, keyCol, embCol, distDecimals),
          keyCol, "cluster", "op", id = v): Unit
      }, preImages = true, startVersion = startVersion)

  /** Query the maintained index: resolve the `nprobe` nearest inverted
    * lists DRIVER-side (centroids are k-sized), read exactly those
    * partitions' pinned dirs, score with the fused dot/norm kernels,
    * and TakeOrdered the top `k`. Exact within the probed lists; ties
    * break on the key for determinism. */
  def searchIvf(
      spark: SparkSession,
      indexDir: String,
      model: KMeans.Model,
      query: Seq[Double],
      nprobe: Int,
      k: Int,
      keyCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    require(nprobe >= 1 && k >= 1, s"bad search: nprobe=$nprobe k=$k")
    val probed = model.centroids.zipWithIndex.map { case (c, i) =>
      (c.zip(query).map { case (a, b) => (a - b) * (a - b) }.sum, i)
    }.sortBy(identity).take(nprobe).map(_._2.toString).toSeq
    val q2 = query.map(x => x * x).sum
    val d2 = VectorOps.norm(col(embCol)) * VectorOps.norm(col(embCol)) -
      lit(2.0) * VectorOps.dot(col(embCol), typedLit(query)) + lit(q2)
    // a cluster that never received a vector has no inverted list —
    // probe only the lists the index manifest actually holds, and when
    // NONE of the probed clusters are live, a valid query returns an
    // empty, correctly-schemed top-k rather than a read failure
    val live = PartitionedTable.partitionValues(spark, indexDir).toSet
    val probedLive = probed.filter(live.contains)
    val scored =
      if (probedLive.isEmpty)
        PartitionedTable.read(spark, indexDir).withColumn("d2", d2).limit(0)
      else PartitionedTable.readPartitions(spark, indexDir, probedLive)
        .withColumn("d2", d2)
    scored.orderBy(col("d2"), col(keyCol)).limit(k)
  }

  /** Per-JVM scratch root (the [[ChangeFeed]] pattern). */
  private lazy val workDir: java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory("graft-index-feed")
    sys.addShutdownHook {
      def del(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(del)); f.delete(): Unit
      }
      del(d.toFile)
    }
    d
  }

  val defs: Seq[QueryDef] = Seq(
    // Feed-maintained IVF index, hash-gated: land embeddings minus the
    // ≡0-mod-10 holdout as a partitioned table (v0), fit the FROZEN
    // 8-cell quantizer on that corpus, then drive THREE CDC commits —
    // insert the holdout (v1), update ≡1 mod 9 to NEGATED vectors (v2,
    // the cluster-moving case), delete ≡0 mod 7 (v3) — and maintain
    // the index purely from the change feed. The gate aggregates the
    // FINAL INDEX per cluster (count + key checksum) against the
    // oracle's closed-form final state assigned through the unrolled
    // k-means CTEs, so an index that loses an event, leaves a moved
    // key's stale row in its old inverted list, resurrects a deleted
    // key, or drifts the quantizer breaks the hash. Replay idempotence
    // and probe-time pruning are spec'd in IndexFeedSpec.
    QueryDef.sql("s36_feed_ivf_maintain",
      s"""WITH idx AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 0),
         |${Dedup.kmeansCtes(8, 2, 4, 6, src = "idx")},
         |fin AS (
         |  SELECT vec_id,
         |         CASE WHEN vec_id % 9 = 1
         |              THEN list_transform(embedding, x -> -x)
         |              ELSE embedding END AS embedding
         |  FROM embeddings WHERE vec_id % 7 <> 0),
         |fd AS (
         |  SELECT f.vec_id, c.cid, ${Dedup.sqDistSql("f.embedding", "c.ce", 6)} AS d2
         |  FROM fin f, cent2 c),
         |asn AS (
         |  SELECT vec_id, cid AS cluster FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rk
         |    FROM fd) WHERE rk = 1)
         |SELECT cluster, CAST(count(*) AS BIGINT) AS n_vecs,
         |       CAST(sum(vec_id) AS BIGINT) AS key_sum
         |FROM asn GROUP BY cluster""".stripMargin) { (s, dir) =>
      val store = workDir.resolve(
        "s36_src_" + dir.replaceAll("[^A-Za-z0-9]", "_")).toString
      val idxDir = workDir.resolve(
        "s36_idx_" + dir.replaceAll("[^A-Za-z0-9]", "_")).toString
      val ckpt = workDir.resolve(
        "s36_ckpt_" + dir.replaceAll("[^A-Za-z0-9]", "_")).toString
      val hfs = VersionedStore.fs(s, store)
      Seq(store, idxDir, ckpt).foreach(p => hfs.delete(new Path(p), true))
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding"))
        .withColumn("part", (col("vec_id") % 8).cast("string"))
      val initial = emb.filter(col("vec_id") % 10 =!= 0)
      PartitionedTable.commit(s, store, initial, "part") // v0
      val model = KMeans.fit(initial, "embedding", "vec_id",
        k = 8, iters = 2, meanDecimals = 4, distDecimals = 6)
      PartitionedTable.merge(s, store, // v1: insert the holdout
        emb.filter(col("vec_id") % 10 === 0).withColumn("op", lit("upsert")),
        "vec_id", "part")
      PartitionedTable.merge(s, store, // v2: cluster-moving updates
        emb.filter(col("vec_id") % 9 === 1)
          .withColumn("embedding", transform(col("embedding"), x => -x))
          .withColumn("op", lit("upsert")),
        "vec_id", "part")
      PartitionedTable.merge(s, store, // v3: deletes
        emb.filter(col("vec_id") % 7 === 0).withColumn("op", lit("delete")),
        "vec_id", "part")
      maintainIvf(s, store, ckpt, idxDir, model, "vec_id", "part",
        distDecimals = 6)
      PartitionedTable.read(s, idxDir)
        .groupBy(col("cluster").cast("long").as("cluster"))
        .agg(count(lit(1)).as("n_vecs"), sum("vec_id").as("key_sum"))
    }
  )
}
