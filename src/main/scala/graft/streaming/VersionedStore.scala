package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** batchId-versioned parquet state store for `foreachBatch` folds — the
  * durability seam shared by the Bloom screen ([[CorpusStreams]]) and the
  * packing stream ([[PackStreams]]). foreachBatch is at-least-once and a
  * plain `mode("overwrite")` is non-atomic, so state is written as
  * immutable per-batch version directories instead:
  *
  *  - [[commit]] writes to a temp path and RENAMES into `batch=<id>`
  *    (atomic on HDFS-like filesystems — HDFS, local, anything where
  *    directory rename is a metadata op) — a crash mid-write leaves only
  *    an invisible temp dir, never a half-written committed version.
  *    Object stores (s3a://) implement directory rename as a non-atomic
  *    copy+delete, so a crash mid-rename CAN surface a partial committed
  *    version there; on such stores the store dir needs a marker-file
  *    commit (write `batch=<id>/_COMMITTED` last and filter
  *    [[versions]] on it) — not implemented here, so point the store at
  *    an HDFS-like filesystem;
  *  - a retried batch sees its own version already committed and skips
  *    the write, so re-deliveries can recompute their emitted output
  *    from the PRE-batch state (`versions(...).filter(_ < id)`) and get
  *    byte-identical results;
  *  - all paths go through the Hadoop FileSystem API, so `hdfs://` /
  *    `s3a://` store dirs behave the same as local ones.
  *
  * Whether a version is a FULL state snapshot (Bloom: each version is
  * the merged bit set; superseded versions are pruned) or a DELTA
  * (packing: each version is one batch's assignment; the state is the
  * union of all versions) is the caller's contract.
  *
  * The batch side reuses the same seam: [[graft.operators.VersionedTable]]
  * commits layout rewrites (compaction, Z-order) as full-snapshot
  * versions, giving readers snapshot isolation and exact time travel.
  */
private[graft] object VersionedStore {

  def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def path(dir: String, id: Long): Path = new Path(dir, s"batch=$id")

  /** Committed (fully renamed) version ids under `dir`. */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val hfs = fs(spark, dir)
    val root = new Path(dir)
    if (!hfs.exists(root)) Seq.empty
    else hfs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("batch=") => s.stripPrefix("batch=").toLong }
  }

  /** Atomically commit `df` as version `id` unless that version already
    * exists (the retry case). Returns true iff this call wrote it.
    *
    * The rename's boolean result is checked: if the destination appeared
    * between the [[versions]] probe and the rename (a concurrent retry
    * won the slot) this returns false like any other lost race — the
    * caller must NOT prune prior versions or otherwise assume its
    * snapshot landed. Any other rename failure (filesystem error) throws
    * so the streaming query fails loudly instead of silently folding
    * from stale state. */
  def commit(spark: SparkSession, dir: String, id: Long, df: DataFrame): Boolean = {
    if (versions(spark, dir).contains(id)) return false
    val hfs = fs(spark, dir)
    val tmp = new Path(dir, s".tmp-$id")
    df.write.mode("overwrite").parquet(tmp.toString)
    if (hfs.rename(tmp, path(dir, id))) true
    else {
      hfs.delete(tmp, true)
      if (versions(spark, dir).contains(id)) false // concurrent/retry winner
      else throw new java.io.IOException(
        s"VersionedStore: rename $tmp -> ${path(dir, id)} failed and the " +
          "version does not exist; refusing to continue from unknown state")
    }
  }

  /** Delete committed versions, e.g. ones superseded by a snapshot. */
  def prune(spark: SparkSession, dir: String, ids: Seq[Long]): Unit = {
    val hfs = fs(spark, dir)
    ids.foreach(id => hfs.delete(path(dir, id), true))
  }
}
