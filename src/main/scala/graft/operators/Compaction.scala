package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, SparkSession}

/** Small-file compaction — the maintenance rewrite that keeps long-lived
  * tables scannable. Streaming ingest, per-batch appends and fine-grained
  * partition overwrites all accrete files far below the scanner's sweet
  * spot; at 100 TB the resulting per-file open/footer overhead and
  * undersized split planning dominate scan time long before bytes do.
  *
  * The rewrite bin-packs to a byte target computed from the layout's own
  * FS stats (never a guessed file count), preserves clustering when asked
  * (a compaction that round-robins a Z-ordered or range layout silently
  * destroys its data-skipping), and writes to a side directory swapped in
  * only after the rewrite completes — readers never observe a half-written
  * layout. Partitioned tables compact partition-by-partition with exactly
  * this primitive applied per partition directory.
  */
object Compaction {

  /** Files and bytes currently in `path` (top-level data files). */
  def layoutStats(spark: SparkSession, path: String): (Int, Long) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val data = fs.listStatus(p).filter { f =>
      val n = f.getPath.getName
      f.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    (data.length, data.map(_.getLen).sum)
  }

  /** Rewrite `path` into ~ceil(totalBytes / targetBytes) files. Pass
    * `cluster` to preserve a sorted/Z-ordered layout (range partition +
    * in-file sort on the same key); omit it for unordered tables (plain
    * round-robin). Returns (filesBefore, filesAfter), both counted from
    * the FS (range partitions can come up empty, so the actual output
    * count may be below the requested split).
    *
    * Refuses a directory with no top-level data files — that is a
    * partitioned-table ROOT (or an empty dir), and "compacting" it would
    * flatten every partition into one unpartitioned tree. Partitioned
    * tables compact per partition directory. */
  /** `stage` runs against the rewritten temp dir BEFORE the swap —
    * sidecars staged there (e.g. a regenerated `_stats` manifest)
    * commit atomically with the new layout, so a crash can never leave
    * a layout whose sidecar describes the old files. */
  def compact(
      spark: SparkSession,
      path: String,
      targetBytes: Long,
      cluster: Option[Column] = None,
      stage: Option[Path => Unit] = None): (Int, Int) = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val (before, totalBytes) = layoutStats(spark, path)
    require(before > 0 && totalBytes > 0,
      s"$path has no top-level data files — partitioned root or empty dir; " +
        "compact each partition directory instead")
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(path)
    val packed = cluster match {
      case Some(c) => df.repartitionByRange(n, c).sortWithinPartitions(c)
      case None => df.repartition(n)
    }
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new Path(path + "__compacting")
    val old = new Path(path + "__replaced")
    fs.delete(tmp, true) // stale leftovers from a crashed earlier attempt
    fs.delete(old, true)
    packed.write.mode("overwrite").parquet(tmp.toString)
    stage.foreach(_(tmp))
    // crash-safe swap: the path is never empty — old moves aside, new
    // moves in, only then does old get deleted. A crash between the two
    // renames leaves the data recoverable at path__replaced, never gone.
    require(fs.rename(p, old), s"rename $p -> $old failed")
    if (!fs.rename(tmp, p)) {
      fs.rename(old, p) // roll back so the original layout stays live
      throw new IllegalStateException(s"rename $tmp -> $p failed; original restored")
    }
    fs.delete(old, true)
    val (after, _) = layoutStats(spark, path)
    (before, after)
  }
}
