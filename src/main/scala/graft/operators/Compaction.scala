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

  /** Rewrite `path` into ceil(totalBytes / targetBytes) files. Pass
    * `cluster` to preserve a sorted/Z-ordered layout (range partition +
    * in-file sort on the same key); omit it for unordered tables (plain
    * round-robin). Returns (filesBefore, filesAfter). */
  def compact(
      spark: SparkSession,
      path: String,
      targetBytes: Long,
      cluster: Option[Column] = None): (Int, Int) = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val (before, totalBytes) = layoutStats(spark, path)
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(path)
    val packed = cluster match {
      case Some(c) => df.repartitionByRange(n, c).sortWithinPartitions(c)
      case None => df.repartition(n)
    }
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new Path(path + "__compacting")
    packed.write.mode("overwrite").parquet(tmp.toString)
    // swap: the old layout stays readable until the rewrite is durable
    fs.delete(p, true)
    require(fs.rename(tmp, p), s"rename $tmp -> $p failed")
    (before, n)
  }
}
