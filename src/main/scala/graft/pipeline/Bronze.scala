package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bronze stage: raw source → partitioned parquet datalake layer, with an
  * incremental `max(index)` watermark (reference `ingestToBronze.py`).
  *
  * The reference loops 1M-row JDBC chunks through the driver; here the
  * incremental unit is one distributed job over `index > watermark` — the
  * chunk loop existed only to bound driver memory, which a distributed
  * write does not need (SURVEY §3.3). The watermark read (A1) is the one
  * collect-to-driver the engine allows: a scalar from a partial+final agg.
  */
object Bronze {

  /** A1: current high-water mark of the bronze layer, if it exists. */
  def watermark(spark: SparkSession, bronzePath: String): Option[Long] =
    if (!Sources.pathExists(spark, bronzePath)) None
    else spark.read.parquet(bronzePath)
      .agg(max("index")).collect()(0) match {
        case r if r.isNullAt(0) => None
        case r => Some(r.getLong(0))
      }

  /** Derive the `year/month/day` partition columns from `searchDate`
    * (`ingestToBronze.py:79-81`). Kept as a pure function for tests. */
  def withPartitionColumns(raw: DataFrame): DataFrame = {
    val d = to_date(col("searchDate"), "yyyy-MM-dd")
    raw.withColumn("year", year(d))
      .withColumn("month", month(d))
      .withColumn("day", dayofmonth(d))
  }

  /** Ingest rows of `source` above the current watermark into the bronze
    * layer (S3: partitioned append). Returns the new watermark, or the old
    * one when the batch is empty (A6 loop guard, `ingestToBronze.py:76`).
    * Append is safe against replays because the watermark filter makes the
    * batch disjoint from existing data. */
  def run(spark: SparkSession, source: DataFrame, bronzePath: String): Option[Long] = {
    val wm = watermark(spark, bronzePath)
    val batch = wm.fold(source)(w => source.filter(col("index") > w))
    // New watermark = max(old, batch max): one aggregate over the BATCH.
    // Re-reading the whole layer after the write would scan the full
    // history on every incremental run — linear-in-history waste.
    val batchMax = batch.agg(max("index")).collect()(0) match {
      case r if r.isNullAt(0) => None
      case r => Some(r.getLong(0))
    }
    if (batchMax.isEmpty) wm
    else {
      // Repartition by the partition columns before the partitioned write:
      // otherwise every one of the N shuffle/input partitions writes a
      // file into every (year,month,day) directory — N× the file count,
      // the classic small-files problem at scale. But keying on the layout
      // ALONE funnels a typical incremental batch (one day of data) through
      // a single shuffle partition / single writer task — the whole batch
      // serialized through one core. The intra-day salt fans each day out
      // over up to [[Pipeline.FilesPerDay]] writer tasks while keeping the
      // per-day file count bounded by the same constant.
      withPartitionColumns(batch)
        .repartition(col("year"), col("month"), col("day"),
          pmod(hash(col("index")), lit(Pipeline.FilesPerDay)))
        .write
        .partitionBy("year", "month", "day")
        .mode("append")
        .parquet(bronzePath)
      Some(math.max(wm.getOrElse(Long.MinValue), batchMax.get))
    }
  }
}
