package graft.pipeline

import graft.functions.Exprs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Silver stage: bronze → cleaned/typed layer (reference
  * `transformToSilver.py:42-94`).
  *
  * All transforms are codegen'd `Column` expressions — the reference's two
  * Python UDFs (duration parse, ISO→timestamp) are [[Exprs]] compositions,
  * so the whole stage is one scan→project→filter→write job with no
  * Python/JVM boundary and no driver chunk loop (the reference's
  * `index BETWEEN` loop at `transformToSilver.py:100-122` bounded write
  * memory; AQE + file-size targets do that here).
  */
object Silver {

  /** The pure bronze→silver transformation (testable without IO):
    * dates typed (F1), codes trimmed (F3), ISO duration → minutes (U1),
    * packed segment strings → typed arrays (P10/F4/F6/F7/F8/U2), quality
    * filter (P6), then raw `segments*` columns dropped by prefix (P4). */
  def transform(bronze: DataFrame): DataFrame = {
    val arrays = FlightSchemas.segmentArrays.foldLeft(bronze) {
      case (df, (rawCol, arrCol, kind)) =>
        val packed = Exprs.splitPacked(col(rawCol))
        val arr = kind match {
          case "timestamp" => Exprs.isoArrayToTs(packed)
          case "int" => Exprs.scrubIntArray(packed)
          case _ => packed
        }
        df.withColumn(arrCol, arr)
    }
    val cleaned = arrays
      .withColumn("searchDate", to_date(col("searchDate"), "yyyy-MM-dd"))
      .withColumn("flightDate", to_date(col("flightDate"), "yyyy-MM-dd"))
      .withColumn("startingAirport", trim(col("startingAirport")))
      .withColumn("destinationAirport", trim(col("destinationAirport")))
      .withColumn("fareBasisCode", trim(col("fareBasisCode")))
      .withColumn("travelDuration", Exprs.durationToMinutes(col("travelDuration")))
      .filter(col("baseFare") <= col("totalFare") && col("seatsRemaining") >= 0)
    cleaned.drop(cleaned.columns.filter(_.startsWith("segments")): _*)
  }

  /** Incremental silver load: rows of bronze above the silver watermark,
    * transformed and appended partitioned (S3). The final select runs
    * through a temp view + SQL (S7/P9 — the reference's SQL-on-view path,
    * `transformToSilver.py:105-112` — exercised once, not per-chunk). */
  def run(spark: SparkSession, bronzePath: String, silverPath: String): Option[Long] = {
    val wmHi: Option[Long] =
      if (!Sources.pathExists(spark, silverPath)) None
      else spark.read.parquet(silverPath).agg(max("index")).collect()(0) match {
        case r if r.isNullAt(0) => None
        case r => Some(r.getLong(0))
      }
    val bronze = spark.read.parquet(bronzePath)
    val batch = wmHi.fold(bronze)(w => bronze.filter(col("index") > w))
    // batch max, not a post-write full-layer rescan (see Bronze.run)
    val batchMax = batch.agg(max("index")).collect()(0) match {
      case r if r.isNullAt(0) => None
      case r => Some(r.getLong(0))
    }
    if (batchMax.isEmpty) wmHi
    else {
      transform(batch).createOrReplaceTempView("silver_batch")
      val out = spark.sql("SELECT * FROM silver_batch")
      out
        // file-count control + intra-day write parallelism: see Bronze.run
        .repartition(col("year"), col("month"), col("day"),
          pmod(hash(col("index")), lit(Pipeline.FilesPerDay)))
        .write
        .partitionBy("year", "month", "day")
        .mode("append")
        .parquet(silverPath)
      spark.catalog.dropTempView("silver_batch")
      Some(math.max(wmHi.getOrElse(Long.MinValue), batchMax.get))
    }
  }
}
