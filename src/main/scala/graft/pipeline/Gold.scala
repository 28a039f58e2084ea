package graft.pipeline

import java.sql.Date

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gold stage: the two business aggregates (reference
  * `updateToGold.py:39-52`), registered as catalog tables (S4).
  *
  * Divergences from the reference, both deliberate (SURVEY §7.4):
  *   - `asOf` is a parameter, not driver-side `date.today()` — pipelines
  *     and tests pin it for determinism (risk 4);
  *   - tables are written `overwrite`, not `append` — the reference
  *     double-counts on every retry (risk 5). Aggregates are cheap to
  *     recompute relative to re-reading silver; at 100 TB scale the upgrade
  *     is `insertInto` + dynamic-partition overwrite so only the months
  *     present in the batch are rewritten, with identical idempotence.
  *   - no `repartition(10000)` (`updateToGold.py:41,52`) — AQE coalesces
  *     the post-shuffle partitions to match actual data volume.
  */
object Gold {

  /** Gold table 1: per (year, month, single-airline) revenue and mean
    * seats remaining. P7 single-airline array filter, P8 as-of filter,
    * P3 drop + re-derive date parts from flightDate, F11 element_at. */
  def revenueAndSeatsByMonth(silver: DataFrame, asOf: Date): DataFrame =
    silver
      .filter(size(array_distinct(col("airlineCodeArray"))) === 1)
      .filter(col("flightDate") <= lit(asOf))
      .drop("year", "month", "day")
      .withColumn("year", year(col("flightDate")))
      .withColumn("month", month(col("flightDate")))
      .withColumn("airline", element_at(col("airlineCodeArray"), 1))
      .groupBy("year", "month", "airline")
      .agg(sum("totalFare").as("total_fare"),
        round(avg("seatsRemaining"), 2).as("avg_seat_remaining"))

  /** Gold table 2: mean travel duration per fare-basis code (A4). */
  def fareBasisAvgDuration(silver: DataFrame): DataFrame =
    silver.groupBy("fareBasisCode")
      .agg(round(avg("travelDuration"), 2).as("avg_duration"))

  /** Compute both gold tables from the silver layer and register them in
    * the catalog at `goldPath` (S4: external-path `saveAsTable`, the
    * reference's Hive-metastore pattern on Spark's built-in catalog). */
  def run(spark: SparkSession, silverPath: String, goldPath: String, asOf: Date): Unit = {
    spark.sql("CREATE DATABASE IF NOT EXISTS gold")
    val silver = spark.read.parquet(silverPath)

    revenueAndSeatsByMonth(silver, asOf)
      .write
      .partitionBy("month")
      .option("path", s"$goldPath/revenue_n_seat_remain_ym")
      .mode("overwrite")
      .saveAsTable("gold.revenue_n_seat_remain_ym")

    fareBasisAvgDuration(silver)
      .write
      .option("path", s"$goldPath/fbc_travel_duration_relation")
      .mode("overwrite")
      .saveAsTable("gold.fbc_travel_duration_relation")
  }
}
