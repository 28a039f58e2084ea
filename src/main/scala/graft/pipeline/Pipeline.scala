package graft.pipeline

import java.sql.Date

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The medallion pipeline as plain function calls (SURVEY §2.9): what the
  * reference orchestrates as four Airflow `spark-submit` tasks
  * (`/root/reference/mnt/airflow/dags/flight_pipeline.py:48-95`) collapses
  * into one `SparkSession` and four stage functions — stage boundaries are
  * function boundaries, retry/idempotence is each stage's own contract
  * (watermark append for bronze/silver, anti-join dims, overwrite gold).
  */
object Pipeline {

  /** Writer fan-out per (year,month,day) partition for bronze/silver
    * appends: a one-day incremental batch hash-salted over this many
    * shuffle partitions writes with this much parallelism AND produces at
    * most this many files per day per batch. 8 balances the two at the
    * target batch sizes; a cluster deployment would size it to
    * batch_bytes / desired_file_bytes. */
  val FilesPerDay = 8

  final case class Paths(bronze: String, silver: String, gold: String, warehouse: String)

  object Paths {
    def under(root: String): Paths =
      Paths(s"$root/bronze/flights", s"$root/silver/flights",
        s"$root/gold", s"$root/warehouse")
  }

  /** One full run: source → bronze → silver → gold + warehouse.
    * Returns the bronze watermark after ingest. Safe to re-run with the
    * same or a grown source (incremental stages no-op on no new rows). */
  def run(spark: SparkSession, source: DataFrame, paths: Paths, asOf: Date): Option[Long] = {
    val wm = Bronze.run(spark, source, paths.bronze)
    Silver.run(spark, paths.bronze, paths.silver)
    Gold.run(spark, paths.silver, paths.gold, asOf)
    Warehouse.run(spark, paths.silver, paths.warehouse)
    wm
  }
}
