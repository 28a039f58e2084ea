package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/side-effect primitives for the pipeline (SURVEY §2.1).
  *
  * S5 CSV, S1 JDBC-partitioned, S6 filesystem probe — each a direct Scala
  * call where the reference needed a py4j gateway or a pandas chunk loop.
  */
object Sources {

  /** S6: path-existence probe — the 3-line Scala form of the reference's
    * 26-line py4j bridge (`ingestToBronze.py:9-34`). Drives the
    * initial-vs-incremental branch in every stage. */
  def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** S5: one distributed CSV read with a declared schema — replaces the
    * reference's driver-side pandas `chunksize=1e6` loop with lossy
    * `float16` casts (`scripts/ingest-data.py:20-56`). No inference: the
    * schema is the contract. */
  def csv(spark: SparkSession, path: String, schema: StructType = FlightSchemas.raw): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .csv(path)

  /** S1: JDBC range-partitioned scan. The reference pushes one
    * `index BETWEEN a AND b` subquery down a single connection
    * (`ingestToBronze.py:43-49,63-74`); the scalable form gives every
    * executor its own range-bounded connection. Connection params come in
    * via `options` (url, user, password, driver). */
  def jdbcPartitioned(
      spark: SparkSession,
      table: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int,
      options: Map[String, String]): DataFrame =
    spark.read.format("jdbc")
      .options(options)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound.toString)
      .option("upperBound", upperBound.toString)
      .option("numPartitions", numPartitions.toString)
      .option("fetchsize", "100000")
      .load()
}
