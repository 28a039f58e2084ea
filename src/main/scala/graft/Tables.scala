package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish tables (TESTDATA.md).
  *
  * Parquet is self-describing; we take the footer schema (partition
  * discovery + vectorized reader + row-group min/max skipping are free).
  * Column pruning / predicate pushdown happen in Catalyst — callers
  * `select`/`filter` declaratively and the scan narrows itself
  * (verify with `.explain`: `ReadSchema` / `PushedFilters`).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** The events fixture writes INT64 TIMESTAMP(NANOS) parquet, which Spark 4
    * refuses by default. With `spark.sql.legacy.parquet.nanosAsLong=true`
    * (set in [[Sessions]]) the column arrives as a nanos `long`; convert to
    * a micros timestamp (integral `div` — a double divide would lose
    * precision above 2^53 ns) so downstream queries see a real timestamp
    * with exactly the semantics the DuckDB oracle gets reading the same file. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
