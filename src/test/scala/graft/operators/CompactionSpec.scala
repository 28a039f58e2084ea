package graft.operators

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def checksum(df: org.apache.spark.sql.DataFrame) = df
    .agg(count(lit(1)), sum(floor(col("l_quantity"))), sum("l_orderkey")).head()

  test("compaction bin-packs to the byte target and preserves content") {
    val base = Files.createTempDirectory("graft-compact").toString + "/t"
    val li = Tables.lineitem(spark, dir)
    li.repartition(64).write.parquet(base)
    val expected = checksum(spark.read.parquet(base))

    val (_, totalBytes) = Compaction.layoutStats(spark, base)
    val (before, after) = Compaction.compact(spark, base, targetBytes = totalBytes / 4)
    assert(before === 64)
    assert(after >= 4 && after <= 6, s"expected ~4-5 output files, got $after")
    val (filesNow, _) = Compaction.layoutStats(spark, base)
    assert(filesNow === after)
    assert(checksum(spark.read.parquet(base)) === expected)
  }

  test("clustered compaction keeps per-file ranges tight") {
    val base = Files.createTempDirectory("graft-compact").toString + "/t"
    val li = Tables.lineitem(spark, dir).select("l_partkey", "l_suppkey", "l_quantity", "l_orderkey")
    li.repartition(64).write.parquet(base)

    val (_, bytes) = Compaction.layoutStats(spark, base)
    val (_, after) = Compaction.compact(spark, base, targetBytes = bytes / 8,
      cluster = Some(col("l_partkey")))
    assert(after >= 8 && after <= 10)

    // range-clustered output: per-file partkey spans must partition the
    // domain (sum of spans ~ domain width), unlike round-robin where every
    // file spans ~the whole domain
    val stats = spark.read.parquet(base)
      .groupBy(input_file_name()).agg(min("l_partkey").as("lo"), max("l_partkey").as("hi"))
      .collect()
    val spans = stats.map(r => r.getLong(2) - r.getLong(1) + 1)
    val domain = 2000.0
    assert(spans.sum <= domain * 1.2,
      s"clustered files overlap too much: spans=${spans.mkString(",")}")
  }
}
