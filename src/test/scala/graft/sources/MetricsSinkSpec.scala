package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MetricsSinkSpec extends SparkSpec {

  test("committed write publishes exact row/task counts and positive bytes") {
    val runId = "sink-commit-test"
    SinkMetrics.clear(runId)
    spark.range(0, 10000).repartition(4)
      .select(col("id"), (col("id") * 2).as("v"), concat(lit("row-"), col("id")).as("s"))
      .write.format("graft-metrics").option("runId", runId).mode("append").save()
    val stats = SinkMetrics.get(runId).get
    assert(stats.rows === 10000L)
    assert(stats.tasks === 4)
    assert(stats.bytes > 10000L * 16) // 3 fields incl. a string: well over 16B/row
  }

  test("failed job aborts: nothing published") {
    val runId = "sink-abort-test"
    SinkMetrics.clear(runId)
    // deterministic task failure mid-write: poison row 57 raises
    val poisoned = spark.range(0, 100).repartition(2)
      .select(when(col("id") === 57L, raise_error(lit("boom")))
        .otherwise(concat(lit("ok-"), col("id"))).as("v"))
    val failed = intercept[Exception] {
      poisoned.write.format("graft-metrics").option("runId", runId).mode("append").save()
    }
    assert(failed != null)
    assert(SinkMetrics.get(runId).isEmpty)
  }

  test("abort never clobbers a previous successful run's audit under the same runId") {
    val runId = "sink-reuse-test"
    SinkMetrics.clear(runId)
    spark.range(0, 500).repartition(2).toDF("id")
      .write.format("graft-metrics").option("runId", runId).mode("append").save()
    val committed = SinkMetrics.get(runId).get
    assert(committed.rows === 500L)

    val poisoned = spark.range(0, 100)
      .select(when(col("id") === 3L, raise_error(lit("boom")))
        .otherwise(lit("ok")).as("v"))
    intercept[Exception] {
      poisoned.write.format("graft-metrics").option("runId", runId).mode("append").save()
    }
    // the failed run rolled back ITS effects only
    assert(SinkMetrics.get(runId) === Some(committed))
  }
}
