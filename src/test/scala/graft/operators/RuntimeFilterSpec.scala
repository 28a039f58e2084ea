package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Runtime bloom-filter injection — the shuffle-join row reducer for the
  * case broadcast can't cover: a big⋈big join where one side carries a
  * selective filter. Catalyst builds a bloom filter from the filtered
  * (creation) side and injects `bloom_filter_might_contain` into the
  * other (application) side's scan stage, so most non-matching fact rows
  * die BEFORE the shuffle — at 100 TB that's the difference between
  * shuffling the whole fact table and shuffling the ~matching slice.
  *
  * The feature is size-gated in production (creation side small,
  * application side huge); the thresholds here are pinned so the tiny
  * test fixture qualifies and the PLAN SHAPE is asserted, plus results
  * unchanged vs the un-filtered plan.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim filter injects a bloom filter into the fact side of a shuffle join") {
    val dir = "/root/testdata/sf0.001"
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // fixture-sized gates: creation side is tiny, application side
      // must qualify despite being far under the 10 GB production gate
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // force the shuffle join: broadcast joins don't need runtime filters
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }

    def query() = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir).filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("rev"))

    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val withFilter = query()
      val optimized = withFilter.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") && optimized.contains("bloom_filter_agg"),
        s"expected a runtime bloom filter in the optimized plan:\n$optimized")
      val rows = withFilter.collect()

      // the filter is a pure row reducer: results identical without it
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plain = query()
      assert(!plain.queryExecution.optimizedPlan.toString.contains("might_contain"))
      assert(rows.toSet === plain.collect().toSet)
      assert(rows.nonEmpty)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
