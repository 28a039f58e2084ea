package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cost-based optimization inputs: ANALYZE TABLE statistics land in the
  * catalog, surface as optimizer row counts, and join planning uses
  * them. At 100 TB, stats maintenance is what keeps AQE's initial plans
  * sane — a table without stats is sized by raw file bytes only. */
class CboStatsSpec extends SparkSpec {

  test("ANALYZE TABLE statistics surface as optimizer row counts and size the join") {
    // rowCount propagation through the optimizer is gated on CBO
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try runScenario()
    finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }

  private def runScenario(): Unit = {
    spark.sql("CREATE DATABASE IF NOT EXISTS cbo")
    spark.range(0, 200000)
      .select(col("id"), (col("id") % 1000).as("k"), md5(col("id").cast("string")).as("pad"))
      .write.mode("overwrite").saveAsTable("cbo.big")
    spark.range(0, 500).select(col("id").as("k"), (col("id") * 7).as("w"))
      .write.mode("overwrite").saveAsTable("cbo.small")
    spark.sql("ANALYZE TABLE cbo.big COMPUTE STATISTICS")
    spark.sql("ANALYZE TABLE cbo.small COMPUTE STATISTICS")

    // exact row counts are catalog stats, not file-size guesses
    val smallStats = spark.table("cbo.small").queryExecution.optimizedPlan.stats
    val bigStats = spark.table("cbo.big").queryExecution.optimizedPlan.stats
    assert(smallStats.rowCount.contains(BigInt(500)))
    assert(bigStats.rowCount.contains(BigInt(200000)))

    // with both sides sized, the planner broadcasts the SMALL side
    // unhinted; the big side never shuffles for this join
    val joined = spark.table("cbo.big").join(spark.table("cbo.small"), "k")
      .agg(count(lit(1)).as("n"), sum("w").as("sw"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected an unhinted broadcast join:\n$plan")
    assert(joined.head().getLong(0) === 100000L) // 500 keys ⨯ 200 rows each
  }
}
