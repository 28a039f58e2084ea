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

    // the discriminating assert: exact row counts come from CATALOG
    // stats through CBO — they are absent both without ANALYZE and (see
    // the negative control below) with CBO disabled
    val smallStats = spark.table("cbo.small").queryExecution.optimizedPlan.stats
    val bigStats = spark.table("cbo.big").queryExecution.optimizedPlan.stats
    assert(smallStats.rowCount.contains(BigInt(500)))
    assert(bigStats.rowCount.contains(BigInt(200000)))

    // sanity (not CBO-specific — file-size estimation alone would also
    // broadcast a table this small): the small side broadcasts unhinted
    val joined = spark.table("cbo.big").join(spark.table("cbo.small"), "k")
      .agg(count(lit(1)).as("n"), sum("w").as("sw"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected an unhinted broadcast join:\n$plan")
    assert(joined.head().getLong(0) === 100000L) // 500 keys ⨯ 200 rows each
  }

  test("negative control: without CBO the same catalog stats expose no row counts") {
    // runs after the ANALYZE above (shared session, tables persist):
    // same tables, same stats in the catalog, CBO off → rowCount absent,
    // proving the positive test exercises the CBO flow and not some
    // always-on fallback
    assert(spark.conf.get("spark.sql.cbo.enabled") === "false")
    val stats = spark.table("cbo.small").queryExecution.optimizedPlan.stats
    assert(stats.rowCount.isEmpty)
  }
}
