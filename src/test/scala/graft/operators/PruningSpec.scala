package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dynamic partition pruning — the runtime form of partition pruning that
  * matters at warehouse scale: when a partitioned fact joins a filtered
  * dim, Catalyst injects the dim's join keys as a runtime partition
  * filter on the fact SCAN (reusing the broadcast), so the fact reads
  * only the partitions that can match instead of the full table. Static
  * pruning (literal predicates) is already asserted in PipelineSpec; this
  * proves the dynamic path our star-join layout relies on at 100 TB.
  */
class PruningSpec extends SparkSpec {
  import spark.implicits._

  test("dim filter prunes fact partitions at runtime via the broadcast") {
    val dir = Files.createTempDirectory("graft-dpp").toString
    (0 until 10000).map(i => (i.toLong, i % 10, (i % 100) * 1.0))
      .toDF("id", "region_id", "amount")
      .write.partitionBy("region_id").mode("overwrite").parquet(s"$dir/fact")
    (0 until 10).map(i => (i, if (i < 2) "EU" else "US"))
      .toDF("region_id", "zone")
      .write.mode("overwrite").parquet(s"$dir/dim")

    val fact = spark.read.parquet(s"$dir/fact")
    val dim = spark.read.parquet(s"$dir/dim").filter(col("zone") === "EU")
    val q = fact.join(dim, "region_id").agg(sum("amount").as("total"))

    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamic pruning subquery on the fact scan in:\n$plan")

    // correctness: EU = regions 0 and 1 → ids with i % 10 < 2
    val expected = (0 until 10000).filter(i => i % 10 < 2).map(i => (i % 100) * 1.0).sum
    assert(q.head().getDouble(0) === expected)
  }
}
