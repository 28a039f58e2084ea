package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared budget-packing kernel for t12 (token budgets) and m08 (media
  * byte budgets): assign each item to the pack where its START offset
  * falls (running sum minus own size — streaming-writer semantics),
  * within a shard so packing parallelizes; a global running sum is a
  * one-partition serial window. One logic, one place: the pack-boundary
  * rule and the shard scheme must never diverge between the token and
  * the byte form. */
object Packing {

  /** Input must carry `doc_id`, `shard`, and `sizeCol`. Emits one row
    * per (shard, pack) with item count and size total under the given
    * aliases. Division by the double budget is exact below 2^53. */
  def packByBudget(
      df: DataFrame, sizeCol: String, budget: Double,
      countAlias: String, sumAlias: String): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("pack",
        floor((sum(sizeCol).over(w) - col(sizeCol)) / lit(budget)).cast("long"))
      .groupBy("shard", "pack")
      .agg(count(lit(1)).as(countAlias), sum(sizeCol).as(sumAlias))
  }
}
