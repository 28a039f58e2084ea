package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global row numbering — the two-phase zipWithIndex pattern.
  *
  * `row_number() OVER (ORDER BY …)` with no PARTITION BY is a
  * single-partition window: every row funnels through one task (Spark
  * warns at runtime), which is the classic scale cliff for "rank the
  * whole table" steps. This computes the identical 1-based rank
  * distributed: range-repartition on the total order (materialized once
  * so partition ids are stable across jobs), collect only the P
  * per-partition COUNTS, broadcast their running offsets back as a dense
  * array literal indexed by pid, and each row's global rank is
  * offset(pid) + its rank within a per-partition window. Two jobs, one
  * range exchange, nothing corpus-sized on the driver.
  */
object Ranks {

  /** Running-offset probe: `element_at` on a MAP literal is a linear
    * scan of the entries per row — O(P) work per row, which grows with
    * the cluster's partition count. Range partitioning yields dense pids
    * 0..P-1, so the offsets pack into a plain array literal and the
    * probe is an O(1) codegen'd index (`element_at` on ARRAY is random
    * access, 1-based). Empty partitions have no rows to probe; their
    * slots carry the running value so the array is monotone regardless. */
  private def offsetProbe(offsets: Seq[(Int, Long)]): Column = {
    val dense = Array.fill(offsets.map(_._1).max + 1)(0L)
    offsets.foreach { case (p, o) => dense(p) = o }
    for (i <- 1 until dense.length) if (dense(i) == 0L) dense(i) = dense(i - 1)
    element_at(lit(dense), col("__pid") + 1)
  }

  /** `df` plus a LongType `rankCol` holding the 1-based global rank in
    * the total order of `sortExprs` (which must be a total order — add
    * a unique tiebreak column), and the total row count. The returned
    * frame is localCheckpointed (the range layout is materialized; the
    * caller's downstream plan starts from it). */
  def globalRowNumber(df: DataFrame, rankCol: String, sortExprs: Column*): (DataFrame, Long) = {
    val parted = df
      .repartitionByRange(sortExprs: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val counts = parted.groupBy("__pid").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val n = counts.map(_._2).sum
    val offsets = counts.scanLeft(0 -> 0L) { case ((_, acc), (p, c)) => p -> (acc + c) }
      .init.map(_._2).zip(counts.map(_._1)).map { case (off, p) => p -> off }
    val ranked =
      if (offsets.isEmpty) parted.withColumn(rankCol, lit(0L))
      else {
        parted.withColumn(rankCol,
          (offsetProbe(offsets) + row_number().over(
            Window.partitionBy("__pid").orderBy(sortExprs: _*))).cast("long"))
      }
    (ranked.drop("__pid"), n)
  }

  /** `df` plus a LongType `sumCol` holding the EXCLUSIVE running sum of
    * `valueCol` (integer-typed — the sum is exact, so it is partition-
    * count invariant by arithmetic) in the total order of `sortExprs`:
    * the same two-phase shape as [[globalRowNumber]] — range-repartition
    * on the order, collect only the P per-partition SUBTOTALS, broadcast
    * their running offsets, and finish with a per-partition window. Row
    * 1's value is 0; nothing corpus-sized touches the driver. */
  def globalRunningSum(
      df: DataFrame, sumCol: String, valueCol: Column, sortExprs: Column*): DataFrame = {
    val parted = df
      .repartitionByRange(sortExprs: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", valueCol.cast("long"))
      .localCheckpoint(true)
    // coalesce: a partition whose values are all NULL yields a null sum
    // and a bare getLong would NPE with no hint at the cause.
    val subtotals = parted.groupBy("__pid")
      .agg(coalesce(sum(col("__v")), lit(0L)).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    if (subtotals.isEmpty) return df.withColumn(sumCol, lit(0L))
    val offsets = subtotals.scanLeft(0 -> 0L) { case ((_, acc), (p, s)) => p -> (acc + s) }
      .init.map(_._2).zip(subtotals.map(_._1)).map { case (off, p) => p -> off }
    val w = Window.partitionBy("__pid").orderBy(sortExprs: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    parted.withColumn(sumCol,
        (offsetProbe(offsets) + coalesce(sum(col("__v")).over(w), lit(0L))).cast("long"))
      .drop("__pid", "__v")
  }
}
