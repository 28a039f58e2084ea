package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-K rows per key as a reusable operator.
  *
  * A single `row_number` window over a LOW-cardinality key is the classic
  * scale trap: every key becomes one task, and 25 keys over 100 TB means
  * 25 giant single-threaded sorts. This operator runs two phases:
  * phase 1 ranks within (key, salt-bucket) — full parallelism — and keeps
  * each bucket's top-K; phase 2 re-ranks the surviving K×buckets rows per
  * key. Any global top-K row is top-K within its own bucket, so the
  * result is identical to the one-shot window (proved by the equivalence
  * test). `orderCols` must be a total order (add a unique tiebreak) for
  * deterministic output.
  */
object TopK {

  def topKPerKey(
      df: DataFrame,
      partitionCols: Seq[String],
      orderCols: Seq[Column],
      k: Int,
      saltExpr: Column,
      buckets: Int = 64,
      rankCol: String = "rk"): DataFrame = {
    require(k > 0 && buckets > 0)
    val keyCols = partitionCols.map(col)
    val pre = Window.partitionBy(keyCols :+ pmod(saltExpr, lit(buckets)): _*)
      .orderBy(orderCols: _*)
    val fin = Window.partitionBy(keyCols: _*).orderBy(orderCols: _*)
    df.withColumn("__prk", row_number().over(pre))
      .filter(col("__prk") <= k)
      .withColumn(rankCol, row_number().over(fin))
      .filter(col(rankCol) <= k)
      .drop("__prk")
  }
}
