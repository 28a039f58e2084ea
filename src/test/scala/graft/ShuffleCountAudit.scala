package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}

/** Ad-hoc audit: print executed-plan shuffle/broadcast exchange counts
  * for named queries at sf0.001 — the numbers ExchangeBudgetSpec pins.
  * `Test/runMain graft.ShuffleCountAudit q01_x q02_y ...` */
object ShuffleCountAudit extends AdaptiveSparkPlanHelper {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val dir = "/root/testdata/sf0.001"
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect()
      val plan = df.queryExecution.executedPlan
      val shuffles = collect(plan) { case e: ShuffleExchangeLike => e }.size
      val broadcasts = collect(plan) { case e: BroadcastExchangeLike => e }.size
      println(s"AUDIT $name shuffles=$shuffles broadcasts=$broadcasts")
    }
    spark.stop()
  }
}
