package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

/** Join-strategy hints — the scale levers an operator reaches for when
  * AQE's size estimates are wrong (fresh tables without stats, UDF-opaque
  * filters): each hint must actually flip the physical operator, and the
  * results must not move. BROADCAST avoids the shuffle entirely;
  * SHUFFLE_HASH avoids the sort when one side is modest; MERGE is the
  * safe default for big⋈big; SHUFFLE_REPLICATE_NL is the cartesian
  * escape hatch. */
class JoinHintsSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private val dir = "/root/testdata/sf0.001"

  private def joined(hint: String): DataFrame = {
    val o = Tables.orders(spark, dir).hint(hint)
    Tables.lineitem(spark, dir)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
  }

  private def physicalJoins(df: DataFrame): Seq[String] = {
    df.collect() // settle AQE final plan
    collect(df.queryExecution.executedPlan) {
      case p if p.nodeName.contains("Join") || p.nodeName.contains("CartesianProduct") =>
        p.nodeName
    }
  }

  test("each strategy hint flips the physical join operator; results identical") {
    val expect = Seq(
      "broadcast" -> "BroadcastHashJoin",
      "shuffle_hash" -> "ShuffledHashJoin",
      "merge" -> "SortMergeJoin")
    val baseline = joined("merge").collect().map(_.toSeq).toSet
    expect.foreach { case (hint, op) =>
      val df = joined(hint)
      val joins = physicalJoins(df)
      assert(joins.exists(_.contains(op)), s"hint $hint planned $joins, wanted $op")
      assert(df.collect().map(_.toSeq).toSet === baseline, s"hint $hint changed results")
    }
  }

  test("shuffle_replicate_nl survives as the cartesian strategy") {
    val a = Tables.region(spark, dir).hint("shuffle_replicate_nl")
    val df = Tables.nation(spark, dir).crossJoin(a)
    val joins = physicalJoins(df)
    assert(joins.exists(_.contains("CartesianProduct")) ||
      joins.exists(_.contains("BroadcastNestedLoopJoin")), s"got $joins")
    assert(df.count() === 25L * 5L)
  }
}
