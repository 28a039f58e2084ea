package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{ArrayAggregate, Expression, HigherOrderFunction}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical._

/** The t39 bug-class lint: a NESTED interpreted fold (an
  * `ArrayAggregate` whose lambdas contain another higher-order
  * function — the Viterbi-DP / dot-product shape) evaluated at a
  * cardinality nothing in the plan bounds. HOF lambdas never
  * whole-stage-codegen, so such an expression runs interpreted once
  * per input row; over corpus-cardinality input that multiplied t39 to
  * 64 s until the fold was moved behind a distinct-word aggregate
  * (`Unigram.scala`). The lint walks a query's optimized logical plan
  * and flags every node that evaluates a nested fold whose child
  * subtree reaches a raw source with no cardinality bound (no
  * Aggregate / Deduplicate / Limit / local relation on every path).
  *
  * Flagged-by-design queries (brute-force scoring baselines whose
  * per-row arrays are dim-sized) are allowlisted WITH justification in
  * `HofFoldLintSpec`; anything new that flags fails the suite until
  * either restructured (the t39 fix) or consciously allowlisted.
  */
object HofFoldLint {

  /** Does `e` contain an ArrayAggregate with another HOF inside any of
    * its children (argument, zero, or lambda bodies)? */
  private def hasNestedFold(e: Expression): Boolean =
    e.exists {
      case a: ArrayAggregate =>
        a.children.exists(_.exists(_.isInstanceOf[HigherOrderFunction]))
      case _ => false
    }

  /** Is every path from `p` down to its leaves cardinality-bounded
    * before reaching a raw source? Conservative: only explicit bounds
    * count; an unrecognized leaf (file scan, Range, DSv2 relation) is
    * unbounded. */
  private def bounded(p: LogicalPlan): Boolean = p match {
    case _: Aggregate | _: Deduplicate | _: GlobalLimit | _: LocalLimit => true
    case _: LocalRelation | _: OneRowRelation => true
    case leaf if leaf.children.isEmpty => false
    case other => other.children.forall(bounded)
  }

  /** The node's expressions that evaluate a nested fold PER INPUT ROW.
    * In an Aggregate, a fold inside an aggregate function's input or a
    * grouping expression runs per row (unbounded exposure), while one
    * applied on top of aggregation results runs per GROUP — already
    * bounded by the aggregate itself (exactly the t39 fix shape, which
    * Catalyst collapses into the Aggregate's result expressions). */
  private def perRowFolds(n: LogicalPlan): Seq[Expression] = n match {
    case a: Aggregate =>
      a.groupingExpressions.filter(hasNestedFold) ++
        a.aggregateExpressions.filter(e =>
          e.collect { case ae: AggregateExpression => ae }.exists(hasNestedFold))
    case other => other.expressions.filter(hasNestedFold)
  }

  /** All lint hits in `df`'s optimized plan, rendered as
    * "NodeType: <expr snippet>" strings (empty = clean). */
  def flags(df: DataFrame): Seq[String] = {
    val plan = df.queryExecution.optimizedPlan
    plan.collect {
      case n if perRowFolds(n).nonEmpty && !n.children.forall(bounded) =>
        s"${n.nodeName}: ${perRowFolds(n).map(_.sql.take(80)).mkString(" | ")}"
    }
  }

  /** Calibration main: run the lint over the whole registered board.
    * `Test/runMain graft.HofFoldLint [sfdir]` */
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val fs = try flags(fn(spark, dir)) catch {
        case e: Exception => Seq(s"BUILD FAILED: ${e.getMessage}")
      }
      if (fs.nonEmpty) println(s"FLAG $name\n  ${fs.mkString("\n  ")}")
    }
    println("lint sweep complete")
    spark.stop()
  }
}
