package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Static search target for generated code (object without companion
  * class → static forwarders, same pattern as [[DurationParse]]). */
object QuantileBucketSearch {
  /** Bucket of `v` among sorted `edges`: the insertion point, i.e. a
    * value below every edge is 0 and above all k-1 edges is k-1. For a
    * value EQUAL to some edge, `binarySearch` returns an arbitrary-but-
    * deterministic index among duplicates — ties land in a fixed bucket
    * for a given edges array, which is all clustering needs. */
  def bucket(edges: Array[Double], v: Double): Int = {
    val i = java.util.Arrays.binarySearch(edges, v)
    if (i >= 0) i + 1 else -(i + 1)
  }
}

/** Rank-space binning: maps a double to its quantile-bin index by binary
  * search over a small sorted edge array (computed once, driver-side,
  * via `approxQuantile` — never a per-row join or a 2^k-branch CASE).
  * The edges ride into whole-stage codegen as a referenced `double[]`;
  * per row the cost is one O(log k) static call inside the fused loop.
  *
  * This is the skew answer for [[graft.operators.ZOrder]]: value-space
  * scaling spends interleave bits uniformly over the DOMAIN, so a dense
  * region collapses into few bins and boxes inside it cannot prune on
  * that dimension; quantile bins spend bits uniformly over the MASS.
  * Duplicate edges (a single value holding >1/k of the mass) degrade
  * gracefully — that value's rows share one bucket. */
case class QuantileBucket(child: Expression, edges: IndexedSeq[Double])
    extends UnaryExpression {

  require(edges.nonEmpty, "edges must be non-empty")
  require(edges == edges.sorted, "edges must be sorted ascending")

  @transient private lazy val edgeArr: Array[Double] = edges.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quantile_bucket requires DOUBLE input, got ${child.dataType.sql}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "quantile_bucket"

  override protected def nullSafeEval(input: Any): Any =
    QuantileBucketSearch.bucket(edgeArr, input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("edges", edgeArr, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.QuantileBucketSearch.bucket($ref, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): QuantileBucket =
    copy(child = newChild)
}

object QuantileBucket {
  /** Column-API entry point; casts any numeric input to double. */
  def apply(c: Column, edges: Seq[Double]): Column =
    Bridge.column(QuantileBucket(Bridge.expression(c.cast("double")), edges.toIndexedSeq))
}
