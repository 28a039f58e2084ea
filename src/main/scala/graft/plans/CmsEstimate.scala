package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, PlanExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Probe side of the count-min-sketch frequency table.
  *
  * Spark ships the BUILD side (`count_min_sketch(col, eps, conf, seed)`
  * aggregates to the sketch's binary image, and the images are
  * mergeable across partitions/days like q50's HLL and q66's top-k
  * sketches) but no function to ASK a stored sketch anything — the
  * binary is a dead end in SQL. `cms_estimate(sketch, item)` completes
  * the pattern: estimated frequency of `item`, upper-biased by the CMS
  * guarantee (estimate ≥ true count; ≤ true + ε·N at the sketch's
  * confidence).
  *
  * Contract mirrored from Spark's own `BloomFilterMightContain`: the
  * sketch argument must be a LITERAL or SCALAR SUBQUERY (one sketch,
  * many probes), so the binary deserializes ONCE per task into a
  * codegen reference object — never per row. A per-row sketch column
  * (e.g. from a join) is rejected at analysis: deserializing KBs per
  * row is the anti-pattern this contract exists to prevent; join the
  * probe items against an exploded estimate table instead.
  *
  * Item hashing matches the builder's encoding exactly
  * (`CountMinSketchAgg`): strings probe as their UTF-8 bytes, integral
  * types as longs — a probe that hashed differently would silently
  * read the wrong counters.
  */
case class CmsEstimate(sketchExpr: Expression, itemExpr: Expression)
    extends BinaryExpression {

  override def left: Expression = sketchExpr
  override def right: Expression = itemExpr

  override def checkInputDataTypes(): TypeCheckResult = {
    if (sketchExpr.dataType != BinaryType) {
      TypeCheckResult.TypeCheckFailure(
        s"cms_estimate requires a BINARY sketch, got ${sketchExpr.dataType.sql}")
    } else if (!itemExpr.dataType.isInstanceOf[StringType] &&
        itemExpr.dataType != LongType && itemExpr.dataType != IntegerType) {
      TypeCheckResult.TypeCheckFailure(
        s"cms_estimate supports STRING/INT/BIGINT items, got ${itemExpr.dataType.sql}")
    } else {
      sketchExpr match {
        case e if e.foldable => TypeCheckResult.TypeCheckSuccess
        case _: PlanExpression[_] => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          "the sketch argument of cms_estimate must be a literal or scalar subquery " +
            "(one sketch probed by many rows); for a per-row sketch column, " +
            "explode the estimates and join instead")
      }
    }
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "cms_estimate"

  /** Deserialized once per task (the sketch side is a constant by
    * contract); null sketch → null result. */
  @transient private lazy val cms: CountMinSketch = {
    val bytes = sketchExpr.eval(null).asInstanceOf[Array[Byte]]
    if (bytes == null) null else CountMinSketch.readFrom(bytes)
  }

  private def probe(sketch: CountMinSketch, item: Any): Long = item match {
    case s: UTF8String => sketch.estimateCount(s.getBytes)
    case i: Int => sketch.estimateCount(i.toLong)
    case other => sketch.estimateCount(other)
  }

  override def eval(input: InternalRow): Any = {
    if (cms == null) return null
    val item = itemExpr.eval(input)
    if (item == null) null else probe(cms, item)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (cms == null) {
      val code = code"""
        |boolean ${ev.isNull} = true;
        |long ${ev.value} = 0L;""".stripMargin
      return ev.copy(code = code)
    }
    val cmsRef = ctx.addReferenceObj("cms", cms, classOf[CountMinSketch].getName)
    val itemGen = itemExpr.genCode(ctx)
    val call = itemExpr.dataType match {
      case _: StringType => s"$cmsRef.estimateCount(${itemGen.value}.getBytes())"
      case IntegerType => s"$cmsRef.estimateCount((long) ${itemGen.value})"
      case _ => s"$cmsRef.estimateCount(${itemGen.value})"
    }
    val code = code"""
      |${itemGen.code}
      |boolean ${ev.isNull} = ${itemGen.isNull};
      |long ${ev.value} = 0L;
      |if (!${ev.isNull}) {
      |  ${ev.value} = $call;
      |}""".stripMargin
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(sketchExpr = newLeft, itemExpr = newRight)
}

object CmsEstimate {
  /** Column-API entry point: `CmsEstimate(sketchScalar, itemCol)` —
    * build the sketch side with `df.agg(count_min_sketch(...)).scalar()`. */
  def apply(sketch: Column, item: Column): Column =
    Bridge.column(CmsEstimate(Bridge.expression(sketch), Bridge.expression(item)))
}
