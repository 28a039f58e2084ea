package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.unsafe.types.UTF8String

/** Shared parser, in an object WITHOUT a companion class so the Scala
  * compiler emits static forwarders that generated Java can call. */
object DurationParse {
  private val P = java.util.regex.Pattern.compile("^PT(?:(\\d+)H)?(?:(\\d+)M)?$")

  /** ISO-8601 `PT#H#M` → total minutes; null on no-match (reference UDF
    * semantics, `transformToSilver.py:19-28`: missing group → 0). */
  def parse(u: UTF8String): Integer = {
    if (u == null) return null
    val m = P.matcher(u.toString)
    if (!m.matches()) return null
    // Group semantics mirror the composed Column form exactly: a missing
    // group is 0, and a digit run beyond Int range behaves like the
    // composed coalesce(cast("int") → null under ANSI-off, 0) — i.e. 0.
    def g(s: String): Int =
      if (s == null) 0 else try s.toInt catch { case _: NumberFormatException => 0 }
    Integer.valueOf(g(m.group(1)) * 60 + g(m.group(2)))
  }
}

/** Native Catalyst form of [[graft.functions.Exprs.durationToMinutes]]:
  * a `UnaryExpression` with `doGenCode`, so the parse is one static call
  * inside the whole-stage-codegen'd loop — no per-row regex re-plumbing
  * through three composed `regexp_extract`s, and no UDF boundary.
  * (SURVEY §7.3: the elective custom-Expression exercise; equivalence
  * with the composed form is property-tested.) */
case class DurationToMinutes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"duration_to_minutes requires STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "duration_to_minutes"

  override protected def nullSafeEval(input: Any): Any =
    DurationParse.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |java.lang.Integer ${ev.value}_r = graft.plans.DurationParse.parse($c);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.intValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DurationToMinutes =
    copy(child = newChild)
}

object DurationToMinutes {
  /** Column-API entry point. */
  def apply(c: Column): Column = Bridge.column(DurationToMinutes(Bridge.expression(c)))
}

/** Session extensions installing graft's native expressions as SQL
  * functions (`SELECT duration_to_minutes(col)`). Wire with
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // Whole-operator extension: the native as-of join's planner strategy
    // (logical node [[AsOfJoinPlan]] → physical [[AsOfJoinExec]]).
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    // readStream.table("graft.db.t") → the table's change feed, bound
    // onto the graft-cdf V1 source at resolution (see
    // GraftStreamTableRead — exactly-once/admission control inherited)
    ext.injectResolutionRule(spark =>
      graft.sources.GraftStreamTableRead(spark))
    // Declarative range-join banding, gated on spark.graft.rangeJoin.binSize
    ext.injectOptimizerRule(_ => BandedRangeJoin())
    // NOTE: GraftScanStats (manifest statistics for V1-bridged catalog
    // scans) cannot install here — every extensions hook runs before
    // V2ScanRelationPushDown creates the wrapper it rewrites ("Pre CBO
    // Rules" precedes "Early Filter and Projection Push-Down"). It
    // installs via experimental.extraOptimizations ("User Provided
    // Optimizers", the one post-pushdown batch) in Sessions.local/tune.
    ext.injectFunction((
      FunctionIdentifier("duration_to_minutes"),
      new ExpressionInfo(classOf[DurationToMinutes].getName, "duration_to_minutes"),
      (children: Seq[Expression]) => DurationToMinutes(children.head)))
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (children: Seq[Expression]) => CosineSimilarity(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("int_dot_product"),
      new ExpressionInfo(classOf[IntDotProduct].getName, "int_dot_product"),
      (children: Seq[Expression]) => IntDotProduct(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("vector_norm"),
      new ExpressionInfo(classOf[VectorNorm].getName, "vector_norm"),
      (children: Seq[Expression]) => VectorNorm(children.head)))
    ext.injectFunction((
      FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "cms_estimate"),
      (children: Seq[Expression]) => CmsEstimate(children.head, children(1))))
    // planes/dim must be integer literals — the plane matrix is built at
    // plan time, not per row
    ext.injectFunction((
      FunctionIdentifier("hyperplane_bucket"),
      new ExpressionInfo(classOf[HyperplaneBucket].getName, "hyperplane_bucket"),
      (children: Seq[Expression]) => {
        def intLit(e: Expression, what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"hyperplane_bucket: $what must be an INT literal, got $other")
        }
        HyperplaneBucket(children.head,
          intLit(children(1), "planes"), intLit(children(2), "dim"))
      }))
  }
}
