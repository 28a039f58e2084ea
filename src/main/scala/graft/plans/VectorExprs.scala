package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Fused vector-math kernels, in an object WITHOUT a companion class so the
  * Scala compiler emits static forwarders the generated Java can call.
  *
  * Each kernel reproduces — bit for bit — the higher-order-function form it
  * replaces (`aggregate(zip_with(...))` in [[graft.functions.VectorOps]]):
  * per-element float→double widening, in-order left-fold accumulation from
  * 0.0, `null` on array-length mismatch or any null element (zip_with pads
  * the shorter array with nulls, and `acc + null` poisons the fold), and
  * `null` on a zero denominator (non-ANSI `Divide` semantics). The HOF
  * forms evaluate interpreted — outside whole-stage codegen, one closure
  * call per element; these run as one static call per ROW inside the
  * codegen'd loop, fusing dot + both norms into a single array pass.
  */
object VectorMath {

  /** Σ a_i·b_i, in index order; null on length mismatch / null element. */
  def dot(a: ArrayData, aF: Boolean, b: ArrayData, bF: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += elem(a, aF, i) * elem(b, bF, i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** sqrt(Σ a_i²), in index order; null on any null element. */
  def norm(a: ArrayData, aF: Boolean): java.lang.Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = elem(a, aF, i)
      acc += x * x
      i += 1
    }
    java.lang.Double.valueOf(math.sqrt(acc))
  }

  /** dot(a,b) / (norm(a)·norm(b)) in ONE pass over both arrays. The three
    * accumulators fold independently in index order, so each is bit-equal
    * to its standalone HOF fold; the quotient keeps sqrt(sa)·sqrt(sb)
    * (NOT sqrt(sa·sb)) and yields null when the denominator is zero,
    * exactly as `Divide` does with ANSI off. */
  def cosine(a: ArrayData, aF: Boolean, b: ArrayData, bF: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dd = 0.0
    var sa = 0.0
    var sb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = elem(a, aF, i)
      val y = elem(b, bF, i)
      dd += x * y
      sa += x * x
      sb += y * y
      i += 1
    }
    val denom = math.sqrt(sa) * math.sqrt(sb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dd / denom)
  }

  /** Sign-LSH bucket: bit p set iff the in-order projection onto plane p is
    * > 0. Degenerate inputs (null vector, length ≠ dim, null element) give
    * 0L — matching the HOF form, where the null projection fails the
    * `when(_ > 0, …)` predicate and every plane takes the otherwise(0)
    * branch. A NaN projection likewise sets no bit (NaN > 0 is false). */
  def bucket(v: ArrayData, vF: Boolean, m: Array[Array[Double]]): Long = {
    if (v == null) return 0L
    val planes = m.length
    val dim = if (planes == 0) 0 else m(0).length
    if (v.numElements() != dim) return 0L
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return 0L
      i += 1
    }
    var res = 0L
    var p = 0
    while (p < planes) {
      val h = m(p)
      var s = 0.0
      var d = 0
      while (d < dim) {
        s += elem(v, vF, d) * h(d)
        d += 1
      }
      if (s > 0) res |= 1L << p
      p += 1
    }
    res
  }

  /** Σ a_i·b_i over integer code arrays (scalar-quantized embeddings) —
    * EXACT int64 arithmetic, no fp accumulation at all; null on length
    * mismatch / null element, like [[dot]]. uint8 codes over any real
    * dimensionality cannot overflow (255²·dim ≪ 2⁶³). */
  def intDot(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  @inline private def elem(a: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
}

/** Shared type plumbing for the binary array→double expressions. */
sealed trait VectorBinaryExpr extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def fname: String

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$fname requires ARRAY<FLOAT|DOUBLE> inputs, got ${l.sql} and ${r.sql}")
  }

  protected def leftFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  protected def rightFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** `VectorMath.<kernel>(a, aF, b, bF)` boxed-Double call with null unboxing. */
  protected def kernelGen(ctx: CodegenContext, ev: ExprCode, kernel: String): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r =
         |  graft.plans.VectorMath.$kernel($a, $leftFloat, $b, $rightFloat);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.doubleValue();
         |}
       """.stripMargin
    })
}

/** Native form of [[graft.functions.VectorOps.cosine]]: one fused array pass
  * per row inside whole-stage codegen, replacing three interpreted
  * `aggregate(zip_with(...))` folds. */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpr {
  override protected def fname: String = "cosine_similarity"
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.cosine(a.asInstanceOf[ArrayData], leftFloat, b.asInstanceOf[ArrayData], rightFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    kernelGen(ctx, ev, "cosine")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

/** Native form of [[graft.functions.VectorOps.dot]]. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpr {
  override protected def fname: String = "dot_product"
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.dot(a.asInstanceOf[ArrayData], leftFloat, b.asInstanceOf[ArrayData], rightFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    kernelGen(ctx, ev, "dot")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** Integer dot product over `array<bigint>` quantization codes — the hot
  * path of scalar-quantized ANN search (s09): exact int64 math inside
  * whole-stage codegen, one static call per row. */
case class IntDotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "int_dot_product"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"int_dot_product requires ARRAY<BIGINT> inputs, got ${l.sql} and ${r.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.intDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Long ${ev.value}_r = graft.plans.VectorMath.intDot($a, $b);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntDotProduct =
    copy(left = l, right = r)
}

/** Native form of [[graft.functions.VectorOps.norm]]. */
case class VectorNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vector_norm"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vector_norm requires ARRAY<FLOAT|DOUBLE> input, got ${t.sql}")
  }

  private def childFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any): Any =
    VectorMath.norm(a.asInstanceOf[ArrayData], childFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |java.lang.Double ${ev.value}_r = graft.plans.VectorMath.norm($a, $childFloat);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VectorNorm =
    copy(child = newChild)
}

/** Native form of [[graft.functions.VectorOps.hyperplaneBucket]]: all
  * `planes` sign projections in one pass over the vector (the HOF form
  * folds the array once PER PLANE, interpreted). Never null — degenerate
  * inputs bucket to 0L, see [[VectorMath.bucket]]. The ±1 plane matrix is
  * the same deterministic md5 scheme as
  * [[graft.functions.VectorOps.hyperplane]], embedded as a codegen
  * reference object (computed once per plan, not per row). */
case class HyperplaneBucket(child: Expression, planes: Int, dim: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "hyperplane_bucket"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) if planes >= 1 && planes <= 63 && dim >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bucket requires 1 <= planes <= 63 and dim >= 1, got planes=$planes dim=$dim")
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bucket requires ARRAY<FLOAT|DOUBLE> input, got ${t.sql}")
  }

  private def childFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val matrix: Array[Array[Double]] =
    Array.tabulate(planes)(p => graft.functions.VectorOps.hyperplane(p, dim).toArray)

  // not nullSafeEval: a null vector buckets to 0L, not null
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    VectorMath.bucket(v.asInstanceOf[ArrayData], childFloat, matrix)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("planeMatrix", matrix, "double[][]")
    val c = child.genCode(ctx)
    val code =
      code"""
        |${c.code}
        |long ${ev.value} = graft.plans.VectorMath.bucket(
        |  ${c.isNull} ? null : ${c.value}, $childFloat, $m);
       """.stripMargin
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}
