package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, as codegen-friendly
  * higher-order functions (`zip_with` + `aggregate`) — no UDFs, so the
  * similarity-search scans stay inside whole-stage codegen.
  *
  * Elements are widened to double before arithmetic so results are
  * reproducible by a SQL oracle (float32→float64 widening is exact).
  */
object VectorOps {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine rounded to `p` places — rank/threshold on this so orderings are
    * stable across engines (double low-bit drift never flips a rank). */
  def cosineR(a: Column, b: Column, p: Int = 6): Column = round(cosine(a, b), p)

  /** ±1 coefficients of pseudo-random hyperplane `p` for dims 0..dim-1:
    * +1 iff the first hex digit of `md5("p:d")` is >= '8' (the hash's top
    * bit). Computed driver-side once — deterministic, no RNG state — and
    * reproducible by a SQL oracle evaluating the same md5 expression.
    * Shipping the plane as an array literal keeps the per-row work to a
    * zip_with/aggregate fold (no per-element hashing on the data path). */
  def hyperplane(p: Int, dim: Int): Seq[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until dim).map { d =>
      val top = md.digest(s"$p:$d".getBytes("UTF-8"))(0) & 0xff
      md.reset()
      if ((top >>> 4) >= 8) 1.0 else -1.0
    }
  }

  /** Signed projection of `v` (length `dim`) onto hyperplane `p`. */
  def hyperplaneDot(v: Column, p: Int, dim: Int): Column =
    aggregate(
      zip_with(v, typedLit(hyperplane(p, dim)), (x, h) => x.cast("double") * h),
      lit(0.0), (acc, x) => acc + x)

  /** Random-hyperplane sign-LSH bucket id in [0, 2^planes): bit `p` set iff
    * the projection onto plane `p` is positive. Near-identical vectors land
    * in the same bucket with high probability, so near-dup / ANN joins can
    * shuffle on the bucket instead of going all-pairs. */
  def hyperplaneBucket(v: Column, planes: Int, dim: Int = 64): Column =
    (0 until planes)
      .map(p => when(hyperplaneDot(v, p, dim) > 0, lit(1L << p)).otherwise(lit(0L)))
      .reduce(_ + _)
}
