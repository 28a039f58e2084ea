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

  /** Signed projection of `v` onto pseudo-random hyperplane `p` whose ±1
    * coefficient for 0-based dim `d` is the sign bit of `md5("p:d")` —
    * deterministic and reproducible by a SQL oracle (no RNG state). */
  def hyperplaneDot(v: Column, p: Int): Column =
    aggregate(
      transform(sequence(lit(1), size(v)), dd =>
        element_at(v, dd).cast("double") *
          when(substring(md5(concat(lit(s"$p:"), (dd - lit(1)).cast("string"))), 1, 1) >= "8",
            lit(1.0)).otherwise(lit(-1.0))),
      lit(0.0), (acc, x) => acc + x)

  /** Random-hyperplane sign-LSH bucket id in [0, 2^planes): bit `p` set iff
    * the projection onto plane `p` is positive. Near-identical vectors land
    * in the same bucket with high probability, so near-dup / ANN joins can
    * shuffle on the bucket instead of going all-pairs. */
  def hyperplaneBucket(v: Column, planes: Int): Column =
    (0 until planes)
      .map(p => when(hyperplaneDot(v, p) > 0, lit(1L << p)).otherwise(lit(0L)))
      .reduce(_ + _)
}
