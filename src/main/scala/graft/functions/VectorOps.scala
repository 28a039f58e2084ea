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
}
