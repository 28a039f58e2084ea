package graft.functions

import graft.plans.{CosineSimilarity, DotProduct, HyperplaneBucket, IntDotProduct, VectorNorm}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Vector math over `array<float>` / `array<double>` embedding columns.
  *
  * The public entry points build native Catalyst expressions
  * ([[graft.plans.CosineSimilarity]] et al., each with `doGenCode`) so the
  * similarity-search scans run the arithmetic as ONE static call per row
  * inside whole-stage codegen. The previous higher-order-function forms
  * (`aggregate`/`zip_with`) are kept below as `private[graft]` *Hof
  * variants: Spark evaluates HOF lambdas interpreted — outside codegen,
  * one closure dispatch per element — and `VectorNativeSpec`
  * property-tests the two forms bit-equal, which is what licenses the
  * swap without re-baselining a single query hash.
  *
  * Elements are widened to double before arithmetic so results are
  * reproducible by a SQL oracle (float32→float64 widening is exact).
  */
object VectorOps {

  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  def norm(a: Column): Column =
    Bridge.column(VectorNorm(Bridge.expression(a)))

  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  /** Exact int64 dot product over `array<bigint>` quantization codes —
    * the scalar-quantized ANN hot path (no fp accumulation at all, so
    * oracles compare bit-exact without rounding). */
  def intDot(a: Column, b: Column): Column =
    Bridge.column(IntDotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Cosine rounded to `p` places — rank/threshold on this so orderings are
    * stable across engines (double low-bit drift never flips a rank). */
  def cosineR(a: Column, b: Column, p: Int = 6): Column = round(cosine(a, b), p)

  /** Random-hyperplane sign-LSH bucket id in [0, 2^planes): bit `p` set iff
    * the projection onto plane `p` is positive. Near-identical vectors land
    * in the same bucket with high probability, so near-dup / ANN joins can
    * shuffle on the bucket instead of going all-pairs. One fused pass over
    * the vector computes all plane projections. */
  def hyperplaneBucket(v: Column, planes: Int, dim: Int = 64): Column =
    Bridge.column(HyperplaneBucket(Bridge.expression(v), planes, dim))

  /** The deterministic 16-dim token-hash "text encoder" stand-in used by
    * s15 chunk search and m10 alignment (dim i = Σ_tokens (md5 nibble i
    * − 7.5); half-integer sums, exact in fp). The naive per-dim form
    * re-hashes every token once per dimension — 16 md5 calls per token;
    * this computes each token's md5 ONCE (bound as the outer transform's
    * lambda variable, so the hash is materialized in the intermediate
    * array) and folds per-dim sums in the same token order, so values
    * are bit-identical to the per-dim form and to the SQL oracle. */
  def tokenHashEmbedding(toks: Column): Column =
    aggregate(
      transform(toks, tok => md5(tok)),
      array_repeat(lit(0.0), 16),
      (acc, h) => zip_with(acc, sequence(lit(1), lit(16)),
        (a, i) => a + conv(h.substr(i.cast("int"), lit(1)), 16, 10).cast("double") - 7.5))

  /** ±1 coefficients of pseudo-random hyperplane `p` for dims 0..dim-1:
    * +1 iff the first hex digit of `md5("p:d")` is >= '8' (the hash's top
    * bit). Computed driver-side once — deterministic, no RNG state — and
    * reproducible by a SQL oracle evaluating the same md5 expression. */
  def hyperplane(p: Int, dim: Int): Seq[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until dim).map { d =>
      val top = md.digest(s"$p:$d".getBytes("UTF-8"))(0) & 0xff
      md.reset()
      if ((top >>> 4) >= 8) 1.0 else -1.0
    }
  }

  // ---------------------------------------------------------------------
  // Interpreted HOF reference forms — the semantics spec the native
  // expressions are property-tested against (VectorNativeSpec). Not used
  // on any query path.
  // ---------------------------------------------------------------------

  private[graft] def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  private[graft] def normHof(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))

  private[graft] def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (normHof(a) * normHof(b))

  /** Signed projection of `v` (length `dim`) onto hyperplane `p`. */
  private[graft] def hyperplaneDotHof(v: Column, p: Int, dim: Int): Column =
    aggregate(
      zip_with(v, typedLit(hyperplane(p, dim)), (x, h) => x.cast("double") * h),
      lit(0.0), (acc, x) => acc + x)

  private[graft] def hyperplaneBucketHof(v: Column, planes: Int, dim: Int = 64): Column =
    (0 until planes)
      .map(p => when(hyperplaneDotHof(v, p, dim) > 0, lit(1L << p)).otherwise(lit(0L)))
      .reduce(_ + _)
}
