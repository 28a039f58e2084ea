package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Top-principal-component extraction over the embedding corpus by power
  * iteration in the two-pass `v ← Xᵀ(Xv)` form — the shape that scales to
  * embedding widths where a dim×dim covariance matrix is no longer cheap
  * to materialize (at dim 4096 that matrix is 16M doubles per executor;
  * the two-pass form never forms it). The centered corpus `cx = x − μ` is
  * round-invariant, so it is localCheckpointed ONCE before the loop; each
  * round is then ONE Generate-free job: a codegen'd projection computes
  * s_i = cx_i·v (native [[graft.plans.DotProduct]], one static call per
  * row), and a single global aggregate with `dim` sum columns produces
  * y[d] = Σ s_i·cx_i[d] — map-side partial vectors of dim doubles merged
  * once, no row expansion, no 64-group shuffle (the round-8 plan
  * pos-exploded each centered vector 64-wide per round and recomputed the
  * centering twice per row). Only dim doubles ever reach the driver — the
  * same bounded-collect contract as the k-means centroid means
  * (`functions/KMeans.scala`). The iterate is quantized to 6 decimals at
  * every round boundary (the s06/s13 re-sync contract): both engines
  * re-broadcast identical rounded vectors, so corpus-order float drift in
  * the per-dimension sums can never compound across rounds.
  *
  * PCA whitening / leading-direction removal is a standard preprocessing
  * step in embedding pipelines (e.g. common-direction removal before
  * similarity search); the registered query emits the per-vector
  * projection onto the fitted component — the column such a pipeline
  * actually writes.
  */
object Pca {

  private[operators] val Dim = 64

  /** Power iteration converges geometrically at λ₂/λ₁ per round — 0.932
    * on the synthetic fixture (a nearly-flat spectrum, the hard case).
    * 20 rounds captures ≈97% of the top eigenvalue's variance there;
    * production corpora with a dominant common direction (the usual
    * reason to run this) converge far faster. */
  private[operators] val Iters = 20

  /** In-order fold dot of a vector column against a literal vector —
    * same arithmetic order as the oracle's list_sum(list_transform). */
  private def dotLit(v: Column, lit: Seq[Double]): Column =
    aggregate(zip_with(v, typedlit(lit), (a, b) => a * b),
      org.apache.spark.sql.functions.lit(0.0), (acc, e) => acc + e)

  private def typedlit(xs: Seq[Double]): Column =
    org.apache.spark.sql.functions.typedLit(xs)

  /** Centered copy of the embedding column against a literal mean. */
  private def centered(v: Column, mu: Seq[Double]): Column =
    zip_with(v, typedlit(mu), (x, m) => x.cast("double") - m)

  /** Per-dimension corpus mean, rounded to 6 — the centering vector both
    * engines subtract identically. */
  private[operators] def meanVector(emb: DataFrame): Array[Double] =
    emb.select(posexplode(col("embedding")).as(Seq("d", "x")))
      .groupBy("d").agg(round(avg(col("x").cast("double")), 6).as("m"))
      .collect().sortBy(_.getInt(0)).map(_.getDouble(1))

  /** Centered corpus, materialized once — centering is round-invariant,
    * so the 20 iteration rounds (and the final projection) all scan this
    * checkpoint instead of re-deriving `x − μ` per round. */
  private[operators] def centeredCorpus(emb: DataFrame, mu: Array[Double]): DataFrame =
    emb.select(col("vec_id"), centered(col("embedding"), mu.toSeq).as("cx"))
      .localCheckpoint(true)

  /** One iteration round's job: project s = cx·v, fold the dim
    * per-dimension sums as agg buffers. Exposed so `PcaSpec` can audit
    * the plan (no Generate, one exchange). */
  private[operators] def roundPlan(cx: DataFrame, v: Array[Double]): DataFrame = {
    val sums = (0 until Dim).map(d => sum(col("s") * col("cx").getItem(d)).as(s"y$d"))
    cx.select(col("cx"),
        graft.functions.VectorOps.dot(col("cx"), typedlit(v.toSeq)).as("s"))
      .agg(sums.head, sums.tail: _*)
  }

  /** `iters` rounds of quantized power iteration from the exact dyadic
    * start v₀ = (0.125, …) (1/√64 — exactly representable, so both
    * engines begin bit-identical). Returns the rounded iterate.
    *
    * Per round: one projection computes s = cx·v once per row (native
    * codegen dot, bit-equal to the HOF fold per `VectorNativeSpec`), then
    * a global aggregate folds the dim per-dimension sums s·cx[d] — the
    * exact same terms the round-8 `posexplode + groupBy(d)` summed, just
    * accumulated as dim agg buffers in one pass instead of a 64× row
    * expansion and a 64-group shuffle. Summation order differs between
    * plans either way (Spark partial-agg vs DuckDB scan order); the
    * 6-decimal round-boundary quantization is what re-syncs the engines,
    * exactly as it did for the exploded form. */
  private[operators] def topComponent(cx: DataFrame, iters: Int = Iters): Array[Double] = {
    var v = Array.fill(Dim)(0.125)
    for (_ <- 0 until iters) {
      val row = roundPlan(cx, v).head()
      val y = Array.tabulate(Dim)(row.getDouble)
      val n = math.sqrt(y.map(x => x * x).sum)
      v = y.map(x => BigDecimal(x / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    v
  }

  /** Oracle twin: the identical iteration unrolled as chained CTEs. The
    * per-round CTEs are MATERIALIZED — v$k reads y$k twice (norm +
    * division), and DuckDB inlines plain CTEs, which would re-derive
    * every earlier round 2^k times (the s22 lesson). */
  private def pcaCtes(iters: Int): String = {
    val rounds = (1 to iters).map { k =>
      s"""s$k AS MATERIALIZED (
         |  SELECT c.vec_id, list_sum(list_transform(range(1, ${Dim + 1}),
         |           j -> c.cx[j] * v.v[j])) AS s
         |  FROM cx c, v${k - 1} v),
         |y$k AS MATERIALIZED (
         |  SELECT d, sum(s.s * c.cx[d]) AS y
         |  FROM s$k s JOIN cx c USING (vec_id), dd GROUP BY d),
         |v$k AS MATERIALIZED (
         |  SELECT list(round(y / (SELECT sqrt(sum(y * y)) FROM y$k), 6) ORDER BY d) AS v
         |  FROM y$k)""".stripMargin
    }.mkString(",\n")
    s"""ex AS MATERIALIZED (
       |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS x FROM embeddings),
       |dd AS (SELECT unnest(range(1, ${Dim + 1})) AS d),
       |mu AS MATERIALIZED (
       |  SELECT list(m ORDER BY d) AS mu FROM (
       |    SELECT d, round(avg(x[d]), 6) AS m FROM ex, dd GROUP BY d)),
       |cx AS MATERIALIZED (
       |  SELECT vec_id, list_transform(range(1, ${Dim + 1}), d -> x[d] - mu.mu[d]) AS cx
       |  FROM ex, mu),
       |v0 AS (SELECT list_transform(range(1, ${Dim + 1}), d -> 0.125::DOUBLE) AS v),
       |$rounds""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    // Per-vector projection onto the fitted top component — the column a
    // whitening / common-direction-removal pass writes. The fit is the
    // 8-round quantized power iteration; the projection is a pure
    // codegen fold of each centered vector against the broadcast-literal
    // component (no join, no shuffle — one corpus scan).
    QueryDef.sql("s25_pca_project",
      s"""WITH ${pcaCtes(Iters)}
         |SELECT c.vec_id,
         |       round(list_sum(list_transform(range(1, ${Dim + 1}),
         |             j -> c.cx[j] * v.v[j])), 6) AS pc1
         |FROM cx c, v$Iters v""".stripMargin) {
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val mu = meanVector(emb)
        val cx = centeredCorpus(emb, mu)
        val v = topComponent(cx)
        cx.select(col("vec_id"), round(dotLit(col("cx"), v.toSeq), 6).as("pc1"))
      }
    }
  )
}
