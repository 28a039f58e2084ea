package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Top-principal-component extraction over the embedding corpus by power
  * iteration in the two-pass `v ← Xᵀ(Xv)` form — the shape that scales to
  * embedding widths where a dim×dim covariance matrix is no longer cheap
  * to materialize (at dim 4096 that matrix is 16M doubles per executor;
  * the two-pass form never forms it). Each round is ONE distributed job:
  * the centered projection s_i = (x_i − μ)·v rides the same scan that
  * pos-explodes the centered vector, a (dim)-group aggregation produces
  * y = Σ s_i·(x_i − μ), and only dim doubles ever reach the driver — the
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

  /** `iters` rounds of quantized power iteration from the exact dyadic
    * start v₀ = (0.125, …) (1/√64 — exactly representable, so both
    * engines begin bit-identical). Returns the rounded iterate. */
  private[operators] def topComponent(
      emb: DataFrame, mu: Array[Double], iters: Int = Iters): Array[Double] = {
    val ex = emb.select(col("vec_id"), col("embedding")).localCheckpoint(true)
    var v = Array.fill(Dim)(0.125)
    for (_ <- 0 until iters) {
      val cx = centered(col("embedding"), mu.toSeq)
      val y = ex
        .select(dotLit(cx, v.toSeq).as("s"), posexplode(cx).as(Seq("d", "c")))
        .groupBy("d").agg(sum(col("s") * col("c")).as("y"))
        .collect().sortBy(_.getInt(0)).map(_.getDouble(1))
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
        val v = topComponent(emb, mu)
        emb.select(col("vec_id"),
          round(dotLit(centered(col("embedding"), mu.toSeq), v.toSeq), 6).as("pc1"))
      }
    }
  )
}
