package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd's k-means over an `array<float>` embedding column —
  * the quantizer an IVF index actually trains (operators.Similarity s05
  * uses label means as a stand-in; this is the unsupervised fit).
  *
  * Iteration shape is the scale-correct one: centroids live on the driver
  * (k × dim doubles — trivially small), ship to executors as array
  * literals, the corpus makes ONE pass per iteration computing nearest
  * centroids, and new means come back through a partial-aggregated
  * groupBy. Nothing corpus-sized ever reaches the driver.
  *
  * Determinism: init = the k lowest-vec_id vectors, ties on distance break
  * to the lowest cluster index, fixed iteration count — same input, same
  * model, no RNG.
  */
object KMeans {

  final case class Model(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length

    /** Column: index of this row's nearest centroid (squared L2, ties →
      * lowest index). `distDecimals >= 0` rounds each distance first —
      * the cross-engine sync an SQL oracle needs, because the two
      * engines sum the per-dim terms in different orders and a raw
      * last-ulp difference could flip a near-tie argmin.
      *
      * Argmin as `array_min` over (d2, idx) STRUCTS — struct ordering is
      * field-by-field, so the min is (lowest d2, then lowest index),
      * identical to the old `array_position(dists, array_min(dists))`
      * form. That form inlines the whole k-element distance array twice
      * in the plan (2k aggregates plan-audited); codegen subexpression
      * elimination absorbs the duplicate at runtime (A/B-benched at
      * parity), but this form makes single evaluation STRUCTURAL —
      * independent of CSE applying, which interpreted/fallback
      * projections do not guarantee. */
    def clusterOf(v: Column, distDecimals: Int = -1): Column =
      array_min(array(centroids.zipWithIndex.map { case (c, i) =>
        val d = sqDist(v, c)
        struct((if (distDecimals >= 0) round(d, distDecimals) else d).as("d2"),
          lit(i).as("cid"))
      }: _*)).getField("cid").cast("int")

    /** Column: squared distance from `v` to its nearest centroid. */
    def nearestDist(v: Column): Column =
      array_min(array(centroids.map(c => sqDist(v, c)): _*))

    private def sqDist(v: Column, c: Array[Double]): Column =
      aggregate(
        zip_with(v, typedLit(c.toSeq), (x, y) => {
          val d = x.cast("double") - y
          d * d
        }),
        lit(0.0), (acc, x) => acc + x)
  }

  /** (id, cluster, d2): squared distance of every vector to every
    * centroid — as explode + broadcast join + codegen'd aggregation, NOT
    * per-row HOF lambdas (interpreted, and k× slower than codegen; the
    * join form is also the shape that distributes at corpus scale: a
    * matrix product expressed as joins). */
  private def distances(emb: DataFrame, vecCol: String, idCol: String, model: Model): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val centDf = model.centroids.zipWithIndex.flatMap { case (c, ci) =>
      c.zipWithIndex.map { case (v, d) => (ci, d, v) }
    }.toSeq.toDF("cluster", "dim", "c")
    emb.select(col(idCol).as("id"), posexplode(col(vecCol)).as(Seq("dim", "x")))
      .join(broadcast(centDf), Seq("dim"))
      .groupBy("id", "cluster")
      .agg(sum((col("x").cast("double") - col("c")) * (col("x").cast("double") - col("c")))
        .as("d2"))
  }

  /** (id, cluster, d2): each vector's nearest centroid, ties to the
    * lowest cluster index (min over (d2, cluster) structs).
    * `distDecimals >= 0` rounds d2 before the argmin (oracle sync). */
  private def assign(emb: DataFrame, vecCol: String, idCol: String, model: Model,
      distDecimals: Int = -1): DataFrame = {
    val d2 = if (distDecimals >= 0) round(col("d2"), distDecimals) else col("d2")
    distances(emb, vecCol, idCol, model)
      .groupBy("id")
      .agg(min(struct(d2.as("d2"), col("cluster"))).as("m"))
      .select(col("id"), col("m.cluster").as("cluster"), col("m.d2").as("d2"))
  }

  /** Fit on `emb` (columns: id, vec array<float>). One corpus pass per
    * iteration + one tiny collect of (cluster, dim) means.
    *
    * `meanDecimals`/`distDecimals` (default: no rounding, s06's exact
    * fit) round each iteration's centroid means / assignment distances.
    * Rounding at every iteration BOUNDARY is what makes the fit
    * oracle-reproducible: both engines re-synchronize on the identical
    * rounded values each round, so floating-point summation-order drift
    * never compounds across iterations (d12 uses 4/6 decimals). */
  def fit(emb: DataFrame, vecCol: String, idCol: String, k: Int, iters: Int,
      meanDecimals: Int = -1, distDecimals: Int = -1): Model = {
    val init = emb.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(init.length == k,
      s"k-means needs at least k=$k vectors, corpus has ${init.length}")
    var model = Model(init)
    for (_ <- 0 until iters) {
      val a = assign(emb, vecCol, idCol, model, distDecimals).select("id", "cluster")
      val rawMean = avg(col("x").cast("double"))
      val means = emb
        .select(col(idCol).as("id"), posexplode(col(vecCol)).as(Seq("dim", "x")))
        .join(a, Seq("id"))
        .groupBy("cluster", "dim")
        .agg((if (meanDecimals >= 0) round(rawMean, meanDecimals) else rawMean).as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (c, rows) =>
          c -> rows.sortBy(_.getInt(1)).map(_.getDouble(2))
        }
      // empty clusters keep their previous centroid
      model = Model(Array.tabulate(k)(c => means.get(c).map(_.toArray)
        .getOrElse(model.centroids(c))))
    }
    model
  }

  /** Per-cluster sizes + inertia (sum of squared distances to the
    * assigned centroid) — the fit-quality summary. `distDecimals`
    * rounds each d2 before assignment, and switches the inertia sum to
    * EXACT integer arithmetic (each rounded d2 scaled to a long):
    * summing doubles is order-dependent and a half-ulp of cross-engine
    * drift can land exactly on the output rounding boundary, while a
    * sum of longs is associative and bit-identical everywhere. */
  def summarize(emb: DataFrame, vecCol: String, idCol: String, model: Model,
      distDecimals: Int = -1): DataFrame = {
    val inertia =
      if (distDecimals >= 0) {
        val scale = math.pow(10, distDecimals)
        round(sum(round(col("d2") * scale).cast("long")) / scale, 4)
      } else round(sum("d2"), 4)
    assign(emb, vecCol, idCol, model, distDecimals)
      .groupBy("cluster")
      .agg(count(lit(1)).as("n"), inertia.as("inertia"))
  }
}
