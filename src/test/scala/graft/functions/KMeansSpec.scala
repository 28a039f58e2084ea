package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def inertia(iters: Int): (Double, Long) = {
    val emb = Tables.embeddings(spark, dir)
    val model = KMeans.fit(emb, "embedding", "vec_id", k = 4, iters = iters)
    val s = KMeans.summarize(emb, "embedding", "vec_id", model)
    val row = s.agg(sum("inertia"), sum("n")).head()
    (row.getDouble(0), row.getLong(1))
  }

  test("fit is deterministic and covers the corpus") {
    val (i1a, n) = inertia(2)
    val (i1b, _) = inertia(2)
    assert(i1a === i1b)
    assert(n === Tables.embeddings(spark, dir).count())
  }

  test("more Lloyd iterations never increase inertia") {
    val (i1, _) = inertia(1)
    val (i5, _) = inertia(5)
    assert(i5 <= i1 + 1e-6, s"inertia rose: 1-iter=$i1 5-iter=$i5")
  }

  test("separable clusters are recovered exactly") {
    import spark.implicits._
    // two tight blobs far apart; init takes the first 2 vectors (one per blob)
    val pts = Seq(
      (0L, Seq(0.0f, 0.0f)), (2L, Seq(0.1f, -0.1f)), (4L, Seq(-0.1f, 0.1f)),
      (1L, Seq(10.0f, 10.0f)), (3L, Seq(10.1f, 9.9f)), (5L, Seq(9.9f, 10.1f)))
      .toDF("vec_id", "embedding")
    val model = KMeans.fit(pts, "embedding", "vec_id", k = 2, iters = 3)
    val assign = pts.select(col("vec_id"), model.clusterOf(col("embedding")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(Set(assign(0L), assign(2L), assign(4L)).size === 1)
    assert(Set(assign(1L), assign(3L), assign(5L)).size === 1)
    assert(assign(0L) !== assign(1L))
  }
}
