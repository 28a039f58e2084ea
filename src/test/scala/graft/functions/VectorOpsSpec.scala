package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  private val ab = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, -5.0f, 6.0f))).toDF("a", "b")

  test("dot / norm / cosine match hand computation") {
    val r = ab.select(
      VectorOps.dot(col("a"), col("b")),
      VectorOps.norm(col("a")),
      VectorOps.cosine(col("a"), col("b"))).head()
    assert(math.abs(r.getDouble(0) - 12.0) < 1e-12)          // 4-10+18
    assert(math.abs(r.getDouble(1) - math.sqrt(14.0)) < 1e-12)
    val expectCos = 12.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(r.getDouble(2) - expectCos) < 1e-12)
  }

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))).toDF("a", "b")
    val cs = df.select(VectorOps.cosineR(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0)).toSeq
    assert(cs === Seq(1.0, 0.0))
  }

  test("hyperplaneBucket is deterministic and within [0, 2^planes)") {
    val vecs = (0 until 20).map(i => Tuple1(Seq.tabulate(8)(d => (i * 31 + d * 7 % 13 - 6).toFloat)))
    val df = vecs.toDF("v")
    val b1 = df.select(VectorOps.hyperplaneBucket(col("v"), 4, dim = 8).as("b"))
      .collect().map(_.getLong(0)).toSeq
    val b2 = df.select(VectorOps.hyperplaneBucket(col("v"), 4, dim = 8).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(b1 === b2)
    assert(b1.forall(b => b >= 0 && b < 16))
    // scaling a vector by a positive constant never changes its bucket
    val scaled = vecs.map { case Tuple1(v) => Tuple1(v.map(_ * 3.0f)) }.toDF("v")
    val b3 = scaled.select(VectorOps.hyperplaneBucket(col("v"), 4, dim = 8).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(b3 === b1)
  }
}
