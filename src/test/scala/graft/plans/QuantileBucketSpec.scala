package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantileBucketSpec extends SparkSpec {

  test("bucket is the insertion point among sorted edges; nulls pass through") {
    import spark.implicits._
    val edges = Seq(10.0, 20.0, 30.0)
    val df = Seq[java.lang.Double](5.0, 10.0, 15.0, 25.0, 30.0, 35.0, null)
      .toDF("v")
      .select(col("v"), QuantileBucket(col("v"), edges).as("b"))
    val got = df.collect().map(r => if (r.isNullAt(1)) null else r.getInt(1))
    assert(got.toSeq === Seq(0, 1, 1, 2, 3, 3, null))
  }

  test("codegen and interpreted evaluation agree on random values") {
    import spark.implicits._
    val edges = (1 to 255).map(_ * 7.0)
    val vals = (0 until 2000).map(i => (i * 1.37) % 1900)
    val viaPlan = vals.toDF("v")
      .select(QuantileBucket(col("v"), edges).as("b"))
      .collect().map(_.getInt(0))
    val direct = vals.map(v => QuantileBucketSearch.bucket(edges.toArray, v))
    assert(viaPlan.toSeq === direct)
  }
}
