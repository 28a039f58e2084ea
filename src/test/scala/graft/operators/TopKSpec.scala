package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("two-phase salted top-k equals the one-shot window for every k") {
    val df = (0 until 2000)
      .map(i => ((i % 5).toLong, (i * 37 % 991).toLong, i.toLong))
      .toDF("key", "score", "id")
    for (k <- Seq(1, 3, 10)) {
      val fast = TopK.topKPerKey(df, Seq("key"),
        Seq(col("score").desc, col("id")), k, saltExpr = col("id"), buckets = 16)
        .select("key", "id", "rk")
      val w = Window.partitionBy("key").orderBy(col("score").desc, col("id"))
      val oneShot = df.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= k).select("key", "id", "rk")
      assert(fast.exceptAll(oneShot).isEmpty && oneShot.exceptAll(fast).isEmpty, s"k=$k")
      assert(fast.count() === oneShot.count())
    }
  }
}
