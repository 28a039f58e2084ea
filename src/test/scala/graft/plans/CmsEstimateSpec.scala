package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

class CmsEstimateSpec extends SparkSpec {
  import spark.implicits._

  private def freqFixture = Seq.fill(50)("alpha") ++ Seq.fill(20)("beta") ++
    Seq.fill(5)("gamma") ++ Seq("delta")

  test("estimates equal exact counts when the sketch is wide enough") {
    val df = freqFixture.toDF("item")
    val sketch = df.agg(expr("count_min_sketch(item, 0.0001d, 0.999d, 42)")).scalar()
    val got = df.distinct()
      .select(col("item"), CmsEstimate(sketch, col("item")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("alpha" -> 50L, "beta" -> 20L, "gamma" -> 5L, "delta" -> 1L))
  }

  test("CMS contract: exact <= estimate <= exact + eps*N, for string and long items") {
    // narrow sketch (eps=0.05 -> ~55 counters/row) over 2000 skewed keys
    // forces collisions, so the upper-bias property is actually exercised
    val n = 2000
    val rows = (0 until n).map(i => (s"k${i % 97}", (i % 13).toLong))
    val df = rows.toDF("s", "l")
    val exactS = rows.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val sketchS = df.agg(expr("count_min_sketch(s, 0.05d, 0.9d, 7)")).scalar()
    val sketchL = df.agg(expr("count_min_sketch(l, 0.05d, 0.9d, 7)")).scalar()
    val gotS = df.distinct().select(col("s"), CmsEstimate(sketchS, col("s")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    gotS.foreach { case (k, est) =>
      val exact = exactS(k)
      assert(est >= exact && est <= exact + (0.05 * n).toLong,
        s"item $k: exact=$exact est=$est")
    }
    val exactL = rows.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val gotL = df.select(col("l")).distinct()
      .select(col("l"), CmsEstimate(sketchL, col("l")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    gotL.foreach { case (k, est) =>
      assert(est >= exactL(k) && est <= exactL(k) + (0.05 * n).toLong)
    }
  }

  test("registered as SQL function via GraftExtensions; scalar subquery sketch") {
    freqFixture.toDF("item").createOrReplaceTempView("cms_items_v")
    val got = spark.sql(
      """SELECT item,
        |       cms_estimate((SELECT count_min_sketch(item, 0.0001d, 0.999d, 42)
        |                     FROM cms_items_v), item) AS est
        |FROM (SELECT DISTINCT item FROM cms_items_v)""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("alpha") === 50L && got("delta") === 1L)
  }

  test("a per-row sketch column is rejected at analysis") {
    val df = freqFixture.toDF("item")
    val sketches = df.agg(
      expr("count_min_sketch(item, 0.01d, 0.9d, 1)").as("sk")).crossJoin(df)
    val ex = intercept[AnalysisException] {
      sketches.select(CmsEstimate(col("sk"), col("item"))).collect()
    }
    assert(ex.getMessage.contains("literal or scalar subquery"), ex.getMessage)
  }

  test("null item probes to null; unseen item estimates >= 0") {
    val df = freqFixture.toDF("item")
    val sketch = df.agg(expr("count_min_sketch(item, 0.0001d, 0.999d, 42)")).scalar()
    val rows = Seq(Some("zeta"), None).toDF("item")
      .select(CmsEstimate(sketch, col("item")).as("est")).collect()
    assert(rows.exists(_.isNullAt(0)))
    assert(rows.filter(!_.isNullAt(0)).forall(_.getLong(0) >= 0L))
  }
}
