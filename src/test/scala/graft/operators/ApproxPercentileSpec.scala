package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q42's correctness gate: `percentile_approx` has no cross-engine oracle
  * (sketch internals are engine-specific), so the driver records it
  * rows-only and THIS spec carries the value assertion — the sketch's
  * published contract is a rank-error bound, `|rank(approx) - q·n| <=
  * n / accuracy`, which we check against exactly-sorted data. */
class ApproxPercentileSpec extends SparkSpec {
  import spark.implicits._

  // deterministic, irregularly-spaced values across 3 groups
  private val n = 5000
  private lazy val df = (0 until n)
    .map(i => (s"g${i % 3}", math.sin(i) * 100.0 + i * 0.01))
    .toDF("g", "v")

  test("percentile_approx lands within the sketch's rank-error bound of exact") {
    val accuracy = 10000
    val got = df.groupBy("g")
      .agg(
        percentile_approx(col("v"), lit(0.5), lit(accuracy)).as("p50"),
        percentile_approx(col("v"), lit(0.95), lit(accuracy)).as("p95"),
        count(lit(1)).as("cnt"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .toMap

    val byGroup = df.collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (g, rows) => g -> rows.map(_._2).sorted }

    assert(got.keySet === byGroup.keySet)
    for ((g, sorted) <- byGroup; (q, approx) <- Seq(0.5 -> got(g)._1, 0.95 -> got(g)._2)) {
      val m = sorted.length
      assert(got(g)._3 === m.toLong)
      // rank error tolerance: n/accuracy, plus 1 for boundary rounding
      val tol = math.max(1, m / accuracy) + 1
      val target = (q * m).toInt
      val lo = sorted(math.max(0, target - tol))
      val hi = sorted(math.min(m - 1, target + tol))
      assert(approx >= lo && approx <= hi,
        s"group $g q=$q: approx=$approx outside rank-tolerant window [$lo, $hi]")
    }
  }

  test("approx tracks exact q33-style percentiles on the same groups") {
    val joined = df.groupBy("g")
      .agg(
        percentile_approx(col("v"), lit(0.5), lit(10000)).as("ap50"),
        percentile(col("v"), lit(0.5)).as("ep50"))
      .collect()
    // exact interpolates between neighbors; approx returns an actual data
    // point — at accuracy 10000 over 5000 rows they differ by at most one
    // inter-value gap, which for this data is < 0.7
    joined.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 0.7,
        s"group ${r.getString(0)}: approx ${r.getDouble(1)} vs exact ${r.getDouble(2)}")
    }
  }
}
