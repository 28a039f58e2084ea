package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Mergeable-sketch distinct counting (q50): the whole point of storing
  * HLL sketches per partition is that merging them must be LOSSLESS vs
  * sketching the union directly — otherwise incremental maintenance
  * drifts from recompute. Datasketches HLL guarantees this (union of
  * sketches == sketch of union, same lgK); the estimate itself only has
  * to be close to exact. */
class SketchRollupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    super.beforeAll()
    // the events fixture is INT64 TIMESTAMP(NANOS); Tables.events converts
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
  }

  test("daily-sketch union estimates exactly match the direct whole-column sketch") {
    val events = Tables.events(spark, dir)
    val merged = events
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val direct = events
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
    val m = merged.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val d = direct.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === d)
  }

  test("merged estimate is within 2% of exact distinct per event_type") {
    val events = Tables.events(spark, dir)
    val est = events
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet)
    for ((k, n) <- exact) {
      val e = est(k)
      assert(math.abs(e - n).toDouble / n <= 0.02, s"$k: est=$e exact=$n")
    }
  }

  test("sketch outputs are partition-invariant: same data, any layout, identical estimates") {
    // the no-oracle rows' remaining degree of freedom: a sketch whose
    // VALUE depended on task layout would make q32/q42/q50
    // non-deterministic across cluster sizes/AQE decisions. HLL
    // register state is a MAX per register — order- and
    // partitioning-free — so every estimate must be identical under any
    // repartitioning. (Serialized HLL_4 bytes are NOT asserted: the
    // aux-exception table's internal order is insertion-order-dependent
    // even when the register state — and thus every estimate — is
    // identical.)
    val events = Tables.events(spark, dir)
    def q50est(parts: Int): Map[String, Long] = events
      .repartition(parts, col("user_id"))
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(q50est(1) === q50est(17),
      "union-sketch estimates must not depend on layout")

    // q32's HLL++ estimates: partition-invariant to the exact value
    def q32est(parts: Int): Map[String, Long] = Tables.orders(spark, dir)
      .repartition(parts)
      .groupBy("o_orderpriority")
      .agg(approx_count_distinct("o_custkey", 0.02).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(q32est(1) === q32est(13))

    // q42's KLL-style percentile sketch: same contract
    def q42est(parts: Int): Map[String, (Double, Double)] = events
      .repartition(parts)
      .groupBy("event_type")
      .agg(percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50"),
        percentile_approx(col("value"), lit(0.95), lit(10000)).as("p95"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(q42est(1) === q42est(13))
  }
}
