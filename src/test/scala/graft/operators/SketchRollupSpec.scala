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
}
