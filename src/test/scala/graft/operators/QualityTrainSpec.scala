package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** t37's convergence contract: the in-engine fit must actually LEARN —
  * training accuracy well above the majority-class baseline — and the
  * gradient arithmetic must be partition-order invariant (the scaled-
  * integer sum discipline), or the fit would drift between a 32-core
  * box and a 1000-executor cluster.
  */
class QualityTrainSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("the fitted classifier beats the majority baseline by a wide margin") {
    val feat = QualityTrain.features(Tables.documents(spark, dir))
    val w = QualityTrain.fit(feat)
    assert(w.length === QualityTrain.Buckets)
    // weights are 6dp-quantized (the round-boundary contract)
    w.foreach(x => assert(math.abs(x * 1e6 - math.round(x * 1e6)) < 1e-6, s"unquantized $x"))

    val scored = QualityTrain.classify(feat, w)
      .join(feat.select(col("doc_id"), col("y")), "doc_id")
    val m = scored.count().toDouble
    val correct = scored.filter(col("keep") === col("y").cast("long")).count() / m
    val pos = feat.agg(sum("y")).head().getDouble(0) / m
    val baseline = math.max(pos, 1 - pos)
    assert(baseline < 0.6, s"fixture label must be balanced, got pos=$pos")
    assert(correct > baseline + 0.25,
      s"training accuracy $correct must clearly beat the majority baseline $baseline")
  }

  test("the fit is invariant to the shuffle partition count") {
    val confKey = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(confKey)
    def fitWith(n: Int): Seq[Double] = {
      spark.conf.set(confKey, n.toString)
      QualityTrain.fit(QualityTrain.features(Tables.documents(spark, dir))).toSeq
    }
    try assert(fitWith(3) === fitWith(11),
      "gradient sums must be exact scaled integers — partition-count invariant")
    finally spark.conf.set(confKey, prev)
  }
}
