package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** s35's two contracts: the MaxSim arithmetic matches a from-first-
  * principles Scala model (token md5 → 16-dim vector → per-query-token
  * max cosine → scaled-int sum), and the rerank stage adds ZERO
  * exchanges after the candidate cut — it must stay a broadcast-join
  * projection over the documents scan at any corpus size.
  */
class MaxSimSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def round6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def tokVec(tok: String): Array[Double] = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
    Array.tabulate(16)(i => Integer.parseInt(h.substring(i, i + 1), 16) - 7.5)
  }

  private def cos6(a: Array[Double], b: Array[Double]): Double = {
    def dot(x: Array[Double], y: Array[Double]) =
      x.indices.foldLeft(0.0)((acc, i) => acc + x(i) * y(i))
    round6(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
  }

  test("MaxSim matches the first-principles model and plans with zero exchanges") {
    val candIds = Seq(3L, 7L, 11L)
    val cand = candIds.map(id => (id, 0.05)).toDF("doc_id", "rrf").localCheckpoint(true)
    val df = Similarity.maxSimRerank(spark, dir, cand)

    // --- model ---
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), array_distinct(graft.functions.Exprs.tokens(col("text"))).as("t"))
      .filter(col("doc_id").isin(0L +: candIds: _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val qv = toks(0L).map(tokVec)
    val expected = candIds.map { id =>
      val dv = toks(id).map(tokVec)
      val scaled = qv.map(qe => math.round(1e6 * dv.map(de => cos6(qe, de)).max)).sum
      id -> scaled / 1e6
    }.sortBy { case (id, s) => (-s, id) }

    val got = df.collect().map(r => r.getLong(0) -> r.getDouble(2)).toSeq
    assert(got === expected)

    // --- plan: rerank adds no SHUFFLE after the candidate cut (the
    // two BroadcastExchanges — candidates and the 1-row query vector —
    // are the point: nothing corpus-sized moves) ---
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val shuffles = "Exchange (hash|range|Single)".r.findAllIn(plan).size +
      "ShuffleQueryStage".r.findAllIn(plan).size
    assert(shuffles === 0,
      s"MaxSim rerank must be a broadcast-join projection, got:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "corpus-side join machinery in the rerank")
  }
}
