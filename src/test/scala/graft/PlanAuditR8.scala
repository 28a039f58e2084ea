package graft
/** Round-8 plan audit: the graph-search lifecycle (rebuilt two-band
  * s17 + the s22 traversal), span-dedup application, the PPM codec
  * seam, the sketch exact twin, and the hash-gated JDBC round trip.
  * `Test/runMain graft.PlanAuditR8`. */
object PlanAuditR8 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8", "plan-audit-r8")
    val dir = "/root/testdata/sf0.01"
    for (name <- Seq("s17_knn_graph", "s22_graph_search",
        "d16_span_dedup_apply", "m11_ppm_decode",
        "q75_distinct_rollup_exact", "jdbc_roundtrip",
        "s26_binary_quant", "s27_mmr_rerank", "t31_dsir_weight",
        "d18_bloom_screen", "m13_ppm_resize", "s28_ivf_bq",
        "s29_ivf_stats", "m14_wav_resample")) {
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
