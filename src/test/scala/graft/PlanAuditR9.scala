package graft
/** Round-9 plan audit: the fixed PCA projection, the hierarchical
  * search pair, applied raking, the packing pair, temperature mixing,
  * and the VAD codec seam. `Test/runMain graft.PlanAuditR9`. */
object PlanAuditR9 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8", "plan-audit-r9")
    val dir = "/root/testdata/sf0.01"
    for (name <- Seq("s25_pca_project", "s30_hier_graph_search",
        "s31_batch_hier_search", "t32_raked_resample",
        "t33_sequence_packing", "t34_pack_manifest",
        "t35_temperature_mix", "m15_vad_segments")) {
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
