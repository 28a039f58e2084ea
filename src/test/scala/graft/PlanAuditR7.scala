package graft
/** Round-7 plan audit: BPE train/encode, the ANN lifecycle additions,
  * caps/order/alignment, the distributed-rank rewrites, and the
  * binaryFile probe. `Test/runMain graft.PlanAuditR7`. */
object PlanAuditR7 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8", "plan-audit-r7")
    val dir = "/root/testdata/sf0.01"
    for (name <- Seq("t24_bpe_train", "t25_bpe_encode",
        "s16_filtered_ann", "s17_knn_graph", "s18_ivf_upsert",
        "s19_ann_tombstones", "s06_kmeans_ivf_fit",
        "t26_source_caps", "t27_training_order",
        "t16_curriculum_bins", "t19_zipf_fit",
        "m10_alignment_filter", "src06_binaryfile_ingest")) {
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
