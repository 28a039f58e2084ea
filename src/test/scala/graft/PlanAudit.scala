package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8", "plan-audit")
    val dir = "/root/testdata/sf0.01"
    for (name <- Seq("q01_pricing_summary", "q06_range_scan", "q11_star_revenue",
        "q28_schema_projection", "d02_minhash_lsh", "d03_lsh_jaccard",
        "s01_knn_bruteforce", "s07_ivf_multiprobe", "s08_batch_knn",
        "m04_feature_extract", "q36_asof_general", "q37_local_supplier")) {
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
