package graft
import org.apache.spark.sql.SparkSession
/** Round-6 plan audit: the new as-of/range/bucketed queries. */
object PlanAuditR6 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8", "plan-audit-r6")
    val dir = "/root/testdata/sf0.01"
    for (name <- Seq("q43_asof_native", "q44_asof_broadcast", "q45_range_join",
        "q46_asof_tolerance", "q47_skew_salted", "m07_joint_stats_bucketed",
        "d10_simhash_neardup", "s09_quantized_knn", "t09_pii_scrub",
        "t10_repetition", "t11_quality_gate",
        "t12_pack_sequences", "t13_stratified_sample", "q48_cdc_apply",
        "q49_grouping_sets", "q50_sketch_rollup",
        "q51_funnel_stages", "q52_retention_cohorts",
        "t14_token_entropy", "t15_vocab_coverage", "src03_docgen_pushdown",
        "q53_unpivot", "d11_contamination", "t16_curriculum_bins",
        "q54_rolling_window", "q55_calendar_fill",
        "d12_semantic_dedup", "d13_editdist_neardup",
        "t17_tfidf_keywords", "t18_bigram_lm_score",
        "d15_dupspan", "s10_pq_adc", "s11_ann_recall",
        "q58_locf_fill", "t19_zipf_fit", "s12_ivfpq", "q59_profile",
        "t20_kl_novelty",
        "q60_dist_window", "q61_listagg", "q62_try_safe", "q63_variant_json",
        "q64_session_window", "q65_approx_topk", "q66_topk_rollup",
        "src04_xml_roundtrip",
        "q67_sliding_window", "q68_cms_freq", "q69_interval_math", "q70_exists",
        "q71_pipe_syntax", "q72_nullsafe_join", "s13_pagerank",
        "s14_matryoshka_rerank", "t21_chunking", "t22_quality_classifier",
        "t23_mixture_sample", "s15_chunk_search", "q73_range_join_auto",
        "q74_sql_udf")) {
      println(s"===== $name =====")
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect() // materialize so AQE final plans are shown
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
