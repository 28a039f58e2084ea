package graft

/** Distributed-correctness net: a query's RESULT may not depend on how
  * the data happens to be partitioned — different shuffle fan-outs
  * reorder every aggregation's input, so anything order-sensitive that
  * escaped a rounding contract (raw double summation, arbitrary-tie
  * window picks, RNG sampling) diverges here long before it diverges
  * between a 32-core box and a 1000-executor cluster. Representative
  * queries from each family run under three different partition counts
  * and must produce identical row sets.
  */
class PartitionInvarianceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private val queries = Seq(
    "q01_pricing_summary", // double sums under a rounding contract
    "q12_window_rank", // window ties + salted two-phase top-k
    "q51_funnel_stages", // chained windows + ordered semantics
    "d02_minhash_lsh", // hash signatures + banded buckets
    "d16_span_dedup_apply", // ordered token rebuild via sort-agg
    "t13_stratified_sample", // hash-gated sampling (retry safety)
    "t29_safe_split", // hash split × df-capped shingle screen
    "t23_mixture_sample", // derived-rate sampling
    "s01_knn_bruteforce", // rounded cosine ranking
    "t22_quality_classifier", // integer feature sums
    "s06_kmeans_ivf_fit", // iterative fit + integer-scaled inertia sum
    "s13_pagerank", // per-round rank quantization (12 dp re-sync)
    "s17_knn_graph", // in-bucket cosine ties under rank cut
    "s22_graph_search", // iterative frontier cuts + beam ties
    "s23_batch_graph_search", // per-query windows over shared frames
    "t25_bpe_encode", // collected merge list + per-doc token agg
    "m10_alignment_filter", // in-order 16-dim fold cosine gate
    "t27_training_order", // hash-ordered two-level shuffle
    "t16_curriculum_bins", // distributed ntile via offsets + closed form
    "t19_zipf_fit", // distributed vocab rank feeding regr_* aggs
    "t28_corpus_card", // scaled-integer mean + rollup totals
    "s21_hybrid_rrf", // count-join ranks + fused ordering
    "s26_binary_quant", // packed-bit Hamming screen under a rank cut
    "s27_mmr_rerank", // greedy rounds over checkpointed tiny frames
    "t31_dsir_weight", // 12-dp-quantized log-ratio sums (re-sync contract)
    "d18_bloom_screen", // md5-position membership + all-k hit counting
    "s28_ivf_bq", // stacked quantizer prunes under a rank cut
    "s29_ivf_stats", // 6dp-quantized means over window-picked assignment
    "s30_hier_graph_search", // two-stage iterative beam cuts + reseed
    "t32_raked_resample", // IPF-fit-derived hash-gated selection
    "t33_sequence_packing", // two-phase exact-integer prefix sum
    "t34_pack_manifest", // exploded interval overlaps, integer agg
    "s31_batch_hier_search", // batched two-stage beam cuts + reseed
    "s32_hier_recall", // descent + brute-force lists joined on id
    "t35_temperature_mix", // sqrt-derived rates, hash-gated membership
    "m15_vad_segments", // all-integer frame energies + run counting
    "m16_zero_crossings", // exact-integer pairwise sign flips
    "t36_bpe_fertility", // integer token counts over the collected fit
    "s33_quant_error", // 12dp-quantized summands + order-free max
    "s34_ann_compaction", // broadcast tombstone mark + integer flag agg
    "t37_quality_train", // scaled-int gradient sums, 6dp round boundaries
    "s35_maxsim_rerank", // 6dp-rounded maxima folded as scaled BIGINTs
    "t38_unigram_train", // Viterbi-EM fit: quantized products, top-k prunes
    "t39_unigram_fertility", // encode projection over the collected fit
    "q77_time_travel", // versioned snapshots must agree under any fan-out
    "q78_versioned_merge", // merge semantics can't depend on partitioning
    "q79_version_diff", // full-outer diff + struct compare, any fan-out
    "q80_expectations", // gate counts + committed-version readback
    "q81_partitioned_merge", // touched-partition routing, any fan-out
    "q84_two_level_skipping", // stats sidecars + pruning under any layout
    "q85_deletion_vectors", // DV tombstone identity can't depend on files
    "q86_dv_growth_guard", // bound routing decisions, any fan-out
    "q87_change_feed", // per-commit diff slices, any fan-out
    "q88_restore", // manifest-pointer restore + history ops
    "q89_bloom_point_lookup", // bloom probes across file layouts
    "q90_zorder_skipping", // z-clustered commit + 2-D pruned reads
    "q91_optimize_zorder", // recluster rewrite must not change a row
    "q92_time_travel_ts", // ts-resolved versions, any fan-out
    "q93_generated_partitions", // derived routing + source-range prune
    "q94_shallow_clone", // COW divergence + clone-point resolution
    "q95_join_pruned", // dim-driven manifest pruning + broadcast join
    "q96_check_constraints", // enforcement passes rows through intact
    "q97_expire_partitions", // metadata drop set, any layout
    "q98_schema_evolution", // widening union + null-fill, any fan-out
    "q99_overwrite_partitions", // blind replace + metadata carry-over
    "q100_column_mapping", // rename-chain coalesce, any fan-out
    "q101_mor_upserts", // chained delta folds + tombstones, any layout
    "q116_sql_join_pruned", // runtime dim-key manifest pruning, any fan-out
    "q118_sql_tag_travel", // tag-resolved versions, any fan-out
    "q119_sql_levels_join_pruned", // level-epoch dim-key pruning, any fan-out
    "q121_sql_two_dim_pruned", // two-axis intersected pruning, any fan-out
    "q120_sql_merge_schema_evolution", // SQL-evolving merge, any fan-out
    "s36_feed_ivf_maintain") // 7-commit CDC pipeline + frozen quantizer

  test("results are identical under shuffle partition counts 3, 7, 16") {
    val confKey = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(confKey)
    def runAll(n: Int): Map[String, Set[String]] = {
      spark.conf.set(confKey, n.toString)
      queries.map { q =>
        q -> SparkEntry.queries(q)(spark, dir).collect()
          .map(_.toSeq.map(String.valueOf).mkString("|")).toSet
      }.toMap
    }
    try {
      val base = runAll(3)
      Seq(7, 16).foreach { n =>
        val got = runAll(n)
        queries.foreach { q =>
          assert(got(q) === base(q), s"$q diverged between partitions=3 and partitions=$n")
        }
      }
    } finally spark.conf.set(confKey, prev)
  }
}
