package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}

/** Shuffle-budget regression net: every query here has an audited plan
  * whose SHUFFLE exchange count is part of its 100 TB design (broadcast
  * exchanges are free by comparison and counted separately). A future
  * edit that sneaks an extra shuffle into one of these — a lost
  * partial-agg, a broadcast that silently became a shuffle join, a
  * repartition leak — fails here with the query name, instead of
  * surfacing as an unexplained bench regression three rounds later.
  *
  * Budgets are CEILINGS from the audited plans (AQE may use fewer), on
  * sf0.001 so the suite stays fast; shuffle counts are data-size-
  * independent for these shapes (AQE changes join STRATEGY with size,
  * which is why broadcast exchanges get a generous separate ceiling).
  */
class ExchangeBudgetSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private val dir = "/root/testdata/sf0.001"

  // query -> max shuffle exchanges
  private val budgets: Seq[(String, Int)] = Seq(
    "q01_pricing_summary" -> 1, // partial agg + one key shuffle
    "q06_range_scan" -> 0, // pushed-filter scan, no shuffle at all
    "q09_anti_join" -> 1, // broadcast anti join; final agg may shuffle once
    "q11_star_revenue" -> 3, // big-side joins under AQE + final agg
    "q12_window_rank" -> 3, // agg shuffle + the salted top-k's TWO window
                            // passes — the deliberate skew-immunity trade
                            // (TopK.topKPerKey) on 25 window keys
    "q24_sessionize" -> 1, // one user_id shuffle serves window + agg
    "q51_funnel_stages" -> 2, // shared event-log exchange + final singleton agg
    "q60_dist_window" -> 1, // all three distribution functions share a frame
    "q64_session_window" -> 1, // map-side session pre-merge, one key shuffle
    "q67_sliding_window" -> 1, // Expand happens before the one agg shuffle
    "t01_token_stats" -> 0, // pure projection
    "t21_chunking" -> 0, // one Generate pass
    "t22_quality_classifier" -> 1, // explode + two-phase agg
    "d01_exact_dedup" -> 1, // one content-hash shuffle
    "s01_knn_bruteforce" -> 1, // broadcast query + TakeOrdered (limit shuffle)
    "s14_matryoshka_rerank" -> 2, // two TakeOrdered tiers
    "t25_bpe_encode" -> 1, // merge-applied encode is a projection; one doc agg
    "t26_source_caps" -> 1, // one source-keyed window (map-side group limit)
    "s16_filtered_ann" -> 0, // filter+probe ride broadcasts; TakeOrdered local
    "s17_knn_graph" -> 3, // bucket self-join (≤2 under SMJ at scale) + rank window
    "s18_ivf_upsert" -> 1, // literal-centroid projection + one nlist agg
    "m10_alignment_filter" -> 2, // id-keyed tower join (0 when broadcast/bucketed)
    "d16_span_dedup_apply" -> 5, // gram df re-agg + dup/cov distincts + rebuild agg
    "m11_ppm_decode" -> 0, // one typed encode→decode pass, no shuffle at all
    "q75_distinct_rollup_exact" -> 5, // two distinct expansions + daily rollup
    "jdbc_roundtrip" -> 0, // 4 range-bounded scans, no exchange
    "s26_binary_quant" -> 0, // packed-sig screen + rerank are TakeOrdered tiers
    "t31_dsir_weight" -> 2, // vocab LM rides a broadcast; one doc-agg shuffle
    "d18_bloom_screen" -> 4, // ≤m-row bit set + md5 index distincts; probe aggs
    "m13_ppm_resize" -> 0, // typed decode→gather pass, no shuffle at all
    "s25_pca_project" -> 0, // final projection scans the centered
                            // checkpoint: dot + round, no exchange (each
                            // fit round is its own 1-exchange global agg
                            // job, asserted in PcaSpec's plan test)
    "s23_batch_graph_search" -> 1, // post-checkpoint plan: the one final
                                   // per-query rank-window cut
    "s24_bm25" -> 7, // tf/dl/stats/df aggs + doc-keyed score agg; idf
                     // and stats sides ride broadcasts (5 here)
    "t30_mixture_raking" -> 0, // the fitted cell table is checkpointed
                               // (12 cell-sized IPF windows + the
                               // opening corpus groupBy live behind it)
    "t32_raked_resample" -> 1, // mx scalar agg over the checkpointed
                               // fit; the gate is a broadcast join
    "q76_reachability" -> 1, // recursion over the checkpointed edge
                             // list; one final per-seed agg
    "m12_wav_decode" -> 0, // typed encode→decode pass, no shuffle
    "m14_wav_resample" -> 0, // typed decode→resample pass, no shuffle
    "s30_hier_graph_search" -> 0, // both walk stages are checkpointed
                                  // rounds (s22's contract); final plan
                                  // is the last TakeOrdered only
    "t33_sequence_packing" -> 1, // the per-partition window over the
                                 // checkpointed range layout (the range
                                 // exchange lives behind the checkpoint)
    "t34_pack_manifest" -> 2, // t33's window + one seq_id-keyed agg
    "t35_temperature_mix" -> 3, // z/budget scalar aggs over the
                                // checkpointed totals + the final
                                // source-keyed agg; rate table rides
                                // broadcasts (3 here)
    "s31_batch_hier_search" -> 1, // post-checkpoint plan: the one final
                                  // per-query rank-window cut (s23's)
    "m16_zero_crossings" -> 0, // typed decode→count pass, no shuffle
    "s32_hier_recall" -> 0, // both 10-row lists ride broadcasts; the
                            // walk lives behind its checkpoints
    "t36_bpe_fertility" -> 1, // projection encode + one lang agg; the
                              // doc_id→lang side rides a broadcast
    "s33_quant_error" -> 3, // calibration dim-agg + bounds collect +
                            // the final dim-keyed error agg
    "t38_unigram_train" -> 0, // the fit's rounds are checkpointed; the
                              // returned vocab frame is its checkpoint
    "t39_unigram_fertility" -> 1, // occurrences broadcast-join the
                                  // checkpointed encoded word table;
                                  // one lang-keyed agg
    "q77_time_travel" -> 1, // two committed-snapshot scans union into
                            // one grouped agg; the rewrite's jobs live
                            // outside the returned plan
    "q78_versioned_merge" -> 1, // same shape; the merge's broadcast
                                // anti join happens in the commit job
    "q79_version_diff" -> 3, // snapshot-vs-snapshot full outer join
                             // (2 key exchanges under SMJ) + op agg
    "s34_ann_compaction" -> 4, // assignment derivation + before/after
                               // cluster aggs; the tombstone mark,
                               // flag table and report join ride
                               // broadcasts — all index-sized, the
                               // corpus never exchanges
    "s35_maxsim_rerank" -> 4, // RRF candidate tiers + the chunk-token
                              // MaxSim agg; query side is broadcast
    "t37_quality_train" -> 1, // gradient rounds are checkpointed; the
                              // output is the bucket-weight agg
    "q80_expectations" -> 4, // rule-count agg over the checkpointed
                             // quarantine (+tiny rule-list join) and
                             // two scalar count aggs; the gate itself
                             // is a shuffle-free projection
    "q81_partitioned_merge" -> 1, // two manifest-resolved version scans
                                  // union into one grouped agg; the
                                  // merge's broadcast anti join and the
                                  // touched-partition rewrite live in
                                  // the commit jobs, untouched
                                  // partitions never scanned
    "q82_stats_skipping" -> 1, // pruned-file scan + residual filter
                               // into one grouped agg; the stats probe
                               // is a file-count-sized driver read
    "q83_commit_history" -> 0, // a #versions-sized local relation of
                               // parsed sidecars — no exchange, no
                               // data scan at all
    "q84_two_level_skipping" -> 1, // partition+stats-pruned file scan
                                   // into one grouped agg
    "q85_deletion_vectors" -> 1, // two version scans (v1's DV anti
                                 // join rides a broadcast) into one
                                 // grouped agg; the DV write itself
                                 // lives in the merge job
    "q86_dv_growth_guard" -> 1, // three version scans (the DV route's
                                // anti join rides a broadcast) into
                                // one grouped agg; both merge routings
                                // live in the commit jobs
    "q87_change_feed" -> 5, // two per-commit diff slices (full outer
                            // join on (part, key): ≤2 key exchanges
                            // each under SMJ) + the final (version,
                            // op) agg; the v0 initial-load slice is a
                            // plain scan, untouched partitions never
                            // read
    "q88_restore" -> 1, // three manifest-resolved version scans union
                        // into one grouped agg; the restore itself is
                        // pure commit-log metadata — no job at all
    "q89_bloom_point_lookup" -> 0, // bloom-pruned point-lookup scans
                                   // union with residual filters — no
                                   // agg, no join, no exchange; the
                                   // sidecar probe is a file-count-
                                   // sized driver read
    "q90_zorder_skipping" -> 1, // z-pruned file-list scan + one
                                // priority-key agg shuffle; the z-value
                                // clustering shuffle lives in the commit
                                // job, not the probe
    "q91_optimize_zorder" -> 1, // same probe shape as q90; the
                                // optimize rewrite's clustering shuffle
                                // is a maintenance job, not the probe
    "q92_time_travel_ts" -> 1, // three ts-resolved version scans union
                               // into one grouped agg; versionAt is a
                               // #versions driver-side header read, the
                               // merge's joins live in the commit jobs
    "q93_generated_partitions" -> 1, // month-pruned partition scan +
                                     // residual into one grouped agg;
                                     // the range→partition mapping is
                                     // driver-side manifest filtering,
                                     // the month clustering shuffle
                                     // lives in the commit job
    "q94_shallow_clone" -> 1, // three version scans (source, cloned
                              // v0 resolving source stores, diverged
                              // head) union into one grouped agg; the
                              // clone itself is pure manifest metadata,
                              // the COW rewrite lives in the merge job
    "q95_join_pruned" -> 1, // dim-pruned 5-of-25-partition scan +
                            // broadcast dim join into one grouped agg;
                            // the dim's distinct keys resolve in a
                            // dim-sized driver job, the fan-out write
                            // lives in the commit job
    "q96_check_constraints" -> 1, // one constrained-merged version scan
                                  // into one grouped agg; enforcement
                                  // is a batch-sized limit-1 probe in
                                  // the merge job, the catalog a
                                  // 2-line driver-side file read
    "q97_expire_partitions" -> 1, // retained-partition scan into one
                                  // grouped agg; the expire is a pure
                                  // manifest commit (no job), the month
                                  // clustering shuffle lives in the
                                  // commit job
    "q98_schema_evolution" -> 1, // one footer-merged evolved-version
                                 // scan into one grouped agg; the
                                 // widening union + anti join live in
                                 // the merge job
    "q99_overwrite_partitions" -> 1, // one manifest-resolved version
                                     // scan into one grouped agg; the
                                     // overwrite is one partition write
                                     // + manifest delta in the commit
                                     // job, untouched partitions pure
                                     // metadata carry-over
    "q100_column_mapping" -> 1, // one normalized (coalesce-projected)
                                // version scan into one grouped agg;
                                // rename and drop are driver-side
                                // catalog writes, no job at all
    "q101_mor_upserts" -> 1, // one delta read (base anti-joins the
                             // broadcast DV, append unions in — no
                             // data shuffle) into one grouped agg;
                             // both merges' work lives in the
                             // batch-sized delta jobs
    "q116_sql_join_pruned" -> 1, // runtime-pruned 5-of-25-partition
                                 // scan + broadcast dim join into one
                                 // grouped agg; the dim's key
                                 // resolution is a driver-side collect
                                 // of the CACHED dim, not a shuffle
    "q119_sql_levels_join_pruned" -> 1, // level-epoch runtime-pruned
                                        // combination scan + broadcast
                                        // VALUES dim into one grouped
                                        // agg
    "q120_sql_merge_schema_evolution" -> 1, // one footer-merged
                                            // evolved-version scan into
                                            // one grouped agg; the
                                            // evolving MERGE's rewrite
                                            // lives in the commit job
    "q121_sql_two_dim_pruned" -> 1, // TWO-axis runtime-pruned
                                    // combination scan + two broadcast
                                    // VALUES dims into one grouped agg;
                                    // both dims' key resolutions are
                                    // driver-side collects of local
                                    // relations, not shuffles
    "s36_feed_ivf_maintain" -> 1) // the final per-cluster index agg;
                                  // every feed drain / index merge
                                  // lives in the maintain jobs
                                  // (delta-sized, broadcast-shaped)
    // s22 is not budgeted here: its per-round state is localCheckpointed,
    // so the final plan is only the last TakeOrdered — the walk's shuffle
    // story is asserted structurally (broadcast frontier joins) instead.

  test("audited queries stay inside their shuffle budgets") {
    val failures = budgets.flatMap { case (name, budget) =>
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect()
      val plan = df.queryExecution.executedPlan
      val shuffles = collect(plan) { case e: ShuffleExchangeLike => e }.size
      val broadcasts = collect(plan) { case e: BroadcastExchangeLike => e }.size
      if (shuffles > budget)
        Some(s"$name: $shuffles shuffles > budget $budget ($broadcasts broadcasts)")
      else None
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
