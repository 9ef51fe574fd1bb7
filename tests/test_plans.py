"""Physical-plan contracts: the scale properties each query claims
(pushdown, broadcast, semi join, partial top-k) must appear in the
actual plan Catalyst produces — this is the 100 TB story, asserted."""

from __future__ import annotations

import pytest

from big_data_bowl_2026_analytics_spark.plans import all_queries
from big_data_bowl_2026_analytics_spark.plans.explain import (
    assert_in_plan,
    assert_not_in_plan,
    physical_plan,
)

SF = "/root/testdata/sf0.001"


def _q(spark, name):
    return all_queries()[name].builder(spark, SF)


def test_q01_filter_and_columns_push_to_scan(spark):
    df = _q(spark, "q01_pricing_summary")
    plan = physical_plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: only the 6 needed columns reach the scan
    assert "l_partkey" not in plan
    assert "HashAggregate" in plan and "Exchange" in plan


def test_q02_broadcasts_both_dims_and_takeordered(spark):
    df = _q(spark, "q02_top_revenue_orders")
    plan = physical_plan(df)
    assert plan.count(") BroadcastHashJoin") == 2  # lineitem never shuffles
    assert "TakeOrderedAndProject" in plan  # no global sort for top-k
    assert "SortMergeJoin" not in plan


def test_q04_is_left_semi(spark):
    assert_in_plan(_q(spark, "q04_exists_semi_join"), "LeftSemi")


def test_q05_is_left_anti(spark):
    assert_in_plan(_q(spark, "q05_not_exists_anti_join"), "LeftAnti")


def test_q07_partial_topk_before_shuffle(spark):
    # WindowGroupLimit prunes to rank<=1 per group map-side
    assert_in_plan(_q(spark, "q07_argmin_per_group"), "WindowGroupLimit")


def test_q15_topk_no_global_sort(spark):
    df = _q(spark, "q15_multikey_topk")
    assert_in_plan(df, "TakeOrderedAndProject")
    assert_not_in_plan(df, "Exchange rangepartitioning")


def test_q30_dedup_shuffles_hash_not_text(spark):
    # the groupBy key is md5(text): the exchange carries a 32-char hash
    plan = physical_plan(_q(spark, "q30_dedup_exact"))
    assert "md5" in plan and "hashpartitioning(text_hash" in plan


def test_q40_no_explode_in_vector_math(spark):
    # zip_with/aggregate keeps the dot product inside one projection;
    # a Generate (explode) node would mean 64x row blowup
    assert_not_in_plan(_q(spark, "q40_cosine_topk_bruteforce"), "Generate")


def test_q50_uses_arrow_batched_udf(spark):
    assert_in_plan(_q(spark, "q50_model_scoring_udf"), "ArrowEvalPython")


def test_broadcast_hints_respected_in_q03(spark):
    plan = physical_plan(_q(spark, "q03_region_nation_revenue"))
    assert plan.count(") BroadcastHashJoin") >= 2  # nation & region map-side


def test_q76_group_sample_partial_topk(spark):
    # rank<=k plans as WindowGroupLimit: tasks keep 5 rows per group
    # before the shuffle merge — no full-group materialization
    assert_in_plan(_q(spark, "q76_group_sample"), "WindowGroupLimit")


def test_q75_histogram_broadcasts_stats_row(spark):
    # the 1-row (min,max) frame broadcasts onto the fact scan; binning
    # never shuffles the facts on a join key
    plan = physical_plan(_q(spark, "q75_histogram_bins"))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q73_profile_single_scan_single_agg_row(spark):
    # one pass over lineitem: exactly one scan, partial+final agg to a
    # single row; the unpivot is a projection over that row (Generate
    # over a 1-row frame, not over the facts)
    plan = physical_plan(_q(spark, "q73_column_profile"))
    assert plan.count("Location: InMemoryFileIndex") == 1  # one scan only
    assert "HashAggregate" in plan


def test_q77_zorder_key_is_codegen_integer_math(spark):
    # the Morton key is pure JVM bit math inside WholeStageCodegen —
    # no Python, no UDF, no expand
    plan = physical_plan(_q(spark, "q77_zorder_layout"))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "shiftleft" in plan  # the key is a JVM projection expression
    assert plan.count("Location: InMemoryFileIndex") == 1


def test_q70_gap_fill_single_shuffle_key(spark):
    # grid generation, the fill join, and the LOCF window all hash on
    # user_id — no exchange on any other key appears
    plan = physical_plan(_q(spark, "q70_gap_fill_locf"))
    import re
    parts = re.findall(r"hashpartitioning\(([a-z_#0-9]+)", plan)
    assert parts and all(p.startswith("user_id") for p in parts)


def test_q78_arrays_no_explode_no_python(spark):
    # higher-order array exprs evaluate in place: no Generate row
    # blowup, no Python workers, map-only (no Exchange at all)
    plan = physical_plan(_q(spark, "q78_array_functions"))
    assert "Generate" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


def test_q79_grouping_sets_one_scan_expand(spark):
    plan = physical_plan(_q(spark, "q79_grouping_sets"))
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert "Expand" in plan and "HashAggregate" in plan


def test_q81_subquery_decorrelates_to_join(spark):
    # Catalyst rewrites the correlated scalar subquery into an
    # aggregate + equi-join; no per-row nested-loop execution survives
    plan = physical_plan(_q(spark, "q81_correlated_scalar_subquery"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashAggregate" in plan


def test_q97_pii_redaction_is_map_only(spark):
    # regex detect/redact is pure codegen string work: no shuffle, no
    # Python worker anywhere in the plan
    plan = physical_plan(_q(spark, "q97_pii_redaction"))
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_q99_salted_join_joins_on_key_and_salt(spark):
    # the physical join key must include the salt (that IS the skew
    # spread), and the hint must keep the dim off the broadcast path
    plan = physical_plan(_q(spark, "q99_salted_join"))
    assert "_salt" in plan
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_q100_forward_asof_single_key_shuffle(spark):
    # union + one window on user_id: exactly one exchange hash-
    # partitioned on the key, no join node at all
    plan = physical_plan(_q(spark, "q100_asof_forward"))
    assert plan.count("hashpartitioning(") == 1  # exactly one shuffle
    assert "hashpartitioning(user_id" in plan
    assert "Join" not in plan


def test_runtime_bloom_filter_injects_on_selective_join(spark):
    # The 100 TB scan-pruning story for selective fact⋈dim joins the
    # planner can't broadcast: Catalyst's InjectRuntimeFilter plants a
    # bloom-filter semi-filter on the probe side, so fact rows that
    # can't match are dropped at the scan instead of shuffled. The
    # size thresholds exist for small data; production defaults
    # (creation side ≤ 10MB, probe scan ≥ 10GB) are exactly the 100 TB
    # shape, so the local test only lowers the probe floor.
    import pyspark.sql.functions as F

    tuned = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in tuned}
    try:
        for k, v in tuned.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
            "l_orderkey", "l_quantity"
        )
        orders = (
            spark.read.parquet(f"{SF}/orders.parquet")
            .where(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey", "o_orderpriority")
        )
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderpriority"
        ).count()
        plan = physical_plan(joined)
        assert "might_contain" in plan  # bloom probe reached the scan side
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_q102_ewm_sixteen_lags_one_window(spark):
    # all 16 lag terms share one window spec: a single Window node
    # over a single key shuffle — same plan cost as a running sum
    import re

    plan = physical_plan(_q(spark, "q102_ewm_decay"))
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1
    assert plan.count("hashpartitioning(") == 1


def test_q104_bernoulli_sample_no_sort_no_topk(spark):
    # membership is a map-side filter against a broadcast one-row
    # total — no TakeOrdered/global sort structure at all.
    df = _q(spark, "q104_weighted_bernoulli_sample")
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" in plan  # one-row total broadcast
    assert "TakeOrderedAndProject" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_q105_interval_join_is_equijoin_not_nested_loop(spark):
    # the inequality predicate must NOT be the join condition: the
    # bucket decomposition turns it into a shuffleable equi-join.
    df = _q(spark, "q105_interval_overlap_join")
    plan = physical_plan(df)
    # equi-join on (user, bucket): hash-join family (broadcast at toy
    # SF, shuffle hash/sort-merge once the sides grow) — never the
    # nested-loop plan the raw inequality predicate would force.
    assert (
        "BroadcastHashJoin" in plan
        or "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q106_scd2_single_exchange_for_both_windows(spark):
    # change-detect window and validity window share (user_id; ts,
    # event_id) — Catalyst must reuse one hashpartitioning exchange.
    df = _q(spark, "q106_scd2_history")
    plan = physical_plan(df)
    assert plan.count("Arguments: hashpartitioning(user_id") == 1


def test_q107_bpe_pairs_no_join_partial_agg(spark):
    # pair generation is slice+zip+explode (map-side), never a
    # positional self-join; the count shuffle is partially aggregated.
    df = _q(spark, "q107_bpe_pair_counts")
    plan = physical_plan(df)
    assert "Join" not in plan
    assert "partial_count" in plan
    assert "TakeOrderedAndProject" in plan


def test_q108_vocab_broadcasts_back(spark):
    # the induced top-100 vocab must broadcast against the token
    # stream — a second full-corpus shuffle would be the scale bug.
    df = _q(spark, "q108_vocab_oov_rate")
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # vocab top-k, not a sort


def test_q109_heavy_hitters_broadcast_total(spark):
    df = _q(spark, "q109_heavy_hitters")
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" in plan  # one-row total
    assert "partial_count" in plan


def test_q52_metrics_native_scoring_no_python(spark):
    # the metric queries score the linear model with JVM column math;
    # no Python/Arrow node should appear anywhere in their plans.
    for name in ("q51_calibration_bins", "q52_binary_metrics"):
        plan = physical_plan(_q(spark, name))
        assert "ArrowEvalPython" not in plan
        assert "BatchEvalPython" not in plan


def test_q110_rolling_regression_single_window_shuffle(spark):
    # five running sums share one frame; rebase + frame sort hash on
    # user_id only — no join, no second shuffle key.
    df = _q(spark, "q110_rolling_regression")
    plan = physical_plan(df)
    import re

    parts = re.findall(r"hashpartitioning\(([a-z_#0-9]+)", plan)
    assert parts and all(p.startswith("user_id") for p in parts)
    assert "Join" not in plan


def test_q111_minhash_error_no_cartesian(spark):
    # pair generation stays blocked (token equi-join); signature joins
    # are equi-joins on the pair keys.
    df = _q(spark, "q111_minhash_estimate_error")
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q112_q113_broadcast_stats_back(spark):
    # per-group cut points / medians are tiny aggregates that must
    # broadcast back onto the fact scan — a SortMergeJoin of the facts
    # against a 3-row frame would be the scale bug.
    for name in ("q112_winsorize", "q113_robust_zscore"):
        plan = physical_plan(_q(spark, name))
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


def test_q114_prefix_filter_no_cartesian(spark):
    # candidate generation and verification are all equi-joins; the
    # naive inequality/cross structure must never appear.
    df = _q(spark, "q114_prefix_filter_jaccard")
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # every window is partitioned (by doc) — a global vocabulary rank
    # would plan an Exchange SinglePartition funnel (the 100 TB killer
    # this operator had in round 3).
    assert "SinglePartition" not in plan


def test_q115_expectation_audit_single_scan_broadcast_fk(spark):
    # N expectations share one lineitem scan; the FK probe joins
    # against broadcast DISTINCT parent keys, never the parent rows.
    plan = physical_plan(_q(spark, "q115_expectation_audit"))
    assert plan.count("Location: InMemoryFileIndex") == 2  # lineitem + orders
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q116_blocking_is_equijoin(spark):
    # length-bucket blocking: the candidate join must be a hash
    # equi-join on (lang, bucket) — never a cartesian/inequality plan.
    plan = physical_plan(_q(spark, "q116_levenshtein_neardup"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "levenshtein" in plan  # distance runs JVM-side, post-filter


def test_q117_no_cartesian_beyond_one_row_totals(spark):
    # vocab-sized marginal joins are equi-joins; the only nested-loop
    # joins are the two one-row totals broadcasts.
    plan = physical_plan(_q(spark, "q117_bigram_pmi"))
    assert "CartesianProduct" not in plan
    assert plan.count(") BroadcastNestedLoopJoin") <= 2


def test_q118_single_window_pass(spark):
    import re

    # one scan, one lang-partitioned window, map-side slot explode —
    # no per-gap union re-scans, no global sort.
    plan = physical_plan(_q(spark, "q118_sorted_neighborhood_pairs"))
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "SinglePartition" not in plan


def test_q119_two_level_rank_no_key_sized_funnel(spark):
    import re

    # the only SinglePartition stage is the <=64-row bucket-offset
    # window; per-key ranking stays partitioned by bucket.
    plan = physical_plan(_q(spark, "q119_key_skew_gini"))
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert plan.count("SinglePartition") == 1
    windows = re.findall(r"\(\d+\) Window", plan)
    assert len(windows) == 2  # in-bucket rank + bucket offsets


def test_q124_lsh_blocked_levenshtein_equijoin(spark):
    # composed (band, bucket, length-bucket) blocking stays a hash
    # equi-join; no cartesian fallback, DP runs JVM-side post-filter.
    plan = physical_plan(_q(spark, "q124_lsh_blocked_levenshtein"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "levenshtein" in plan
    assert "SinglePartition" not in plan


def test_q125_pagerank_iterations_equijoin(spark):
    # every iteration is an equi-join + groupBy; the only nested-loop
    # joins are the one-row node-count broadcasts, and no iteration
    # funnels ranks through a single partition.
    plan = physical_plan(_q(spark, "q125_pagerank"))
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan


def test_q126_zorder_single_scan_no_funnel(spark):
    # one lineitem scan + a one-row stats broadcast; the interleave is
    # codegen integer math (no Python), chunk aggs stay partitioned.
    plan = physical_plan(_q(spark, "q126_zorder_layout_audit"))
    assert plan.count("Location: InMemoryFileIndex") <= 2  # fact + stats scan
    assert "CartesianProduct" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_q127_hash_split_mapside_assignment(spark):
    # split assignment is codegen string/int math before one small
    # aggregation: no joins, no Python, one scan.
    plan = physical_plan(_q(spark, "q127_hash_split_assignment"))
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert "Join" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_q128_sample_filter_reaches_scan_stage(spark):
    # membership is a map-side filter: zero exchanges, zero joins.
    import re

    plan = physical_plan(_q(spark, "q128_stratified_hash_sample"))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0
    assert "Join" not in plan


def test_q129_chi_square_marginals_from_cells(spark):
    # marginals derive from the tiny cell frame — exactly ONE scan of
    # documents feeds the whole statistic.
    plan = physical_plan(_q(spark, "q129_chi_square_homogeneity"))
    assert plan.count("Location: InMemoryFileIndex") <= 1
    assert "CartesianProduct" not in plan


def test_q131_forecast_never_materializes_join(spark):
    # the whole point: predict Σc² from ONE count pass — no join node
    # anywhere in the plan.
    plan = physical_plan(_q(spark, "q131_join_cardinality_forecast"))
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert "Join" not in plan


def test_q132_bloom_probes_are_broadcast(spark):
    # the <=4096-row bit set broadcasts into both membership probes;
    # probing never shuffles the fact side.
    plan = physical_plan(_q(spark, "q132_bloom_filter_audit"))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q144_mobility_no_customer_sized_funnel(spark):
    import re

    # both period rankings use the bucketed two-level rank: the only
    # SinglePartition windows are the <=64-row bucket-offset scans.
    plan = physical_plan(_q(spark, "q144_spend_quintile_mobility"))
    sp = plan.count("SinglePartition")
    windows = re.findall(r"\(\d+\) Window", plan)
    assert len(windows) >= 2  # two in-bucket ranking windows exist
    assert sp <= 3  # two bucket-offset scans + the one-row n broadcast


def test_q123_triangle_all_equijoins(spark):
    # wedge generation and closure are equi-joins; the only nested-
    # loop joins are the one-row stat-combination broadcasts.
    plan = physical_plan(_q(spark, "q123_triangle_count"))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan or "Exchange rangepartitioning" not in plan


def test_q151_cms_cells_broadcast_and_bounded_topk(spark):
    # the 1024-cell grid broadcasts back to the vocabulary; the final
    # top-20 is a partial top-k, not a global sort.
    plan = physical_plan(_q(spark, "q151_count_min_sketch_audit"))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_q153_ht_sampling_is_mapside_single_shuffle(spark):
    # marking + inclusion are projections; only the stratum groupBy
    # shuffles.
    plan = physical_plan(_q(spark, "q153_horvitz_thompson_audit"))
    assert plan.count("Exchange (") == 1  # tree nodes only
    assert "Join" not in plan


def test_q154_span_windows_partition_by_doc(spark):
    # interval-merge windows run per doc_id — never a global funnel —
    # and the benchmark shingle set is broadcast.
    plan = physical_plan(_q(spark, "q154_decontamination_span_removal"))
    assert "BroadcastHashJoin" in plan
    import re

    for w in re.findall(r"Window .*partitionBy.*|Arguments: .*windowspecdefinition[^\n]*", plan):
        assert "doc_id" in w or "windowspecdefinition" not in w
    assert "SinglePartition" not in plan


def test_q155_m4_reuses_one_bucket_shuffle(spark):
    # both direction windows and the final groupBy key on
    # (event_type, bucket): one exchange feeds all three.
    plan = physical_plan(_q(spark, "q155_m4_downsampling"))
    assert plan.count("Exchange (") == 1  # tree nodes only
    assert "SinglePartition" not in plan


def test_q156_rrf_queries_broadcast_no_global_window(spark):
    plan = physical_plan(_q(spark, "q156_reciprocal_rank_fusion"))
    assert "BroadcastNestedLoopJoin" in plan  # tiny query side broadcast
    assert "SinglePartition" not in plan  # rankers partition by query_id


def test_q157_diversity_cap_prunes_before_global_rank(spark):
    plan = physical_plan(_q(spark, "q157_diversity_capped_topk"))
    assert "BroadcastNestedLoopJoin" in plan
    assert "SinglePartition" not in plan


def test_q159_lateness_watermark_is_per_source(spark):
    # the running max partitions by event_type: no global ordering.
    plan = physical_plan(_q(spark, "q159_out_of_order_audit"))
    assert "SinglePartition" not in plan


def test_q160_mi_marginals_derive_from_cells(spark):
    # marginal/total frames join back broadcast; the corpus is
    # scanned once into the binned projection.
    plan = physical_plan(_q(spark, "q160_mutual_information_screen"))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_q161_centroid_pairs_never_touch_vectors(spark):
    # the pairwise join keys on the 64-row dimension index of the
    # centroid frame; label sizes broadcast.
    plan = physical_plan(_q(spark, "q161_label_centroid_separation"))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q162_dedup_audit_two_stacked_aggregations(spark):
    plan = physical_plan(_q(spark, "q162_event_dedup_audit"))
    assert plan.count("Exchange (") == 2  # tree nodes only


def test_q163_zipf_top100_is_partial_topk(spark):
    # the OLS input comes from TakeOrdered, so the unpartitioned rank
    # window is a bounded 100-row funnel.
    plan = physical_plan(_q(spark, "q163_zipf_law_audit"))
    assert "TakeOrderedAndProject" in plan


def test_q164_matrix_join_on_collapsed_fingerprints(spark):
    # the pair join keys on the (fingerprint, source) frame, and the
    # corpus never joins itself row-to-row.
    plan = physical_plan(_q(spark, "q164_cross_source_duplication"))
    assert "CartesianProduct" not in plan
    # the checkpointed (fingerprint, source) frame is the join input
    assert "Scan ExistingRDD" in plan


def test_q165_ks_windows_run_on_domain_grid(spark):
    # the per-source CDF window partitions by source; the global CDF
    # runs on the value histogram (bounded), never the doc stream.
    plan = physical_plan(_q(spark, "q165_ks_drift_per_source"))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_q166_small_dims_broadcast(spark):
    # nation-parent checks broadcast; no orphan check degenerates to
    # a cartesian product.
    plan = physical_plan(_q(spark, "q166_referential_integrity"))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q167_stages_key_on_user(spark):
    plan = physical_plan(_q(spark, "q167_funnel_latency"))
    assert "CartesianProduct" not in plan


def test_q168_centroids_broadcast_argmin_partial(spark):
    # centroid side broadcasts; the per-vector argmin partially
    # aggregates before its shuffle.
    plan = physical_plan(_q(spark, "q168_ivf_balance_audit"))
    assert "BroadcastNestedLoopJoin" in plan
    assert "partial_min" in plan or "HashAggregate" in plan


def test_q169_single_mapside_fold(spark):
    # one scan, no joins: the norm fold runs map-side into a global
    # aggregate.
    plan = physical_plan(_q(spark, "q169_embedding_quality_audit"))
    assert "Join" not in plan
    assert plan.count("Exchange (") == 1


def test_q170_pure_groupby_no_joins(spark):
    plan = physical_plan(_q(spark, "q170_encoding_audit"))
    assert "Join" not in plan
    assert plan.count("Exchange (") == 1


def test_q171_fact_join_exchanges_line_up(spark):
    # lineitem aggregate and the order join both key on the order key.
    plan = physical_plan(_q(spark, "q171_order_total_consistency"))
    assert "CartesianProduct" not in plan


def test_q172_coverage_uses_bucketed_rank_no_vocab_funnel(spark):
    # the only SinglePartition windows are the <=64-row bucket-offset
    # scan — never the vocabulary itself (the q114 lesson).
    plan = physical_plan(_q(spark, "q172_vocab_coverage_curve"))
    assert plan.count("SinglePartition") <= 2


def test_q173_lag_is_equijoin_on_series_grain(spark):
    plan = physical_plan(_q(spark, "q173_seasonal_naive_backtest"))
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan


def test_q174_psi_scoring_stays_jvm(spark):
    # native scoring: no Python/Arrow nodes anywhere in the plan.
    plan = physical_plan(_q(spark, "q174_psi_score_stability"))
    assert "Python" not in plan and "Arrow" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # 10-row totals frame


def test_q175_apriori_prunes_before_pair_join(spark):
    # pair generation joins the FREQUENT-item frame with itself — the
    # support filter sits below the join in the plan.
    plan = physical_plan(_q(spark, "q175_association_rules"))
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_q176_transform_avoids_global_rank_funnel(spark):
    # bucketed two-level rank: no orders-sized SinglePartition window.
    plan = physical_plan(_q(spark, "q176_quantile_transform"))
    assert plan.count("SinglePartition") <= 2


def test_q177_welch_single_pass_moment_cells(spark):
    # assignment is map-side hashing; one shuffle to moment cells,
    # one to the per-type pivot — no join anywhere.
    plan = physical_plan(_q(spark, "q177_ab_test_welch"))
    assert "Join" not in plan
    assert plan.count("Exchange (") == 2


def test_q178_recall_truth_via_shared_shingles_not_allpairs(spark):
    # ground truth enumerates pairs through the shingle equi-join;
    # no cartesian anywhere (the one-row totals frame broadcasts).
    plan = physical_plan(_q(spark, "q178_lsh_recall_audit"))
    assert "CartesianProduct" not in plan


def test_q180_attribution_asof_is_joinless(spark):
    # the as-of composition is union + ordered window on user_id —
    # the only join nodes are none (SMJ/BHJ absent).
    plan = physical_plan(_q(spark, "q180_last_touch_attribution"))
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert "SinglePartition" not in plan


def test_q181_sketch_pairs_never_touch_users(spark):
    # segment sketches broadcast into the pair frame; the only
    # user-sized work is the exact-grading join.
    plan = physical_plan(_q(spark, "q181_hll_intersection_estimate"))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_q182_pit_lookup_is_user_partitioned_equijoin(spark):
    # the interval predicate evaluates inside a user-keyed join;
    # nothing degenerates to a cross product or a global window.
    plan = physical_plan(_q(spark, "q182_point_in_time_join"))
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan


def test_q183_kappa_single_aggregate_no_python(spark):
    plan = physical_plan(_q(spark, "q183_labeler_agreement_kappa"))
    assert "Python" not in plan and "Arrow" not in plan
    assert "Join" not in plan


def test_q184_conformal_rank_on_calibration_slice_only(spark):
    # the order-statistic window runs on the calibration half of
    # positives (bounded slice); scoring stays JVM.
    plan = physical_plan(_q(spark, "q184_conformal_calibration"))
    assert "Python" not in plan and "Arrow" not in plan


def test_q185_leakage_joins_on_doc_keys(spark):
    plan = physical_plan(_q(spark, "q185_split_leakage_audit"))
    assert "CartesianProduct" not in plan


def test_q186_woe_ten_cell_reduction(spark):
    plan = physical_plan(_q(spark, "q186_woe_information_value"))
    assert "Python" not in plan and "Arrow" not in plan


def test_q187_anova_one_scan_moment_cells(spark):
    plan = physical_plan(_q(spark, "q187_anova_decomposition"))
    assert "Join" not in plan or "BroadcastNestedLoopJoin" in plan
    # the checkpointed cell frame feeds both branches: one file scan
    assert plan.count("Location: InMemoryFileIndex") <= 1


def test_q188_stump_grid_broadcast_collapses_mapside(spark):
    # the 9-threshold grid broadcasts; partial aggregation collapses
    # the expanded rows before the single shuffle.
    plan = physical_plan(_q(spark, "q188_decision_stump"))
    assert "BroadcastNestedLoopJoin" in plan
    assert "partial_count" in plan or "HashAggregate" in plan


def test_q189_ndcg_rankings_partition_by_query(spark):
    plan = physical_plan(_q(spark, "q189_ndcg_retrieval_audit"))
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_q190_flags_single_scan_broadcast_stats(spark):
    plan = physical_plan(_q(spark, "q190_outlier_method_agreement"))
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q191_cusum_partitioned_walk(spark):
    plan = physical_plan(_q(spark, "q191_cusum_control_chart"))
    assert "SinglePartition" not in plan


def test_q192_concentration_ranks_partition_by_nation(spark):
    plan = physical_plan(_q(spark, "q192_market_concentration"))
    assert "SinglePartition" not in plan


def test_q193_shares_single_fact_scan_dims_broadcast(spark):
    # the dim joins live below the checkpointed nation-grain frame;
    # the visible plan must still be broadcast-only.
    plan = physical_plan(_q(spark, "q193_hierarchical_shares"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q194_gof_two_stacked_integer_aggs(spark):
    plan = physical_plan(_q(spark, "q194_poisson_goodness_of_fit"))
    assert "Python" not in plan and "Arrow" not in plan


def test_q195_completeness_no_calendar_materialization(spark):
    plan = physical_plan(_q(spark, "q195_calendar_completeness"))
    assert "Join" not in plan
    assert plan.count("Exchange (") == 2


def test_q196_proximity_via_lag_not_selfjoin(spark):
    plan = physical_plan(_q(spark, "q196_near_duplicate_transactions"))
    assert "Join" not in plan
    assert "SinglePartition" not in plan


def test_q197_fit_on_age_grain(spark):
    plan = physical_plan(_q(spark, "q197_retention_half_life"))
    assert "CartesianProduct" not in plan


def test_q198_lag_partitions_by_series(spark):
    plan = physical_plan(_q(spark, "q198_period_over_period"))
    assert "SinglePartition" not in plan
    assert "Join" not in plan


def test_q199_abc_no_part_sized_funnel(spark):
    # the running revenue sum uses the two-level bucketed form: only
    # the <=64-row bucket-offset scan is unpartitioned.
    plan = physical_plan(_q(spark, "q199_abc_classification"))
    assert plan.count("SinglePartition") <= 2


def test_q200_benford_is_one_scan_no_shuffle_join(spark):
    # digit histogram + one-row broadcast total: no sort-merge join,
    # no data-sized funnel (the 9-row final agg may be single-part).
    plan = physical_plan(_q(spark, "q200_benford_first_digit"))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q201_km_windows_on_histogram_grain(spark):
    # both ordered windows run on the lifetime histogram (calendar-
    # bounded), after the per-customer reduce; horizon is broadcast.
    plan = physical_plan(_q(spark, "q201_kaplan_meier"))
    assert "BroadcastNestedLoopJoin" in plan  # one-row horizon/total
    assert "SortMergeJoin" not in plan


def test_q203_acf_joins_on_day_grain(spark):
    # the lag dimension broadcasts; the day-number self-join is an
    # equi join on the daily aggregate, not on the fact table.
    plan = physical_plan(_q(spark, "q203_autocorrelation"))
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan or plan.count("SinglePartition") <= 1


def test_q204_ols_is_single_aggregation_pass(spark):
    # normal equations: one scan, one partial+final aggregate, zero
    # joins — the closed-form-regression contract.
    plan = physical_plan(_q(spark, "q204_normal_equation_ols"))
    assert "Join" not in plan
    # formatted mode prints each node twice (tree + detail): one scan.
    assert plan.count("(1) Scan parquet") == 1 and "(2) Scan" not in plan
    assert "partial_sum" in plan  # map-side combine before the funnel


def test_q205_linkage_blocks_are_equi_joins(spark):
    # candidate generation is an equi self-join on (lang, length
    # bucket); marginal frames broadcast.
    plan = physical_plan(_q(spark, "q205_record_linkage_scores"))
    assert "CartesianProduct" not in plan


def test_q206_grid_join_broadcasts_supplier_cells(spark):
    plan = physical_plan(_q(spark, "q206_grid_nearest_neighbor"))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan


def test_q207_bootstrap_never_materializes_resamples(spark):
    # replicate weights are map-side hash expressions over a broadcast
    # 32-row dimension; the only ordered window is the 32-row rank.
    plan = physical_plan(_q(spark, "q207_poisson_bootstrap_ci"))
    assert "SortMergeJoin" not in plan
    assert "Exchange RoundRobinPartitioning" not in plan


def test_q209_attribution_no_global_funnel(spark):
    # both session windows and the role window partition by user (or
    # user+session); the final agg is at the tiny report grain.
    plan = physical_plan(_q(spark, "q209_position_attribution"))
    assert "SinglePartition" not in plan


def test_q210_skyline_uses_bucketed_prefix_max(spark):
    # dominance via bucketed_cummax_prev: the only unpartitioned
    # window is the <=64-row log2-bucket summary.
    plan = physical_plan(_q(spark, "q210_skyline_pareto_front"))
    assert plan.count("SinglePartition") <= 1
    assert "CartesianProduct" not in plan


def test_q211_mann_whitney_windows_partition_by_pair(spark):
    # rank windows partition by the test pair; no global funnel.
    plan = physical_plan(_q(spark, "q211_mann_whitney_pairs"))
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_q212_bh_rank_runs_on_test_family_grain(spark):
    # the only unpartitioned stages are the m-row p-value rank and the
    # one-row k* reduction.
    plan = physical_plan(_q(spark, "q212_bh_fdr_correction"))
    # m-count agg, the m-row p-value rank, and the k* reduction — all
    # bounded by the hypothesis-family size, never the fact grain.
    assert plan.count("SinglePartition") <= 4
    assert "CartesianProduct" not in plan


def test_q213_seasonal_broadcasts_dow_means(spark):
    # daily-grain window (calendar-bounded); dow means and grand total
    # broadcast back; no shuffle join.
    plan = physical_plan(_q(spark, "q213_seasonal_decomposition"))
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_q214_theil_sen_pairs_on_month_grain(spark):
    # the pair join and median rank run on the month grain; the fact
    # scan feeds one aggregation.
    plan = physical_plan(_q(spark, "q214_theil_sen_trend"))
    assert plan.count("(1) Scan parquet") == 1 and "(2) Scan" not in plan


def test_q215_assortativity_single_aggregation_over_edges(spark):
    plan = physical_plan(_q(spark, "q215_degree_assortativity"))
    assert "CartesianProduct" not in plan
    assert "partial_sum" in plan  # map-side combine before the funnel


def test_q216_burstiness_single_user_shuffle(spark):
    # the lag window and the moments aggregate share the user_id
    # partitioning; no global funnel.
    plan = physical_plan(_q(spark, "q216_interevent_burstiness"))
    assert "SinglePartition" not in plan
    import re
    parts = re.findall(r"hashpartitioning\(([a-z_#0-9]+)", plan)
    assert parts and all(p.startswith("user_id") for p in parts)


def test_q217_rfm_uses_bucketed_ranks_no_customer_funnel(spark):
    # three quintile ranks all run through the two-level bucketed rank:
    # only the <=64-row bucket summaries are unpartitioned.
    plan = physical_plan(_q(spark, "q217_rfm_segmentation"))
    assert plan.count("SinglePartition") <= 4


def test_q218_knee_no_part_sized_funnel(spark):
    plan = physical_plan(_q(spark, "q218_pareto_knee"))
    assert plan.count("SinglePartition") <= 3


def test_q219_bpe_merge_windows_partition_by_doc(spark):
    # pair stream is map-side (slice+zip); the only windows partition
    # by doc/island; the top pair broadcasts.
    plan = physical_plan(_q(spark, "q219_bpe_merge_step"))
    assert "SinglePartition" not in plan or plan.count("SinglePartition") <= 3
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_q220_span_plan_no_global_funnel_beyond_totals(spark):
    plan = physical_plan(_q(spark, "q220_span_corruption_plan"))
    # islands window partitions by doc; only the two one-row totals
    # reduce to a single partition.
    assert plan.count("SinglePartition") <= 2


def test_q221_chunks_map_side_sequence_explode(spark):
    plan = physical_plan(_q(spark, "q221_sliding_window_chunks"))
    assert "Join" not in plan
    assert "Generate" in plan  # the sequence explode IS the plan
    assert "SinglePartition" not in plan


def test_q222_weights_on_label_grain(spark):
    plan = physical_plan(_q(spark, "q222_class_balance_weights"))
    assert "SortMergeJoin" not in plan


def test_q223_kfold_margins_broadcast(spark):
    plan = physical_plan(_q(spark, "q223_stratified_kfold_plan"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q224_batching_single_fact_scan(spark):
    # toks feeds both the bucket aggregate and the one-row global via
    # ReuseExchange/scan; no shuffle join anywhere.
    plan = physical_plan(_q(spark, "q224_length_bucketed_batching"))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q225_capture_recapture_map_side_only(spark):
    plan = physical_plan(_q(spark, "q225_capture_recapture"))
    assert "Join" not in plan
    assert "partial_sum" in plan


def test_q226_gains_rank_via_bucketed_form(spark):
    # the row-grain rank is the two-level bucketed rank; cumulative
    # windows run on the 10-row decile frame.
    plan = physical_plan(_q(spark, "q226_lift_gains_table"))
    assert plan.count("SinglePartition") <= 4
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q227_ks_on_distinct_score_grain(spark):
    # the ordered CDF window runs after the by-p reduce (bounded by
    # 1e6+1 distinct rounded probabilities); scoring stays JVM-native.
    plan = physical_plan(_q(spark, "q227_model_ks_separation"))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_q228_randomization_single_fact_pass(spark):
    # replicates are a broadcast 64-row dim over map-side hash bits;
    # no shuffle of the fact rows on any permutation key.
    plan = physical_plan(_q(spark, "q228_randomization_test"))
    assert "SortMergeJoin" not in plan
    assert "partial_sum" in plan


def test_q229_mann_kendall_on_month_grain(spark):
    # the month frame is checkpointed (reused by the pair join, the
    # tie histogram, and the count), so the plan scans the truncated
    # lineage, not the parquet, and no cartesian appears.
    plan = physical_plan(_q(spark, "q229_mann_kendall_trend"))
    assert "CartesianProduct" not in plan
    assert "Scan ExistingRDD" in plan


def test_q230_isotonic_is_grouped_arrow(spark):
    # PAV runs per slice behind FlatMapGroupsInPandas; the input is
    # reduced to the distinct-score grain before the Arrow boundary.
    plan = physical_plan(_q(spark, "q230_isotonic_calibration"))
    assert "FlatMapGroupsInPandas" in plan
    assert "HashAggregate" in plan  # the grain reduce precedes Arrow


def test_q231_sweep_has_no_boundary_sized_funnel(spark):
    # the within-hour running sum partitions by hour; the only
    # unpartitioned window is the hours-grain base (calendar-bounded).
    plan = physical_plan(_q(spark, "q231_peak_concurrency"))
    assert plan.count("SinglePartition") <= 1


def test_q232_price_index_checkpoints_sold_frame(spark):
    # the (year, part) frame feeds the base-year slice AND the index
    # join: lineage is truncated, no cartesian appears.
    plan = physical_plan(_q(spark, "q232_price_index"))
    assert "CartesianProduct" not in plan
    assert "Scan ExistingRDD" in plan


def test_q233_growth_accounting_single_customer_shuffle(spark):
    # lag/lead windows share the customer-key shuffle; month frames
    # broadcast back.
    plan = physical_plan(_q(spark, "q233_growth_accounting"))
    assert "SortMergeJoin" not in plan
    assert "SinglePartition" not in plan


def test_q234_confusion_broadcasts_margins(spark):
    plan = physical_plan(_q(spark, "q234_langid_confusion"))
    assert "SortMergeJoin" not in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q235_pinball_lag_is_series_grain_equi_join(spark):
    # the hourly frame is checkpointed and self-joined on exact
    # (series, hour) keys — no window over the raw event stream.
    plan = physical_plan(_q(spark, "q235_pinball_loss"))
    assert "Scan ExistingRDD" in plan
    assert "SinglePartition" not in plan


def test_q236_cf_topk_partial_before_shuffle(spark):
    # per-item top-3 plans as WindowGroupLimit (map-side prune).
    plan = physical_plan(_q(spark, "q236_item_item_cf"))
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_q237_density_clusters_no_cartesian(spark):
    # cell adjacency is a bounded non-equi join on the dense-cell
    # frame; components come from the star operator (checkpointed).
    plan = physical_plan(_q(spark, "q237_grid_density_clusters"))
    assert "CartesianProduct" not in plan


def test_q238_bm25_query_terms_are_partial_topk(spark):
    # the 8-term query set comes from orderBy().limit(12) — a
    # TakeOrderedAndProject, never a global rank over the vocabulary
    # (the q114 lesson); the final top-20 is the same shape.
    plan = physical_plan(_q(spark, "q238_bm25_retrieval"))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_q239_sequence_mining_partitions_by_user(spark):
    # existence test is events ⋈ bounded per-(user,type) first/last
    # frame on user_id — no cartesian, no single-partition funnel.
    # (the only SinglePartition is the bounded global countDistinct
    # reduce; the only nested-loop join is the one-row totals cross.)
    plan = physical_plan(_q(spark, "q239_sequence_pattern_mining"))
    assert "CartesianProduct" not in plan
    assert plan.count(") BroadcastNestedLoopJoin") == 1


def test_q240_brier_decomposition_two_level(spark):
    # bin partials shuffle once; the 10-row global reduce broadcasts
    # back — no global window anywhere.
    plan = physical_plan(_q(spark, "q240_brier_decomposition"))
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_q241_kcore_rank_selection_is_partial_topk(spark):
    # k comes from orderBy().limit(rank) — TakeOrderedAndProject, and
    # the per-round endpoint restrictions plan as left-semi joins.
    # (the per-round semi joins live behind the round checkpoints —
    # the q229 Scan-ExistingRDD effect — so only the outer shape shows.)
    plan = physical_plan(_q(spark, "q241_kcore_profile"))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_q242_jl_pairs_are_equi_join_no_python(spark):
    # the pair chain is an equi-join on vec_id+1; projection folds are
    # JVM higher-order functions — no Arrow/Python nodes anywhere.
    plan = physical_plan(_q(spark, "q242_jl_projection_distortion"))
    assert "CartesianProduct" not in plan
    for node in ("ArrowEvalPython", "BatchEvalPython", "FlatMapsInPandas"):
        assert node not in plan


def test_q243_fertility_single_bounded_grain(spark):
    # two aggregates on the bounded (lang, source) key; no windows.
    plan = physical_plan(_q(spark, "q243_tokenizer_fertility"))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_q244_paths_topk_and_single_user_shuffle_until_census(spark):
    # top-20 is a TakeOrderedAndProject on exact counts; the session
    # pipeline shares the user_id partitioning.
    plan = physical_plan(_q(spark, "q244_session_path_topk"))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_q245_loo_encoding_no_window_no_python(spark):
    # LOO rates come from the category aggregate joined back — never a
    # per-row window over the facts; everything stays JVM-side.
    plan = physical_plan(_q(spark, "q245_target_encoding_loo"))
    assert "Window" not in plan
    for node in ("ArrowEvalPython", "BatchEvalPython"):
        assert node not in plan


def test_q246_xcorr_lag_join_is_equi(spark):
    # the lag join must plan as a hash/merge equi-join on the hour key
    # (hb = ha + lag is an equality after projection), not nested-loop.
    plan = physical_plan(_q(spark, "q246_cross_correlation"))
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_q247_bootstrap_auc_partitions_prefix_by_replicate(spark):
    # the CDF prefix window is partitioned by replicate over the
    # bounded distinct-p grain — never a SinglePartition over facts;
    # the weighted fan-out is a one-row-frame broadcast cross.
    plan = physical_plan(_q(spark, "q247_bootstrap_auc_ci"))
    assert "CartesianProduct" not in plan


def test_q248_local_clustering_no_cartesian(spark):
    # wedge closure is all equi-joins bounded by orientation.
    plan = physical_plan(_q(spark, "q248_local_clustering"))
    assert "CartesianProduct" not in plan


def test_q249_simpson_single_scan_two_level(spark):
    # pooled sums reduce the GROUP frame — exactly one parquet scan.
    plan = physical_plan(_q(spark, "q249_simpson_paradox_screen"))
    assert plan.count("Location: InMemoryFileIndex") <= 1
    assert "CartesianProduct" not in plan


def test_q250_pq_codebook_broadcast_no_python(spark):
    # codebook assignment is a broadcast equi-join on the subspace
    # key; folds are JVM higher-order functions.
    plan = physical_plan(_q(spark, "q250_product_quantization"))
    assert ") BroadcastHashJoin" in plan
    for node in ("ArrowEvalPython", "BatchEvalPython"):
        assert node not in plan


def test_q251_adc_no_cartesian_beyond_broadcast_queries(spark):
    # the only nested-loop is the bounded 3-query broadcast cross;
    # ADC itself is an equi-join on (subspace, code).
    plan = physical_plan(_q(spark, "q251_pq_adc_recall"))
    assert "CartesianProduct" not in plan


def test_q252_two_level_percentile_no_global_data_window(spark):
    # per-user level is partitioned; the cross-user level runs through
    # bucketed_rank — SinglePartition only on the bounded bucket-offset
    # funnel, never the data grain.
    plan = physical_plan(_q(spark, "q252_hierarchical_percentiles"))
    assert "CartesianProduct" not in plan
    assert "_rk_bucket" in plan  # the two-level rank machinery is live


def test_q253_calendar_explode_on_months_not_facts(spark):
    # the Generate (explode) must run on the distinct-months frame;
    # the fact pass is one grouped aggregate.
    plan = physical_plan(_q(spark, "q253_business_day_normalization"))
    assert "Generate" in plan
    assert "CartesianProduct" not in plan


def test_q254_markov_chain_is_bounded_frame(spark):
    # all 12 iterations run on the |types|^2 scenario frame behind
    # checkpoints; the only data-sized work is the sessionized pass.
    plan = physical_plan(_q(spark, "q254_markov_attribution"))
    assert "CartesianProduct" not in plan


def test_q255_sparse_dot_no_dense_pivot(spark):
    # the dot product is a join on the type key — no PivotFirst/dense
    # vector node, no cartesian.
    plan = physical_plan(_q(spark, "q255_behavioral_user_similarity"))
    assert "CartesianProduct" not in plan
    assert "PivotFirst" not in plan


def test_q256_abc_uses_two_level_cumsum(spark):
    # the ABC running sum must be the bucketed machinery, never a
    # data-sized single-partition window over parts.
    plan = physical_plan(_q(spark, "q256_abc_xyz_matrix"))
    assert "_rk_bucket" in plan
    assert "CartesianProduct" not in plan


def test_q257_grid_search_single_pass_takeordered(spark):
    # 49 candidates broadcast into one fact pass; both argmins are
    # TakeOrderedAndProject over the 49-row loss frame.
    plan = physical_plan(_q(spark, "q257_grid_quantile_regression"))
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Location: InMemoryFileIndex") <= 1


def test_q258_conflict_audit_no_cartesian(spark):
    plan = physical_plan(_q(spark, "q258_dedup_cluster_conflicts"))
    assert "CartesianProduct" not in plan


def test_q259_kwic_per_term_cap_is_window_group_limit(spark):
    # the 5-docs-per-term cap prunes map-side; query terms broadcast.
    plan = physical_plan(_q(spark, "q259_kwic_snippets"))
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_q260_popularity_topk_and_semi_join(spark):
    # training restriction is a semi join; the top-10 is partial top-k.
    plan = physical_plan(_q(spark, "q260_popularity_recommender_backtest"))
    assert "TakeOrderedAndProject" in plan
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_q261_did_single_scan_four_cells(spark):
    # one grouped pass over orders; the span is a broadcast one-row.
    plan = physical_plan(_q(spark, "q261_difference_in_differences"))
    assert plan.count("Location: InMemoryFileIndex") <= 2  # orders + span
    assert "CartesianProduct" not in plan


def test_q262_ablation_runs_on_contingency_frame(spark):
    # ablated entropies come from margin-minus-cell algebra — no
    # per-source re-scan of documents.
    plan = physical_plan(_q(spark, "q262_source_ablation_diversity"))
    assert "CartesianProduct" not in plan


def test_q263_peaks_on_bounded_hour_grain(spark):
    # hourly pre-aggregation first; windows run on the hours frame.
    plan = physical_plan(_q(spark, "q263_peak_detection"))
    assert "CartesianProduct" not in plan


def test_q264_pvm_broadcasts_part_dim_single_fact_pass(spark):
    # both periods aggregate in one grouped pass (conditional sums);
    # part dim is a broadcast hash join.
    plan = physical_plan(_q(spark, "q264_price_volume_mix"))
    assert ") BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q265_dedup_savings_single_cluster_window(spark):
    plan = physical_plan(_q(spark, "q265_dedup_savings_report"))
    assert "CartesianProduct" not in plan


def test_q266_feature_assembly_one_agg_per_grain(spark):
    # one aggregate per source grain + one entity-grain join — no
    # window, no per-customer iteration.
    plan = physical_plan(_q(spark, "q266_customer_feature_assembly"))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_q267_1nn_is_bucket_bounded_equi_join(spark):
    # the self-join keys on the LSH bucket; 1-NN prunes map-side.
    plan = physical_plan(_q(spark, "q267_lsh_1nn_label_coherence"))
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_q268_friedman_runs_on_day_grain(spark):
    # windows partition by week over the bounded day spine.
    plan = physical_plan(_q(spark, "q268_friedman_dow_test"))
    assert "CartesianProduct" not in plan


def test_q269_sla_windows_partition_by_month(spark):
    plan = physical_plan(_q(spark, "q269_ship_sla_attainment"))
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_q270_deletion_cascade_no_cartesian(spark):
    plan = physical_plan(_q(spark, "q270_deletion_impact_report"))
    assert "CartesianProduct" not in plan


def test_q271_mrr_map_per_term_windows(spark):
    # rankings partition by query term; top-10 prunes map-side.
    plan = physical_plan(_q(spark, "q271_retrieval_mrr_map"))
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_q272_eb_shrinkage_on_path_grain(spark):
    # shrinkage algebra runs on the path frame + a broadcast prior.
    plan = physical_plan(_q(spark, "q272_eb_shrunk_path_conversion"))
    assert "CartesianProduct" not in plan


def test_q273_haar_single_grouped_pass(spark):
    # all four levels come from one groupBy over the (hour, level)
    # fan-out of the bounded dense spine — no iterative halving.
    plan = physical_plan(_q(spark, "q273_haar_energy_decomposition"))
    assert "CartesianProduct" not in plan


def test_q274_newsvendor_windows_partition_by_class(spark):
    plan = physical_plan(_q(spark, "q274_newsvendor_stock_levels"))
    assert "CartesianProduct" not in plan
    assert "_rk_bucket" in plan  # ABC reuses the two-level cumsum


def test_q275_uptime_partitions_by_feed(spark):
    plan = physical_plan(_q(spark, "q275_feed_uptime_nines"))
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_q276_ring_is_broadcast_fanout(spark):
    # the 128-point ring broadcasts; assignment is a conditional-min
    # aggregate, no sort/window over keys.
    plan = physical_plan(_q(spark, "q276_consistent_hash_balance"))
    assert "CartesianProduct" not in plan


def test_q277_heaps_cutoffs_use_two_level_rank(spark):
    # decile cutoffs come from bucketed_rank over the doc grain —
    # never a data-sized single-partition row_number (q114 lesson);
    # the machinery itself hides behind the cutoffs checkpoint (q229
    # Scan-ExistingRDD effect), so assert the shape, not the label.
    plan = physical_plan(_q(spark, "q277_heaps_law_growth"))
    assert "CartesianProduct" not in plan


def test_q278_lifecycle_single_part_grain_pass(spark):
    plan = physical_plan(_q(spark, "q278_sku_lifecycle_census"))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_q279_skew_forecast_two_level_rank(spark):
    plan = physical_plan(_q(spark, "q279_shuffle_skew_forecast"))
    assert "CartesianProduct" not in plan


def test_q280_sweep_reuses_one_pair_verification(spark):
    # the threshold fan-out joins the checkpointed pair frame — the
    # exact verification never re-runs per tau.
    plan = physical_plan(_q(spark, "q280_dedup_threshold_sweep"))
    assert "CartesianProduct" not in plan
    assert plan.count("Scan ExistingRDD") >= 1  # checkpointed pairs


def test_q281_tiering_month_grain_only(spark):
    plan = physical_plan(_q(spark, "q281_storage_tiering_plan"))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_q282_yield_curve_scores_once(spark):
    # quality scoring runs once (checkpointed); the sweep is a
    # broadcast fan-out.
    plan = physical_plan(_q(spark, "q282_quality_filter_yield"))
    assert "CartesianProduct" not in plan
    assert "Scan ExistingRDD" in plan


def test_q283_spearman_histogram_grain(spark):
    # rank windows run on the distinct-rounded-value histogram, never
    # the doc grain; all sums exact BIGINT.
    plan = physical_plan(_q(spark, "q283_quality_perplexity_spearman"))
    assert "CartesianProduct" not in plan


def test_q284_waterfill_bounded_source_frame(spark):
    plan = physical_plan(_q(spark, "q284_token_budget_waterfill"))
    assert "CartesianProduct" not in plan


def test_q285_lmdi_month_grain_after_one_join(spark):
    plan = physical_plan(_q(spark, "q285_lmdi_revenue_drivers"))
    assert "CartesianProduct" not in plan


def test_q286_lindley_as_prefix_windows(spark):
    # the recursion resolves to cumsum + running min on the bounded
    # hour grain — no sequential/Python pass anywhere.
    plan = physical_plan(_q(spark, "q286_queue_backlog_curve"))
    assert "CartesianProduct" not in plan
    for node in ("ArrowEvalPython", "BatchEvalPython"):
        assert node not in plan


def test_q287_velocity_topk(spark):
    plan = physical_plan(_q(spark, "q287_order_velocity_screen"))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_q288_outliers_rank_per_dow(spark):
    # medians/MADs are rank selections partitioned by dow.
    plan = physical_plan(_q(spark, "q288_calendar_outlier_days"))
    assert "CartesianProduct" not in plan


def test_q289_predictability_bounded_state(spark):
    # per-user state is the |types|^2 transition frame; leaderboard is
    # partial top-k.
    plan = physical_plan(_q(spark, "q289_behavior_predictability"))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_q290_suppression_broadcast_dims(spark):
    plan = physical_plan(_q(spark, "q290_small_cell_suppression"))
    assert plan.count(") BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_q291_good_turing_fof_grain(spark):
    # statistics run on the frequency-of-frequencies grain; one token
    # pass only.
    plan = physical_plan(_q(spark, "q291_good_turing_unseen_mass"))
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_q292_rich_club_broadcast_grid(spark):
    plan = physical_plan(_q(spark, "q292_rich_club_coefficient"))
    assert "CartesianProduct" not in plan


def test_q293_ensemble_lag_equi_joins(spark):
    # all three forecasters join on integer hours — no row-offset lag.
    plan = physical_plan(_q(spark, "q293_forecast_ensemble"))
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan


def test_q294_ivf_pq_census_no_python_no_cartesian(spark):
    plan = physical_plan(_q(spark, "q294_ivf_pq_index_census"))
    assert "CartesianProduct" not in plan
    for node in ("ArrowEvalPython", "BatchEvalPython"):
        assert node not in plan


def test_q295_bp_two_fact_passes_only(spark):
    # the regression is two aggregation passes over the checkpointed
    # obs frame; no windows, no per-row second model.
    plan = physical_plan(_q(spark, "q295_breusch_pagan_screen"))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_q296_rage_runs_single_user_shuffle(spark):
    plan = physical_plan(_q(spark, "q296_rapid_repeat_runs"))
    import re
    parts = re.findall(r"hashpartitioning\(([a-z_#0-9]+)", plan)
    assert parts and all(p.startswith("user_id") for p in parts)


def test_q297_revenue_split_no_window(spark):
    plan = physical_plan(_q(spark, "q297_new_vs_returning_revenue"))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_q298_dim_health_bounded_key(spark):
    # posexplode reduces straight to the 64-row dimension grain.
    plan = physical_plan(_q(spark, "q298_embedding_dimension_health"))
    assert "Generate" in plan
    assert "CartesianProduct" not in plan


def test_q299_bt_iterations_on_bounded_match_frame(spark):
    # duels reduce to the suppliers-bounded match frame before any MM
    # round; iterations live behind checkpoints.
    plan = physical_plan(_q(spark, "q299_bradley_terry_strength"))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_q300_sampling_single_conditional_pass(spark):
    # all four sample rates evaluate in one grouped pass over the
    # hashed base frame.
    plan = physical_plan(_q(spark, "q300_sampling_accuracy_planner"))
    assert "CartesianProduct" not in plan


def test_q301_sourcing_single_part_grain(spark):
    plan = physical_plan(_q(spark, "q301_single_sourcing_risk"))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_q302_envelope_24_partitions(spark):
    plan = physical_plan(_q(spark, "q302_hour_of_day_envelope"))
    assert "CartesianProduct" not in plan


def test_q303_coverage_bounded_item_grain(spark):
    plan = physical_plan(_q(spark, "q303_recommender_coverage_audit"))
    assert "CartesianProduct" not in plan


def test_q304_ess_bounded_daily_grain(spark):
    plan = physical_plan(_q(spark, "q304_effective_sample_size"))
    assert "CartesianProduct" not in plan


def test_q305_substitution_blocked_candidates(spark):
    # per-brand top-50 blocking keeps the pair set bounded; the final
    # leaderboard is partial top-k.
    plan = physical_plan(_q(spark, "q305_substitution_screen"))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_q306_unicity_sweep_session_grain(spark):
    plan = physical_plan(_q(spark, "q306_session_unicity_sweep"))
    assert "CartesianProduct" not in plan


def test_q307_endings_bounded_frame(spark):
    plan = physical_plan(_q(spark, "q307_price_ending_census"))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_q308_ltv_signal_histogram_ranks(spark):
    plan = physical_plan(_q(spark, "q308_first_order_ltv_signal"))
    assert "CartesianProduct" not in plan


def test_q309_trade_flows_broadcast_dims(spark):
    # the four dim joins live behind the flows checkpoint (q229
    # Scan-ExistingRDD effect); the balance join remains visible.
    plan = physical_plan(_q(spark, "q309_trade_flow_matrix"))
    assert plan.count(") BroadcastHashJoin") >= 1
    assert "CartesianProduct" not in plan


def test_q310_supplier_scorecard_partitioned_ranks(spark):
    plan = physical_plan(_q(spark, "q310_supplier_reliability_scorecard"))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_q311_consolidation_single_customer_shuffle(spark):
    plan = physical_plan(_q(spark, "q311_order_consolidation"))
    import re
    parts = re.findall(r"hashpartitioning\(([a-z_#0-9]+)", plan)
    assert parts and all(p.startswith("o_custkey") for p in parts)


def test_q312_ladder_bounded_discount_grain(spark):
    plan = physical_plan(_q(spark, "q312_discount_ladder"))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_q313_interaction_nine_cell_grid(spark):
    plan = physical_plan(_q(spark, "q313_returns_interaction"))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_q314_hapax_topk(spark):
    plan = physical_plan(_q(spark, "q314_hapax_gibberish_screen"))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_q315_stability_contingency_grain(spark):
    # agreement statistics come from the 8x8 contingency cell sizes —
    # vector pairs are never materialized.
    plan = physical_plan(_q(spark, "q315_ivf_partition_stability"))
    assert "CartesianProduct" not in plan


def test_q316_expander_topk(spark):
    plan = physical_plan(_q(spark, "q316_basket_expander_score"))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_q317_outage_floor_integer_tests(spark):
    plan = physical_plan(_q(spark, "q317_suspected_outage_hours"))
    assert "CartesianProduct" not in plan


def test_q318_fragmentation_two_grains(spark):
    plan = physical_plan(_q(spark, "q318_shipment_fragmentation"))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_q319_breadth_trend_part_key_join(spark):
    plan = physical_plan(_q(spark, "q319_assortment_breadth_trend"))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_q320_winnowing_no_allpairs(spark):
    plan = physical_plan(_q(spark, "q320_winnowing_fingerprints"))
    # fingerprint machinery is behind the localCheckpoint (q229/q309
    # effect); the visible shape must stay key-partitioned joins
    assert "CartesianProduct" not in plan


def test_q321_shapley_bounded_lattice(spark):
    plan = physical_plan(_q(spark, "q321_shapley_attribution"))
    # the 16-row subset lattice joins are broadcast/nested-loop on
    # constant-size frames; no shuffle-side sort joins anywhere
    assert "SortMergeJoin" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_q322_cooks_topk_and_single_agg_pass(spark):
    plan = physical_plan(_q(spark, "q322_cooks_distance_screen"))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_q323_kendall_pairs_on_month_grain(spark):
    plan = physical_plan(_q(spark, "q323_kendall_tau"))
    # the quadratic pair enumeration must be the broadcast month
    # frame, never a shuffle join on the data grain
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_q325_logrank_window_on_duration_grain(spark):
    plan = physical_plan(_q(spark, "q325_logrank_test"))
    # at-risk suffix sums run over the duration-grain hist frame
    # (behind the localCheckpoint); no range shuffle appears
    assert "Exchange rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_q328_cuped_single_pass(spark):
    plan = physical_plan(_q(spark, "q328_cuped_adjustment"))
    # one data-sized groupBy(customer) then constant-size algebra:
    # no window at all, no sort join
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan


def test_q324_linkpred_keyed_joins_and_topk(spark):
    plan = physical_plan(_q(spark, "q324_link_prediction"))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_q326_ttl_user_partitioned_window(spark):
    plan = physical_plan(_q(spark, "q326_ttl_cache_planner"))
    # gap windows partition by user; the only nested-loop is the
    # 3-row TTL frame broadcast
    assert "Exchange rangepartitioning" not in plan


def test_q330_matryoshka_partial_topk(spark):
    plan = physical_plan(_q(spark, "q330_matryoshka_truncation_recall"))
    # per-(dim, query) top-3 prunes map-side before checkpoint
    assert "CartesianProduct" not in plan


def test_q332_pca_broadcast_dims_single_agg(spark):
    plan = physical_plan(_q(spark, "q332_pca_2x2_closed_form"))
    assert plan.count(") BroadcastHashJoin") == 2  # lineitem never shuffles wide
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan


def test_q333_ransac_mapside_selection(spark):
    plan = physical_plan(_q(spark, "q333_ransac_line_fit"))
    # hypothesis selection must be a groupBy(min_by), never a
    # 16-partition data-grain window funnel
    assert "Exchange rangepartitioning" not in plan


def test_q327_hilbert_bound_projections_no_shuffle_before_agg(spark):
    plan = physical_plan(_q(spark, "q327_hilbert_layout_audit"))
    # the 8 rotation steps are map-side projections: exactly the two
    # aggregation exchanges (chunk grain, layout grain) plus the
    # one-row stats broadcast — no window, no sort join
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan


def test_q331_boosting_no_residual_pass(spark):
    plan = physical_plan(_q(spark, "q331_boosted_stumps"))
    # residuals are never materialized: no join back to the customer
    # grain after round 1 — only broadcast one-row frames
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q334_ewma_window_on_hours_grain(spark):
    plan = physical_plan(_q(spark, "q334_ewma_control_chart"))
    # the 32-lag chain is ONE window pass over the calendar-bounded
    # dense spine
    assert plan.count("WindowExec") <= 1 or plan.count(" Window ") <= 1


def test_q329_replay_broadcast_frames(spark):
    plan = physical_plan(_q(spark, "q329_policy_replay_eval"))
    # arm/best/cutoff frames broadcast; the eval pass never sort-joins
    assert "SortMergeJoin" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_q335_overdispersion_dense_spine(spark):
    plan = physical_plan(_q(spark, "q335_overdispersion_audit"))
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan


def test_q336_planner_five_scans_no_joins(spark):
    plan = physical_plan(_q(spark, "q336_broadcast_planner"))
    # pure per-table aggregation + union: no join of any kind
    assert "Join" not in plan


def test_q337_theil_single_pass_per_grain(spark):
    plan = physical_plan(_q(spark, "q337_theil_decomposition"))
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan


def test_q340_wasserstein_domain_grid_no_sort_join(spark):
    plan = physical_plan(_q(spark, "q340_wasserstein_source_drift"))
    # support/global frames broadcast into the (source x length) grid;
    # the per-source CDF window is hash-partitioned by source (the
    # checkpointed histogram shows as Scan ExistingRDD — q229 effect)
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_q341_revenue_recognition_explode_then_agg_no_window(spark):
    plan = physical_plan(_q(spark, "q341_revenue_recognition"))
    # month spine explode feeds straight into a month-grain partial
    # aggregation: no window, no range exchange anywhere
    assert "Generate" in plan and "explode" in plan
    assert "Window" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_q342_sprt_windows_partitioned_by_priority(spark):
    plan = physical_plan(_q(spark, "q342_sprt_return_rate_monitor"))
    # both prefix windows run partitioned on the bounded
    # (priority x day) grain — never a single-partition data window
    assert "Window" in plan
    assert "hashpartitioning(priority" in plan
    assert "CartesianProduct" not in plan


def test_q343_hamilton_bounded_funnel(spark):
    plan = physical_plan(_q(spark, "q343_hamilton_sampling_allocation"))
    # cell-grain frames cross-join as broadcast one-row funnels; the
    # single-partition rank window sits on the <=|sources|x|langs|
    # cell frame (the PLANS.md SinglePartition policy), never on rows
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_q344_negative_sampling_vocab_funnel(spark):
    plan = physical_plan(_q(spark, "q344_negative_sampling_plan"))
    # vocabulary-bounded count frame (checkpointed -> Scan ExistingRDD)
    # with the two scalar totals broadcast back as a one-row cross
    # join; no window, no sort-merge anywhere
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_q345_novel_trigram_two_shuffles_no_window(spark):
    plan = physical_plan(_q(spark, "q345_novel_trigram_rate"))
    # debut frame joins back on the trigram key (broadcast at test SF,
    # shuffled-hash at scale — never a cartesian pair blow-up), and
    # the final rate aggregates on the doc grain
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(doc_id" in plan or "hashpartitioning(sh" in plan


def test_q346_neardup_evidence_no_allpairs(spark):
    plan = physical_plan(_q(spark, "q346_neardup_evidence_pairs"))
    # every pair comes from an LSH band-bucket equi-join; the two
    # verifiers fan out by per-doc shingle count — no cartesian
    # product, no window, and no Python node anywhere
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_q347_hill_topk_partial_no_join(spark):
    plan = physical_plan(_q(spark, "q347_hill_tail_index"))
    # top-101 selection is a partial per-partition top-k, never a
    # global sort; the rank window sits on the 101-row bounded frame
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_q348_wilson_broadcast_dim_brand_grain(spark):
    plan = physical_plan(_q(spark, "q348_wilson_lower_bound"))
    # part dim broadcasts into the fact scan; both rank windows run on
    # the 25-row brand frame (bounded SinglePartition funnel)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "hashpartitioning(p_brand" in plan


def test_q349_matching_cell_equijoin_no_allpairs(spark):
    plan = physical_plan(_q(spark, "q349_matched_cohort_uplift"))
    # the nearest-within-caliper search is a cell equi-join over the
    # x3 exploded control side — never a cartesian/theta join; argmin
    # is a grouped min-struct, no window
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Generate" in plan and "explode" in plan
    assert "Window" not in plan


def test_q350_bfs_rounds_checkpointed(spark):
    plan = physical_plan(_q(spark, "q350_bfs_hop_profile"))
    # 8 relaxation rounds truncate lineage per round: the final plan
    # hangs off Scan ExistingRDD, aggregates on the hop grain, and
    # never crosses a Python boundary
    assert "Scan ExistingRDD" in plan
    assert "hashpartitioning(hop" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_q351_encoding_advisor_single_window_spec(spark):
    plan = physical_plan(_q(spark, "q351_encoding_advisor"))
    # the five lag flags share ONE window spec -> exactly one Window
    # node partitioned by the order key; distinct counts ride the same
    # aggregation via Expand
    import re

    assert len(re.findall(r"\(\d+\) Window", plan)) == 1
    assert "hashpartitioning(l_orderkey" in plan
    assert "Expand" in plan
    assert "Join" not in plan


def test_q352_safety_stock_no_window_broadcast_dim(spark):
    plan = physical_plan(_q(spark, "q352_safety_stock_planner"))
    # cycle length is the telescoping (max-min)/(n-1) -- NO window
    # anywhere; part dim broadcasts; brand-grain aggregation
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "hashpartitioning(brand" in plan


def test_q353_predictability_user_partitioned_lead(spark):
    plan = physical_plan(_q(spark, "q353_transition_predictability"))
    # the lead runs partitioned by user (never a single-partition data
    # window); totals broadcast back onto the 25-cell pair frame
    assert "Window" in plan
    assert "hashpartitioning(user_id" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q354_upset_bounded_decode_join(spark):
    plan = physical_plan(_q(spark, "q354_vocab_source_upset"))
    # corpus-sized work is the token explode + two grouped reductions;
    # the bit-test decode join is broadcast against the bounded source
    # index (BNLJ on the non-equi bit predicate)
    assert "Generate" in plan and "explode" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(tok" in plan


def test_q355_ot_plan_domain_grid_funnel(spark):
    plan = physical_plan(_q(spark, "q355_ot_transport_plan"))
    # both histogram groupBys shuffle on n_chars; the merge windows
    # live on the bounded support union (SinglePartition by design,
    # the q340 funnel policy); totals broadcast
    assert "hashpartitioning(n_chars" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q356_triangle_audit_no_cartesian_checkpointed_pairs(spark):
    plan = physical_plan(_q(spark, "q356_triangle_bound_audit"))
    # the pj frame (3 downstream consumers) is checkpointed; wedges
    # come from an equi-join on the middle node, never a cartesian;
    # the whole audit is integer-exact (no Window either)
    assert "Scan ExistingRDD" in plan
    assert "hashpartitioning(mid" in plan
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_q357_filter_attribution_bounded_cross(spark):
    plan = physical_plan(_q(spark, "q357_filter_attribution_audit"))
    # one corpus scan to the <=16-row mask histogram (checkpointed);
    # attribution crosses the fixed 4-row filter frame against it by
    # broadcast — no shuffle join, no window
    assert "Scan ExistingRDD" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan


def test_q358_erlang_bounded_series_no_window(spark):
    plan = physical_plan(_q(spark, "q358_erlang_staffing_planner"))
    # one fact pass to per-type counts; the factorial series runs as
    # chained projections on the 5-row type frame with the 1-row span
    # broadcast — no window, no pow(), no shuffle join
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "pow" not in plan.lower() or "POWER" not in plan


def test_q359_elasticity_brand_grain_broadcast_dim(spark):
    plan = physical_plan(_q(spark, "q359_price_elasticity"))
    # part dim broadcasts into the fact pass; the regression is a
    # grouped aggregation on the brand grain — no window anywhere
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan
    assert "hashpartitioning(brand" in plan


def test_q360_backtest_explode_windows_broadcast_rop(spark):
    plan = physical_plan(_q(spark, "q360_service_level_backtest"))
    # rolling 7-day sums come from the x7 contribution explode + one
    # grouped sum (never a window); the 25-row reorder-point frame
    # broadcasts into the weekly grain
    assert "Generate" in plan and "explode" in plan
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q361_fd_audit_pure_aggregation_funnels(spark):
    plan = physical_plan(_q(spark, "q361_functional_dependency_audit"))
    # five FD pipelines = five partial/final aggregation funnels into
    # one Union: no join, no window, every reduction map-side-combined
    assert "Union" in plan
    assert "Join" not in plan
    assert "Window" not in plan
    assert "hashpartitioning(lhs" in plan


def test_q362_stationary_bounded_iteration(spark):
    plan = physical_plan(_q(spark, "q362_markov_stationary_mix"))
    # 12 power-iteration rounds on the checkpointed 25-cell matrix:
    # every join is broadcast (5-row pi against 25-cell pmat), never a
    # shuffle join or cartesian
    assert "Scan ExistingRDD" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q363_eb_shrinkage_two_pass_no_window(spark):
    plan = physical_plan(_q(spark, "q363_empirical_bayes_shrinkage"))
    # checkpointed brand frame feeds pool + attribution branches; the
    # 1-row prior broadcasts back; no window, no shuffle join
    assert "Scan ExistingRDD" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan


def test_q364_hard_negatives_grouped_argmax_no_window(spark):
    plan = physical_plan(_q(spark, "q364_hard_negative_mining"))
    # candidate-bounded like q346; the per-anchor argmax is a grouped
    # min-struct (map-side combined), never a window over data
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(anchor" in plan


def test_q365_double_sweep_shared_checkpointed_edges(spark):
    plan = physical_plan(_q(spark, "q365_double_sweep_diameter"))
    # both sweeps + node census hang off the one checkpointed edge
    # frame; the re-seed and the summary scalars broadcast (1-row
    # funnels), no data-sized window anywhere
    assert "Scan ExistingRDD" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_q366_ipf_bounded_iteration_broadcast_scaling(spark):
    plan = physical_plan(_q(spark, "q366_raking_ipf_plan"))
    # one corpus scan to the checkpointed contingency frame; all ten
    # scaling steps join broadcast marginal frames — never a shuffle
    # join, never a window
    assert "Scan ExistingRDD" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan


def test_q367_richness_two_reductions_no_join(spark):
    plan = physical_plan(_q(spark, "q367_vocabulary_richness"))
    # token explode + (source, token) reduction + source reduction:
    # no join, no window, everything map-side combined
    assert "Generate" in plan and "explode" in plan
    assert "Join" not in plan
    assert "Window" not in plan
    assert "hashpartitioning(source" in plan


def test_q368_burn_rate_explode_windows_no_window_fn(spark):
    plan = physical_plan(_q(spark, "q368_slo_burn_rate_alerts"))
    # 6-hour rolling sums via the x6 contribution explode on the hour
    # grain — no window function; totals broadcast back
    assert "Generate" in plan and "explode" in plan
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan
    assert "hashpartitioning(h" in plan


def test_q369_t_closeness_class_partitioned_cdfs(spark):
    plan = physical_plan(_q(spark, "q369_t_closeness_audit"))
    # per-class CDFs are hash-partitioned windows on the class key;
    # the bucket-bounded support histogram broadcasts into the grid
    assert "Window" in plan
    assert "hashpartitioning(seg" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q370_reservoir_window_group_limit(spark):
    plan = physical_plan(_q(spark, "q370_weighted_reservoir_sample"))
    # the rank-<=5 window compiles to WindowGroupLimit: every map
    # partition forwards at most 5 rows per source (the reservoir
    # property, executed map-side); one scan, no joins
    assert "WindowGroupLimit" in plan
    assert "Join" not in plan
    assert "PushedFilters" in plan


def test_q371_js_token_keyed_shuffles_broadcast_totals(spark):
    plan = physical_plan(_q(spark, "q371_js_divergence_matrix"))
    # counts reduce + shared-token equi-join shuffle on the token key
    # (high-cardinality); source totals broadcast; no windows
    assert "Scan ExistingRDD" in plan  # checkpointed counts frame
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_q372_silhouette_broadcast_centroids_no_data_window(spark):
    plan = physical_plan(_q(spark, "q372_ivf_silhouette"))
    # 8-centroid broadcast cross join; top-2 selection is a bounded
    # array_sort over k structs inside a vec_id-keyed aggregate —
    # never a data-sized window. The ONLY window is seed_centroids'
    # rank over the 8-row TakeOrderedAndProject funnel (keyed by
    # vec_id — asserted so a data window can't sneak in unnoticed).
    assert "BroadcastNestedLoopJoin" in plan
    assert "TakeOrderedAndProject" in plan  # the k=8 seed funnel
    assert plan.count("windowspecdefinition(") == 1
    assert "windowspecdefinition(vec_id" in plan
    assert "hashpartitioning(vec_id" in plan
    assert "SortMergeJoin" not in plan


def test_q373_croston_calendar_bounded_windows(spark):
    plan = physical_plan(_q(spark, "q373_croston_intermittent_demand"))
    # fact pass + broadcast dim to the calendar-bounded (brand, day)
    # grain (checkpointed: sequence + totals branches); the sequence
    # window partitions by brand over <=2500 rows each
    assert "Scan ExistingRDD" in plan
    assert "BroadcastHashJoin" in plan
    assert "hashpartitioning(brand" in plan
    assert "SortMergeJoin" not in plan


def test_q374_hosmer_lemeshow_bucketed_rank_no_sp_data_window(spark):
    plan = physical_plan(_q(spark, "q374_hosmer_lemeshow"))
    # the global score rank runs through the two-level bucketed rank;
    # scoring is native JVM math (no Python); the total re-enters via
    # a 1-row broadcast onto the checkpointed 10-row decile frame
    assert "Scan ExistingRDD" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "Python" not in plan
    assert "SortMergeJoin" not in plan


def test_q375_keyness_takeordered_no_data_window(spark):
    plan = physical_plan(_q(spark, "q375_log_odds_keyness"))
    # token-grain reduce + 1-row totals broadcast + global top-20 as
    # TakeOrderedAndProject; the rank window runs on the 20-row funnel
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q376_cmh_bounded_strata_funnel(spark):
    plan = physical_plan(_q(spark, "q376_cmh_stratified_association"))
    # one fact pass map-side combined to the <=|years| stratum grain;
    # the checkpointed per-stratum frame feeds the totals + final
    # branches; the 1-row summary broadcasts back
    assert "Scan ExistingRDD" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan


def test_q377_markov_order_bounded_cells(spark):
    plan = physical_plan(_q(spark, "q377_markov_order_test"))
    # the user-keyed lead shuffle and the margin joins hide behind the
    # checkpointed cells frame (the q229 effect — assert the
    # post-checkpoint visible shape): what remains is the bounded
    # cells scan, the 1-row total aggregate, and its broadcast back
    assert "Scan ExistingRDD" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan


def test_q378_rmst_histogram_grain_windows(spark):
    plan = physical_plan(_q(spark, "q378_restricted_mean_survival"))
    # all windows run on the checkpointed (segment x duration-day)
    # histogram (calendar-bounded, the q201 property partitioned by
    # segment); customer dim broadcasts; totals broadcast back
    assert "Scan ExistingRDD" in plan
    assert "BroadcastHashJoin" in plan
    assert "hashpartitioning(seg" in plan
    assert "SortMergeJoin" not in plan


def test_q379_dispersion_takeordered_bounded_grid(spark):
    plan = physical_plan(_q(spark, "q379_token_dispersion_dp"))
    # token-keyed reduces off the checkpointed counts; the zero-cell
    # grid is a bounded |sources| broadcast fan; global top-20 is
    # TakeOrderedAndProject with the rank window on the 20-row funnel
    assert "Scan ExistingRDD" in plan
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q380_hits_checkpointed_rounds_takeordered_topk(spark):
    plan = physical_plan(_q(spark, "q380_hits_hub_authority"))
    # per-round lineage truncation hides the iteration behind
    # checkpoints; top-10 per side funnels through
    # TakeOrderedAndProject with the rank window on the 10-row
    # survivor frame (never a data-sized global window)
    assert "Scan ExistingRDD" in plan
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_q381_erlang_b_no_window_broadcast_span(spark):
    plan = physical_plan(_q(spark, "q381_erlang_blocking_ladder"))
    # the 12-step recurrence is pure projection on the 5-row type
    # frame; the 1-row span joins by broadcast; no window anywhere
    assert "windowspecdefinition" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q382_concentration_pure_two_level_reduce(spark):
    plan = physical_plan(_q(spark, "q382_lexical_concentration"))
    # token-grain reduce into source-grain reduce: no joins, no
    # windows — the q367 shape
    assert "HashAggregate" in plan
    assert "Join" not in plan
    assert "windowspecdefinition" not in plan


def test_q383_metric_audit_windowgrouplimit_both_ranks(spark):
    plan = physical_plan(_q(spark, "q383_metric_choice_audit"))
    # one checkpointed scored pass; both top-10 ranks run as
    # WindowGroupLimit (bounded executor-side heaps)
    assert "Scan ExistingRDD" in plan
    assert plan.count("WindowGroupLimit") >= 2


def test_q385_elbow_no_window_checkpointed_scored_pass(spark):
    plan = physical_plan(_q(spark, "q385_inertia_elbow_sweep"))
    # the k-sweep is filters + reduces over ONE checkpointed scored
    # pass; the only window in the whole query (the 8-row seed
    # funnel) hides behind the checkpoint — no window may survive
    assert "Scan ExistingRDD" in plan
    assert "windowspecdefinition" not in plan


def test_q386_records_customer_partitioned_window(spark):
    plan = physical_plan(_q(spark, "q386_record_breaking_spend"))
    # the prefix-max window is customer-partitioned (bounded groups),
    # never a global window; orders scan prunes to the 4 used columns
    assert "windowspecdefinition(o_custkey" in plan
    assert "o_orderpriority" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q387_zonemap_bounded_replay_joins(spark):
    plan = physical_plan(_q(spark, "q387_zonemap_pruning_audit"))
    # fact rows reduce to 512 chunks + ~84 months behind the
    # checkpoint; the predicate replay is a broadcast cross join of
    # those bounded frames only
    assert "Scan ExistingRDD" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q384_nelson_aalen_histogram_grain(spark):
    # the ppm cumsum window runs on the lifetime histogram (calendar-
    # bounded) after the per-customer reduce; horizon/total broadcast
    plan = physical_plan(_q(spark, "q384_nelson_aalen_hazard"))
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q388_frontier_one_candidate_pass_windowgrouplimit(spark):
    plan = physical_plan(_q(spark, "q388_ivf_recall_frontier"))
    # one checkpointed candidate pass; the np fan-out joins a 3-row
    # broadcast; per-(np, query) top-3 runs as a WindowGroupLimit heap
    assert "Scan ExistingRDD" in plan
    assert "WindowGroupLimit" in plan
    assert "SortMergeJoin" not in plan


def test_q389_repetition_pure_reductions_no_join(spark):
    plan = physical_plan(_q(spark, "q389_intra_doc_repetition"))
    # explode -> (doc, trigram) reduce -> doc reduce -> source reduce:
    # no joins, no windows anywhere
    assert "HashAggregate" in plan
    assert "Join" not in plan
    assert "windowspecdefinition" not in plan


def test_q390_one_stats_pass_broadcast_grid_bounded_window(spark):
    plan = physical_plan(_q(spark, "q390_ridge_lambda_sweep"))
    # one sufficient-statistics aggregate; the lambda grid joins as a
    # broadcast against that single row; order count stays broadcast;
    # the only window ranks the 8-row sweep frame
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Location: InMemoryFileIndex") == 2  # one scan per table
    assert "o_orderdate" not in plan  # column pruning on orders


def test_q391_kfold_all_arithmetic_behind_checkpoint(spark):
    plan = physical_plan(_q(spark, "q391_kfold_cv_ridge"))
    # the data passes live behind the checkpointed 5-row fold-sums
    # frame; LOFO + grid + CV are broadcast joins and bounded aggs
    assert "Scan ExistingRDD" in plan
    assert "Scan parquet" not in plan
    assert "SortMergeJoin" not in plan


def test_q396_halving_bounded_promotion_cascade(spark):
    plan = physical_plan(_q(spark, "q396_successive_halving_sweep"))
    # three rung branches over the checkpointed 24-row scored frame;
    # every promotion joins a broadcast survivor list; the rank
    # funnels are TakeOrderedAndProject prunes, never global sorts
    assert "Scan ExistingRDD" in plan
    assert "Union" in plan
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_q392_dsir_broadcast_lr_table_and_takeordered(spark):
    plan = physical_plan(_q(spark, "q392_dsir_importance_selection"))
    # doc-bucket counts join the 256-row log-ratio table as a
    # BROADCAST; selection is TakeOrderedAndProject (top-100), with
    # the rank window AFTER the limit; the lang filter pushes to scan
    assert ") BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert "Not(EqualTo(lang,en))" in plan


def test_q393_power_planner_broadcast_dims_and_grid(spark):
    plan = physical_plan(_q(spark, "q393_power_analysis_planner"))
    # customer dim broadcasts into the orders join; the MDE x power
    # grid broadcasts against the 5-segment stats frame; no windows
    assert ") BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "windowspecdefinition" not in plan


def test_q394_rr_broadcast_type_index_no_smj(spark):
    plan = physical_plan(_q(spark, "q394_randomized_response_estimate"))
    # the lie-type equi-join hits a BROADCAST K-row rank-indexed type
    # table; the only window is the K-row index funnel
    assert ") BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q395_cdc_doc_partitioned_window_no_joins(spark):
    plan = physical_plan(_q(spark, "q395_cdc_chunk_dedup"))
    # boundary prefix sums run in a doc-partitioned window (bounded
    # groups); chunk identity + dedup are pure aggregations — the
    # plan has no join anywhere
    assert "windowspecdefinition(doc_id" in plan
    assert "Join" not in plan


def test_q397_mixing_plan_checkpointed_and_broadcast(spark):
    plan = physical_plan(_q(spark, "q397_source_mixing_temperature"))
    # one token-count pass lives behind the checkpoint; per-alpha
    # normalizers join back as a broadcast; no data-sized window
    assert "Scan ExistingRDD" in plan
    assert ") BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "windowspecdefinition" not in plan


def test_q398_neyman_two_bounded_rank_windows(spark):
    plan = physical_plan(_q(spark, "q398_neyman_allocation_plan"))
    # everything past the 5-stratum reduce is bounded integer
    # arithmetic behind the checkpoint: two 5-row Hamilton rank
    # windows, broadcast totals, no sort-merge join
    assert "Scan ExistingRDD" in plan
    assert plan.count("windowspecdefinition") >= 2
    assert "SortMergeJoin" not in plan


def test_q399_learning_curve_single_pass_behind_checkpoint(spark):
    plan = physical_plan(_q(spark, "q399_learning_curve_extrapolation"))
    # train-quarter AND validation stats come from ONE conditional-
    # group pass (checkpointed 5-row frame); the fit/pivot is pure
    # arithmetic — no parquet scan, window, or sort-merge join
    assert "Scan ExistingRDD" in plan
    assert "Location: InMemoryFileIndex" not in plan
    assert "windowspecdefinition" not in plan
    assert "SortMergeJoin" not in plan


def test_q400_viterbi_backward_pass_reuses_checkpoints(spark):
    plan = physical_plan(_q(spark, "q400_viterbi_regime_decode"))
    # the forward rounds (broadcast model joins + grouped max-structs)
    # and the per-step backward joins all hide behind per-round
    # localCheckpoints (the q229 post-checkpoint shape); the visible
    # plan is the 6-branch union of checkpointed path frames — each
    # union branch reuses the materialized backward prefix instead of
    # re-executing its whole join chain
    assert "Union" in plan
    assert "Scan ExistingRDD" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "windowspecdefinition" not in plan


def test_q401_page_hinkley_one_window_pass_no_join_shuffle(spark):
    plan = physical_plan(_q(spark, "q401_page_hinkley_drift"))
    # stats broadcast back onto the stream; rank + running sum +
    # running min all ride the per-series (event_type) partition —
    # no global window, no sort-merge join
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("windowspecdefinition") == 3
    assert "PartitionBy: [event_type" in plan or "event_type" in plan


def test_q402_sprt_pure_window_no_joins(spark):
    plan = physical_plan(_q(spark, "q402_sprt_sequential_ab"))
    # hash-arm projection is map-side; the whole walk is one per-arm
    # window pass + one reduction — zero joins of any kind
    for node in (
        "SortMergeJoin",
        "BroadcastHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
    ):
        assert node not in plan
    assert plan.count("windowspecdefinition") == 3


def test_q403_shift_share_bounded_after_cell_reduce(spark):
    plan = physical_plan(_q(spark, "q403_shift_share_decomposition"))
    # the (nation x segment) cell frame is checkpointed; segment and
    # grand totals broadcast back; the 1-row total rides a bounded
    # nested-loop cross join; no window, no cartesian product
    assert "Scan ExistingRDD" in plan
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "windowspecdefinition" not in plan


def test_q404_benford2_lattice_broadcasts(spark):
    plan = physical_plan(_q(spark, "q404_benford_second_digit"))
    # one contingency pass (checkpointed), dense digit lattices join
    # the broadcast histograms, 1-row total rides a bounded BNLJ;
    # no sort-merge join, no window
    assert "Scan ExistingRDD" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "windowspecdefinition" not in plan


def test_q405_cuped_no_data_sized_float_path(spark):
    plan = physical_plan(_q(spark, "q405_cuped_adjusted_ab"))
    # one user-grain reduce behind the checkpoint; the 1-row model
    # rides a bounded nested-loop join onto the 2-row arm frame;
    # no window, no sort-merge join, no cartesian product
    assert "Scan ExistingRDD" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "windowspecdefinition" not in plan


def test_q406_design_effect_single_reduce(spark):
    plan = physical_plan(_q(spark, "q406_sampling_design_effect"))
    # map-side projection + one per-source reduce: two columns reach
    # the scan, no joins or windows of any kind
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" not in plan
    assert "windowspecdefinition" not in plan
    assert "HashAggregate" in plan
    assert "n_chars" in plan and "text" not in plan


def test_q407_kruskal_wallis_bounded_after_checkpoints(spark):
    plan = physical_plan(_q(spark, "q407_kruskal_wallis"))
    # the rank histogram and the 5-row group frame are checkpointed
    # (two downstream branches each); the closing H row rides bounded
    # nested-loop cross joins; the bucketed rank machinery hides
    # behind the checkpoint (the q229 effect) so no window and no
    # parquet scan are visible in the final plan
    assert "Scan ExistingRDD" in plan
    assert "Scan parquet" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "windowspecdefinition" not in plan


def test_q408_cochran_armitage_single_reduce(spark):
    plan = physical_plan(_q(spark, "q408_cochran_armitage_trend"))
    # map-side projection + one 2-row reduce: three columns reach the
    # scan, no joins or windows of any kind
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "windowspecdefinition" not in plan
    assert "HashAggregate" in plan
    assert "l_discount" in plan and "l_extendedprice" not in plan


def test_q409_jonckheere_pair_partitioned_window(spark):
    plan = physical_plan(_q(spark, "q409_jonckheere_terpstra"))
    # ONE window, partitioned by the pair key (never a global rank);
    # pair tagging and the 1-row closing math ride bounded
    # nested-loop joins; no sort-merge join, no cartesian product
    assert plan.count("windowspecdefinition") == 1
    assert "windowspecdefinition(ta" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q410_interdoc_grams_no_window_no_cartesian(spark):
    plan = physical_plan(_q(spark, "q410_inter_doc_ngram_dup"))
    # the distinct (doc, gram-hash) frame is checkpointed and feeds the
    # gram-count branch and the join-back; no window anywhere (pure
    # groupBy funnels) and the gram join is keyed, never cartesian
    assert "Scan ExistingRDD" in plan
    assert "windowspecdefinition" not in plan
    assert "CartesianProduct" not in plan


def test_q411_runs_test_bounded_windows(spark):
    plan = physical_plan(_q(spark, "q411_runs_test_randomness"))
    # median rank, global count, and the lag all run on the
    # calendar-bounded daily frame behind the checkpoint; the median
    # and day count broadcast back; nothing sort-merges
    assert "Scan ExistingRDD" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("windowspecdefinition") == 3


def test_q412_allan_no_window_join_on_next_block(spark):
    plan = physical_plan(_q(spark, "q412_allan_variance"))
    # adjacent-block differences come from a blk+1 equi-join on the
    # checkpointed block frame, never a lag window; the dyadic fan-out
    # is map-side explode
    assert "Scan ExistingRDD" in plan
    assert "windowspecdefinition" not in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q413_greenwood_histogram_grain_windows(spark):
    plan = physical_plan(_q(spark, "q413_km_greenwood_bands"))
    # subjects reduce to the checkpointed duration histogram BEFORE the
    # ordered windows (q201's 100 TB property): no parquet scan or
    # sort-merge join is visible in the final plan, and the 1-row
    # total rides a bounded broadcast nested-loop join
    assert "Scan ExistingRDD" in plan
    assert "Scan parquet" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("windowspecdefinition") == 3


def test_q414_cliffs_delta_pair_partitioned_window(spark):
    plan = physical_plan(_q(spark, "q414_cliffs_delta"))
    # the shared q211 machinery: ONE window partitioned by the pair
    # key (never a global rank); pair tagging rides bounded
    # nested-loop joins
    assert plan.count("windowspecdefinition") == 1
    assert "windowspecdefinition(ta" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q415_seasonal_mk_no_window(spark):
    plan = physical_plan(_q(spark, "q415_seasonal_mann_kendall"))
    # season-keyed pair joins on the checkpointed monthly frame; the
    # pooled totals broadcast back onto the 12-row frame; no window
    assert "Scan ExistingRDD" in plan
    assert "windowspecdefinition" not in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q416_ppr_bounded_after_checkpoints(spark):
    plan = physical_plan(_q(spark, "q416_personalized_pagerank"))
    # per-iteration lineage truncation: the final plan sees only the
    # checkpointed rank frame and the broadcast seed flag; no window,
    # no sort-merge join, no cartesian
    assert "Scan ExistingRDD" in plan
    assert "windowspecdefinition" not in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q417_siegel_global_funnels_only_after_checkpoint(spark):
    plan = physical_plan(_q(spark, "q417_siegel_repeated_medians"))
    # the per-point median window hides behind the slope checkpoint;
    # the two visible windows are the month-grain residual-median
    # funnel (bounded by the calendar); intercept joins by broadcast
    assert "Scan ExistingRDD" in plan
    assert plan.count("windowspecdefinition") == 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q418_ljung_box_no_window_fixed_chain(spark):
    plan = physical_plan(_q(spark, "q418_ljung_box"))
    # autocovariances come from day-number equi-joins on the
    # checkpointed dense spine (never a lag window); the seven-term Q
    # chain is a literal projection over broadcast one-row frames
    assert "Scan ExistingRDD" in plan
    assert "windowspecdefinition" not in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q419_theil_nation_grain_reduce(spark):
    plan = physical_plan(_q(spark, "q419_theil_decomposition"))
    # one customer-grain reduce feeds nation-keyed joins behind the
    # checkpoint; pooled sums broadcast back onto the 25-row frame;
    # no window anywhere
    assert "Scan ExistingRDD" in plan
    assert "windowspecdefinition" not in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q420_kendalls_w_bounded_grid(spark):
    plan = physical_plan(_q(spark, "q420_kendalls_w_concordance"))
    # the fact-table aggregation hides behind the 125-cell grid
    # checkpoint; rank windows and every statistic live on that
    # bounded frame, 1-row stats ride broadcast nested-loop joins
    assert "Scan ExistingRDD" in plan
    assert "Scan parquet" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q421_pages_l_block_pair_join(spark):
    plan = physical_plan(_q(spark, "q421_pages_l_trend"))
    # in-block ranking is a month-keyed pair join on the checkpointed
    # (month x priority) frame — no window anywhere; the 1-row stat
    # broadcasts back onto the 5-row output
    assert "Scan ExistingRDD" in plan
    assert "windowspecdefinition" not in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q422_bowker_zero_float_bounded(spark):
    plan = physical_plan(_q(spark, "q422_bowker_symmetry"))
    # the transition matrix checkpoint feeds both direction halves;
    # the symmetric pair frame is <=10 rows, the chi2 reduce rides a
    # broadcast nested-loop join; no window in the visible plan
    assert "Scan ExistingRDD" in plan
    assert "windowspecdefinition" not in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q423_cvm_histogram_grain(spark):
    plan = physical_plan(_q(spark, "q423_cramer_von_mises"))
    # both ECDF prefix sums run on the bucketed two-level machinery
    # BEFORE the checkpoint: the visible plan is reductions over the
    # checkpointed histogram with a broadcast totals row
    assert "Scan ExistingRDD" in plan
    assert "Scan parquet" not in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q424_hurst_calendar_bounded(spark):
    plan = physical_plan(_q(spark, "q424_hurst_exponent"))
    # block windows live on the calendar-bounded spine behind the
    # per-size checkpoint; the visible plan is the 5-row pivot with a
    # broadcast slope row — no window, no sort-merge join
    assert "Scan ExistingRDD" in plan
    assert "windowspecdefinition" not in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q425_fleiss_bounded_reductions(spark):
    plan = physical_plan(_q(spark, "q425_fleiss_kappa"))
    # the rater fan-out + (doc, category) count hide behind the cells
    # checkpoint; agreement/marginal branches are pure reductions and
    # the kappa row broadcasts onto the 3-row category frame
    assert "Scan ExistingRDD" in plan
    assert "windowspecdefinition" not in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q426_morisita_horn_token_keyed(spark):
    plan = physical_plan(_q(spark, "q426_morisita_horn_similarity"))
    # q371's plan shape: the shared-token join is keyed on tok off the
    # checkpointed count frame, marginals broadcast onto the bounded
    # source-pair grid; no window, no cartesian product
    assert "Scan ExistingRDD" in plan
    assert "windowspecdefinition" not in plan
    assert "CartesianProduct" not in plan


def test_q427_entropy_rate_bounded_iteration(spark):
    plan = physical_plan(_q(spark, "q427_chain_entropy_rate"))
    # the lead pass hides behind the transition-matrix checkpoint;
    # iteration and the ppb entropy algebra live on the bounded
    # |types|^2 frame (q362's contract), stats broadcast back
    assert "Scan ExistingRDD" in plan
    assert "windowspecdefinition" not in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q428_moods_median_bounded_funnel(spark):
    plan = physical_plan(_q(spark, "q428_moods_median_test"))
    # the fact aggregation + two-level cumsum hide behind the
    # histogram checkpoint; median selection is a reduce (never a
    # sort), the 2x5 table and chi2 live on bounded frames riding
    # broadcast nested-loop joins
    assert "Scan ExistingRDD" in plan
    assert "Scan parquet" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q429_pettitt_day_grain_funnel(spark):
    plan = physical_plan(_q(spark, "q429_pettitt_change_point"))
    # rank/prefix windows run on the calendar-bounded day grain
    # BEFORE the uu checkpoint; the visible plan is reduces over the
    # checkpointed U frame with 1-row stats broadcast back
    assert "Scan ExistingRDD" in plan
    assert "windowspecdefinition" not in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
