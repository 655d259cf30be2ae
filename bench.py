"""Benchmark harness: runs the headline suite queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract (restored r13 per VERDICT r12 #2 — PERF_r12 came back with
``n_common: 0`` because the per-query dict never reached the driver's
parser): the FINAL stdout line is ONE JSON object
``{"metric": "suite_total_wall_seconds", "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}`` — the full per-query dict included.
A compact summary line (metric/value/counts, no queries) is printed
immediately BEFORE it so a very small tail capture still sees the headline
number, and ``bench_detail.json`` keeps the full artifact with per-query
min/max/n spread.

Accounting (VERDICT r12 #7): ``value`` INCLUDES the one-time
shared_eager_cache build seconds — value = sum(per-query medians)
+ shared_cache_build_total, both of which are emitted separately, so the
headline is the end-to-end cost of the suite and cannot drift from what a
cold session pays. (r12 and earlier reported sum-of-medians only; r12's
529.586 s would read 546.765 s under this rule — use `sum_of_medians` for
a like-for-like cross-round comparison.)

Each query is timed to completion of a count()-free collect (materializing
the true result). The session is warmed with one tiny action first so JVM
startup isn't attributed to the first query. Each query runs up to
$SPARK_GRAFT_BENCH_REPS (default 3) INTERLEAVED passes inside a
$SPARK_GRAFT_BENCH_BUDGET-second budget (default 1100 s — sized so a full
driver-environment pass fits ~3x; the r4 420 s budget was smaller than one
driver pass and degraded every query to n=1); the reported per-query value
is the median, with min/max/n spread in the sidecar — the sandbox shows up
to 33x same-code swings on single-shot timings (VERDICT r3/r4). Pass 1 is
always complete; later passes run expensive-first and the artifact is
re-emitted after every pass, so a driver kill can never erase the run.
"""

from __future__ import annotations

import gc
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sqlitedataframe_spark.session import get_spark  # noqa: E402
from sqlitedataframe_spark.suite import load_all  # noqa: E402

#: Headline set: the registry MINUS genuine harnesses — queries whose wall
#: time is temp-file IO (sqlite/csv/json/binaryfile round-trips) or
#: micro-batch streaming orchestration (stream_*), not engine work. Every
#: pure engine query belongs here (VERDICT r7 #3).
HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_region_revenue",
    "q10_returned_items",
    "q04_late_ship_priority",
    "q06_forecast_revenue",
    "q14_promo_effect",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q22_sales_opportunity",
    "q02_min_cost_supplier",
    "q07_volume_shipping",
    "q08_market_share",
    "q09_product_profit",
    "q11_important_parts",
    "q12_late_priority",
    "q13_order_distribution",
    "q15_top_supplier",
    "q16_supplier_count",
    "q17_small_qty_revenue",
    "q20_over_contributors",
    "q21_waiting_supplier",
    "sim_ivf_topk",
    "join_left_outer",
    "join_semi",
    "agg_having_distinct",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_count_distinct_exact",
    "agg_approx",
    "agg_percentile_exact",
    "agg_stats_moments",
    "agg_histogram",
    "agg_corr_covar",
    "array_ops_embeddings",
    "explode_unnest",
    "regexp_funcs",
    "unpivot_measures",
    "gapfill_timeseries",
    "window_topk_per_group",
    "window_running_sum",
    "window_ranking",
    "window_range_frame",
    "window_groups_frame",
    "window_frame_exclude",
    "window_exclude_minmax",
    "rowid_fact_scale",
    "join_full_outer",
    "window_distribution",
    "pivot_segments",
    "cte_recursive",
    "asof_join_events_orders",
    "subquery_exists",
    "math_funcs",
    "json_each_props",
    "sqlite_dialect_sql",
    "sqlite_dialect_sql2",
    "rowid_surrogate",
    "sort_limit_offset",
    "set_ops_union",
    "subquery_scalar",
    "string_funcs",
    "date_funcs",
    "events_json",
    "events_json_variant",
    "events_window_tumbling",
    "events_window_sliding",
    "events_sessionize",
    "events_enrich_join",
    "events_funnel",
    "pipeline_curation",
    "dedup_exact",
    "dedup_fingerprint",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "sim_bruteforce_topk",
    "sim_ann_lsh",
    "text_stats",
    "text_quality",
    "text_langid",
    "text_rolling_hash",
    "text_repetition",
    "text_redact_spans",
    "sample_cap_per_class_approx",
    "multimodal_bytes",
    "sample_hash_deterministic",
    "sample_train_test_split",
    "sample_stratified",
    "text_tfidf_topk",
    "range_join_events",
    "dedup_decontaminate",
    "events_retention",
    "dedup_connected_components",
    "pipeline_near_dedup",
    "embed_label_centroids",
    "embed_quantize_int8",
    "sample_cap_per_class",
    "merge_upsert_orders",
    "profile_orders",
    "text_chunk_windows",
    "text_pack_sequential",
    "source_orc_roundtrip",
    "source_text_gz",
    "source_partitioned_pruning",
    "source_schema_evolution",
    "join_skew_salted",
    "agg_skew_salted",
    "dedup_chunk_exact",
    "corpus_mixture",
    "pandas_zscore_groups",
    "sim_ann_recall",
    "graph_pagerank",
    "link_blocked_levenshtein",
    "sample_weighted",
    "zorder_layout",
    "agg_hll_sketch",
    "multimodal_frames",
    "mixture_token_budget",
    "dedup_semantic",
    "text_bigram_lm",
    "dedup_keep_best",
    "stream_quality_ingest",
    "multimodal_resize",
    "agg_countmin_sketch",
    "agg_countmin_merge",
    "agg_hist_quantiles",
    "embed_pca_power",
    "stream_hll_rollup",
    "dedup_simhash128",
    "dedup_bloom_decontaminate",
    "sample_temperature_mix",
    "pipeline_near_dedup_lsh",
    "sim_knn_join",
    "dedup_substring_spans",
    "text_ngram_topk",
    "scd2_order_history",
    "events_anomaly_mad",
    "dedup_span_coverage",
    "sample_split_by_group",
    "embed_label_outliers",
    "text_bpe_pairs",
    "embed_hard_negatives",
    "dedup_containment",
    "stream_anomaly_mad",
    "events_drift_psi",
    "source_xml_roundtrip",
    "events_top_paths",
    "basket_part_pairs",
    "multimodal_phash_pairs",
    "events_audience_overlap",
    "scd2_point_in_time",
    "scd2_merge_changes",
    "dedup_incremental_lsh",
    "graph_triangles",
    "events_ab_ztest",
    "stream_incremental_dedup",
    "text_skipgram_pairs",
    "events_forecast_baseline",
    "text_cosine_pairs",
    "events_changepoint_cusum",
    "snapshot_diff_orders",
    "text_bm25_topk",
    "text_vocab_coverage",
    "sample_curriculum_buckets",
    "events_item2vec_pairs",
    "source_compact_small_files",
    "text_token_entropy",
    "orders_rfm_segments",
    "events_activity_streaks",
    "events_minhash_audience",
    "retrieval_rrf_hybrid",
    "sample_dsir_importance",
    "text_pmi_collocations",
    "events_ks_drift",
    "profile_benford",
    "events_cohort_matrix",
    "orders_time_weighted",
    "events_markov_transitions",
    "part_pareto_classes",
    "events_attribution",
    "sample_negative_table",
    "text_ngram_novelty",
    "retrieval_mmr_rerank",
    "events_rolling_dau_wau",
    "text_zipf_fit",
    "basket_lift_rules",
    "agg_bootstrap_ci",
    "orders_yoy_growth",
    "orders_seasonal_decompose",
    "agg_weighted_median",
    "text_feature_hashing",
    "sample_kfold_folds",
    "part_price_elasticity",
    "graph_degree_stats",
    "stream_countmin_topk",
    "text_langid_confusion",
    "events_funnel_timing",
    "supplier_ship_lag",
    "orders_hhi_concentration",
    # pipeline8/9 + eval waves (added late r5)
    "agg_exact_mode",
    "agg_percentile_disc",
    "agg_winsorized_stats",
    "audit_referential",
    "embed_centroid_distances",
    "eval_auc_by_source",
    "eval_auc_quality_lang",
    "eval_brier_ece",
    "eval_calibration_bins",
    "eval_cohen_kappa",
    "eval_conformal_threshold",
    "eval_gains_deciles",
    "eval_ks_separation",
    "eval_pr_sweep",
    "events_ab_fdr",
    "events_chi_square",
    "events_did_estimate",
    "events_ewma_daily",
    "events_position_attribution",
    "events_survival_km",
    "events_user_entropy",
    "feature_quantile_bins",
    "feature_target_encode",
    "multimodal_features",
    "orders_interarrival_stats",
    "orders_theil_sen_trend",
    "profile_join_skew",
    "profile_key_candidates",
    "retrieval_ndcg_eval",
    "text_source_kl",
    "text_source_overlap",
    "feature_woe_iv",
    "orders_gini_by_nation",
    "embed_silhouette",
    "text_heaps_fit",
    "events_burstiness",
    "feature_quantile_normalize",
    "events_cliffs_delta",
    "stream_eval_calibration",
    "dedup_cluster_sizes",
    "profile_k_anonymity",
    "events_markov_backtest",
    "profile_l_diversity",
    "profile_t_closeness",
    "dedup_lsh_recall",
    "eval_average_precision",
    # round 6
    "events_level_shift_locate",
    "events_anova_hour",
    "sample_neyman_allocation",
    "text_perplexity_heldout",
    "dedup_lsh_est_hist",
    # round 6b
    "eval_regression_metrics",
    "orders_acf_lags",
    "orders_runs_test",
    "graph_jaccard_neighbors",
    "feature_mutual_information",
    "text_code_detect",
    "text_jsd_sources",
    "feature_cramers_v",
    "events_rolling_p90",
    "sample_inverse_propensity",
    # round 7
    "graph_adamic_adar",
    "graph_assortativity",
    "text_unicode_quality",
    "text_stopword_profile",
    "text_hapax_ratio",
    "text_ttr",
    "eval_macro_f1",
    "eval_mcnemar",
    "feature_robust_scaler",
    "orders_backlog_aging",
    "dedup_prefix_suffix",
    "profile_column_entropy",
    "profile_fd_candidates",
    "embed_norm_stats",
    "embed_dimension_variance",
    "multimodal_png_roundtrip",
    "events_welch_ttest",
    "source_json_corrupt_audit",
    # round 7b
    "sample_kcenter_coreset",
    "agg_median_of_means",
    "events_peak_detection",
    "feature_hash_collisions",
    "embed_prefix_norm_ratio",
    "orders_xyz_variability",
    # round 7c (sqlite_parallel_roundtrip excluded: times temp-file SQLite IO)
    "text_gopher_rules",
    "text_keyword_stuffing",
    "events_slo_burn",
    "orders_duplicate_payments",
    "eval_ab_srm",
    # round 7d
    "dedup_source_crosstab",
    "eval_cost_threshold",
    "sample_temporal_split",
    "embed_centroid_drift",
    # round 7e
    "events_bot_screen",
    "events_funnel_wilson",
    "profile_stats_drift",
    "orders_tail_index",
    "graph_coorder_projection",
    # round 8: engine queries that had simply never joined HEADLINE
    # (VERDICT r7 #3) — after this, the excluded list is ONLY genuine
    # temp-file/streaming harnesses (sqlite/csv/json/binaryfile
    # round-trips + the 8 stream_* micro-batch harnesses)
    "filter_glob",
    "filter_predicates",
    "join_anti",
    "join_cross_theta",
    "expr_case_cast",
    "window_lag_lead",
    "set_ops_except",
    "set_ops_intersect",
    "subquery_in",
    "distinct_projection",
    "agg_group_concat",
    "date_julianday",
    # round 8 wave
    "profile_wasserstein_drift",
    "events_mann_whitney",
    "lineitem_spearman",
    "graph_kcore",
    "events_hourly_similarity",
    "events_markov_entropy",
    "part_pareto_migration",
    "text_url_parse",
    "text_url_canonical_dedup",
    "dedup_per_domain",
    "sample_stratified_reservoir",
    "retrieval_query_likelihood",
    "text_char_trigrams",
    "text_length_percentiles",
    "embed_pq_codebook",
    "embed_pq_codes",
    "multimodal_channel_stats",
    "events_double_ewma",
    "text_shared_shingles",
    "graph_bfs_hops",
    "graph_local_clustering",
    "text_chao1_vocab",
    "text_burrows_delta",
    "lineitem_revenue_bridge",
    "embed_jl_distortion",
    "embed_intrinsic_dim",
    "graph_ktruss",
    "multimodal_image_entropy",
    "orders_skyline_customers",
    "events_periodogram",
    "customer_mahalanobis_top",
    "graph_rich_club",
    "graph_label_modularity",
    # round 9 wave
    "lineitem_kendall_tau",
    "retrieval_rank_agreement",
    "retrieval_rerank_features",
    "dedup_lcs_spans",
    "embed_source_whitening",
    "embed_abtt_projections",
    "events_poisson_rate",
    "profile_inclusion_deps",
    "embed_ivf_recall",
    "dedup_simhash_hist",
    "lineitem_price_index",
    "asof_forward_tolerance",
    "sample_contrastive_triplets",
    "profile_dp_counts",
    "text_bpe_merges",
    "events_cuped",
    "embed_prefix_recall",
    "eval_auc_delong",
    "dedup_soft_weights",
    # r10 wave — all pure engine queries
    "dedup_span_clusters",
    "text_tokenizer_fertility",
    "dedup_decontam_stratified",
    "agg_bottomk_quantiles",
    "events_cuped_stratified",
    "agg_decimal_ledger",
    "profile_key_checksums",
    "profile_exact_ratios",
    "orders_cohort_ltv",
    "graph_hyperball_harmonic",
    "eval_bradley_terry",
    "dedup_lsh_tuning",
    "sample_preference_pairs",
    "pipeline_curation_funnel",
    # r11 wave
    "agg_ddsketch_quantiles",
    "agg_ddsketch_merge",
    "mixture_epochs_exhaustion",
    "embed_drift_cusum",
    "eval_contamination_splits",
    "pipeline_curation_incremental",
    "eval_pass_at_k",
    "agg_ddsketch_error_audit",
    "dedup_clusters_incremental",
    # stream_ddsketch_rollup excluded: SQLite-bridge micro-batch harness
    # (temp-file IO), same policy as stream_bottomk_rollup
    # --- round 12 wave ---
    "profile_wide_varchar",
    "profile_wide_limbs",
    "sample_weighted_priority",
    "sample_weighted_priority_merge",
    "agg_ddsketch_signed",
    "agg_ddsketch_signed_error_audit",
    "mixture_priority_budget",
    "eval_contamination_incremental",
    "dedup_state_drift_audit",
    "dedup_retention_by_source",
    # --- round 12 wave 4 ---
    "agg_kmv_intersect",
    "agg_kmv_merge",
    "events_pattern_match",
    "events_sprt_sequential",
    "eval_krippendorff_alpha",
    "eval_qini_uplift",
    "sample_systematic_pps",
    "orders_croston_forecast",
    "events_silence_gaps",
    "embed_cka_views",
]


def _warm(spark) -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sqlitedataframe_spark.io import load_table

    wd = "/root/testdata/sf0.001"
    li = load_table(spark, wd, "lineitem")
    n = load_table(spark, wd, "nation")
    c = load_table(spark, wd, "customer")
    (
        li.filter(F.col("l_quantity") > 0)
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity"))
        .collect()
    )
    c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_name", "n_name", F.row_number().over(
            Window.partitionBy("c_nationkey").orderBy("c_custkey")
        ).alias("rn")
    ).collect()
    load_table(spark, wd, "embeddings").select(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double")),
            F.lit(0.0),
            lambda a, x: a + x * x,
        )
    ).collect()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    # optional subset (comma-separated names): spot-bench newly added
    # queries without re-running the whole suite. The driver never sets
    # this — its per-round artifact always covers the full HEADLINE.
    only = [q for q in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",") if q]
    full_headline = list(HEADLINE)
    if only:
        unknown = [q for q in only if q not in HEADLINE]
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_BENCH_ONLY names not in HEADLINE: {unknown}")
        HEADLINE[:] = only
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    registry = load_all()
    spark = get_spark("bench")
    # Warm the ENGINE (not any measured plan): JVM + parquet vectorized
    # reader + hash-agg/broadcast-join/window codegen paths, compiled once
    # against the tiny sf0.001 fixtures so the first measured query isn't
    # charged for framework initialization.
    spark.range(1).count()
    _warm(spark)

    # Noise protocol (VERDICT r3 #3, re-sized per VERDICT r4 #1): the
    # sandbox shows same-code swings up to 33x on single-shot timings, so
    # the per-query value is the MEDIAN of up to `reps` INTERLEAVED passes
    # (full passes, not back-to-back repeats, so a noisy window lands on
    # different queries in different passes). Median (not min) because the
    # headline is a suite total — medians sum to a representative wall
    # figure; min-of-N would report an unachievable best-case composite.
    #
    # Budget protocol (r4: the 420 s budget was smaller than one driver
    # pass, so every query degraded to n=1 exactly when reps mattered):
    # - Pass 1 (coverage) ALWAYS runs in full, budget ignored.
    # - Later passes run EXPENSIVE-FIRST (descending pass-1 median): the
    #   queries whose single shots can be 30x outliers are the ones that
    #   need replication; sub-second queries are the only ones allowed to
    #   end at n=1 if the budget runs dry.
    # - A rep only starts if its projected time (median so far x1.3) fits
    #   the remaining budget, so the bench overruns the budget by at most
    #   one mis-estimated query, never unboundedly.
    # - The full artifact (sidecar + compact stdout line) is REWRITTEN
    #   after every pass: if the driver kills the process mid-pass, the
    #   last flushed line is still a complete, parseable artifact of the
    #   passes that finished.
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "1100"))
    bench_t0 = time.time()
    rep_times: dict[str, list[float]] = {name: [] for name in HEADLINE}
    errors: dict[str, str] = {}

    def _median(xs: list[float]) -> float:
        s = sorted(xs)
        n = len(s)
        mid = s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2
        return round(mid, 3)

    def _run_one(name: str, rep: int) -> None:
        # Per-query isolation: one broken query must never abort the
        # suite (r02's bench died mid-run on a single analysis error and
        # the whole round went unscored).
        t0 = time.time()
        try:
            q = registry[name]
            n = len(q.spark_fn(spark, sf_dir).collect())
            dt = round(time.time() - t0, 3)
            rep_times[name].append(dt)
            print(f"# [{rep + 1}/{reps}] {name}: {dt:.3f}s ({n} rows)",
                  file=sys.stderr, flush=True)
        except Exception as exc:  # noqa: BLE001 — bench must always finish
            errors[name] = f"{type(exc).__name__}: {exc}"[:400]
            print(f"# [{rep + 1}/{reps}] {name}: ERROR {errors[name]}",
                  file=sys.stderr, flush=True)
        finally:
            # release operator-registered caches (minhash signature tables
            # etc. — safe: persist keeps lineage): queries stay independent
            # and blocks don't build memory pressure across the
            # 160+-query session. NOT spark.catalog.clearCache(): that
            # also unpersisted the KEYED session-shared frames
            # (shared_eager_cache — the MinHash signature table, the
            # co-order edge list), silently re-charging every later rep
            # for a rebuild the architecture deliberately amortizes; the
            # oracle gate's hygiene (release_caches only) is the correct
            # one, and every operator persist() is register_cache-tracked
            # (r10; this is what made graph_local_clustering's solo median
            # ~2x its r8 close — VERDICT r9 #4).
            try:
                from sqlitedataframe_spark.operators.util import (
                    release_caches,
                    sweep_unshared_rdds,
                )

                release_caches()
                sweep_unshared_rdds(spark)
            except Exception:
                pass
            gc.collect()

    def _emit(final: bool) -> dict:
        timings = {k: _median(v) for k, v in rep_times.items() if v}
        spread = {
            k: {"min": min(v), "max": max(v), "n": len(v)}
            for k, v in rep_times.items()
            if v
        }
        # a query is an error only if EVERY rep failed
        errs = {k: v for k, v in errors.items() if not rep_times.get(k)}
        sum_of_medians = round(sum(timings.values()), 3)
        # Self-describing coverage (VERDICT r6 #7): the headline set is a
        # subset of the registry (bridge/streaming-harness queries that
        # benchmark temp-file IO rather than the engine are excluded); list
        # them explicitly so a reader can't mistake the headline set for
        # the full registry. Exclusions are ALWAYS relative to the full
        # headline; a SPARK_GRAFT_BENCH_ONLY spot run is marked `subset`.
        excluded = sorted(set(registry) - set(full_headline))
        # One-time session-shared frame builds (ADVICE r10 / VERDICT r12
        # #7): bench hygiene deliberately preserves shared_eager_cache
        # frames across queries, so the build cost lands on whichever
        # consumer runs first and later reps read cache — the median would
        # silently drop it. The headline `value` therefore ADDS the build
        # seconds back: value = sum(medians) + shared_cache_build_total,
        # with both components emitted so the accounting is reconstructible.
        build_seconds: dict[str, float] = {}
        try:
            from sqlitedataframe_spark.operators.util import (
                SHARED_BUILD_SECONDS,
            )

            build_seconds = dict(SHARED_BUILD_SECONDS)
        except Exception:
            pass
        build_total = round(sum(build_seconds.values()), 3)
        total = round(sum_of_medians + build_total, 3)
        full = {
            "metric": "suite_total_wall_seconds",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "spread": spread,
            "reps": reps,
            "errors": errs,
            "sf": sf,
            "sum_of_medians": sum_of_medians,
            "n_registry": len(registry),
            "excluded": excluded,
        }
        if build_seconds:
            full["shared_cache_build"] = build_seconds
            full["shared_cache_build_total"] = build_total
        if only:
            full["subset"] = True
        if errs:
            # the total excludes failed queries, so a cross-round
            # comparison must not read a lower value as an improvement
            full["incomplete"] = True
        try:
            with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "bench_detail.json"), "w") as f:
                json.dump(full, f, indent=1)
        except OSError:
            pass
        # Compact summary FIRST (headline number survives even a tiny tail
        # capture), then the FINAL line is the driver-contract JSON object
        # carrying the full per-query dict (VERDICT r12 #2: the per-query
        # timings must land where PERF's parser reads them — the last line).
        tail = {
            "metric": "suite_total_wall_seconds",
            "value": total,
            "unit": "sec",
            "sf": sf,
            "reps": reps,
            "sum_of_medians": sum_of_medians,
            "shared_cache_build_total": build_total,
            "n_queries": len(timings),
            "n_errors": len(errs),
            "n_registry": len(registry),
            "n_excluded": len(excluded),
            "detail": "bench_detail.json",
        }
        if only:
            tail["subset"] = True
        if errs:
            tail["incomplete"] = True
        if final:
            print(json.dumps(tail), flush=True)
            final_line = dict(full)
            final_line.pop("spread", None)  # bound the line; spread lives
            final_line.pop("excluded", None)  # in bench_detail.json
            final_line["n_excluded"] = len(excluded)
            print(json.dumps(final_line), flush=True)
        else:
            print(json.dumps(tail), flush=True)
        return full

    for name in HEADLINE:  # pass 1: full coverage, unconditional
        _run_one(name, 0)
    _emit(final=False)

    for rep in range(1, reps):
        if time.time() - bench_t0 > budget:
            print(f"# budget {budget}s reached before pass {rep + 1}",
                  file=sys.stderr, flush=True)
            break
        # expensive-first; sub-second queries yield the budget to the ones
        # whose outliers actually move the headline
        order = sorted(
            (n for n in HEADLINE if rep_times[n]),
            key=lambda n: -_median(rep_times[n]),
        )
        started = 0
        for name in order:
            remaining = budget - (time.time() - bench_t0)
            if remaining <= 0:
                break
            if _median(rep_times[name]) * 1.3 > remaining:
                continue  # later (cheaper) queries may still fit
            _run_one(name, rep)
            started += 1
        if started:
            _emit(final=False)

    _emit(final=True)


if __name__ == "__main__":
    main()
