"""Structural allowlist for the whole-registry plan audit.

``tools/plan_audit.py`` flags every query whose physical plan contains a
nested-loop or cartesian join. Each flag in this map has been adjudicated
benign (full prose in ``PLANS.md``): the non-equi side is a one-row or
bounded-frame broadcast — scalar stats rows, quantile boundaries,
<= 64-row prefix-sum offset frames, a <= 500-row rank spine — chosen
*deliberately* over the single-partition global window the audit bans.

The audit (and ``tests/test_plans.py``) asserts its flagged set is a
SUBSET of this map: a new cartesian in an unrelated query fails CI
instead of blending into prose. Adding a name here requires writing the
reason string, i.e. doing the adjudication.
"""

from __future__ import annotations

# query name -> why its nested-loop/cartesian flag is benign
BENIGN_NESTED_LOOP: dict[str, str] = {
    # --- scalar-subquery / capability demos -------------------------------
    "join_cross_theta": "intentional cross/theta-join capability demo (tiny inputs)",
    "subquery_scalar": "scalar subquery = 1-row broadcast cross",
    "q11_important_parts": "scalar HAVING threshold = 1-row broadcast cross",
    "q22_sales_opportunity": "scalar avg-balance subquery = 1-row broadcast cross",
    # --- 1-row grand-total / stats-row broadcasts -------------------------
    "basket_lift_rules": "1-row basket grand total broadcast onto the rule grid",
    "corpus_mixture": "1-row corpus token grand total broadcast",
    "mixture_token_budget": "1-row corpus token grand total broadcast",
    "sample_temperature_mix": "1-row token grand total broadcast (mixture family)",
    "sample_negative_table": "1-row positive/negative totals broadcast",
    "sample_dsir_importance": "bucket-LM grand-total rows broadcast onto buckets",
    "sample_curriculum_buckets": "1-row quantile-boundaries aggregate broadcast",
    "text_bigram_lm": "1-row vocabulary count broadcast (add-k smoothing)",
    "text_bm25_topk": "1-row (N, avgdl) corpus stats broadcast",
    "text_cosine_pairs": "1-row corpus-size broadcast for idf",
    "text_tfidf_topk": "1-row corpus-size broadcast for idf",
    "text_feature_hashing": "1-row corpus-size broadcast",
    "text_pmi_collocations": "1-row corpus token total broadcast",
    "text_source_kl": "1-row global token total broadcast",
    "text_vocab_coverage": "top-100 vocabulary array in a single broadcast row",
    "profile_benford": "1-row digit grand total broadcast over the 9-digit grid",
    "graph_degree_stats": "1-row total/alpha moments broadcast",
    "graph_triangles": "cross of two 1-row aggregates (edge count x triangle count)",
    "feature_quantile_bins": "1-row bin-boundaries aggregate cross",
    "feature_target_encode": "1-row global prior broadcast",
    "feature_woe_iv": "quantile boundaries + 1-row pos/neg totals broadcast",
    "events_chi_square": "1-row grand total broadcast over the contingency grid",
    "orders_rfm_segments": "1-row anchor-date + quantile-boundary broadcasts",
    "orders_interarrival_stats": "1-row customer-count denominator broadcast",
    "retrieval_rrf_hybrid": "1-row BM25 stats + 1-row query vector broadcasts",
    "retrieval_ndcg_eval": "1-row DCG/IDCG crosses + k*k (=100) rank self-join",
    "sim_bruteforce_topk": "broadcast of the single query vector",
    "sim_ann_recall": "broadcast of the 8 evaluation query vectors",
    "eval_cohen_kappa": "1-row observed-vs-expected agreement cross",
    "events_welch_ttest": "1-row grand-total moments broadcast onto #groups rows",
    "orders_backlog_aging": "1-row max-order-date anchor broadcast",
    "events_peak_detection": "bounded +/-3-day triangular calendar join over the #days frame",
    "feature_hash_collisions": "1-row combo-count broadcast cross onto the 1-row bucket rollup",
    "eval_cost_threshold": "19-row threshold-grid literal cross + 1-row argmin broadcast",
    "sample_temporal_split": "1-row percentile-cut broadcast + 1-row user-overlap count cross",
    "embed_drift_cusum": (
        "16x16 bounded theta-join computing the CUSUM prefix sum + running "
        "min over the 16-row post-aggregate batch frame — the deliberate "
        "alternative to the unpartitioned ordered Window plan_audit "
        "hard-errors on (restructured r12 per ADVICE r11 #1)"
    ),
    "events_funnel_wilson": "crosses of 1-row funnel-stage count aggregates",
    "orders_tail_index": "1-row top-k boundary (min) broadcast onto the 101-row frame",
    "eval_pr_sweep": "1-row P/N totals; threshold expansion over score-bucket frame",
    "eval_ks_separation": "2-row class-tag spine cross",
    "events_ks_drift": "2-row snapshot-tag spine cross",
    # --- bounded-frame self-joins replacing a banned global window --------
    "rowid_surrogate": "#partitions-row zipWithIndex offset frame",
    "rowid_fact_scale": "#partitions-row zipWithIndex offset frame",
    "part_pareto_classes": "<=64-row bucket-offset join (two-level prefix sum)",
    "eval_auc_quality_lang": "<=64-row coarse-bucket offset join (prefix sum)",
    "eval_conformal_threshold": "1-row q_hat/n_cal + <=64-row bucket offset join",
    "eval_gains_deciles": "<=16-row triangular decile cumulative",
    "events_cliffs_delta": "<=64-row coarse-bucket offset join (prefix sum)",
    "events_ab_fdr": "tests-sized (~5-row) BH rank self-join + 1-row m/k* rows",
    "events_ewma_daily": "#days-bounded triangular self-join (days^2/2 pairs)",
    "events_survival_km": "~30-row triangular product-limit joins + 1-row horizon",
    "events_minhash_audience": "inequality join over the tens-of-rows sketch table",
    "orders_seasonal_decompose": "#months-bounded moving-average self-join",
    "orders_theil_sen_trend": "months^2/2 slope pairs (~700 rows) + 1-row count",
    "text_zipf_fit": "<=500-row count-of-better rank self-join",
    "text_heaps_fit": "1-row OLS moments + <=16-row triangular cumulative",
    # --- round-6 additions -------------------------------------------------
    "events_level_shift_locate": "#days triangular cusum join + 1-row argmax/totals",
    "sample_neyman_allocation": "1-row allocation-weight total broadcast",
    "dedup_lsh_recall": "set arithmetic over two tiny pair frames (1-row ratio crosses)",
    "eval_average_precision": "<=64-row coarse-bucket offset join + 1-row P total (prefix sum)",
    "events_markov_backtest": "1-row accuracy/baseline crosses over the <=|types|-row model",
    "profile_t_closeness": "1-row global-distribution + worst-class broadcasts over QI cells",
    "feature_mutual_information": "1-row grand-total broadcast onto the |A|x|B| cell frame",
    "orders_runs_test": "#days triangular successor join + 1-row totals/changes crosses",
    "feature_cramers_v": "1-row total/level-count broadcasts onto the |A|x|B| cell frame",
    "text_jsd_sources": "1-row corpus token grand total broadcast (source_kl shape)",
    "sample_inverse_propensity": "1-row population/sample total broadcasts onto #groups",
    # --- round-8 additions -------------------------------------------------
    "profile_wasserstein_drift": "#groups-row spine cross + <=64-row bucket-offset joins (two-level prefix sum)",
    "events_mann_whitney": "1-row tie-term/grand-total broadcast onto #groups + <=64-row bucket offsets",
    "events_markov_entropy": "1-row transition grand-total broadcast onto the <=|types|-row entropy frame",
    "part_pareto_migration": "two <=64-row bucket-offset joins + 1-row totals (pareto recipe, per period)",
    "retrieval_query_likelihood": "1-row (cf_t, T) corpus-stats broadcast (bm25 shape)",
    "events_double_ewma": "two #days-bounded triangular self-joins (days^2/2 pairs each, ewma_daily shape twice)",
    "text_burrows_delta": "#sources x top-30 token grid cross (<=600 rows) + frame-bounded z-pair join",
    "embed_intrinsic_dim": "fixture-bounded distance matrix (vec_id < 300 both sides — constant at any SF)",
    "lineitem_revenue_bridge": "1-row year-bounds broadcast onto the #years x #brands frame",
    "orders_skyline_customers": "triangular join over the #distinct-order-counts frame (<=64 rows)",
    "events_periodogram": "#days triangular index join + 1-list x 12-harmonic cross",
    "customer_mahalanobis_top": "1-row moments broadcast onto the per-customer frame (Welch shape)",
    "graph_label_modularity": "1-row edge-count broadcast onto the #communities frame",
    # --- round-9 additions -------------------------------------------------
    "events_poisson_rate": "1-row epoch-midpoint bounds broadcast onto the scan",
    "retrieval_rank_agreement": "1-row query vector + 1-row BM25 stats broadcasts; tau runs on the <=50-row shared-rank frame",
    "retrieval_rerank_features": "1-row query vector + 1-row BM25 stats broadcasts; features join on the <=100-row candidate frame",
    "profile_inclusion_deps": "per-candidate cross of two 1-row count aggregates (distinct-set sizes)",
    "embed_ivf_recall": "8-query broadcast crosses (exact scoring + cell ranking) + 3-row probe-grid cross over the #queries x #cells frame",
    "sample_contrastive_triplets": "1-row corpus-count broadcast onto the k-bounded LSH positive pairs",
    "events_cuped": "1-row epoch-midpoint bounds + 1-row pooled-moment broadcasts (welch shape)",
    "events_cuped_stratified": "1-row epoch-midpoint bounds broadcast (events_cuped shape; pooled moments join keyed on stratum)",
    "embed_prefix_recall": "8-query broadcast crosses (full-dim + per-prefix sliced scoring) + 2-row dim-grid spine",
    "eval_auc_delong": "<=64-row bucket-offset prefix-sum joins + 1-row moment crosses (auc_quality_lang shape)",
    "dedup_lsh_tuning": "5-row literal (bands, rows) config grid broadcast-crossed with the <=65-cell match-count frame",
    # --- r11 wave ----------------------------------------------------------
    "mixture_epochs_exhaustion": "1-row (total tokens, sum-of-sqrt) corpus stats broadcast (mixture family)",
    "embed_drift_cusum": "1-row max-vec_id batch-bound broadcast + 1-row reference-mean-drift broadcast onto the 16-row batch frame",
    "eval_contamination_splits": "1-row train-corpus-count broadcast onto the 3-row split report",
    "eval_contamination_incremental": "1-row train-corpus-count broadcast onto the 3-row split report (incremental variant)",
    "eval_pass_at_k": "3-row literal k grid broadcast-crossed with the bounded (task, problem) count cells (lsh_tuning shape)",
    # --- r12 wave 4 ---------------------------------------------------------
    "eval_krippendorff_alpha": "cross of two 1-row aggregates (category-marginal totals x disagreeing-pair count)",
    "eval_qini_uplift": "triangular cumulative over the score-value frame (bounded by max per-user engagement, not user count) — the gains_deciles pattern",
    "sample_systematic_pps": "256-row shard-offset triangular join (distributed prefix sum) + 1-row (W, I, r) totals broadcast",
}
