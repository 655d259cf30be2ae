"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full suite registry
(sqlitedataframe_spark.suite) for the DuckDB correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sqlitedataframe_spark.suite import load_all  # noqa: E402

_REPO = os.path.dirname(os.path.abspath(__file__))


#: The driver records CORRECTNESS rows for a bounded prefix of queries()
#: (~50). Keeping the never-driver-checked set at or under this budget per
#: round is what guarantees every registry query has a driver-green row;
#: tests/test_suite.py asserts it at round close (VERDICT r6 #4).
DRIVER_CHECK_BUDGET = 50


def _seen_names() -> set[str]:
    """Names with a GREEN row in any prior ``CORRECTNESS_r*.json``."""
    import glob
    import json

    seen: set[str] = set()
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                rows = json.load(f)
            if isinstance(rows, dict):
                # only GREEN rows count as seen: a red row (err, or any
                # comparison False) means the fix still needs a driver-green
                # row, so the query re-fronts next round
                for name, row in rows.items():
                    if not isinstance(row, dict):
                        seen.add(name)
                        continue
                    if row.get("err") is None and all(
                        row.get(k) is not False
                        for k in ("rows_match", "schema_match", "hash_match")
                    ):
                        seen.add(name)
                    elif (
                        row.get("err") == "no_oracle"
                        and (row.get("spark_rows") or 0) > 0
                    ):
                        # By-nature rows-only queries (e.g. agg_approx) can
                        # never hash-match; a recorded rows-only row IS their
                        # passing entry — don't re-front them forever.
                        seen.add(name)
        except (OSError, ValueError):
            continue
    return seen


def _unseen_names() -> list[str]:
    """Registry names with NO driver-green row yet, prioritized: bridge
    round-trips and fresh additions lead (they prove the most surface and
    register last in module order, so a bounded capture would otherwise
    drop them first)."""
    reg = load_all()
    seen = _seen_names()
    names = list(reg.keys())
    lead = [
        "sqlite_roundtrip",
        "sqlite_dialect_sql",
        "source_csv_roundtrip",
        "source_json_roundtrip",
        "sqlite_dialect_sql2",
        "source_orc_roundtrip",
        "source_text_gz",
        "source_partitioned_pruning",
        "text_chunk_windows",
        "text_pack_sequential",
        "window_exclude_minmax",
        "sample_hash_deterministic",
        "sample_train_test_split",
        "sample_stratified",
        "text_tfidf_topk",
        "dedup_connected_components",
        "range_join_events",
        "embed_label_centroids",
        "merge_upsert_orders",
        "profile_orders",
        "pipeline_near_dedup",
        "embed_quantize_int8",
        "sample_cap_per_class",
        "source_schema_evolution",
        "text_repetition",
        "text_redact_spans",
        "sample_cap_per_class_approx",
        "agg_histogram",
        "agg_corr_covar",
        "events_funnel",
    ]
    unseen = [n for n in names if n not in seen]
    return [n for n in lead if n in unseen] + [n for n in unseen if n not in lead]


#: Rotation leads (VERDICT r7 #5): after the unseen queries, the driver's
#: remaining budget slots re-prove FLOAT-ROUND-exposed queries — the
#: welch-class whose oracle ROUNDs float aggregates (all 122 verified
#: layout-stable by tools/parity_sweep.py this round; the driver row is
#: the hard signal that the drift-proofing holds in ITS environment too).
ROTATION_LEADS = [
    # r11 (VERDICT r10 #4): the Decimal-representation fix first — the
    # fixed agg_decimal_ledger re-fronts as unseen (its r10 row was red);
    # the rotation re-proves the other two checker-fidelity probes and
    # the full r10 wave so the integer-scale convention is driver-proven
    # across the whole new surface immediately, then the CAST-aligned
    # pair re-adjudicated under the tightened norm_cell, then the
    # signed-zero / float-ROUND set.
    "profile_key_checksums",
    "profile_exact_ratios",
    "dedup_span_clusters",
    "text_tokenizer_fertility",
    "dedup_decontam_stratified",
    "agg_bottomk_quantiles",
    "events_cuped_stratified",
    "orders_cohort_ltv",
    "graph_hyperball_harmonic",
    "eval_bradley_terry",
    "dedup_lsh_tuning",
    "sample_preference_pairs",
    "pipeline_curation_funnel",
    "stream_bottomk_rollup",
    "eval_cost_threshold",
    "feature_quantile_normalize",
    # r9: the signed-zero-convention set — every query whose ROUND
    # output is a signed near-zero statistic now carries `+ 0.0` on both
    # sides (the welch fix generalized); the driver row re-proves it
    "events_welch_ttest",
    "lineitem_spearman",
    "events_mann_whitney",
    "orders_runs_test",
    "events_ab_ztest",
    "pandas_zscore_groups",
    "feature_woe_iv",
    "graph_assortativity",
    "graph_label_modularity",
    "events_double_ewma",
    "events_anova_hour",
    "agg_stats_moments",
    "agg_corr_covar",
    "agg_bootstrap_ci",
    "agg_winsorized_stats",
    "orders_theil_sen_trend",
    "orders_interarrival_stats",
    "orders_seasonal_decompose",
    "orders_acf_lags",
    "eval_brier_ece",
    "eval_calibration_bins",
    "eval_average_precision",
    "eval_auc_by_source",
    "events_burstiness",
    "events_ewma_daily",
    "events_drift_psi",
    "events_forecast_baseline",
    "events_user_entropy",
    "text_token_entropy",
    "text_jsd_sources",
    "text_source_kl",
    "text_perplexity_heldout",
    "text_bigram_lm",
    "embed_silhouette",
    "embed_pca_power",
    "embed_centroid_distances",
    "feature_target_encode",
    "gapfill_timeseries",
    "graph_pagerank",
    "profile_stats_drift",
    "supplier_ship_lag",
]


def _ordered_names() -> list[str]:
    """Registry names with never-driver-checked queries FIRST, then the
    float-ROUND rotation leads, then everything else in registry order.

    The driver records CORRECTNESS rows for a bounded prefix of
    ``queries()`` (~DRIVER_CHECK_BUDGET). Queries absent from every prior
    ``CORRECTNESS_r*.json`` are rotated to the front so they get their
    driver-green row this round; the rotation leads spend the remaining
    budget slots on the drift-sensitive queries worth re-proving.
    """
    unseen = _unseen_names()
    head = set(unseen)
    rot = [n for n in ROTATION_LEADS if n not in head and n in load_all()]
    head |= set(rot)
    return unseen + rot + [n for n in load_all() if n not in head]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    registry = load_all()
    return registry["q01_pricing_summary"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    reg = load_all()
    return {name: reg[name].spark_fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    reg = load_all()
    return {
        name: reg[name].oracle
        for name in _ordered_names()
        if reg[name].oracle is not None
    }
