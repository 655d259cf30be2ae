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
    # r12 (VERDICT r11 #4): after the unseen wave (agg_decimal_ledger
    # re-fronts plus the 8 new r12 queries), keep one probe of EACH
    # driver-normalizer cell class green every round...
    "profile_key_checksums",   # BIGINT past 2^53
    "profile_exact_ratios",    # full-precision doubles
    # ...then spend the remaining budget on the float-ROUND-heavy set
    # whose last driver-green row is <= r8 (computed from the union of
    # CORRECTNESS_r*.json), so normalizer drift in the OLDER float
    # classes would surface now rather than by accident later.
    "events_welch_ttest",
    "events_funnel_wilson",
    "events_ks_drift",
    "events_cliffs_delta",
    "events_chi_square",
    "events_anomaly_mad",
    "events_changepoint_cusum",
    "events_did_estimate",
    "events_markov_entropy",
    "events_periodogram",
    "events_survival_km",
    "events_hourly_similarity",
    "events_slo_burn",
    "eval_auc_quality_lang",
    "eval_cohen_kappa",
    "eval_conformal_threshold",
    "eval_gains_deciles",
    "eval_ks_separation",
    "eval_macro_f1",
    "eval_mcnemar",
    "eval_pr_sweep",
    "eval_regression_metrics",
    "eval_ab_srm",
    "embed_centroid_drift",
    "embed_dimension_variance",
    "embed_intrinsic_dim",
    "embed_jl_distortion",
    "embed_norm_stats",
    "embed_silhouette",
    "embed_pq_codebook",
    "embed_label_outliers",
    "feature_cramers_v",
    "feature_mutual_information",
    "feature_robust_scaler",
    "orders_gini_by_nation",
    "orders_hhi_concentration",
    "orders_tail_index",
    "orders_time_weighted",
    "orders_xyz_variability",
    "text_burrows_delta",
    "text_chao1_vocab",
    "text_heaps_fit",
    "text_zipf_fit",
    "profile_wasserstein_drift",
    "part_price_elasticity",
    "customer_mahalanobis_top",
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
