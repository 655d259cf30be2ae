"""Round-5 closing-wave operators: referential audit, key candidates,
quantile bins, LOO target encoding, winsorized stats, ranking eval,
chi-square independence, EWMA, source n-gram overlap, exact mode."""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import functions as F


def test_referential_audit_counts_orphans(spark):
    child = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (9, "d")], ["fk", "payload"]
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], ["pk"])
    rows = {
        r["relation"]: r
        for r in __import__(
            "sqlitedataframe_spark.operators.profiling", fromlist=["x"]
        ).referential_audit([("c->p", child, "fk", parent, "pk")]).collect()
    }
    r = rows["c->p"]
    assert r["child_rows"] == 4
    assert r["orphan_rows"] == 1  # fk=9, one row
    assert r["orphan_pct"] == 25.0


def test_referential_audit_null_child_key_is_orphan(spark):
    from sqlitedataframe_spark.operators.profiling import referential_audit

    child = spark.createDataFrame([(None,), (1,)], "fk: int")
    parent = spark.createDataFrame([(1,)], ["pk"])
    r = referential_audit([("r", child, "fk", parent, "pk")]).collect()[0]
    assert r["orphan_rows"] == 1


def test_key_candidates_flags(spark):
    from sqlitedataframe_spark.operators.profiling import key_candidates

    df = spark.createDataFrame(
        [(1, "x", None), (2, "x", "a"), (3, "y", "b")],
        "id: bigint, dup: string, holey: string",
    )
    rows = {r["column_name"]: r for r in key_candidates(
        df, ["id", "dup", "holey"]
    ).collect()}
    assert rows["id"]["is_candidate_key"] is True
    assert rows["id"]["n_distinct"] == 3
    assert rows["dup"]["is_candidate_key"] is False
    assert rows["dup"]["n_distinct"] == 2
    # distinct excludes NULL (SQL semantics), null count sees it
    assert rows["holey"]["n_nulls"] == 1
    assert rows["holey"]["n_distinct"] == 2
    assert rows["holey"]["is_candidate_key"] is False


def test_quantile_bins_equal_frequency(spark):
    from sqlitedataframe_spark.operators.features import quantile_bins

    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], ["v"])
    rows = {r["bin"]: r for r in quantile_bins(df, "v", n_bins=4).collect()}
    assert set(rows) == {1, 2, 3, 4}
    # quartile boundaries of 1..100 interpolate between order statistics;
    # each bin holds ~25 rows
    assert sum(r["n"] for r in rows.values()) == 100
    assert all(24 <= r["n"] <= 26 for r in rows.values())
    assert rows[1]["bin_min"] == 1.0
    assert rows[4]["bin_max"] == 100.0
    # bins are ordered and non-overlapping
    assert rows[1]["bin_max"] < rows[2]["bin_min"] + 1e-9


def test_target_encode_loo_hand_checked(spark):
    from sqlitedataframe_spark.operators.features import target_encode_loo

    df = spark.createDataFrame(
        [("A", 1.0), ("A", 0.0), ("B", 1.0), ("B", 1.0)], ["cat", "t"]
    )
    # prior = 0.75, m = 2
    rows = {r["cat"]: r for r in target_encode_loo(
        df, "cat", "t", smoothing=2.0
    ).collect()}
    # A rows: (1-1+1.5)/3 = 0.5 ; (1-0+1.5)/3 = 0.833333
    assert rows["A"]["enc_min"] == 0.5
    assert rows["A"]["enc_max"] == round(2.5 / 3 + 1e-9, 6)
    # B rows both: (2-1+1.5)/3 = 0.833333
    assert rows["B"]["enc_min"] == rows["B"]["enc_max"]
    assert rows["B"]["n"] == 2


def test_winsorized_stats_matches_numpy(spark):
    from sqlitedataframe_spark.operators.profiling import winsorized_stats

    vals = [float(v) for v in range(1, 20)] + [1000.0]
    df = spark.createDataFrame([("g", v) for v in vals], ["grp", "v"])
    r = winsorized_stats(df, "v", "grp", p_lo=0.05, p_hi=0.95).collect()[0]
    lo = float(np.percentile(vals, 5))   # numpy 'linear' == quantile_cont
    hi = float(np.percentile(vals, 95))
    clipped = np.clip(vals, lo, hi)
    assert r["p_lo"] == round(lo + 1e-9, 4)
    assert r["p_hi"] == round(hi + 1e-9, 4)
    assert r["winsorized_mean"] == round(float(clipped.mean()) + 1e-9, 2)
    assert r["n_clipped_low"] == int((np.array(vals) < lo).sum())
    assert r["n_clipped_high"] == int((np.array(vals) > hi).sum())


def test_ranking_eval_perfect_ranking(spark):
    from sqlitedataframe_spark.operators.retrieval import ranking_eval

    # relevance: ids 1..3 graded 3,2,1; everything else 0
    rel = spark.createDataFrame(
        [(1, 3), (2, 2), (3, 1), (4, 0), (5, 0)], ["doc_id", "rel"]
    )
    ranked = spark.createDataFrame(
        [(1, 0.9), (2, 0.8), (3, 0.7)], ["doc_id", "score"]
    )
    r = ranking_eval(ranked, rel, k=3).collect()[0]
    assert r["ndcg_at_3"] == 1.0
    assert r["mrr_at_3"] == 1.0
    assert r["precision_at_3"] == 1.0
    assert r["n_relevant_retrieved"] == 3


def test_ranking_eval_miss_at_top(spark):
    from sqlitedataframe_spark.operators.retrieval import ranking_eval

    rel = spark.createDataFrame(
        [(1, 1), (2, 0), (3, 0)], ["doc_id", "rel"]
    )
    # irrelevant doc ranked first; relevant doc second
    ranked = spark.createDataFrame(
        [(2, 0.9), (1, 0.8)], ["doc_id", "score"]
    )
    r = ranking_eval(ranked, rel, k=2).collect()[0]
    assert r["mrr_at_2"] == 0.5
    assert r["n_relevant_retrieved"] == 1
    # dcg = 1/log2(3); idcg = 1/log2(2) = 1
    import math

    assert r["ndcg_at_2"] == round(1 / math.log2(3) + 1e-9, 6)


def test_chi_square_independent_table(spark):
    from sqlitedataframe_spark.operators.profiling import chi_square_independence

    # perfectly independent 2x2: margins factorize exactly
    rows = (
        [("a", "x")] * 20 + [("a", "y")] * 20
        + [("b", "x")] * 10 + [("b", "y")] * 10
    )
    df = spark.createDataFrame(rows, ["r", "c"])
    got = chi_square_independence(df, "r", "c").collect()[0]
    assert got["chi2"] == 0.0
    assert got["dof"] == 1
    assert got["cramers_v"] == 0.0
    assert got["n_obs"] == 60


def test_chi_square_dependent_table(spark):
    from sqlitedataframe_spark.operators.profiling import chi_square_independence

    rows = [("a", "x")] * 30 + [("b", "y")] * 30
    df = spark.createDataFrame(rows, ["r", "c"])
    got = chi_square_independence(df, "r", "c").collect()[0]
    assert got["chi2"] == 60.0  # perfect association: chi2 = n
    assert got["cramers_v"] == 1.0


def test_ewma_series_decays_by_day_distance(spark):
    from sqlitedataframe_spark.operators.profiling import ewma_series

    df = spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 1, 8), 1.0),
            (dt.datetime(2024, 1, 2, 9), 3.0),
            # gap: the 1 Jan term decays by 0.5^3 on 4 Jan
            (dt.datetime(2024, 1, 4, 10), 5.0),
        ],
        ["ts", "v"],
    )
    rows = {
        str(r["day"]): r
        for r in ewma_series(df, "ts", F.sum("v"), decay=0.5).collect()
    }
    assert rows["2024-01-01"]["ewma"] == 1.0
    assert rows["2024-01-02"]["ewma"] == round((0.5 * 1 + 3) / 1.5 + 1e-9, 4)
    w = (0.125 * 1 + 0.25 * 3 + 1 * 5) / (0.125 + 0.25 + 1)
    assert rows["2024-01-04"]["ewma"] == round(w + 1e-9, 4)
    assert rows["2024-01-04"]["n_terms"] == 3


def test_source_ngram_overlap_mirror_sources(spark):
    from sqlitedataframe_spark.operators.text import source_ngram_overlap

    docs = spark.createDataFrame(
        [
            (1, "a b c d e", "s1"),
            (2, "a b c d e", "s2"),       # mirror of s1
            (3, "x y z w q", "s3"),       # disjoint
        ],
        ["doc_id", "text", "source"],
    )
    rows = source_ngram_overlap(docs, n=3).collect()
    pairs = {(r["src_a"], r["src_b"]): r for r in rows}
    assert pairs[("s1", "s2")]["jaccard"] == 1.0
    assert pairs[("s1", "s2")]["n_common_grams"] == 3  # 3 trigrams of 5 tokens
    assert ("s1", "s3") not in pairs  # zero intersection emits no row


def test_agg_exact_mode_tie_breaks_to_smaller_value(spark, sf_dir):
    from sqlitedataframe_spark.suite import load_all

    q = load_all()["agg_exact_mode"].spark_fn
    rows = q(spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["mode_count"] >= 1
        assert r["n_distinct_qty"] >= 1
        # the mode exists among the group's values
        assert r["mode_qty"] >= 0
