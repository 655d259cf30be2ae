"""Round-12 wave-4 operator tests: KMV/theta set-operation sketches
(merge law, estimator bounds), MATCH_RECOGNIZE-style pattern matching,
SPRT trajectories, Krippendorff's alpha, Qini monotonicity, systematic
PPS pick-count identity, Croston/SBA relations, silence-gap islands,
and CKA range/self-consistency."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from sqlitedataframe_spark.suite import load_all


@pytest.fixture(scope="module")
def reg():
    return load_all()


# ---------------------------------------------------------------------------
# KMV sketches
# ---------------------------------------------------------------------------
def test_kmv_merge_matches_oneshot(spark, sf_dir):
    """Union+re-rank of per-shard KMV states == one-shot sketch (the
    law the driver proves via the oracle, re-proven in-process)."""
    from sqlitedataframe_spark.operators.sketch import (
        kmv_merge_rank,
        kmv_sketch,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    mp = li.select(
        F.date_trunc("month", "l_shipdate").cast("date").alias("m"),
        F.col("l_partkey").alias("p"),
    ).distinct()
    one = {
        (r["m"], r["h"])
        for r in kmv_sketch(mp, ["m"], "p", k=32).select("m", "h").collect()
    }
    states = kmv_sketch(
        mp.withColumn("sh", F.col("p") % 3), ["m", "sh"], "p", k=32
    ).select("m", "h")
    merged = {
        (r["m"], r["h"])
        for r in kmv_merge_rank(states, ["m"], k=32)
        .select("m", "h")
        .collect()
    }
    assert merged == one and len(one) > 0


def test_kmv_intersect_estimates_bounded(spark, sf_dir, reg):
    rows = reg["agg_kmv_intersect"].spark_fn(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r["kmv_inter"] <= r["kmv_union"]
        assert r["exact_inter"] <= r["exact_union"]
        assert r["est_union"] >= 0 and r["est_inter"] >= 0
        assert 0.0 <= r["jaccard_est"] <= 1.0 + 1e-9
        # k=128 theta estimate: loose 3-sigma-ish sanity envelope
        if r["exact_union"] >= 64:
            assert abs(r["est_union"] - r["exact_union"]) / r["exact_union"] < 0.5


def test_kmv_distinct_estimate_error(spark, sf_dir, reg):
    rows = reg["agg_kmv_merge"].spark_fn(spark, sf_dir).collect()
    for r in rows:
        if r["n_sk"] < 128:  # sketch not full => exact
            assert r["est_distinct"] == float(r["exact_distinct"])
        else:
            assert abs(r["rel_err"]) < 0.5


# ---------------------------------------------------------------------------
# Pattern matching
# ---------------------------------------------------------------------------
def test_pattern_match_python_replay(spark, sf_dir, reg):
    """Replay the regex scan in Python for every user; counts and
    positions must agree with the Spark/regexp result."""
    rows = reg["events_pattern_match"].spark_fn(spark, sf_dir).collect()
    e = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    m = {"signup": "S", "click": "C", "view": "V", "purchase": "P",
         "error": "E"}
    paths: dict = {}
    for r in sorted(e, key=lambda r: (r["ts"], r["event_id"])):
        paths.setdefault(r["user_id"], []).append(m[r["event_type"]])
    pat = re.compile("S[CV]*P")
    assert len(rows) == len(paths)
    for r in rows:
        p = "".join(paths[r["user_id"]])
        ms = pat.findall(p)
        assert r["n_matches"] == len(ms)
        assert r["path_len"] == len(p)
        first = pat.search(p)
        assert r["first_match_pos"] == (first.start() + 1 if first else 0)
        assert r["longest_match_len"] == (max(map(len, ms)) if ms else 0)
        assert r["matched_chars"] == sum(map(len, ms))


# ---------------------------------------------------------------------------
# SPRT
# ---------------------------------------------------------------------------
def test_sprt_trajectory_consistency(spark, sf_dir, reg):
    rows = reg["events_sprt_sequential"].spark_fn(spark, sf_dir).collect()
    arms = {r["arm"] for r in rows}
    assert arms == {"A", "B"}
    for arm in arms:
        tr = [r for r in rows if r["arm"] == arm]
        assert tr == sorted(tr, key=lambda r: r["day"])
        # cumulative counts monotone; llr matches the literal-constant form
        for a, b in zip(tr, tr[1:]):
            assert b["cum_trials"] > a["cum_trials"]
            assert b["cum_succ"] >= a["cum_succ"]
        for r in tr:
            llr = (r["cum_succ"] * 2.1130909e-1
                   + (r["cum_trials"] - r["cum_succ"]) * -4.9392755e-2)
            assert abs(r["llr"] - llr) < 1e-5
        # decided is a suffix flag: once true, stays true
        dec = [r["decided"] for r in tr]
        assert dec == sorted(dec)


# ---------------------------------------------------------------------------
# Krippendorff
# ---------------------------------------------------------------------------
def test_krippendorff_alpha_range_and_identity(spark, sf_dir, reg):
    r = reg["eval_krippendorff_alpha"].spark_fn(spark, sf_dir).collect()[0]
    assert -1.0 <= r["alpha"] <= 1.0
    assert r["n_ratings"] == 3 * r["n_units"]
    assert 0.0 <= r["p_agree"] <= 1.0
    # alpha == 1 - Do/De with Do = P/n (m=3 everywhere)
    do = r["disagree_pairs"] / r["n_ratings"]
    assert abs((1 - do / r["exp_disagree"]) - r["alpha"]) < 1e-4


# ---------------------------------------------------------------------------
# Qini
# ---------------------------------------------------------------------------
def test_qini_cumulative_monotone(spark, sf_dir, reg):
    rows = reg["eval_qini_uplift"].spark_fn(spark, sf_dir).collect()
    # rows ordered score desc; cumulative counts must increase
    for a, b in zip(rows, rows[1:]):
        assert a["score"] > b["score"]
        assert b["cum_nt"] >= a["cum_nt"] and b["cum_nc"] >= a["cum_nc"]
    last = rows[-1]
    assert last["cum_nt"] + last["cum_nc"] > 0


# ---------------------------------------------------------------------------
# Systematic PPS
# ---------------------------------------------------------------------------
def test_systematic_pps_pick_count_identity(spark, sf_dir):
    """sum(picks) == n EXACTLY — the integer identity the whole design
    rests on — and pick counts track weight shares."""
    from sqlitedataframe_spark.operators.sampling import systematic_pps

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for n in (7, 25, 64):
        s = systematic_pps(
            d.select("doc_id", "n_chars"), "doc_id", "n_chars", n=n
        )
        rows = s.collect()
        assert sum(r["picks"] for r in rows) == n
        assert all(r["picks"] >= 0 for r in rows)
        ival = rows[0]["ival"]
        for r in rows:
            # a row spanning j intervals gets at least j-1 picks
            assert r["picks"] >= r["w"] // ival - 1


def test_systematic_pps_query_estimates(spark, sf_dir, reg):
    rows = reg["sample_systematic_pps"].spark_fn(spark, sf_dir).collect()
    assert sum(r["picks_total"] for r in rows) == 25
    tot_est = sum(r["est_chars"] for r in rows)
    tot_exact = sum(r["exact_chars"] for r in rows)
    # global estimate == n * I, within one interval of the exact total
    assert abs(tot_est - tot_exact) <= tot_exact // 25 + 1


# ---------------------------------------------------------------------------
# Croston
# ---------------------------------------------------------------------------
def test_croston_relations(spark, sf_dir, reg):
    rows = reg["orders_croston_forecast"].spark_fn(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["n_demand_days"] <= r["n_lines"]
        assert r["mean_size"] > 0
        if r["croston_daily"] is not None:
            assert 0 < r["sba_daily"] < r["croston_daily"]


# ---------------------------------------------------------------------------
# Silence gaps
# ---------------------------------------------------------------------------
def test_silence_gaps_python_replay(spark, sf_dir, reg):
    """Two-level (intra-day + day-boundary) gap construction must equal
    the flat single-pass gap scan."""
    rows = reg["events_silence_gaps"].spark_fn(spark, sf_dir).collect()
    e = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    mins: dict = {}
    for r in e:
        mn = int(r["ts"].timestamp() * 1000) // 60000
        mins.setdefault(r["event_type"], set()).add(mn)
    for t, ms in mins.items():
        s = sorted(ms)
        gaps = sorted(
            ((b - a - 1, a + 1) for a, b in zip(s, s[1:]) if b - a > 1),
            key=lambda g: (-g[0], g[1]),
        )[:5]
        got = [
            (r["gap_minutes"], r["silent_from_min"])
            for r in rows
            if r["event_type"] == t
        ]
        assert got == gaps, t


# ---------------------------------------------------------------------------
# CKA
# ---------------------------------------------------------------------------
def test_cka_range_and_self_similarity(spark, sf_dir, reg):
    rows = reg["embed_cka_views"].spark_fn(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert -1e-9 <= r["cka"] <= 1.0 + 1e-9  # Cauchy-Schwarz bound
        assert r["frob_ratio"] > 0
    # identical views => CKA == 1 exactly
    from sqlitedataframe_spark.operators.similarity import linear_cka_views

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dup = emb.select(
        "vec_id",
        "label",
        F.concat(
            F.slice("embedding", 1, 8), F.slice("embedding", 1, 8)
        ).alias("embedding"),
    )
    r = linear_cka_views(
        dup, "label", "vec_id", "embedding", split_dim=8, unit=1000
    ).collect()
    for row in r:
        xx, yy, xy = int(row["xx"]), int(row["yy"]), int(row["xy"])
        assert xx == yy == xy and xx > 0
