"""Round-6 wave: regression metrics, daily-series ACF, runs test,
neighbor-Jaccard link prediction, categorical MI, code detection —
hand-checked small cases for each new operator."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_regression_metrics_hand_checked(spark):
    """pred=[2,2,4], actual=[1,3,4]: errors [1,-1,0] -> MAE=2/3,
    RMSE=sqrt(2/3), bias=0; SST over actual = 14/3 -> R2 = 1-2/(14/3)."""
    from sqlitedataframe_spark.operators.evalmetrics import regression_metrics

    df = spark.createDataFrame(
        [(2.0, 1.0), (2.0, 3.0), (4.0, 4.0)], ["p", "y"]
    )
    r = regression_metrics(df, "p", "y").collect()[0]
    assert r["n"] == 3
    assert abs(r["mae"] - 2 / 3) < 1e-3
    assert abs(r["rmse"] - math.sqrt(2 / 3)) < 1e-3
    assert abs(r["bias"]) < 1e-9
    assert abs(r["r2"] - (1 - 2 / (14 / 3))) < 1e-5
    # MAPE = mean(|1/1|, |1/3|, 0) * 100
    assert abs(r["mape_pct"] - 100 * (1 + 1 / 3) / 3) < 1e-2


def test_regression_metrics_perfect_fit(spark):
    from sqlitedataframe_spark.operators.evalmetrics import regression_metrics

    df = spark.createDataFrame([(float(i), float(i)) for i in range(1, 6)], ["p", "y"])
    r = regression_metrics(df, "p", "y").collect()[0]
    assert r["rmse"] == 0.0 and r["mae"] == 0.0 and r["r2"] == 1.0


def test_acf_perfect_alternation(spark):
    """Series +1,-1,+1,... -> acf(1) = -1, acf(2) = +1 exactly."""
    from sqlitedataframe_spark.operators.relational import acf_lags
    import datetime as dt

    rows = [
        (dt.datetime(2024, 1, 1) + dt.timedelta(days=i), float(1 if i % 2 == 0 else -1))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, ["ts", "v"])
    out = {r["lag"]: r for r in acf_lags(df, "ts", F.sum("v"), max_lag=2).collect()}
    assert out[1]["n_pairs"] == 29 and out[2]["n_pairs"] == 28
    assert abs(out[1]["acf"] + 1.0) < 1e-6
    assert abs(out[2]["acf"] - 1.0) < 1e-6


def test_runs_test_alternating_vs_blocked(spark):
    """Alternating high/low days maximize runs (z > 0); two solid blocks
    minimize them (runs=2, z < 0)."""
    from sqlitedataframe_spark.operators.profiling import runs_test
    import datetime as dt

    def mk(values):
        rows = [
            (dt.datetime(2024, 1, 1) + dt.timedelta(days=i), float(v))
            for i, v in enumerate(values)
        ]
        df = spark.createDataFrame(rows, ["ts", "v"])
        return runs_test(
            df, "ts", F.round(F.sum("v") * 100, 0)
        ).collect()[0]

    alt = mk([10, 1] * 10)  # 20 days, 20 runs
    assert alt["n_days"] == 20 and alt["n_above"] == 10
    assert alt["runs"] == 20 and alt["z"] > 1.96

    blocks = mk([10] * 10 + [1] * 10)  # 2 runs
    assert blocks["runs"] == 2 and blocks["z"] < -1.96


def test_neighbor_jaccard_square(spark):
    """Square 1-2-3-4-1: non-adjacent diagonals (1,3) and (2,4) each
    share both neighbors -> jaccard = 2/(2+2-2) = 1.0."""
    from sqlitedataframe_spark.operators.graph import neighbor_jaccard

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], ["src", "dst"]
    )
    rows = neighbor_jaccard(edges).collect()
    got = {(r["u"], r["v"]): r for r in rows}
    assert set(got) == {(1, 3), (2, 4)}
    for r in rows:
        assert r["cn"] == 2 and r["deg_u"] == 2 and r["deg_v"] == 2
        assert r["jaccard"] == 1.0


def test_neighbor_jaccard_excludes_adjacent(spark):
    """Triangle + pendant: all triangle pairs are adjacent, so the only
    scored pair is the wedge (2,4) through 3 (or (1,4) — neither edge)."""
    from sqlitedataframe_spark.operators.graph import neighbor_jaccard

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], ["src", "dst"]
    )
    pairs = {(r["u"], r["v"]) for r in neighbor_jaccard(edges).collect()}
    assert pairs == {(1, 4), (2, 4)}


def test_mutual_information_independent_and_identical(spark):
    from sqlitedataframe_spark.operators.features import mutual_information

    # independent 2x2 uniform: MI = 0, H = 1 bit each
    indep = spark.createDataFrame(
        [(a, b) for a in "xy" for b in "uv"] * 5, ["a", "b"]
    )
    r = mutual_information(indep, "a", "b").collect()[0]
    assert r["n"] == 20 and r["n_cells"] == 4
    assert abs(r["mi_bits"]) < 1e-6
    assert abs(r["h_a_bits"] - 1.0) < 1e-6
    assert abs(r["nmi"]) < 1e-6

    # b == a: MI = H(a) = 1 bit, NMI = 1
    ident = spark.createDataFrame(
        [("x", "x")] * 5 + [("y", "y")] * 5, ["a", "b"]
    )
    r = mutual_information(ident, "a", "b").collect()[0]
    assert abs(r["mi_bits"] - 1.0) < 1e-6
    assert abs(r["nmi"] - 1.0) < 1e-6


def test_code_likeness_separates_code_from_prose(spark):
    from sqlitedataframe_spark.operators.text import code_likeness

    df = spark.createDataFrame(
        [
            ("def f(x): return x[0] + g(y);",),
            ("the quick brown fox jumps over the lazy dog again and again",),
        ],
        ["text"],
    )
    scores = [
        r["s"] for r in df.select(code_likeness("text").alias("s")).collect()
    ]
    assert scores[0] >= 0.5
    assert scores[1] < 0.1


def test_new_suite_queries_registered():
    from sqlitedataframe_spark.suite import load_all

    reg = load_all()
    for name in (
        "eval_regression_metrics",
        "orders_acf_lags",
        "orders_runs_test",
        "graph_jaccard_neighbors",
        "feature_mutual_information",
        "text_code_detect",
    ):
        assert name in reg and reg[name].oracle is not None


def test_regression_metrics_by_group(spark):
    """Per-group metrics: group g fits perfectly, group h is off by a
    constant 1 -> MAE/RMSE 1, bias 1, and rows come back ordered."""
    from sqlitedataframe_spark.operators.evalmetrics import regression_metrics

    df = spark.createDataFrame(
        [("g", float(i), float(i)) for i in range(1, 5)]
        + [("h", float(i) + 1.0, float(i)) for i in range(1, 5)],
        ["grp", "p", "y"],
    )
    rows = regression_metrics(df, "p", "y", by="grp").collect()
    assert [r["grp"] for r in rows] == ["g", "h"]
    g, h = rows
    assert g["rmse"] == 0.0 and g["mae"] == 0.0 and g["r2"] == 1.0
    assert h["rmse"] == 1.0 and h["mae"] == 1.0 and h["bias"] == 1.0


def test_blocked_levenshtein_cross_band_pair_found(spark):
    """Length banding must not lose pairs spanning adjacent bands:
    len 7 (band 1) vs len 10 (band 2) with lev=3 — and with the
    lower-band string carrying the HIGHER id, so the output-id
    normalization (least/greatest) is exercised too."""
    from sqlitedataframe_spark.operators.linkage import (
        blocked_levenshtein_pairs,
    )

    df = spark.createDataFrame(
        [(9, "abcdefg", "g"), (1, "abcdefgxyz", "g"), (5, "zzzzz", "g")],
        ["id", "name", "grp"],
    )
    rows = blocked_levenshtein_pairs(df, "id", "name", ["grp"], 3).collect()
    assert [(r["id_a"], r["id_b"], r["lev"]) for r in rows] == [(1, 9, 3)]


def test_blocked_levenshtein_banding_equals_bruteforce(spark):
    """Randomized (fixed-seed) equivalence: the length-banded plan must
    return exactly the naive all-pairs-in-block result — catching any
    band-boundary or orientation-dedup mistake."""
    import random

    from sqlitedataframe_spark.operators.linkage import (
        blocked_levenshtein_pairs,
    )

    rng = random.Random(42)
    alpha = "ab"
    rows = [
        (i, "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12))),
         rng.choice(["g", "h"]))
        for i in range(40)
    ]

    def lev(s, t):
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i]
            for j, ct in enumerate(t, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (cs != ct)))
            prev = cur
        return prev[-1]

    for d in (0, 2, 3):
        want = sorted(
            (a[0], b[0], lev(a[1], b[1]))
            for i, a in enumerate(rows)
            for b in rows[i + 1:]
            if a[2] == b[2] and lev(a[1], b[1]) <= d
        )
        df = spark.createDataFrame(rows, ["id", "name", "grp"])
        got = sorted(
            (r["id_a"], r["id_b"], r["lev"])
            for r in blocked_levenshtein_pairs(
                df, "id", "name", ["grp"], d
            ).collect()
        )
        assert got == want, f"d={d}: {len(got)} vs {len(want)} pairs"


def test_cramers_v_extremes(spark):
    """Perfect association -> V = 1; independence -> V = 0 (chi2 = 0)."""
    from sqlitedataframe_spark.operators.features import cramers_v

    perfect = spark.createDataFrame(
        [("x", "u")] * 5 + [("y", "v")] * 5, ["a", "b"]
    )
    r = cramers_v(perfect, "a", "b").collect()[0]
    assert r["cramers_v"] == 1.0 and r["dof"] == 1

    indep = spark.createDataFrame(
        [(a, b) for a in "xy" for b in "uv"] * 5, ["a", "b"]
    )
    r = cramers_v(indep, "a", "b").collect()[0]
    assert abs(r["chi2"]) < 1e-6 and abs(r["cramers_v"]) < 1e-6


def test_rolling_percentile_window_and_rank(spark):
    """10 days with counts 1..10 (day i has i events): at day 10 the
    window is [4..10] and nearest-rank p90 (idx ceil(.9*7)=7) = 10; at
    day 1 the window is just [1] -> p = 1."""
    from sqlitedataframe_spark.operators.relational import (
        rolling_percentile_daily,
    )
    import datetime as dt

    rows = [
        (dt.datetime(2024, 3, 1 + i, 12, 0, 0),)
        for i in range(10)
        for _ in range(i + 1)
    ]
    df = spark.createDataFrame(rows, ["ts"])
    out = {r["d"].day: r for r in
           rolling_percentile_daily(df, "ts").collect()}
    assert out[1]["w"] == 1 and out[1]["p"] == 1
    assert out[7]["w"] == 7 and out[7]["p"] == 7
    assert out[10]["w"] == 7 and out[10]["p"] == 10


def test_inverse_propensity_weights_hand_checked(spark):
    """Population 8 a / 2 b; sample keeps 2 a / 2 b -> weight_a =
    (0.8/0.5) = 1.6, weight_b = (0.2/0.5) = 0.4; unsampled group NULL."""
    from sqlitedataframe_spark.operators.sampling import (
        inverse_propensity_weights,
    )

    pop = spark.createDataFrame(
        [("a",)] * 8 + [("b",)] * 2 + [("c",)] * 5, ["g"]
    )
    samp = spark.createDataFrame([("a",)] * 2 + [("b",)] * 2, ["g"])
    rows = {r["grp"]: r for r in
            inverse_propensity_weights(pop, samp, "g").collect()}
    assert rows["a"]["weight"] == round(8 / 15 / (2 / 4) + 1e-9, 6)
    assert rows["b"]["weight"] == round(2 / 15 / (2 / 4) + 1e-9, 6)
    assert rows["c"]["samp_n"] == 0 and rows["c"]["weight"] is None


def test_jsd_bounds_and_disjoint(spark):
    """JSD is bounded [0, 1] bit; two token-disjoint sources each sit at
    the corpus midpoint with JSD strictly between 0 and 1, and a source
    whose distribution EQUALS the corpus mix has JSD ~ 0."""
    from sqlitedataframe_spark.suite import load_all
    import json

    # reuse the suite query machinery against a temp parquet fixture
    import os
    import tempfile

    rows = (
        [(i, "aa bb", "en", "s1", 5) for i in range(20)]
        + [(100 + i, "aa bb", "en", "s2", 5) for i in range(20)]
    )
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows, ["doc_id", "text", "lang", "source", "n_chars"]
        ).write.parquet(os.path.join(tmp, "documents.parquet"))
        q = load_all()["text_jsd_sources"].spark_fn
        out = {r["source"]: r["jsd_bits"] for r in q(spark, tmp).collect()}
    # both sources have exactly the corpus distribution -> JSD 0
    assert abs(out["s1"]) < 1e-6 and abs(out["s2"]) < 1e-6
