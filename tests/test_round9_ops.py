"""Round-9 operators: exact Kendall tau-b, LCS span estimates, whitening
parameters, ABTT projections, the Poisson rate-shift test — plus the
signed-zero conventions and advisor fixes shipped this round."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# kendall_tau_by_group
# ---------------------------------------------------------------------------
def _tau_b_reference(xy):
    """O(n^2) textbook tau-b for small lists (concordant/discordant pair
    walk) — the independent check the grid method must reproduce."""
    n = len(xy)
    c = d = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = xy[i][0] - xy[j][0]
            dy = xy[i][1] - xy[j][1]
            s = dx * dy
            if s > 0:
                c += 1
            elif s < 0:
                d += 1
            elif dx == 0 and dy != 0:
                tx += 1
            elif dy == 0 and dx != 0:
                ty += 1
    n0 = n * (n - 1) // 2
    from collections import Counter

    n1 = sum(t * (t - 1) // 2 for t in Counter(x for x, _ in xy).values())
    n2 = sum(t * (t - 1) // 2 for t in Counter(y for _, y in xy).values())
    den = math.sqrt((n0 - n1) * (n0 - n2))
    return c, d, (c - d) / den if den > 0 else None


def test_kendall_tau_matches_pairwise_reference(spark):
    from sqlitedataframe_spark.operators.profiling import kendall_tau_by_group

    xy = [(1, 2), (2, 1), (3, 3), (3, 4), (4, 4), (5, 6), (5, 6), (6, 5)]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in xy], "g string, x long, y long"
    )
    row = kendall_tau_by_group(df, "g", "x", "y").collect()[0]
    c, d, tau = _tau_b_reference(xy)
    assert row["n"] == len(xy)
    assert row["c_minus_d"] == c - d
    assert row["tau_b"] == pytest.approx(tau, abs=1e-6)


def test_kendall_tau_perfect_and_reversed(spark):
    from sqlitedataframe_spark.operators.profiling import kendall_tau_by_group

    inc = [("a", i, i) for i in range(10)]
    dec = [("b", i, 9 - i) for i in range(10)]
    df = spark.createDataFrame(inc + dec, "g string, x long, y long")
    rows = {r["g"]: r for r in kendall_tau_by_group(df, "g", "x", "y").collect()}
    assert rows["a"]["tau_b"] == pytest.approx(1.0)
    assert rows["b"]["tau_b"] == pytest.approx(-1.0)


def test_kendall_tau_all_tied_is_null(spark):
    from sqlitedataframe_spark.operators.profiling import kendall_tau_by_group

    df = spark.createDataFrame(
        [("g", 1, i) for i in range(5)], "g string, x long, y long"
    )
    row = kendall_tau_by_group(df, "g", "x", "y").collect()[0]
    assert row["tau_b"] is None  # denominator 0: x carries no order at all


# ---------------------------------------------------------------------------
# lcs_span_stats
# ---------------------------------------------------------------------------
def test_lcs_spans_recovers_planted_substring(spark):
    from sqlitedataframe_spark.operators.dedup import lcs_span_stats

    import random

    rng = random.Random(7)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    shared = "".join(rng.choice(alpha) for _ in range(200))
    pad_a = "".join(rng.choice(alpha) for _ in range(100))
    pad_b = "".join(rng.choice(alpha) for _ in range(150))
    docs = spark.createDataFrame(
        [(1, pad_a + shared), (2, pad_b + shared + "zz")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    row = lcs_span_stats(docs, pairs, k=30, stride=10).collect()[0]
    # anchors only live on the shingle lattice, so the estimate is within
    # one stride+k of the planted 200-char span, never above it + k
    assert 140 <= row["lcs_est"] <= 230
    assert row["n_anchors"] >= 10
    assert row["lcs_ratio"] > 0.4


def test_lcs_spans_no_shared_text_drops_pair(spark):
    from sqlitedataframe_spark.operators.dedup import lcs_span_stats

    docs = spark.createDataFrame(
        [(1, "a" * 100), (2, "b" * 100)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    assert lcs_span_stats(docs, pairs).count() == 0


def test_lcs_spans_scattered_matches_capped_by_run(spark):
    from sqlitedataframe_spark.operators.dedup import lcs_span_stats

    import random

    rng = random.Random(11)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    block = "".join(rng.choice(alpha) for _ in range(40))
    # the same 40-char block twice in A, once in B, separated by noise:
    # runs stay short even though anchors repeat
    noise = lambda n: "".join(rng.choice(alpha) for _ in range(n))  # noqa: E731
    docs = spark.createDataFrame(
        [(1, block + noise(100) + block), (2, noise(60) + block + noise(60))],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    row = lcs_span_stats(docs, pairs, k=30, stride=10).collect()[0]
    assert row["lcs_est"] <= 60  # a 40-char block can't estimate past ~k+stride


# ---------------------------------------------------------------------------
# whitening_params
# ---------------------------------------------------------------------------
def test_whitening_params_exact_moments(spark):
    from sqlitedataframe_spark.operators.similarity import whitening_params

    rows = [
        ("s1", [1.0, -2.0]),
        ("s1", [3.0, 0.0]),
        ("s1", [5.0, 2.0]),
        ("s2", [0.5, 0.5]),
        ("s2", [1.5, -0.5]),
    ]
    df = spark.createDataFrame(rows, "source string, embedding array<double>")
    out = {
        (r["source"], r["dim"]): r
        for r in whitening_params(df, "source").collect()
    }
    # s1 dim0: mean 3, sample sd 2; dim1: mean 0, sd 2
    assert out[("s1", 0)]["mean"] == pytest.approx(3.0)
    assert out[("s1", 0)]["sd"] == pytest.approx(2.0)
    assert out[("s1", 1)]["mean"] == pytest.approx(0.0)
    assert out[("s1", 1)]["sd"] == pytest.approx(2.0)
    # equal variances -> equal var_share halves
    assert out[("s1", 0)]["var_share"] == pytest.approx(0.5)
    # var_share sums to 1 within each source
    for g in ("s1", "s2"):
        total = sum(v["var_share"] for (src, _), v in out.items() if src == g)
        assert total == pytest.approx(1.0, abs=1e-5)
    # signed-zero convention: the 0.0 mean must be +0.0
    m = out[("s1", 1)]["mean"]
    assert math.copysign(1.0, m) > 0


# ---------------------------------------------------------------------------
# abtt_projections
# ---------------------------------------------------------------------------
def test_abtt_projection_pythagoras(spark, sf_dir):
    from sqlitedataframe_spark.io import load_table
    from sqlitedataframe_spark.operators.similarity import abtt_projections

    emb = load_table(spark, sf_dir, "embeddings")
    rows = abtt_projections(emb, dim=64, iters=3, top=5).collect()
    assert len(rows) == 5
    norms = {
        r["vec_id"]: r
        for r in emb.select(
            "vec_id",
            F.sqrt(
                F.aggregate(
                    F.transform(
                        F.col("embedding").cast("array<double>"),
                        lambda x: x * x,
                    ),
                    F.lit(0.0),
                    lambda a, t: a + t,
                )
            ).alias("nrm"),
        ).collect()
    }
    for r in rows:
        nrm = norms[r["vec_id"]]["nrm"]
        # proj^2 + resid^2 == ||v||^2 (within the 6-dp output rounding)
        assert r["proj"] ** 2 + r["resid_norm"] ** 2 == pytest.approx(
            nrm**2, rel=1e-3
        )
        assert abs(r["proj"]) <= nrm + 1e-6


# ---------------------------------------------------------------------------
# poisson_rate_shift
# ---------------------------------------------------------------------------
def test_poisson_rate_shift_counts_and_z(spark):
    from sqlitedataframe_spark.operators.profiling import poisson_rate_shift

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # type 'a': 9 events in the first half, 1 in the second (strong drop)
    for i in range(9):
        rows.append(("a", t0 + dt.timedelta(hours=i)))
    rows.append(("a", t0 + dt.timedelta(hours=95)))
    # type 'b': 5 and 5 (no shift); window spans hour 0 .. hour 100
    for i in range(5):
        rows.append(("b", t0 + dt.timedelta(hours=i * 2)))
        rows.append(("b", t0 + dt.timedelta(hours=60 + i * 2)))
    rows.append(("b", t0 + dt.timedelta(hours=100)))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {r["event_type"]: r for r in poisson_rate_shift(df, "event_type", "ts").collect()}
    a = out["a"]
    assert a["n_first"] == 9 and a["n_second"] == 1
    assert a["z"] == pytest.approx((9 - 1) / math.sqrt(10), abs=1e-3)
    b = out["b"]
    assert b["n_first"] + b["n_second"] == 11


def test_poisson_rate_shift_zero_second_half_null_ratio(spark):
    from sqlitedataframe_spark.operators.profiling import poisson_rate_shift

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [("a", t0), ("a", t0 + dt.timedelta(seconds=1)),
            ("b", t0 + dt.timedelta(seconds=100))]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {r["event_type"]: r for r in poisson_rate_shift(df, "event_type", "ts").collect()}
    assert out["a"]["rate_ratio"] is None  # n_second = 0 -> undefined ratio
    assert out["a"]["z"] == pytest.approx(2 / math.sqrt(2), abs=1e-3)


# ---------------------------------------------------------------------------
# Signed-zero conventions (the r9 welch fix) + checker strictness.
# ---------------------------------------------------------------------------
def test_norm_cell_distinguishes_negative_zero():
    from tools.oracle_check import norm_cell

    assert norm_cell(-0.0) != norm_cell(0.0)
    assert norm_cell(0.0) == "0"
    assert norm_cell(-0.0) == "-0"
    # lists descend
    assert norm_cell([0.0]) != norm_cell([-0.0])


def test_welch_rounds_tiny_negative_to_positive_zero(spark):
    from sqlitedataframe_spark.operators.profiling import welch_ttest_onevsrest

    import random

    rng = random.Random(3)
    rows = [("x", rng.gauss(50, 10)) for _ in range(500)]
    rows += [("y", v + 1e-7) for (_, v) in rows]  # near-identical means
    df = spark.createDataFrame(rows, "g string, v double")
    for r in welch_ttest_onevsrest(df, "g", "v").collect():
        if r["t_stat"] == 0.0:
            assert math.copysign(1.0, r["t_stat"]) > 0


def test_signed_zero_scan_helper_counts_nested():
    from tools.signed_zero_scan import _neg_zero_cells

    assert _neg_zero_cells(-0.0) == 1
    assert _neg_zero_cells(0.0) == 0
    assert _neg_zero_cells([1.0, -0.0, [-0.0, 2]]) == 2
    assert _neg_zero_cells("x") == 0


# ---------------------------------------------------------------------------
# Advisor fixes.
# ---------------------------------------------------------------------------
def test_pq_subvectors_rejects_non_divisible_dim(spark):
    from sqlitedataframe_spark.operators.similarity import pq_train_assign

    df = spark.createDataFrame(
        [(i, [float(j) for j in range(6)]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="not\\s+divisible|divisible"):
        pq_train_assign(df, m=4, k=2, iterations=1)


def test_worker_zip_keyed_on_content_hash():
    import glob
    import os
    import tempfile

    from sqlitedataframe_spark import session as S

    pkg_dir = os.path.dirname(os.path.abspath(S.__file__))
    # replicate the keying: the zip name must not contain the pid and must
    # be deterministic across calls
    import hashlib

    root = os.path.dirname(pkg_dir)
    sources = []
    for dirpath, _d, filenames in os.walk(pkg_dir):
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                sources.append(os.path.join(dirpath, fn))
    sources.sort()
    h = hashlib.sha256()
    for full in sources:
        h.update(os.path.relpath(full, root).encode())
        with open(full, "rb") as f:
            h.update(f.read())
    expected = os.path.join(
        tempfile.gettempdir(),
        f"sqlitedataframe_spark_pkg_{h.hexdigest()[:16]}.zip",
    )
    pid_style = glob.glob(
        os.path.join(tempfile.gettempdir(), f"sqlitedataframe_spark_pkg_{os.getpid()}.zip")
    )
    assert not pid_style or pid_style == [expected]
    # the name is a pure function of the sources
    assert f"{os.getpid()}" not in os.path.basename(expected).replace(
        h.hexdigest()[:16], ""
    )


def test_bfs_oracle_hop0_guarded():
    from sqlitedataframe_spark.suite import load_all

    q = load_all()["graph_bfs_hops"]
    assert "EXISTS (SELECT 1 FROM f0)" in q.oracle


# ---------------------------------------------------------------------------
# inclusion_deps
# ---------------------------------------------------------------------------
def test_inclusion_deps_holds_and_violations(spark):
    from sqlitedataframe_spark.operators.profiling import inclusion_deps

    src = spark.createDataFrame(
        [(1,), (2,), (3,), (None,)], "fk long"
    )
    dst_full = spark.createDataFrame([(1,), (2,), (3,), (4,)], "pk long")
    dst_part = spark.createDataFrame([(1,), (2,)], "pk long")
    out = {
        r["dependency"]: r
        for r in inclusion_deps(
            [
                ("full", src, "fk", dst_full, "pk"),
                ("partial", src, "fk", dst_part, "pk"),
            ]
        ).collect()
    }
    assert out["full"]["holds"] is True
    assert out["full"]["n_distinct"] == 3  # NULL excluded
    assert out["full"]["n_contained"] == 3
    assert out["partial"]["holds"] is False
    assert out["partial"]["n_contained"] == 2
    assert out["partial"]["containment"] == pytest.approx(2 / 3, abs=1e-5)


# ---------------------------------------------------------------------------
# ivf_recall
# ---------------------------------------------------------------------------
def test_ivf_recall_probe_monotone_and_bounded(spark, sf_dir):
    from sqlitedataframe_spark.io import load_table
    from sqlitedataframe_spark.operators.similarity import ivf_recall

    e = load_table(spark, sf_dir, "embeddings")
    cents = [
        [float(x) for x in r.embedding]
        for r in e.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ]
    rows = ivf_recall(e, cents, n_queries=4, k=5, nprobes=(1, 2, 8)).collect()
    assert len(rows) == 12  # 3 probes x 4 queries
    by_q = {}
    for r in rows:
        assert 0.0 <= r["recall_at_5"] <= 1.0
        by_q.setdefault(r["qid"], {})[r["n_probe"]] = r["n_hits"]
    for q, d in by_q.items():
        # more probes can only widen the candidate set
        assert d[1] <= d[2] <= d[8]
        # probing ALL 8 cells = exhaustive = exact top-k
        assert d[8] == 5


# ---------------------------------------------------------------------------
# price_index_pairs
# ---------------------------------------------------------------------------
def test_price_index_hand_computed(spark):
    from sqlitedataframe_spark.operators.relational import price_index_pairs

    import datetime as dt

    # item 1: price 10 -> 11 (10% up); item 2: price 20 -> 18 (10% down),
    # quantities constant -> L = P = F
    rows = [
        (1, dt.date(2020, 1, 1), 2, 20.0),
        (1, dt.date(2021, 1, 1), 2, 22.0),
        (2, dt.date(2020, 1, 1), 1, 20.0),
        (2, dt.date(2021, 1, 1), 1, 18.0),
    ]
    df = spark.createDataFrame(
        rows, "item long, d date, qty long, price double"
    )
    out = price_index_pairs(df, "item", F.year("d"), "qty", "price").collect()
    assert len(out) == 1
    r = out[0]
    assert r["year_from"] == 2020 and r["year_to"] == 2021
    assert r["n_items"] == 2
    # L = (2*11 + 1*18) / (2*10 + 1*20) = 40/40 = 1.0
    assert r["laspeyres"] == pytest.approx(1.0)
    assert r["paasche"] == pytest.approx(1.0)
    assert r["fisher"] == pytest.approx(1.0)


def test_price_index_pure_inflation(spark):
    from sqlitedataframe_spark.operators.relational import price_index_pairs

    import datetime as dt

    rows = [
        (1, dt.date(2020, 1, 1), 3, 30.0),
        (1, dt.date(2021, 1, 1), 5, 55.0),  # unit 10 -> 11
        (2, dt.date(2020, 1, 1), 4, 8.0),
        (2, dt.date(2021, 1, 1), 2, 4.4),   # unit 2 -> 2.2
    ]
    df = spark.createDataFrame(
        rows, "item long, d date, qty long, price double"
    )
    r = price_index_pairs(df, "item", F.year("d"), "qty", "price").collect()[0]
    # uniform +10% prices -> all three indexes = 1.1 exactly
    assert r["laspeyres"] == pytest.approx(1.1, abs=1e-6)
    assert r["paasche"] == pytest.approx(1.1, abs=1e-6)
    assert r["fisher"] == pytest.approx(1.1, abs=1e-6)


# ---------------------------------------------------------------------------
# simhash hamming histogram
# ---------------------------------------------------------------------------
def test_simhash_hist_consistent_with_thresholded_pairs(spark, sf_dir):
    from sqlitedataframe_spark.io import load_table
    from sqlitedataframe_spark.operators.dedup import simhash_pairs

    d = load_table(spark, sf_dir, "documents")
    hist = (
        simhash_pairs(d, max_hamming=64)
        .groupBy("hamming")
        .count()
        .collect()
    )
    n_low = sum(r["count"] for r in hist if r["hamming"] <= 3)
    n_thresh = simhash_pairs(d, max_hamming=3).count()
    assert n_low == n_thresh  # the histogram's low tail IS the shipped query


# ---------------------------------------------------------------------------
# asof forward + tolerance
# ---------------------------------------------------------------------------
def test_asof_forward_tolerance_semantics(spark):
    from sqlitedataframe_spark.operators.relational import asof_join

    import datetime as dt

    t = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    left = spark.createDataFrame(
        [(1, 10, t("2024-01-01T00:00:00")),
         (2, 10, t("2024-01-20T00:00:00")),
         (3, 10, t("2024-03-01T00:00:00"))],
        "eid long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, t("2024-01-15T00:00:00"), "jan"),
         (10, t("2024-02-10T00:00:00"), "feb")],
        "k long, rts timestamp, tag string",
    )
    out = {
        r["eid"]: r
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            direction="forward", tolerance_seconds=20 * 86400,
        ).collect()
    }
    assert out[1]["tag"] == "jan"  # 14 days ahead, inside tolerance
    # eid 2's forward match (feb) is 21 days out > 20-day tolerance -> voided
    assert out[2]["tag"] is None
    assert out[3]["tag"] is None  # no right row at/after 2024-03-01 at all


def test_asof_forward_tolerance_voids_far_match(spark):
    from sqlitedataframe_spark.operators.relational import asof_join

    import datetime as dt

    left = spark.createDataFrame(
        [(1, 5, dt.datetime(2024, 1, 1))], "eid long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(5, dt.datetime(2024, 6, 1), "far")], "k long, rts timestamp, tag string"
    )
    r = asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts",
        direction="forward", tolerance_seconds=86400,
    ).collect()[0]
    assert r["tag"] is None and r["rts"] is None


# ---------------------------------------------------------------------------
# contrastive_triplets
# ---------------------------------------------------------------------------
def test_contrastive_triplets_valid_and_deterministic(spark):
    from sqlitedataframe_spark.operators.sampling import contrastive_triplets

    pairs = spark.createDataFrame(
        [(0, 3, 0.9), (1, 2, 0.6), (4, 5, 0.4)],
        "id_a long, id_b long, est_jaccard double",
    )
    ids = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    out = contrastive_triplets(pairs, ids, min_pos_score=0.5).collect()
    # 2 qualifying pairs x both directions = 4 triplets; the 0.4 pair drops
    assert len(out) == 4
    for r in out:
        assert r["negative"] not in (r["anchor"], r["positive"])
        assert 0 <= r["negative"] < 6
    out2 = contrastive_triplets(pairs, ids, min_pos_score=0.5).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


# ---------------------------------------------------------------------------
# dp_released_counts
# ---------------------------------------------------------------------------
def test_dp_counts_noise_closed_form(spark):
    from sqlitedataframe_spark.operators.profiling import dp_released_counts

    import hashlib

    df = spark.createDataFrame(
        [("a",)] * 7 + [("b",)] * 3, "g string"
    )
    out = {r["g"]: r for r in dp_released_counts(df, "g", epsilon=1.0).collect()}
    for g, n in (("a", 7), ("b", 3)):
        u = (int(hashlib.md5(g.encode()).hexdigest()[:8], 16) + 0.5) / 2**32
        c = u - 0.5
        sign = 1.0 if c > 0 else (-1.0 if c < 0 else 0.0)
        noise = -1.0 * sign * math.log(1.0 - 2.0 * abs(c))
        assert out[g]["n"] == n
        assert out[g]["noise"] == pytest.approx(round(noise + 1e-9, 4), abs=1e-9)
        assert out[g]["released"] == pytest.approx(
            round(n + noise + 1e-9, 4), abs=1e-9
        )


# ---------------------------------------------------------------------------
# bpe_merge_rounds
# ---------------------------------------------------------------------------
def test_bpe_merges_toy_corpus(spark):
    from sqlitedataframe_spark.operators.text import bpe_merge_rounds

    # "ab" appears in every word; greedy round 1 must merge (a, b)
    docs = spark.createDataFrame(
        [("abab abc",), ("ab abab",)], "text string"
    )
    out = bpe_merge_rounds(docs, "text", n_merges=2).collect()
    assert out[0]["round"] == 1
    assert (out[0]["merge_a"], out[0]["merge_b"]) == ("a", "b")
    # words: abab x2 (4 syms->2), abc (3->2), ab x2... vocab: abab f=2 (2 occurrences? corpus: abab, abc, ab, abab)
    # after merging ab: abab->[ab,ab], abc->[ab,c], ab->[ab]
    # round 2 best pair is (ab, ab) with weighted count = f(abab)=2
    assert (out[1]["merge_a"], out[1]["merge_b"]) == ("ab", "ab")
    # totals decrease monotonically
    assert out[1]["total_symbols"] < out[0]["total_symbols"]


def test_bpe_merge_fold_never_crosses_symbol_boundary(spark):
    from sqlitedataframe_spark.operators.text import bpe_merge_rounds

    # corpus engineered so the naive substring replace would corrupt:
    # after merging (x, a), the string "xa␟b" must NOT let a later (a, b)
    # merge fire inside the symbol "xa"
    docs = spark.createDataFrame(
        [("xaxb xa xa xaxb ab",)], "text string"
    )
    out = bpe_merge_rounds(docs, "text", n_merges=3).collect()
    # round 1: pair (x, a) dominates (weighted 6: xaxb f=2 has 1 each + x? count)
    assert (out[0]["merge_a"], out[0]["merge_b"]) == ("x", "a")
    for r in out:
        # supports and totals remain positive integers
        assert r["n_pair"] >= 1 and r["total_symbols"] >= 1


# ---------------------------------------------------------------------------
# cuped_adjustment
# ---------------------------------------------------------------------------
def test_cuped_reduces_to_plain_mean_when_theta_applied(spark):
    from sqlitedataframe_spark.operators.evalmetrics import cuped_adjustment

    # construct Y = 2*X + variant-effect + noiseless: theta must be 2 and
    # the adjusted means must equal mean_y - 2 * (mean_x(v) - mean_x_all)
    rows = []
    for i in range(40):
        v = i % 2
        x = float(i)
        y = 2.0 * x + (5.0 if v == 1 else 0.0)
        rows.append((v, x, y))
    df = spark.createDataFrame(rows, "variant int, x double, y double")
    out = {r["variant"]: r for r in cuped_adjustment(df, "variant", "x", "y").collect()}
    # theta ~ 2 with a small exact excess: the variant indicator correlates
    # slightly with X in this construction (cov(i, i%2) = 0.25 over 0..39)
    assert out[0]["theta"] == pytest.approx(2.0, abs=0.05)
    # after adjustment the variant gap collapses to ~the true effect 5
    diff = out[1]["mean_cuped"] - out[0]["mean_cuped"]
    assert diff == pytest.approx(5.0, abs=0.05)
    # correlation is near-perfect -> var_reduction ~ 1
    assert out[0]["var_reduction"] > 0.9


def test_cuped_zero_correlation_no_adjustment(spark):
    from sqlitedataframe_spark.operators.evalmetrics import cuped_adjustment

    # X constant within the pooled frame varies but uncorrelated with Y:
    # alternating pattern makes cov ~ 0 -> theta ~ 0 -> cuped == post mean
    rows = []
    for i in range(32):
        x = float(i % 2)            # 0,1,0,1...
        y = float((i // 2) % 2)     # 0,0,1,1... uncorrelated with x
        rows.append((0, x, y))
    df = spark.createDataFrame(rows, "variant int, x double, y double")
    r = cuped_adjustment(df, "variant", "x", "y").collect()[0]
    assert r["theta"] == pytest.approx(0.0, abs=1e-6)
    assert r["mean_cuped"] == pytest.approx(r["mean_post"], abs=1e-6)


# ---------------------------------------------------------------------------
# prefix_recall
# ---------------------------------------------------------------------------
def test_prefix_recall_full_dim_is_perfect(spark, sf_dir):
    from sqlitedataframe_spark.io import load_table
    from sqlitedataframe_spark.operators.similarity import prefix_recall

    e = load_table(spark, sf_dir, "embeddings")
    rows = prefix_recall(e, prefix_dims=(64, 16), n_queries=4, k=5).collect()
    by = {(r["prefix_dim"], r["qid"]): r for r in rows}
    assert len(rows) == 8
    for q in range(4):
        # prefix = full dimension reproduces exact search exactly
        assert by[(64, q)]["n_hits"] == 5
        assert 0 <= by[(16, q)]["n_hits"] <= 5


# ---------------------------------------------------------------------------
# delong_auc_ci
# ---------------------------------------------------------------------------
def _delong_reference(scores, labels):
    """Textbook O(m*n) DeLong: per-positive/per-negative placements."""
    pos = [s for s, y in zip(scores, labels) if y == 1]
    neg = [s for s, y in zip(scores, labels) if y == 0]
    m, n = len(pos), len(neg)
    v10 = [
        sum(1.0 if x > yv else (0.5 if x == yv else 0.0) for yv in neg) / n
        for x in pos
    ]
    v01 = [
        sum(1.0 if x > yv else (0.5 if x == yv else 0.0) for x in pos) / m
        for yv in neg
    ]
    auc = sum(v10) / m
    s10 = sum((v - auc) ** 2 for v in v10) / (m - 1)
    s01 = sum((v - auc) ** 2 for v in v01) / (n - 1)
    return auc, math.sqrt(s10 / m + s01 / n)


def test_delong_matches_pairwise_reference(spark):
    from sqlitedataframe_spark.operators.evalmetrics import delong_auc_ci

    import random

    rng = random.Random(5)
    rows = []
    for _ in range(60):
        y = rng.randint(0, 1)
        s = round(rng.gauss(0.5 + 0.2 * y, 0.15), 3)  # ties guaranteed at 3dp
        rows.append((s, y))
    df = spark.createDataFrame(rows, "s double, y int")
    r = delong_auc_ci(df, "s", "y").collect()[0]
    auc, se = _delong_reference([s for s, _ in rows], [y for _, y in rows])
    assert r["auc"] == pytest.approx(auc, abs=1e-5)
    assert r["se"] == pytest.approx(se, abs=1e-5)
    assert r["ci_lo"] == pytest.approx(auc - 1.959963985 * se, abs=1e-4)
    assert r["ci_hi"] == pytest.approx(auc + 1.959963985 * se, abs=1e-4)


def test_delong_perfect_separation_zero_variance(spark):
    from sqlitedataframe_spark.operators.evalmetrics import delong_auc_ci

    rows = [(0.1 * i, 0) for i in range(1, 6)] + [
        (0.1 * i + 1.0, 1) for i in range(1, 6)
    ]
    df = spark.createDataFrame(rows, "s double, y int")
    r = delong_auc_ci(df, "s", "y").collect()[0]
    assert r["auc"] == pytest.approx(1.0)
    assert r["se"] == pytest.approx(0.0, abs=1e-9)


# ---------------------------------------------------------------------------
# dedup_soft_weights (query-level invariants)
# ---------------------------------------------------------------------------
def test_soft_weights_cluster_accounting(spark, sf_dir):
    from sqlitedataframe_spark.suite import load_all

    q = load_all()["dedup_soft_weights"]
    rows = q.spark_fn(spark, sf_dir).collect()
    assert rows, "soft-weight table must be nonempty"
    for r in rows:
        assert r["n_docs"] >= 1 and r["n_tokens"] >= 0
        assert r["weight"] == pytest.approx(
            round(1.0 / r["cluster_size"] + 1e-9, 6), abs=1e-9
        )
    # total docs across the grain equals the corpus size
    from sqlitedataframe_spark.io import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
