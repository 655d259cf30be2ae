"""Round-5 continuation operators: RRF fusion, DSIR importance scores,
PMI collocations, KS drift, Benford digits, cohort matrix, time-weighted
averages, Markov transitions."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F


def test_rrf_fuse_hand_checked(spark):
    """Two 3-item rankings with one shared id — rrf sums 1/(k0+rank)
    from each list the id appears in."""
    from sqlitedataframe_spark.operators.retrieval import rrf_fuse

    r1 = spark.createDataFrame(
        [(10, 0.9), (20, 0.8), (30, 0.7)], ["id", "score"]
    )
    r2 = spark.createDataFrame(
        [(20, 0.99), (40, 0.5), (50, 0.4)], ["id", "score"]
    )
    rows = {r["id"]: r for r in rrf_fuse([r1, r2], "id", "score", k0=60, k=10).collect()}
    assert rows[20]["n_lists"] == 2
    assert rows[20]["rrf"] == round(1 / 62 + 1 / 61, 6)
    assert rows[10]["rrf"] == round(1 / 61, 6)
    assert rows[40]["n_lists"] == 1
    # the doubly-ranked id must fuse above every single-list id
    best = max(rows.values(), key=lambda r: r["rrf"])
    assert best["id"] == 20


def test_rrf_fuse_rank_ties_break_by_id(spark):
    from sqlitedataframe_spark.operators.retrieval import rrf_fuse

    r1 = spark.createDataFrame([(2, 0.5), (1, 0.5)], ["id", "score"])
    rows = {r["id"]: r["rrf"] for r in rrf_fuse([r1], "id", "score", k0=60).collect()}
    # equal scores: rank 1 goes to the smaller id
    assert rows[1] == round(1 / 61, 6)
    assert rows[2] == round(1 / 62, 6)


def test_dsir_scores_prefer_target_like(spark):
    """Docs made of target-only vocabulary must outscore docs made of
    raw-only vocabulary."""
    from sqlitedataframe_spark.operators.sampling import dsir_scores

    rows = [(i, "alpha beta gamma", 1) for i in range(20)]
    rows += [(100 + i, "omega psi chi", 0) for i in range(20)]
    # held-out docs, one target-like, one raw-like
    rows += [(900, "alpha beta", 0), (901, "omega psi", 0)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "is_t"])
    # 256 buckets: feature-space size matched to the tiny corpus so the
    # add-0.5-per-bucket smoothing mass doesn't swamp the counts (the
    # registered query uses 4096 buckets against the real fixtures)
    got = {
        r["doc_id"]: r["dsir_score"]
        for r in dsir_scores(df, F.col("is_t") == 1, hex_chars=2).collect()
    }
    assert got[900] > 0 > got[901]
    # in-target docs all share the same token multiset -> identical means
    assert got[0] == got[19]


def test_pmi_collocations_hand_checked(spark):
    """'new york' always adjacent; 'the the' frequent but independent —
    PMI must rank the true collocation on top."""
    from sqlitedataframe_spark.operators.text import pmi_collocations

    corpus = [("new york " * 5).strip()] * 2 + ["the a the b the c the d the e"]
    df = spark.createDataFrame([(t,) for t in corpus], ["text"])
    out = pmi_collocations(df, min_count=2, k=10).collect()
    top = out[0]
    assert (top["w1"], top["w2"]) == ("new", "york")
    # hand-check: c(new york)=10, c(new)=c(york)=10, N=30 tokens
    n_tokens = 10 + 10 + 10
    assert top["pmi"] == round(math.log(10 * n_tokens / (10 * 10)), 6)
    assert top["c_xy"] == 10


def test_pmi_min_count_cut(spark):
    from sqlitedataframe_spark.operators.text import pmi_collocations

    df = spark.createDataFrame([("rare pair",), ("common common common",)], ["text"])
    out = pmi_collocations(df, min_count=2, k=10).collect()
    assert ("rare", "pair") not in {(r["w1"], r["w2"]) for r in out}


def test_pmi_single_token_doc_safe(spark):
    from sqlitedataframe_spark.operators.text import pmi_collocations

    df = spark.createDataFrame([("solo",), ("a b a b a b",)], ["text"])
    # must not raise on the 1-token document
    out = pmi_collocations(df, min_count=2, k=10).collect()
    assert {(r["w1"], r["w2"]) for r in out} == {("a", "b"), ("b", "a")}


def test_ks_drift_identical_and_shifted(spark):
    from sqlitedataframe_spark.operators.profiling import ks_drift

    a = spark.createDataFrame([(float(i % 10),) for i in range(100)], ["v"])
    same = ks_drift(a, a, "v", bin_width=1.0).collect()[0]
    assert same["ks_d"] == 0.0
    assert same["n_a"] == same["n_b"] == 100
    # disjoint supports -> D = 1
    b = spark.createDataFrame([(50.0 + i % 10,) for i in range(80)], ["v"])
    far = ks_drift(a, b, "v", bin_width=1.0).collect()[0]
    assert far["ks_d"] == 1.0
    assert far["n_b"] == 80


def test_ks_drift_hand_checked(spark):
    """a = {0,0,1}, b = {1,1,1}, width 1: ECDF_a = 2/3 at bin 0, 1 at
    bin 1; ECDF_b = 0, 1 -> D = 2/3."""
    from sqlitedataframe_spark.operators.profiling import ks_drift

    a = spark.createDataFrame([(0.0,), (0.5,), (1.0,)], ["v"])
    b = spark.createDataFrame([(1.0,), (1.2,), (1.9,)], ["v"])
    row = ks_drift(a, b, "v", bin_width=1.0).collect()[0]
    assert row["ks_d"] == round(2 / 3, 6)
    assert row["n_bins"] == 2


def test_benford_digits_uniform_vs_benford(spark):
    from sqlitedataframe_spark.operators.profiling import benford_digits

    # exact Benford sample: digit d appears round(1000*log10(1+1/d)) times
    rows = []
    v = 0
    for d in range(1, 10):
        n = round(1000 * math.log10(1 + 1 / d))
        rows += [(float(d) * 10 + 0.5,)] * n
        v += n
    df = spark.createDataFrame(rows, ["x"])
    out = benford_digits(df, "x").collect()
    assert [r["digit"] for r in out] == list(range(1, 10))
    assert sum(r["n"] for r in out) == v
    # near-perfect fit -> every chi2 term tiny
    assert all(abs(r["chi2_term"]) < 0.01 for r in out)
    # p_benford literals
    assert out[0]["p_benford"] == round(math.log10(2), 6)


def test_benford_excludes_sub_one(spark):
    from sqlitedataframe_spark.operators.profiling import benford_digits

    df = spark.createDataFrame([(0.5,), (0.0,), (12.0,), (93.0,)], ["x"])
    out = benford_digits(df, "x").collect()
    assert sum(r["n"] for r in out) == 2
    assert {r["digit"] for r in out} == {1, 9}


def test_cohort_matrix_hand_checked(spark):
    """u1 active weeks 0,1; u2 weeks 0; u3 weeks 1 -> cohort w0 size 2
    retains 1/2 at offset 1."""
    from sqlitedataframe_spark.operators.relational import cohort_matrix

    t0 = dt.datetime(2024, 1, 1)  # a Monday
    rows = [
        (1, t0), (1, t0 + dt.timedelta(days=8)),
        (2, t0 + dt.timedelta(days=2)),
        (3, t0 + dt.timedelta(days=7)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {(r["cohort"], r["period_offset"]): r for r in cohort_matrix(df, "user_id", "ts", "week").collect()}
    c0 = dt.date(2024, 1, 1)
    c1 = dt.date(2024, 1, 8)
    assert out[(c0, 0)]["n_users"] == 2
    assert out[(c0, 1)]["n_users"] == 1
    assert out[(c0, 1)]["pct_of_cohort"] == 0.5
    assert out[(c1, 0)]["n_users"] == 1
    assert out[(c1, 0)]["pct_of_cohort"] == 1.0


def test_time_weighted_avg_hand_checked(spark):
    """value 10 held 1 day then 30 held 3 days -> twa 25, plain avg 20."""
    from sqlitedataframe_spark.operators.relational import time_weighted_avg

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 10.0),
        (1, t0 + dt.timedelta(days=1), 30.0),
        (1, t0 + dt.timedelta(days=4), 99.0),  # last obs: excluded
        (2, t0, 5.0),  # single obs: no holding period -> dropped
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    out = {r["k"]: r for r in time_weighted_avg(df, "k", "ts", "v").collect()}
    assert set(out) == {1}
    assert out[1]["twa"] == round((10 * 1 + 30 * 3) / 4 + 1e-9, 4)
    assert out[1]["plain_avg"] == 20.0
    assert out[1]["n_periods"] == 2


def test_time_weighted_avg_zero_span_dropped(spark):
    from sqlitedataframe_spark.operators.relational import time_weighted_avg

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame([(1, t0, 1.0), (1, t0, 2.0)], ["k", "ts", "v"])
    assert time_weighted_avg(df, "k", "ts", "v").count() == 0


def test_markov_transitions_hand_checked(spark):
    from sqlitedataframe_spark.operators.mining import markov_transitions

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, "a", 1), (1, t0 + dt.timedelta(minutes=1), "b", 2),
        (1, t0 + dt.timedelta(minutes=2), "a", 3),
        (2, t0, "a", 4), (2, t0 + dt.timedelta(minutes=1), "b", 5),
    ]
    df = spark.createDataFrame(rows, ["u", "ts", "t", "eid"])
    out = {(r["from_type"], r["to_type"]): r for r in markov_transitions(df, "u", "ts", "t", tiebreak_col="eid").collect()}
    assert out[("a", "b")]["n"] == 2
    assert out[("b", "a")]["n"] == 1
    assert out[("a", "b")]["p"] == 1.0  # both a-transitions go to b
    assert out[("b", "a")]["p"] == 1.0
    # transitions never cross users
    assert ("b", "a") in out and ("a", "a") not in out


def test_markov_row_normalization(spark):
    from sqlitedataframe_spark.operators.mining import markov_transitions

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u, seq in [(1, "aab"), (2, "aac"), (3, "aab"), (4, "aab")]:
        for i, s in enumerate(seq):
            rows.append((u, t0 + dt.timedelta(minutes=i), s, eid))
            eid += 1
    df = spark.createDataFrame(rows, ["u", "ts", "t", "eid"])
    out = {(r["from_type"], r["to_type"]): r["p"] for r in markov_transitions(df, "u", "ts", "t", tiebreak_col="eid").collect()}
    assert out[("a", "a")] == 0.5
    assert out[("a", "b")] == round(3 / 8, 6)
    assert out[("a", "c")] == round(1 / 8, 6)


def test_pareto_classes_hand_checked(spark):
    """Weights 80, 15, 3, 2 -> A={80-part}, B={15-part}, C={3,2}."""
    from sqlitedataframe_spark.operators.profiling import pareto_classes

    df = spark.createDataFrame(
        [(1, 80.0), (2, 15.0), (3, 3.0), (4, 2.0)], ["k", "w"]
    )
    out = {r["pareto_class"]: r for r in pareto_classes(df, "k", F.sum("w")).collect()}
    assert out["A"]["n_keys"] == 1 and out["A"]["class_weight"] == 80.0
    assert out["B"]["n_keys"] == 1 and out["B"]["class_weight"] == 15.0
    assert out["C"]["n_keys"] == 2 and out["C"]["class_weight"] == 5.0
    assert out["A"]["weight_share"] == 0.8
    assert sum(r["n_keys"] for r in out.values()) == 4


def test_pareto_matches_single_sort_order(spark):
    """The two-level prefix sum must equal a plain running total: classes
    over random-ish weights match a driver-side recomputation."""
    from sqlitedataframe_spark.operators.profiling import pareto_classes

    rows = [(i, float((i * 37) % 100 + 1)) for i in range(200)]
    df = spark.createDataFrame(rows, ["k", "w"])
    got = {r["pareto_class"]: r["n_keys"] for r in pareto_classes(df, "k", F.sum("w")).collect()}
    # driver-side reference
    cents = sorted(((round(w * 100), k) for k, w in rows), key=lambda t: (-t[0], t[1]))
    tot = sum(c for c, _ in cents)
    cum, ref = 0, {"A": 0, "B": 0, "C": 0}
    for c, _ in cents:
        cum += c
        ref["A" if cum * 100 <= tot * 80 else "B" if cum * 100 <= tot * 95 else "C"] += 1
    assert got == {k: v for k, v in ref.items() if v}


def test_last_touch_attribution_hand_checked(spark):
    from sqlitedataframe_spark.operators.mining import last_touch_attribution

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # u1: view -> click -> purchase (credit click)
        (1, t0, "view", 1.0, 1),
        (1, t0 + dt.timedelta(hours=1), "click", 1.0, 2),
        (1, t0 + dt.timedelta(hours=2), "purchase", 50.0, 3),
        # u2: view then purchase 10 days later -> outside window, dropped
        (2, t0, "view", 1.0, 4),
        (2, t0 + dt.timedelta(days=10), "purchase", 70.0, 5),
        # u3: purchase with no preceding touch -> dropped
        (3, t0, "purchase", 30.0, 6),
    ]
    df = spark.createDataFrame(rows, ["u", "ts", "t", "v", "eid"])
    out = {r["touch_type"]: r for r in last_touch_attribution(
        df, "u", "ts", "t", "v", conversion_type="purchase",
        window_days=7, tiebreak_col="eid").collect()}
    assert set(out) == {"click"}
    assert out["click"]["n_conversions"] == 1
    assert out["click"]["attributed_value"] == 50.0


def test_negative_sampling_quotas_power_law(spark):
    from sqlitedataframe_spark.operators.sampling import negative_sampling_quotas

    df = spark.createDataFrame(
        [(("common " * 16).strip() + " rare",), (("common " * 15).strip(),)],
        ["text"],
    )
    out = {r["tok"]: r for r in negative_sampling_quotas(df, total=1000, k=10).collect()}
    # 3/4-power smoothing: quota ratio < count ratio
    c_common, c_rare = out["common"]["n"], out["rare"]["n"]
    q_common, q_rare = out["common"]["quota"], out["rare"]["quota"]
    assert c_common / c_rare > q_common / q_rare > 1
    # quotas approximately fill the total
    assert abs((q_common + q_rare) - 1000) <= 2


def test_ngram_novelty_first_doc_is_fully_novel(spark):
    from sqlitedataframe_spark.operators.text import ngram_novelty_curve

    rows = [
        (0, "a b c d e"),        # all 3-grams first seen here
        (1, "a b c d e"),        # exact copy: nothing novel
        (2, "x y z w"),          # all novel again
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["id_bucket"]: r for r in ngram_novelty_curve(df, n=3, bucket=1).collect()}
    assert out[0]["avg_novelty"] == 1.0
    assert out[1]["avg_novelty"] == 0.0
    assert out[2]["avg_novelty"] == 1.0


def test_mmr_rerank_prefers_diversity(spark):
    """Three near-identical high-relevance docs + one distinct mid-rel
    doc: MMR must interleave the distinct doc at rank 2."""
    from sqlitedataframe_spark.operators.retrieval import mmr_rerank

    cand = spark.createDataFrame(
        [(1, 0.99), (2, 0.98), (3, 0.97), (4, 0.80)], ["id", "rel"]
    )
    # 1,2,3 mutually ~identical; 4 orthogonal to all
    sims = []
    for a in (1, 2, 3):
        for b in (1, 2, 3):
            if a != b:
                sims.append((a, b, 0.99))
    for a in (1, 2, 3):
        sims += [(a, 4, 0.0), (4, a, 0.0)]
    sdf = spark.createDataFrame(sims, ["ia", "ib", "sim"])
    out = [r["id"] for r in mmr_rerank(cand, sdf, "id", "rel", k=3, lam=0.7).collect()]
    assert out[0] == 1          # pure relevance first
    assert out[1] == 4          # 0.7*0.8 - 0.3*0 = 0.56 beats 0.7*0.98 - 0.3*0.99
    assert out[2] == 2          # back to the relevant cluster


def test_mmr_rerank_hand_scores(spark):
    from sqlitedataframe_spark.operators.retrieval import mmr_rerank

    cand = spark.createDataFrame([(1, 0.9), (2, 0.5)], ["id", "rel"])
    sdf = spark.createDataFrame([(1, 2, 0.4), (2, 1, 0.4)], ["ia", "ib", "sim"])
    rows = {r["rank"]: r for r in mmr_rerank(cand, sdf, "id", "rel", k=2, lam=0.7).collect()}
    assert rows[1]["id"] == 1 and rows[1]["mmr"] == round(0.7 * 0.9, 6)
    assert rows[2]["id"] == 2
    assert rows[2]["mmr"] == round(0.7 * 0.5 - (1.0 - 0.7) * 0.4, 6)


def test_rolling_active_users_hand_checked(spark):
    """u1 active day 0; u2 active day 0 and 3 -> WAU covers forward."""
    from sqlitedataframe_spark.operators.relational import rolling_active_users

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0), (2, t0), (2, t0 + dt.timedelta(days=3)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {r["day"]: r for r in rolling_active_users(df, "user_id", "ts", window_days=7).collect()}
    d0, d3 = dt.date(2024, 1, 1), dt.date(2024, 1, 4)
    # only days with their own activity appear
    assert set(out) == {d0, d3}
    assert out[d0]["dau"] == 2 and out[d0]["wau"] == 2
    # day 3: only u2 active today, but both users active within the
    # trailing week (u1's day-0 activity covers days 0-6)
    assert out[d3]["dau"] == 1 and out[d3]["wau"] == 2
    assert out[d3]["stickiness"] == 0.5


def test_zipf_fit_exact_power_law(spark):
    """freq(rank) = C / rank exactly -> slope -1, r2 1."""
    from sqlitedataframe_spark.operators.text import zipf_fit

    docs = []
    for rank in range(1, 11):
        tok = f"tok{rank:02d}"
        docs.append((" ".join([tok] * (2520 // rank)),))
    df = spark.createDataFrame(docs, ["text"])
    row = zipf_fit(df, top_n=10).collect()[0]
    assert row["n_tokens"] == 10
    assert abs(row["zipf_slope"] + 1.0) < 1e-4
    assert row["r2"] > 0.99999


def test_association_rules_hand_checked(spark):
    """A and B always co-occur (lift > 1); C appears everywhere
    (lift = 1 vs anything)."""
    from sqlitedataframe_spark.operators.mining import association_rules

    rows = []
    for g in range(10):
        rows += [(g, "C")]
        if g < 5:
            rows += [(g, "A"), (g, "B")]
        else:
            rows += [(g, "D")]
    df = spark.createDataFrame(rows, ["g", "i"])
    out = {(r["ante"], r["cons"]): r for r in association_rules(df, "g", "i", min_support=2, k=50).collect()}
    ab = out[("A", "B")]
    assert ab["n_ab"] == 5 and ab["confidence"] == 1.0 and ab["lift"] == 2.0
    ac = out[("A", "C")]
    assert ac["confidence"] == 1.0 and ac["lift"] == 1.0  # C is universal
    # directed: both orders present with their own confidence
    assert out[("C", "A")]["confidence"] == 0.5


def test_poisson_bootstrap_ci_brackets_mean(spark):
    """CI must bracket the true mean for a well-behaved sample, and be
    deterministic across invocations (hash-seeded)."""
    from sqlitedataframe_spark.operators.profiling import poisson_bootstrap_ci

    rows = [(i, float(50 + (i * 13) % 21)) for i in range(400)]
    df = spark.createDataFrame(rows, ["k", "v"])
    r1 = poisson_bootstrap_ci(df, "k", "v", b_reps=60).collect()[0]
    r2 = poisson_bootstrap_ci(df, "k", "v", b_reps=60).collect()[0]
    assert r1 == r2  # fully deterministic
    assert r1["n"] == 400 and r1["b_reps"] == 60
    assert r1["ci_lo"] < r1["mean"] < r1["ci_hi"]
    # CI width for n=400, sd~6: a few sigma/20 — sane, not degenerate
    assert 0.1 < r1["ci_hi"] - r1["ci_lo"] < 5.0


def test_poisson_weight_distribution(spark):
    """Empirical Poisson(1) weights: mean multiplicity ~ 1."""
    from sqlitedataframe_spark.operators.profiling import poisson_bootstrap_ci

    rows = [(i, 1.0) for i in range(2000)]
    df = spark.createDataFrame(rows, ["k", "v"])
    r = poisson_bootstrap_ci(df, "k", "v", b_reps=20).collect()[0]
    # every replicate mean of a constant column is exactly 1
    assert r["ci_lo"] == r["ci_hi"] == 1.0


def test_yoy_growth_hand_checked(spark):
    from sqlitedataframe_spark.operators.relational import yoy_growth

    rows = [
        (dt.datetime(2023, 3, 10), 100.0),
        (dt.datetime(2024, 3, 5), 150.0),
        (dt.datetime(2024, 4, 1), 80.0),  # no 2023-04 -> NULL yoy
        (dt.datetime(2026, 3, 1), 300.0),  # gap year -> NULL yoy
    ]
    df = spark.createDataFrame(rows, ["ts", "v"])
    out = {(r["year"], r["month"]): r for r in yoy_growth(df, "ts", F.sum("v")).collect()}
    assert out[(2024, 3)]["yoy_pct"] == 50.0
    assert out[(2024, 4)]["yoy_pct"] is None
    assert out[(2026, 3)]["yoy_pct"] is None  # 2025-03 missing
    assert out[(2023, 3)]["yoy_pct"] is None


def test_seasonal_decompose_recovers_planted_signal(spark):
    """trend 1000 + seasonal +120 in June, -120 in December -> the
    decomposition recovers both components for interior months."""
    from sqlitedataframe_spark.operators.relational import seasonal_decompose

    rows = []
    for year in range(2018, 2024):
        for month in range(1, 13):
            v = 1000.0 + (120.0 if month == 6 else -120.0 if month == 12 else 0.0)
            rows.append((dt.datetime(year, month, 15), v))
    df = spark.createDataFrame(rows, ["ts", "v"])
    out = {(r["year"], r["month"]): r for r in seasonal_decompose(df, "ts", F.sum("v")).collect()}
    # interior point: trend ~ series mean. A plain 13-month window spans
    # 13 months, double-counting one month-of-year (the classical fix is
    # the 2x12 weighted MA), so the trend carries a ~|120|/13 bias
    r = out[(2020, 6)]
    assert abs(r["trend"] - 1000.0) < 10.0
    assert r["seasonal"] > 100.0
    assert abs(r["residual"]) < 25.0
    # December seasonal strongly negative
    assert out[(2020, 12)]["seasonal"] < -100.0
    # edge months (first/last half-window) are dropped
    assert (2018, 1) not in out and (2023, 12) not in out


def test_weighted_median_hand_checked(spark):
    """values 1(w=1), 2(w=1), 100(w=10): weighted median 100; the plain
    median would say 2."""
    from sqlitedataframe_spark.operators.profiling import weighted_median

    df = spark.createDataFrame(
        [(1.0, 1), (2.0, 1), (100.0, 10)], ["v", "w"]
    )
    r = weighted_median(df, "v", "w").collect()[0]
    assert r["weighted_median"] == 100.0
    assert r["total_weight"] == 12


def test_weighted_median_grouped_matches_sorted_recompute(spark):
    from sqlitedataframe_spark.operators.profiling import weighted_median

    rows = [("g1", float(i), (i % 3) + 1) for i in range(1, 101)]
    rows += [("g2", float(i * 2), 1) for i in range(1, 51)]
    df = spark.createDataFrame(rows, ["g", "v", "w"])
    got = {r["g"]: r["weighted_median"] for r in weighted_median(df, "v", "w", group_col="g").collect()}

    def ref(items):
        items = sorted(items)
        tot = sum(w for _, w in items)
        cum = 0
        for v, w in items:
            cum += w
            if cum * 2 >= tot:
                return v
    assert got["g1"] == ref([(v, w) for g, v, w in rows if g == "g1"])
    assert got["g2"] == ref([(v, w) for g, v, w in rows if g == "g2"])


def test_hashed_tfidf_features_shape_and_idf(spark):
    from sqlitedataframe_spark.operators.text import hashed_tfidf_features

    rows = [(i, "common unique%d" % i) for i in range(8)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["features"] for r in hashed_tfidf_features(df, dim=16).collect()}
    assert all(len(v) == 16 for v in out.values())
    # 'common' appears in every doc -> idf ln(8/8)=0 in its bucket unless
    # a unique token collides into it; every doc still has >= 1 nonzero
    # cell from its unique token (idf ln(8/1) > 0)
    assert all(any(x > 0 for x in v) for v in out.values())


def test_kfold_assign_deterministic_and_group_safe(spark):
    from sqlitedataframe_spark.operators.sampling import kfold_assign

    df = spark.createDataFrame(
        [(i, i % 7) for i in range(200)], ["id", "grp"]
    )
    a = {r["id"]: r["fold"] for r in kfold_assign(df, "id", 5).collect()}
    b = {r["id"]: r["fold"] for r in kfold_assign(df, "id", 5).collect()}
    assert a == b
    assert set(a.values()) <= set(range(5))
    # every fold populated for 200 keys
    assert len(set(a.values())) == 5
    # group mode: one fold per group
    g = kfold_assign(df, "id", 5, group_col="grp")
    per_group = g.groupBy("grp").agg(F.countDistinct("fold").alias("n")).collect()
    assert all(r["n"] == 1 for r in per_group)


def test_grouped_log_log_slope_exact_power_law(spark):
    """y = 3 * x^-2 exactly -> slope -2, r2 = 1; non-positive rows
    excluded."""
    from sqlitedataframe_spark.operators.profiling import grouped_log_log_slope

    rows = [("g", float(x), 3.0 * x ** -2.0) for x in range(1, 20)]
    rows += [("g", 0.0, 5.0), ("g", 2.0, 0.0)]  # excluded scan-side
    df = spark.createDataFrame(rows, ["grp", "x", "y"])
    r = grouped_log_log_slope(df, "grp", "x", "y").collect()[0]
    assert abs(r["slope"] + 2.0) < 1e-6
    assert r["r2"] > 0.999999
    assert r["n_points"] == 19


def test_degree_stats_star_graph(spark):
    """Star K1,5: hub degree 5, leaves degree 1."""
    from sqlitedataframe_spark.operators.graph import degree_stats

    edges = spark.createDataFrame([(0, i) for i in range(1, 6)], ["a", "b"])
    out = {r["deg_bucket"]: r for r in degree_stats(edges, "a", "b", d_min=2).collect()}
    # bucket 0 = degree 1 leaves (floor(log2(1))=0); bucket 2 = degree 5 hub
    assert out[0]["n_nodes"] == 5 and out[0]["avg_degree"] == 1.0
    assert out[2]["n_nodes"] == 1 and out[2]["avg_degree"] == 5.0
    # alpha computed over the single tail node (degree 5 >= 2)
    assert out[0]["n_tail_nodes"] == 1
    import math
    assert out[0]["alpha"] == round(1.0 + 1.0 / math.log(5 / 1.5), 4)


def test_degree_stats_dedupes_directions(spark):
    from sqlitedataframe_spark.operators.graph import degree_stats

    # same edge in both directions + duplicate: degree must count once
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2)], ["a", "b"]
    )
    out = degree_stats(edges, "a", "b", d_min=1).collect()
    assert all(r["avg_degree"] == 1.0 for r in out)
    assert sum(r["n_nodes"] for r in out) == 2


def test_stream_countmin_merge_equals_batch(spark, tmp_path):
    """3 parquet files driven one per micro-batch: the cell-summed union
    of per-batch count-min sketches must equal the one-shot sketch
    bit-for-bit (count-min is mergeable; md5 cells are deterministic)."""
    import os

    from sqlitedataframe_spark.operators.sketch import countmin_build
    from sqlitedataframe_spark.sources.sqlite import read_sql, table_exists, write_sql

    rows = [(i % 37,) for i in range(600)]
    full = spark.createDataFrame(rows, "k long")
    ddir = str(tmp_path / "tbl.parquet")
    for j in range(3):
        full.filter((F.col("k") % 3) == j).coalesce(1).write.mode("append").parquet(ddir)

    db = str(tmp_path / "cm.db")

    def sink(batch_df, batch_id):
        sk = countmin_build(batch_df, "k", depth=4, width=64)
        mode = "append" if table_exists(db, "cm") else "replace"
        write_sql(sk, db, table="cm", if_exists=mode)

    stream = (
        spark.readStream.schema(full.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(ddir)
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    merged = {
        (r["d"], r["cell"]): r["c"]
        for r in read_sql(spark, db, table="cm")
        .groupBy("d", "cell")
        .agg(F.sum("c").alias("c"))
        .collect()
    }
    oneshot = {
        (r["d"], r["cell"]): r["c"]
        for r in countmin_build(
            spark.read.parquet(ddir), "k", depth=4, width=64
        ).collect()
    }
    assert merged == oneshot and len(oneshot) > 30


def test_funnel_stage_times_strict_order(spark):
    from sqlitedataframe_spark.operators.mining import funnel_stage_times

    t0 = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    rows = [
        # u1 completes in order
        (1, t0, "view"), (1, t0 + h, "click"), (1, t0 + 3 * h, "purchase"),
        # u2: purchase BEFORE click -> not a completion
        (2, t0, "view"), (2, t0 + 2 * h, "click"), (2, t0 + h, "purchase"),
        # u3: no click
        (3, t0, "view"), (3, t0 + h, "purchase"),
    ]
    df = spark.createDataFrame(rows, ["u", "ts", "t"])
    out = {r["u"]: r for r in funnel_stage_times(df, "u", "ts", "t", ["view", "click", "purchase"]).collect()}
    assert set(out) == {1}
    assert out[1]["t_view"] == t0
    assert out[1]["t_click"] == t0 + h
    assert out[1]["t_purchase"] == t0 + 3 * h


def test_funnel_stage_times_first_after_previous(spark):
    """The chosen click is the FIRST one after the first view, not the
    global first click."""
    from sqlitedataframe_spark.operators.mining import funnel_stage_times

    t0 = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    rows = [
        (1, t0 + h, "view"),
        (1, t0, "click"),          # before the view: must be skipped
        (1, t0 + 2 * h, "click"),  # this one counts
    ]
    df = spark.createDataFrame(rows, ["u", "ts", "t"])
    out = funnel_stage_times(df, "u", "ts", "t", ["view", "click"]).collect()
    assert out[0]["t_click"] == t0 + 2 * h


def test_langid_confusion_fractions_sum_to_one(spark):
    from sqlitedataframe_spark.operators.text import lang_id

    df = spark.createDataFrame(
        [("en", "the cat and the dog in the house is it"),
         ("en", "xyz qrs"),
         ("zh", "中文文本")],
        ["lang", "text"],
    )
    j = df.select("lang", lang_id("text").alias("p"))
    rows = j.groupBy("lang", "p").count().collect()
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r["lang"], 0)
        per_lang[r["lang"]] += r["count"]
    assert per_lang == {"en": 2, "zh": 1}


def test_supplier_ship_lag_registered(spark):
    """Registered-query smoke on tiny fixtures: deterministic schema and
    lag arithmetic (date-level day difference)."""
    from sqlitedataframe_spark.suite import load_all

    reg = load_all()
    df = reg["supplier_ship_lag"].spark_fn(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert df.columns == ["l_suppkey", "n_lines", "avg_lag_days", "p90_lag_days"]
    assert 0 < len(rows) <= 25
    assert all(r["p90_lag_days"] >= 0 for r in rows)
    # descending p90 order with suppkey tiebreak
    vals = [(r["p90_lag_days"], r["l_suppkey"]) for r in rows]
    assert vals == sorted(vals, key=lambda t: (-t[0], t[1]))


def test_hhi_concentration_bounds(spark):
    """Registered query at tiny sf: HHI in (1/n_suppliers, 1]."""
    from sqlitedataframe_spark.suite import load_all

    reg = load_all()
    rows = reg["orders_hhi_concentration"].spark_fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert 0 < 1.0 / r["n_suppliers"] <= r["hhi"] <= 1.0 + 1e-9
