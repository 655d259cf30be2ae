"""Round-5 wave: discrete percentiles, interarrival cadence, join-skew
profile, centroid geometry, Theil-Sen trend."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_key_skew_profile_hand_checked(spark):
    """Keys a:6 b:2 c:2 d:2 -> n_keys=4, max=6, share=0.5, salt=3."""
    from sqlitedataframe_spark.operators.profiling import key_skew_profile

    df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 2 + [("c",)] * 2 + [("d",)] * 2, ["k"]
    )
    r = key_skew_profile([("t", df, "k")]).collect()[0]
    assert r["relation"] == "t"
    assert r["n_keys"] == 4 and r["n_rows"] == 12
    assert r["max_key_rows"] == 6
    assert r["max_share"] == 0.5
    # p50 of [6,2,2,2] = 2 -> salt = ceil(6/2) = 3
    assert r["suggested_salt"] == 3


def test_key_skew_profile_uniform_no_salt(spark):
    from sqlitedataframe_spark.operators.profiling import key_skew_profile

    df = spark.createDataFrame([(i % 5,) for i in range(20)], ["k"])
    r = key_skew_profile([("u", df, "k")]).collect()[0]
    # perfectly level keys -> salt factor 1, p99/p50 = 1
    assert r["suggested_salt"] == 1
    assert r["p99_over_p50"] == 1.0


def test_percentile_disc_returns_observed_values(spark, sf_dir):
    """Discrete percentiles must be members of the value domain —
    l_quantity is integral in the fixture, so no interpolated .5s."""
    from sqlitedataframe_spark.suite import load_all

    q = load_all()["agg_percentile_disc"].spark_fn
    for r in q(spark, sf_dir).collect():
        for c in ("p25_qty", "p50_qty", "p75_qty", "p90_qty"):
            assert r[c] == int(r[c])
        assert r["p25_qty"] <= r["p50_qty"] <= r["p75_qty"] <= r["p90_qty"]


def test_theil_sen_median_of_pairwise_slopes(spark):
    """Points (0,0) (1,10) (2,20) (3,1000): OLS is dragged by the
    outlier; the pairwise-slope median stays near 10."""
    from pyspark.sql import Window

    # hand-compute via the same operator shape the suite query uses
    pts = spark.createDataFrame(
        [(0, 0.0), (1, 10.0), (2, 20.0), (3, 1000.0)], ["idx", "rev"]
    )
    a = pts.select(F.col("idx").alias("ia"), F.col("rev").alias("ra"))
    b = pts.select(F.col("idx").alias("ib"), F.col("rev").alias("rb"))
    # broadcast: a 4-row python-local relation has no stats, so the
    # non-equi join otherwise plans as a 32x32-task CartesianProduct
    # (measured 17 s for 6 rows)
    s = (
        a.join(F.broadcast(b), F.col("ib") > F.col("ia"))
        .select(
            ((F.col("rb") - F.col("ra")) / (F.col("ib") - F.col("ia"))).alias(
                "s"
            )
        )
        .agg(F.percentile("s", F.lit(0.5)).alias("m"))
        .collect()[0]["m"]
    )
    # slopes: 10,10,495,10,333.3,980 -> sorted 10,10,10,333.3,495,980
    # median = (10+333.33)/2
    assert abs(s - (10 + 1000 / 3) / 2) < 1e-6


def test_centroid_distances_symmetric_bounds(spark, sf_dir):
    from sqlitedataframe_spark.suite import load_all

    q = load_all()["embed_centroid_distances"].spark_fn
    rows = q(spark, sf_dir).collect()
    n_labels = len({r["label_a"] for r in rows} | {r["label_b"] for r in rows})
    # strict upper triangle: exactly C(n,2) pairs, each emitted once
    assert len(rows) == n_labels * (n_labels - 1) // 2
    for r in rows:
        assert r["label_a"] < r["label_b"]
        assert -1 - 1e-9 <= r["cos_sim"] <= 1 + 1e-9
        assert r["l2_dist"] >= 0


def test_interarrival_stats_invariants(spark, sf_dir):
    from sqlitedataframe_spark.suite import load_all

    q = load_all()["orders_interarrival_stats"].spark_fn
    r = q(spark, sf_dir).collect()[0]
    assert 0 < r["repeat_rate"] <= 1
    assert r["p50_gap_days"] <= r["p90_gap_days"] <= r["max_gap_days"]
    # every repeat customer contributes >= 1 gap
    assert r["n_gaps"] >= r["n_repeat_customers"]


def test_woe_iv_signs_and_smoothing(spark):
    """Feature separates perfectly across 2 bins: low bin all-negative
    (woe < 0), high bin all-positive (woe > 0), every iv_term > 0, and
    the empty cells survive via Laplace smoothing (finite woe)."""
    from sqlitedataframe_spark.operators.features import woe_iv

    rows = [(i / 100.0, 0) for i in range(50)] + [
        (0.5 + i / 100.0, 1) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "s double, y int")
    out = woe_iv(df, "s", "y", n_bins=2).collect()
    assert len(out) == 2
    lo = next(r for r in out if r["bin"] == 1)
    hi = next(r for r in out if r["bin"] == 2)
    assert lo["n_pos"] == 0 and hi["n_neg"] == 0
    import math

    assert lo["woe"] < 0 < hi["woe"]
    assert all(math.isfinite(r["woe"]) for r in out)
    assert all(r["iv_term"] > 0 for r in out)


def test_woe_iv_uninformative_feature_near_zero(spark):
    """Label independent of score -> woe ~ 0 and IV ~ 0 in every bin."""
    from sqlitedataframe_spark.operators.features import woe_iv

    rows = [(i / 100.0, i % 2) for i in range(100)]
    df = spark.createDataFrame(rows, "s double, y int")
    out = woe_iv(df, "s", "y", n_bins=4).collect()
    # 12/13 splits in 25-row bins put |woe| at ~0.077 — granularity,
    # not signal; the IV sum is the meaningful near-zero check
    assert all(abs(r["woe"]) < 0.1 for r in out)
    assert sum(r["iv_term"] for r in out) < 0.01


def test_gini_extremes(spark):
    """Equal weights -> 0; one key holds everything -> (n-1)/n."""
    from sqlitedataframe_spark.operators.profiling import gini_by_group

    eq = spark.createDataFrame(
        [("g", i, 10.0) for i in range(5)], "g string, k int, w double"
    )
    r = gini_by_group(eq, "g", "k", "w").collect()[0]
    assert r["gini"] == 0.0 and r["n_keys"] == 5
    # all mass on one key of 5: G = 2*(5*x)/(5*x) - 6/5 = 0.8
    conc = spark.createDataFrame(
        [("g", 0, 100.0)] + [("g", i, 0.0) for i in range(1, 5)],
        "g string, k int, w double",
    )
    r = gini_by_group(conc, "g", "k", "w").collect()[0]
    assert abs(r["gini"] - 0.8) < 1e-9


def test_gini_hand_checked_groups_independent(spark):
    """Weights 1,2,3,4 -> G = 2*(1+4+9+16)/(4*10) - 5/4 = 0.25; a second
    uniform group must not perturb it."""
    from sqlitedataframe_spark.operators.profiling import gini_by_group

    rows = [("a", i, float(i)) for i in range(1, 5)] + [
        ("b", i, 7.0) for i in range(3)
    ]
    df = spark.createDataFrame(rows, "g string, k int, w double")
    out = {r["g"]: r for r in gini_by_group(df, "g", "k", "w").collect()}
    assert abs(out["a"]["gini"] - 0.25) < 1e-9
    assert out["b"]["gini"] == 0.0


def test_silhouette_separated_and_swapped(spark):
    """Two tight clusters 10 apart: s = (sqrt(101)-1)/sqrt(101) for
    every point; swapping the labels flips the silhouette negative."""
    from sqlitedataframe_spark.operators.similarity import (
        silhouette_by_label,
    )

    rows = [
        (0, "A", [0.0, 0.0]), (1, "A", [0.0, 2.0]),
        (2, "B", [10.0, 0.0]), (3, "B", [10.0, 2.0]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id int, label string, embedding array<double>"
    )
    out = {r["label"]: r for r in silhouette_by_label(df).collect()}
    expected = (101 ** 0.5 - 1) / 101 ** 0.5
    for lab in ("A", "B"):
        assert abs(out[lab]["avg_silhouette"] - expected) < 1e-6
        assert out[lab]["frac_negative"] == 0.0
    # plant one mislabeled point INSIDE cluster B: it sits at B's
    # centroid (b = 0, a = 20/3) -> s = -1, dragging A's mean down and
    # tripping frac_negative = 1/3
    mislabeled = spark.createDataFrame(
        rows[:2] + [(4, "A", [10.0, 1.0])] + rows[2:],
        "vec_id int, label string, embedding array<double>",
    )
    out2 = {r["label"]: r for r in silhouette_by_label(mislabeled).collect()}
    assert out2["A"]["frac_negative"] == 0.333333
    assert out2["A"]["avg_silhouette"] < 0.11
    assert out2["B"]["avg_silhouette"] > 0.8
    assert out2["B"]["frac_negative"] == 0.0


def test_heaps_fit_exact_half_power(spark):
    """Doc j = 1 new token + 2j filler repeats -> cumN = (j+1)^2,
    cumV = j+1: V = N^0.5 exactly -> beta .5, k 1, r2 1."""
    from sqlitedataframe_spark.operators.text import heaps_fit

    rows = [
        (j, "t" + str(j) + " " + " ".join(["t0"] * (2 * j)) if j else "t0")
        for j in range(16)
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    r = heaps_fit(df, n_buckets=16).collect()[0]
    assert abs(r["beta"] - 0.5) < 1e-6
    assert abs(r["k"] - 1.0) < 1e-3
    assert abs(r["r2"] - 1.0) < 1e-6
    assert r["n_points"] == 16


def test_heaps_fit_saturated_vocab_guard(spark):
    """Constant vocabulary across buckets: beta exactly 0, k = V,
    r2 NULL — the exact-integer degeneracy guard, not FP noise."""
    from sqlitedataframe_spark.operators.text import heaps_fit

    df = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(32)],
        "doc_id int, text string",
    )
    r = heaps_fit(df, n_buckets=8).collect()[0]
    assert r["beta"] == 0.0
    assert r["k"] == 3.0
    assert r["r2"] is None


def test_burstiness_regular_vs_bursty(spark):
    import datetime as dt

    from sqlitedataframe_spark.operators.profiling import (
        interarrival_cv_summary,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # u1: metronome (gaps 10s) -> cv 0
    for i in range(5):
        rows.append((1, i, t0 + dt.timedelta(seconds=10 * i)))
    # u2: burst then silence (gaps 1, 1, 98) -> cv > 1
    for i, sec in enumerate([0, 1, 2, 100]):
        rows.append((2, 100 + i, t0 + dt.timedelta(seconds=sec)))
    df = spark.createDataFrame(rows, "user_id int, event_id int, ts timestamp")
    r = interarrival_cv_summary(
        df, "user_id", "ts", order_cols=["ts", "event_id"]
    ).collect()[0]
    assert r["n_keys"] == 2
    assert r["frac_bursty"] == 0.5
    # u1 contributes cv = 0 exactly; u2's cv = sd/mean of [1,1,98]
    import statistics

    cv2 = statistics.stdev([1, 1, 98]) / statistics.mean([1, 1, 98])
    assert abs(r["avg_cv"] - cv2 / 2) < 1e-6
    # exact-percentile interp over [0, cv2]: index .9 * (n-1) -> .9 * cv2
    assert abs(r["p90_cv"] - cv2 * 0.9) < 1e-6


def test_quantile_normalize_map_hand_checked(spark):
    """Group a = 0..100 uniform, group b = a + 10 shift: gaps are
    symmetric (+5 / -5) at every grid point and ref is the midpoint."""
    from sqlitedataframe_spark.operators.features import (
        quantile_normalize_map,
    )

    rows = [("a", float(i)) for i in range(101)] + [
        ("b", float(i + 10)) for i in range(101)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = quantile_normalize_map(df, "g", "v").collect()
    assert len(out) == 20  # 2 groups x 10 grid points
    for r in out:
        assert abs(abs(r["gap"]) - 5.0) < 1e-9
        sign = -1 if r["g"] == "a" else 1
        assert abs(r["group_q"] - (r["ref_q"] + sign * 5.0)) < 1e-9
    # identical distributions -> zero gaps everywhere
    same = spark.createDataFrame(
        [("a", float(i)) for i in range(50)]
        + [("b", float(i)) for i in range(50)],
        "g string, v double",
    )
    out2 = quantile_normalize_map(same, "g", "v").collect()
    assert all(r["gap"] == 0.0 for r in out2)


def test_cliffs_delta_hand_checked(spark):
    """a = {3, 4}, b = {1, 2}: every a beats every b -> d = 1; reversed
    -> -1; interleaved with ties -> the exact pair arithmetic."""
    from sqlitedataframe_spark.operators.profiling import cliffs_delta

    a = spark.createDataFrame([(3.0,), (4.0,)], "v double")
    b = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    assert cliffs_delta(a, b, "v").collect()[0]["cliffs_d"] == 1.0
    assert cliffs_delta(b, a, "v").collect()[0]["cliffs_d"] == -1.0
    # a = {1, 2, 2}, b = {2, 3}: pairs (a>b, a<b) -> wins 0, losses:
    # 1<2, 1<3, 2<3, 2<3 = 4, ties 2 -> d = (0 - 4) / 6
    a2 = spark.createDataFrame([(1.0,), (2.0,), (2.0,)], "v double")
    b2 = spark.createDataFrame([(2.0,), (3.0,)], "v double")
    r = cliffs_delta(a2, b2, "v").collect()[0]
    assert abs(r["cliffs_d"] - (-4 / 6)) < 1e-6
    assert r["n_a"] == 3 and r["n_b"] == 2


def test_cliffs_delta_identical_zero(spark):
    from sqlitedataframe_spark.operators.profiling import cliffs_delta

    a = spark.createDataFrame([(float(i),) for i in range(20)], "v double")
    b = spark.createDataFrame([(float(i),) for i in range(20)], "v double")
    assert cliffs_delta(a, b, "v").collect()[0]["cliffs_d"] == 0.0


def test_cluster_sizes_conservation(spark, sf_dir):
    """Histogram invariants on the fixture: docs are partitioned by the
    clusters (sum n_docs = corpus size), singletons remove nothing, and
    removable = docs - clusters in every row."""
    from sqlitedataframe_spark.suite import load_all
    from sqlitedataframe_spark.io import load_table

    q = load_all()["dedup_cluster_sizes"].spark_fn
    rows = q(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert r["n_docs"] == r["cluster_size"] * r["n_clusters"]
        assert r["removable_dups"] == r["n_docs"] - r["n_clusters"]
    ones = [r for r in rows if r["cluster_size"] == 1]
    assert ones and ones[0]["removable_dups"] == 0


def test_k_anonymity_hand_checked(spark):
    """Classes: (a,1)x1, (a,2)x3, (b,1)x5, (b,2)x20 -> min_k 1, one
    class per band, rows below k=5: 1 + 3 = 4 of 29."""
    from sqlitedataframe_spark.operators.profiling import k_anonymity_audit

    rows = (
        [("a", 1)] + [("a", 2)] * 3 + [("b", 1)] * 5 + [("b", 2)] * 20
    )
    df = spark.createDataFrame(rows, "q1 string, q2 int")
    r = k_anonymity_audit(df, ["q1", "q2"], k_threshold=5).collect()[0]
    assert r["n_classes"] == 4 and r["n_rows"] == 29
    assert r["min_k"] == 1
    assert (r["classes_k1"], r["classes_k2_4"], r["classes_k5_19"],
            r["classes_k20_plus"]) == (1, 1, 1, 1)
    assert abs(r["frac_rows_below_k"] - 4 / 29) < 1e-6


def test_k_anonymity_fully_anonymous(spark):
    from sqlitedataframe_spark.operators.profiling import k_anonymity_audit

    df = spark.createDataFrame(
        [("g", i % 2) for i in range(20)], "q1 string, q2 int"
    )
    r = k_anonymity_audit(df, ["q1", "q2"], k_threshold=5).collect()[0]
    assert r["min_k"] == 10
    assert r["frac_rows_below_k"] == 0.0


def test_markov_backtest_learns_planted_structure(spark, sf_dir):
    """Fixture sanity: the transition model must beat or match the
    majority baseline (it degenerates to it when structure is flat),
    and accuracies are proper probabilities."""
    from sqlitedataframe_spark.suite import load_all

    q = load_all()["events_markov_backtest"].spark_fn
    r = q(spark, sf_dir).collect()[0]
    assert r["n_test"] > 100
    assert 0 <= r["baseline_accuracy"] <= 1
    assert 0 <= r["accuracy"] <= 1
    # the synthetic stream has ~no transition structure: both model and
    # baseline sit near 1/|types|; the backtest's job is the honest
    # readout, so only sanity-band the ratio
    assert 0.8 <= r["lift_over_majority"] <= 2.0


def test_l_diversity_homogeneous_class_flagged(spark):
    """Class (a): one sensitive value among 5 rows -> l=1, dominance 1;
    class (b): 3 values evenly -> l=3. min_l=1, half below l=3."""
    from sqlitedataframe_spark.operators.profiling import l_diversity_audit

    rows = [("a", "x")] * 5 + [("b", "x"), ("b", "y"), ("b", "z")]
    df = spark.createDataFrame(rows, "q string, s string")
    r = l_diversity_audit(df, ["q"], "s", l_threshold=3).collect()[0]
    assert r["n_classes"] == 2
    assert r["min_l"] == 1
    assert r["frac_classes_below_l"] == 0.5
    assert r["max_dominance"] == 1.0


def test_l_diversity_all_diverse(spark):
    from sqlitedataframe_spark.operators.profiling import l_diversity_audit

    rows = [("g", s) for s in "abc" for _ in range(2)]
    df = spark.createDataFrame(rows, "q string, s string")
    r = l_diversity_audit(df, ["q"], "s", l_threshold=3).collect()[0]
    assert r["min_l"] == 3 and r["frac_classes_below_l"] == 0.0
    assert abs(r["max_dominance"] - 1 / 3) < 1e-6  # 6-dp rounded output


def test_t_closeness_skewed_class_flagged(spark):
    """Global sensitive split 50/50; class (a) is 100/0 -> t = 0.5;
    class (b) mirrors it 0/100 -> also 0.5. Both over t=0.2."""
    from sqlitedataframe_spark.operators.profiling import t_closeness_audit

    rows = [("a", "x")] * 4 + [("b", "y")] * 4
    df = spark.createDataFrame(rows, "q string, s string")
    r = t_closeness_audit(df, ["q"], "s", t_threshold=0.2).collect()[0]
    assert r["n_classes"] == 2
    assert abs(r["max_t"] - 0.5) < 1e-6
    assert r["frac_classes_above_t"] == 1.0


def test_t_closeness_matching_distributions_zero(spark):
    """Every class mirrors the global distribution exactly -> t = 0."""
    from sqlitedataframe_spark.operators.profiling import t_closeness_audit

    rows = [(q, s) for q in ("a", "b") for s in ("x", "x", "y")]
    df = spark.createDataFrame(rows, "q string, s string")
    r = t_closeness_audit(df, ["q"], "s", t_threshold=0.2).collect()[0]
    assert r["max_t"] == 0.0
    assert r["frac_classes_above_t"] == 0.0
    assert r["row_weighted_avg_t"] == 0.0


def test_lsh_recall_meaningful_on_fixture(spark, sf_dir):
    """The fixture plants token-permutation duplicates: the truth set
    must be non-empty and banded LSH at est >= 0.3 must recover a
    substantial share (64-hash/16-band theory puts s=0.5 capture high)."""
    from sqlitedataframe_spark.suite import load_all

    q = load_all()["dedup_lsh_recall"].spark_fn
    r = q(spark, sf_dir).collect()[0]
    assert r["n_truth"] > 0
    assert r["n_hit"] <= min(r["n_truth"], r["n_found_adj"])
    assert r["recall"] is not None and r["recall"] > 0.5
    assert r["precision"] is not None and r["precision"] > 0.5
