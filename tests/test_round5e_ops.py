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
    s = (
        a.join(b, F.col("ib") > F.col("ia"))
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
