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
