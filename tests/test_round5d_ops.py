"""Round-5 wave-2 operators: Kaplan-Meier, diff-in-diff, BH-FDR,
normal p-value polynomial, position attribution, entropy, source KL."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_km_curve_textbook(spark):
    """Durations 1e 2e 2c 3e 4c — the classic hand-computed curve."""
    from sqlitedataframe_spark.operators.survival import km_curve

    df = spark.createDataFrame(
        [(1, 1), (2, 1), (2, 0), (3, 1), (4, 0)], ["dur", "ev"]
    )
    rows = {r["duration"]: r for r in km_curve(df, "dur", "ev").collect()}
    assert rows[1]["n_risk"] == 5 and rows[1]["survival"] == 0.8
    assert rows[2]["n_risk"] == 4 and rows[2]["survival"] == 0.6
    assert rows[2]["n_events"] == 1 and rows[2]["n_censored"] == 1
    assert rows[3]["n_risk"] == 2 and rows[3]["survival"] == 0.3
    # censoring-only duration carries survival unchanged
    assert rows[4]["survival"] == 0.3


def test_km_curve_all_event_at_end_hits_zero(spark):
    from sqlitedataframe_spark.operators.survival import km_curve

    df = spark.createDataFrame([(1, 1), (2, 1), (2, 1)], ["dur", "ev"])
    rows = {r["duration"]: r for r in km_curve(df, "dur", "ev").collect()}
    # at t=2 everyone remaining events: survival must be exactly 0,
    # not a silently-dropped ln(0) factor
    assert rows[2]["survival"] == 0.0


def test_did_estimate_hand_checked(spark):
    from sqlitedataframe_spark.operators.profiling import did_estimate

    rows = (
        [(0, 0, 10.0), (0, 0, 12.0)]     # ctrl pre  mean 11
        + [(0, 1, 11.0), (0, 1, 13.0)]   # ctrl post mean 12 (+1)
        + [(1, 0, 20.0), (1, 0, 22.0)]   # treat pre mean 21
        + [(1, 1, 25.0), (1, 1, 27.0)]   # treat post mean 26 (+5)
    )
    df = spark.createDataFrame(rows, ["tr", "po", "v"])
    r = did_estimate(df, "v", F.col("tr") == 1, F.col("po") == 1).collect()[0]
    assert r["mean_ctrl_pre"] == 11.0
    assert r["mean_treat_post"] == 26.0
    assert r["did"] == 4.0  # (26-21) - (12-11)
    # each cell var = 2, n = 2 -> se = sqrt(4) = 2
    assert r["se"] == 2.0
    assert r["t_stat"] == 2.0
    assert r["n_obs"] == 8


def test_normal_sf_matches_math_erfc(spark):
    """The A&S 7.1.26 polynomial must track 2*(1-Phi(|z|)) to ~1.5e-7."""
    from sqlitedataframe_spark.operators.profiling import normal_sf_twosided

    zs = [0.0, 0.5, 1.0, 1.96, 2.58, 4.0]
    df = spark.createDataFrame([(z,) for z in zs], ["z"])
    got = {
        r["z"]: r["p"]
        for r in df.select("z", normal_sf_twosided(F.col("z")).alias("p"))
        .collect()
    }
    for z in zs:
        exact = math.erfc(z / math.sqrt(2))  # == 2*(1 - Phi(z))
        assert abs(got[z] - exact) < 3e-7, (z, got[z], exact)


def test_bh_fdr_step_up(spark):
    """p = .01 .02 .06 .9 at q=0.10, m=4: thresholds .025 .05 .075 .10.
    p3=.06 <= .075 -> k*=3, so the first THREE reject (step-up rescues
    p2=.02 < .05? yes — and crucially p3 even though p3 > its own
    threshold would fail a naive per-test compare at rank 2)."""
    from sqlitedataframe_spark.operators.profiling import bh_fdr

    df = spark.createDataFrame(
        [("t1", 0.01), ("t2", 0.02), ("t3", 0.06), ("t4", 0.9)],
        ["test", "p"],
    )
    rows = {r["test"]: r for r in bh_fdr(df, "test", "p", q=0.10).collect()}
    assert [rows[t]["rejected"] for t in ("t1", "t2", "t3", "t4")] == [
        1, 1, 1, 0,
    ]
    assert rows["t3"]["p_rank"] == 3
    assert rows["t3"]["bh_threshold"] == 0.075


def test_bh_fdr_nothing_rejected(spark):
    from sqlitedataframe_spark.operators.profiling import bh_fdr

    df = spark.createDataFrame([("a", 0.5), ("b", 0.9)], ["test", "p"])
    rows = bh_fdr(df, "test", "p", q=0.05).collect()
    assert all(r["rejected"] == 0 for r in rows)


def test_position_attribution_u_shape(spark, sf_dir):
    """Suite query sanity on the fixture: credits are conserved — the
    total credit equals the number of converting users with >= 1 touch."""
    from sqlitedataframe_spark.suite import load_all

    q = load_all()["events_position_attribution"].spark_fn
    rows = q(spark, sf_dir).collect()
    total = sum(r["total_credit"] for r in rows)
    # every converting user's credits sum to 1.0 by construction
    assert abs(total - round(total)) < 1e-6
    assert total >= 1


def test_user_entropy_bounds(spark, sf_dir):
    from sqlitedataframe_spark.suite import load_all

    q = load_all()["events_user_entropy"].spark_fn
    r = q(spark, sf_dir).collect()[0]
    # entropy over 5 event types is bounded by ln(5)
    assert 0 <= r["min_entropy"] <= r["avg_entropy"] <= r["max_entropy"]
    assert r["max_entropy"] <= math.log(5) + 1e-9


def test_source_kl_nonnegative(spark, sf_dir):
    from sqlitedataframe_spark.suite import load_all

    q = load_all()["text_source_kl"].spark_fn
    rows = q(spark, sf_dir).collect()
    assert len(rows) >= 2
    # Gibbs: KL(p||q) >= 0, equality only for identical distributions
    assert all(r["kl_nats"] >= 0 for r in rows)
