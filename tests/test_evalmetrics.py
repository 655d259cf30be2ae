"""Binary-classifier eval metrics: AUC, calibration, PR sweep, gains."""

from __future__ import annotations

from pyspark.sql import functions as F

from sqlitedataframe_spark.operators import evalmetrics as E


def _df(spark, rows):
    return spark.createDataFrame(rows, "s double, y int")


def test_auc_perfect_separation(spark):
    df = _df(spark, [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)])
    r = E.auc_roc(df, "s", "y").collect()[0]
    assert r["auc"] == 1.0
    assert r["n_pos"] == 2 and r["n_neg"] == 2 and r["n_scores"] == 4


def test_auc_hand_checked_three_quarters(spark):
    """pos {0.9, 0.3}, neg {0.5, 0.1}: 3 of 4 pos-neg pairs ordered."""
    df = _df(spark, [(0.9, 1), (0.3, 1), (0.5, 0), (0.1, 0)])
    assert E.auc_roc(df, "s", "y").collect()[0]["auc"] == 0.75


def test_auc_all_tied_is_half(spark):
    df = _df(spark, [(0.5, 1), (0.5, 1), (0.5, 0)])
    assert E.auc_roc(df, "s", "y").collect()[0]["auc"] == 0.5


def test_auc_inverted_scores_is_zero(spark):
    df = _df(spark, [(0.1, 1), (0.9, 0)])
    assert E.auc_roc(df, "s", "y").collect()[0]["auc"] == 0.0


def test_calibration_bins_hand_checked(spark):
    """Bin 0 = scores [0, .1): two rows, one positive -> frac .5."""
    df = _df(spark, [(0.05, 0), (0.08, 1), (0.95, 1), (1.0, 1)])
    rows = {r["bin"]: r for r in
            E.calibration_bins(df, "s", "y").collect()}
    assert rows[0]["n"] == 2 and rows[0]["frac_pos"] == 0.5
    assert rows[0]["avg_score"] == 0.065
    # score exactly 1.0 clamps into the top bin, not bin 10
    assert rows[9]["n"] == 2 and rows[9]["frac_pos"] == 1.0
    assert set(rows) == {0, 9}


def test_brier_zero_for_perfect_forecasts(spark):
    df = _df(spark, [(1.0, 1), (0.0, 0), (1.0, 1)])
    r = E.brier_ece(df, "s", "y").collect()[0]
    assert r["brier"] == 0.0 and r["ece"] == 0.0


def test_brier_hand_checked(spark):
    """s=.8,y=1 and s=.4,y=0: brier = (.04+.16)/2 = .1."""
    df = _df(spark, [(0.8, 1), (0.4, 0)])
    r = E.brier_ece(df, "s", "y").collect()[0]
    assert abs(r["brier"] - 0.1) < 1e-9
    # bin {8}: |.8 - 1| = .2; bin {4}: |.4 - 0| = .4 -> ece = .3
    assert abs(r["ece"] - 0.3) < 1e-9


def test_pr_sweep_hand_checked(spark):
    df = _df(spark, [(0.9, 1), (0.7, 0), (0.3, 1), (0.1, 0)])
    rows = {r["thr"]: r for r in
            E.pr_threshold_sweep(df, "s", "y", [0.5, 0.95]).collect()}
    at5 = rows[0.5]
    assert (at5["tp"], at5["fp"], at5["fn"], at5["tn"]) == (1, 1, 1, 1)
    assert at5["precision"] == 0.5 and at5["recall"] == 0.5
    assert at5["f1"] == 0.5
    # threshold above every score: no predictions -> precision NULL, f1 0
    hi = rows[0.95]
    assert hi["tp"] == 0 and hi["fp"] == 0
    assert hi["precision"] is None and hi["f1"] == 0.0


def test_gains_deciles_monotone_and_terminal(spark):
    import random

    rng = random.Random(7)
    rows = [(round(rng.random(), 6), int(rng.random() < 0.3))
            for _ in range(500)]
    df = _df(spark, rows)
    out = E.gains_deciles(df, "s", "y").collect()
    caps = [r["capture"] for r in sorted(out, key=lambda r: r["decile"])]
    assert caps == sorted(caps)
    assert abs(caps[-1] - 1.0) < 1e-9
    last = [r for r in out if r["decile"] == max(x["decile"] for x in out)][0]
    assert abs(last["lift"] - 1.0) < 1e-9


def test_gains_top_decile_lift(spark):
    """All positives in the top scores: top-decile lift = N/P x capture."""
    rows = [(0.9 + i / 1000.0, 1) for i in range(10)] + [
        (i / 1000.0, 0) for i in range(90)
    ]
    df = _df(spark, rows)
    out = {r["decile"]: r for r in E.gains_deciles(df, "s", "y").collect()}
    top = out[1]
    assert top["n_pos"] == 10
    assert abs(top["capture"] - 1.0) < 1e-9
    # 10% of rows hold 100% of positives -> lift 10
    assert abs(top["lift"] - 10.0) < 1e-6


def test_auc_by_group_independent_slices(spark):
    """Group a separates perfectly; group b is inverted -> 1.0 / 0.0."""
    rows = [
        ("a", 0.9, 1), ("a", 0.1, 0),
        ("b", 0.1, 1), ("b", 0.9, 0),
    ]
    df = spark.createDataFrame(rows, "g string, s double, y int")
    out = {r["g"]: r for r in
           E.auc_roc_by_group(df, "s", "y", "g").collect()}
    assert out["a"]["auc"] == 1.0
    assert out["b"]["auc"] == 0.0
    assert out["a"]["n_pos"] == 1 and out["a"]["n_neg"] == 1


def test_auc_by_group_matches_pooled_on_single_group(spark):
    import random

    rng = random.Random(3)
    rows = [("only", round(rng.random(), 6), int(rng.random() < 0.4))
            for _ in range(300)]
    df = spark.createDataFrame(rows, "g string, s double, y int")
    pooled = E.auc_roc(df, "s", "y").collect()[0]["auc"]
    grouped = E.auc_roc_by_group(df, "s", "y", "g").collect()[0]["auc"]
    assert pooled == grouped


def test_cohen_kappa_perfect_and_chance(spark):
    perfect = spark.createDataFrame(
        [("x", "x"), ("y", "y"), ("z", "z")], "p string, t string"
    )
    r = E.cohen_kappa(perfect, "p", "t").collect()[0]
    assert r["po"] == 1.0 and r["kappa"] == 1.0
    # predictor ignores truth: every (p, t) combination equally likely
    # -> po == pe -> kappa 0
    chance = spark.createDataFrame(
        [("x", "x"), ("x", "y"), ("y", "x"), ("y", "y")],
        "p string, t string",
    )
    r = E.cohen_kappa(chance, "p", "t").collect()[0]
    assert r["po"] == 0.5 and r["pe"] == 0.5
    assert abs(r["kappa"]) < 1e-9


def test_cohen_kappa_hand_checked(spark):
    """Classic 2x2: cells yes/yes=20 yes/no=5 no/yes=10 no/no=15.
    po=.7, pe=(25*30 + 25*20)/2500=.5 -> kappa=.4."""
    rows = (
        [("y", "y")] * 20 + [("y", "n")] * 5
        + [("n", "y")] * 10 + [("n", "n")] * 15
    )
    df = spark.createDataFrame(rows, "p string, t string")
    r = E.cohen_kappa(df, "p", "t").collect()[0]
    assert r["po"] == 0.7 and r["pe"] == 0.5
    assert abs(r["kappa"] - 0.4) < 1e-9


def test_conformal_threshold_hand_checked(spark):
    """Calibration a = 0.1..0.9 (n=9): k = ceil(10 * .9) = 9 -> q_hat
    is the 9th smallest = 0.9; test all <= .9 -> coverage 1."""
    cal = spark.createDataFrame(
        [(round(i / 10, 1),) for i in range(1, 10)], "a double"
    )
    tst = spark.createDataFrame([(0.5,), (0.85,), (0.9,)], "a double")
    r = E.conformal_threshold(cal, tst, "a", alpha=0.1).collect()[0]
    assert r["q_hat"] == 0.9 and r["n_cal"] == 9
    assert r["coverage"] == 1.0


def test_conformal_threshold_alpha_half(spark):
    """alpha=.5, n=4 -> k = ceil(5 * .5) = 3 -> 3rd smallest."""
    cal = spark.createDataFrame(
        [(0.2,), (0.4,), (0.6,), (0.8,)], "a double"
    )
    tst = spark.createDataFrame([(0.5,), (0.7,)], "a double")
    r = E.conformal_threshold(cal, tst, "a", alpha=0.5).collect()[0]
    assert r["q_hat"] == 0.6
    assert r["coverage"] == 0.5


def test_average_precision_hand_checked(spark):
    """Ranked (.9,+) (.8,-) (.7,+) (.6,-): AP = (1 + 2/3)/2 = 5/6."""
    df = _df(spark, [(0.9, 1), (0.8, 0), (0.7, 1), (0.6, 0)])
    r = E.average_precision(df, "s", "y").collect()[0]
    assert abs(r["average_precision"] - 5 / 6) < 1e-6
    assert r["n_pos"] == 2 and r["n_scores"] == 4


def test_average_precision_extremes(spark):
    perfect = _df(spark, [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)])
    assert (
        E.average_precision(perfect, "s", "y").collect()[0][
            "average_precision"
        ]
        == 1.0
    )
    # one tie group: AP = precision at the single cut = P / N
    tied = _df(spark, [(0.5, 1), (0.5, 0), (0.5, 0), (0.5, 0)])
    assert (
        E.average_precision(tied, "s", "y").collect()[0][
            "average_precision"
        ]
        == 0.25
    )
