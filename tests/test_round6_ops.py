"""Round-6 operator tests: level-shift localization, Neyman allocation,
one-way ANOVA, held-out perplexity."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sqlitedataframe_spark.operators.profiling import anova_oneway
from sqlitedataframe_spark.operators.relational import level_shift_locate
from sqlitedataframe_spark.operators.sampling import neyman_allocation
from sqlitedataframe_spark.operators.text import perplexity_heldout


def test_level_shift_locate_finds_step(spark):
    """10 days at 2 events/day then 10 days at 6/day: the CUSUM argmax
    must land on the last low day (day 10), means 2.0 / 6.0."""
    rows = []
    eid = 0
    for day in range(1, 21):
        per = 2 if day <= 10 else 6
        for j in range(per):
            rows.append((eid, f"2024-03-{day:02d} 0{j}:00:00"))
            eid += 1
    df = spark.createDataFrame(rows, "id long, ts string").select(
        "id", F.col("ts").cast("timestamp").alias("ts")
    )
    r = level_shift_locate(df, "ts").collect()[0]
    assert str(r["change_date"]) == "2024-03-10"
    assert (r["mean_before"], r["mean_after"]) == (2.0, 6.0)
    assert (r["n_days_before"], r["n_days_after"]) == (10, 10)
    # cusum at the argmax: sum_{s<=10}(n_s - mean) = 10*(2-4) = -20
    assert r["cusum_abs"] == 20.0


def test_neyman_allocation_weights_by_n_times_std(spark):
    """Stratum A: 4 rows spread (std 10/sqrt stuff), stratum B: 4 rows
    constant (std 0) -> all allocation goes to A."""
    df = spark.createDataFrame(
        [("a", 0), ("a", 10), ("a", 0), ("a", 10),
         ("b", 5), ("b", 5), ("b", 5), ("b", 5)],
        "stratum string, v long",
    )
    out = {r["stratum"]: r for r in neyman_allocation(df, "stratum", "v", 100).collect()}
    assert out["b"]["stddev"] == 0.0 and out["b"]["n_alloc"] == 0
    assert out["a"]["share"] == 1.0 and out["a"]["n_alloc"] == 100
    # std of [0,10,0,10] (sample) = sqrt(100/3)
    assert math.isclose(out["a"]["stddev"], math.sqrt(100 / 3), rel_tol=1e-6)


def test_anova_oneway_hand_computed(spark):
    """Two groups: [1,2,3] vs [5,6,7]. SSB = 24, SSW = 4, F = 24/(4/4) = 24,
    eta^2 = 24/28."""
    df = spark.createDataFrame(
        [("g1", 1.0), ("g1", 2.0), ("g1", 3.0), ("g2", 5.0), ("g2", 6.0), ("g2", 7.0)],
        "g string, v double",
    )
    r = anova_oneway(df, "g", "v").collect()[0]
    assert (r["df_between"], r["df_within"]) == (1, 4)
    assert r["f_stat"] == 24.0
    assert math.isclose(r["eta_squared"], 24 / 28, abs_tol=1e-6)


def test_perplexity_heldout_prefers_predictable_text(spark):
    """A language whose held-out docs repeat the training pattern scores
    lower perplexity than one whose held-out doc is unseen vocabulary."""
    rows = []
    # lang 'rep': same repetitive sentence everywhere (ids 0..9; id%5==0 held out)
    for i in range(10):
        rows.append((i, "the cat sat on the mat " * 5, "rep"))
    # lang 'shift': train docs repetitive, held-out docs novel words
    for i in range(10):
        txt = ("alpha beta gamma delta " * 5) if i % 5 != 0 else ("zeta eta theta iota " * 5)
        rows.append((100 + i, txt, "shift"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["lang"]: r for r in perplexity_heldout(df).collect()}
    assert out["rep"]["perplexity"] < out["shift"]["perplexity"]
    assert out["rep"]["n_bigrams"] > 0 and out["shift"]["n_bigrams"] > 0
    assert out["rep"]["avg_logprob"] > out["shift"]["avg_logprob"]
