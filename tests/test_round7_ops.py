"""Unit tests for the round-7 operator wave: hand-computable fixtures for
each new operator, plus edge cases the suite fixtures don't reach."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# graph: adamic_adar / degree_assortativity
# ---------------------------------------------------------------------------
def test_adamic_adar_square(spark):
    """4-cycle: each diagonal pair shares two degree-2 neighbors, so
    aa = 2 / ln(2)."""
    from sqlitedataframe_spark.operators.graph import adamic_adar

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], ["src", "dst"]
    )
    rows = {(r["u"], r["v"]): r for r in adamic_adar(edges).collect()}
    want = round(2 / math.log(2) + 1e-9, 6)
    assert set(rows) == {(1, 3), (2, 4)}
    assert rows[(1, 3)]["cn"] == 2 and rows[(1, 3)]["aa_score"] == want


def test_adamic_adar_prefers_rare_neighbor(spark):
    """Two candidate pairs with one shared neighbor each: the pair whose
    neighbor has LOWER degree must score higher (1/ln(deg))."""
    from sqlitedataframe_spark.operators.graph import adamic_adar

    # hub 0 has degree 4; vertex 9 has degree 2
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (9, 5), (9, 6)]
    rows = {
        (r["u"], r["v"]): r["aa_score"]
        for r in adamic_adar(
            spark.createDataFrame(edges, ["src", "dst"]), top_k=100
        ).collect()
    }
    assert rows[(5, 6)] > rows[(1, 2)]


def test_assortativity_star_negative(spark):
    """A star is maximally disassortative: r = -1 (every edge joins the
    max-degree hub to a degree-1 leaf)."""
    from sqlitedataframe_spark.operators.graph import degree_assortativity

    star = spark.createDataFrame([(0, i) for i in range(1, 6)], ["src", "dst"])
    r = degree_assortativity(star).collect()[0]
    assert r["m2"] == 10 and r["assortativity"] == -1.0


def test_assortativity_regular_graph_degenerate(spark):
    """A cycle is degree-regular: zero variance -> NULL (den = 0)."""
    from sqlitedataframe_spark.operators.graph import degree_assortativity

    cyc = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], ["src", "dst"]
    )
    assert degree_assortativity(cyc).collect()[0]["assortativity"] is None


# ---------------------------------------------------------------------------
# text: unicode_quality / stopword_profile / hapax_ratio / ttr_stats
# ---------------------------------------------------------------------------
def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])


def test_unicode_quality_counts(spark):
    from sqlitedataframe_spark.operators.text import unicode_quality

    rows = [
        (1, "abcd", "en", "s"),          # clean: 0 ctrl, 0 non-ascii
        (2, "a\x01b�c", "en", "s"),  # 1 ctrl, 1 replacement (non-ascii)
    ]
    r = unicode_quality(_docs(spark, rows)).collect()[0]
    assert r["n_docs"] == 2
    assert r["avg_ctrl_chars"] == 0.5
    assert r["n_replacement_chars"] == 1
    # doc2: U+FFFD is the only non-ascii of 5 chars -> 0.2; doc1 0
    assert r["avg_non_ascii_ratio"] == 0.1


def test_stopword_profile_ratio(spark):
    from sqlitedataframe_spark.operators.text import stopword_profile

    rows = [(1, "the cat and the hat", "en", "s")]
    r = stopword_profile(_docs(spark, rows)).collect()[0]
    assert (r["n_tokens"], r["n_stop_tokens"]) == (5, 3)
    assert r["stop_ratio"] == 0.6


def test_hapax_ratio_exact(spark):
    from sqlitedataframe_spark.operators.text import hapax_ratio

    rows = [(1, "a b a c", "en", "s")]  # vocab {a,b,c}; hapax {b,c}
    r = hapax_ratio(_docs(spark, rows)).collect()[0]
    assert (r["vocab"], r["hapax"]) == (3, 2)
    assert r["hapax_ratio"] == round(2 / 3 + 1e-9, 6)


def test_ttr_prefix_controls_length(spark):
    from sqlitedataframe_spark.operators.text import ttr_stats

    rows = [(1, " ".join(["w"] * 200 + ["x", "y"]), "en", "s")]
    r = ttr_stats(_docs(spark, rows), prefix_tokens=100).collect()[0]
    # full doc: 3 distinct / 202; first 100 tokens are all 'w' -> 1/100
    assert r["avg_ttr"] == round(3 / 202 + 1e-9, 6)
    assert r["avg_prefix_ttr"] == 0.01


# ---------------------------------------------------------------------------
# evalmetrics: macro_f1 / mcnemar_test
# ---------------------------------------------------------------------------
def test_macro_f1_hand_computed(spark):
    from sqlitedataframe_spark.operators.evalmetrics import macro_f1

    # truth: a a b b; pred: a b b b
    df = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("b", "b"), ("b", "b")], ["pred", "truth"]
    )
    rows = {r["cls"]: r for r in macro_f1(df).collect()}
    assert rows["a"]["precision"] == 1.0 and rows["a"]["recall"] == 0.5
    assert rows["b"]["precision"] == round(2 / 3 + 1e-9, 6)
    assert rows["b"]["recall"] == 1.0
    f1a = round(2 * 1 / (1 + 2) + 1e-9, 6)  # 2*tp/(n_pred+n_true)
    assert rows["a"]["f1"] == f1a
    assert rows["MACRO"]["tp"] == 3


def test_macro_f1_never_predicted_class(spark):
    from sqlitedataframe_spark.operators.evalmetrics import macro_f1

    df = spark.createDataFrame([("a", "a"), ("a", "c")], ["pred", "truth"])
    rows = {r["cls"]: r for r in macro_f1(df).collect()}
    assert rows["c"]["precision"] is None  # never predicted
    assert rows["c"]["recall"] == 0.0 and rows["c"]["f1"] == 0.0
    # MACRO averages fill 0 for never-predicted classes (sklearn
    # zero_division=0; ADVICE r7): (0.5 + 0) / 2 here — the per-class
    # row keeps NULL so the undefined precision stays visible
    assert rows["MACRO"]["precision"] == round(
        rows["a"]["precision"] / 2 + 1e-9, 6
    )


def test_mcnemar_hand_computed(spark):
    from sqlitedataframe_spark.operators.evalmetrics import mcnemar_test

    # 10 items: both right 4, A-only 3, B-only 1, neither 2
    rows = (
        [(True, True)] * 4 + [(True, False)] * 3
        + [(False, True)] * 1 + [(False, False)] * 2
    )
    df = spark.createDataFrame(rows, ["a", "b"])
    r = mcnemar_test(df, F.col("a"), F.col("b")).collect()[0]
    assert (r["n_both"], r["n01"], r["n10"], r["n_neither"]) == (4, 3, 1, 2)
    assert r["mcnemar_chi2"] == round((abs(3 - 1) - 1) ** 2 / 4 + 1e-9, 6)


def test_mcnemar_no_discordance_null(spark):
    from sqlitedataframe_spark.operators.evalmetrics import mcnemar_test

    df = spark.createDataFrame([(True, True), (False, False)], ["a", "b"])
    assert (
        mcnemar_test(df, F.col("a"), F.col("b")).collect()[0]["mcnemar_chi2"]
        is None
    )


# ---------------------------------------------------------------------------
# features: robust_scale_stats
# ---------------------------------------------------------------------------
def test_robust_scale_stats_exact_members(spark):
    from sqlitedataframe_spark.operators.features import robust_scale_stats

    vals = [1.0, 2.0, 3.0, 4.0, 100.0]
    df = spark.createDataFrame([("g", v) for v in vals], ["grp", "v"])
    r = robust_scale_stats(df, "grp", "v").collect()[0]
    # discrete percentiles are members: med=3, q1=2, q3=4 -> iqr=2
    assert (r["median"], r["iqr"], r["n"]) == (3.0, 2.0, 5)
    # outliers: |x-3| > 1.5*2=3 -> only 100
    assert r["n_outliers"] == 1


# ---------------------------------------------------------------------------
# profiling: column_entropy / fd_candidates / welch
# ---------------------------------------------------------------------------
def test_column_entropy_uniform_and_constant(spark):
    from sqlitedataframe_spark.operators.profiling import column_entropy

    df = spark.createDataFrame(
        [("x", "k")] * 4 + [("y", "k")] * 4, ["u", "c"]
    )
    rows = {r["column"]: r for r in column_entropy(df, ["u", "c"]).collect()}
    assert rows["c"]["entropy_nats"] == 0.0 and rows["c"]["n_distinct"] == 1
    assert rows["u"]["entropy_nats"] == round(math.log(2) + 1e-9, 6)


def test_column_entropy_counts_nulls(spark):
    from sqlitedataframe_spark.operators.profiling import column_entropy

    df = spark.createDataFrame([("a",), (None,)], "c: string")
    r = column_entropy(df, ["c"]).collect()[0]
    assert r["n_distinct"] == 2  # NULL is a value


def test_fd_candidates_key_determines_all(spark):
    from sqlitedataframe_spark.operators.profiling import fd_candidates

    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "y"), (3, "b", "y")], ["k", "g", "h"]
    )
    rows = {(r["det"], r["dep"]): r["fd_holds"] for r in fd_candidates(df, ["k", "g", "h"]).collect()}
    assert rows[("k", "g")] and rows[("k", "h")]  # key determines all
    assert not rows[("g", "h")]  # g=a maps to x and y
    assert len(rows) == 6


def test_welch_ttest_separated_groups(spark):
    from sqlitedataframe_spark.operators.profiling import welch_ttest_onevsrest

    rows = [("a", v) for v in (10.0, 11.0, 12.0, 13.0)] + [
        ("b", v) for v in (0.0, 1.0, 2.0, 3.0)
    ]
    res = {
        r["grp"]: r
        for r in welch_ttest_onevsrest(
            spark.createDataFrame(rows, ["grp", "v"]), "grp", "v"
        ).collect()
    }
    assert res["a"]["t_stat"] > 5 and res["b"]["t_stat"] < -5
    assert res["a"]["mean_grp"] == 11.5 and res["a"]["mean_rest"] == 1.5
    assert res["a"]["welch_df"] > 1


# ---------------------------------------------------------------------------
# dedup: prefix_suffix_groups
# ---------------------------------------------------------------------------
def test_prefix_suffix_groups_catches_truncation(spark):
    from sqlitedataframe_spark.operators.dedup import prefix_suffix_groups

    shared_head = "x" * 64
    shared_tail = "y" * 64
    rows = [
        (1, shared_head + " unique one", "en", "s"),
        (2, shared_head + " unique two", "en", "s"),   # same prefix as 1
        (3, "alpha " + shared_tail, "en", "s"),
        (4, "beta " + shared_tail, "en", "s"),          # same suffix as 3
        (5, "completely different", "en", "s"),
    ]
    got = {
        (r["kind"], r["keep_id"]): r["group_size"]
        for r in prefix_suffix_groups(_docs(spark, rows)).collect()
    }
    assert got == {("prefix", 1): 2, ("suffix", 3): 2}


# ---------------------------------------------------------------------------
# similarity: norm_stats / dimension_variance
# ---------------------------------------------------------------------------
def test_norm_stats_hand_computed(spark):
    from sqlitedataframe_spark.operators.similarity import norm_stats

    df = spark.createDataFrame(
        [(1, [3.0, 4.0], 0), (2, [6.0, 8.0], 0)],
        "vec_id: long, embedding: array<float>, label: int",
    )
    r = norm_stats(df).collect()[0]
    assert (r["min_norm"], r["max_norm"], r["avg_norm"]) == (5.0, 10.0, 7.5)


def test_dimension_variance_finds_live_dim(spark):
    from sqlitedataframe_spark.operators.similarity import dimension_variance

    df = spark.createDataFrame(
        [(i, [1.0, float(i)], 0) for i in range(4)],
        "vec_id: long, embedding: array<float>, label: int",
    )
    rows = dimension_variance(df, top_k=2).collect()
    assert rows[0]["dim"] == 1 and rows[0]["variance"] > 0
    assert rows[1]["dim"] == 0 and rows[1]["variance"] == 0.0


# ---------------------------------------------------------------------------
# multimodal: png_roundtrip_dims
# ---------------------------------------------------------------------------
def test_png_roundtrip_dims_matches_closed_form(spark):
    from sqlitedataframe_spark.operators.multimodal import png_roundtrip_dims

    docs = spark.createDataFrame(
        [(10, 50), (23, 7)], "doc_id: long, n_chars: long"
    )
    rows = {r["media_id"]: r for r in png_roundtrip_dims(docs).collect()}
    for mid, size in ((10, 50), (23, 7)):
        w, h = size % 37 + 4, mid % 23 + 4
        want = sum(
            (7 * x + 13 * y + 31 * c) % 256
            for x in range(w)
            for y in range(h)
            for c in range(3)
        )
        assert (rows[mid]["width"], rows[mid]["height"]) == (w, h)
        assert rows[mid]["px_sum"] == want


# ---------------------------------------------------------------------------
# wave 2: kcenter_coreset / median_of_means / peak_days
# ---------------------------------------------------------------------------
def test_kcenter_picks_farthest(spark):
    from sqlitedataframe_spark.operators.similarity import kcenter_coreset

    # 1-D points embedded in 2-D: 0, 1, 10, 11, 100
    pts = [(i, [float(v), 0.0], 0) for i, v in enumerate([0, 1, 10, 11, 100])]
    df = spark.createDataFrame(
        pts, "vec_id: long, embedding: array<float>, label: int"
    )
    rows = kcenter_coreset(df, k=3).collect()
    # seed = min id (value 0); farthest = 100 (id 4); then 10 or 11 (id 2 wins: 10 is d=100 from 0... )
    assert [r["step"] for r in rows] == [1, 2, 3]
    assert rows[0]["center_id"] == 0 and rows[0]["radius"] is None
    assert rows[1]["center_id"] == 4 and rows[1]["radius"] == 100.0
    # after {0, 100}: min-dists are 0,1,10,11->... point 11 is 11 from 0, 89 from 100 -> 11; point 10 -> 10; so next is 11 (id 3)
    assert rows[2]["center_id"] == 3 and rows[2]["radius"] == 11.0
    # radius sequence is non-increasing
    radii = [r["radius"] for r in rows[1:]]
    assert radii == sorted(radii, reverse=True)


def test_kcenter_empty_raises(spark):
    from sqlitedataframe_spark.operators.similarity import kcenter_coreset

    empty = spark.createDataFrame(
        [], "vec_id: long, embedding: array<float>, label: int"
    )
    with pytest.raises(ValueError, match="empty"):
        kcenter_coreset(empty, k=2)


def test_median_of_means_resists_outlier(spark):
    from sqlitedataframe_spark.operators.profiling import median_of_means

    rows = [(i, 10.0) for i in range(160)] + [(999, 1e9)]
    df = spark.createDataFrame(rows, ["k", "v"])
    r = median_of_means(df, "v", "k", n_buckets=16).collect()[0]
    assert r["n"] == 161
    assert r["mean"] > 1e6  # raw mean is dragged
    assert r["median_of_means"] == 10.0  # MoM is not


def test_peak_days_strict_and_isolated(spark):
    from sqlitedataframe_spark.operators.relational import peak_days

    import datetime as dt

    def day(d, n):
        return [(dt.datetime(2024, 1, d, 12, 0),)] * n

    rows = day(1, 2) + day(2, 5) + day(3, 2) + day(5, 5) + day(6, 5) + day(20, 1)
    df = spark.createDataFrame(rows, "ts: timestamp")
    peaks = {(str(r["d"]), r["n"]) for r in peak_days(df, "ts").collect()}
    # day 2 (5 > 2,2,5? no - day 5 is within +3 of day 2 and equals 5 -> tie disqualifies)
    # neighborhood of day2 = days 1,3,5 (counts 2,2,5): 5 > 5 false -> NOT a peak
    # day 5 neighbors: 2,3,6 (5,2,5): tie with day 2 and 6 -> not a peak
    # day 20 isolated -> trivial peak
    assert peaks == {("2024-01-20", 1)}
    with pytest.raises(ValueError, match="neighborhood_days"):
        peak_days(df, "ts", neighborhood_days=0)


def test_peak_days_finds_strict_max(spark):
    from sqlitedataframe_spark.operators.relational import peak_days

    import datetime as dt

    rows = []
    for d, n in ((1, 2), (2, 7), (3, 2)):
        rows += [(dt.datetime(2024, 1, d, 12, 0),)] * n
    df = spark.createDataFrame(rows, "ts: timestamp")
    peaks = {str(r["d"]) for r in peak_days(df, "ts").collect()}
    assert peaks == {"2024-01-02"}


# ---------------------------------------------------------------------------
# wave 3: gopher rules / keyword stuffing / SRM / duplicate payments
# ---------------------------------------------------------------------------
def test_gopher_rules_flag_reasons(spark, sf_dir):
    from sqlitedataframe_spark.suite import load_all

    rows = load_all()["text_gopher_rules"].spark_fn(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        # pass count can never exceed docs, and each fail column is bounded
        assert 0 <= r["n_pass"] <= r["n_docs"]
        for c in ("fail_word_count", "fail_mean_word_len",
                  "fail_stopwords", "fail_alpha_ratio"):
            assert 0 <= r[c] <= r["n_docs"]


def test_keyword_stuffing_detects_dominance(spark):
    from sqlitedataframe_spark.suite import REGISTRY, load_all

    load_all()
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam other", "en", "s"),
            (2, "a b c d e", "en", "s"),
        ],
        ["doc_id", "text", "lang", "source"],
    )
    # drive the operator shape directly (suite fn is table-bound)
    from pyspark.sql import functions as F

    from sqlitedataframe_spark.operators.text import tokens

    freq = (
        df.select("doc_id", F.explode(tokens("text")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    per = {
        r["doc_id"]: r["s"]
        for r in freq.groupBy("doc_id")
        .agg((F.max("f") / F.sum("f").cast("double")).alias("s"))
        .collect()
    }
    assert per[1] == 0.8 and per[2] == 0.2


def test_ab_srm_balanced_split_not_flagged(spark, sf_dir):
    from sqlitedataframe_spark.suite import load_all

    r = load_all()["eval_ab_srm"].spark_fn(spark, sf_dir).collect()[0]
    assert r["n"] == r["n_arm0"] + r["n_arm1"]
    assert r["srm_chi2"] >= 0


def test_duplicate_payments_groups_only(spark, sf_dir):
    from sqlitedataframe_spark.suite import load_all

    rows = load_all()["orders_duplicate_payments"].spark_fn(
        spark, sf_dir
    ).collect()
    assert all(r["n_orders"] >= 2 and r["span_days"] >= 0 for r in rows)


# ---------------------------------------------------------------------------
# wave 5: wilson bounds / tail index tie tolerance
# ---------------------------------------------------------------------------
def test_funnel_wilson_bounds_bracket_rate(spark, sf_dir):
    from sqlitedataframe_spark.suite import load_all

    rows = load_all()["events_funnel_wilson"].spark_fn(spark, sf_dir).collect()
    assert len(rows) == 2
    for r in rows:
        assert 0.0 <= r["wilson_lo"] <= r["rate"] <= r["wilson_hi"] <= 1.0


def test_tail_index_tie_tolerant(spark):
    """Duplicate boundary values must not change the estimate: the
    exceedance set is 'strictly above the min of the top frame'."""
    import math

    from pyspark.sql import functions as F

    vals = [100.0, 50.0, 10.0, 10.0, 10.0, 1.0]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)],
        ["o_orderkey", "o_totalprice"],
    )
    top = (
        df.select(F.col("o_totalprice").alias("x"), "o_orderkey")
        .orderBy(F.col("x").desc(), F.col("o_orderkey").asc())
        .limit(5)
        .select("x")
    )
    r = top.agg(F.min("x").alias("ref")).collect()[0]
    assert r["ref"] == 10.0
    e = top.join(F.broadcast(top.agg(F.min("x").alias("ref")))).agg(
        F.sum(
            F.when(F.col("x") > F.col("ref"), F.log(F.col("x") / F.col("ref")))
            .otherwise(0.0)
        ).alias("s"),
        F.sum((F.col("x") > F.col("ref")).cast("bigint")).alias("k"),
    ).collect()[0]
    assert e["k"] == 2  # only 100 and 50 strictly exceed
    assert abs(e["s"] - (math.log(10.0) + math.log(5.0))) < 1e-12


def test_bot_screen_ranks_burst(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [(1, base + dt.timedelta(seconds=i)) for i in range(10)]  # burst
    rows += [(2, base + dt.timedelta(minutes=5 * i)) for i in range(10)]
    ev = spark.createDataFrame(rows, ["user_id", "ts"])
    perm = ev.groupBy(
        "user_id", F.date_trunc("minute", F.col("ts")).alias("m")
    ).agg(F.count(F.lit(1)).alias("n"))
    per = {
        r["user_id"]: r["pk"]
        for r in perm.groupBy("user_id").agg(F.max("n").alias("pk")).collect()
    }
    assert per[1] == 10 and per[2] == 1
