"""Round-10 operators: bottom-k quantile sketch (merge parity + layout
invariance), stratified CUPED, BPE fertility, LCS span clusters, and the
three checker-fidelity probe queries' type contracts."""

from __future__ import annotations

import math
from decimal import Decimal

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# bottomk_sample: mergeability + layout invariance
# ---------------------------------------------------------------------------
def test_bottomk_sample_merge_parity(spark):
    """The sketch law: bottom-k of the union == bottom-k of the per-shard
    bottom-ks. Computed three ways — flat one-level, the operator's
    two-level plan, and a manual 4-shard merge — all must agree row-set
    exactly."""
    from sqlitedataframe_spark.operators.sketch import bottomk_sample

    df = spark.range(2000).select(
        (F.col("id") % 3).alias("g"), F.col("id").alias("k"),
        (F.col("id") * 7 % 101).alias("v"),
    )
    k = 16
    two_level = bottomk_sample(df, "g", F.col("k"), k=k)
    rows = sorted((r["g"], r["k"]) for r in two_level.collect())
    # flat reference: order ALL rows per group by (md5, key)
    import hashlib

    by_g: dict = {}
    for r in df.collect():
        h = hashlib.md5(str(r["k"]).encode()).hexdigest()
        by_g.setdefault(r["g"], []).append((h, str(r["k"]), r["k"]))
    flat = sorted(
        (g, t[2])
        for g, items in by_g.items()
        for t in sorted(items)[:k]
    )
    assert rows == flat
    # manual merge: split into 4 arbitrary shards, bottom-k each, merge
    shards = [df.filter(F.col("id") % 4 == i) for i in range(4)]
    parts = shards[0]
    for s in shards[1:]:
        parts = parts.unionByName(s)
    merged = bottomk_sample(
        # union of per-shard bottom-ks, then one more bottom-k pass
        bottomk_sample(shards[0], "g", F.col("k"), k=k)
        .unionByName(bottomk_sample(shards[1], "g", F.col("k"), k=k))
        .unionByName(bottomk_sample(shards[2], "g", F.col("k"), k=k))
        .unionByName(bottomk_sample(shards[3], "g", F.col("k"), k=k)),
        "g",
        F.col("k"),
        k=k,
    )
    assert sorted((r["g"], r["k"]) for r in merged.collect()) == flat


def test_bottomk_sample_layout_invariant(spark):
    """The sample is a pure function of the data: any partition layout
    yields the identical row set."""
    from sqlitedataframe_spark.operators.sketch import bottomk_sample

    df = spark.range(500).select(
        (F.col("id") % 2).alias("g"), F.col("id").alias("k")
    )
    a = bottomk_sample(df.repartition(1), "g", F.col("k"), k=10)
    b = bottomk_sample(df.repartition(17, "k"), "g", F.col("k"), k=10)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_bottomk_quantiles_err_bounds(spark, sf_dir):
    """Sample p50/p90 must land within a loose sampling-error band of the
    exact percentiles on the real fixture (k=256 per group)."""
    from sqlitedataframe_spark.io import load_table
    from sqlitedataframe_spark.operators.sketch import bottomk_quantiles

    li = load_table(spark, sf_dir, "lineitem")
    out = bottomk_quantiles(
        li,
        "l_returnflag",
        "l_extendedprice",
        F.concat_ws(":", "l_orderkey", "l_linenumber"),
        k=256,
        qs=(0.5, 0.9),
    ).collect()
    assert len(out) == 3
    for r in out:
        span = r["p90_exact"] - r["p50_exact"] + 1.0
        assert r["p50_abs_err"] <= span, r
        assert r["k_eff"] <= 256


# ---------------------------------------------------------------------------
# cuped_stratified
# ---------------------------------------------------------------------------
def test_cuped_stratified_matches_per_stratum_cuped(spark):
    """Running plain cuped_adjustment on each stratum's slice must equal
    the stratified operator's rows for that stratum."""
    from sqlitedataframe_spark.operators.evalmetrics import (
        cuped_adjustment,
        cuped_stratified,
    )

    df = spark.range(400).select(
        (F.col("id") % 2).alias("s"),
        (F.col("id") % 4 < 2).cast("int").alias("variant"),
        # stratum 0: y strongly tracks x; stratum 1: weakly
        (F.col("id") % 37).cast("double").alias("x"),
        F.when(
            F.col("id") % 2 == 0, (F.col("id") % 37) * 3 + (F.col("id") % 5)
        )
        .otherwise((F.col("id") % 11))
        .cast("double")
        .alias("y"),
    )
    strat = {
        (r["s"], r["variant"]): (r["theta"], r["mean_cuped"])
        for r in cuped_stratified(df, "s", "variant", "x", "y", scale=1).collect()
    }
    for s_val in (0, 1):
        plain = cuped_adjustment(
            df.filter(F.col("s") == s_val), "variant", "x", "y", scale=1
        ).collect()
        for r in plain:
            assert strat[(s_val, r["variant"])] == (
                r["theta"],
                r["mean_cuped"],
            )
    # the two strata genuinely differ (otherwise the test proves nothing)
    assert strat[(0, 0)][0] != strat[(1, 0)][0]


# ---------------------------------------------------------------------------
# bpe_fertility_by_group
# ---------------------------------------------------------------------------
def test_bpe_fertility_small_corpus(spark):
    """Hand-checkable corpus: after 1 merge ('a','b')->'ab' dominates,
    fertility counts follow exactly."""
    from sqlitedataframe_spark.operators.text import bpe_fertility_by_group

    docs = spark.createDataFrame(
        [
            (1, "en", "s1", "abab ab"),
            (2, "en", "s1", "ab abab"),
            (3, "de", "s2", "cd cd cd"),
        ],
        "doc_id bigint, lang string, source string, text string",
    )
    out = {
        (r["lang"], r["source"]): r
        for r in bpe_fertility_by_group(
            docs, ["lang", "source"], "text", n_merges=1
        ).collect()
    }
    # merge 1 is ('a','b') with support 6 (abab:2 words x2 + ab:2 words x1
    # each -> pairs: 'a b' appears 2+1+1+2 = 6 times, beats 'b a'=2, 'c d'=3)
    r1 = out[("en", "s1")]
    # words: abab, ab, ab, abab -> symbols after merge: 2,1,1,2 = 6
    assert r1["n_words"] == 4 and r1["n_symbols"] == 6
    assert abs(r1["fertility"] - 1.5) < 1e-6
    r2 = out[("de", "s2")]
    # 'cd' unaffected by the (a,b) merge: 2 symbols each, 3 words
    assert r2["n_words"] == 3 and r2["n_symbols"] == 6


# ---------------------------------------------------------------------------
# dedup_span_clusters: synthetic cross-source syndication
# ---------------------------------------------------------------------------
def test_span_cluster_rollup_shape(spark):
    """Three docs sharing one long span (two sources) must land in ONE
    cluster with cross_source=True; an unrelated doc stays out."""
    from sqlitedataframe_spark.operators.dedup import lcs_span_stats
    from sqlitedataframe_spark.operators.graph import connected_components

    shared = "the quick brown fox jumps over the lazy dog " * 4
    docs = spark.createDataFrame(
        [
            (1, "A", shared + "tail one"),
            # NOTE the 10-char prefix: a shift must be ≡ 0 mod the stride
            # for the lattice shingles to align (the estimator's documented
            # stride-sampling property)
            (2, "B", "head twos " + shared),
            (3, "A", shared + "closing remarks"),
            (4, "C", "completely different content " * 8),
        ],
        "doc_id bigint, source string, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "id_a bigint, id_b bigint"
    )
    spans = lcs_span_stats(docs, pairs, k=30, stride=10)
    ed = spans.filter(F.col("lcs_ratio") >= 0.2)
    assert ed.count() == 3
    nodes = (
        ed.select(F.col("id_a").alias("doc_id"))
        .unionByName(ed.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    comp = connected_components(
        ed.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        nodes=nodes,
        node_col="doc_id",
    )
    comps = {r["node"]: r["comp"] for r in comp.collect()}
    assert comps == {1: 1, 2: 1, 3: 1}


# ---------------------------------------------------------------------------
# probe queries: type contracts
# ---------------------------------------------------------------------------
def test_decimal_ledger_emits_varchar_digits(spark, sf_dir):
    """r12 convention (VERDICT r11 #1): NO Decimal-typed output cell at
    all — the wide exact ledgers cross the hash as VARCHAR digit strings
    (the DECIMAL(38,0) arithmetic stays internal)."""
    from sqlitedataframe_spark.suite import load_all

    q = load_all()["agg_decimal_ledger"]
    df = q.spark_fn(spark, sf_dir)
    assert not any(t.startswith("decimal") for _, t in df.dtypes), df.dtypes
    rows = df.collect()
    assert rows, "empty ledger"
    saw_wide = False
    for r in rows:
        for col in ("gross_cents", "disc_micros", "charged_e10"):
            assert isinstance(r[col], str), col
            assert r[col].lstrip("-").isdigit(), (col, r[col])
        # charged ledger actually exercises the >int64 range at sf>=0.01
        saw_wide = saw_wide or abs(int(r["charged_e10"])) > 2**63
    if "sf0.001" not in sf_dir:
        assert saw_wide, "charged_e10 never exceeded int64 — probe lost its bite"


def test_key_checksums_past_float_boundary(spark, sf_dir):
    """Checksums must be plain ints in [0, prime) — and on the standard
    fixtures at least one lands beyond 2^53 (the double-mantissa edge
    where any float round-trip in a normalizer mangles the value)."""
    from sqlitedataframe_spark.suite import load_all
    from sqlitedataframe_spark.suite.pipeline16 import _CHK_PRIME

    rows = load_all()["profile_key_checksums"].spark_fn(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert isinstance(r["key_checksum"], int)
        assert 0 <= r["key_checksum"] < _CHK_PRIME
    assert any(r["key_checksum"] > 2**53 for r in rows)


def test_exact_ratios_bit_identical_to_python(spark, sf_dir):
    """Each ratio is one division of exact ints: python float division of
    the integer columns must reproduce the Spark double BIT-exactly."""
    from sqlitedataframe_spark.suite import load_all

    rows = load_all()["profile_exact_ratios"].spark_fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["chars_per_doc"] == r["sum_chars"] / r["n_docs"]
        assert r["tokens_per_doc"] == r["sum_tokens"] / r["n_docs"]
        assert r["chars_per_token"] == r["sum_chars"] / r["sum_tokens"]
        # and the cells genuinely exercise the >9-dp repr class
    assert any(len(repr(r["chars_per_token"]).split(".")[-1]) > 9 for r in rows)


# ---------------------------------------------------------------------------
# cohort LTV: invariants
# ---------------------------------------------------------------------------
def test_cohort_ltv_invariants(spark, sf_dir):
    """Cumulative revenue is monotone per cohort; offset-0 active count
    equals the cohort size at offset 0 (every member's first order is in
    their cohort month); total revenue reconciles with orders."""
    from sqlitedataframe_spark.io import load_table
    from sqlitedataframe_spark.suite import load_all

    rows = load_all()["orders_cohort_ltv"].spark_fn(spark, sf_dir).collect()
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_month"], []).append(r)
    for c, rs in by_cohort.items():
        rs = sorted(rs, key=lambda r: r["month_offset"])
        assert rs[0]["month_offset"] == 0
        assert rs[0]["n_active"] == rs[0]["cohort_users"]
        cums = [r["cum_rev_cents"] for r in rs]
        assert cums == sorted(cums)
    total = sum(r["rev_cents"] for r in rows)
    o = load_table(spark, sf_dir, "orders")
    expect = o.agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
    ).collect()[0][0]
    assert total == expect


# ---------------------------------------------------------------------------
# sweep_unshared_rdds: bench hygiene that spares shared caches
# ---------------------------------------------------------------------------
def test_sweep_spares_shared_caches(spark):
    """An unregistered persist() must be released by the sweep; a
    shared_eager_cache frame must survive it with its storage intact
    (the r10 replacement for catalog.clearCache — VERDICT r9 #4)."""
    from sqlitedataframe_spark.operators.util import (
        release_shared_caches,
        shared_eager_cache,
        sweep_unshared_rdds,
    )

    release_shared_caches()
    shared = shared_eager_cache(
        spark,
        ("test-sweep", "x"),
        lambda: spark.range(100).select((F.col("id") * 2).alias("v")),
    )
    from sqlitedataframe_spark.operators.util import (
        _SHARED_RDD_IDS,
        persistent_rdd_ids,
    )

    stray = spark.range(50).select(F.col("id").alias("w")).persist()
    stray.count()
    before = persistent_rdd_ids(spark)
    assert before - _SHARED_RDD_IDS  # the stray's blocks are pinned
    n = sweep_unshared_rdds(spark)
    assert n >= 1  # the stray was released
    # NOTE: assert on PINNED RDD IDS, not DataFrame.storageLevel — that
    # property reads the plan-level CacheManager entry, which survives an
    # RDD-level unpersist by design (the sweep frees blocks; a re-run of
    # the same plan may legally re-materialize them)
    after = persistent_rdd_ids(spark)
    assert after <= _SHARED_RDD_IDS  # only shared blocks remain pinned
    sl = shared.storageLevel
    assert sl.useMemory or sl.useDisk  # the shared frame survived
    assert shared.count() == 100
    stray.unpersist()
    release_shared_caches()


# ---------------------------------------------------------------------------
# bradley_terry_strengths
# ---------------------------------------------------------------------------
def test_bradley_terry_known_matchup(spark):
    """Hand-checkable 3-item tournament: A beats B 3-1, B beats C 3-1,
    A beats C 2-2 (even) -> strengths must order A > B > C, sum to ~1,
    and the strength-of-schedule property holds."""
    from sqlitedataframe_spark.operators.evalmetrics import (
        bradley_terry_strengths,
    )

    wins = spark.createDataFrame(
        [
            ("A", "B", 3), ("B", "A", 1),
            ("B", "C", 3), ("C", "B", 1),
            ("A", "C", 2), ("C", "A", 2),
        ],
        "i string, j string, w long",
    )
    rows = bradley_terry_strengths(wins, iters=3).collect()
    by = {r["i"]: r for r in rows}
    assert by["A"]["wins"] == 5 and by["A"]["n_comparisons"] == 8
    s = sum(r["strength"] for r in rows)
    assert abs(s - 1.0) < 1e-4
    assert by["A"]["strength"] > by["B"]["strength"] > by["C"]["strength"]
    # order of input rows must not matter (fixed-order folds)
    rows2 = bradley_terry_strengths(
        wins.orderBy(F.desc("j")).repartition(7), iters=3
    ).collect()
    assert {(r["i"], r["strength"]) for r in rows2} == {
        (r["i"], r["strength"]) for r in rows
    }


def test_bradley_terry_max_items_guard(spark):
    from sqlitedataframe_spark.operators.evalmetrics import (
        bradley_terry_strengths,
    )

    wins = spark.createDataFrame(
        [(str(i), str(i + 1), 1) for i in range(30)], "i string, j string, w long"
    )
    with pytest.raises(ValueError, match="max_items"):
        bradley_terry_strengths(wins, iters=1, max_items=10)


# ---------------------------------------------------------------------------
# lsh_tuning_curve
# ---------------------------------------------------------------------------
def test_lsh_tuning_curve_analytics(spark):
    """Against hand-computed P(j) = 1-(1-j^r)^b on a two-cell est
    distribution: high-sim pairs at j=1.0 detect with P=1 under every
    config; thr50 midpoints match the closed form."""
    from sqlitedataframe_spark.operators.dedup import lsh_tuning_curve

    pairs = spark.createDataFrame(
        [(1, 2, 1.0)] * 4 + [(3, 4, 0.125)] * 6,
        "id_a long, id_b long, est_jaccard double",
    )
    out = {(r["bands"], r["rows_per_band"]): r for r in lsh_tuning_curve(pairs).collect()}
    for (b, r), row in out.items():
        assert abs(row["thr50"] - (1.0 / b) ** (1.0 / r)) < 1e-5
        assert row["n_pairs_high"] == 4 and row["n_pairs_low"] == 6
        assert abs(row["exp_recall_highsim"] - 1.0) < 1e-6  # j=1 always hits
        expect_lo = 1.0 - (1.0 - 0.125 ** r) ** b
        assert abs(row["exp_prob_lowsim"] - expect_lo) < 1e-5


# ---------------------------------------------------------------------------
# preference_pairs
# ---------------------------------------------------------------------------
def test_preference_pairs_shape(spark):
    from sqlitedataframe_spark.operators.sampling import preference_pairs

    df = spark.createDataFrame(
        [("g", i, i / 10.0) for i in range(10)],
        "src string, doc long, q double",
    )
    rows = preference_pairs(
        df, "src", "doc", "q", top_n=2, bottom_n=2, min_margin=0.5
    ).collect()
    got = {(r["chosen"], r["rejected"]) for r in rows}
    # top-2: docs 9, 8 (q .9, .8); bottom-2: docs 0, 1 (q 0, .1);
    # all four crosses clear margin 0.5
    assert got == {(9, 0), (9, 1), (8, 0), (8, 1)}
    for r in rows:
        assert r["margin"] >= 0.5


# ---------------------------------------------------------------------------
# hyperball_harmonic
# ---------------------------------------------------------------------------
def test_hyperball_star_graph(spark):
    """Star graph: the hub must rank first (its 1-ball covers everything)
    and leaves tie below it; ball estimates are monotone per node."""
    from sqlitedataframe_spark.operators.graph import hyperball_harmonic

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 13)], "src long, dst long"
    )
    rows = hyperball_harmonic(edges, rounds=3, p=4, top=13).collect()
    assert rows[0]["node"] == 0  # hub leads
    hub = rows[0]
    assert hub["ball1"] >= hub["ball0"] - 1e-9
    leaf = [r for r in rows if r["node"] != 0][0]
    assert hub["harmonic_est"] > leaf["harmonic_est"]
    for r in rows:
        assert r["ball0"] <= r["ball1"] + 1e-9 <= r["ball2"] + 2e-9 <= r["ball3"] + 3e-9


def test_bottomk_prefilter_fallback_exact(spark):
    """Force the shortfall path (oversample=0 -> the hex cut drops every
    row, every group falls back to its unfiltered rows): the result must
    still be the exact bottom-k, identical to the normal path."""
    from sqlitedataframe_spark.operators.sketch import bottomk_sample

    df = spark.range(800).select(
        (F.col("id") % 2).alias("g"), F.col("id").alias("k")
    )
    normal = sorted(
        (r["g"], r["k"]) for r in bottomk_sample(df, "g", F.col("k"), k=12).collect()
    )
    forced = sorted(
        (r["g"], r["k"])
        for r in bottomk_sample(
            df, "g", F.col("k"), k=12, prefilter_oversample=0
        ).collect()
    )
    assert forced == normal and len(normal) == 24


# ---------------------------------------------------------------------------
# curation funnel: stage monotonicity
# ---------------------------------------------------------------------------
def test_curation_funnel_monotone(spark, sf_dir):
    """Each stage can only shrink a source's survivor set, and raw totals
    reconcile with the train-side document count."""
    from sqlitedataframe_spark.io import load_table
    from sqlitedataframe_spark.suite import load_all

    rows = load_all()["pipeline_curation_funnel"].spark_fn(spark, sf_dir).collect()
    assert rows
    stages = ["n_raw", "n_gate", "n_exact", "n_near", "n_decontam", "n_quality"]
    for r in rows:
        vals = [r[s] for s in stages]
        assert vals == sorted(vals, reverse=True), r
        assert 0.0 <= r["retention"] <= 1.0
    total_raw = sum(r["n_raw"] for r in rows)
    d = load_table(spark, sf_dir, "documents")
    assert total_raw == d.filter(F.col("doc_id") % 50 != 0).count()
