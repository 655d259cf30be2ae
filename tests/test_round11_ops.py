"""Round-11 tests: shared-cache lifecycle contract (VERDICT r10 #7),
fractional-scale Decimal output convention (VERDICT r10 #1/#2), and the
ADVICE r10 hardening fixes (NULL-group bottom-k, Bradley-Terry typed
items / zero-denominator guard, preference-pair inversion filter)."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Shared-cache lifecycle contract (MIGRATION.md "Cache lifecycle contract")
# ---------------------------------------------------------------------------
def _sig_rows(spark, sf_dir):
    from sqlitedataframe_spark.suite.pipeline import shared_doc_sigs

    df = shared_doc_sigs(spark, sf_dir)
    return sorted((r["_id"], tuple(r["_sig"])) for r in df.collect())


def test_shared_cache_swept_session_recomputes_identical(spark, sf_dir):
    """Correctness invariant: shared caches are a pure performance layer —
    after release_shared_caches() a consumer rebuilds the frame and gets
    bit-identical rows (each shared frame is a deterministic pure
    function of (sf_dir, params))."""
    from sqlitedataframe_spark.operators.util import (
        _SHARED_CACHES,
        release_shared_caches,
    )

    before = _sig_rows(spark, sf_dir)
    assert before, "shared signature table is empty"
    n_released = release_shared_caches()
    assert n_released >= 1
    assert not _SHARED_CACHES
    after = _sig_rows(spark, sf_dir)
    assert before == after


def test_shared_cache_survives_release_and_sweep(spark, sf_dir):
    """Lifecycle invariant: release_caches() + sweep_unshared_rdds() (the
    per-query harness hygiene) must NOT drop a shared frame's storage,
    while an unregistered persist IS swept."""
    from sqlitedataframe_spark.operators.util import (
        _SHARED_RDD_IDS,
        persistent_rdd_ids,
        release_caches,
        sweep_unshared_rdds,
    )
    from sqlitedataframe_spark.suite.pipeline import shared_doc_sigs

    sigs = shared_doc_sigs(spark, sf_dir)
    shared_pinned = _SHARED_RDD_IDS & persistent_rdd_ids(spark)
    assert shared_pinned

    stray = spark.range(1000).persist()
    stray.count()
    stray_ids = persistent_rdd_ids(spark) - _SHARED_RDD_IDS
    assert stray_ids
    release_caches()
    sweep_unshared_rdds(spark)
    # shared frame's blocks still pinned; the stray persist's are gone
    # (sweep releases the underlying RDD blocks directly, so the check is
    # on pinned RDD ids, not the CacheManager-reported storageLevel)
    after = persistent_rdd_ids(spark)
    assert shared_pinned & after
    assert not (stray_ids & after)
    sl = sigs.storageLevel
    assert sl.useMemory or sl.useDisk


def test_shared_cache_build_seconds_recorded(spark, sf_dir):
    """Accounting invariant: every shared build logs its wall seconds in
    SHARED_BUILD_SECONDS (bench surfaces this as shared_cache_build)."""
    from sqlitedataframe_spark.operators.util import (
        SHARED_BUILD_SECONDS,
        release_shared_caches,
    )
    from sqlitedataframe_spark.suite.pipeline import shared_doc_sigs

    release_shared_caches()
    SHARED_BUILD_SECONDS.clear()
    shared_doc_sigs(spark, sf_dir)
    assert any("doc_minhash_sigs" in k for k in SHARED_BUILD_SECONDS)
    assert all(v >= 0.0 for v in SHARED_BUILD_SECONDS.values())


# ---------------------------------------------------------------------------
# Fractional-scale Decimal output convention (VERDICT r10 #1/#2)
# ---------------------------------------------------------------------------
def test_norm_cell_decimal_rules():
    """Integral-scale Decimals hash like ints; fractional-scale Decimals
    are a tagged class that can never collide with a float repr."""
    from tools.oracle_check import norm_cell

    assert norm_cell(Decimal("123")) == norm_cell(123) == "123"
    assert norm_cell(Decimal("5E+2")) == norm_cell(500)
    big = 2**63 + 12345
    assert norm_cell(Decimal(big)) == norm_cell(big)
    frac = norm_cell(Decimal("1.2500"))
    assert frac != norm_cell(1.25)
    assert frac.startswith("dec[4]:")
    # scale is part of the identity: 1.25 at scale 2 != at scale 4
    assert norm_cell(Decimal("1.25")) != norm_cell(Decimal("1.2500"))


def test_decimal_output_detector_and_ledger_schema(spark, sf_dir):
    """The plan-audit detector (whole-registry enforcement runs in the
    close via tools/plan_audit.py, which exits 1 on ANY Decimal-typed
    output column — r12 tightening from fractional-scale-only after the
    r11 driver capture redded integer-scale DECIMAL(38,0) cells) must
    catch nested and top-level Decimals at every scale and clear the
    VARCHAR-emitting ledger."""
    from tools.plan_audit import decimal_output_cols

    from sqlitedataframe_spark.suite import load_all

    bad = spark.createDataFrame([(Decimal("1.25"),)], "x decimal(10,2)")
    assert decimal_output_cols(bad.schema) == ["x"]
    nested = spark.sql(
        "SELECT array(cast(1.5 as decimal(8,4))) a, cast(2 as decimal(38,0)) b"
    )
    assert decimal_output_cols(nested.schema) == ["a[]", "b"]
    ledger = load_all()["agg_decimal_ledger"].spark_fn(spark, sf_dir)
    assert decimal_output_cols(ledger.schema) == []
    assert dict(ledger.dtypes)["gross_cents"] == "string"


# ---------------------------------------------------------------------------
# ADVICE r10 hardening
# ---------------------------------------------------------------------------
def test_bottomk_sample_null_group_key(spark):
    """A NULL group key must yield its own bottom-k sample, not silently
    vanish (the pre-r11 equi-join dropped it)."""
    from sqlitedataframe_spark.operators.sketch import bottomk_sample

    rows = [(None if i % 3 == 0 else f"g{i % 3}", i) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, k int")
    out = bottomk_sample(df, "g", F.col("k"), k=10).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["g"], []).append(r["k"])
    assert set(by_group) == {None, "g1", "g2"}
    assert all(len(v) == 10 for v in by_group.values())
    # the NULL group's sample must equal the flat bottom-k of its rows
    import hashlib

    null_keys = [i for i in range(300) if i % 3 == 0]
    expect = sorted(
        null_keys, key=lambda x: hashlib.md5(str(x).encode()).hexdigest()
    )[:10]
    assert sorted(by_group[None]) == sorted(expect)


def test_bradley_terry_integer_items_and_zero_wins(spark):
    """Integer item ids must work (schema derived from input); an item
    with only n==0 grid rows must not raise ZeroDivisionError."""
    from sqlitedataframe_spark.operators.evalmetrics import (
        bradley_terry_strengths,
    )

    wins = spark.createDataFrame(
        [(1, 2, 3), (2, 1, 1), (1, 3, 2), (3, 1, 0), (4, 1, 0), (1, 4, 0)],
        "item bigint, opp bigint, w bigint",
    )
    out = bradley_terry_strengths(wins, "item", "opp", "w", iters=5)
    rows = {r["item"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert all(isinstance(k, int) for k in rows)
    # item 4 faced only 0-0 ledgers: defined strength, no crash
    assert rows[4]["strength"] > 0
    assert abs(sum(r["strength"] for r in rows.values()) - 1.0) < 1e-3
    # item 1 won most head-to-heads: strongest
    assert max(rows.values(), key=lambda r: r["strength"])["item"] == 1


def test_preference_pairs_no_inverted_pairs(spark):
    """With min_margin <= 0 and a group smaller than top_n + bottom_n,
    no emitted pair may have rejected_score >= chosen_score."""
    from sqlitedataframe_spark.operators.sampling import preference_pairs

    df = spark.createDataFrame(
        [("g", "a", 0.9), ("g", "b", 0.5), ("g", "c", 0.1)],
        "grp string, id string, score double",
    )
    out = preference_pairs(
        df, "grp", "id", "score", top_n=3, bottom_n=3, min_margin=-1.0
    ).collect()
    assert out, "expected some pairs"
    for r in out:
        assert r["chosen_score"] > r["rejected_score"], r


# ---------------------------------------------------------------------------
# DDSketch: exact merge law + relative-error bound (VERDICT r10 #3a)
# ---------------------------------------------------------------------------
def test_ddsketch_merge_parity(spark):
    """sketch(A ∪ B ∪ C) must equal merge(sketch(A), sketch(B),
    sketch(C)) BIT-IDENTICALLY — the additive-state law."""
    from sqlitedataframe_spark.operators.sketch import (
        ddsketch_buckets,
        ddsketch_merge,
    )

    rows = [("g%d" % (i % 3), 1 + (i * 7919) % 100000) for i in range(3000)]
    df = spark.createDataFrame(rows, "g string, v long")
    one = sorted(
        tuple(r) for r in ddsketch_buckets(df, "g", "v", m=16).collect()
    )
    shards = [
        ddsketch_buckets(df.filter(F.col("v") % 3 == i), "g", "v", m=16)
        for i in range(3)
    ]
    merged = sorted(tuple(r) for r in ddsketch_merge(*shards).collect())
    assert one == merged
    assert len(one) > 0


def test_ddsketch_relative_error_bound(spark):
    """Every quantile readout must be within relative error 1/m of the
    exact quantile (the DDSketch guarantee, here m=32)."""
    from sqlitedataframe_spark.operators.sketch import ddsketch_quantiles

    rows = [("a", 1 + (i * 104729) % 1000000) for i in range(5000)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = ddsketch_quantiles(df, "g", "v", m=32).collect()[0]
    vals = sorted(v for _, v in rows)
    import math

    for tag, q in (("p50_lo", 0.5), ("p90_lo", 0.9), ("p99_lo", 0.99)):
        exact = vals[max(0, math.ceil(q * len(vals)) - 1)]
        rel = abs(out[tag] - exact) / exact
        assert rel <= 1.0 / 32 + 1e-9, (tag, out[tag], exact, rel)


def test_ddsketch_rejects_subunit_values(spark):
    """Values < 1 (zero/negative) are filtered, not silently mis-bucketed."""
    from sqlitedataframe_spark.operators.sketch import ddsketch_buckets

    df = spark.createDataFrame(
        [("a", -5), ("a", 0), ("a", 1), ("a", 2)], "g string, v long"
    )
    out = ddsketch_buckets(df, "g", "v", m=16).collect()
    assert sum(r["_cnt"] for r in out) == 2


def test_incremental_funnel_matches_batch(spark, sf_dir):
    """funnel(base ∪ delta) == merge(funnel(base), incr(delta)): the
    incremental query's stage counts must equal the batch funnel's."""
    from sqlitedataframe_spark.suite import load_all

    reg = load_all()
    batch = {
        r["source"]: tuple(r)[1:7]
        for r in reg["pipeline_curation_funnel"].spark_fn(spark, sf_dir).collect()
    }
    incr = {
        r["source"]: (
            r["n_raw"], r["n_gate"], r["n_exact"], r["n_near"],
            r["n_decontam"], r["n_quality"],
        )
        for r in reg["pipeline_curation_incremental"].spark_fn(spark, sf_dir).collect()
    }
    assert batch == incr


def test_pass_at_k_matches_binomial(spark, sf_dir):
    """The product-fold pass@k must equal 1 - C(n-c,k)/C(n,k) computed
    with exact integer binomials, for every (task, k) cell."""
    import math

    from sqlitedataframe_spark.suite import load_all

    from sqlitedataframe_spark.suite.relational import T as _T

    ev = _T(spark, sf_dir, "events")
    cells = (
        ev.groupBy(
            F.col("event_type").alias("task"),
            (F.col("user_id") % 128).alias("g"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    F.round(F.col("value") * 100).cast("bigint") % 5 == 0, 1
                ).otherwise(0)
            ).alias("c"),
        )
        .collect()
    )
    expect = {}
    for k in (1, 4, 16):
        per = {}
        for r in cells:
            n, c = r["n"], r["c"]
            if n < k:
                continue
            pak = 1.0 - math.comb(n - c, k) / math.comb(n, k)
            per.setdefault(r["task"], []).append(pak)
        for task, vals in per.items():
            expect[(task, k)] = round(sum(sorted(vals)) / len(vals) + 1e-9, 6)
    got = {
        (r["task"], r["k"]): r["pass_at_k"]
        for r in load_all()["eval_pass_at_k"].spark_fn(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for key in expect:
        assert abs(got[key] - expect[key]) < 1e-9, (key, got[key], expect[key])


def test_star_merge_law_connected_components(spark):
    """CC(E1 ∪ E2) == CC(star(CC(E1)) ∪ E2) — the incremental-clusters
    law, on a fixture where the delta edges BRIDGE two T0 components."""
    from sqlitedataframe_spark.operators.graph import connected_components

    e1 = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21)], "src long, dst long"
    )
    e2 = spark.createDataFrame(
        [(3, 10), (30, 31)], "src long, dst long"
    )  # bridges {1,2,3} with {10,11}; adds a new component
    full = {
        (r["node"], r["comp"])
        for r in connected_components(e1.unionByName(e2)).collect()
    }
    comp1 = connected_components(e1)
    star = comp1.filter(F.col("node") != F.col("comp")).select(
        F.col("node").alias("src"), F.col("comp").alias("dst")
    )
    nodes = (
        comp1.select(F.col("node"))
        .unionByName(e2.select(F.col("src").alias("node")))
        .unionByName(e2.select(F.col("dst").alias("node")))
        .distinct()
    )
    merged = {
        (r["node"], r["comp"])
        for r in connected_components(
            star.unionByName(e2), nodes=nodes
        ).collect()
    }
    assert full == merged
    comps = {}
    for n, c in merged:
        comps.setdefault(c, set()).add(n)
    assert comps[1] == {1, 2, 3, 10, 11}
    assert comps[20] == {20, 21}
    assert comps[30] == {30, 31}


def test_ddsketch_error_audit_under_bound(spark, sf_dir):
    """Realized p50/p90 relative errors must sit under 1/m = 3.125%."""
    from sqlitedataframe_spark.suite import load_all

    rows = (
        load_all()["agg_ddsketch_error_audit"].spark_fn(spark, sf_dir).collect()
    )
    assert rows
    for r in rows:
        assert r["p50_rel_err"] <= 1 / 32 + 1e-6
        assert r["p90_rel_err"] <= 1 / 32 + 1e-6
