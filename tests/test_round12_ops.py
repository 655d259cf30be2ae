"""Round-12 operator tests (VERDICT r11 #1-#3, ADVICE r11 #2-#3):
Decimal-free hashed output + the VARCHAR/limb probe pair, the two-sided
DDSketch (signed octaves + zero bucket, overflow-safe totality over
bigint), and the weighted priority sample (merge == one-shot, threshold
estimator semantics)."""

from __future__ import annotations

import math
from decimal import Decimal

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# norm_cell: non-finite Decimals must hash, not crash (ADVICE r11 #2)
# ---------------------------------------------------------------------------
def test_norm_cell_nonfinite_decimal():
    from tools.oracle_check import norm_cell

    assert norm_cell(Decimal("NaN")).startswith("dec[special]:")
    assert norm_cell(Decimal("Infinity")).startswith("dec[special]:")
    assert norm_cell(Decimal("-Infinity")).startswith("dec[special]:")
    # and the finite paths are unchanged
    assert norm_cell(Decimal("500")) == norm_cell(500)
    assert norm_cell(Decimal("1.25")).startswith("dec[2]:")


# ---------------------------------------------------------------------------
# The wide-integer probe pair: same value, two sanctioned representations
# ---------------------------------------------------------------------------
def test_wide_probe_pair_consistency(spark, sf_dir):
    """profile_wide_varchar and profile_wide_limbs must publish the SAME
    exact integer (digits == hi*1e9 + lo), and it must exceed 2^63 at
    every sf so the probe actually probes."""
    from sqlitedataframe_spark.suite import load_all

    reg = load_all()
    v = reg["profile_wide_varchar"].spark_fn(spark, sf_dir).collect()[0]
    l = reg["profile_wide_limbs"].spark_fn(spark, sf_dir).collect()[0]
    total = int(v["charged_total"])
    assert total == l["charged_hi"] * 1_000_000_000 + l["charged_lo"]
    # past the float53 exactness boundary even at the tiny test sf
    # (~6e18); at the driver-checked sf0.01/sf0.1 it also passes 2^63
    assert total > 2**53
    assert v["n"] == l["n"]


def test_ledger_output_is_decimal_free(spark, sf_dir):
    """No registered query may emit a Decimal-typed output column —
    spot-checked here on the three r12-touched queries; whole-registry
    enforcement is tools/plan_audit.py's hard error."""
    from tools.plan_audit import decimal_output_cols

    from sqlitedataframe_spark.suite import load_all

    reg = load_all()
    for name in (
        "agg_decimal_ledger",
        "profile_wide_varchar",
        "profile_wide_limbs",
    ):
        df = reg[name].spark_fn(spark, sf_dir)
        assert decimal_output_cols(df.schema) == [], name


# ---------------------------------------------------------------------------
# One-sided DDSketch: totality over bigint (ADVICE r11 #3)
# ---------------------------------------------------------------------------
def _py_bucket(v: int, m: int) -> tuple:
    """Reference bucket math in unbounded python ints."""
    e = v.bit_length() - 1
    pw = 1 << e
    sub = ((v - pw) * m) // pw
    return e * m + sub, pw + (sub * pw) // m


def test_ddsketch_total_over_bigint(spark):
    """Values near 2^63 must bucket EXACTLY (the naive multiply form
    wraps int64 at v >= 2^63/m; the divide-before-multiply form cannot)."""
    from sqlitedataframe_spark.operators.sketch import ddsketch_buckets

    big = [2**62 + 12345, 2**63 - 1, 2**58 + 7, 2**63 // 32 + 1]
    small = [1, 2, 3, 17, 31]
    rows = [("a", v) for v in big + small]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {
        (r["_idx"], r["_lo"]): r["_cnt"]
        for r in ddsketch_buckets(df, "g", "v", m=32).collect()
    }
    expect = {}
    for v in big + small:
        k = _py_bucket(v, 32)
        expect[k] = expect.get(k, 0) + 1
    assert out == expect


def test_ddsketch_requires_power_of_two_m(spark):
    from sqlitedataframe_spark.operators.sketch import ddsketch_buckets

    df = spark.createDataFrame([("a", 5)], "g string, v long")
    with pytest.raises(AssertionError):
        ddsketch_buckets(df, "g", "v", m=12)


# ---------------------------------------------------------------------------
# Two-sided DDSketch
# ---------------------------------------------------------------------------
def _signed_rows():
    vals = (
        [1 + (i * 7919) % 100000 for i in range(400)]
        + [-(1 + (i * 104729) % 50000) for i in range(300)]
        + [0] * 25
        + [2**62 + 9, -(2**62 + 9), 2**63 - 1, -(2**63 - 1)]
    )
    return [("g%d" % (i % 2), v) for i, v in enumerate(vals)]


def test_ddsketch_signed_stores_and_reference_math(spark):
    """Signed bucketing must equal the python reference on all three
    stores (negative octaves mirrored on |v|, exact zero bucket,
    positive octaves), including values at the int64 edges."""
    from sqlitedataframe_spark.operators.sketch import ddsketch_buckets_signed

    rows = _signed_rows()
    df = spark.createDataFrame(rows, "g string, v long")
    out = {}
    for r in ddsketch_buckets_signed(df, "g", "v", m=32).collect():
        out[(r["g"], r["_sign"], r["_idx"], r["_rv"])] = r["_cnt"]
    expect = {}
    for g, v in rows:
        if v == 0:
            k = (g, 0, 0, 0)
        else:
            s = 1 if v > 0 else -1
            idx, lo = _py_bucket(abs(v), 32)
            k = (g, s, idx, s * lo)
        expect[k] = expect.get(k, 0) + 1
    assert out == expect


def test_ddsketch_signed_merge_parity(spark):
    """merge(shards) == one-shot, bit-identically (additive state law,
    two-sided layout handled by the generalized ddsketch_merge)."""
    from sqlitedataframe_spark.operators.sketch import (
        ddsketch_buckets_signed,
        ddsketch_merge,
    )

    df = spark.createDataFrame(_signed_rows(), "g string, v long")
    one = sorted(
        tuple(r) for r in ddsketch_buckets_signed(df, "g", "v", m=16).collect()
    )
    shards = [
        ddsketch_buckets_signed(
            df.filter(F.abs(F.col("v")) % 3 == i), "g", "v", m=16
        )
        for i in range(3)
    ]
    merged = sorted(tuple(r) for r in ddsketch_merge(*shards).collect())
    assert one == merged and len(one) > 0


def test_ddsketch_signed_readout_bound_and_counts(spark):
    """The signed readout's per-sign counts are exact and each quantile
    readout is within relative error 1/m on MAGNITUDE (sign exact)."""
    from sqlitedataframe_spark.operators.sketch import (
        ddsketch_buckets_signed,
        ddsketch_readout_signed,
    )

    vals = [(-1) ** i * (1 + (i * 7919) % 100000) for i in range(2000)]
    vals += [0] * 37
    rows = [("a", v) for v in vals]
    df = spark.createDataFrame(rows, "g string, v long")
    out = ddsketch_readout_signed(
        ddsketch_buckets_signed(df, "g", "v", m=32),
        "g",
        qs=((1, 10), (1, 2), (9, 10)),
    ).collect()[0]
    assert out["n"] == len(vals)
    assert out["n_neg"] == sum(1 for v in vals if v <= -1)
    assert out["n_zero"] == 37
    assert out["n_pos"] == sum(1 for v in vals if v >= 1)
    svals = sorted(vals)
    for tag, num, den in (("p10_rv", 1, 10), ("p50_rv", 1, 2), ("p90_rv", 9, 10)):
        rank = (num * len(vals) + den - 1) // den
        exact = svals[rank - 1]
        got = out[tag]
        if exact == 0:
            assert got == 0, (tag, got)
        else:
            assert got * exact > 0, (tag, got, exact)  # sign exact
            rel = abs(abs(got) - abs(exact)) / abs(exact)
            assert rel <= 1.0 / 32 + 1e-9, (tag, got, exact, rel)


# ---------------------------------------------------------------------------
# Priority sampling (weighted mergeable sample)
# ---------------------------------------------------------------------------
def _pri_df(spark, n=500, groups=3):
    rows = [("s%d" % (i % groups), i, 10 + (i * 7919) % 5000) for i in range(n)]
    return spark.createDataFrame(rows, "g string, id long, w long")


def test_priority_sample_merge_equals_oneshot(spark):
    """resample(union of per-shard states) == one-shot sample, row for
    row — the mergeability law."""
    from sqlitedataframe_spark.operators.sketch import (
        priority_resample,
        priority_sample,
        priority_state,
    )

    df = _pri_df(spark)
    one = sorted(
        tuple(r) for r in priority_sample(df, "g", "id", "w", k=16).collect()
    )
    states = [
        priority_state(df.filter(F.col("id") % 4 == i), "g", "id", "w", k=16)
        for i in range(4)
    ]
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    two = sorted(
        tuple(r)
        for r in priority_resample(merged, "g", "id", k=16).collect()
    )
    assert one == two and len(one) == 3 * 16


def test_priority_sample_matches_python_reference(spark):
    """Sample membership, threshold and estimator must equal a plain
    python re-computation from the same md5 uniforms."""
    import hashlib

    from sqlitedataframe_spark.operators.sketch import priority_sample

    rows = [("a", i, 10 + (i * 7919) % 5000) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, id long, w long")
    k = 8
    out = priority_sample(df, "g", "id", "w", k=k).collect()

    def pri(i, w):
        u = int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16) + 1
        return (float(w) * float(1 << 48)) / float(u)

    ranked = sorted(rows, key=lambda r: (-pri(r[1], r[2]), -r[1]))
    expect_ids = [r[1] for r in ranked[:k]]
    # p = w * 2^48 / u_int == w / (u_int / 2^48): already weight units
    tau = pri(ranked[k][1], ranked[k][2])
    got = {r["id"]: r for r in out}
    assert sorted(got) == sorted(expect_ids)
    for r in out:
        assert r["_tau"] == pytest.approx(tau, abs=0.0)  # bit-identical
        assert r["_w_hat"] == max(float(r["_w"]), tau)


def test_priority_sample_small_group_keeps_all(spark):
    """A group with <= k rows keeps every row with tau = 0, w_hat = w."""
    from sqlitedataframe_spark.operators.sketch import priority_sample

    df = spark.createDataFrame(
        [("tiny", i, 5 * (i + 1)) for i in range(4)], "g string, id long, w long"
    )
    out = priority_sample(df, "g", "id", "w", k=16).collect()
    assert len(out) == 4
    for r in out:
        assert r["_tau"] == 0.0
        assert r["_w_hat"] == float(r["_w"])


def test_priority_estimator_total_is_plausible(spark):
    """sum of w_hat over the whole sample should estimate the true total
    weight (unbiased over the uniform draw; here one fixed draw, so just
    assert the estimate is within a loose 3x band — a sign/scale check,
    not a statistical test)."""
    from sqlitedataframe_spark.operators.sketch import priority_sample

    df = _pri_df(spark, n=2000, groups=1)
    out = priority_sample(df, "g", "id", "w", k=64).collect()
    est = sum(r["_w_hat"] for r in out)
    true = sum(10 + (i * 7919) % 5000 for i in range(2000))
    assert true / 3 <= est <= true * 3


# ---------------------------------------------------------------------------
# Incremental-law spot checks on the tiny fixture (fast versions of the
# sf0.01 oracle equalities)
# ---------------------------------------------------------------------------
def test_contamination_incremental_matches_oneshot_oracle(spark, sf_dir):
    """The incremental report equals the one-shot splits report on the
    shared columns (same split/contam sets, computed two ways)."""
    from sqlitedataframe_spark.suite import load_all

    reg = load_all()
    inc = {
        r["split"]: r
        for r in reg["eval_contamination_incremental"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    # the one-shot SPLITS query uses SUPPRESSED pairs, so only the
    # suppression-independent columns must agree on the tiny fixture
    # (no bucket exceeds the 10000 cap at sf0.001)
    one = {
        r["split"]: r
        for r in reg["eval_contamination_splits"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    assert sorted(inc) == sorted(one)
    for s in inc:
        assert inc[s]["n_bench"] == one[s]["n_bench"]
        assert inc[s]["n_train"] == one[s]["n_train"]
        assert inc[s]["n_exact"] == one[s]["n_exact_contam"]
        assert inc[s]["n_near"] == one[s]["n_near_contam"]
        assert inc[s]["n_ngram"] == one[s]["n_ngram_contam"]
        assert inc[s]["n_any"] == one[s]["n_any_contam"]


# ---------------------------------------------------------------------------
# Wave-2 audits: realized bounds, asserted (not just oracle-matched)
# ---------------------------------------------------------------------------
def test_signed_error_audit_under_bound(spark, sf_dir):
    """Every realized rel err in the signed error audit must respect the
    1/m = 3.125% DDSketch guarantee wherever sketch and truth share a
    sign (they do on the fixture), modulo the integer floor of tiny
    magnitudes (|exact| < m can quantize a whole unit)."""
    from sqlitedataframe_spark.suite import load_all

    rows = (
        load_all()["agg_ddsketch_signed_error_audit"]
        .spark_fn(spark, sf_dir)
        .collect()
    )
    assert len(rows) == 2
    for r in rows:
        for tag in ("p10", "p50", "p90"):
            ex, rv, err = r[f"{tag}_exact"], r[f"{tag}_rv"], r[f"{tag}_rel_err"]
            if ex == 0:
                assert err is None and rv == 0, (tag, r)
            elif abs(ex) >= 32:
                assert rv * ex > 0, (tag, r)  # same sign
                assert err <= 1.0 / 32 + 1e-6, (tag, r)


def test_priority_budget_estimator_quality(spark, sf_dir):
    """The 32-row-per-source estimate of per-source char mass should land
    within 60% of truth on the tiny fixture (a fixed-draw sanity band,
    wide because k=32 gives ~1/sqrt(32) ~ 18% standard error)."""
    from sqlitedataframe_spark.suite import load_all

    rows = (
        load_all()["mixture_priority_budget"].spark_fn(spark, sf_dir).collect()
    )
    assert len(rows) >= 3
    for r in rows:
        assert r["n_sampled"] <= 32
        assert r["rel_err"] <= 0.6, dict(r.asDict())
