"""Round-4 operator tests: histogram quantile sketch, from-scratch HLL,
Gram-matrix PCA — the mergeability and accuracy properties that make these
structures usable as 100 TB rollups.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sqlitedataframe_spark.io import load_table
from sqlitedataframe_spark.operators.sketch import (
    hist_build,
    hist_merge,
    hist_quantile,
    hll_estimate,
    hll_merge,
    hll_registers,
)

_HB = dict(lo=900.0, hi=105000.0, nbins=64)


def test_hist_merge_equals_full(spark, sf_dir):
    """Shard histograms must merge to exactly the full-data histogram —
    the property that makes per-day/per-shard rollups free."""
    l = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    full = hist_build(l, "l_extendedprice", ["l_returnflag"], **_HB)
    s1 = hist_build(
        l.filter(F.col("l_extendedprice") < 50000), "l_extendedprice", ["l_returnflag"], **_HB
    )
    s2 = hist_build(
        l.filter(F.col("l_extendedprice") >= 50000), "l_extendedprice", ["l_returnflag"], **_HB
    )
    merged = hist_merge(s1, s2)
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, merged.collect()))


def test_hist_quantile_within_bin_width(spark, sf_dir):
    """Interpolated estimates sit within one bin width of exact percentiles."""
    l = load_table(spark, sf_dir, "lineitem")
    sk = hist_build(l, "l_extendedprice", ["l_returnflag"], **_HB)
    width = (_HB["hi"] - _HB["lo"]) / _HB["nbins"]
    for q in (0.5, 0.95):
        est = {
            r["l_returnflag"]: r["q_est"]
            for r in hist_quantile(sk, ["l_returnflag"], q, **_HB).collect()
        }
        exact = {
            r["l_returnflag"]: r["p"]
            for r in l.groupBy("l_returnflag")
            .agg(F.expr(f"percentile(l_extendedprice, {q})").alias("p"))
            .collect()
        }
        for g, e in exact.items():
            assert abs(est[g] - e) <= width, (q, g, est[g], e)


def test_hll_merge_equals_full(spark, sf_dir):
    """Register tables merge by bucket-max to exactly the full-data
    registers; the merged estimate equals the full-data estimate."""
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    tagged = l.withColumn("g", F.lit("all"))
    full = hll_registers(tagged, "l_partkey", ["g"])
    s1 = hll_registers(
        tagged.filter(F.col("l_partkey") % 2 == 0), "l_partkey", ["g"]
    )
    s2 = hll_registers(
        tagged.filter(F.col("l_partkey") % 2 == 1), "l_partkey", ["g"]
    )
    merged = hll_merge(s1.unionByName(s2), ["g"])
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, merged.collect()))
    e_full = hll_estimate(full, ["g"]).collect()[0][1]
    e_merged = hll_estimate(merged, ["g"]).collect()[0][1]
    assert e_full == e_merged


def test_hll_estimate_accuracy(spark):
    """m=256 gives ~6.5% standard error; require within 20% on 5000 keys."""
    df = spark.range(5000).select(F.col("id").alias("k"), F.lit("g").alias("g"))
    regs = hll_registers(df, "k", ["g"])
    est = hll_estimate(regs, ["g"]).collect()[0][1]
    assert abs(est - 5000) / 5000 < 0.20, est


def test_top_component_rayleigh_near_lambda_max(spark, sf_dir):
    """The synthetic embeddings have a near-degenerate spectrum
    (lambda2/lambda1 ~ 0.93), so eigenVECTOR comparison is ill-posed at
    any practical iteration count; the well-posed convergence property is
    the Rayleigh quotient, which converges at the squared rate: after 30
    iterations v'Cv must be within 1% of numpy's lambda_max."""
    import numpy as np

    from sqlitedataframe_spark.operators.similarity import top_component

    e = load_table(spark, sf_dir, "embeddings")
    v = {
        r["pos"]: r["loading"]
        for r in top_component(e, "embedding", dim=64, iters=30).collect()
    }
    got = np.array([v[i + 1] for i in range(64)])
    got /= np.linalg.norm(got)
    x = np.array([list(r.embedding) for r in e.collect()], dtype=np.float64)
    c = x.T @ x
    lam = float(np.linalg.eigvalsh(c)[-1])
    rayleigh = float(got @ c @ got)
    assert rayleigh > 0.99 * lam, (rayleigh, lam)


def test_simhash128_finds_planted_near_dup(spark):
    """A document pair differing by one token must collide in at least one
    32-bit band (pigeonhole over 128 bits) and report a small Hamming
    distance; unrelated docs must not pair."""
    from sqlitedataframe_spark.operators.dedup import simhash128_pairs

    # SimHash bit-flip probability per changed token scales ~1/sqrt(n_tokens):
    # with 400 distinct tokens a 1-token edit expects Hamming ~1 of 128,
    # while a handful of tokens would scatter ~30 bits and (correctly) not
    # qualify as a near-duplicate.
    toks = [f"w{i}" for i in range(400)]
    base = " ".join(toks)
    edited = " ".join(["CHANGED" if t == "w7" else t for t in toks])
    rows = [
        (1, base),
        (2, edited),
        (3, " ".join(f"other{i}" for i in range(400))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # md5 is fixed, so the distance is deterministic: this fixture lands at
    # Hamming 4 of 128; threshold 8 keeps the test meaningful (random docs
    # sit near 64) without being brittle to fixture edits
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash128_pairs(df, max_hamming=8).collect()
    }
    assert pairs == {(1, 2): 4}


def test_simhash128_bands_agree_with_signatures(spark):
    """Band buckets must be exact 32-bit windows of the packed signatures."""
    from sqlitedataframe_spark.operators.dedup import simhash_signatures128

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    r = simhash_signatures128(df, "doc_id", "text").collect()[0]
    # reconstruct 128 bits and re-derive the 4 band values
    s0, s1 = r["_sig0"] & (2**64 - 1), r["_sig1"] & (2**64 - 1)
    bands = [s0 & 0xFFFFFFFF, (s0 >> 32) & 0xFFFFFFFF,
             s1 & 0xFFFFFFFF, (s1 >> 32) & 0xFFFFFFFF]
    assert all(0 <= b < 2**32 for b in bands)


def test_bloom_no_false_negatives_and_merge(spark):
    """Every inserted key must probe true (no false negatives), and shard
    blooms OR-merged must equal the full-data bloom."""
    from sqlitedataframe_spark.operators.sketch import (
        bloom_build,
        bloom_merge,
        bloom_probe,
    )

    df = spark.range(2000).select(F.col("id").cast("string").alias("k"))
    full = bloom_build(df, "k", m=4096)
    s1 = bloom_build(df.filter(F.col("k").cast("long") % 2 == 0), "k", m=4096)
    s2 = bloom_build(df.filter(F.col("k").cast("long") % 2 == 1), "k", m=4096)
    merged = bloom_merge(s1, s2)
    assert sorted(r.bit for r in full.collect()) == sorted(
        r.bit for r in merged.collect()
    )
    probed = bloom_probe(df, full, "k", m=4096)
    assert probed.filter(~F.col("bloom_hit")).count() == 0


def test_bloom_probe_rejects_most_nonmembers(spark):
    """Non-members must mostly miss: with n=500, m=4096, k=4 the FP rate is
    ~ (1 - e^(-kn/m))^4 ~ 2.4% — require < 10% observed."""
    from sqlitedataframe_spark.operators.sketch import bloom_build, bloom_probe

    members = spark.range(500).select(F.col("id").cast("string").alias("k"))
    others = spark.range(10_000, 12_000).select(F.col("id").cast("string").alias("k"))
    bloom = bloom_build(members, "k", m=4096)
    fp = bloom_probe(others, bloom, "k", m=4096).filter(F.col("bloom_hit")).count()
    assert fp / 2000 < 0.10, fp


def test_sample_temperature_limits(spark):
    """T=1 reproduces natural proportions (keep-rate == budget for every
    class); very large T approaches the uniform per-class budget of
    allocate_token_budget."""
    from sqlitedataframe_spark.operators.sampling import (
        allocate_token_budget,
        sample_temperature,
    )

    rows = [(i, "big" if i % 10 else "small", 10) for i in range(5000)]
    df = spark.createDataFrame(rows, "doc_id long, cls string, toks long")
    # T=1: every class keeps ~budget_fraction of its docs
    t1 = sample_temperature(df, "cls", "toks", 0.5, 1.0, "doc_id")
    by = {r.cls: r.n for r in t1.groupBy("cls").agg(F.count("*").alias("n")).collect()}
    assert abs(by["big"] / 4500 - 0.5) < 0.05
    assert abs(by["small"] / 500 - 0.5) < 0.10
    # T -> inf: equals the uniform token-budget split exactly (same cuts)
    hot = sample_temperature(df, "cls", "toks", 0.5, 1e9, "doc_id")
    uni = allocate_token_budget(df, "cls", "toks", 0.5, "doc_id")
    assert sorted(map(tuple, hot.collect())) == sorted(map(tuple, uni.collect()))
