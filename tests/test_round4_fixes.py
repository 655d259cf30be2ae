"""Round-4 regression tests for the VERDICT r3 / ADVICE r3 findings:

- hex-threshold clamp in allocate_token_budget / cap_per_class_approx
  (keep-rates within ~1/131072 of 1.0 must keep everything, not ~6%);
- profiling exact n_distinct folds signed zero like COUNT(DISTINCT);
- minhash_lsh_pairs leaves NO persistent RDDs behind (r3 persist leak);
- run_available_now refuses oversized memory-sink collects;
- sim_ann_recall reports a row for every probe.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sqlitedataframe_spark.io import load_table


def test_allocate_token_budget_near_unit_rate_keeps_all(spark):
    """A keep-rate in [~0.9999924, 1.0) rounds to 65536, whose 5-digit hex
    lpad(...,4) would TRUNCATE to '1000' (~6.25%). The clamp must map it to
    the keep-everything sentinel instead (ADVICE r3, medium)."""
    from sqlitedataframe_spark.operators.sampling import allocate_token_budget

    # single class => rate == budget_fraction exactly
    df = spark.range(200).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang"), F.lit(7).alias("toks")
    )
    kept = allocate_token_budget(
        df, class_col="lang", tokens_col="toks", budget_fraction=0.999995, key="doc_id"
    )
    assert kept.count() == 200


def test_cap_per_class_approx_near_unit_rate_keeps_all(spark):
    """Same truncation hazard in cap_per_class_approx: count 262143 with cap
    262142 gives 65536*(1 - 1/262143) = 65535.75, which rounds to 65536."""
    from sqlitedataframe_spark.operators.sampling import cap_per_class_approx

    n = 262_143
    df = spark.range(n).select(F.col("id").alias("k"), F.lit("c").alias("cls"))
    kept = cap_per_class_approx(df, ["cls"], "k", n - 1)
    assert kept.count() == n


def test_profile_exact_distinct_folds_signed_zero(spark):
    """COUNT(DISTINCT) treats -0.0 and 0.0 as one value (aggregation keys
    normalize signed zero); the melt-based exact path must match
    (ADVICE r3)."""
    from sqlitedataframe_spark.operators.profiling import profile

    df = spark.createDataFrame(
        [(0.0,), (-0.0,), (1.0,), (None,)], "x double"
    )
    row = {r["column"]: r for r in profile(df, ["x"], exact=True).collect()}
    assert row["x"]["n_distinct"] == 2
    # cross-check against Spark's own COUNT(DISTINCT)
    assert df.agg(F.countDistinct("x")).collect()[0][0] == 2


def test_minhash_lsh_pairs_storage_is_bounded_and_released(spark, sf_dir):
    """VERDICT r3 defect #1 was a persist() never unpersisted (session-
    lifetime leak). The r5 design materializes the signature table via
    util.eager_cache — blocks ARE pinned while the result is in use (that
    is the point: a compute-once guarantee ReuseExchange couldn't give),
    registered so release_caches() drains them afterwards. GC-based
    cleanup was measured NOT to work in PySpark (the JVM pins the RDD
    after the Python frame dies), which is why the registry is explicit;
    persist (vs localCheckpoint) keeps lineage so the release is safe at
    any time."""
    from sqlitedataframe_spark.operators.dedup import minhash_lsh_pairs
    from sqlitedataframe_spark.operators.util import (
        release_caches,
        release_shared_caches,
    )

    def _persistent_ids():
        it = spark.sparkContext._jsc.sc().getPersistentRDDs().keysIterator()
        ids = set()
        while it.hasNext():
            ids.add(it.next())
        return ids

    release_caches()  # start clean (shared session)
    # r6: also drain the cross-query shared signature cache — it holds the
    # SAME normalized plan this test persists, and Spark's CacheManager
    # would dedupe the persist into it (pinned delta 0, breaking the
    # exactly-one assertion when suite tests ran first)
    release_shared_caches()
    before = _persistent_ids()
    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d)
    assert pairs.count() >= 0
    pinned = _persistent_ids() - before
    # exactly the signature table + (r12) the banded self-join input —
    # both registered, both drained by release_caches below
    assert len(pinned) == 2, pinned
    released = release_caches()
    assert released >= 1
    leaked = _persistent_ids() - before
    assert not leaked, (
        f"minhash_lsh_pairs cache not released (RDD ids {leaked})"
    )
    # and the result is STILL usable after release (lineage recompute)
    assert pairs.count() >= 0


def test_run_available_now_refuses_oversized_sink(spark, sf_dir):
    """run_available_now is a driver-side batch-equivalence harness; it must
    refuse to collect result sets above max_rows (VERDICT r3 #6)."""
    import tempfile

    from sqlitedataframe_spark.streaming import run_available_now

    e = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    src = tempfile.mkdtemp(prefix="rand_guard_")
    e.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(e.schema).parquet(src)
    with pytest.raises(ValueError, match="max_rows"):
        run_available_now(stream, output_mode="append", max_rows=5)


def test_sim_ann_recall_reports_every_probe(spark, sf_dir):
    """Every probe vector must produce a recall row, even at recall 0 — a
    probe with no LSH hits must not vanish from the report (ADVICE r3)."""
    from sqlitedataframe_spark.suite import load_all

    q = load_all()["sim_ann_recall"]
    rows = q.spark_fn(spark, sf_dir).collect()
    assert [r["qid"] for r in rows] == list(range(8))
    assert all(r["n_hits"] is not None and r["recall_at_10"] is not None for r in rows)


def test_hex_threshold_clamp_property():
    """For EVERY fraction, hex_threshold returns either the keep-everything
    sentinel or exactly 4 hex chars — the invariant whose violation (5-digit
    hex silently lpad-truncated) caused the ADVICE r3 sampling bug."""
    from hypothesis import given, strategies as st

    from sqlitedataframe_spark.operators.sampling import hex_threshold

    @given(st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
    def check(f):
        cut = hex_threshold(f)
        assert cut == "g000" or (
            len(cut) == 4 and all(c in "0123456789abcdef" for c in cut)
        )
        # monotone: larger fractions never yield lexicographically smaller cuts
        assert hex_threshold(min(1.0, f)) >= hex_threshold(max(0.0, f - 0.01)) or f < 0.01

    check()


def test_engine_cut_expressions_match_hex_threshold(spark):
    """The Column-side cut expressions (cap_per_class_approx /
    allocate_token_budget / sample_temperature) must agree with the Python
    hex_threshold for rates across the whole range, including the
    near-1.0 truncation zone."""
    from pyspark.sql import functions as F

    from sqlitedataframe_spark.operators.sampling import _SPACE, hex_threshold

    rates = [0.0, 1 / 65536, 0.25, 0.5, 0.9, 0.999, 0.9999923, 0.9999995, 1.0]
    df = spark.createDataFrame([(r,) for r in rates], "rate double")
    cut_int = F.round(F.col("rate") * _SPACE).cast("int")
    cut = F.when(
        (F.col("rate") >= 1.0) | (cut_int >= F.lit(_SPACE)), F.lit("g000")
    ).otherwise(F.lpad(F.lower(F.hex(cut_int)), 4, "0"))
    got = {r["rate"]: r["cut"] for r in df.select("rate", cut.alias("cut")).collect()}
    for r in rates:
        assert got[r] == hex_threshold(r), (r, got[r], hex_threshold(r))
