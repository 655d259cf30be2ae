"""Round-5 fixes: ADVICE r4 defects + VERDICT r4 evidence tasks.

- skipgram_pairs single-token crash (ADVICE medium #1)
- stream_incremental_dedup idempotent batch_id partitions + explicit
  work_dir preservation/resume (ADVICE medium #2, low #3)
- minhash signature pipeline materialized exactly once via registered
  eager persist (VERDICT #2/#5 — replaces the best-effort ReuseExchange
  reliance that produced the 246 s driver outlier)
- agg_approx bounded accuracy contract (VERDICT #4: the one rows-only
  registry query gets a checked relative-error bound instead of nothing)
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# skipgram_pairs: single-token / empty documents
# ---------------------------------------------------------------------------
def test_skipgram_single_token_doc(spark):
    """A one-word document used to evaluate element_at(t, 0) (sequence(1,0)
    is DESCENDING [1,0] in Spark) and crash with INVALID_INDEX_OF_ZERO."""
    from sqlitedataframe_spark.operators.text import skipgram_pairs

    df = spark.createDataFrame(
        [("hello",), ("",), ("a b a",)], ["text"]
    )
    rows = skipgram_pairs(df, window=2, k=10).collect()
    got = {(r["w1"], r["w2"]): r["n"] for r in rows}
    # only the 3-token doc contributes: (a,b), (a,a), (b,a)
    assert got == {("a", "b"): 1, ("a", "a"): 1, ("b", "a"): 1}


def test_skipgram_all_short_docs_empty(spark):
    from sqlitedataframe_spark.operators.text import skipgram_pairs

    df = spark.createDataFrame([("x",), ("y",)], ["text"])
    assert skipgram_pairs(df, window=3, k=5).collect() == []


# ---------------------------------------------------------------------------
# minhash: signature pipeline runs exactly once (eager localCheckpoint)
# ---------------------------------------------------------------------------
def _docs(spark):
    # same-group docs are IDENTICAL (J=1); cross-group Jaccard ~0.2, far
    # from the 0.9 threshold so the 64-hash estimate can't straddle it
    base = "alpha beta gamma delta epsilon zeta"
    return spark.createDataFrame(
        [
            (i, base + " " + " ".join(f"t{i % 3}x{j}" for j in range(8)))
            for i in range(12)
        ],
        ["doc_id", "text"],
    )


def test_minhash_signature_cached_once(spark):
    """Every consumer of the signature table must read the materialized
    cache (InMemoryTableScan) — never recompute the shingle/md5 pipeline.
    This is the structural guarantee that replaced ReuseExchange (which
    AQE may decline, recomputing the signature pipeline 3x — the r4
    driver's 246 s outlier on identical code)."""
    from sqlitedataframe_spark.operators.util import release_caches
    from sqlitedataframe_spark.operators.dedup import minhash_lsh_pairs

    try:
        pairs = minhash_lsh_pairs(_docs(spark), min_jaccard=0.0)
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan, plan
        # the expensive pipeline (shingling feeds the md5-per-shingle
        # minhash fold) may appear only INSIDE the cached relation's own
        # printout, never in a consumer subtree: every line mentioning the
        # shingle recipe must sit below an InMemoryRelation header
        lines = plan.splitlines()
        first_imr = min(
            (i for i, l in enumerate(lines) if "InMemoryRelation" in l),
            default=len(lines),
        )
        for i, line in enumerate(lines[:first_imr]):
            assert "array_distinct" not in line, (i, line)
    finally:
        release_caches()


def test_minhash_incremental_plan_cached(spark):
    from sqlitedataframe_spark.operators.util import release_caches
    from sqlitedataframe_spark.operators.dedup import minhash_lsh_pairs

    try:
        d = _docs(spark)
        batch = d.filter(F.col("doc_id") % 4 == 0).select("doc_id")
        pairs = minhash_lsh_pairs(d, min_jaccard=0.0, new_ids=batch)
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan, plan
    finally:
        release_caches()


def test_minhash_pairs_still_correct_after_checkpoint(spark):
    """Same results as before the checkpoint change: every doc pairs with
    the others sharing its tail group at jaccard ~1 for identical text."""
    from sqlitedataframe_spark.operators.dedup import minhash_lsh_pairs

    rows = minhash_lsh_pairs(_docs(spark), min_jaccard=0.9).collect()
    got = {(r["id_a"], r["id_b"]) for r in rows}
    want = {
        (a, b)
        for a in range(12)
        for b in range(a + 1, 12)
        if a % 3 == b % 3
    }
    assert got == want


# ---------------------------------------------------------------------------
# stream_incremental_dedup: idempotent partitions + work_dir contract
# ---------------------------------------------------------------------------
def _write_doc_batches(spark, tmp_path):
    base = "the quick brown fox jumps over the lazy dog again and again ok"
    rows = [(i, base + f" tail {i % 4}") for i in range(18)]
    sf_dir = str(tmp_path / "sf")
    ddir = os.path.join(sf_dir, "documents.parquet")
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for lo in (0, 6, 12):
        chunk = df.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 6))
        chunk.coalesce(1).write.mode("append").parquet(ddir)
    return sf_dir


def test_stream_dedup_batch_partitions_and_resume(spark, tmp_path):
    """Pairs and corpus land in batch_id=N partition dirs (the idempotent
    replay unit); an explicit work_dir is NOT wiped on a second call — the
    checkpoint resumes with no new data and the result is unchanged."""
    from sqlitedataframe_spark.streaming.core import stream_incremental_dedup

    sf_dir = _write_doc_batches(spark, tmp_path)
    work = str(tmp_path / "work")
    first = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in stream_incremental_dedup(
            spark, sf_dir, min_jaccard=0.3, max_files_per_trigger=1,
            work_dir=work,
        ).collect()
    }
    out_parts = sorted(os.listdir(os.path.join(work, "pairs")))
    assert [p for p in out_parts if p.startswith("batch_id=")], out_parts
    acc_parts = sorted(os.listdir(os.path.join(work, "corpus")))
    assert [p for p in acc_parts if p.startswith("batch_id=")], acc_parts

    sentinel = os.path.join(work, "user_file.txt")
    with open(sentinel, "w") as f:
        f.write("mine")
    second = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in stream_incremental_dedup(
            spark, sf_dir, min_jaccard=0.3, max_files_per_trigger=1,
            work_dir=work,
        ).collect()
    }
    assert os.path.exists(sentinel), "explicit work_dir was wiped"
    assert second == first


# ---------------------------------------------------------------------------
# agg_approx: bounded accuracy contract backing the rows-only oracle row
# ---------------------------------------------------------------------------
def test_agg_approx_error_bounds(spark, sf_dir):
    """agg_approx can never hash-match an external oracle (engine-internal
    HLL++/KLL sketches differ by design), so its correctness ceiling is a
    CHECKED error bound against the exact twins: approx_count_distinct at
    rsd=0.01 within 5% of the exact distinct count (HLL++ guarantees
    ~1% rsd; 5 sigma of headroom), and each percentile_approx(accuracy=
    10000) value within the exact [p-1%, p+1%] quantile envelope."""
    from sqlitedataframe_spark.io import load_table
    from sqlitedataframe_spark.suite import load_all

    approx = {
        r["l_returnflag"]: r
        for r in load_all()["agg_approx"].spark_fn(spark, sf_dir).collect()
    }
    l = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r
        for r in (
            l.groupBy("l_returnflag")
            .agg(
                F.countDistinct("l_partkey").alias("nd"),
                F.expr(
                    "percentile(l_extendedprice,"
                    " array(0.49, 0.5, 0.51, 0.94, 0.95, 0.96, 0.98, 0.99, 1.0))"
                ).alias("q"),
            )
            .collect()
        )
    }
    assert set(approx) == set(exact)
    for flag, a in approx.items():
        e = exact[flag]
        assert abs(a["approx_parts"] - e["nd"]) <= 0.05 * e["nd"], (
            flag, a["approx_parts"], e["nd"]
        )
        q = e["q"]
        for val, lo, hi in [
            (a["p50"], q[0], q[2]),
            (a["p95"], q[3], q[5]),
            (a["p99"], q[6], q[8]),
        ]:
            assert lo <= val <= hi, (flag, val, lo, hi)


# ---------------------------------------------------------------------------
# Iterative graph ops: explicit checkpoint/cache lifecycle (r5)
# ---------------------------------------------------------------------------
def test_connected_components_storage_lifecycle(spark):
    """Each round unpersists the previous round's checkpoint inline
    (bounded storage during the call: exactly the final round remains),
    and release_caches() drains that too. Results stay correct."""
    from sqlitedataframe_spark.operators.graph import connected_components
    from sqlitedataframe_spark.operators.util import (
        persistent_rdd_ids,
        release_caches,
    )

    release_caches()
    before = persistent_rdd_ids(spark)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20)], ["src", "dst"]
    )
    got = {
        r["node"]: r["comp"]
        for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}
    pinned = persistent_rdd_ids(spark) - before
    assert len(pinned) == 1, pinned  # only the FINAL round's checkpoint
    release_caches()
    assert not (persistent_rdd_ids(spark) - before)


def test_pagerank_storage_lifecycle(spark):
    from sqlitedataframe_spark.operators.graph import pagerank
    from sqlitedataframe_spark.operators.util import (
        persistent_rdd_ids,
        release_caches,
    )

    release_caches()
    before = persistent_rdd_ids(spark)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 3)], ["src", "dst"]
    )
    ranks = pagerank(edges, iterations=3)
    assert ranks.count() == 3
    pinned = persistent_rdd_ids(spark) - before
    assert len(pinned) == 1, pinned  # only the final iteration's cache
    release_caches()
    assert not (persistent_rdd_ids(spark) - before)
    # persist-based (lineage intact): still usable after release
    assert ranks.count() == 3
