"""Mergeable frequency sketches: count-min over a key column.

Why this matters at 100 TB: exact per-key counts of a high-cardinality key
shuffle one row per distinct key; a count-min sketch shuffles AT MOST
``depth x width`` rows per map partition no matter the input size (the
partial aggregation collapses each partition's contribution to the fixed
cell grid before the exchange), and sketches from different shards/days
merge by cell-wise addition without touching raw data again — the same
re-aggregation story as the HLL rollup.

Determinism: the row->cell hash is the md5-prefix integer (same recipe as
operators.sampling), so the sketch — and therefore every estimate — is a
pure function of the data, bit-identical across engines and reruns. This
makes the sketch EXACTLY oracle-checkable (rare for approximate
structures: the approximation is in the estimate-vs-truth gap, not in any
nondeterminism).

The reference (jackpal/SQLiteDataFrame) has no sketch surface; part of the
training-data pipeline extension (SURVEY Tier D).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cell(depth_col: Column, key_col: Column, width: int) -> Column:
    """Cell index of ``key`` under hash row ``depth``: md5('<d>:<key>')
    first-8-hex-digits mod width — portable to any engine with md5."""
    h8 = F.substring(
        F.md5(
            F.concat(
                depth_col.cast("string"), F.lit(":"), key_col.cast("string")
            ).cast("binary")
        ),
        1,
        8,
    )
    return F.conv(h8, 16, 10).cast("bigint") % width


def countmin_build(
    df: DataFrame, key: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build a count-min sketch of ``key`` occurrences ->
    ``(d, cell, c)`` rows (at most depth*width of them).

    Map-side the input is replicated ``depth`` times (one row per hash
    function), but the partial aggregation bounds what crosses the
    exchange at depth*width rows per partition — input-size-independent
    shuffle volume.
    """
    if depth < 1 or width < 1:
        raise ValueError(f"depth and width must be >= 1, got {depth}x{width}")
    exploded = df.select(
        F.col(key).alias("_k"),
        F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("d"),
    )
    return (
        exploded.select("d", _cell(F.col("d"), F.col("_k"), width).alias("cell"))
        .groupBy("d", "cell")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def countmin_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Frequency estimates for ``probes[key]`` from a built sketch:
    est(k) = min over hash rows of the k-cell's count (the classic
    count-min upper bound: est >= true, inflated only by collisions).

    The sketch is at most depth*width rows — broadcast it; the probe side
    stays distributed, so estimating millions of keys is map-side work.
    """
    p = probes.select(F.col(key).alias("_k")).distinct()
    expanded = p.select(
        "_k", F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("d")
    ).select("_k", "d", _cell(F.col("d"), F.col("_k"), width).alias("cell"))
    return (
        expanded.join(F.broadcast(sketch), on=["d", "cell"])
        .groupBy("_k")
        .agg(F.min("c").alias("cm_est"))
        .select(F.col("_k").alias(key), "cm_est")
    )


def countmin_merge(*sketches: DataFrame) -> DataFrame:
    """Merge count-min sketches built with the same (depth, width, hash):
    cell-wise addition. This is THE operational property at 100 TB — each
    shard/day/partition builds its sketch once, and any rollup (daily ->
    monthly, per-shard -> global) is an aggregation over at most
    depth*width rows per input sketch, never a second pass over raw data.
    """
    if not sketches:
        raise ValueError("need at least one sketch")
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy("d", "cell").agg(F.sum("c").alias("c"))
