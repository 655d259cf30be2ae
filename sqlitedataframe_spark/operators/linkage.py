"""Entity resolution / record linkage: blocked fuzzy-matching joins.

The all-pairs similarity join is quadratic and never runs at 100 TB; the
standard shape is **blocking**: derive a cheap deterministic blocking key,
equi-join on it (hash exchange, co-partitioned), and run the expensive
string metric only inside blocks. Recall is controlled by the blocking
key's design (multiple passes with different keys union-ed, at scale), cost
by the block-size distribution — both knobs are explicit here.

The reference (jackpal/SQLiteDataFrame) has no linkage surface; this module
is part of the training-data pipeline extension (SURVEY Tier D) — the same
shape dedups near-identical titles/authors/URLs in web-corpus curation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_levenshtein_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str | Column],
    max_distance: int,
) -> DataFrame:
    """Candidate duplicate pairs ``(id_a, id_b, lev)`` with
    ``levenshtein <= max_distance``, compared only within blocks.

    Plan shape: one hash exchange per side on the blocking key, then a
    co-partitioned equi-join; ``id_a < id_b`` keeps each unordered pair
    once and drops self-pairs. ``levenshtein`` runs JVM-side (whole-stage
    codegen) on block-local pairs only — the quadratic term is bounded by
    the largest block, which the caller controls via the key. Hot blocks
    at 100 TB: tighten the key (add a length band / more prefix tokens)
    or cap with a per-block salt, exactly like skewed-join salting.
    """
    keys = [
        (F.col(c) if isinstance(c, str) else c).alias(f"_bk{i}")
        for i, c in enumerate(block_cols)
    ]
    slim = df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_txt"), *keys
    )
    bk = [f"_bk{i}" for i in range(len(block_cols))]
    a = slim.select(
        F.col("_id").alias("id_a"), F.col("_txt").alias("_txt_a"), *bk
    )
    b = slim.select(
        F.col("_id").alias("id_b"), F.col("_txt").alias("_txt_b"), *bk
    )
    lev = F.levenshtein("_txt_a", "_txt_b")
    return (
        a.join(b, on=bk)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", lev.alias("lev"))
        .filter(F.col("lev") <= max_distance)
    )
