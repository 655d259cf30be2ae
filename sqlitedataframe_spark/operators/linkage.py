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
    co-partitioned equi-join; the quadratic in-block term is further cut
    by EXACT length banding — ``lev(a, b) <= d`` implies
    ``|len(a) - len(b)| <= d``, so with band width ``d + 1`` every
    qualifying pair sits in the same or adjacent band. The probe side
    explodes to (band - 1, band), making the band part of the hash-join
    key: in-block work drops from ``|block|^2`` to
    ``~|block|^2 / #bands`` with zero recall loss (r6: 50x wall growth
    at 10x parts -> banding; the sf1 scale fixture repeats every p_name
    10x, so blocks grow linearly with the catalog exactly as TPC-H's
    fixed name vocabulary does). A cheap ``|len diff| <= d`` filter then
    skips the levenshtein evaluation for pairs banding admits but length
    rules out. ``id_a < id_b`` within a band plus lower-band-first
    orientation across bands keeps each unordered pair exactly once;
    output ids are normalized (least, greatest). Hot blocks at 100 TB:
    tighten the key (more prefix tokens) or cap with a per-block salt,
    exactly like skewed-join salting.
    """
    keys = [
        (F.col(c) if isinstance(c, str) else c).alias(f"_bk{i}")
        for i, c in enumerate(block_cols)
    ]
    w = max_distance + 1
    slim = df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_txt"), *keys
    ).withColumn("_band", F.floor(F.length("_txt") / w))
    bk = [f"_bk{i}" for i in range(len(block_cols))]
    a = slim.select(
        F.col("_id").alias("id_a"),
        F.col("_txt").alias("_txt_a"),
        F.col("_band").alias("_band_a"),
        F.col("_band").alias("_jband"),
        *bk,
    )
    b = slim.select(
        F.col("_id").alias("id_b"),
        F.col("_txt").alias("_txt_b"),
        F.col("_band").alias("_band_b"),
        F.explode(
            F.array(F.col("_band") - 1, F.col("_band"))
        ).alias("_jband"),
        *bk,
    )
    same_band = F.col("_band_b") == F.col("_band_a")
    keep_once = (same_band & (F.col("id_a") < F.col("id_b"))) | ~same_band
    len_ok = (
        F.abs(F.length("_txt_a") - F.length("_txt_b")) <= max_distance
    )
    lev = F.levenshtein("_txt_a", "_txt_b")
    return (
        a.join(b, on=bk + ["_jband"])
        .filter(keep_once & len_ok)
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            lev.alias("lev"),
        )
        .filter(F.col("lev") <= max_distance)
    )
