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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _salt8(col: Column) -> Column:
    """Portable non-negative 32-bit hash of a key: first 8 hex digits of
    md5 of the decimal/string rendering. Any engine reproduces it
    (DuckDB: ``CAST('0x' || substr(md5(CAST(id AS VARCHAR)),1,8) AS
    BIGINT)``) — the same portability recipe the sampling family uses."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )


def blocked_levenshtein_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str | Column],
    max_distance: int,
    max_block: int | None = 1000,
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
    output ids are normalized (least, greatest).

    Skew guard (VERDICT r6 #1 — automatic, like dedup's
    ``_suppress_hot_buckets``): a block of ``n`` rows emits O(n^2)
    comparisons, so one skewed blocking key (a boilerplate title, a
    default name) goes quadratic at 100 TB no matter how good the
    average is. Blocks larger than ``max_block`` are SUB-SPLIT by a
    deterministic portable salt: each row gets
    ``salt = md5_32(id) % ceil(block_n / max_block)`` and only same-salt
    rows are compared, bounding in-block work to ~``n * max_block``
    comparisons (linear in n) instead of n^2. Unlike whole-block
    suppression this keeps ~``1/n_sub`` of the oversized block's recall
    (pairs landing in the same sub-block) rather than zero; blocks at or
    under ``max_block`` have ``n_sub = 1`` — salt 0 on every row — and
    are COMPLETELY unaffected, so the guard only engages where the
    quadratic would. What is dropped is deterministic and replayable:
    the salt is a pure function of (id, block size), so an exact SQL
    oracle reproduces the capped result bit-for-bit (the suite oracle
    does). The block-count window shuffles on the same blocking key as
    the pair join — ReuseExchange shares the exchange. ``None`` disables
    the guard (pre-r7 behavior).
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
    if max_block is not None:
        if max_block < 1:
            raise ValueError(f"max_block must be >= 1, got {max_block}")
        bw = Window.partitionBy(*bk)
        n_sub = F.ceil(
            F.count(F.lit(1)).over(bw) / F.lit(float(max_block))
        ).cast("bigint")
        slim = slim.withColumn("_salt", _salt8(F.col("_id")) % n_sub)
    else:
        slim = slim.withColumn("_salt", F.lit(0).cast("bigint"))
    jk = bk + ["_salt"]
    a = slim.select(
        F.col("_id").alias("id_a"),
        F.col("_txt").alias("_txt_a"),
        F.col("_band").alias("_band_a"),
        F.col("_band").alias("_jband"),
        *jk,
    )
    b = slim.select(
        F.col("_id").alias("id_b"),
        F.col("_txt").alias("_txt_b"),
        F.col("_band").alias("_band_b"),
        F.explode(
            F.array(F.col("_band") - 1, F.col("_band"))
        ).alias("_jband"),
        *jk,
    )
    same_band = F.col("_band_b") == F.col("_band_a")
    keep_once = (same_band & (F.col("id_a") < F.col("id_b"))) | ~same_band
    len_ok = (
        F.abs(F.length("_txt_a") - F.length("_txt_b")) <= max_distance
    )
    lev = F.levenshtein("_txt_a", "_txt_b")
    return (
        a.join(b, on=jk + ["_jband"])
        .filter(keep_once & len_ok)
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            lev.alias("lev"),
        )
        .filter(F.col("lev") <= max_distance)
    )


def blocked_pair_budget(
    df: DataFrame,
    block_cols: list[str | Column],
    max_block: int | None = 1000,
) -> DataFrame:
    """Observability companion to ``blocked_levenshtein_pairs`` — the
    "report what was dropped" half of the skew-guard policy: per-block
    row count, sub-split factor, raw pair budget (n*(n-1)/2), capped
    pair budget (sum over sub-blocks), and the pairs forgone by the
    salt. Run it BEFORE a big linkage job to see where the cap engages
    and how much recall it costs — one groupBy on the blocking key."""
    keys = [
        (F.col(c) if isinstance(c, str) else c).alias(f"_bk{i}")
        for i, c in enumerate(block_cols)
    ]
    bk = [f"_bk{i}" for i in range(len(block_cols))]
    n = F.col("block_n")
    raw = (n * (n - 1) / 2).cast("bigint")
    if max_block is None:
        n_sub = F.lit(1).cast("bigint")
    else:
        n_sub = F.ceil(n / F.lit(float(max_block))).cast("bigint")
    # sub-blocks are hash-balanced: bound the capped budget with the
    # even-split count (floor/ceil mix); exact enough for planning.
    per = (n / n_sub).cast("double")
    capped = (n_sub * (per * (per - 1) / 2)).cast("bigint")
    return (
        df.select(*keys)
        .groupBy(*bk)
        .agg(F.count(F.lit(1)).cast("bigint").alias("block_n"))
        .select(
            *bk,
            "block_n",
            n_sub.alias("n_sub"),
            raw.alias("raw_pairs"),
            capped.alias("capped_pairs"),
            (raw - capped).cast("bigint").alias("pairs_forgone"),
        )
    )
