"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design:
- Exact dedup = hash-groupBy: one shuffle on the dedup key.
- MinHash/LSH: signatures are computed scan-side (pure Column expressions —
  no Python in the loop); candidate generation explodes (band_idx, band_hash)
  and self-joins on that compound key, so the shuffle carries only
  (doc_id, band keys) — never the text. Pair count is bounded by bucket
  collisions, the standard LSH cost model, instead of the O(n^2) cross join.
- SimHash: 64-bit signature scan-side; candidates via banded prefix equality
  (Hamming-distance pigeonhole: distance <= 3 over 4 bands of 16 bits
  guarantees one equal band).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sqlitedataframe_spark.operators.text import tokens
from sqlitedataframe_spark.operators.util import spread as _spread


# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------
def dedup_exact(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Keep the min-id representative per duplicate group (deterministic,
    unlike dropDuplicates' arbitrary winner). One shuffle on the key."""
    keep = df.groupBy(*cols).agg(F.min(id_col).alias(id_col))
    return df.join(keep, on=[*cols, id_col], how="left_semi")


# --------------------------------------------------------------------------
# Shingles & MinHash
# --------------------------------------------------------------------------
def shingles(text_col: Column | str, k: int = 3) -> Column:
    """k-token shingles (array<string>) of the text, distinct."""
    t = tokens(text_col)
    n = F.size(t)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(t, i, k), " "))
    )


def minhash_signatures(
    df: DataFrame, id_col: str, shingle_col: str, n_hashes: int = 64
) -> DataFrame:
    """MinHash signatures via explode + aggregate: one row per (id, shingle),
    ONE string hash per shingle (xxhash64), then n seeded long-input remixes
    ``xxhash64(seed_i, h)`` min-aggregated per id — the one-base-hash MinHash
    construction. Map-side partial mins mean the shuffle carries only
    n_hashes longs per id, and the per-row work is one string hash + n
    fixed-width long hashes — small codegen, no UDFs. (Affine ``a*h + b``
    remixes would be cheaper still but overflow under ANSI arithmetic.)"""
    exploded = df.select(F.col(id_col), F.explode(F.col(shingle_col)).alias("_s")).select(
        F.col(id_col), F.xxhash64("_s").alias("_h")
    )
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("_h"))).alias(f"_h{i}") for i in range(n_hashes)
    ]
    per_id = exploded.groupBy(id_col).agg(*aggs)
    return per_id.select(
        F.col(id_col), F.array(*[F.col(f"_h{i}") for i in range(n_hashes)]).alias("_sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH, with the
    estimated Jaccard (fraction of agreeing minhashes) attached and
    thresholded. Returns (id_a, id_b, est_jaccard), id_a < id_b."""
    rows_per_band = n_hashes // bands
    # spread BEFORE shingling so the (rare, local-only) repartition shuffles
    # raw text, not the ~3x-larger shingle arrays
    with_sh = (
        _spread(df.select(F.col(id_col).alias("_id"), F.col(text_col)), "_id")
        .select("_id", shingles(text_col, shingle_k).alias("_sh"))
        .filter(F.size("_sh") > 0)
    )
    # The signature table is consumed three times (banding + both sides of
    # the verify join); persist it so the shingle/hash pipeline runs once.
    # Size is ~(8 + 8*n_hashes) bytes/doc — the same state Spark ML's
    # MinHashLSH caches. Spills to disk if it outgrows memory.
    sig = minhash_signatures(with_sh, "_id", "_sh", n_hashes).persist()
    # Candidate generation on SLIM rows (id, band, bucket) only: the banded
    # self-join is the skew-prone step (a hot bucket yields quadratic pairs),
    # so the wide 64-long signature arrays must not ride through it — they
    # are re-attached per id afterwards with two ordinary hash joins.
    banded = sig.select(
        "_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.array_join(
                            F.transform(
                                F.slice(F.col("_sig"), b * rows_per_band + 1, rows_per_band),
                                lambda h: h.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sa = sig.select(F.col("_id").alias("id_a"), F.col("_sig").alias("sig_a"))
    sb = sig.select(F.col("_id").alias("id_b"), F.col("_sig").alias("sig_b"))
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                lambda v: v == 1,
            )
        ).cast("double")
        / F.lit(float(n_hashes))
    )
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("est_jaccard", F.round(est, 6))
        .filter(F.col("est_jaccard") >= min_jaccard)
        .select("id_a", "id_b", "est_jaccard")
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------
def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, bits: int = 64
) -> DataFrame:
    """SimHash signatures (bigint) via explode + aggregate: one row per
    (id, distinct token), hash each token once, then 64 per-bit vote sums
    per id. Partial aggregation keeps the shuffle at 64 longs per id; the
    sign vote and bit packing happen on the aggregated counts."""
    exploded = _spread(df, id_col).select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens(text_col))).alias("_t"),
    ).withColumn("_h", F.xxhash64("_t"))
    aggs = [F.count(F.lit(1)).alias("_n")] + [
        F.sum(F.shiftright(F.col("_h"), b).bitwiseAND(F.lit(1))).alias(f"_b{b}")
        for b in range(bits)
    ]
    per_id = exploded.groupBy(id_col).agg(*aggs)
    sig = F.lit(0).cast("bigint")
    for b in range(bits):
        vote = (F.col(f"_b{b}") * 2 > F.col("_n")).cast("bigint")
        # bit 63 is the sign bit in a 64-bit long: two's-complement value
        weight = (1 << b) if b < 63 else -(1 << 63)
        sig = sig + vote * F.lit(weight).cast("bigint")
    return per_id.select(F.col(id_col), sig.alias("_sig"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures via bit_count(xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs under SimHash Hamming distance, banded-LSH candidate
    generation (pigeonhole: <= bands-1 differing bits over `bands` bands ->
    at least one band equal). Full recall requires max_hamming <= bands-1;
    above that the banding is a heuristic filter. Returns
    (id_a, id_b, hamming)."""
    width = 64 // bands
    sig = simhash_signatures(
        df.select(F.col(id_col).alias("_id"), F.col(text_col)), "_id", text_col
    )
    banded = sig.select(
        "_id",
        "_sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("_sig"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "_sig", "bb.band", "bb.bucket")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            hamming64(F.col("a._sig"), F.col("b._sig")).cast("int").alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


# --------------------------------------------------------------------------
# Exact n-gram Jaccard (verification-grade, for candidate pairs)
# --------------------------------------------------------------------------
def jaccard_tokens(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two token-set columns (array<string>)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
