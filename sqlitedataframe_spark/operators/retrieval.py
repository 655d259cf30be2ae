"""Retrieval-fusion operators: reciprocal-rank fusion of heterogeneous
rankings (lexical BM25 + embedding cosine = "hybrid search").

The reference (jackpal/SQLiteDataFrame) has no retrieval surface; this is
a Tier-D extension in the training-data-pipeline family: RAG retrieval,
hard-negative mining, and eval-set construction all fuse a lexical and a
semantic ranking, and RRF (Cormack/Clarke/Buettcher 2009) is the standard
score-free fusion rule: rrf(d) = sum_r 1 / (k0 + rank_r(d)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str,
    score_col: str,
    k0: int = 60,
    k: int = 20,
    round_dp: int = 6,
) -> DataFrame:
    """Fuse N candidate rankings into one list by reciprocal-rank fusion.

    Each input DataFrame is one retriever's candidate list: (id, score),
    already cut to its own top-n (a bounded set — TakeOrderedAndProject
    upstream, never a global sort of the corpus). Ranks are assigned per
    retriever over (score DESC, id ASC) — scores are pre-rounded by the
    caller so the order is engine-reproducible — and the fused score is
    ``sum_r 1/(k0 + rank_r)``, missing-from-a-list contributing nothing
    (the standard RRF convention).

    Scale shape: the expensive part is the upstream retrievers; fusion
    itself touches only ``N x top_n`` rows. The per-retriever rank window
    partitions by the retriever tag (bounded rows per partition = the
    retriever's own top-n), then one tiny groupBy on the id fuses. No
    global window, no join of the corpora.
    """
    tagged = None
    for i, r in enumerate(rankings):
        t = r.select(
            F.lit(i).alias("_retriever"),
            F.col(id_col).alias("_id"),
            F.col(score_col).alias("_score"),
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    w = Window.partitionBy("_retriever").orderBy(
        F.col("_score").desc(), F.col("_id").asc()
    )
    ranked = tagged.withColumn("_rank", F.row_number().over(w))
    return (
        ranked.groupBy(F.col("_id").alias(id_col))
        .agg(
            F.round(
                F.sum(F.lit(1.0) / (F.lit(float(k0)) + F.col("_rank"))), round_dp
            ).alias("rrf"),
            F.count(F.lit(1)).cast("bigint").alias("n_lists"),
        )
        .orderBy(F.col("rrf").desc(), F.col(id_col))
        .limit(k)
    )
