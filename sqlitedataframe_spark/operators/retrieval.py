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


def mmr_rerank(
    cand: DataFrame,
    sims: DataFrame,
    id_col: str,
    rel_col: str,
    k: int = 5,
    lam: float = 0.7,
    round_dp: int = 6,
) -> DataFrame:
    """Maximal Marginal Relevance re-rank (Carbonell & Goldstein 1998):
    greedily pick ``k`` items maximizing ``lam * relevance - (1 - lam) *
    max_similarity_to_already_selected`` — the standard diversity
    re-rank over a retriever's candidate list (RAG context packing,
    dedup-aware search results, diverse few-shot example selection).

    ``cand`` is the k-bounded candidate list (id, relevance); ``sims``
    holds pairwise similarities (id_a, id_b, sim) over those candidates
    — both bounded by the upstream retriever's top-n, so every frame
    here is tiny BY CONSTRUCTION; the expensive work (scoring the
    corpus, the top-n cut) already happened distributedly upstream.

    The greedy loop is inherently sequential in ``k``; it runs as ``k``
    chained Spark steps (anti-join remaining, max-sim-to-selected
    aggregate, 1-row top pick) with NO driver-side collect — the loop
    builds one lazy plan whose every frame is candidate-bounded.
    Relevance and similarities must arrive pre-rounded so the argmax
    order (score DESC, id ASC) is engine-reproducible.
    """
    c = cand.select(F.col(id_col).alias("_id"), F.col(rel_col).alias("_rel"))
    s = sims.select(
        F.col(sims.columns[0]).alias("_ia"),
        F.col(sims.columns[1]).alias("_ib"),
        F.col(sims.columns[2]).alias("_sim"),
    )
    first = (
        c.orderBy(F.col("_rel").desc(), F.col("_id"))
        .limit(1)
        .select(
            "_id",
            F.lit(1).alias("rank"),
            F.col("_rel"),
            F.round(F.lit(lam) * F.col("_rel"), round_dp).alias("mmr"),
        )
    )
    selected = first
    for step in range(2, k + 1):
        remaining = c.join(selected.select("_id"), "_id", "left_anti")
        # max similarity of each remaining candidate to the selected set
        penal = (
            remaining.join(
                s, (F.col("_ia") == F.col("_id")), "inner"
            )
            .join(
                selected.select(F.col("_id").alias("_sel")),
                F.col("_ib") == F.col("_sel"),
                "inner",
            )
            .groupBy("_id", "_rel")
            .agg(F.max("_sim").alias("_msim"))
        )
        pick = (
            penal.select(
                "_id",
                F.lit(step).alias("rank"),
                "_rel",
                F.round(
                    F.lit(lam) * F.col("_rel")
                    - F.lit(1.0 - lam) * F.col("_msim"),
                    round_dp,
                ).alias("mmr"),
            )
            .orderBy(F.col("mmr").desc(), F.col("_id"))
            .limit(1)
        )
        selected = selected.unionByName(pick)
    return selected.select(
        F.col("rank"),
        F.col("_id").alias(id_col),
        F.col("_rel").alias(rel_col),
        F.col("mmr"),
    ).orderBy("rank")
