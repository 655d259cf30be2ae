"""Round-9 wave: exact Kendall's tau-b via the contingency-grid pair
count (the rank-stats family's missing member); cross-encoder rerank
data prep (the pointwise feature table over the hybrid BM25 + cosine
candidate pool) and retriever rank agreement; LCS span estimates for
LSH candidate pairs (diagonal anchor runs — the suffix-automaton-free
ExactSubstr upgrade); per-source diagonal embedding whitening
parameters; all-but-the-top principal-direction projections; and a
two-Poisson rate-shift monitor.

Every float output derives from exact integer (DECIMAL(38,0) ⇄
HUGEINT) sums or fixed-order array folds, and every signed statistic
carries the `ROUND(...) + 0.0` signed-zero convention (the welch
r7/r8 lesson) from birth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlitedataframe_spark.operators import dedup as D
from sqlitedataframe_spark.operators.profiling import (
    inclusion_deps,
    kendall_tau_by_group,
    poisson_rate_shift,
)
from sqlitedataframe_spark.operators.relational import price_index_pairs
from sqlitedataframe_spark.operators.similarity import (
    abtt_projections,
    brute_force_topk,
    ivf_recall,
    whitening_params,
)
from sqlitedataframe_spark.operators.text import bm25_topk, tokens
from sqlitedataframe_spark.suite import query
from sqlitedataframe_spark.suite.pipeline import (
    MH_EST_CTE,
    shared_doc_banded,
    shared_doc_sigs,
)
from sqlitedataframe_spark.suite.pipeline4 import _PCA_ITER
from sqlitedataframe_spark.suite.pipeline6 import BM25_QUERY_TERMS
from sqlitedataframe_spark.suite.pipeline7 import _BM25_TOP50, _COS_TOP50
from sqlitedataframe_spark.suite.relational import T


# ---------------------------------------------------------------------------
# Exact Kendall's tau-b per group (contingency-grid pair counting).
# ---------------------------------------------------------------------------
@query(
    "lineitem_kendall_tau",
    oracle="""
    WITH base AS (
      SELECT l_returnflag AS g,
             CAST(l_quantity AS BIGINT) AS x,
             CAST(ROUND(l_discount * 100) AS BIGINT) AS y
      FROM lineitem),
    cells AS (
      SELECT g, x, y, CAST(COUNT(*) AS BIGINT) AS n
      FROM base GROUP BY 1, 2, 3),
    pr AS (
      SELECT a.g,
             SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0
                      THEN CAST(a.n AS HUGEINT) * b.n ELSE 0 END) AS c,
             SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) < 0
                      THEN CAST(a.n AS HUGEINT) * b.n ELSE 0 END) AS d
      FROM cells a JOIN cells b
        ON a.g = b.g AND (a.x < b.x OR (a.x = b.x AND a.y < b.y))
      GROUP BY 1),
    nt AS (SELECT g, CAST(SUM(n) AS BIGINT) AS nn FROM cells GROUP BY 1),
    tx AS (
      SELECT g, SUM(CAST(t AS HUGEINT) * (t - 1) / 2) AS n1
      FROM (SELECT g, x, CAST(SUM(n) AS BIGINT) AS t
            FROM cells GROUP BY 1, 2) GROUP BY 1),
    uy AS (
      SELECT g, SUM(CAST(u AS HUGEINT) * (u - 1) / 2) AS n2
      FROM (SELECT g, y, CAST(SUM(n) AS BIGINT) AS u
            FROM cells GROUP BY 1, 2) GROUP BY 1),
    f AS (
      SELECT nt.g, nn,
             COALESCE(pr.c, 0) AS c, COALESCE(pr.d, 0) AS d,
             tx.n1, uy.n2,
             CAST(nn AS HUGEINT) * (nn - 1) / 2 AS n0
      FROM nt LEFT JOIN pr ON nt.g = pr.g
      JOIN tx ON nt.g = tx.g JOIN uy ON nt.g = uy.g)
    SELECT g AS l_returnflag, nn AS n,
           CAST(c - d AS BIGINT) AS c_minus_d,
           ROUND(CASE WHEN sqrt(CAST(n0 - n1 AS DOUBLE)
                                * CAST(n0 - n2 AS DOUBLE)) > 0
                 THEN CAST(c - d AS DOUBLE)
                      / sqrt(CAST(n0 - n1 AS DOUBLE)
                             * CAST(n0 - n2 AS DOUBLE)) END + 1e-9, 6) + 0.0
             AS tau_b
    FROM f ORDER BY l_returnflag
    """,
)
def lineitem_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Kendall's tau-b of quantity vs discount bucket per return
    flag — the concordance statistic of record for small-grid ordinal
    data, where Spearman's midranks wash out.

    operators.profiling.kendall_tau_by_group: one map-side collapse to
    per-(group, x, y) contingency cells (bounded by the value GRID, not
    the row count), one group-keyed equi-join over the tiny cell frame
    classifying every cell pair, DECIMAL(38,0) exact pair counts,
    double only in the final closed form.
    """
    li = T(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("disc100"),
    )
    return kendall_tau_by_group(li, "l_returnflag", "qty", "disc100")


# ---------------------------------------------------------------------------
# Retriever rank agreement: Kendall tau between BM25 and cosine rankings.
# ---------------------------------------------------------------------------
@query(
    "retrieval_rank_agreement",
    oracle=f"""
    WITH {_BM25_TOP50},
    {_COS_TOP50},
    lr AS (
      SELECT id, ROW_NUMBER() OVER (ORDER BY score DESC, id) AS rl
      FROM lex),
    sr AS (
      SELECT id, ROW_NUMBER() OVER (ORDER BY score DESC, id) AS rs
      FROM sem),
    b AS (
      SELECT CAST(1 AS BIGINT) AS g, lr.rl AS x, sr.rs AS y
      FROM lr JOIN sr USING (id)),
    cells AS (
      SELECT g, x, y, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY 1, 2, 3),
    pr AS (
      SELECT a.g,
             SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0
                      THEN CAST(a.n AS HUGEINT) * b.n ELSE 0 END) AS c,
             SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) < 0
                      THEN CAST(a.n AS HUGEINT) * b.n ELSE 0 END) AS d
      FROM cells a JOIN cells b
        ON a.g = b.g AND (a.x < b.x OR (a.x = b.x AND a.y < b.y))
      GROUP BY 1),
    nt AS (SELECT g, CAST(SUM(n) AS BIGINT) AS nn FROM cells GROUP BY 1),
    tx AS (
      SELECT g, SUM(CAST(t AS HUGEINT) * (t - 1) / 2) AS n1
      FROM (SELECT g, x, CAST(SUM(n) AS BIGINT) AS t
            FROM cells GROUP BY 1, 2) GROUP BY 1),
    uy AS (
      SELECT g, SUM(CAST(u AS HUGEINT) * (u - 1) / 2) AS n2
      FROM (SELECT g, y, CAST(SUM(n) AS BIGINT) AS u
            FROM cells GROUP BY 1, 2) GROUP BY 1),
    f AS (
      SELECT nt.g, nn,
             COALESCE(pr.c, 0) AS c, COALESCE(pr.d, 0) AS d,
             tx.n1, uy.n2,
             CAST(nn AS HUGEINT) * (nn - 1) / 2 AS n0
      FROM nt LEFT JOIN pr ON nt.g = pr.g
      JOIN tx ON nt.g = tx.g JOIN uy ON nt.g = uy.g)
    SELECT nn AS n,
           CAST(c - d AS BIGINT) AS c_minus_d,
           ROUND(CASE WHEN sqrt(CAST(n0 - n1 AS DOUBLE)
                                * CAST(n0 - n2 AS DOUBLE)) > 0
                 THEN CAST(c - d AS DOUBLE)
                      / sqrt(CAST(n0 - n1 AS DOUBLE)
                             * CAST(n0 - n2 AS DOUBLE)) END + 1e-9, 6) + 0.0
             AS tau_b
    FROM f
    """,
)
def retrieval_rank_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau between the BM25 and cosine rankings over their shared
    top-50 candidates — the retriever-diversity readout that decides
    whether hybrid fusion adds signal (tau near 1 = the retrievers are
    redundant; near 0 = genuinely complementary evidence).

    Reuses operators.profiling.kendall_tau_by_group over the inner-joined
    rank pairs (<= 50 rows, all ranks distinct): both retrievers are
    k-bounded TakeOrderedAndProject lists, ranks assign per retriever
    over pre-rounded scores, and the tau machinery is the same exact
    integer pair count as lineitem_kendall_tau.
    """
    docs = T(spark, sf_dir, "documents")
    emb = T(spark, sf_dir, "embeddings")
    lex = bm25_topk(docs, BM25_QUERY_TERMS, k=50).select(
        F.col("doc_id").alias("id"), F.col("bm25").alias("score")
    )
    qdf = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    sem = brute_force_topk(emb, qdf, k=50).select(
        F.col("vec_id").alias("id"), F.col("cos_sim").alias("score")
    )
    from pyspark.sql import Window

    # rank via ONE window PARTITIONED by the retriever tag over the union
    # (the rrf_fuse pattern): partitionBy(lit(0)) constant-folds to an
    # unpartitioned window in the physical plan — the audit-banned shape
    u = lex.select(F.lit(0).alias("r"), "id", "score").unionByName(
        sem.select(F.lit(1).alias("r"), "id", "score")
    )
    rk = u.withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("r").orderBy(F.desc("score"), "id")
        ),
    )
    lr = rk.filter(F.col("r") == 0).select("id", F.col("rnk").alias("rl"))
    sr = rk.filter(F.col("r") == 1).select("id", F.col("rnk").alias("rs"))
    joined = lr.join(sr, "id").select(
        F.lit(1).cast("bigint").alias("g"), "rl", "rs"
    )
    return kendall_tau_by_group(joined, "g", "rl", "rs").drop("g")


# ---------------------------------------------------------------------------
# Cross-encoder rerank data prep: pointwise features for hybrid candidates.
# ---------------------------------------------------------------------------
@query(
    "retrieval_rerank_features",
    oracle=f"""
    WITH {_BM25_TOP50},
    {_COS_TOP50},
    lr AS (
      SELECT id, score AS bm25,
             ROW_NUMBER() OVER (ORDER BY score DESC, id) AS lex_rank
      FROM lex),
    sr AS (
      SELECT id, score AS cos_sim,
             ROW_NUMBER() OVER (ORDER BY score DESC, id) AS sem_rank
      FROM sem),
    cand AS (
      SELECT COALESCE(lr.id, sr.id) AS id,
             lr.bm25, CAST(lr.lex_rank AS BIGINT) AS lex_rank,
             sr.cos_sim, CAST(sr.sem_rank AS BIGINT) AS sem_rank
      FROM lr FULL OUTER JOIN sr ON lr.id = sr.id),
    feats AS (
      SELECT doc_id AS id, CAST(dl AS BIGINT) AS n_tokens,
             CAST((CASE WHEN tfs[1] > 0 THEN 1 ELSE 0 END)
                  + (CASE WHEN tfs[2] > 0 THEN 1 ELSE 0 END)
                  + (CASE WHEN tfs[3] > 0 THEN 1 ELSE 0 END) AS INT)
               AS n_query_hits
      FROM bmbase)
    SELECT cand.id AS doc_id, bm25, lex_rank, cos_sim, sem_rank,
           n_tokens, n_query_hits,
           ROUND(COALESCE(1.0 / (60.0 + lex_rank), 0.0)
                 + COALESCE(1.0 / (60.0 + sem_rank), 0.0), 6) AS rrf,
           (lex_rank IS NOT NULL AND sem_rank IS NOT NULL) AS in_both
    FROM cand JOIN feats ON feats.id = cand.id
    ORDER BY rrf DESC, doc_id
    """,
)
def retrieval_rerank_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-encoder/LTR rerank DATA PREP: the pointwise feature table
    over the hybrid candidate pool (BM25 top-50 ∪ cosine top-50) — per
    candidate, both retrievers' scores and ranks, the RRF prior, doc
    length, and query-term coverage. This is exactly the frame a
    reranker trains/scorse on; producing it is the pipeline stage, the
    model itself is out of scope (and out of SQL).

    Plan shape: both candidate lists are k-bounded
    TakeOrderedAndProject (the corpus is never globally sorted), ranks
    assign per retriever over <= 50-row partitions, the outer join and
    the documents join key on the candidate ids (a <= 100-row broadcast
    side against the scan), so the only data-sized work is the two
    retriever passes already benchmarked in retrieval_rrf_hybrid.
    """
    from pyspark.sql import Window

    docs = T(spark, sf_dir, "documents")
    emb = T(spark, sf_dir, "embeddings")
    lex = bm25_topk(docs, BM25_QUERY_TERMS, k=50).select(
        F.col("doc_id").alias("id"), F.col("bm25")
    )
    qdf = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    sem = brute_force_topk(emb, qdf, k=50).select(
        F.col("vec_id").alias("id"), F.col("cos_sim")
    )
    # rank with one window PARTITIONED by the retriever tag over the union
    # (partitionBy(lit(0)) would constant-fold to a global window)
    u = lex.select(
        F.lit(0).alias("r"), "id", F.col("bm25").alias("score")
    ).unionByName(
        sem.select(F.lit(1).alias("r"), "id", F.col("cos_sim").alias("score"))
    )
    rk = u.withColumn(
        "rnk",
        F.row_number()
        .over(Window.partitionBy("r").orderBy(F.desc("score"), "id"))
        .cast("bigint"),
    )
    lr = rk.filter(F.col("r") == 0).select(
        "id", F.col("score").alias("bm25"), F.col("rnk").alias("lex_rank")
    )
    sr = rk.filter(F.col("r") == 1).select(
        "id", F.col("score").alias("cos_sim"), F.col("rnk").alias("sem_rank")
    )
    cand = lr.join(sr, "id", "full_outer")
    t = tokens("text")
    qhits = None
    for term in BM25_QUERY_TERMS:
        h = (F.size(F.filter(t, lambda tok: tok == F.lit(term))) > 0).cast("int")
        qhits = h if qhits is None else qhits + h
    feats = docs.select(
        F.col("doc_id").alias("id"),
        F.size(t).cast("bigint").alias("n_tokens"),
        qhits.cast("int").alias("n_query_hits"),
    )
    rrf = F.round(
        F.coalesce(1.0 / (60.0 + F.col("lex_rank")), F.lit(0.0))
        + F.coalesce(1.0 / (60.0 + F.col("sem_rank")), F.lit(0.0)),
        6,
    )
    return (
        cand.join(feats, "id")
        .select(
            F.col("id").alias("doc_id"),
            "bm25",
            "lex_rank",
            "cos_sim",
            "sem_rank",
            "n_tokens",
            "n_query_hits",
            rrf.alias("rrf"),
            (F.col("lex_rank").isNotNull() & F.col("sem_rank").isNotNull()).alias(
                "in_both"
            ),
        )
        .orderBy(F.desc("rrf"), "doc_id")
    )


# ---------------------------------------------------------------------------
# LCS span estimates for LSH candidate pairs (diagonal anchor runs).
# ---------------------------------------------------------------------------
#: CTE chain (appended to MH_EST_CTE) ending in ``spanstats`` = the
#: per-candidate-pair LCS span evidence table. Shared by dedup_lcs_spans
#: and the r10 span-cluster rollup (pipeline16.dedup_span_clusters).
LCS_SPANS_CTES = """,
    prs AS (SELECT id_a, id_b FROM est WHERE est_jaccard >= 0.3),
    pids AS (SELECT id_a AS id FROM prs UNION SELECT id_b FROM prs),
    d2 AS (
      SELECT doc_id, text FROM documents
      WHERE length(text) >= 30 AND doc_id IN (SELECT id FROM pids)),
    shg AS (
      SELECT doc_id, i AS pos, md5(substr(text, i, 30)) AS h
      FROM d2, UNNEST(generate_series(1, length(text) - 29, 10)) AS r(i)),
    anch AS (
      SELECT p.id_a, p.id_b, sa.pos AS pa, sa.pos - sb.pos AS diag
      FROM prs p
      JOIN shg sa ON sa.doc_id = p.id_a
      JOIN shg sb ON sb.doc_id = p.id_b AND sb.h = sa.h),
    rn AS (
      SELECT id_a, id_b, diag,
             pa - 10 * ROW_NUMBER() OVER (PARTITION BY id_a, id_b, diag
                                          ORDER BY pa) AS grp
      FROM anch),
    runs AS (
      SELECT id_a, id_b, diag, grp, CAST(COUNT(*) AS BIGINT) AS run
      FROM rn GROUP BY 1, 2, 3, 4),
    per AS (
      SELECT id_a, id_b,
             CAST(SUM(run) AS BIGINT) AS n_anchors,
             CAST(COUNT(DISTINCT diag) AS BIGINT) AS n_diags,
             CAST(30 + (MAX(run) - 1) * 10 AS BIGINT) AS lcs_est
      FROM runs GROUP BY 1, 2),
    lens AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS len FROM documents),
    spanstats AS (
      SELECT p.id_a, p.id_b, n_anchors, n_diags, lcs_est,
             ROUND(CAST(lcs_est AS DOUBLE) / LEAST(la.len, lb.len) + 1e-9, 4)
               AS lcs_ratio
      FROM per p
      JOIN lens la ON la.doc_id = p.id_a
      JOIN lens lb ON lb.doc_id = p.id_b)
"""


def shared_lcs_spanstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-candidate-pair LCS span-stats table at the default params
    (min_jaccard=0.3, k=30, stride=10), built ONCE per (app, sf_dir) via
    the keyed shared cache: dedup_lcs_spans and the r10
    dedup_span_clusters consume exactly this frame, and it is
    pair-stats-sized (five ints + a ratio per surviving candidate pair),
    never text-sized — the signature-table precedent."""
    from sqlitedataframe_spark.operators.util import shared_eager_cache

    def build() -> DataFrame:
        from sqlitedataframe_spark.operators.util import register_cache

        d = T(spark, sf_dir, "documents")
        # r12: lazily persisted — lcs_span_stats reads the pair frame
        # twice (id population + anchor fan-out); unpersisted, the banded
        # join + verify ran twice inside this one build
        pairs = register_cache(
            D.minhash_lsh_pairs(
                d,
                min_jaccard=0.3,
                sig=shared_doc_sigs(spark, sf_dir),
                banded=shared_doc_banded(spark, sf_dir),
            )
            .select("id_a", "id_b")
            .persist()
        )
        stats = D.lcs_span_stats(d, pairs, k=30, stride=10)
        # r12: truncate lineage BEFORE the shared persist. The stats plan
        # embeds the banded-join + shingle subtrees (now with their own
        # persisted frames), and every consumer action re-optimized that
        # ~800 KB tree — dedup_span_clusters' CC (one optimize per round)
        # measured 6.4 -> 12.7 s when the nested persists landed.
        # localCheckpoint collapses the shared frame's plan to a
        # LogicalRDD (disk-backed blocks); shared_eager_cache's delta
        # capture marks the blocks shared, so the per-query RDD sweep
        # leaves them alone, exactly like the persist it wraps.
        return stats.localCheckpoint(eager=True)

    return shared_eager_cache(
        spark, ("lcs_spanstats", sf_dir, 0.3, 30, 10), build
    )


@query(
    "dedup_lcs_spans",
    oracle=MH_EST_CTE + LCS_SPANS_CTES + """
    SELECT id_a, id_b, n_anchors, n_diags, lcs_est, lcs_ratio
    FROM spanstats
    ORDER BY id_a, id_b
    """,
)
def dedup_lcs_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-common-substring estimates for the MinHash-LSH candidate
    pairs: diagonal runs of stride-consecutive matching 30-char windows
    upgrade "these two resemble each other" into "they share one
    contiguous ~N-char span" — the quote/boilerplate vs true-rewrite
    discriminator ExactSubstr dedup acts on.

    operators.dedup.lcs_span_stats over the SAME candidate pairs as
    dedup_minhash_lsh (shared persisted signature table); shingles
    hash map-side and semi-join to the pair population, anchors key on
    (id, digest), run detection is pos - stride*row_number per
    (pair, diagonal) — bounded window partitions, exact integers
    throughout, one final ratio division. The stats table is built once
    per session and shared with dedup_span_clusters
    (shared_lcs_spanstats, r10).
    """
    return shared_lcs_spanstats(spark, sf_dir).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# Per-source diagonal whitening parameters.
# ---------------------------------------------------------------------------
@query(
    "embed_source_whitening",
    oracle="""
    WITH j AS (
      SELECT d.source AS g, e.embedding::DOUBLE[] AS v
      FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id),
    ex AS (
      SELECT g, t.i AS dim,
             CAST(ROUND(v[t.i + 1] * 1000000) AS BIGINT) AS xi
      FROM j, UNNEST(generate_series(0, 63)) AS t(i)),
    cells AS (
      SELECT g, dim, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(xi AS HUGEINT)) AS s,
             SUM(CAST(xi AS HUGEINT) * xi) AS q
      FROM ex GROUP BY 1, 2),
    c2 AS (SELECT *, q * n - s * s AS vnum FROM cells),
    tot AS (SELECT g, SUM(vnum) AS vtot FROM c2 GROUP BY 1)
    SELECT c2.g AS source, CAST(dim AS INT) AS dim, n,
           ROUND(CAST(s AS DOUBLE) / 1000000 / n + 1e-9, 6) + 0.0 AS mean,
           ROUND(sqrt(CAST(vnum AS DOUBLE) / 1e12
                      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                 + 1e-9, 6) AS sd,
           ROUND(CAST(vnum AS DOUBLE) / CAST(vtot AS DOUBLE) + 1e-9, 6)
             AS var_share
    FROM c2 JOIN tot USING (g)
    ORDER BY source, dim
    """,
)
def embed_source_whitening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source diagonal whitening parameter table (mean/sd/variance
    share per dimension) — the broadcastable model that normalizes each
    feed's embedding cloud before cross-source mixing, and the
    anisotropy diagnostic (a dimension's var_share far above 1/64 =
    one rogue axis dominating a feed).

    operators.similarity.whitening_params: coordinates quantize once to
    integers, per-(source, dim) moments accumulate in DECIMAL(38,0)
    (map-side combine to #sources*64 cells), variance numerators stay
    EXACT integers through the share ratio — drift-proof end to end.
    """
    emb = T(spark, sf_dir, "embeddings")
    src = T(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), "source"
    )
    joined = emb.join(src, "vec_id").select("source", "embedding")
    return whitening_params(joined, "source")


# ---------------------------------------------------------------------------
# All-but-the-top principal-direction projections.
# ---------------------------------------------------------------------------
@query(
    "embed_abtt_projections",
    oracle=f"""
    WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
    cells AS (
      SELECT ii.i AS i, jj.j AS j,
             ROUND(SUM(e.v[ii.i + 1] * e.v[jj.j + 1]), 3) AS c
      FROM e,
           UNNEST(generate_series(0, 63)) ii(i),
           UNNEST(generate_series(0, 63)) jj(j)
      GROUP BY ii.i, jj.j),
    v0 AS (SELECT t.j, CAST(0.125 AS DOUBLE) AS val
           FROM UNNEST(generate_series(0, 63)) t(j)),
    {_PCA_ITER.format(n=1, p=0)},
    {_PCA_ITER.format(n=2, p=1)},
    {_PCA_ITER.format(n=3, p=2)},
    u AS (SELECT list(val ORDER BY j) AS u FROM v3),
    sc AS (
      SELECT vec_id,
             list_dot_product(embedding::DOUBLE[], u.u) AS proj,
             list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS n2
      FROM embeddings, u)
    SELECT vec_id,
           ROUND(proj + 1e-9, 6) + 0.0 AS proj,
           ROUND(sqrt(GREATEST(0.0, n2 - proj * proj)) + 1e-9, 6)
             AS resid_norm
    FROM sc
    ORDER BY ROUND(abs(proj) + 1e-9, 6) DESC, vec_id
    LIMIT 20
    """,
)
def embed_abtt_projections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-but-the-top screen (Mu & Viswanath 2018): the 20 vectors most
    dominated by the corpus's top principal direction, with the residual
    norm each keeps after common-direction removal — the embedding
    post-processing step that fixes anisotropic encoders before cosine
    search, and a detector for collapsed/boilerplate encodings.

    operators.similarity.abtt_projections: distributed Gram build
    (dim^2-cell shuffle, the sketch pattern) + deterministic rounded
    power iteration (shared with embed_pca_power, whose oracle CTEs this
    one extends), then one scan with two FIXED-ORDER array folds against
    the 64-float broadcast model and a TakeOrderedAndProject.
    """
    emb = T(spark, sf_dir, "embeddings")
    return abtt_projections(emb, dim=64, iters=3, top=20)


# ---------------------------------------------------------------------------
# Two-Poisson rate-shift monitor.
# ---------------------------------------------------------------------------
@query(
    "events_poisson_rate",
    oracle="""
    WITH b AS (
      SELECT CAST(MIN(epoch_us(ts)) AS BIGINT) AS lo,
             CAST(MAX(epoch_us(ts)) AS BIGINT) AS hi
      FROM events),
    m AS (SELECT lo + (hi - lo) // 2 AS mid FROM b),
    c AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN epoch_us(ts) < mid THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_first,
             CAST(SUM(CASE WHEN epoch_us(ts) >= mid THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_second
      FROM events, m GROUP BY 1)
    SELECT event_type, n_first, n_second,
           ROUND(CASE WHEN n_second > 0
                 THEN CAST(n_first AS DOUBLE) / n_second END + 1e-9, 4)
             AS rate_ratio,
           ROUND(CASE WHEN n_first + n_second > 0
                 THEN (CAST(n_first AS DOUBLE) - n_second)
                      / sqrt(CAST(n_first + n_second AS DOUBLE)) END
                 + 1e-9, 4) + 0.0 AS z
    FROM c ORDER BY event_type
    """,
)
def events_poisson_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-Poisson rate-shift test per event type between the first and
    second half of the observation window — the per-segment volume
    monitor (feed went quiet / doubled) with no distributional
    assumption on values: under H0 the split is Binomial(n, 1/2), so
    z = (n1 - n2) / sqrt(n1 + n2).

    operators.profiling.poisson_rate_shift: integer epoch-microsecond
    midpoint from one 1-row min/max aggregate (broadcast), one grouped
    conditional count off one scan, closed-form double at the end.
    """
    return poisson_rate_shift(
        T(spark, sf_dir, "events"), "event_type", "ts"
    )


# ---------------------------------------------------------------------------
# Inclusion-dependency screen (cross-table FK discovery).
# ---------------------------------------------------------------------------
#: (label, src_table, src_col, dst_table, dst_col): the TPC-H referential
#: skeleton plus one deliberate NON-dependency (order keys are not customer
#: keys) so the screen demonstrably distinguishes holds from not-holds.
_IND_PAIRS = [
    ("customer.c_nationkey->nation.n_nationkey",
     "customer", "c_nationkey", "nation", "n_nationkey"),
    ("lineitem.l_orderkey->orders.o_orderkey",
     "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part.p_partkey",
     "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier.s_suppkey",
     "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("nation.n_regionkey->region.r_regionkey",
     "nation", "n_regionkey", "region", "r_regionkey"),
    ("orders.o_custkey->customer.c_custkey",
     "orders", "o_custkey", "customer", "c_custkey"),
    ("orders.o_orderkey->customer.c_custkey",
     "orders", "o_orderkey", "customer", "c_custkey"),
    ("supplier.s_nationkey->nation.n_nationkey",
     "supplier", "s_nationkey", "nation", "n_nationkey"),
]

_IND_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{label}' AS dependency,
       CAST(nd AS BIGINT) AS n_distinct,
       CAST(nd - nm AS BIGINT) AS n_contained,
       ROUND((nd - nm) / CAST(nd AS DOUBLE) + 1e-9, 6) AS containment,
       nm = 0 AS holds
    FROM (SELECT
      (SELECT COUNT(*) FROM (SELECT DISTINCT {sc} FROM {st}
                             WHERE {sc} IS NOT NULL)) AS nd,
      (SELECT COUNT(*) FROM (SELECT DISTINCT {sc} AS v FROM {st}
                             WHERE {sc} IS NOT NULL) s
       WHERE NOT EXISTS (SELECT 1 FROM {dt} d WHERE d.{dc} = s.v)) AS nm)"""
    for label, st, sc, dt, dc in _IND_PAIRS
)


@query(
    "profile_inclusion_deps",
    oracle=_IND_ORACLE + "\nORDER BY dependency",
)
def profile_inclusion_deps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inclusion-dependency screen over the TPC-H referential skeleton
    plus one deliberate non-dependency — foreign-key discovery and
    referential-integrity audit (fd_candidates' cross-table sibling).

    operators.profiling.inclusion_deps: each candidate collapses both
    sides to DISTINCT keys map-side, containment is one LEFT ANTI hash
    join between the distinct sets — nothing row-sized survives the
    first exchange at any scale.
    """
    tables = {
        name: T(spark, sf_dir, name)
        for name in {p[1] for p in _IND_PAIRS} | {p[3] for p in _IND_PAIRS}
    }
    pairs = [
        (label, tables[st], sc, tables[dt], dc)
        for label, st, sc, dt, dc in _IND_PAIRS
    ]
    return inclusion_deps(pairs)


# ---------------------------------------------------------------------------
# IVF recall curve (nprobe sweep against brute-force cosine).
# ---------------------------------------------------------------------------
@query(
    "embed_ivf_recall",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 8),
    qs AS (SELECT vec_id AS qid, v AS q FROM e WHERE vec_id < 8),
    scored AS (
      SELECT qs.qid, e.vec_id,
             ROUND(list_dot_product(e.v, qs.q)
                   / (sqrt(list_dot_product(e.v, e.v))
                      * sqrt(list_dot_product(qs.q, qs.q))), 6) AS cos_sim
      FROM e CROSS JOIN qs),
    exact AS (
      SELECT qid, vec_id FROM scored
      QUALIFY ROW_NUMBER() OVER (PARTITION BY qid
                                 ORDER BY cos_sim DESC, vec_id) <= 10),
    ad AS (
      SELECT e.vec_id, c.cell,
             list_sum(list_transform(range(1, 65),
                      i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))) AS d
      FROM e CROSS JOIN c),
    assign AS (
      SELECT vec_id, cell FROM ad
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) = 1),
    qd AS (
      SELECT qs.qid, c.cell,
             list_sum(list_transform(range(1, 65),
                      i -> (qs.q[i] - c.cv[i]) * (qs.q[i] - c.cv[i]))) AS d
      FROM qs CROSS JOIN c),
    qrank AS (
      SELECT qid, cell,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d, cell) AS crnk
      FROM qd),
    grid(n_probe) AS (VALUES (1), (2), (4)),
    probes AS (
      SELECT g.n_probe, qid, cell FROM qrank, grid g WHERE crnk <= g.n_probe),
    cand AS (
      SELECT p.n_probe, p.qid, a.vec_id
      FROM probes p JOIN assign a USING (cell)),
    cs AS (
      SELECT c.n_probe, s.qid, s.vec_id, s.cos_sim
      FROM cand c JOIN scored s ON s.qid = c.qid AND s.vec_id = c.vec_id),
    approx AS (
      SELECT n_probe, qid, vec_id FROM cs
      QUALIFY ROW_NUMBER() OVER (PARTITION BY n_probe, qid
                                 ORDER BY cos_sim DESC, vec_id) <= 10),
    hits AS (
      SELECT ap.n_probe, ap.qid, CAST(COUNT(*) AS BIGINT) AS n_hits
      FROM approx ap JOIN exact ex
        ON ex.qid = ap.qid AND ex.vec_id = ap.vec_id
      GROUP BY 1, 2),
    spine AS (
      SELECT g.n_probe, d.qid
      FROM grid g CROSS JOIN (SELECT DISTINCT qid FROM qs) d)
    SELECT CAST(s.n_probe AS INT) AS n_probe, s.qid,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           ROUND(COALESCE(h.n_hits, 0) / 10.0, 2) AS recall_at_10
    FROM spine s LEFT JOIN hits h USING (n_probe, qid)
    ORDER BY n_probe, qid
    """,
)
def embed_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the IVF candidate path vs exact brute-force cosine,
    per (n_probe in {1,2,4}, query) over 8 queries — the probe-count
    tuning curve that decides how many cells a deployed IVF index must
    visit to hit its recall SLO (sim_ann_recall's IVF twin).

    operators.similarity.ivf_recall: every vector argmin-assigns once
    (centroid literals = broadcast), probe choice ranks a
    #queries x #cells frame, candidates come from one hash join on the
    cell id, and every top-k is a window over bounded partitions — the
    corpus is scanned twice regardless of how many probe settings run.
    """
    e = T(spark, sf_dir, "embeddings")
    cents = [
        [float(x) for x in r.embedding]
        for r in e.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ]
    return ivf_recall(e, cents, n_queries=8, k=10, nprobes=(1, 2, 4))


# ---------------------------------------------------------------------------
# SimHash Hamming-distance histogram (threshold-tuning diagnostic).
# ---------------------------------------------------------------------------
@query(
    "dedup_simhash_hist",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
      FROM documents),
    th AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) AS hi,
             CAST('0x' || substr(md5(tok), 9, 8) AS BIGINT) AS lo
      FROM t, UNNEST(t) AS u(tok)),
    nn AS (SELECT doc_id, COUNT(*) AS n FROM th GROUP BY doc_id),
    ones AS (
      SELECT th.doc_id, r.b,
             SUM(((CASE WHEN r.b < 32 THEN lo ELSE hi END) >> (r.b % 32)) & 1)
               AS ones
      FROM th, UNNEST(generate_series(0, 63)) AS r(b)
      GROUP BY th.doc_id, r.b),
    bits AS (
      SELECT o.doc_id, o.b,
             CASE WHEN 2 * o.ones > nn.n THEN 1 ELSE 0 END AS bit
      FROM ones o JOIN nn USING (doc_id)),
    bands AS (
      SELECT doc_id, b // 16 AS band,
             CAST(SUM(bit * (1 << (b % 16))) AS BIGINT) AS bucket
      FROM bits GROUP BY doc_id, b // 16),
    live AS (
      SELECT * FROM bands
      QUALIFY COUNT(*) OVER (PARTITION BY band, bucket) <= 10000),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM live a JOIN live b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
    ham AS (
      SELECT c.id_a, c.id_b,
             CAST(SUM(CASE WHEN ba.bit <> bb.bit THEN 1 ELSE 0 END) AS INT)
               AS hamming
      FROM cand c
      JOIN bits ba ON ba.doc_id = c.id_a
      JOIN bits bb ON bb.doc_id = c.id_b AND bb.b = ba.b
      GROUP BY c.id_a, c.id_b)
    SELECT hamming, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM ham GROUP BY hamming ORDER BY hamming
    """,
)
def dedup_simhash_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-distance histogram over ALL SimHash banded candidate pairs
    (no threshold) — the threshold-tuning diagnostic: where the bimodal
    gap sits between true near-dups (low distances) and band-collision
    noise decides the max_hamming a production sweep should ship.

    operators.dedup.simhash_pairs with max_hamming=64 (the banding still
    bounds candidates; only the final filter is lifted), then one tiny
    group-by on the distance — same signatures, buckets and hot-bucket
    guard as dedup_simhash, bit-for-bit.
    """
    d = T(spark, sf_dir, "documents")
    return (
        D.simhash_pairs(d, max_hamming=64)
        .groupBy("hamming")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .orderBy("hamming")
    )


# ---------------------------------------------------------------------------
# Laspeyres / Paasche / Fisher price indexes between adjacent years.
# ---------------------------------------------------------------------------
@query(
    "lineitem_price_index",
    oracle="""
    WITH li AS (
      SELECT l_partkey AS item, EXTRACT(year FROM l_shipdate) AS y,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS r100
      FROM lineitem GROUP BY 1, 2),
    pp AS (
      SELECT item, y, q,
             CAST(ROUND(CAST(r100 AS DOUBLE) * 1e4 / CAST(q AS DOUBLE) + 1e-9)
                  AS BIGINT) AS p
      FROM li),
    j AS (
      SELECT a.item, a.y AS y0, a.q AS q0, a.p AS p0, b.q AS q1, b.p AS p1
      FROM pp a JOIN pp b ON b.item = a.item AND b.y = a.y + 1),
    agg AS (
      SELECT y0, CAST(COUNT(*) AS BIGINT) AS n_items,
             SUM(CAST(p1 AS HUGEINT) * q0) AS lnum,
             SUM(CAST(p0 AS HUGEINT) * q0) AS lden,
             SUM(CAST(p1 AS HUGEINT) * q1) AS pnum,
             SUM(CAST(p0 AS HUGEINT) * q1) AS pden
      FROM j GROUP BY 1)
    SELECT CAST(y0 AS INT) AS year_from, CAST(y0 + 1 AS INT) AS year_to,
           n_items,
           ROUND(CAST(lnum AS DOUBLE) / CAST(lden AS DOUBLE) + 1e-9, 6)
             AS laspeyres,
           ROUND(CAST(pnum AS DOUBLE) / CAST(pden AS DOUBLE) + 1e-9, 6)
             AS paasche,
           ROUND(sqrt((CAST(lnum AS DOUBLE) / CAST(lden AS DOUBLE))
                      * (CAST(pnum AS DOUBLE) / CAST(pden AS DOUBLE)))
                 + 1e-9, 6) AS fisher
    FROM agg ORDER BY year_from
    """,
)
def lineitem_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres / Paasche / Fisher price indexes between adjacent ship
    years over the matched part basket — the index-number decomposition
    separating price inflation from volume mix (revenue_bridge's
    corpus-level sibling).

    operators.relational.price_index_pairs: one map-side-combined
    aggregate to the (part, year) grain, unit prices quantized ONCE to
    integer micro-currency, every index numerator/denominator an exact
    DECIMAL(38,0) sum of integer products, co-partitioned year+1
    self-join on the part key.
    """
    return price_index_pairs(
        T(spark, sf_dir, "lineitem"),
        "l_partkey",
        F.year("l_shipdate"),
        "l_quantity",
        "l_extendedprice",
    )


# ---------------------------------------------------------------------------
# Forward as-of join with a max-gap tolerance.
# ---------------------------------------------------------------------------
@query(
    "asof_forward_tolerance",
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderdate,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             ROUND(MAX(o_totalprice), 2) AS max_price
      FROM orders GROUP BY 1, 2),
    j AS (
      SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
             CAST(o.o_orderdate AS TIMESTAMP) AS od,
             o.n_orders, o.max_price
      FROM events e
      ASOF LEFT JOIN o ON e.user_id = o.o_custkey
                      AND e.ts <= CAST(o.o_orderdate AS TIMESTAMP)
      WHERE e.event_id < 2000)
    SELECT event_id, user_id, ts,
           CASE WHEN date_diff('second', ts, od) <= 2592000 THEN od END
             AS o_orderdate,
           CASE WHEN date_diff('second', ts, od) <= 2592000 THEN n_orders END
             AS n_orders,
           CASE WHEN date_diff('second', ts, od) <= 2592000 THEN max_price END
             AS max_price
    FROM j ORDER BY event_id
    """,
)
def asof_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with a 30-day max-gap tolerance: each event
    picks the user's EARLIEST order-day at or after the event, and a
    match further than 30 days out is voided (NULL payload) — the
    other half of the as-of surface (asof_join_events_orders covers
    backward/no-tolerance), the shape behind "next conversion within
    the attribution window".

    operators.relational.asof_join(direction='forward',
    tolerance_seconds=30d): union + ordered-window merge formulation —
    one shuffle per side, the tolerance rides the same window, no range
    cross-join.
    """
    from sqlitedataframe_spark.operators.relational import asof_join

    e = (
        T(spark, sf_dir, "events")
        .filter(F.col("event_id") < 2000)
        .select("event_id", "user_id", "ts")
    )
    o = (
        T(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate"),
            "n_orders",
            "max_price",
        )
    )
    return (
        asof_join(
            e,
            o,
            on="user_id",
            left_ts="ts",
            right_ts="o_orderdate",
            direction="forward",
            tolerance_seconds=30 * 86400,
        )
        .select("event_id", "user_id", "ts", "o_orderdate", "n_orders", "max_price")
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Contrastive training triplets from the LSH candidate table.
# ---------------------------------------------------------------------------
@query(
    "sample_contrastive_triplets",
    oracle=MH_EST_CTE
    + """,
    pos AS (SELECT id_a, id_b, est_jaccard FROM est WHERE est_jaccard >= 0.5),
    anch AS (
      SELECT id_a AS anchor, id_b AS positive, est_jaccard AS pos_score
      FROM pos
      UNION ALL
      SELECT id_b AS anchor, id_a AS positive, est_jaccard AS pos_score
      FROM pos),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    d0 AS (
      -- HUGEINT: anchor*mult exceeds int64 once anchor > ~3.4e9; DuckDB
      -- BIGINT would raise Out of Range while Spark int64 silently wraps.
      -- Both engines now compute the draw in wide arithmetic (Spark side:
      -- decimal(38,0) in operators.sampling.contrastive_triplets).
      SELECT anchor, positive, pos_score,
             CAST((CAST(anchor AS HUGEINT) * 2654435761 + 13) % nn.n
                  AS BIGINT) AS d0,
             nn.n AS n
      FROM anch, nn),
    neg AS (
      SELECT anchor, positive, pos_score,
             CAST(CASE WHEN d0 = anchor OR d0 = positive
                  THEN (d0 + 1) % n ELSE d0 END AS BIGINT) AS negative
      FROM d0)
    SELECT anchor, positive, negative, pos_score
    FROM neg
    WHERE negative IN (SELECT doc_id FROM documents)
    ORDER BY anchor, positive
    """,
)
def sample_contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(anchor, positive, negative) triplet table for contrastive
    embedding training: positives = the MinHash-LSH near-dup pairs at
    est_jaccard >= 0.5 (both directions), negatives = a deterministic
    Knuth multiplicative-hash draw over the id space with one re-roll on
    collision — the embedding-model data-prep stage, reproducible across
    engines and runs.

    operators.sampling.contrastive_triplets over the SAME shared
    signature table as dedup_minhash_lsh; the negative draw is a
    scan-side expression plus one id hash join; shuffles carry id
    triples only.
    """
    d = T(spark, sf_dir, "documents")
    from sqlitedataframe_spark.operators.sampling import contrastive_triplets

    pairs = D.minhash_lsh_pairs(
        d,
        min_jaccard=0.5,
        sig=shared_doc_sigs(spark, sf_dir),
        banded=shared_doc_banded(spark, sf_dir),
    )
    return contrastive_triplets(
        pairs, d.select("doc_id"), id_col="doc_id", min_pos_score=0.5
    )


# ---------------------------------------------------------------------------
# DP count release with deterministic seeded Laplace noise.
# ---------------------------------------------------------------------------
@query(
    "profile_dp_counts",
    oracle="""
    WITH c AS (
      SELECT event_type AS g, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1),
    u AS (
      SELECT g, n,
             (CAST(CAST('0x' || substr(md5(g), 1, 8) AS BIGINT) AS DOUBLE)
              + 0.5) / 4294967296.0 AS u
      FROM c),
    v AS (
      SELECT g, n,
             ((-1.0) * (CASE WHEN u - 0.5 > 0 THEN 1.0
                             WHEN u - 0.5 < 0 THEN -1.0
                             ELSE 0.0 END))
               * ln(1.0 - 2.0 * abs(u - 0.5)) AS nz
      FROM u)
    SELECT g AS event_type, n,
           ROUND(nz + 1e-9, 4) + 0.0 AS noise,
           ROUND(n + nz + 1e-9, 4) + 0.0 AS released
    FROM v ORDER BY event_type
    """,
)
def profile_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release per event type (Laplace
    mechanism, eps=1, sensitivity 1) with DETERMINISTIC md5-seeded noise
    — the privacy-release stage made a pure function of the data so the
    mechanism itself is exactly testable; a production release swaps the
    seed for fresh randomness and changes nothing else in the plan.

    operators.profiling.dp_released_counts: one grouped count, noise is
    a scan-side inverse-CDF expression over the #groups frame; noise and
    released carry the `+ 0.0` signed-zero convention.
    """
    from sqlitedataframe_spark.operators.profiling import dp_released_counts

    return dp_released_counts(
        T(spark, sf_dir, "events"), "event_type", epsilon=1.0
    )


# ---------------------------------------------------------------------------
# BPE greedy merge rounds (the tokenizer train->apply loop).
# ---------------------------------------------------------------------------
_BPE_SEP = "␟"


def _bpe_oracle(n_merges: int) -> str:
    S = _BPE_SEP
    parts = [
        f"""WITH v AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS f
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE length(word) >= 1 GROUP BY word),
    w0 AS (
      SELECT array_to_string(
               list_transform(range(1, length(word) + 1),
                              i -> substr(word, i, 1)), '{S}') AS s, f
      FROM v)"""
    ]
    for r in range(1, n_merges + 1):
        parts.append(
            f"""m{r} AS (
      SELECT p AS pair, CAST(SUM(f) AS BIGINT) AS n,
             string_split(p, '{S}')[1] AS a, string_split(p, '{S}')[2] AS b
      FROM (
        SELECT t.a[i.i] || '{S}' || t.a[i.i + 1] AS p, t.f AS f
        FROM (SELECT string_split(s, '{S}') AS a, f FROM w{r - 1}) t,
             UNNEST(generate_series(1, len(t.a) - 1)) i(i))
      GROUP BY p ORDER BY n DESC, p LIMIT 1)"""
        )
        parts.append(
            f"""w{r} AS (
      SELECT list_reduce(string_split(s, '{S}'), (acc, x) ->
        CASE WHEN x = m.b AND (acc = m.a OR ends_with(acc, '{S}' || m.a))
             THEN substr(acc, 1, length(acc) - length(m.a)) || m.a || m.b
             ELSE acc || '{S}' || x END) AS s, f
      FROM w{r - 1} CROSS JOIN m{r} m)"""
        )
    selects = [
        f"""SELECT {r} AS round,
           (SELECT a FROM m{r}) AS merge_a,
           (SELECT b FROM m{r}) AS merge_b,
           (SELECT n FROM m{r}) AS n_pair,
           (SELECT CAST(SUM(f * len(string_split(s, '{S}'))) AS BIGINT)
            FROM w{r}) AS total_symbols"""
        for r in range(1, n_merges + 1)
    ]
    return (
        ",\n".join(parts)
        + "\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY round"
    )


@query("text_bpe_merges", oracle=_bpe_oracle(5))
def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five greedy BPE merge rounds learned AND applied over the corpus:
    each round's chosen merge (count DESC, pair ASC), its support, and
    the total symbol count after applying it — the tokenizer
    train->apply loop (text_bpe_pairs is one round's counting kernel).

    operators.text.bpe_merge_rounds: per round one bounded pair-count
    aggregate + a 1-row argmax collect (the train_centroids model-state
    pattern), merges applied with a left-to-right whole-symbol FOLD
    (F.aggregate / DuckDB list_reduce — a merge can never fire across
    symbol boundaries the way substring replace would). The corpus
    never crosses the driver; the 5-row result is model state.
    """
    from sqlitedataframe_spark.operators.text import bpe_merge_rounds

    return bpe_merge_rounds(
        T(spark, sf_dir, "documents"), "text", n_merges=5
    )


# ---------------------------------------------------------------------------
# CUPED variance-reduced experiment readout.
# ---------------------------------------------------------------------------
@query(
    "events_cuped",
    oracle="""
    WITH b AS (
      SELECT CAST(MIN(epoch_us(ts)) AS BIGINT) AS lo,
             CAST(MAX(epoch_us(ts)) AS BIGINT) AS hi
      FROM events),
    m AS (SELECT lo + (hi - lo) // 2 AS mid FROM b),
    u AS (
      SELECT user_id % 2 AS variant,
             CAST(SUM(CASE WHEN epoch_us(ts) < mid
                      THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(SUM(CASE WHEN epoch_us(ts) >= mid
                      THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS y
      FROM events, m GROUP BY user_id, user_id % 2),
    per AS (
      SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy
      FROM u GROUP BY 1),
    pooled AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS tn,
             SUM(CAST(x AS HUGEINT)) AS tsx, SUM(CAST(y AS HUGEINT)) AS tsy,
             SUM(CAST(x AS HUGEINT) * x) AS txx,
             SUM(CAST(y AS HUGEINT) * y) AS tyy,
             SUM(CAST(x AS HUGEINT) * y) AS txy
      FROM u),
    d AS (
      SELECT variant, n,
             CAST(tn AS DOUBLE) AS tn,
             CAST(tsx AS DOUBLE) / 1.0 AS tsx, CAST(tsy AS DOUBLE) / 1.0 AS tsy,
             CAST(txx AS DOUBLE) / 1.0 AS txx, CAST(tyy AS DOUBLE) / 1.0 AS tyy,
             CAST(txy AS DOUBLE) / 1.0 AS txy,
             CAST(sx AS DOUBLE) / 1.0 AS sx, CAST(sy AS DOUBLE) / 1.0 AS sy,
             CAST(n AS DOUBLE) AS nn
      FROM per CROSS JOIN pooled),
    f AS (
      SELECT variant, n,
             (txy - tsx * tsy / tn) / (tn - 1.0) AS cov,
             (txx - tsx * tsx / tn) / (tn - 1.0) AS varx,
             (tyy - tsy * tsy / tn) / (tn - 1.0) AS vary,
             sy / 1.0 / nn AS mean_y, sx / 1.0 / nn AS mean_x,
             tsx / tn AS mean_x_all
      FROM d)
    SELECT variant, n,
           ROUND(mean_y + 1e-9, 6) + 0.0 AS mean_post,
           ROUND(mean_y - (cov / varx) * (mean_x - mean_x_all) + 1e-9, 6)
             + 0.0 AS mean_cuped,
           ROUND(cov / varx + 1e-9, 6) + 0.0 AS theta,
           ROUND((cov * cov) / (varx * vary) + 1e-9, 6) AS var_reduction
    FROM f ORDER BY variant
    """,
)
def events_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout: per-user pre-period spend (in
    integer cents, first half of the window) adjusts the post-period
    mean per variant, theta = cov(X,Y)/var(X) pooled — the standard
    experimentation trick that shrinks CIs by corr^2 without moving the
    expectation (events_ab_ztest's variance-reduction upgrade).

    operators.evalmetrics.cuped_adjustment: closed form on MOMENTS —
    one per-variant aggregate + one 1-row pooled-moment broadcast; no
    per-row adjusted value ever materializes; every sum is an exact
    DECIMAL(38,0) of integer cents.
    """
    from sqlitedataframe_spark.operators.evalmetrics import cuped_adjustment

    ev = T(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    bounds = ev.agg(
        F.min(us).alias("_lo"), F.max(us).alias("_hi")
    ).select(
        (F.col("_lo") + F.floor((F.col("_hi") - F.col("_lo")) / 2)).alias("_mid")
    )
    cents = F.round(F.col("value") * 100).cast("bigint")
    per_user = (
        ev.join(F.broadcast(bounds))
        .groupBy("user_id", (F.col("user_id") % 2).alias("variant"))
        .agg(
            F.sum(F.when(us < F.col("_mid"), cents).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("x"),
            F.sum(F.when(us >= F.col("_mid"), cents).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("y"),
        )
    )
    return cuped_adjustment(per_user, "variant", "x", "y", scale=1)


# ---------------------------------------------------------------------------
# Matryoshka prefix-dimension recall.
# ---------------------------------------------------------------------------
@query(
    "embed_prefix_recall",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    qs AS (SELECT vec_id AS qid, v AS q FROM e WHERE vec_id < 8),
    scored AS (
      SELECT qs.qid, e.vec_id,
             ROUND(list_dot_product(e.v, qs.q)
                   / (sqrt(list_dot_product(e.v, e.v))
                      * sqrt(list_dot_product(qs.q, qs.q))), 6) AS cos_sim
      FROM e CROSS JOIN qs),
    exact AS (
      SELECT qid, vec_id FROM scored
      QUALIFY ROW_NUMBER() OVER (PARTITION BY qid
                                 ORDER BY cos_sim DESC, vec_id) <= 10),
    dims(prefix_dim) AS (VALUES (16), (32)),
    pscored AS (
      SELECT d.prefix_dim, qs.qid, e.vec_id,
             ROUND(list_dot_product(e.v[1:d.prefix_dim], qs.q[1:d.prefix_dim])
                   / (sqrt(list_dot_product(e.v[1:d.prefix_dim],
                                            e.v[1:d.prefix_dim]))
                      * sqrt(list_dot_product(qs.q[1:d.prefix_dim],
                                              qs.q[1:d.prefix_dim]))), 6)
               AS cos_sim
      FROM e CROSS JOIN qs CROSS JOIN dims d),
    approx AS (
      SELECT prefix_dim, qid, vec_id FROM pscored
      QUALIFY ROW_NUMBER() OVER (PARTITION BY prefix_dim, qid
                                 ORDER BY cos_sim DESC, vec_id) <= 10),
    hits AS (
      SELECT ap.prefix_dim, ap.qid, CAST(COUNT(*) AS BIGINT) AS n_hits
      FROM approx ap JOIN exact ex
        ON ex.qid = ap.qid AND ex.vec_id = ap.vec_id
      GROUP BY 1, 2),
    spine AS (
      SELECT d.prefix_dim, q.qid
      FROM dims d CROSS JOIN (SELECT DISTINCT qid FROM qs) q)
    SELECT CAST(s.prefix_dim AS INT) AS prefix_dim, s.qid,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           ROUND(COALESCE(h.n_hits, 0) / 10.0, 2) AS recall_at_10
    FROM spine s LEFT JOIN hits h USING (prefix_dim, qid)
    ORDER BY prefix_dim, qid
    """,
)
def embed_prefix_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka prefix-dimension recall: recall@10 of cosine search
    over only the first 16/32 coordinates vs full 64-dim brute force,
    per query — the measurement behind truncated-vector serving (can the
    index store half the floats, and at what recall cost?).

    operators.similarity.prefix_recall: one corpus x 8-query broadcast
    cross scored at full dim (the sim_ann_recall shape) plus one
    scan-side sliced fold per prefix dim; per-(dim, query) top-k windows
    over bounded partitions; the corpus scans once per prefix setting,
    never per query.
    """
    from sqlitedataframe_spark.operators.similarity import prefix_recall

    e = T(spark, sf_dir, "embeddings")
    return prefix_recall(e, prefix_dims=(16, 32), n_queries=8, k=10)


# ---------------------------------------------------------------------------
# DeLong AUC variance / confidence interval.
# ---------------------------------------------------------------------------
from sqlitedataframe_spark.suite.pipeline10 import _SCORED_CTE, _scored  # noqa: E402


@query(
    "eval_auc_delong",
    oracle=f"""
    WITH {_SCORED_CTE},
    b AS (
      SELECT CAST(ROUND(s * 1000000) AS BIGINT) AS sc,
             CAST(SUM(y) AS BIGINT) AS pos,
             CAST(SUM(1 - y) AS BIGINT) AS neg
      FROM scored GROUP BY 1),
    c AS (
      SELECT sc, pos, neg,
             SUM(neg) OVER (ORDER BY sc) AS cneg,
             SUM(pos) OVER (ORDER BY sc) AS cpos
      FROM b),
    tt AS (SELECT CAST(SUM(pos) AS BIGINT) AS m,
                  CAST(SUM(neg) AS BIGINT) AS n FROM b),
    mo AS (
      SELECT
        SUM(CAST(pos AS HUGEINT) * (2 * (cneg - neg) + neg)) AS su10,
        SUM(CAST(pos AS HUGEINT)
            * CAST(2 * (cneg - neg) + neg AS HUGEINT)
            * (2 * (cneg - neg) + neg)) AS sq10,
        SUM(CAST(neg AS HUGEINT) * (2 * (tt.m - cpos) + pos)) AS su01,
        SUM(CAST(neg AS HUGEINT)
            * CAST(2 * (tt.m - cpos) + pos AS HUGEINT)
            * (2 * (tt.m - cpos) + pos)) AS sq01
      FROM c, tt),
    f AS (
      SELECT tt.m, tt.n,
             CAST(su10 AS DOUBLE) AS su10, CAST(sq10 AS DOUBLE) AS sq10,
             CAST(su01 AS DOUBLE) AS su01, CAST(sq01 AS DOUBLE) AS sq01,
             CAST(tt.m AS DOUBLE) AS md, CAST(tt.n AS DOUBLE) AS nd
      FROM mo, tt),
    r AS (
      SELECT m, n,
             su10 / (2.0 * nd) / md AS auc,
             sqrt((sq10 - su10 * su10 / md) / (md - 1.0)
                    / (2.0 * nd) / (2.0 * nd) / md
                  + (sq01 - su01 * su01 / nd) / (nd - 1.0)
                    / (2.0 * md) / (2.0 * md) / nd) AS se
      FROM f)
    SELECT m AS n_pos, n AS n_neg,
           ROUND(auc + 1e-9, 6) AS auc,
           ROUND(se + 1e-9, 6) AS se,
           ROUND(auc - 1.959963985 * se + 1e-9, 6) + 0.0 AS ci_lo,
           ROUND(auc + 1.959963985 * se + 1e-9, 6) AS ci_hi
    FROM r
    """,
)
def eval_auc_delong(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeLong variance and 95% CI for the quality-score AUC — upgrades
    the point estimate eval_auc_quality_lang reports to a
    decision-grade interval (is the score actually predictive on this
    slice, or within noise of 0.5?).

    operators.evalmetrics.delong_auc_ci: placements-from-buckets — the
    per-positive/per-negative placement moments are exact integer sums
    over the score-bucket frame (DOUBLED numerators keep tie-halves
    integer), cumulative counts via the two-level distributed prefix
    sum, S10/S01/AUC/CI double only in the 1-row final projection.
    """
    from sqlitedataframe_spark.operators.evalmetrics import delong_auc_ci

    return delong_auc_ci(_scored(spark, sf_dir), "s", "y")


# ---------------------------------------------------------------------------
# Soft-dedup loss weights (duplicate-aware mixture accounting).
# ---------------------------------------------------------------------------
from sqlitedataframe_spark.suite.pipeline2 import _CC_EDGE_SQL  # noqa: E402


@query(
    "dedup_soft_weights",
    oracle=f"""
    WITH RECURSIVE {_CC_EDGE_SQL},
    sym AS (SELECT src, dst FROM edges
            UNION SELECT dst, src FROM edges),
    walk(node, comp) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT s.dst, w.comp FROM walk w JOIN sym s ON s.src = w.node
    ),
    comp AS (
      SELECT node AS doc_id, CAST(MIN(comp) AS BIGINT) AS component
      FROM walk GROUP BY node),
    csize AS (
      SELECT component, CAST(COUNT(*) AS BIGINT) AS k
      FROM comp GROUP BY 1),
    d AS (
      SELECT c.doc_id, cs.k, doc.source,
             CAST(len(regexp_split_to_array(lower(trim(doc.text)), '\\s+'))
                  AS BIGINT) AS toks
      FROM comp c
      JOIN csize cs USING (component)
      JOIN documents doc USING (doc_id))
    SELECT source, CAST(k AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(toks) AS BIGINT) AS n_tokens,
           ROUND(1.0 / k + 1e-9, 6) AS weight
    FROM d GROUP BY source, k ORDER BY source, cluster_size
    """,
)
def dedup_soft_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft-dedup loss-weight table: instead of DROPPING near-duplicates,
    weight each document by 1/|its dup cluster| (so every cluster
    contributes one unit of training signal) and report the
    (source, cluster_size) grain a mixture planner consumes — raw vs
    effective doc/token counts per feed without losing coverage of
    rare-but-duplicated content.

    Exactness: n_docs/n_tokens are integer sums over the grain; the
    weight is a SINGLE division per output row (never a float sum of
    1/k terms across rows — the (source, cluster_size) grain exists
    precisely so effective sizes stay downstream arithmetic on exact
    integers). Components come from the same consecutive-id Jaccard
    edges + pointer-jumped CC as dedup_connected_components.
    """
    from sqlitedataframe_spark.operators.graph import connected_components
    from sqlitedataframe_spark.operators.text import tokens as _toks

    d = T(spark, sf_dir, "documents")
    tk = d.select("doc_id", F.array_distinct(_toks("text")).alias("t"))
    a, b = tk.alias("a"), tk.alias("b")
    inter = F.size(F.array_intersect(F.col("a.t"), F.col("b.t")))
    union = F.size(F.array_union(F.col("a.t"), F.col("b.t")))
    edges = (
        a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .filter(inter.cast("double") / union >= 0.5)
        .select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
    )
    comp = connected_components(
        edges, nodes=d.select("doc_id"), node_col="doc_id"
    ).select(F.col("node").alias("doc_id"), F.col("comp").alias("component"))
    csize = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("k")
    )
    joined = (
        comp.join(csize, "component")
        .join(
            d.select(
                "doc_id", "source", F.size(_toks("text")).cast("bigint").alias("toks")
            ),
            "doc_id",
        )
    )
    return (
        joined.groupBy("source", F.col("k").alias("cluster_size"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("toks").cast("bigint").alias("n_tokens"),
        )
        .select(
            "source",
            "cluster_size",
            "n_docs",
            "n_tokens",
            F.round(1.0 / F.col("cluster_size") + 1e-9, 6).alias("weight"),
        )
        .orderBy("source", "cluster_size")
    )
