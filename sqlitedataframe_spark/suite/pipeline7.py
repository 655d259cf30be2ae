"""Round-5 continuation: hybrid-retrieval RRF fusion, DSIR importance
resampling, PMI collocations, KS drift, Benford profiling, cohort
retention matrix, time-weighted averages, and Markov transitions.

Like every suite module, each query pairs an idiomatic-Spark plan with a
DuckDB oracle the driver hash-compares at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlitedataframe_spark.suite import query
from sqlitedataframe_spark.suite.relational import T
from sqlitedataframe_spark.suite.pipeline6 import BM25_QUERY_TERMS


# Shared oracle fragments: the BM25 scorer (identical closed form to
# text_bm25_topk's oracle) and the brute-force cosine scorer (identical to
# sim_bruteforce_topk's), each cut to its own top-50 candidate list.
_BM25_TOP50 = """
    tok AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
      FROM documents),
    bmbase AS (
      SELECT doc_id, len(t) AS dl,
             [len(list_filter(t, x -> x = 'spark')),
              len(list_filter(t, x -> x = 'join')),
              len(list_filter(t, x -> x = 'window'))] AS tfs
      FROM tok),
    bmstats AS (
      SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl,
             SUM(CASE WHEN tfs[1] > 0 THEN 1 ELSE 0 END) AS df0,
             SUM(CASE WHEN tfs[2] > 0 THEN 1 ELSE 0 END) AS df1,
             SUM(CASE WHEN tfs[3] > 0 THEN 1 ELSE 0 END) AS df2
      FROM bmbase),
    bmscored AS (
      SELECT doc_id, ROUND(
        (CASE WHEN tfs[1] > 0 THEN
           ln((n_docs - df0 + 0.5) / (df0 + 0.5) + 1.0)
             * tfs[1] * 2.2 / (tfs[1] + 1.2 * (0.25 + 0.75 * dl / avgdl))
         ELSE 0 END)
        + (CASE WHEN tfs[2] > 0 THEN
           ln((n_docs - df1 + 0.5) / (df1 + 0.5) + 1.0)
             * tfs[2] * 2.2 / (tfs[2] + 1.2 * (0.25 + 0.75 * dl / avgdl))
         ELSE 0 END)
        + (CASE WHEN tfs[3] > 0 THEN
           ln((n_docs - df2 + 0.5) / (df2 + 0.5) + 1.0)
             * tfs[3] * 2.2 / (tfs[3] + 1.2 * (0.25 + 0.75 * dl / avgdl))
         ELSE 0 END), 6) AS score
      FROM bmbase, bmstats),
    lex AS (
      SELECT doc_id AS id, score FROM bmscored WHERE score > 0
      ORDER BY score DESC, doc_id LIMIT 50)
"""

_COS_TOP50 = """
    q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
    ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    sem AS (
      SELECT vec_id AS id,
             ROUND(list_dot_product(v, qv)
                   / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))),
                   6) AS score
      FROM ev CROSS JOIN q
      ORDER BY score DESC, vec_id LIMIT 50)
"""


@query(
    "retrieval_rrf_hybrid",
    oracle=f"""
    WITH {_BM25_TOP50},
    {_COS_TOP50},
    u AS (
      SELECT 0 AS r, id, score FROM lex
      UNION ALL
      SELECT 1 AS r, id, score FROM sem),
    rk AS (
      SELECT id, r,
             ROW_NUMBER() OVER (PARTITION BY r ORDER BY score DESC, id) AS rnk
      FROM u)
    SELECT id AS doc_id,
           ROUND(SUM(1.0 / (60.0 + rnk)), 6) AS rrf,
           CAST(COUNT(*) AS BIGINT) AS n_lists
    FROM rk GROUP BY id
    ORDER BY rrf DESC, doc_id LIMIT 20
    """,
)
def retrieval_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: fuse the BM25 lexical top-50 and the embedding-
    cosine top-50 (query = vec_id 0, aligned 1:1 with doc_id) by
    reciprocal-rank fusion — the standard score-free fusion rule behind
    RAG retrieval stacks (rrf = sum_r 1/(60 + rank_r)).

    operators.retrieval.rrf_fuse: both candidate lists arrive already
    k-bounded (TakeOrderedAndProject in each retriever — the corpus is
    never globally sorted), ranks assign per retriever over the
    pre-rounded scores (window partitioned by the retriever tag, <= 50
    rows per partition), and one tiny groupBy fuses. The oracle rebuilds
    both scorers with the identical closed forms and the same
    (score DESC, id) rank order.
    """
    from sqlitedataframe_spark.operators.retrieval import rrf_fuse
    from sqlitedataframe_spark.operators.similarity import brute_force_topk
    from sqlitedataframe_spark.operators.text import bm25_topk

    docs = T(spark, sf_dir, "documents")
    emb = T(spark, sf_dir, "embeddings")
    lex = bm25_topk(docs, BM25_QUERY_TERMS, k=50).select(
        F.col("doc_id").alias("id"), F.col("bm25").alias("score")
    )
    qdf = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    sem = brute_force_topk(emb, qdf, k=50).select(
        F.col("vec_id").alias("id"), F.col("cos_sim").alias("score")
    )
    fused = rrf_fuse([lex, sem], id_col="id", score_col="score", k0=60, k=20)
    return fused.withColumnRenamed("id", "doc_id")


@query(
    "sample_dsir_importance",
    oracle="""
    WITH post AS (
      SELECT d.doc_id, d.lang = 'en' AS is_t,
             substr(md5(u.tok), 1, 3) AS b
      FROM (SELECT doc_id, lang,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS t
            FROM documents) d,
           UNNEST(d.t) AS u(tok)),
    bk AS (
      SELECT b, SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS nt, COUNT(*) AS nr
      FROM post GROUP BY b),
    tt AS (SELECT SUM(nt) AS n_t, SUM(nr) AS n_r FROM bk),
    lam AS (
      SELECT b,
             ln(((nt + 0.5) * (n_r + 2048.0)) / ((nr + 0.5) * (n_t + 2048.0)))
               AS lam
      FROM bk, tt),
    sc AS (
      SELECT doc_id, ROUND(AVG(lam), 6) AS dsir_score
      FROM post JOIN lam USING (b) GROUP BY doc_id)
    SELECT sc.doc_id AS doc_id, d.lang, sc.dsir_score
    FROM sc JOIN documents d ON d.doc_id = sc.doc_id
    WHERE d.lang <> 'en'
    ORDER BY dsir_score DESC, sc.doc_id LIMIT 25
    """,
)
def sample_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection: score every NON-English document by how
    English-like its hashed-unigram distribution is (target LM = the
    lang='en' slice, raw LM = the whole pool; Xie et al. 2023), and take
    the top 25 — the importance-resampling recipe for targeting a data
    mixture at a domain without classifier labels.

    operators.sampling.dsir_scores: postings carry (id, 12-bit md5
    bucket) only — text never shuffles; the bucket LMs collapse to a
    <= 4096-row table (input-size-independent exchange, the sketch
    property) that broadcasts back for the per-document mean ratio.
    """
    from sqlitedataframe_spark.operators.sampling import dsir_scores

    d = T(spark, sf_dir, "documents")
    scores = dsir_scores(d, F.col("lang") == "en")
    return (
        scores.join(d.select("doc_id", "lang"), "doc_id")
        .filter(F.col("lang") != "en")
        .select("doc_id", "lang", "dsir_score")
        .orderBy(F.col("dsir_score").desc(), "doc_id")
        .limit(25)
    )


@query(
    "text_pmi_collocations",
    oracle="""
    WITH tok AS (
      SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS t
      FROM documents),
    bg AS (
      SELECT t[i] AS w1, t[i + 1] AS w2, COUNT(*) AS c_xy
      FROM tok, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
      GROUP BY 1, 2
      HAVING COUNT(*) >= 5),
    uni AS (
      SELECT u.tok AS w, COUNT(*) AS c_w
      FROM tok, UNNEST(tok.t) AS u(tok) GROUP BY 1),
    tt AS (SELECT SUM(c_w) AS n_tokens FROM uni)
    SELECT bg.w1, bg.w2, CAST(bg.c_xy AS BIGINT) AS c_xy,
           ROUND(ln((CAST(bg.c_xy AS DOUBLE) * n_tokens)
                    / (CAST(u1.c_w AS DOUBLE) * u2.c_w)), 6) AS pmi
    FROM bg
    JOIN uni u1 ON u1.w = bg.w1
    JOIN uni u2 ON u2.w = bg.w2, tt
    ORDER BY pmi DESC, w1, w2 LIMIT 20
    """,
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent-bigram collocations by PMI with min-support 5 —
    the phrase-detection pass (Church & Hanks) run before fixing a
    tokenizer vocabulary or word2vec-style phrase merges.

    operators.text.pmi_collocations: bigram and unigram counts collapse
    scan-side explodes into vocabulary-sized aggregates; the support cut
    applies before the two key joins; PMI is a pure function of integer
    counts so both engines compute the identical double.
    """
    from sqlitedataframe_spark.operators.text import pmi_collocations

    return pmi_collocations(
        T(spark, sf_dir, "documents"), min_count=5, k=20
    )


@query(
    "events_ks_drift",
    oracle="""
    WITH ca AS (
      SELECT 'a' AS g, CAST(floor(value / 5.0) AS BIGINT) AS b, COUNT(*) AS n
      FROM events WHERE event_type = 'click' GROUP BY 2),
    cb AS (
      SELECT 'b' AS g, CAST(floor(value / 5.0) AS BIGINT) AS b, COUNT(*) AS n
      FROM events WHERE event_type = 'view' GROUP BY 2),
    spine AS (
      SELECT DISTINCT b FROM (SELECT b FROM ca UNION ALL SELECT b FROM cb)),
    grid AS (
      SELECT g, b FROM spine
      CROSS JOIN (SELECT 'a' AS g UNION ALL SELECT 'b' AS g)),
    dense AS (
      SELECT grid.g, grid.b, COALESCE(u.n, 0) AS n
      FROM grid LEFT JOIN (SELECT * FROM ca UNION ALL SELECT * FROM cb) u
        USING (g, b)),
    ecdf AS (
      SELECT g, b,
             CAST(SUM(n) OVER (PARTITION BY g ORDER BY b) AS DOUBLE)
               / SUM(n) OVER (PARTITION BY g) AS f,
             SUM(n) OVER (PARTITION BY g) AS nt
      FROM dense),
    gaps AS (
      SELECT b,
             ROUND(ABS(SUM(CASE WHEN g = 'a' THEN f END)
                       - SUM(CASE WHEN g = 'b' THEN f END)), 6) AS gap,
             MAX(CASE WHEN g = 'a' THEN nt END) AS na,
             MAX(CASE WHEN g = 'b' THEN nt END) AS nb
      FROM ecdf GROUP BY b)
    SELECT MAX(gap) AS ks_d,
           CAST(MAX(na) AS BIGINT) AS n_a,
           CAST(MAX(nb) AS BIGINT) AS n_b,
           CAST(COUNT(*) AS BIGINT) AS n_bins
    FROM gaps
    """,
)
def events_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned two-sample KS statistic between the value distributions of
    'click' and 'view' events — the cumulative-gap complement to the
    per-bin PSI monitor (events_drift_psi), sensitive to location/shape
    shifts PSI's sum can wash out.

    operators.profiling.ks_drift: each side collapses to <= |bins| count
    rows map-side; the ECDFs come from one window over the tiny dense
    bin spine partitioned by the snapshot tag (never an unpartitioned
    window over data-sized input), and the supremum is a 1-row agg.
    """
    from sqlitedataframe_spark.operators.profiling import ks_drift

    e = T(spark, sf_dir, "events")
    return ks_drift(
        e.filter(F.col("event_type") == "click"),
        e.filter(F.col("event_type") == "view"),
        "value",
        bin_width=5.0,
    )


@query(
    "profile_benford",
    oracle="""
    WITH obs AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                         1, 1) AS INT) AS digit,
             COUNT(*) AS n
      FROM orders WHERE o_totalprice >= 1 GROUP BY 1),
    tt AS (SELECT SUM(n) AS nt FROM obs)
    SELECT digit, CAST(n AS BIGINT) AS n,
           ROUND(CAST(n AS DOUBLE) / nt, 6) AS p_obs,
           ROUND(log10(1.0 + 1.0 / digit), 6) AS p_benford,
           ROUND((CAST(n AS DOUBLE) / nt - log10(1.0 + 1.0 / digit))
                 * (CAST(n AS DOUBLE) / nt - log10(1.0 + 1.0 / digit))
                 / log10(1.0 + 1.0 / digit) * nt, 6) AS chi2_term
    FROM obs, tt ORDER BY digit
    """,
)
def profile_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals against
    Benford's law with per-digit chi-square contributions — the forensic
    data-quality screen for fabricated/truncated money columns.

    operators.profiling.benford_digits: one partially-combined 9-row
    aggregate over a scan-side digit extraction; everything downstream
    is arithmetic on the 9-row grid against literal expected
    frequencies.
    """
    from sqlitedataframe_spark.operators.profiling import benford_digits

    return benford_digits(T(spark, sf_dir, "orders"), "o_totalprice")


@query(
    "events_cohort_matrix",
    oracle="""
    WITH active AS (
      SELECT DISTINCT user_id AS u,
             CAST(date_trunc('week', ts) AS DATE) AS p
      FROM events),
    coh AS (SELECT u, MIN(p) AS c FROM active GROUP BY u),
    sized AS (SELECT c, COUNT(*) AS size FROM coh GROUP BY c),
    base AS (
      SELECT coh.c AS cohort,
             CAST(date_diff('day', coh.c, a.p) // 7 AS BIGINT)
               AS period_offset,
             COUNT(*) AS n_users
      FROM active a JOIN coh ON coh.u = a.u
      GROUP BY 1, 2)
    SELECT b.cohort, b.period_offset, CAST(b.n_users AS BIGINT) AS n_users,
           ROUND(b.n_users / s.size, 6) AS pct_of_cohort
    FROM base b JOIN sized s ON s.c = b.cohort
    ORDER BY cohort, period_offset
    """,
)
def events_cohort_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention matrix over the events stream: users
    grouped by first-active week, counted per subsequent week offset
    with the retained fraction — the standard product-analytics decay
    view, generalizing the suite's single-window retention query.

    operators.relational.cohort_matrix: distinct (user, week), a
    min-aggregate and a key join all shuffle on the user key; the final
    aggregate is |weeks|^2 rows; cohort sizes ride back as a broadcast.
    """
    from sqlitedataframe_spark.operators.relational import cohort_matrix

    return cohort_matrix(T(spark, sf_dir, "events"), "user_id", "ts", "week")


@query(
    "orders_time_weighted",
    oracle="""
    WITH s AS (
      SELECT o_custkey, o_totalprice AS v,
             (epoch(LEAD(o_orderdate) OVER
                      (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_totalprice))
              - epoch(o_orderdate)) / 86400.0 AS w
      FROM orders),
    f AS (SELECT * FROM s WHERE w IS NOT NULL)
    SELECT o_custkey,
           ROUND(SUM(v * w) / SUM(w) + 1e-9, 4) AS twa,
           ROUND(AVG(v) + 1e-9, 4) AS plain_avg,
           CAST(COUNT(*) AS BIGINT) AS n_periods
    FROM f GROUP BY o_custkey
    HAVING SUM(w) > 0
    ORDER BY o_custkey
    """,
)
def orders_time_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer time-weighted average order value (each order
    weighted by the days until the customer's next order, left-Riemann)
    next to the plain mean — the right mean for irregularly-sampled
    state, where plain AVG over-weights bursts.

    operators.relational.time_weighted_avg: one lead() window and one
    aggregate, both on the customer key (same exchange); weights are
    epoch-second differences scaled identically on both engines; the
    all-simultaneous edge gates on SUM(w) > 0 explicitly because
    engines disagree on 0/0.
    """
    from sqlitedataframe_spark.operators.relational import time_weighted_avg

    return time_weighted_avg(
        T(spark, sf_dir, "orders"), "o_custkey", "o_orderdate", "o_totalprice"
    )


@query(
    "events_markov_transitions",
    oracle="""
    WITH p AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      FROM events),
    c AS (
      SELECT from_type, to_type, COUNT(*) AS n
      FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2),
    t AS (SELECT from_type, SUM(n) AS tot FROM c GROUP BY 1)
    SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
           ROUND(c.n / t.tot, 6) AS p
    FROM c JOIN t USING (from_type)
    ORDER BY from_type, to_type
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix between event types
    (row-normalized probabilities) — the aggregate view of sequential
    behavior feeding next-action models and never-happens anomaly
    screens; complements events_top_paths, which mines full n-step
    paths.

    operators.mining.markov_transitions: one lead() window partitioned
    by user, one |types|^2 aggregate with map-side combine, and a
    broadcast of the tiny per-from totals for normalization.
    """
    from sqlitedataframe_spark.operators.mining import markov_transitions

    return markov_transitions(
        T(spark, sf_dir, "events"), "user_id", "ts", "event_type",
        tiebreak_col="event_id",
    )


@query(
    "part_pareto_classes",
    oracle="""
    WITH pk AS (
      SELECT l_partkey AS key,
             CAST(ROUND(ROUND(SUM(l_extendedprice * (1 - l_discount)) + 1e-9,
                              2) * 100) AS BIGINT) AS c
      FROM lineitem GROUP BY 1),
    f AS (SELECT * FROM pk WHERE c > 0),
    cum AS (
      SELECT key, c,
             SUM(c) OVER (ORDER BY c DESC, key
                          ROWS UNBOUNDED PRECEDING) AS cm,
             SUM(c) OVER () AS tot
      FROM f),
    cls AS (
      SELECT key, c, tot,
             CASE WHEN cm * 100 <= tot * 80 THEN 'A'
                  WHEN cm * 100 <= tot * 95 THEN 'B'
                  ELSE 'C' END AS pareto_class
      FROM cum)
    SELECT pareto_class, CAST(COUNT(*) AS BIGINT) AS n_keys,
           ROUND(SUM(c) / 100.0, 2) AS class_weight,
           ROUND(SUM(c) / CAST(MAX(tot) AS DOUBLE), 6) AS weight_share
    FROM cls GROUP BY 1 ORDER BY 1
    """,
)
def part_pareto_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC/Pareto revenue concentration over parts: class A = the parts
    carrying the top 80% of discounted revenue, B to 95%, C the tail —
    the concentration screen for inventory and for corpus curation
    (which sources carry the token mass).

    operators.profiling.pareto_classes: the global running total builds
    as a DISTRIBUTED two-level prefix sum — per-key cents bucket by
    floor(log2(w)), a PARTITIONED window handles each bucket, and the
    <= 64-row bucket-totals table self-joins for global offsets — the
    single-sort order (weight DESC, key) recovered with no global sort
    or unpartitioned window. Integer-cents arithmetic end-to-end, so
    the oracle's plain running window agrees bit-for-bit.
    """
    from sqlitedataframe_spark.operators.profiling import pareto_classes

    li = T(spark, sf_dir, "lineitem")
    return pareto_classes(
        li,
        "l_partkey",
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
    )


@query(
    "events_attribution",
    oracle="""
    WITH t AS (
      SELECT user_id, event_type, ts, value,
             LAST_VALUE(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER w AS touch,
             LAST_VALUE(CASE WHEN event_type <> 'purchase'
                             THEN ts END IGNORE NULLS)
               OVER w AS touch_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
    SELECT touch AS touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_conversions,
           ROUND(SUM(value) + 1e-9, 2) AS attributed_value
    FROM t
    WHERE event_type = 'purchase' AND touch IS NOT NULL
      AND epoch(ts) - epoch(touch_ts) <= 7 * 86400
    GROUP BY 1 ORDER BY 1
    """,
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: credit each purchase to the user's most
    recent preceding non-purchase event within 7 days; per touch type,
    conversions and attributed value — the baseline marketing-ROI
    readout.

    operators.mining.last_touch_attribution: ONE window pass with an
    ignorenulls last() over (user, time) carries the latest touch
    forward — no conversions x touches range self-join; the recency cut
    is a scan-side filter.
    """
    from sqlitedataframe_spark.operators.mining import last_touch_attribution

    return last_touch_attribution(
        T(spark, sf_dir, "events"), "user_id", "ts", "event_type", "value",
        conversion_type="purchase", window_days=7, tiebreak_col="event_id",
    )


@query(
    "sample_negative_table",
    oracle="""
    WITH cnt AS (
      SELECT u.tok, COUNT(*) AS n, pow(COUNT(*), 0.75) AS w
      FROM (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS t
            FROM documents) d,
           UNNEST(d.t) AS u(tok)
      GROUP BY u.tok),
    z AS (SELECT SUM(w) AS z FROM cnt)
    SELECT tok, CAST(n AS BIGINT) AS n,
           CAST(floor(100000.0 * w / z + 0.5 + 1e-9) AS BIGINT) AS quota
    FROM cnt, z ORDER BY quota DESC, tok LIMIT 30
    """,
)
def sample_negative_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2vec negative-sampling quota table: per-token share of 100k
    negative slots proportional to count^0.75 (Mikolov's 3/4-power
    unigram smoothing), top-30 — the precomputation behind skip-gram
    negative sampling and contrastive batches.

    operators.sampling.negative_sampling_quotas: one vocabulary-sized
    count aggregate, a 1-row normalizer broadcast, scan-side
    pow/floor; the +1e-9 keeps the half boundary engine-identical.
    """
    from sqlitedataframe_spark.operators.sampling import negative_sampling_quotas

    return negative_sampling_quotas(
        T(spark, sf_dir, "documents"), total=100_000, power=0.75, k=30
    )


@query(
    "text_ngram_novelty",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i + 2], ' ') AS gram
      FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS r(i)),
    hashed AS (
      SELECT doc_id, substr(md5(gram), 1, 16) AS h FROM grams),
    firsts AS (SELECT h, MIN(doc_id) AS fd FROM hashed GROUP BY h),
    per AS (
      SELECT g.doc_id,
             SUM(CASE WHEN f.fd = g.doc_id THEN 1 ELSE 0 END)
               / COUNT(*) AS novel
      FROM hashed g JOIN firsts f USING (h) GROUP BY g.doc_id)
    SELECT CAST(doc_id // 50 AS BIGINT) AS id_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(novel) + 1e-9, 6) AS avg_novelty
    FROM per GROUP BY 1 ORDER BY 1
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus novelty curve: per 50-doc id bucket, the mean fraction of
    each document's distinct word 3-grams that no earlier document
    contains — how fast a growing corpus stops contributing new
    content ("more of this source adds nothing", the diminishing-
    returns curation signal).

    operators.text.ngram_novelty_curve: grams hash scan-side to 64-bit
    md5 prefixes so text never shuffles; first-owner is one
    vocabulary-sized min-aggregate joined back to slim (id, hash)
    postings; two key aggregates finish.
    """
    from sqlitedataframe_spark.operators.text import ngram_novelty_curve

    return ngram_novelty_curve(
        T(spark, sf_dir, "documents"), n=3, bucket=50
    )


# MMR greedy selection is sequential in k; the oracle unrolls the k steps
# as chained CTEs (generated below — a pure function of k and lambda, like
# the inlined LSH hyperplanes elsewhere in this suite). The 1-lam literal
# uses repr() so both engines subtract the IDENTICAL double (0.7's
# complement is 0.30000000000000004, not 0.3).
_MMR_LAM = 0.7
_MMR_K = 5


def _mmr_oracle(k: int = _MMR_K, lam: float = _MMR_LAM) -> str:
    lam_s, one_minus = repr(lam), repr(1.0 - lam)
    steps = []
    sel_union = "SELECT vec_id FROM sel1"
    for step in range(2, k + 1):
        steps.append(f"""
    selu{step} AS ({sel_union}),
    pen{step} AS (
      SELECT c.vec_id, c.rel, MAX(s.sim) AS msim
      FROM cand c
      JOIN sims s ON s.ia = c.vec_id
      JOIN selu{step} u ON s.ib = u.vec_id
      WHERE c.vec_id NOT IN (SELECT vec_id FROM selu{step})
      GROUP BY c.vec_id, c.rel),
    sel{step} AS (
      SELECT vec_id, {step} AS rank, rel,
             ROUND({lam_s} * rel - {one_minus} * msim, 6) AS mmr
      FROM pen{step} ORDER BY mmr DESC, vec_id LIMIT 1)""")
        sel_union += f" UNION ALL SELECT vec_id FROM sel{step}"
    unions = "\n    UNION ALL ".join(
        f"SELECT * FROM sel{i}" for i in range(1, k + 1)
    )
    return f"""
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
    ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cand AS (
      SELECT vec_id,
             ROUND(list_dot_product(v, qv)
                   / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))),
                   6) AS rel
      FROM ev CROSS JOIN q
      ORDER BY rel DESC, vec_id LIMIT 20),
    cv AS (SELECT c.vec_id, c.rel, e.v FROM cand c JOIN ev e USING (vec_id)),
    sims AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib,
             ROUND(list_dot_product(a.v, b.v)
                   / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
                   6) AS sim
      FROM cv a JOIN cv b ON a.vec_id <> b.vec_id),
    sel1 AS (
      SELECT vec_id, 1 AS rank, rel, ROUND({lam_s} * rel, 6) AS mmr
      FROM cand ORDER BY rel DESC, vec_id LIMIT 1),{",".join(steps)}
    SELECT rank, vec_id, rel AS cos_sim, mmr FROM ({unions})
    ORDER BY rank
    """


@query("retrieval_mmr_rerank", oracle=_mmr_oracle())
def retrieval_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-Marginal-Relevance diversity re-rank: from the cosine
    top-20 against the vec_id=0 query, greedily select 5 items
    maximizing ``0.7 * relevance - 0.3 * max-sim-to-selected`` — the
    standard diversity pass over a retriever's candidates (RAG context
    packing, diverse few-shot selection).

    operators.retrieval.mmr_rerank: the corpus-scale work (scoring +
    top-20 cut) happens upstream in brute_force_topk; the greedy
    recursion over the bounded candidates runs driver-side (bounded
    model state — see the operator docstring for the measured
    comparison against the all-DataFrame formulations). The oracle
    unrolls the same greedy recursion as chained CTEs over the
    identical rounded inputs.
    """
    from sqlitedataframe_spark.operators.retrieval import mmr_rerank
    from sqlitedataframe_spark.operators import similarity as S

    emb = T(spark, sf_dir, "embeddings")
    qdf = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    cand = S.brute_force_topk(emb, qdf, k=20)
    cvec = cand.join(emb, "vec_id").select(
        "vec_id", "cos_sim", S.as_double("embedding").alias("_v")
    )
    a = cvec.select(F.col("vec_id").alias("_pa"), F.col("_v").alias("_va"))
    b = cvec.select(F.col("vec_id").alias("_pb"), F.col("_v").alias("_vb"))
    sims = a.join(b, F.col("_pa") != F.col("_pb")).select(
        "_pa", "_pb",
        F.round(S.cosine(F.col("_va"), F.col("_vb")), 6).alias("_sim"),
    )
    return mmr_rerank(
        cand, sims, id_col="vec_id", rel_col="cos_sim",
        k=_MMR_K, lam=_MMR_LAM,
    )


@query(
    "events_rolling_dau_wau",
    oracle="""
    WITH act AS (
      SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events),
    dc AS (SELECT d AS day, COUNT(*) AS n_d FROM act GROUP BY 1),
    ex AS (
      SELECT DISTINCT u, d + CAST(r.i AS INTEGER) AS day
      FROM act, UNNEST(generate_series(0, 6)) AS r(i)),
    wc AS (SELECT day, COUNT(*) AS n_w FROM ex GROUP BY 1)
    SELECT dc.day AS day, CAST(n_d AS BIGINT) AS dau,
           CAST(n_w AS BIGINT) AS wau,
           ROUND(n_d / CAST(n_w AS DOUBLE), 4) AS stickiness
    FROM dc JOIN wc USING (day) ORDER BY day
    """,
)
def events_rolling_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily actives, rolling 7-day actives, and DAU/WAU stickiness per
    day — the standard engagement dashboard triple.

    operators.relational.rolling_active_users: no COUNT(DISTINCT) over a
    sliding window (doesn't compose, re-scans per day) — each distinct
    (user, day) row expands map-side to the 7 future days it covers,
    then two key aggregates finish. No windows at all.
    """
    from sqlitedataframe_spark.operators.relational import rolling_active_users

    return rolling_active_users(
        T(spark, sf_dir, "events"), "user_id", "ts", window_days=7
    )


@query(
    "text_zipf_fit",
    oracle="""
    WITH cnt AS (
      SELECT u.tok, COUNT(*) AS n
      FROM (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS t
            FROM documents) d,
           UNNEST(d.t) AS u(tok)
      GROUP BY u.tok ORDER BY n DESC, u.tok LIMIT 500),
    xy AS (
      SELECT ln(CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS DOUBLE)) AS x,
             ln(CAST(n AS DOUBLE)) AS y
      FROM cnt),
    agg AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS nn,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
      FROM xy)
    SELECT ROUND((nn * sxy - sx * sy) / (nn * sxx - sx * sx), 6) AS zipf_slope,
           ROUND((sy - (nn * sxy - sx * sy) / (nn * sxx - sx * sx) * sx) / nn,
                 6) AS intercept,
           ROUND(((nn * sxy - sx * sy)
                  / sqrt((nn * sxx - sx * sx) * (nn * syy - sy * sy)))
                 * ((nn * sxy - sx * sy)
                    / sqrt((nn * sxx - sx * sx) * (nn * syy - sy * sy))),
                 6) AS r2,
           CAST(nn AS BIGINT) AS n_tokens
    FROM agg
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus rank-frequency curve: OLS slope of
    ln(freq) on ln(rank) over the top-500 tokens, with r^2 — natural
    text sits near slope -1; strong deviation fingerprints synthetic or
    boilerplate-heavy corpora.

    operators.text.zipf_fit: vocabulary-sized count aggregate, top-500
    TakeOrderedAndProject cut, ranks over the BOUNDED list only, 1-row
    closed-form OLS.
    """
    from sqlitedataframe_spark.operators.text import zipf_fit

    return zipf_fit(T(spark, sf_dir, "documents"), top_n=500)


@query(
    "basket_lift_rules",
    oracle="""
    WITH slim AS (
      SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
    nb AS (SELECT COUNT(DISTINCT g) AS n_baskets FROM slim),
    itemn AS (SELECT i, COUNT(*) AS ni FROM slim GROUP BY 1),
    pairs AS (
      SELECT a.i AS ante, b.i AS cons, COUNT(*) AS nab
      FROM slim a JOIN slim b ON a.g = b.g AND a.i <> b.i
      GROUP BY 1, 2 HAVING COUNT(*) >= 3)
    SELECT ante, cons, CAST(nab AS BIGINT) AS n_ab,
           ROUND(CAST(nab AS DOUBLE) / na.ni, 6) AS confidence,
           ROUND(CAST(nab AS DOUBLE) / na.ni * n_baskets / nc.ni, 6) AS lift
    FROM pairs
    JOIN itemn na ON na.i = ante
    JOIN itemn nc ON nc.i = cons, nb
    ORDER BY lift DESC, ante, cons LIMIT 20
    """,
)
def basket_lift_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed association rules part_a -> part_b over order baskets
    with confidence and lift (top-20 by lift, support >= 3) — the
    Agrawal/Srikant completion of the raw pair-support view
    (basket_part_pairs): lift > 1 marks genuine association.

    operators.mining.association_rules: inherits the cooccurrence
    scale shape (distinct basket rows, reusable exchange, mega-basket
    guard); item frequencies join by key and the basket total is a
    1-row broadcast; all ratio inputs are integer counts.
    """
    from sqlitedataframe_spark.operators.mining import association_rules

    return association_rules(
        T(spark, sf_dir, "lineitem"), "l_orderkey", "l_partkey",
        min_support=3, k=20,
    )


@query(
    "agg_bootstrap_ci",
    oracle="""
    WITH r AS (SELECT o_orderkey AS k, o_totalprice AS v FROM orders),
    x AS (
      SELECT b.i AS b, v,
             CAST('0x' || substr(md5(CAST(k AS VARCHAR) || ':'
                                      || CAST(b.i // 4 AS VARCHAR)),
                                 1 + 8 * CAST(b.i % 4 AS INT), 8)
                  AS BIGINT) / 4294967296.0 AS u
      FROM r, UNNEST(generate_series(0, 99)) AS b(i)),
    w AS (
      SELECT b, v,
             CASE WHEN u < 0.36787944117144233 THEN 0
                  WHEN u < 0.7357588823428847 THEN 1
                  WHEN u < 0.9196986029286058 THEN 2
                  WHEN u < 0.9810118431238462 THEN 3
                  WHEN u < 0.9963401531726563 THEN 4
                  WHEN u < 0.9994058151824183 THEN 5
                  ELSE 6 END AS wt
      FROM x),
    m AS (SELECT b, SUM(wt * v) / SUM(wt) AS mm FROM w GROUP BY b),
    base AS (SELECT ROUND(AVG(v) + 1e-9, 4) AS mean,
                    CAST(COUNT(*) AS BIGINT) AS n FROM r)
    SELECT base.mean,
           ROUND(quantile_cont(mm, 0.025) + 1e-9, 4) AS ci_lo,
           ROUND(quantile_cont(mm, 0.975) + 1e-9, 4) AS ci_hi,
           base.n, CAST(COUNT(*) AS BIGINT) AS b_reps
    FROM m, base GROUP BY base.mean, base.n
    """,
)
def agg_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap confidence interval for the mean order value via
    the POISSON bootstrap (per-row independent Poisson(1) multiplicity
    per replicate — the resampling scheme that needs no global index,
    the standard way to bootstrap data too large to enumerate).

    operators.profiling.poisson_bootstrap_ci — the scale point: NO row
    explosion. All 100 replicates' weighted sums compute in ONE
    partially-combined aggregate pass (scan-side md5 weight draws), so
    the exchange carries a single row regardless of input size; the
    oracle uses the explode formulation (fine at oracle scale) over the
    IDENTICAL md5 weight draws and CDF-ladder literals.
    """
    from sqlitedataframe_spark.operators.profiling import poisson_bootstrap_ci

    return poisson_bootstrap_ci(
        T(spark, sf_dir, "orders"), "o_orderkey", "o_totalprice", b_reps=100
    )


@query(
    "orders_yoy_growth",
    oracle="""
    WITH m AS (
      SELECT EXTRACT(year FROM o_orderdate) AS year,
             EXTRACT(month FROM o_orderdate) AS month,
             ROUND(SUM(o_totalprice) + 1e-9, 2) AS revenue
      FROM orders GROUP BY 1, 2),
    l AS (
      SELECT year, month, revenue,
             LAG(revenue) OVER (PARTITION BY month ORDER BY year) AS prev,
             LAG(year) OVER (PARTITION BY month ORDER BY year) AS py
      FROM m)
    SELECT year, month, revenue,
           CASE WHEN py = year - 1
                THEN ROUND((revenue - prev) / prev * 100 + 1e-9, 4)
           END AS yoy_pct
    FROM l ORDER BY year, month
    """,
)
def orders_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with year-over-year growth percent (NULL where
    the prior year's month is missing) — the standard trend readout.

    operators.relational.yoy_growth: the lag-12 comparison partitions
    the window by MONTH-OF-YEAR, making same-month-last-year exactly
    lag(1) in each of 12 bounded partitions — no unpartitioned
    month-ordered window anywhere.
    """
    from sqlitedataframe_spark.operators.relational import yoy_growth

    return yoy_growth(
        T(spark, sf_dir, "orders"), "o_orderdate", F.sum("o_totalprice")
    )


@query(
    "orders_seasonal_decompose",
    oracle="""
    WITH m AS (
      SELECT EXTRACT(year FROM o_orderdate) AS year,
             EXTRACT(month FROM o_orderdate) AS month,
             ROUND(SUM(o_totalprice) + 1e-9, 2) AS revenue
      FROM orders GROUP BY 1, 2),
    mi AS (SELECT *, year * 12 + month AS idx FROM m),
    tr AS (
      SELECT a.year, a.month, a.revenue,
             ROUND(AVG(b.revenue) + 1e-9, 2) AS trend
      FROM mi a JOIN mi b ON abs(b.idx - a.idx) <= 6
      GROUP BY 1, 2, 3 HAVING COUNT(*) = 13),
    dt AS (SELECT year, month, revenue, trend,
                  revenue - trend AS det FROM tr),
    se AS (SELECT month, ROUND(AVG(det) + 1e-9, 2) + 0.0 AS seasonal
           FROM dt GROUP BY 1)
    SELECT dt.year, dt.month, dt.revenue, dt.trend, se.seasonal,
           ROUND(dt.revenue - dt.trend - se.seasonal + 1e-9, 2) + 0.0 AS residual
    FROM dt JOIN se USING (month) ORDER BY year, month
    """,
)
def orders_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of monthly revenue: centered
    13-month moving-average trend, month-of-year seasonal means of the
    detrended series, residual — the first diagnostic cut on any
    business time series.

    operators.relational.seasonal_decompose: after the one data-sized
    monthly aggregate the frame is #months-sized, so the centered MA is
    a bounded range self-join over month indexes (not a month-ordered
    single-partition window, the audit-banned shape) and the seasonal
    means are a 12-group aggregate.
    """
    from sqlitedataframe_spark.operators.relational import seasonal_decompose

    return seasonal_decompose(
        T(spark, sf_dir, "orders"), "o_orderdate", F.sum("o_totalprice"),
        ma_halfwidth=6,
    )


@query(
    "agg_weighted_median",
    oracle="""
    WITH cents AS (
      SELECT l_returnflag AS g,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS c,
             CAST(l_quantity AS BIGINT) AS w
      FROM lineitem),
    agg AS (SELECT g, c, SUM(w) AS w FROM cents GROUP BY 1, 2),
    cum AS (
      SELECT g, c,
             SUM(w) OVER (PARTITION BY g ORDER BY c) AS cw,
             SUM(w) OVER (PARTITION BY g) AS tot
      FROM agg)
    SELECT g AS l_returnflag, MIN(c) / 100.0 AS weighted_median,
           CAST(MAX(tot) AS BIGINT) AS total_weight
    FROM cum WHERE cw * 2 >= tot GROUP BY g ORDER BY g
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median line price per return flag — the right
    "typical price" when rows carry different volumes (the plain median
    over-weights small lines).

    operators.profiling.weighted_median: EXACT, with no global sort —
    the ascending-value cumulative weight builds with the same
    two-level distributed prefix sum as pareto_classes (log2 cent
    buckets -> partitioned running sums -> <= 64-row bucket-offset
    self-join). Integer cents + integer weights end to end, so the
    oracle's plain running window agrees bit-for-bit.
    """
    from sqlitedataframe_spark.operators.profiling import weighted_median

    return weighted_median(
        T(spark, sf_dir, "lineitem"), "l_extendedprice", "l_quantity",
        group_col="l_returnflag",
    )


@query(
    "text_feature_hashing",
    oracle="""
    WITH nd AS (SELECT COUNT(*) AS n FROM documents),
    p AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(u.tok), 1, 8) AS BIGINT) % 64 AS b
      FROM (SELECT doc_id,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS t
            FROM documents) d,
           UNNEST(d.t) AS u(tok)),
    tf AS (SELECT doc_id, b, COUNT(*) AS tf FROM p GROUP BY 1, 2),
    dfq AS (SELECT b, COUNT(*) AS df FROM tf GROUP BY 1),
    wv AS (
      SELECT doc_id, ROUND(tf * ln(CAST(n AS DOUBLE) / df), 6) AS v
      FROM tf JOIN dfq USING (b), nd)
    SELECT doc_id,
           ROUND(sqrt(SUM(v * v)) + 1e-9, 4) AS l2_norm,
           CAST(COUNT(*) FILTER (WHERE v <> 0) AS BIGINT) AS nnz
    FROM wv GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-64-dim hashed TF-IDF document vectors (the hashing trick,
    Weinberger et al.) — vocabulary-free featurization whose output
    plugs directly into the cosine/ANN/k-means operators; verified here
    through per-document L2 norm and nonzero count over the dense
    array.

    operators.text.hashed_tfidf_features: postings carry (id, 6-bit
    bucket) only; the dim-sized bucketed-df table broadcasts; the dense
    vector assembles map-side from a bucket->value map. No vocabulary
    dictionary, no per-component shuffle.
    """
    from sqlitedataframe_spark.operators.text import hashed_tfidf_features

    feats = hashed_tfidf_features(T(spark, sf_dir, "documents"), dim=64)
    v = F.col("features")
    return feats.select(
        "doc_id",
        F.round(
            F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x)) + 1e-9,
            4,
        ).alias("l2_norm"),
        F.size(F.filter(v, lambda x: x != 0)).cast("bigint").alias("nnz"),
    ).orderBy("doc_id")


@query(
    "sample_kfold_folds",
    oracle="""
    SELECT CAST(floor(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                           AS BIGINT) * 5 / 65536.0) AS INT) AS fold,
           lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY 1, 2 ORDER BY fold, lang
    """,
)
def sample_kfold_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-fold cross-validation assignment with per-fold
    language balance — reproducible across engines/reruns/partitioning
    like every sampler here (md5-hash folds, zero shuffles to assign).

    operators.sampling.kfold_assign; with a group column the fold hash
    moves to the group for leakage-safe CV (same rule as
    sample_split_by_group).
    """
    from sqlitedataframe_spark.operators.sampling import kfold_assign

    d = kfold_assign(T(spark, sf_dir, "documents"), "doc_id", n_folds=5)
    return (
        d.groupBy("fold", "lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("fold", "lang")
    )


@query(
    "part_price_elasticity",
    oracle="""
    WITH pp AS (
      SELECT l_partkey,
             SUM(l_extendedprice) / SUM(l_quantity) AS unit_price,
             SUM(l_quantity) AS total_qty
      FROM lineitem GROUP BY 1),
    j AS (
      SELECT p.p_brand, ln(unit_price) AS x, ln(total_qty) AS y
      FROM pp JOIN part p ON p.p_partkey = pp.l_partkey
      WHERE unit_price > 0 AND total_qty > 0),
    agg AS (
      SELECT p_brand, CAST(COUNT(*) AS DOUBLE) AS nn,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
      FROM j GROUP BY 1)
    SELECT p_brand,
           ROUND((nn * sxy - sx * sy) / (nn * sxx - sx * sx), 6) AS slope,
           ROUND(((nn * sxy - sx * sy)
                  / sqrt((nn * sxx - sx * sx) * (nn * syy - sy * sy)))
                 * ((nn * sxy - sx * sy)
                    / sqrt((nn * sxx - sx * sx) * (nn * syy - sy * sy))),
                 6) AS r2,
           CAST(nn AS BIGINT) AS n_points
    FROM agg ORDER BY p_brand
    """,
)
def part_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand price elasticity: OLS slope of ln(total quantity) on
    ln(average unit price) across the brand's parts — the classic
    log-log demand regression (slope ~ elasticity; r^2 says whether the
    power-law story holds at all).

    operators.profiling.grouped_log_log_slope over a part-level
    pre-aggregate joined to the part dimension: one fact aggregate
    (shuffles on partkey), a dimension join, and the five OLS moments
    partially combined per brand — |brands| rows cross the final
    exchange.
    """
    from sqlitedataframe_spark.operators.profiling import grouped_log_log_slope

    li = T(spark, sf_dir, "lineitem")
    pp = li.groupBy("l_partkey").agg(
        (F.sum("l_extendedprice") / F.sum("l_quantity")).alias("unit_price"),
        F.sum("l_quantity").alias("total_qty"),
    )
    p = T(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = pp.join(p, pp.l_partkey == p.p_partkey)
    return grouped_log_log_slope(joined, "p_brand", "unit_price", "total_qty")


@query(
    "graph_degree_stats",
    oracle="""
    WITH slim AS (
      SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
    e AS (
      SELECT DISTINCT a.i AS x, b.i AS y
      FROM slim a JOIN slim b ON a.g = b.g AND a.i <> b.i),
    deg AS (SELECT x, COUNT(*) AS d FROM e GROUP BY 1),
    al AS (
      SELECT ROUND(1.0 + COUNT(*) / SUM(ln(d / 1.5)), 4) AS alpha,
             CAST(COUNT(*) AS BIGINT) AS n_tail_nodes
      FROM deg WHERE d >= 2)
    SELECT CAST(floor(log2(d)) AS INT) AS deg_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           ROUND(AVG(d) + 1e-9, 4) AS avg_degree,
           al.alpha, al.n_tail_nodes
    FROM deg, al
    GROUP BY 1, al.alpha, al.n_tail_nodes ORDER BY 1
    """,
)
def graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-distribution profile of the part co-purchase graph:
    log2-degree histogram with node counts and mean degree, plus the
    continuous-MLE power-law exponent over the d >= 2 tail — the
    diagnostic that says whether hub guards (max_basket, hot-bucket
    caps) are needed and where to set them.

    operators.graph.degree_stats: degrees are one aggregate over the
    deduped both-direction edge list; buckets and the alpha moments
    aggregate the node-sized degree table; alpha rides back as a 1-row
    broadcast.
    """
    from sqlitedataframe_spark.operators.graph import degree_stats

    li = T(spark, sf_dir, "lineitem")
    slim = li.select(
        F.col("l_orderkey").alias("g"), F.col("l_partkey").alias("i")
    ).distinct()
    a = slim.select("g", F.col("i").alias("item_a"))
    b = slim.select("g", F.col("i").alias("item_b"))
    pairs = (
        a.join(b, "g")
        .filter(F.col("item_a") < F.col("item_b"))
        .select("item_a", "item_b")
        .distinct()
    )
    return degree_stats(pairs, "item_a", "item_b", d_min=2)


@query(
    "text_langid_confusion",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, text, string_split(lower(trim(text)), ' ') AS toks
      FROM documents),
    feats AS (
      SELECT doc_id, text,
             CAST(len(list_filter(toks, x -> list_contains(
                 ['the','a','an','and','or','of','to','in','is','it'], x)))
               AS DOUBLE) / len(toks) AS sw_ratio
      FROM t),
    pred AS (
      SELECT doc_id,
             CASE WHEN LENGTH(regexp_replace(text,
                      '[^\x{4e00}-\x{9fff}]', '', 'g')) > 0 THEN 'zh'
                  WHEN sw_ratio >= 0.08 THEN 'en'
                  WHEN LENGTH(regexp_replace(text,
                      '[^\x{e0}-\x{ff}]', '', 'g')) > 0 THEN 'fr'
                  ELSE 'unknown' END AS lang_pred
      FROM feats),
    j AS (
      SELECT d.lang, p.lang_pred
      FROM documents d JOIN pred p USING (doc_id)),
    cm AS (SELECT lang, lang_pred, COUNT(*) AS n FROM j GROUP BY 1, 2),
    tot AS (SELECT lang, SUM(n) AS nt FROM cm GROUP BY 1)
    SELECT cm.lang, cm.lang_pred, CAST(cm.n AS BIGINT) AS n,
           ROUND(cm.n / CAST(tot.nt AS DOUBLE), 6) AS frac_of_lang
    FROM cm JOIN tot USING (lang)
    ORDER BY lang, lang_pred
    """,
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the heuristic language-ID against the labeled
    lang column, with per-true-language fractions — the eval view every
    classifier-based curation filter needs before it gates data (which
    languages does the cheap model throw away?).

    Same deterministic predictor as text_langid (so the oracle reuses
    its SQL twin verbatim); the matrix is one |langs|^2 aggregate and a
    broadcast of per-language totals.
    """
    from sqlitedataframe_spark.operators.text import lang_id

    d = T(spark, sf_dir, "documents")
    j = d.select("lang", lang_id("text").alias("lang_pred"))
    cm = j.groupBy("lang", "lang_pred").agg(F.count(F.lit(1)).alias("n"))
    tot = cm.groupBy("lang").agg(F.sum("n").alias("nt"))
    return (
        cm.join(F.broadcast(tot), "lang")
        .select(
            "lang", "lang_pred",
            F.col("n").cast("bigint").alias("n"),
            F.round(F.col("n") / F.col("nt"), 6).alias("frac_of_lang"),
        )
        .orderBy("lang", "lang_pred")
    )


@query(
    "events_funnel_timing",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id),
    full_f AS (
      SELECT v.user_id,
             (epoch(c.t_click) - epoch(v.t_view)) / 3600.0 AS vc_h,
             (epoch(p.t_purchase) - epoch(c.t_click)) / 3600.0 AS cp_h
      FROM v JOIN c USING (user_id) JOIN p USING (user_id))
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converters,
           ROUND(quantile_cont(vc_h, 0.5) + 1e-9, 4) AS p50_view_click_h,
           ROUND(AVG(vc_h) + 1e-9, 4) AS avg_view_click_h,
           ROUND(quantile_cont(cp_h, 0.5) + 1e-9, 4) AS p50_click_purchase_h,
           ROUND(AVG(cp_h) + 1e-9, 4) AS avg_click_purchase_h
    FROM full_f
    """,
)
def events_funnel_timing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion timing over the strictly-ordered view -> click ->
    purchase funnel: median and mean hours per transition among users
    who completed all three steps — the "where does the funnel stall"
    readout that complements the stage-count view (events_funnel).

    operators.mining.funnel_stage_times: each stage is a min-timestamp
    aggregate joined to the previous stage, all co-partitioned on the
    user key; the timing summary is a 1-row aggregate with Spark's
    exact interpolated percentile (= DuckDB quantile_cont).
    """
    from sqlitedataframe_spark.operators.mining import funnel_stage_times

    st = funnel_stage_times(
        T(spark, sf_dir, "events"), "user_id", "ts", "event_type",
        steps=["view", "click", "purchase"],
    )
    # cast("double") keeps the microsecond fraction (= DuckDB epoch());
    # unix_timestamp() would truncate to whole seconds and drift the
    # interpolated percentiles by up to 1/3600 h
    def _s(c):
        return F.col(c).cast("timestamp").cast("double")

    vc = (_s("t_click") - _s("t_view")) / 3600.0
    cp = (_s("t_purchase") - _s("t_click")) / 3600.0
    staged = st.select(vc.alias("vc_h"), cp.alias("cp_h"))
    return staged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converters"),
        F.round(F.expr("percentile(vc_h, 0.5)") + 1e-9, 4).alias("p50_view_click_h"),
        F.round(F.avg("vc_h") + 1e-9, 4).alias("avg_view_click_h"),
        F.round(F.expr("percentile(cp_h, 0.5)") + 1e-9, 4).alias("p50_click_purchase_h"),
        F.round(F.avg("cp_h") + 1e-9, 4).alias("avg_click_purchase_h"),
    )


@query(
    "supplier_ship_lag",
    oracle="""
    WITH lag_t AS (
      SELECT l.l_suppkey,
             date_diff('day', o.o_orderdate, l.l_shipdate) AS lag_days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
    s AS (
      SELECT l_suppkey,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             ROUND(AVG(lag_days) + 1e-9, 4) AS avg_lag_days,
             ROUND(quantile_cont(lag_days, 0.9) + 1e-9, 4) AS p90_lag_days
      FROM lag_t GROUP BY 1)
    SELECT * FROM s ORDER BY p90_lag_days DESC, l_suppkey LIMIT 25
    """,
)
def supplier_ship_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Worst-25 suppliers by 90th-percentile order-to-ship lag (days),
    with mean and volume — the supply-chain SLA screen.

    Fact-fact join on the order key (both sides shuffle once on the same
    key — co-partitioned, broadcast-free at any scale), then one
    per-supplier aggregate with Spark's exact interpolated percentile
    (= DuckDB quantile_cont); top-25 is TakeOrderedAndProject.
    """
    li = T(spark, sf_dir, "lineitem").select("l_suppkey", "l_orderkey", "l_shipdate")
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lag = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_suppkey",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("lag_days"),
    )
    return (
        lag.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.round(F.avg("lag_days") + 1e-9, 4).alias("avg_lag_days"),
            F.round(F.expr("percentile(lag_days, 0.9)") + 1e-9, 4).alias("p90_lag_days"),
        )
        .orderBy(F.col("p90_lag_days").desc(), "l_suppkey")
        .limit(25)
    )


@query(
    "orders_hhi_concentration",
    oracle="""
    WITH rev AS (
      SELECT n.n_name, l.l_suppkey,
             SUM(l.l_extendedprice * (1 - l.l_discount)) AS r
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      GROUP BY 1, 2),
    tot AS (SELECT n_name, SUM(r) AS tr FROM rev GROUP BY 1)
    SELECT rev.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           ROUND(SUM((rev.r / tot.tr) * (rev.r / tot.tr)) + 1e-9, 6) AS hhi
    FROM rev JOIN tot USING (n_name)
    GROUP BY rev.n_name ORDER BY rev.n_name
    """,
)
def orders_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of supplier revenue within
    each nation: HHI = sum of squared revenue shares (1/n = perfectly
    even, 1.0 = monopoly) — the standard market-concentration screen,
    and the single-number complement to the Pareto class view.

    One fact aggregate to (nation, supplier) revenue (shuffles on the
    supplier key after two broadcast dimension joins), per-nation totals
    broadcast back, and a |nations|-row final aggregate. Shares are
    ratios of same-engine sums; the +1e-9 guards the 6 dp rounding.
    """
    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name", "l_suppkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("r")
        )
    )
    tot = rev.groupBy("n_name").agg(F.sum("r").alias("tr"))
    share = F.col("r") / F.col("tr")
    return (
        rev.join(F.broadcast(tot), "n_name")
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
            F.round(F.sum(share * share) + 1e-9, 6).alias("hhi"),
        )
        .orderBy("n_name")
    )
