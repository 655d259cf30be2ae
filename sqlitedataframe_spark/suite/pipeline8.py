"""Round-5 closing wave: data-quality audits (referential integrity,
key candidates, chi-square association), feature engineering (quantile
bins, leakage-free target encoding, winsorized moments), retrieval
evaluation (nDCG/MRR), an EWMA health line, cross-source n-gram overlap,
and exact per-group mode.

Like every suite module, each query pairs an idiomatic-Spark plan with a
DuckDB oracle the driver hash-compares at sf0.01. Reference parity: the
reference (jackpal/SQLiteDataFrame) delegates querying to SQLite
pass-through (SQLiteDataFrame.swift:295-304); these are Tier-D
training-pipeline extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlitedataframe_spark.suite import query
from sqlitedataframe_spark.suite.relational import T
from sqlitedataframe_spark.suite.pipeline6 import BM25_QUERY_TERMS


@query(
    "audit_referential",
    oracle="""
    WITH rel AS (
      SELECT 'customer.nationkey->nation' AS relation,
             CAST(COUNT(*) AS BIGINT) AS child_rows,
             CAST(SUM(CASE WHEN p._k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS orphan_rows
      FROM customer c LEFT JOIN
           (SELECT DISTINCT n_nationkey AS _k FROM nation) p
           ON c.c_nationkey = p._k
      UNION ALL
      SELECT 'events.user_id->customer', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN p._k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM events e LEFT JOIN
           (SELECT DISTINCT c_custkey AS _k FROM customer) p
           ON e.user_id = p._k
      UNION ALL
      SELECT 'lineitem.orderkey->orders', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN p._k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM lineitem l LEFT JOIN
           (SELECT DISTINCT o_orderkey AS _k FROM orders) p
           ON l.l_orderkey = p._k
      UNION ALL
      SELECT 'lineitem.partkey->part', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN p._k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM lineitem l LEFT JOIN
           (SELECT DISTINCT p_partkey AS _k FROM part) p
           ON l.l_partkey = p._k
      UNION ALL
      SELECT 'lineitem.suppkey->supplier', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN p._k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM lineitem l LEFT JOIN
           (SELECT DISTINCT s_suppkey AS _k FROM supplier) p
           ON l.l_suppkey = p._k
      UNION ALL
      SELECT 'orders.custkey->customer', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN p._k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders o LEFT JOIN
           (SELECT DISTINCT c_custkey AS _k FROM customer) p
           ON o.o_custkey = p._k
    )
    SELECT relation, child_rows, orphan_rows,
           ROUND(orphan_rows * 100.0 / child_rows + 1e-9, 4) AS orphan_pct
    FROM rel ORDER BY relation
    """,
)
def audit_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema's FK edges
    (plus the deliberately unconstrained events.user_id): child rows,
    orphan rows, orphan percentage per relationship — the ingest gate
    that catches silently-dropping inner joins before they ship.

    operators.profiling.referential_audit: each fact table reduces to
    its DISTINCT keys (+counts) before any join, so only key-sized
    tables shuffle; the final result is #relations rows.
    """
    from sqlitedataframe_spark.operators.profiling import referential_audit

    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    return referential_audit(
        [
            ("customer.nationkey->nation", c, "c_nationkey",
             T(spark, sf_dir, "nation"), "n_nationkey"),
            ("events.user_id->customer", T(spark, sf_dir, "events"),
             "user_id", c, "c_custkey"),
            ("lineitem.orderkey->orders", li, "l_orderkey", o, "o_orderkey"),
            ("lineitem.partkey->part", li, "l_partkey",
             T(spark, sf_dir, "part"), "p_partkey"),
            ("lineitem.suppkey->supplier", li, "l_suppkey",
             T(spark, sf_dir, "supplier"), "s_suppkey"),
            ("orders.custkey->customer", o, "o_custkey", c, "c_custkey"),
        ]
    )


_ORDERS_COLS = [
    "o_custkey", "o_orderdate", "o_orderkey",
    "o_orderpriority", "o_orderstatus", "o_totalprice",
]


@query(
    "profile_key_candidates",
    oracle="""
    WITH one AS (
      SELECT COUNT(*) AS n,
             COUNT(DISTINCT o_custkey) AS d1,
             SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS z1,
             COUNT(DISTINCT o_orderdate) AS d2,
             SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS z2,
             COUNT(DISTINCT o_orderkey) AS d3,
             SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS z3,
             COUNT(DISTINCT o_orderpriority) AS d4,
             SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS z4,
             COUNT(DISTINCT o_orderstatus) AS d5,
             SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS z5,
             COUNT(DISTINCT o_totalprice) AS d6,
             SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS z6
      FROM orders),
    rows_ AS (
      SELECT 'o_custkey' AS column_name, n, d1 AS d, z1 AS z FROM one
      UNION ALL SELECT 'o_orderdate', n, d2, z2 FROM one
      UNION ALL SELECT 'o_orderkey', n, d3, z3 FROM one
      UNION ALL SELECT 'o_orderpriority', n, d4, z4 FROM one
      UNION ALL SELECT 'o_orderstatus', n, d5, z5 FROM one
      UNION ALL SELECT 'o_totalprice', n, d6, z6 FROM one)
    SELECT column_name, CAST(n AS BIGINT) AS n_rows,
           CAST(d AS BIGINT) AS n_distinct, CAST(z AS BIGINT) AS n_nulls,
           ROUND(d * 1.0 / n + 1e-9, 6) AS distinct_ratio,
           CAST(CASE WHEN d = n AND z = 0 THEN 1 ELSE 0 END AS INT) AS is_key
    FROM rows_ ORDER BY column_name
    """,
)
def profile_key_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key discovery over the orders table: per column, exact
    distinct count, null count, distinct ratio, and a key flag — the
    first profiling pass on an unfamiliar extract, feeding dedup-key and
    join-key choices.

    operators.profiling.key_candidates: ONE aggregate computes every
    column's distinct/null counts together; the per-column rows come
    from a literal unpivot of that 1-row result (no per-column rescans;
    at 100 TB width, swap in approx_count_distinct — this exact form is
    the anchor).
    """
    from sqlitedataframe_spark.operators.profiling import key_candidates

    prof = key_candidates(T(spark, sf_dir, "orders"), _ORDERS_COLS)
    return prof.withColumn(
        "is_key", F.col("is_candidate_key").cast("int")
    ).drop("is_candidate_key")


@query(
    "feature_quantile_bins",
    oracle="""
    WITH b AS (
      SELECT quantile_cont(o_totalprice,
             [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs
      FROM orders)
    SELECT CAST(1 + len(list_filter(bs, x -> x < o_totalprice)) AS INT)
             AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(o_totalprice) + 1e-9, 2) AS bin_min,
           ROUND(MAX(o_totalprice) + 1e-9, 2) AS bin_max,
           ROUND(AVG(o_totalprice) + 1e-9, 2) AS bin_mean
    FROM orders, b GROUP BY 1 ORDER BY 1
    """,
)
def feature_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency decile binning of order totals: exact interior
    percentile boundaries, rows assigned by strict boundary comparison,
    per-bin count/min/max/mean.

    operators.features.quantile_bins: boundaries are one global
    percentile aggregate broadcast back; bin assignment is a scan-side
    array fold — crucially NOT a global NTILE window (the audit-banned
    single-partition sort) — and the rollup is a 10-group aggregate.
    """
    from sqlitedataframe_spark.operators.features import quantile_bins

    return quantile_bins(T(spark, sf_dir, "orders"), "o_totalprice", n_bins=10)


@query(
    "feature_target_encode",
    oracle="""
    WITH med AS (SELECT quantile_cont(o_totalprice, 0.5) AS m FROM orders),
    base AS (
      SELECT c_mktsegment,
             CASE WHEN o_totalprice > med.m THEN 1.0 ELSE 0.0 END AS t
      FROM orders JOIN customer ON o_custkey = c_custkey, med),
    pr AS (SELECT AVG(t) AS p FROM base),
    cat AS (SELECT c_mktsegment, SUM(t) AS s, COUNT(*) AS cn
            FROM base GROUP BY 1)
    SELECT base.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG((s - t + 10.0 * p) / (cn - 1 + 10.0)) + 1e-9, 6)
             AS enc_mean,
           ROUND(MIN((s - t + 10.0 * p) / (cn - 1 + 10.0)) + 1e-9, 6)
             AS enc_min,
           ROUND(MAX((s - t + 10.0 * p) / (cn - 1 + 10.0)) + 1e-9, 6)
             AS enc_max
    FROM base JOIN cat USING (c_mktsegment), pr
    GROUP BY base.c_mktsegment ORDER BY base.c_mktsegment
    """,
)
def feature_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free (leave-one-out, smoothing m=10) target encoding of
    customer market segment against the "above-median order" label,
    reported as the per-segment audit view (n, mean/min/max encoded
    value — the min/max spread shows the LOO correction at work).

    operators.features.target_encode_loo: one category-sized aggregate
    + a 1-row prior broadcast back onto the scan; the fact table
    shuffles once (the orders-customer key join).
    """
    from sqlitedataframe_spark.operators.features import target_encode_loo

    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    med = o.agg(F.percentile("o_totalprice", F.lit(0.5)).alias("_m"))
    base = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(med))
        .select(
            "c_mktsegment",
            F.when(F.col("o_totalprice") > F.col("_m"), 1.0)
            .otherwise(0.0)
            .alias("_t"),
        )
    )
    return target_encode_loo(base, "c_mktsegment", "_t", smoothing=10.0)


@query(
    "agg_winsorized_stats",
    oracle="""
    WITH b AS (
      SELECT l_returnflag AS g,
             quantile_cont(l_extendedprice, 0.05) AS lo,
             quantile_cont(l_extendedprice, 0.95) AS hi
      FROM lineitem GROUP BY 1)
    SELECT g AS l_returnflag,
           ROUND(lo + 1e-9, 4) AS p_lo,
           ROUND(hi + 1e-9, 4) AS p_hi,
           ROUND(AVG(GREATEST(LEAST(l_extendedprice, hi), lo)) + 1e-9, 2)
             AS winsorized_mean,
           ROUND(stddev_samp(GREATEST(LEAST(l_extendedprice, hi), lo))
                 + 1e-9, 2) AS winsorized_sd,
           CAST(SUM(CASE WHEN l_extendedprice < lo THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clipped_low,
           CAST(SUM(CASE WHEN l_extendedprice > hi THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clipped_high
    FROM lineitem JOIN b ON l_returnflag = b.g
    GROUP BY g, lo, hi ORDER BY g
    """,
)
def agg_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean/stddev of line price per return flag: exact
    p05/p95 bounds, tails clamped, clip counts — the robust location
    estimate when raw means are hostage to outliers.

    operators.profiling.winsorized_stats: pass 1 is one percentile
    aggregate per group; bounds ride back via a group-sized broadcast;
    pass 2 is a plain clamped aggregate. Two scans, no wide shuffle
    beyond the group-by.
    """
    from sqlitedataframe_spark.operators.profiling import winsorized_stats

    return winsorized_stats(
        T(spark, sf_dir, "lineitem"), "l_extendedprice", "l_returnflag"
    )


@query(
    "retrieval_ndcg_eval",
    oracle="""
    WITH tok AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
      FROM documents),
    rel AS (
      SELECT doc_id AS id,
             (CASE WHEN len(list_filter(t, x -> x = 'spark')) > 0
                   THEN 1 ELSE 0 END
            + CASE WHEN len(list_filter(t, x -> x = 'join')) > 0
                   THEN 1 ELSE 0 END
            + CASE WHEN len(list_filter(t, x -> x = 'window')) > 0
                   THEN 1 ELSE 0 END) AS rel
      FROM tok),
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
    ranked AS (
      SELECT doc_id AS id, score,
             row_number() OVER (ORDER BY score DESC, doc_id) AS rk
      FROM bmscored WHERE score > 0
      ORDER BY score DESC, doc_id LIMIT 10),
    got AS (
      SELECT ranked.rk, r.rel
      FROM ranked LEFT JOIN (SELECT id, rel FROM rel WHERE rel > 0) r
        USING (id)),
    dcg AS (
      SELECT SUM((power(2.0, COALESCE(rel, 0)) - 1) / log2(rk + 1)) AS dcg,
             COALESCE(MAX(CASE WHEN rel > 0 THEN 1.0 / rk END), 0.0) AS mrr,
             SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS hits
      FROM got),
    ideal AS (
      SELECT rel, row_number() OVER (ORDER BY rel DESC, id) AS rk
      FROM rel ORDER BY rel DESC, id LIMIT 10),
    idcg AS (
      SELECT SUM((power(2.0, rel) - 1) / log2(rk + 1)) AS idcg FROM ideal)
    SELECT ROUND(dcg / idcg + 1e-9, 6) AS ndcg_at_10,
           ROUND(mrr + 1e-9, 6) AS mrr_at_10,
           ROUND(hits / 10.0 + 1e-9, 6) AS precision_at_10,
           CAST(hits AS BIGINT) AS n_relevant_retrieved
    FROM dcg, idcg
    """,
)
def retrieval_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 / MRR@10 / precision@10 of the BM25 ranking against a
    graded relevance label (how many of the 3 query terms the document
    contains) — the offline metric gate for retrieval changes.

    operators.retrieval.ranking_eval: corpus-sized work is only the
    relevance scan (ideal top-k = TakeOrderedAndProject); ranks come
    from a k x k pair count, not a single-partition row_number window.
    """
    from sqlitedataframe_spark.operators.retrieval import ranking_eval
    from sqlitedataframe_spark.operators.text import bm25_topk, tokens

    d = T(spark, sf_dir, "documents")
    ranked = bm25_topk(d, BM25_QUERY_TERMS, k=10)
    tk = tokens("text")
    rel_expr = None
    for term in BM25_QUERY_TERMS:
        c = (F.array_contains(tk, term)).cast("int")
        rel_expr = c if rel_expr is None else rel_expr + c
    relevance = d.select("doc_id", rel_expr.alias("rel"))
    return ranking_eval(
        ranked, relevance, id_col="doc_id", score_col="bm25", k=10
    )


@query(
    "events_chi_square",
    oracle="""
    WITH b AS (
      SELECT quantile_cont(value, [0.25, 0.5, 0.75]) AS bs FROM events),
    bucketed AS (
      SELECT event_type,
             1 + len(list_filter(bs, x -> x < value)) AS bucket
      FROM events, b),
    obs AS (
      SELECT event_type AS r, bucket AS c, COUNT(*) * 1.0 AS obs
      FROM bucketed GROUP BY 1, 2),
    rm AS (SELECT r, SUM(obs) AS rt FROM obs GROUP BY 1),
    cm AS (SELECT c, SUM(obs) AS ct FROM obs GROUP BY 1),
    tot AS (SELECT SUM(obs) AS n FROM obs),
    cells AS (
      SELECT rm.r, cm.c, rm.rt, cm.ct, COALESCE(obs.obs, 0.0) AS o
      FROM rm CROSS JOIN cm LEFT JOIN obs USING (r, c))
    SELECT ROUND(SUM((o - rt * ct / n) * (o - rt * ct / n) / (rt * ct / n))
                 + 1e-9, 4) AS chi2,
           CAST((COUNT(DISTINCT r) - 1) * (COUNT(DISTINCT c) - 1) AS BIGINT)
             AS dof,
           ROUND(sqrt(SUM((o - rt * ct / n) * (o - rt * ct / n)
                          / (rt * ct / n))
                      / (MAX(n) * LEAST(COUNT(DISTINCT r) - 1,
                                        COUNT(DISTINCT c) - 1))) + 1e-9, 4)
             AS cramers_v,
           CAST(MAX(n) AS BIGINT) AS n_obs
    FROM cells, tot
    """,
)
def events_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between event type and the value
    quartile (exact global quartile boundaries), with Cramér's V — the
    association screen between a categorical feature and a bucketed
    numeric before trusting either in a model.

    operators.profiling.chi_square_independence: one contingency
    aggregate (r*c cells), margins/statistic over the tiny cell table;
    boundaries are a 1-row percentile broadcast.
    """
    from sqlitedataframe_spark.operators.profiling import (
        chi_square_independence,
    )

    e = T(spark, sf_dir, "events")
    bounds = e.agg(
        F.percentile("value", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
        .alias("_bs")
    )
    bucketed = e.join(F.broadcast(bounds)).select(
        "event_type",
        (
            F.lit(1)
            + F.aggregate(
                "_bs",
                F.lit(0),
                lambda acc, b: acc + F.when(b < F.col("value"), 1).otherwise(0),
            )
        ).alias("bucket"),
    )
    return chi_square_independence(bucketed, "event_type", "bucket")


@query(
    "events_ewma_daily",
    oracle="""
    WITH daily AS (
      SELECT ts::date AS d, SUM(value) AS x FROM events GROUP BY 1)
    SELECT a.d AS day,
           ROUND(SUM(power(0.8, a.d - b.d) * b.x)
                 / SUM(power(0.8, a.d - b.d)) + 1e-9, 4) AS ewma,
           CAST(COUNT(*) AS BIGINT) AS n_terms
    FROM daily a JOIN daily b ON b.d <= a.d
    GROUP BY 1 ORDER BY 1
    """,
)
def events_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (decay 0.8 per actual day)
    of total daily event value — the smoothed operational health line
    behind alert thresholds.

    operators.profiling.ewma_series: data-sized work is the one daily
    aggregate; the EWMA is a bounded triangular self-join over the
    #days-sized frame (days^2/2 pairs), not a date-ordered
    single-partition window.
    """
    from sqlitedataframe_spark.operators.profiling import ewma_series

    return ewma_series(
        T(spark, sf_dir, "events"), "ts", F.sum("value"), decay=0.8
    )


@query(
    "text_source_overlap",
    oracle="""
    WITH toks AS (SELECT source, string_split(text, ' ') AS t FROM documents),
    grams AS (
      SELECT DISTINCT source, array_to_string(t[i:i+2], ' ') AS gram
      FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS r(i)),
    sizes AS (SELECT source, COUNT(*) AS sz FROM grams GROUP BY 1),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS nc
      FROM grams a JOIN grams b USING (gram)
      WHERE a.source < b.source GROUP BY 1, 2)
    SELECT src_a, src_b, CAST(nc AS BIGINT) AS n_common_grams,
           ROUND(nc * 1.0 / (sa.sz + sb.sz - nc) + 1e-9, 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.source = src_a
    JOIN sizes sb ON sb.source = src_b
    ORDER BY jaccard DESC, src_a, src_b LIMIT 20
    """,
)
def text_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 source pairs by word-trigram Jaccard — which corpus feeds
    are near-mirrors of each other, the double-counting check run
    before assigning per-source mixture weights.

    operators.text.source_ngram_overlap: per-source DISTINCT gram sets
    via one scan + (gram, source) aggregate; the intersection join
    carries (gram, source) only — never text — and the output is
    #sources^2/2 rows with sizes joined as a sources-sized broadcast.
    """
    from sqlitedataframe_spark.operators.text import source_ngram_overlap

    return source_ngram_overlap(
        T(spark, sf_dir, "documents"), n=3, top_pairs=20
    )


@query(
    "agg_exact_mode",
    oracle="""
    WITH c AS (
      SELECT l_returnflag AS g, l_quantity AS q, COUNT(*) AS n
      FROM lineitem GROUP BY 1, 2),
    d AS (SELECT g, COUNT(*) AS nd FROM c GROUP BY 1),
    m AS (
      SELECT g, q, n,
             row_number() OVER (PARTITION BY g ORDER BY n DESC, q ASC) AS rk
      FROM c)
    SELECT m.g AS l_returnflag, ROUND(m.q + 1e-9, 2) AS mode_qty,
           CAST(m.n AS BIGINT) AS mode_count,
           CAST(d.nd AS BIGINT) AS n_distinct_qty
    FROM m JOIN d USING (g) WHERE rk = 1 ORDER BY 1
    """,
)
def agg_exact_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group mode of line quantity (deterministic tie-break:
    smallest value among equal counts), with the modal count and the
    group's distinct-value count — the aggregate SQL engines bolt on as
    ``mode()`` but Spark lacks a deterministic form of.

    Plan shape: one (group, value) count aggregate, then the argmax is
    a max-of-struct over the value-sized frame — no window at all on
    the Spark side (the oracle may use row_number; the driver compares
    results, not plans).
    """
    li = T(spark, sf_dir, "lineitem")
    c = li.groupBy(
        F.col("l_returnflag"), F.col("l_quantity").alias("_q")
    ).agg(F.count(F.lit(1)).alias("_n"))
    best = c.groupBy("l_returnflag").agg(
        F.max(
            F.struct(F.col("_n").alias("n"), (-F.col("_q")).alias("nq"))
        ).alias("_m"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_qty"),
    )
    return best.select(
        "l_returnflag",
        F.round(-F.col("_m.nq") + 1e-9, 2).alias("mode_qty"),
        F.col("_m.n").cast("bigint").alias("mode_count"),
        "n_distinct_qty",
    ).orderBy("l_returnflag")
