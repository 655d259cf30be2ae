"""Round-7 wave: link-prediction scoring (Adamic-Adar) and degree
assortativity on the co-order graph; text corpus-quality screens
(unicode/mojibake, stopword profile, hapax share, type-token ratio);
multi-class eval (macro-F1, McNemar's paired test) over the langid
predictor; robust-scaler feature stats; truncation-robust prefix/suffix
dedup groups; column-entropy and functional-dependency profiling; Welch's
one-vs-rest t-test; embedding norm/dimension QA; a REAL-pixel PNG
encode-decode round-trip gated by a closed-form oracle; and corrupt-record
JSON ingestion auditing.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sqlitedataframe_spark.operators import evalmetrics as E
from sqlitedataframe_spark.operators import text as X
from sqlitedataframe_spark.operators.dedup import prefix_suffix_groups
from sqlitedataframe_spark.operators.features import robust_scale_stats
from sqlitedataframe_spark.operators.graph import adamic_adar, degree_assortativity
from sqlitedataframe_spark.operators.multimodal import png_roundtrip_dims
from sqlitedataframe_spark.operators.profiling import (
    column_entropy,
    fd_candidates,
    median_of_means,
    welch_ttest_onevsrest,
)
from sqlitedataframe_spark.operators.relational import peak_days
from sqlitedataframe_spark.operators.similarity import (
    dimension_variance,
    kcenter_coreset,
    norm_stats,
)
from sqlitedataframe_spark.suite import query
from sqlitedataframe_spark.suite.relational import T

#: Shared co-order graph CTEs (same edge set as graph_triangles /
#: graph_jaccard_neighbors in pipeline12, including the hub-cap replay).
_GRAPH_CTE = """
    slim AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    e AS (
      SELECT a.p AS u, b.p AS v
      FROM slim a JOIN slim b ON a.o = b.o AND a.p < b.p
      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    adj AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
    deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM adj GROUP BY 1),
    wedge AS (
      SELECT u, v FROM (
        SELECT u, v, COUNT(*) OVER (PARTITION BY v) AS _wn FROM adj)
      WHERE _wn <= 10000)
"""

#: The deterministic langid predictor's SQL twin (verbatim from
#: text_langid_confusion, pipeline7 — one predictor, one oracle).
_LANGID_PRED_CTE = r"""
    t AS (
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
      FROM feats)
"""


def _coorder_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-order part-pair edge list, built ONCE per (app, sf_dir) via the
    keyed shared cache (VERDICT r9 #4): ~10 graph queries derive from
    exactly this frame, and a bench pass re-runs each up to 5 reps — the
    per-order self-join was recomputed every time and dominated
    graph_local_clustering's solo wall. The frame is id-sized (two
    bigints per surviving edge), so caching it follows the MinHash
    signature-table precedent, not a data-sized collect."""
    from sqlitedataframe_spark.operators.util import shared_eager_cache

    def build() -> DataFrame:
        li = T(spark, sf_dir, "lineitem")
        slim = li.select("l_orderkey", "l_partkey").distinct()
        a = slim.select(
            F.col("l_orderkey").alias("_o"), F.col("l_partkey").alias("src")
        )
        b = slim.select(
            F.col("l_orderkey").alias("_o"), F.col("l_partkey").alias("dst")
        )
        return (
            a.join(b, "_o")
            .filter(F.col("src") < F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") >= 2)
            .select("src", "dst")
        )

    return shared_eager_cache(spark, ("coorder_edges", sf_dir), build)


# ---------------------------------------------------------------------------
# Adamic-Adar link prediction.
# ---------------------------------------------------------------------------
@query(
    "graph_adamic_adar",
    oracle=f"""
    WITH {_GRAPH_CTE},
    aa AS (
      SELECT a.u AS x, b.u AS y, CAST(COUNT(*) AS BIGINT) AS cn,
             ROUND(SUM(1.0 / LN(dw.deg)) + 1e-9, 6) AS aa_score
      FROM wedge a JOIN wedge b ON a.v = b.v AND a.u < b.u
      JOIN deg dw ON dw.u = a.v
      GROUP BY 1, 2),
    nonadj AS (
      SELECT aa.x, aa.y, aa.cn, aa.aa_score FROM aa
      ANTI JOIN e ON aa.x = e.u AND aa.y = e.v)
    SELECT x AS u, y AS v, cn, aa_score
    FROM nonadj ORDER BY aa_score DESC, u, v LIMIT 20
    """,
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 predicted links on the part co-order graph by Adamic-Adar
    (degree-discounted shared neighbors: a shared RARE co-purchase is
    strong evidence, a shared hub is weak) — the standard companion
    score to neighborhood Jaccard.

    operators.graph.adamic_adar: normalized edges, one wedge equi-join
    with the 1/ln(deg) weight joined onto the center pre-aggregation,
    hub cap replayed in the oracle's wedge CTE, TakeOrdered top-k.
    """
    return adamic_adar(_coorder_edges(spark, sf_dir), top_k=20)


# ---------------------------------------------------------------------------
# Degree assortativity.
# ---------------------------------------------------------------------------
@query(
    "graph_assortativity",
    oracle=f"""
    WITH {_GRAPH_CTE},
    pairs AS (
      SELECT du.deg AS x, dv.deg AS y
      FROM adj JOIN deg du ON adj.u = du.u JOIN deg dv ON adj.v = dv.u),
    a AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m2,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             -- products formed in HUGEINT: exact past int64 on hub-heavy
             -- graphs, mirroring the engine's DECIMAL(38,0) sums
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(x AS HUGEINT) * x) AS sx2,
             SUM(CAST(y AS HUGEINT) * y) AS sy2
      FROM pairs)
    SELECT m2,
           ROUND(CASE WHEN sqrt((CAST(m2 AS DOUBLE) * sx2
                                 - CAST(sx AS DOUBLE) * sx)
                                * (CAST(m2 AS DOUBLE) * sy2
                                   - CAST(sy AS DOUBLE) * sy)) > 0
                 THEN (CAST(m2 AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                      / sqrt((CAST(m2 AS DOUBLE) * sx2
                              - CAST(sx AS DOUBLE) * sx)
                             * (CAST(m2 AS DOUBLE) * sy2
                                - CAST(sy AS DOUBLE) * sy))
                 END + 1e-9, 6) + 0.0 AS assortativity
    FROM a
    """,
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the part co-order graph — do popular parts
    co-occur with popular parts (r > 0) or with long-tail ones (r < 0)?
    The structural one-liner that predicts whether hub caps will engage.

    operators.graph.degree_assortativity: one degree aggregate, two
    vertex-keyed joins, one 1-row moment aggregate; exact wide-integer
    product sums (DECIMAL(38,0) ⇄ HUGEINT — int64-overflow-proof on
    celebrity hubs), one closed-form float from those exact sums.
    """
    return degree_assortativity(_coorder_edges(spark, sf_dir))


# ---------------------------------------------------------------------------
# Unicode / mojibake quality screen.
# ---------------------------------------------------------------------------
@query(
    "text_unicode_quality",
    oracle=r"""
    WITH per AS (
      SELECT source,
             CAST(LENGTH(text) - LENGTH(regexp_replace(text,
                  '[\x00-\x08\x0b\x0c\x0e-\x1f]', '', 'g')) AS BIGINT) AS ctrl,
             (LENGTH(text) - LENGTH(regexp_replace(text,
                  '[^\x00-\x7f]', '', 'g')))
               / CAST(LENGTH(text) AS DOUBLE) AS na,
             CAST(LENGTH(text) - LENGTH(regexp_replace(text,
                  '\x{fffd}', '', 'g')) AS BIGINT) AS repl,
             (LENGTH(text) - LENGTH(regexp_replace(text,
                  '[ \t\n\r\f]', '', 'g')))
               / CAST(LENGTH(text) AS DOUBLE) AS ws
      FROM documents WHERE LENGTH(text) > 0)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(ctrl) + 1e-9, 6) AS avg_ctrl_chars,
           ROUND(AVG(na) + 1e-9, 6) AS avg_non_ascii_ratio,
           CAST(SUM(repl) AS BIGINT) AS n_replacement_chars,
           ROUND(AVG(ws) + 1e-9, 6) AS avg_ws_ratio
    FROM per GROUP BY source ORDER BY source
    """,
)
def text_unicode_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source mojibake/garbage screen: control chars, non-ASCII
    ratio, U+FFFD replacement chars, whitespace ratio — the cheap
    first-pass filter that catches broken decodes and whitespace spam.

    operators.text.unicode_quality: four vectorized regexp length-diffs
    inside the scan (character classes spelled as explicit ranges so
    Java regex and RE2 count identically), one group aggregate.
    """
    return X.unicode_quality(T(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Stopword profile.
# ---------------------------------------------------------------------------
_STOP_SQL = ", ".join(f"'{w}'" for w in X.STOPWORDS_EN)


@query(
    "text_stopword_profile",
    oracle=rf"""
    WITH per AS (
      SELECT lang,
             CAST(len(regexp_split_to_array(lower(trim(text)), '\s+'))
                  AS BIGINT) AS n,
             CAST(len(list_filter(
                  regexp_split_to_array(lower(trim(text)), '\s+'),
                  x -> list_contains([{_STOP_SQL}], x))) AS BIGINT) AS stop
      FROM documents)
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS n_tokens,
           CAST(SUM(stop) AS BIGINT) AS n_stop_tokens,
           ROUND(SUM(stop) / CAST(SUM(n) AS DOUBLE) + 1e-9, 6) AS stop_ratio
    FROM per WHERE n > 0 GROUP BY lang ORDER BY lang
    """,
)
def text_stopword_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language stopword-token ratio against a fixed 20-word English
    list — near the English baseline for 'en', near zero elsewhere; the
    register fingerprint quality gates and cheap langid features share.

    operators.text.stopword_profile: map-side array filter against a
    literal list (no join, no explode), one group aggregate.
    """
    return X.stopword_profile(T(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Hapax legomena share.
# ---------------------------------------------------------------------------
@query(
    "text_hapax_ratio",
    oracle=r"""
    WITH freq AS (
      SELECT source, tok, COUNT(*) AS f
      FROM (SELECT source,
                   unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
            FROM documents)
      GROUP BY 1, 2)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab,
           CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
           ROUND(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE) + 1e-9, 6) AS hapax_ratio
    FROM freq GROUP BY source ORDER BY source
    """,
)
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source hapax share (fraction of vocabulary occurring once) —
    high = rich/long-tail text or OCR noise, low = boilerplate; the
    vocabulary-health companion to the Zipf/Heaps fits.

    operators.text.hapax_ratio: one explode, one (source, token) count,
    one source rollup — two bounded-key shuffles.
    """
    return X.hapax_ratio(T(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Type-token ratio (overall + length-controlled prefix).
# ---------------------------------------------------------------------------
@query(
    "text_ttr",
    oracle=r"""
    WITH per AS (
      SELECT lang,
             len(list_distinct(t)) / CAST(len(t) AS DOUBLE) AS ttr,
             len(list_distinct(t[1:100])) / CAST(len(t[1:100]) AS DOUBLE)
               AS pttr
      FROM (SELECT lang,
                   regexp_split_to_array(lower(trim(text)), '\s+') AS t
            FROM documents)
      WHERE len(t) > 0)
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(ttr) + 1e-9, 6) AS avg_ttr,
           ROUND(AVG(pttr) + 1e-9, 6) AS avg_prefix_ttr
    FROM per GROUP BY lang ORDER BY lang
    """,
)
def text_ttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language type-token ratio, raw and over the first 100 tokens
    (the length-controlled form that makes TTR comparable across
    document sizes) — lexical-diversity screen for corpus mixes.

    operators.text.ttr_stats: both ratios are map-side array expressions
    (array_distinct + slice, no explode); one group aggregate.
    """
    return X.ttr_stats(T(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Macro-F1 of the langid predictor.
# ---------------------------------------------------------------------------
@query(
    "eval_macro_f1",
    oracle=f"""
    WITH {_LANGID_PRED_CTE},
    j AS (
      SELECT p.lang_pred AS _p, d.lang AS _t
      FROM documents d JOIN pred p USING (doc_id)),
    cm AS (SELECT _p, _t, CAST(COUNT(*) AS BIGINT) AS n FROM j GROUP BY 1, 2),
    classes AS (
      SELECT _t AS cls FROM cm UNION SELECT _p AS cls FROM cm),
    tp AS (SELECT _t AS cls, n AS tp FROM cm WHERE _p = _t),
    pn AS (SELECT _p AS cls, CAST(SUM(n) AS BIGINT) AS n_pred FROM cm GROUP BY 1),
    tn AS (SELECT _t AS cls, CAST(SUM(n) AS BIGINT) AS n_true FROM cm GROUP BY 1),
    per AS (
      SELECT c.cls,
             CAST(COALESCE(tp.tp, 0) AS BIGINT) AS tp,
             CAST(COALESCE(pn.n_pred, 0) AS BIGINT) AS n_pred,
             CAST(COALESCE(tn.n_true, 0) AS BIGINT) AS n_true
      FROM classes c
      LEFT JOIN tp USING (cls) LEFT JOIN pn USING (cls) LEFT JOIN tn USING (cls)),
    scored AS (
      SELECT cls, tp, n_pred, n_true,
             CASE WHEN n_pred > 0
                  THEN ROUND(tp / CAST(n_pred AS DOUBLE) + 1e-9, 6) END
               AS precision,
             CASE WHEN n_true > 0
                  THEN ROUND(tp / CAST(n_true AS DOUBLE) + 1e-9, 6) END
               AS recall,
             ROUND(CASE WHEN n_pred + n_true > 0
                   THEN 2.0 * tp / CAST(n_pred + n_true AS DOUBLE)
                   ELSE 0.0 END + 1e-9, 6) AS f1
      FROM per)
    SELECT cls, tp, n_pred, n_true, precision, recall, f1 FROM scored
    UNION ALL
    SELECT 'MACRO', CAST(SUM(tp) AS BIGINT), CAST(SUM(n_pred) AS BIGINT),
           CAST(SUM(n_true) AS BIGINT),
           -- zero_division=0: never-predicted classes enter the macro
           -- averages as 0, matching the class set macro F1 averages over
           ROUND(AVG(COALESCE(precision, 0)) + 1e-9, 6),
           ROUND(AVG(COALESCE(recall, 0)) + 1e-9, 6),
           ROUND(AVG(f1) + 1e-9, 6)
    FROM scored
    ORDER BY cls
    """,
)
def eval_macro_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall/F1 plus macro averages for the langid
    predictor against the labeled lang — the imbalance-honest companion
    to accuracy/kappa (every class weighs equally; 'unknown' predictions
    appear as a zero-recall class instead of vanishing).

    operators.evalmetrics.macro_f1: one |classes|^2 confusion aggregate,
    arithmetic over that tiny frame; the MACRO row fills 0 for NULL
    precision/recall (sklearn zero_division=0) so all three macro
    averages run over the same class set, identically in both engines.
    """
    d = T(spark, sf_dir, "documents")
    preds = d.select(X.lang_id("text").alias("_p"), F.col("lang").alias("_t"))
    return E.macro_f1(preds, "_p", "_t")


# ---------------------------------------------------------------------------
# McNemar's paired test: langid vs the majority-class baseline.
# ---------------------------------------------------------------------------
@query(
    "eval_mcnemar",
    oracle=f"""
    WITH {_LANGID_PRED_CTE},
    j AS (
      SELECT CASE WHEN p.lang_pred = d.lang THEN 1 ELSE 0 END AS a,
             CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS b
      FROM documents d JOIN pred p USING (doc_id)),
    c AS (
      SELECT CAST(SUM(a * b) AS BIGINT) AS n_both,
             CAST(SUM(a * (1 - b)) AS BIGINT) AS n01,
             CAST(SUM((1 - a) * b) AS BIGINT) AS n10,
             CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n_neither
      FROM j)
    SELECT n_both, n01, n10, n_neither,
           ROUND(CASE WHEN n01 + n10 > 0
                 THEN (ABS(CAST(n01 AS DOUBLE) - n10) - 1.0)
                      * (ABS(CAST(n01 AS DOUBLE) - n10) - 1.0)
                      / CAST(n01 + n10 AS DOUBLE)
                 END + 1e-9, 6) AS mcnemar_chi2
    FROM c
    """,
)
def eval_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's continuity-corrected paired test comparing the langid
    predictor against the always-'en' majority baseline on the same
    documents — the honest two-model comparison (only discordant pairs
    carry information; pooled accuracy deltas ignore pairing).

    operators.evalmetrics.mcnemar_test: one 1-row aggregate of four
    exact integer cells, one closed-form float.
    """
    d = T(spark, sf_dir, "documents")
    return E.mcnemar_test(
        d,
        correct_a=X.lang_id("text") == F.col("lang"),
        correct_b=F.col("lang") == F.lit("en"),
    )


# ---------------------------------------------------------------------------
# Robust scaler parameters + outlier counts.
# ---------------------------------------------------------------------------
@query(
    "feature_robust_scaler",
    oracle="""
    WITH c AS (
      SELECT c_mktsegment AS grp, CAST(c_acctbal AS DOUBLE) AS x
      FROM customer),
    cc AS (SELECT grp, x, COUNT(*) AS nn FROM c GROUP BY 1, 2),
    cum AS (
      SELECT grp, x,
             SUM(nn) OVER (PARTITION BY grp ORDER BY x) AS cw,
             SUM(nn) OVER (PARTITION BY grp) AS tot
      FROM cc),
    med AS (SELECT grp, MIN(x) AS med FROM cum WHERE cw >= 0.5 * tot GROUP BY 1),
    q1 AS (SELECT grp, MIN(x) AS q1 FROM cum WHERE cw >= 0.25 * tot GROUP BY 1),
    q3 AS (SELECT grp, MIN(x) AS q3 FROM cum WHERE cw >= 0.75 * tot GROUP BY 1),
    nn AS (SELECT grp, CAST(SUM(nn) AS BIGINT) AS n FROM cc GROUP BY 1),
    outl AS (
      SELECT c.grp,
             CAST(SUM(CASE WHEN ABS(c.x - med.med) > 1.5 * (q3.q3 - q1.q1)
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      FROM c JOIN med USING (grp) JOIN q1 USING (grp) JOIN q3 USING (grp)
      GROUP BY 1)
    SELECT nn.grp AS c_mktsegment, nn.n,
           ROUND(med.med + 1e-9, 4) AS median,
           ROUND(q3.q3 - q1.q1 + 1e-9, 4) AS iqr,
           outl.n_outliers
    FROM nn JOIN med USING (grp) JOIN q1 USING (grp) JOIN q3 USING (grp)
            JOIN outl USING (grp)
    ORDER BY c_mktsegment
    """,
)
def feature_robust_scaler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment robust-scaler parameters (exact discrete median/IQR of
    account balance) and the robust-outlier count (|x - med| > 1.5*IQR)
    — the winsorize-or-not screen before standardizing a feature.

    operators.features.robust_scale_stats: one (group, value) count
    collapse, per-group cumulative-weight windows over the collapsed
    frame (the agg_percentile_disc shape — no global sort), one join
    back for the outlier count. Percentiles are group MEMBERS, so both
    engines pick identical doubles.
    """
    return robust_scale_stats(
        T(spark, sf_dir, "customer"), "c_mktsegment", "c_acctbal"
    )


# ---------------------------------------------------------------------------
# Backlog aging buckets.
# ---------------------------------------------------------------------------
@query(
    "orders_backlog_aging",
    oracle="""
    WITH mx AS (SELECT MAX(o_orderdate) AS anchor FROM orders),
    b AS (
      SELECT o_orderstatus,
             CASE WHEN date_diff('day', o_orderdate, anchor) <= 30
                    THEN '000-030'
                  WHEN date_diff('day', o_orderdate, anchor) <= 90
                    THEN '031-090'
                  WHEN date_diff('day', o_orderdate, anchor) <= 365
                    THEN '091-365'
                  ELSE '365+' END AS age_bucket,
             o_totalprice
      FROM orders, mx WHERE o_orderstatus <> 'F')
    SELECT o_orderstatus, age_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice) + 1e-9, 2) AS open_value
    FROM b GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def orders_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog aged as of the latest order date: non-filled
    orders bucketed by age (0-30/31-90/91-365/365+ days) with count and
    open value per status — the ops-dashboard staple for pipeline
    hygiene (how much value is stuck, and for how long).

    Shape: the anchor is a 1-row max broadcast back onto the scan; the
    bucket is a scan-side CASE; one small-group aggregate. Bucket labels
    are zero-padded so plain string ORDER BY is the age order.
    """
    o = T(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("_anchor"))
    age = F.datediff(F.col("_anchor"), F.col("o_orderdate"))
    bucket = (
        F.when(age <= 30, "000-030")
        .when(age <= 90, "031-090")
        .when(age <= 365, "091-365")
        .otherwise("365+")
    )
    return (
        o.filter(F.col("o_orderstatus") != "F")
        .join(F.broadcast(anchor))
        .groupBy("o_orderstatus", bucket.alias("age_bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(F.sum("o_totalprice") + 1e-9, 2).alias("open_value"),
        )
        .orderBy("o_orderstatus", "age_bucket")
    )


# ---------------------------------------------------------------------------
# Prefix/suffix truncation-robust dedup groups.
# ---------------------------------------------------------------------------
@query(
    "dedup_prefix_suffix",
    oracle="""
    WITH pre AS (
      SELECT doc_id AS id, 'prefix' AS kind,
             md5(substr(lower(trim(text)), 1, 64)) AS key
      FROM documents
      UNION ALL
      SELECT doc_id, 'suffix',
             md5(substr(reverse(lower(trim(text))), 1, 64))
      FROM documents)
    SELECT kind, key, CAST(COUNT(*) AS BIGINT) AS group_size,
           MIN(id) AS keep_id
    FROM pre GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ORDER BY kind, key
    """,
)
def dedup_prefix_suffix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncation-robust exact-dedup groups: documents sharing their
    first-64-char or last-64-char hash (normalized) — catches paginated
    suffixes, appended boilerplate, and truncated re-crawls that
    full-text hashing misses. Group rollups with a min-id
    representative, never pairs (linear output).

    operators.dedup.prefix_suffix_groups: two scan-side md5s (suffix via
    reverse-then-prefix, sidestepping engine-specific negative-index
    substr), one union, one hash-key group aggregate.
    """
    return prefix_suffix_groups(T(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Column-entropy profiling.
# ---------------------------------------------------------------------------
@query(
    "profile_column_entropy",
    oracle="""
    WITH s AS (
      SELECT COALESCE(CAST(o_orderstatus AS VARCHAR), '<NULL>') AS v,
             COUNT(*) AS n FROM orders GROUP BY 1),
    p AS (
      SELECT COALESCE(CAST(o_orderpriority AS VARCHAR), '<NULL>') AS v,
             COUNT(*) AS n FROM orders GROUP BY 1)
    SELECT 'o_orderpriority' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           ROUND(LN(SUM(n)) - SUM(n * LN(n)) / SUM(n) + 1e-9, 6)
             AS entropy_nats
    FROM p
    UNION ALL
    SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT), CAST(SUM(n) AS BIGINT),
           ROUND(LN(SUM(n)) - SUM(n * LN(n)) / SUM(n) + 1e-9, 6)
    FROM s
    ORDER BY col_name
    """,
)
def profile_column_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy and distinct count of the order status/priority
    columns — the uniformity screen that ranks candidate stratification
    and partition keys (ln(k) = uniform over k, ~0 = constant).

    operators.profiling.column_entropy: one value-count aggregate per
    column over a shared scan, 1-row entropy rollups, union.
    """
    ce = column_entropy(
        T(spark, sf_dir, "orders"), ["o_orderpriority", "o_orderstatus"]
    )
    return ce.withColumnRenamed("column", "col_name")


# ---------------------------------------------------------------------------
# Functional-dependency screen.
# ---------------------------------------------------------------------------
_FD_COLS = ["o_custkey", "o_orderkey", "o_orderpriority", "o_orderstatus"]
_FD_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{a}' AS det, '{b}' AS dep,
        (SELECT CAST(COUNT(DISTINCT ROW({a})) AS BIGINT) FROM orders)
          AS nd_det,
        (SELECT CAST(COUNT(DISTINCT ({a}, {b})) AS BIGINT) FROM orders)
          AS nd_pair,
        (SELECT COUNT(DISTINCT ROW({a})) = COUNT(DISTINCT ({a}, {b}))
         FROM orders) AS fd_holds"""
    for a in _FD_COLS
    for b in _FD_COLS
    if a != b
)


@query(
    "profile_fd_candidates",
    oracle=f"SELECT * FROM ({_FD_ORACLE}) ORDER BY det, dep",
)
def profile_fd_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency screen over four order columns: a -> b holds
    iff |distinct a| = |distinct (a,b)| — key discovery (o_orderkey
    determines everything), join-safety, and normalization advice from
    one aggregate row.

    operators.profiling.fd_candidates: ONE aggregate computes every
    count-distinct over a single scan; the verdict table is a literal
    explode of that 1-row frame.
    """
    return fd_candidates(T(spark, sf_dir, "orders"), _FD_COLS)


# ---------------------------------------------------------------------------
# Embedding norm QA.
# ---------------------------------------------------------------------------
@query(
    "embed_norm_stats",
    oracle="""
    WITH n AS (
      SELECT label,
             sqrt(list_aggregate(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
               AS nrm
      FROM embeddings)
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(nrm) + 1e-9, 4) AS avg_norm,
           ROUND(MIN(nrm) + 1e-9, 4) AS min_norm,
           ROUND(MAX(nrm) + 1e-9, 4) AS max_norm
    FROM n GROUP BY label ORDER BY label
    """,
)
def embed_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm distribution of the embedding table — the first
    QA readout on any vector corpus (collapsed or exploded norms flag a
    broken encoder run before cosine math consumes it).

    operators.similarity.norm_stats: scan-side sequential array fold
    (cast to double first, both engines sum the same float64 sequence),
    one group aggregate.
    """
    return norm_stats(T(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# Embedding dimension variance.
# ---------------------------------------------------------------------------
@query(
    "embed_dimension_variance",
    oracle="""
    WITH per AS (
      SELECT generate_subscripts(embedding, 1) - 1 AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings),
    agg AS (
      SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(v) AS s, SUM(v * v) AS q
      FROM per GROUP BY 1)
    SELECT dim, n,
           ROUND(s / n + 1e-9, 6) AS mean,
           ROUND((q - s * s / n) / n + 1e-9, 6) AS variance
    FROM agg
    ORDER BY variance DESC, dim LIMIT 8
    """,
)
def embed_dimension_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-8 embedding dimensions by population variance — the pre-PCA
    screen for dead dimensions (wasted capacity / broken projection) and
    dominant ones (encoder collapse).

    operators.similarity.dimension_variance: posexplode to dim-keyed
    scalars (whole vectors never shuffle), one #dims moment aggregate,
    TakeOrdered top-k.
    """
    return dimension_variance(T(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# Real-pixel PNG round-trip, gated by a closed-form oracle.
# ---------------------------------------------------------------------------
@query(
    "multimodal_png_roundtrip",
    oracle="""
    WITH d AS (
      SELECT doc_id, n_chars % 37 + 4 AS w, doc_id % 23 + 4 AS h
      FROM documents WHERE doc_id % 5 = 0),
    cells AS (
      -- generate_series can't take lateral column args in DuckDB; the
      -- synthetic dims are bounded (w <= 40, h <= 26), so cross a fixed
      -- grid and filter to each image's extent
      SELECT d.doc_id, d.w, d.h,
             (7 * x.i + 13 * y.i + 31 * c.i) % 256 AS v
      FROM d,
           generate_series(0, 40) AS x(i),
           generate_series(0, 26) AS y(i),
           generate_series(0, 2) AS c(i)
      WHERE x.i < d.w AND y.i < d.h)
    SELECT doc_id AS media_id, CAST(w AS INT) AS width,
           CAST(h AS INT) AS height, CAST(SUM(v) AS BIGINT) AS px_sum
    FROM cells GROUP BY 1, 2, 3 ORDER BY media_id
    """,
)
def multimodal_png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixels through the real stage, exactly oracled: synthesize a
    gradient RGB PNG per sampled document (dims and pixels are pure
    functions of doc_id/n_chars), DEFLATE-encode it, decode it back
    through the full unfilter path, and emit the decoded dims and pixel
    sum — which the SQL oracle recomputes in closed form without any
    image code. A wrong filter, stride, or channel order anywhere in the
    codec fails the hash compare.

    operators.multimodal.png_roundtrip_dims over operators.pngcodec:
    one Arrow mapInPandas inside the scan, no shuffle, per-row work
    bounded by the ~40x26 synthetic dimensions.
    """
    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return png_roundtrip_dims(docs).orderBy("media_id")


# ---------------------------------------------------------------------------
# Welch's one-vs-rest t-test.
# ---------------------------------------------------------------------------
@query(
    "events_welch_ttest",
    oracle="""
    WITH iv AS (
      -- exact integer-scaled values: partial-sum order cannot move the
      -- doubles feeding the final ROUND (the integer-cents recipe)
      SELECT event_type,
             CAST(ROUND(CAST(value AS DOUBLE) * 1e6) AS BIGINT) AS v
      FROM events),
    g AS (
      SELECT event_type AS grp, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(v AS HUGEINT)) AS sc,
             SUM(CAST(v AS HUGEINT) * v) AS qc
      FROM iv GROUP BY 1),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tn,
                   CAST(SUM(sc) AS HUGEINT) AS tsc,
                   CAST(SUM(qc) AS HUGEINT) AS tqc
            FROM g),
    d AS (
      SELECT grp, n, tn,
             CAST(sc AS DOUBLE) / 1e6 AS s, CAST(qc AS DOUBLE) / 1e12 AS q,
             CAST(tsc AS DOUBLE) / 1e6 AS ts, CAST(tqc AS DOUBLE) / 1e12 AS tq
      FROM g, tot),
    f AS (
      SELECT grp, n,
             s / CAST(n AS DOUBLE) AS m1,
             (ts - s) / CAST(tn - n AS DOUBLE) AS m2,
             (q - s * s / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1) AS v1,
             ((tq - q) - (ts - s) * (ts - s) / CAST(tn - n AS DOUBLE))
               / (CAST(tn - n AS DOUBLE) - 1) AS v2,
             CAST(n AS DOUBLE) AS n1, CAST(tn - n AS DOUBLE) AS n2,
             n >= 2 AND tn - n >= 2 AS ok
      FROM d)
    SELECT grp AS event_type, n,
           ROUND(m1 + 1e-9, 4) AS mean_grp,
           ROUND(m2 + 1e-9, 4) AS mean_rest,
           -- + 0.0 de-signs the zero: DuckDB ROUND(-6.6e-6,4) -> -0.0 while
           -- Spark's BigDecimal round -> +0.0; IEEE -0.0 + 0.0 = +0.0
           ROUND(CASE WHEN ok THEN (m1 - m2) / sqrt(v1 / n1 + v2 / n2) END
                 + 1e-9, 4) + 0.0 AS t_stat,
           ROUND(CASE WHEN ok THEN
                 (v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
                 / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                    + (v2 / n2) * (v2 / n2) / (n2 - 1)) END
                 + 1e-9, 4) + 0.0 AS welch_df
    FROM f ORDER BY event_type
    """,
)
def events_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t of each event type's mean value against
    the rest — the per-segment "is this slice different?" screen with
    the Welch–Satterthwaite df (the honest upgrade of the pooled z-test
    when segment variances differ).

    operators.profiling.welch_ttest_onevsrest: one group-moment
    aggregate + a 1-row grand-total broadcast; the complement's moments
    come from subtraction, so the data is scanned once for all groups.
    """
    return welch_ttest_onevsrest(
        T(spark, sf_dir, "events"), "event_type", "value"
    )


# ---------------------------------------------------------------------------
# Corrupt-record JSON ingestion audit.
# ---------------------------------------------------------------------------
@query(
    "source_json_corrupt_audit",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN doc_id % 7 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_good,
           CAST(SUM(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_corrupt,
           CAST(SUM(CASE WHEN doc_id % 7 <> 0 THEN doc_id END) AS BIGINT)
             AS sum_good_ids
    FROM documents
    """,
)
def source_json_corrupt_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE JSON ingestion with corrupt-record accounting — the
    contract real lake ingestion relies on: malformed lines must neither
    kill the job nor silently vanish; they land in the corrupt-record
    column and are COUNTED. The stage writes a JSONL twin of documents
    with every 7th line deliberately truncated (a pure function of
    doc_id, so the oracle knows the ledger without parsing JSON), reads
    it back PERMISSIVE, and audits good/corrupt counts plus a good-row
    checksum.

    Shape: staging is a distributed text write (corruption is a scan-side
    string expression — no driver loop); the audit is one aggregate over
    the JSON scan.
    """
    d = T(spark, sf_dir, "documents")
    key = hashlib.sha1(f"jsoncorrupt1|{sf_dir}".encode()).hexdigest()[:16]
    stage = os.path.join(tempfile.gettempdir(), f"sdf_jsoncorrupt_{key}")
    if not os.path.isdir(stage):
        line = F.when(
            F.col("doc_id") % 7 == 0,
            # truncated mid-object: unbalanced brace, no closing quote
            F.concat(
                F.lit('{"doc_id": '),
                F.col("doc_id").cast("string"),
                F.lit(', "lang": "'),
                F.col("lang"),
            ),
        ).otherwise(
            F.to_json(F.struct("doc_id", "lang", "n_chars"))
        )
        d.select(line.alias("value")).write.mode("overwrite").text(stage)
    back = (
        spark.read.schema(
            "doc_id LONG, lang STRING, n_chars LONG, _corrupt_record STRING"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(stage)
    )
    good = F.col("_corrupt_record").isNull()
    return back.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(good.cast("bigint")).cast("bigint").alias("n_good"),
        F.sum((~good).cast("bigint")).cast("bigint").alias("n_corrupt"),
        F.sum(F.when(good, F.col("doc_id"))).cast("bigint").alias("sum_good_ids"),
    )


# ---------------------------------------------------------------------------
# Greedy k-center coreset (farthest-point traversal).
# ---------------------------------------------------------------------------
def _kcenter_oracle(k: int) -> str:
    """Unrolled CTE chain mirroring the operator's k greedy steps: level i
    holds every point's min squared distance to the first i centers; the
    argmax (ties -> min id) is the next center. Distances are the same
    IEEE doubles Spark computes (exact float32 widening, sequential
    fold), so the SELECTED SET is bit-deterministic."""
    dist = (
        "list_aggregate(list_transform(list_zip(p.v, c.v), "
        "s -> (s[1] - s[2]) * (s[1] - s[2])), 'sum')"
    )
    parts = [
        "WITH pts AS (SELECT vec_id AS id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v "
        "FROM embeddings)",
        "s1 AS (SELECT id, v FROM pts WHERE id = (SELECT MIN(id) FROM pts))",
        f"d1 AS (SELECT p.id, p.v, {dist} AS d FROM pts p, s1 c)",
    ]
    for i in range(2, k + 1):
        parts.append(
            f"s{i} AS (SELECT id, v, d FROM d{i - 1} "
            f"ORDER BY d DESC, id ASC LIMIT 1)"
        )
        if i < k:
            parts.append(
                f"d{i} AS (SELECT p.id, p.v, LEAST(p.d, {dist}) AS d "
                f"FROM d{i - 1} p, s{i} c)"
            )
    selects = [
        "SELECT 1 AS step, (SELECT id FROM s1) AS center_id, "
        "CAST(NULL AS DOUBLE) AS radius"
    ] + [
        # WHERE d > 0 mirrors the operator's early stop: when every point
        # coincides with a chosen center (k > distinct points), no further
        # rows are emitted — distances are monotone non-increasing, so one
        # zero level zeroes all later levels too
        f"SELECT {i}, id, ROUND(sqrt(d) + 1e-9, 6) FROM s{i} WHERE d > 0"
        for i in range(2, k + 1)
    ]
    return (
        ",\n".join(parts)
        + "\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY step"
    )


@query("sample_kcenter_coreset", oracle=_kcenter_oracle(8))
def sample_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset over the embedding table (k=8): the
    data-pruning primitive that keeps maximally-spread exemplars, with
    the monotone radius sequence as the diversity readout. The oracle
    unrolls the same eight greedy steps as CTE levels — selections are
    bit-deterministic because both engines compute identical IEEE
    distances (exact float widening + sequential fold).

    operators.similarity.kcenter_coreset: k bounded driver rounds, each
    one broadcast of a 1-row center + a scan-side fold + TakeOrdered(1);
    only k scalars ever reach the driver.
    """
    return kcenter_coreset(T(spark, sf_dir, "embeddings"), k=8)


# ---------------------------------------------------------------------------
# Median-of-means robust mean.
# ---------------------------------------------------------------------------
@query(
    "agg_median_of_means",
    oracle="""
    WITH per AS (
      SELECT CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)
                  AS BIGINT) % 16 AS b,
             CAST(COUNT(*) AS BIGINT) AS n, SUM(CAST(value AS DOUBLE)) AS s
      FROM events GROUP BY 1),
    ms AS (SELECT s / n AS m FROM per),
    ranked AS (
      SELECT m, ROW_NUMBER() OVER (ORDER BY m) AS r,
             COUNT(*) OVER () AS c
      FROM ms)
    SELECT (SELECT CAST(SUM(n) AS BIGINT) FROM per) AS n,
           (SELECT ROUND(SUM(s) / SUM(n) + 1e-9, 4) FROM per) AS mean,
           ROUND(m + 1e-9, 4) AS median_of_means
    FROM ranked WHERE r = CAST(CEIL(0.5 * c) AS BIGINT)
    """,
)
def agg_median_of_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-of-means of the event value (16 portable md5 hash buckets):
    the heavy-tail-robust mean estimator; its gap to the raw mean is the
    outlier alarm a data monitor alerts on.

    operators.profiling.median_of_means: one bucket aggregate collapsing
    map-side to 16 rows, discrete median via sort_array over the
    16-element list — never a global sort.
    """
    return median_of_means(
        T(spark, sf_dir, "events"), "value", "event_id", n_buckets=16
    )


# ---------------------------------------------------------------------------
# Local-maximum (peak) detection on the daily series.
# ---------------------------------------------------------------------------
@query(
    "events_peak_detection",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1),
    nb AS (
      SELECT a.d, a.n, MAX(b.n) AS mx
      FROM daily a LEFT JOIN daily b
        ON b.d BETWEEN a.d - 3 AND a.d + 3 AND b.d <> a.d
      GROUP BY 1, 2)
    SELECT d, n FROM nb WHERE mx IS NULL OR n > mx ORDER BY d
    """,
)
def events_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days whose event count strictly exceeds every observed day within
    ±3 days — burst localization after the anomaly screens (CUSUM/MAD
    say WHEN something changed; peaks say which days carried it).

    operators.relational.peak_days: #days aggregate, bounded triangular
    calendar self-join (fan-out <= 6 per day — the acf/level-shift
    pattern, never a date-ordered global window), per-day max.
    """
    return peak_days(T(spark, sf_dir, "events"), "ts", neighborhood_days=3)


# ---------------------------------------------------------------------------
# Hashed-cross-feature collision audit.
# ---------------------------------------------------------------------------
@query(
    "feature_hash_collisions",
    oracle="""
    WITH combos AS (
      SELECT DISTINCT p_brand || '|' || CAST(p_size AS VARCHAR) AS key
      FROM part),
    hashed AS (
      SELECT key,
             CAST('0x' || substr(md5(key), 1, 8) AS BIGINT) % 1024 AS bucket
      FROM combos),
    per AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS load
            FROM hashed GROUP BY 1)
    SELECT CAST((SELECT COUNT(*) FROM combos) AS BIGINT) AS n_combos,
           CAST(COUNT(*) AS BIGINT) AS n_buckets_used,
           CAST(SUM(CASE WHEN load >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_collided_buckets,
           CAST(SUM(CASE WHEN load >= 2 THEN load ELSE 0 END) AS BIGINT)
             AS n_colliding_combos,
           CAST(MAX(load) AS BIGINT) AS max_bucket_load
    FROM per
    """,
)
def feature_hash_collisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collision audit of the hashed cross feature brand x size into 1024
    buckets (portable md5 hash): distinct combos, buckets used, collided
    buckets, combos sharing a bucket, max load — the dimensioning check
    run BEFORE committing to a feature-hashing width (too small a table
    silently aliases unrelated crosses onto one weight).

    Shape: one distinct on the combo key, one bucket count aggregate,
    one 1-row rollup; everything map-side collapsible.
    """
    p = T(spark, sf_dir, "part")
    combos = p.select(
        F.concat_ws("|", F.col("p_brand"), F.col("p_size").cast("string")).alias(
            "key"
        )
    ).distinct()
    bucket = (
        F.conv(F.substring(F.md5(F.col("key")), 1, 8), 16, 10).cast("bigint")
        % 1024
    )
    per = combos.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("load")
    )
    n_combos = combos.agg(F.count(F.lit(1)).cast("bigint").alias("n_combos"))
    return per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets_used"),
        F.sum((F.col("load") >= 2).cast("bigint")).cast("bigint").alias(
            "n_collided_buckets"
        ),
        F.sum(F.when(F.col("load") >= 2, F.col("load")).otherwise(0))
        .cast("bigint")
        .alias("n_colliding_combos"),
        F.max("load").cast("bigint").alias("max_bucket_load"),
    ).join(F.broadcast(n_combos)).select(
        "n_combos",
        "n_buckets_used",
        "n_collided_buckets",
        "n_colliding_combos",
        "max_bucket_load",
    )


# ---------------------------------------------------------------------------
# Matryoshka-style prefix-norm quality of embeddings.
# ---------------------------------------------------------------------------
@query(
    "embed_prefix_norm_ratio",
    oracle="""
    WITH dims AS (SELECT unnest([8, 16, 32, 64]) AS m),
    per AS (
      SELECT dims.m,
             sqrt(list_aggregate(list_transform(embedding[1:dims.m],
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
             / sqrt(list_aggregate(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
               AS ratio
      FROM embeddings, dims)
    SELECT CAST(m AS INT) AS prefix_dim,
           ROUND(AVG(ratio) + 1e-9, 6) AS avg_ratio,
           ROUND(MIN(ratio) + 1e-9, 6) AS min_ratio
    FROM per GROUP BY m ORDER BY prefix_dim
    """,
)
def embed_prefix_norm_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much of each embedding's energy lives in its first 8/16/32/64
    dimensions: avg and worst prefix-to-full norm ratio (= the cosine
    between the vector and its truncated self) — the Matryoshka-style
    readout that decides whether truncated vectors are usable for cheap
    first-stage retrieval.

    Shape: per-row array folds (slice + sequential sum, cast double
    first) against a 4-element literal dims explode; one group aggregate.
    """
    emb = T(spark, sf_dir, "embeddings")
    dv = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sq = lambda c: F.aggregate(c, F.lit(0.0), lambda a, x: a + x * x)  # noqa: E731
    per = emb.select(
        F.explode(F.array(*[F.lit(m) for m in (8, 16, 32, 64)])).alias("m"),
        dv.alias("_v"),
    ).select(
        "m",
        (F.sqrt(sq(F.slice(F.col("_v"), 1, F.col("m")))) / F.sqrt(sq(F.col("_v")))).alias(
            "ratio"
        ),
    )
    return (
        per.groupBy(F.col("m").cast("int").alias("prefix_dim"))
        .agg(
            F.round(F.avg("ratio") + 1e-9, 6).alias("avg_ratio"),
            F.round(F.min("ratio") + 1e-9, 6).alias("min_ratio"),
        )
        .orderBy("prefix_dim")
    )


# ---------------------------------------------------------------------------
# XYZ variability classes (demand-predictability companion to Pareto/ABC).
# ---------------------------------------------------------------------------
@query(
    "orders_xyz_variability",
    oracle="""
    WITH m AS (
      SELECT l_partkey, date_trunc('month', l_shipdate) AS mo,
             SUM(l_quantity) AS q
      FROM lineitem GROUP BY 1, 2),
    s AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_months,
             SUM(q) AS sq, SUM(q * q) AS sq2
      FROM m GROUP BY 1),
    cv AS (
      SELECT l_partkey, n_months,
             sqrt((sq2 - sq * sq / n_months) / n_months)
               / (sq / n_months) AS cv
      FROM s WHERE n_months >= 2 AND sq > 0)
    SELECT CASE WHEN cv <= 0.5 THEN 'X'
                WHEN cv <= 1.0 THEN 'Y' ELSE 'Z' END AS xyz_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(AVG(cv) + 1e-9, 4) AS avg_cv
    FROM cv GROUP BY 1 ORDER BY 1
    """,
)
def orders_xyz_variability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XYZ demand-variability classes per part (coefficient of variation
    of monthly shipped quantity over months with sales; X <= 0.5 steady,
    Y <= 1.0, Z erratic) — the predictability axis that pairs with the
    Pareto/ABC value axis for inventory segmentation.

    Shape: two keyed aggregates (part-month, then part) and a 3-group
    rollup; the CV is closed-form from exact sums, floats only at the
    final division.
    """
    li = T(spark, sf_dir, "lineitem")
    m = li.groupBy(
        "l_partkey", F.date_trunc("month", F.col("l_shipdate")).alias("mo")
    ).agg(F.sum("l_quantity").alias("q"))
    s = m.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
        F.sum("q").alias("sq"),
        F.sum(F.col("q") * F.col("q")).alias("sq2"),
    )
    nm = F.col("n_months")
    cv = F.sqrt(
        (F.col("sq2") - F.col("sq") * F.col("sq") / nm) / nm
    ) / (F.col("sq") / nm)
    classed = (
        s.filter((nm >= 2) & (F.col("sq") > 0))
        .select(
            F.when(cv <= 0.5, "X").when(cv <= 1.0, "Y").otherwise("Z").alias(
                "xyz_class"
            ),
            cv.alias("_cv"),
        )
    )
    return (
        classed.groupBy("xyz_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.round(F.avg("_cv") + 1e-9, 4).alias("avg_cv"),
        )
        .orderBy("xyz_class")
    )


# ---------------------------------------------------------------------------
# Gopher-style quality rule screen.
# ---------------------------------------------------------------------------
@query(
    "text_gopher_rules",
    oracle=rf"""
    WITH t AS (
      SELECT source,
             regexp_split_to_array(lower(trim(text)), '\s+') AS toks
      FROM documents),
    per AS (
      SELECT source,
             len(toks) AS n_tok,
             list_aggregate(list_transform(toks, x -> len(x)), 'sum')
               / CAST(len(toks) AS DOUBLE) AS mwl,
             len(list_filter(toks, x -> list_contains([{_STOP_SQL}], x)))
               AS n_stop,
             len(list_filter(toks, x -> regexp_matches(x, '^[a-z]+$')))
               / CAST(len(toks) AS DOUBLE) AS alpha_ratio
      FROM t WHERE len(toks) > 0),
    flags AS (
      SELECT source,
             CASE WHEN n_tok >= 50 THEN 0 ELSE 1 END AS f_wc,
             CASE WHEN mwl BETWEEN 3 AND 10 THEN 0 ELSE 1 END AS f_mwl,
             CASE WHEN n_stop >= 2 THEN 0 ELSE 1 END AS f_stop,
             CASE WHEN alpha_ratio >= 0.8 THEN 0 ELSE 1 END AS f_alpha
      FROM per)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN f_wc + f_mwl + f_stop + f_alpha = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           CAST(SUM(f_wc) AS BIGINT) AS fail_word_count,
           CAST(SUM(f_mwl) AS BIGINT) AS fail_mean_word_len,
           CAST(SUM(f_stop) AS BIGINT) AS fail_stopwords,
           CAST(SUM(f_alpha) AS BIGINT) AS fail_alpha_ratio
    FROM flags GROUP BY source ORDER BY source
    """,
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule screen per source (the public rule set from the
    Gopher corpus paper, at fixture-scaled thresholds): word count >= 50,
    mean word length in [3, 10], >= 2 stopwords, >= 80% alphabetic
    tokens — with per-rule failure counts so a curator sees WHY a source
    is losing documents, not just that it is.

    Shape: every rule is a map-side array expression over the token
    array (fold for mean word length, filters for stopword/alpha counts
    — no explode); one group aggregate.
    """
    d = T(spark, sf_dir, "documents")
    toks = X.tokens("text")
    stop_arr = F.array(*[F.lit(s) for s in X.STOPWORDS_EN])
    n_tok = F.size(toks)
    mwl = F.aggregate(
        F.transform(toks, lambda t: F.length(t)),
        F.lit(0),
        lambda a, x: a + x,
    ) / n_tok.cast("double")
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    alpha_ratio = (
        F.size(F.filter(toks, lambda t: t.rlike("^[a-z]+$")))
        / n_tok.cast("double")
    )
    per = d.select(
        "source",
        F.when(n_tok >= 50, 0).otherwise(1).alias("f_wc"),
        F.when((mwl >= 3) & (mwl <= 10), 0).otherwise(1).alias("f_mwl"),
        F.when(n_stop >= 2, 0).otherwise(1).alias("f_stop"),
        F.when(alpha_ratio >= 0.8, 0).otherwise(1).alias("f_alpha"),
    ).filter(n_tok > 0)
    passing = (
        F.col("f_wc") + F.col("f_mwl") + F.col("f_stop") + F.col("f_alpha")
        == 0
    )
    return (
        per.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(passing.cast("bigint")).cast("bigint").alias("n_pass"),
            F.sum("f_wc").cast("bigint").alias("fail_word_count"),
            F.sum("f_mwl").cast("bigint").alias("fail_mean_word_len"),
            F.sum("f_stop").cast("bigint").alias("fail_stopwords"),
            F.sum("f_alpha").cast("bigint").alias("fail_alpha_ratio"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Keyword-stuffing screen (top-token dominance).
# ---------------------------------------------------------------------------
@query(
    "text_keyword_stuffing",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, source,
             unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
      FROM documents),
    freq AS (
      SELECT doc_id, source, w, COUNT(*) AS f
      FROM tok GROUP BY 1, 2, 3),
    per AS (
      SELECT doc_id, source,
             MAX(f) / CAST(SUM(f) AS DOUBLE) AS top_share
      FROM freq GROUP BY 1, 2)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(top_share) + 1e-9, 6) AS avg_top_share,
           ROUND(MAX(top_share) + 1e-9, 6) AS max_top_share,
           CAST(SUM(CASE WHEN top_share > 0.2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_stuffed
    FROM per GROUP BY source ORDER BY source
    """,
)
def text_keyword_stuffing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-stuffing screen: each document's dominant-token share
    (max token frequency / token count), rolled up per source with the
    count of documents above the 20% dominance threshold — the SEO-spam
    fingerprint that n-gram repetition scores miss when the repeats are
    scattered.

    Shape: one explode, (doc, token) count, per-doc max/sum, source
    rollup — the hapax pipeline with a second keyed aggregate.
    """
    d = T(spark, sf_dir, "documents")
    freq = (
        d.select(
            "doc_id", "source", F.explode(X.tokens("text")).alias("w")
        )
        .groupBy("doc_id", "source", "w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    per = freq.groupBy("doc_id", "source").agg(
        (F.max("f") / F.sum("f").cast("double")).alias("top_share")
    )
    return (
        per.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.avg("top_share") + 1e-9, 6).alias("avg_top_share"),
            F.round(F.max("top_share") + 1e-9, 6).alias("max_top_share"),
            F.sum((F.col("top_share") > 0.2).cast("bigint"))
            .cast("bigint")
            .alias("n_stuffed"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# SLO error-budget burn.
# ---------------------------------------------------------------------------
@query(
    "events_slo_burn",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_err
      FROM events GROUP BY 1)
    SELECT d, n, n_err,
           ROUND(n_err / CAST(n AS DOUBLE) + 1e-9, 6) AS err_rate,
           n_err / CAST(n AS DOUBLE) > 0.2 AS breach
    FROM daily ORDER BY d
    """,
)
def events_slo_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily error-rate readout against a 20% SLO: per-day totals, error
    counts, rate, and the breach flag — the error-budget table an
    on-call dashboard burns down (pair with events_changepoint_cusum for
    WHEN the burn started).

    Shape: one daily aggregate with a conditional count; the breach flag
    compares the exact integer ratio.
    """
    ev = T(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("d")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("event_type") == "error").cast("bigint"))
        .cast("bigint")
        .alias("n_err"),
    )
    rate = F.col("n_err") / F.col("n").cast("double")
    return daily.select(
        "d",
        "n",
        "n_err",
        F.round(rate + 1e-9, 6).alias("err_rate"),
        (rate > 0.2).alias("breach"),
    ).orderBy("d")


# ---------------------------------------------------------------------------
# Duplicate-payment screen.
# ---------------------------------------------------------------------------
@query(
    "orders_duplicate_payments",
    oracle="""
    SELECT o_custkey, ROUND(o_totalprice, -2) AS amt_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(o_orderkey) AS BIGINT) AS first_orderkey,
           CAST(date_diff('day', MIN(o_orderdate), MAX(o_orderdate))
                AS BIGINT) AS span_days
    FROM orders
    GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ORDER BY o_custkey, amt_bucket
    """,
)
def orders_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment screen: customers with multiple orders at the
    same rounded amount (nearest 100), with the group size and the
    day-span between first and last — the audit shortlist a payment-ops
    review works through (tight spans are refund/retry suspects; the
    Benford screen is the column-level sibling).

    Shape: one group aggregate on the (customer, amount-bucket) key —
    group rollups, never pairs, so output is linear in the order count.
    """
    o = T(spark, sf_dir, "orders")
    return (
        o.groupBy(
            "o_custkey",
            F.round(F.col("o_totalprice"), -2).alias("amt_bucket"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.min("o_orderkey").cast("bigint").alias("first_orderkey"),
            F.datediff(F.max("o_orderdate"), F.min("o_orderdate"))
            .cast("bigint")
            .alias("span_days"),
        )
        .filter(F.col("n_orders") >= 2)
        .orderBy("o_custkey", "amt_bucket")
    )


# ---------------------------------------------------------------------------
# A/B sample-ratio-mismatch guardrail.
# ---------------------------------------------------------------------------
@query(
    "eval_ab_srm",
    oracle="""
    WITH arms AS (
      SELECT CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n1
      FROM events)
    SELECT n0 + n1 AS n, n0 AS n_arm0, n1 AS n_arm1,
           ROUND((n0 - (n0 + n1) / 2.0) * (n0 - (n0 + n1) / 2.0)
                   / ((n0 + n1) / 2.0)
                 + (n1 - (n0 + n1) / 2.0) * (n1 - (n0 + n1) / 2.0)
                   / ((n0 + n1) / 2.0) + 1e-9, 6) AS srm_chi2,
           (n0 - (n0 + n1) / 2.0) * (n0 - (n0 + n1) / 2.0)
             / ((n0 + n1) / 2.0)
           + (n1 - (n0 + n1) / 2.0) * (n1 - (n0 + n1) / 2.0)
             / ((n0 + n1) / 2.0) > 3.841 AS srm_flag
    FROM arms
    """,
)
def eval_ab_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail for a 50/50 assignment (user_id
    parity as the arm): chi-square goodness-of-fit of the observed arm
    counts against the designed split, flagged at the 95% critical value
    — the FIRST check any A/B readout must pass (a skewed split
    invalidates the z-test downstream, events_ab_ztest).

    Shape: one 1-row conditional-count aggregate; the statistic is
    closed-form over two exact integers.
    """
    ev = T(spark, sf_dir, "events")
    arms = ev.agg(
        F.sum((F.col("user_id") % 2 == 0).cast("bigint"))
        .cast("bigint")
        .alias("n0"),
        F.sum((F.col("user_id") % 2 == 1).cast("bigint"))
        .cast("bigint")
        .alias("n1"),
    )
    n0, n1 = F.col("n0"), F.col("n1")
    exp = (n0 + n1) / 2.0
    chi2 = (n0 - exp) * (n0 - exp) / exp + (n1 - exp) * (n1 - exp) / exp
    return arms.select(
        (n0 + n1).alias("n"),
        n0.alias("n_arm0"),
        n1.alias("n_arm1"),
        F.round(chi2 + 1e-9, 6).alias("srm_chi2"),
        (chi2 > 3.841).alias("srm_flag"),
    )


# ---------------------------------------------------------------------------
# Partition-parallel SQLite round-trip as a gated query.
# ---------------------------------------------------------------------------
@query(
    "sqlite_parallel_roundtrip",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(c_acctbal) + 1e-9, 2) AS total_bal
    FROM customer GROUP BY 1 ORDER BY 1
    """,
)
def sqlite_parallel_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MIGRATION.md write-concurrency contract as a GATED query: the
    customer table is written into one SQLite file from 8 parallel
    partitions (writers serialize on the file lock under busy_timeout
    retry), read back through the bridge, and aggregated — the result
    hash-matches the source-side oracle iff the parallel write was
    lossless and duplicate-free.

    Bridge surface: write_sql(table=, if_exists=replace) -> DDL from the
    Spark schema + partition-batched transactional inserts
    (SQLiteDataFrame.swift:579-590 is the reference's single-threaded
    twin); read_sql(table=) -> rowid-range partitioned scan.
    """
    import hashlib as _h
    import os as _os
    import tempfile as _t

    from sqlitedataframe_spark.sources.sqlite import read_sql, write_sql

    c = T(spark, sf_dir, "customer")
    key = _h.sha1(f"pararoundtrip1|{sf_dir}".encode()).hexdigest()[:16]
    db = _os.path.join(_t.gettempdir(), f"sdf_para_{key}.db")
    write_sql(
        c.repartition(8).select("c_custkey", "c_mktsegment", "c_acctbal"),
        db,
        table="customer_rt",
        if_exists="replace",
    )
    back = read_sql(spark, db, table="customer_rt")
    return (
        back.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.sum("c_acctbal") + 1e-9, 2).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Near-duplicate contamination matrix across sources.
# ---------------------------------------------------------------------------
from sqlitedataframe_spark.operators import dedup as D  # noqa: E402
from sqlitedataframe_spark.suite.pipeline import (  # noqa: E402
    MH_EST_CTE,
    shared_doc_banded,
    shared_doc_sigs,
)


@query(
    "dedup_source_crosstab",
    oracle=MH_EST_CTE
    + """
    , pairs AS (
      SELECT id_a, id_b FROM est WHERE est_jaccard >= 0.3),
    lab AS (
      SELECT LEAST(da.source, db.source) AS source_a,
             GREATEST(da.source, db.source) AS source_b
      FROM pairs
      JOIN documents da ON pairs.id_a = da.doc_id
      JOIN documents db ON pairs.id_b = db.doc_id)
    SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM lab GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def dedup_source_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE the near-duplicates live: the MinHash-LSH candidate pairs
    (est. Jaccard >= 0.3) cross-tabulated by the sources of both sides —
    the contamination matrix that tells a curator which feeds mirror
    each other (off-diagonal mass) vs self-duplicate (diagonal mass),
    i.e. whether to dedup within or across acquisitions.

    Composition: the shared persisted signature table feeds the same
    banded LSH as dedup_minhash_lsh; two slim doc_id->source hash joins
    label the pairs; one small group rollup. The oracle reuses the
    minhash CTE verbatim, so the pair set is bit-identical.
    """
    d = T(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(
        d,
        min_jaccard=0.3,
        sig=shared_doc_sigs(spark, sf_dir),
        banded=shared_doc_banded(spark, sf_dir),
    )
    src = d.select(F.col("doc_id"), F.col("source"))
    a = src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("_sa"))
    b = src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("_sb"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .groupBy(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# Cost-sensitive threshold selection.
# ---------------------------------------------------------------------------
from sqlitedataframe_spark.suite.pipeline10 import _SCORED_CTE, _scored  # noqa: E402

_COST_THRESHOLDS = [round(0.05 * i, 2) for i in range(1, 20)]
_COST_FP, _COST_FN = 1.0, 5.0


@query(
    "eval_cost_threshold",
    oracle=f"""
    WITH {_SCORED_CTE},
    -- CAST: unnest of decimal literals is DECIMAL in DuckDB while the
    -- Spark threshold array is double; the types must match cell-for-cell
    -- (checker-fidelity r10 — a normalizer stricter than float(Decimal)
    -- would hash them apart)
    thr AS (SELECT CAST(unnest([{", ".join(str(t) for t in _COST_THRESHOLDS)}])
                        AS DOUBLE) AS t),
    cells AS (
      SELECT thr.t,
             CAST(SUM(CASE WHEN s >= thr.t AND y = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS fp,
             CAST(SUM(CASE WHEN s < thr.t AND y = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS fn
      FROM scored, thr GROUP BY 1),
    costed AS (
      SELECT t AS threshold, fp, fn,
             ROUND(fp * {_COST_FP} + fn * {_COST_FN} + 1e-9, 2) AS exp_cost
      FROM cells),
    best AS (
      SELECT MIN(exp_cost) AS mc FROM costed)
    SELECT threshold, fp, fn, exp_cost,
           exp_cost = (SELECT mc FROM best)
             AND threshold = (SELECT MIN(threshold) FROM costed, best
                              WHERE exp_cost = mc) AS is_best
    FROM costed ORDER BY threshold
    """,
)
def eval_cost_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-sensitive operating point for the quality gate: expected cost
    (FP x 1 + FN x 5 — passing junk is cheap, dropping good data is
    expensive) swept over 19 thresholds, with the argmin marked — the
    decision-theoretic upgrade of the F1 sweep when the two error types
    are NOT symmetric (they never are in corpus curation).

    Shape: one scan collapses the corpus to score-bucket counts; the
    19-threshold expansion is a literal-array cross over that tiny
    frame; the argmin is a 1-row broadcast back.
    """
    scored = _scored(spark, sf_dir)
    thr = F.explode(
        F.array(*[F.lit(t) for t in _COST_THRESHOLDS])
    ).alias("threshold")
    cells = (
        scored.select("s", "y", thr)
        .groupBy("threshold")
        .agg(
            F.sum(((F.col("s") >= F.col("threshold")) & (F.col("y") == 0)).cast("bigint"))
            .cast("bigint")
            .alias("fp"),
            F.sum(((F.col("s") < F.col("threshold")) & (F.col("y") == 1)).cast("bigint"))
            .cast("bigint")
            .alias("fn"),
        )
        .select(
            "threshold",
            "fp",
            "fn",
            F.round(
                F.col("fp") * _COST_FP + F.col("fn") * _COST_FN + 1e-9, 2
            ).alias("exp_cost"),
        )
    )
    best = cells.agg(
        F.min("exp_cost").alias("_mc"),
        F.min_by("threshold", F.struct("exp_cost", "threshold")).alias("_bt"),
    )
    return (
        cells.join(F.broadcast(best))
        .select(
            "threshold",
            "fp",
            "fn",
            "exp_cost",
            (
                (F.col("exp_cost") == F.col("_mc"))
                & (F.col("threshold") == F.col("_bt"))
            ).alias("is_best"),
        )
        .orderBy("threshold")
    )


# ---------------------------------------------------------------------------
# Leakage-safe temporal split audit.
# ---------------------------------------------------------------------------
@query(
    "sample_temporal_split",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
    cut AS (
      SELECT CAST(floor(quantile_cont(sec, 0.8)) AS BIGINT) AS split_sec
      FROM e),
    t AS (
      SELECT e.user_id, e.sec <= cut.split_sec AS is_train
      FROM e, cut)
    SELECT (SELECT split_sec FROM cut) AS split_sec,
           CAST(SUM(CASE WHEN is_train THEN 1 ELSE 0 END) AS BIGINT)
             AS n_train,
           CAST(SUM(CASE WHEN is_train THEN 0 ELSE 1 END) AS BIGINT)
             AS n_test,
           CAST(COUNT(DISTINCT CASE WHEN is_train THEN user_id END)
                AS BIGINT) AS n_users_train,
           CAST(COUNT(DISTINCT CASE WHEN NOT is_train THEN user_id END)
                AS BIGINT) AS n_users_test,
           CAST((SELECT COUNT(*) FROM
                 (SELECT user_id FROM t WHERE is_train
                  INTERSECT
                  SELECT user_id FROM t WHERE NOT is_train))
                AS BIGINT) AS n_users_both
    FROM t
    """,
)
def sample_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal train/test split audit at the 80th-percentile event
    second (exact interpolated percentile, floored to a whole second, so
    both engines cut at the same instant): row counts per side plus the
    user-overlap count — the entity-leakage readout that decides between
    a plain time split and a group-safe one (overlapping users leak
    behavior across the boundary even when timestamps don't).

    Shape: the cut is ONE exact-percentile aggregate broadcast back (no
    ordered window anywhere), then one conditional-count aggregate plus
    a distinct-users intersection.
    """
    ev = T(spark, sf_dir, "events").select(
        "user_id", F.unix_timestamp("ts").alias("sec")
    )
    cut = ev.agg(
        F.floor(F.percentile("sec", 0.8)).cast("bigint").alias("split_sec")
    )
    t = ev.join(F.broadcast(cut)).select(
        "user_id",
        "split_sec",
        (F.col("sec") <= F.col("split_sec")).alias("is_train"),
    )
    both = (
        t.filter("is_train")
        .select("user_id")
        .intersect(t.filter(~F.col("is_train")).select("user_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users_both"))
    )
    agg = t.groupBy("split_sec").agg(
        F.sum(F.col("is_train").cast("bigint")).cast("bigint").alias("n_train"),
        F.sum((~F.col("is_train")).cast("bigint")).cast("bigint").alias("n_test"),
        F.countDistinct(F.when(F.col("is_train"), F.col("user_id")))
        .cast("bigint")
        .alias("n_users_train"),
        F.countDistinct(F.when(~F.col("is_train"), F.col("user_id")))
        .cast("bigint")
        .alias("n_users_test"),
    )
    return agg.join(F.broadcast(both)).select(
        "split_sec",
        "n_train",
        "n_test",
        "n_users_train",
        "n_users_test",
        "n_users_both",
    )


# ---------------------------------------------------------------------------
# Split-half embedding-centroid drift (encoder stability).
# ---------------------------------------------------------------------------
@query(
    "embed_centroid_drift",
    oracle="""
    WITH per AS (
      SELECT label, vec_id % 2 AS half,
             generate_subscripts(embedding, 1) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings),
    cent AS (
      SELECT label, half, dim, AVG(v) AS c
      FROM per GROUP BY 1, 2, 3),
    j AS (
      SELECT a.label, a.dim, a.c AS ca, b.c AS cb
      FROM cent a JOIN cent b
        ON a.label = b.label AND a.dim = b.dim
       AND a.half = 0 AND b.half = 1),
    dot AS (
      SELECT label, SUM(ca * cb) AS ab,
             SUM(ca * ca) AS aa, SUM(cb * cb) AS bb
      FROM j GROUP BY 1),
    n AS (
      SELECT label,
             CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_half0,
             CAST(SUM(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_half1
      FROM embeddings GROUP BY 1)
    SELECT n.label, n.n_half0, n.n_half1,
           ROUND(ab / (sqrt(aa) * sqrt(bb)) + 1e-9, 6) AS centroid_cosine
    FROM dot JOIN n USING (label) ORDER BY label
    """,
)
def embed_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-half encoder-stability check: per label, the cosine between
    the centroid of even-id vectors and the centroid of odd-id vectors —
    near 1.0 for a healthy class, low for a class whose embeddings are
    bimodal or drifting across the corpus (mixed encoder versions, label
    noise).

    Shape: posexplode to dim-keyed scalars (vectors never shuffle
    whole), one (label, half, dim) mean aggregate, a dim-keyed self-join
    of the two tiny centroid frames, a per-label dot-product rollup.
    """
    emb = T(spark, sf_dir, "embeddings")
    per = emb.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(
            F.transform(F.col("embedding"), lambda x: x.cast("double"))
        ).alias("dim", "v"),
    )
    cent = per.groupBy("label", "half", "dim").agg(F.avg("v").alias("c"))
    a = cent.filter(F.col("half") == 0).select(
        "label", "dim", F.col("c").alias("ca")
    )
    b = cent.filter(F.col("half") == 1).select(
        "label", "dim", F.col("c").alias("cb")
    )
    dot = (
        a.join(b, ["label", "dim"])
        .groupBy("label")
        .agg(
            F.sum(F.col("ca") * F.col("cb")).alias("ab"),
            F.sum(F.col("ca") * F.col("ca")).alias("aa"),
            F.sum(F.col("cb") * F.col("cb")).alias("bb"),
        )
    )
    n = emb.groupBy("label").agg(
        F.sum((F.col("vec_id") % 2 == 0).cast("bigint"))
        .cast("bigint")
        .alias("n_half0"),
        F.sum((F.col("vec_id") % 2 == 1).cast("bigint"))
        .cast("bigint")
        .alias("n_half1"),
    )
    return (
        dot.join(n, "label")
        .select(
            "label",
            "n_half0",
            "n_half1",
            F.round(
                F.col("ab") / (F.sqrt("aa") * F.sqrt("bb")) + 1e-9, 6
            ).alias("centroid_cosine"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# Rate-based bot screen.
# ---------------------------------------------------------------------------
@query(
    "events_bot_screen",
    oracle="""
    WITH perm AS (
      SELECT user_id, date_trunc('minute', ts) AS m, COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    per AS (
      SELECT user_id,
             CAST(SUM(n) AS BIGINT) AS n_events,
             CAST(COUNT(*) AS BIGINT) AS active_minutes,
             CAST(MAX(n) AS BIGINT) AS peak_per_minute
      FROM perm GROUP BY 1)
    SELECT user_id, n_events, active_minutes, peak_per_minute
    FROM per
    ORDER BY peak_per_minute DESC, n_events DESC, user_id LIMIT 20
    """,
)
def events_bot_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-based bot/abuse screen: the 20 users with the highest
    single-minute burst (peak events per minute), with totals and active
    minutes — the first cut of traffic hygiene before engagement
    analytics (a user whose peak rate is superhuman is a script).

    Shape: one (user, minute) count aggregate (map-side combinable),
    one per-user rollup, TakeOrdered top-20 with full tiebreak.
    """
    ev = T(spark, sf_dir, "events")
    perm = ev.groupBy(
        "user_id", F.date_trunc("minute", F.col("ts")).alias("m")
    ).agg(F.count(F.lit(1)).alias("n"))
    per = perm.groupBy("user_id").agg(
        F.sum("n").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("active_minutes"),
        F.max("n").cast("bigint").alias("peak_per_minute"),
    )
    return per.orderBy(
        F.col("peak_per_minute").desc(),
        F.col("n_events").desc(),
        F.col("user_id").asc(),
    ).limit(20)


# ---------------------------------------------------------------------------
# Funnel conversion rates with Wilson confidence bounds.
# ---------------------------------------------------------------------------
@query(
    "events_funnel_wilson",
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
    counts AS (
      SELECT 'stage1_view_to_click' AS step,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_prev,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_next
      UNION ALL
      SELECT 'stage2_click_to_purchase',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM c),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM p)),
    w AS (
      SELECT step, n_prev, n_next,
             n_next / CAST(n_prev AS DOUBLE) AS p,
             1.96 AS z, CAST(n_prev AS DOUBLE) AS n
      FROM counts)
    SELECT step, n_prev, n_next,
           ROUND(CASE WHEN n_prev > 0 THEN p END + 1e-9, 6) AS rate,
           ROUND(CASE WHEN n_prev > 0 THEN (p + z * z / (2 * n)
                  - z * sqrt(p * (1 - p) / n + z * z / (4 * n * n)))
                 / (1 + z * z / n) END + 1e-9, 6) AS wilson_lo,
           ROUND(CASE WHEN n_prev > 0 THEN (p + z * z / (2 * n)
                  + z * sqrt(p * (1 - p) / n + z * z / (4 * n * n)))
                 / (1 + z * z / n) END + 1e-9, 6) AS wilson_hi
    FROM w ORDER BY step
    """,
)
def events_funnel_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel step-conversion rates (view->click, click->purchase, the
    events_funnel ordering contract) with Wilson 95% score intervals —
    the small-sample-honest CI (never escapes [0,1], unlike the normal
    approximation) a growth dashboard should put on every funnel bar.

    Shape: three keyed min-timestamp aggregates (the funnel spine),
    three 1-row counts, closed-form Wilson arithmetic over a 2-row frame.
    """
    ev = T(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t_view")
    )
    c = (
        ev.join(v, "user_id")
        .filter((F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.join(c, "user_id")
        .filter(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t_click"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    nv = v.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    nc = c.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    np_ = p.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    s1 = (
        nv.select(F.col("n").alias("n_prev"))
        .join(F.broadcast(nc.select(F.col("n").alias("n_next"))))
        .select(F.lit("stage1_view_to_click").alias("step"), "n_prev", "n_next")
    )
    s2 = (
        nc.select(F.col("n").alias("n_prev"))
        .join(F.broadcast(np_.select(F.col("n").alias("n_next"))))
        .select(
            F.lit("stage2_click_to_purchase").alias("step"), "n_prev", "n_next"
        )
    )
    counts = s1.unionByName(s2)
    pr = F.col("n_next") / F.col("n_prev").cast("double")
    n = F.col("n_prev").cast("double")
    z = F.lit(1.96)
    center = pr + z * z / (2 * n)
    half = z * F.sqrt(pr * (1 - pr) / n + z * z / (4 * n * n))
    denom = 1 + z * z / n
    # empty-stage guard: an upstream stage with zero users yields NULL
    # stats, not an engine-dependent division-by-zero artifact
    ok = F.col("n_prev") > 0
    return counts.select(
        "step",
        "n_prev",
        "n_next",
        F.round(F.when(ok, pr) + 1e-9, 6).alias("rate"),
        F.round(F.when(ok, (center - half) / denom) + 1e-9, 6).alias("wilson_lo"),
        F.round(F.when(ok, (center + half) / denom) + 1e-9, 6).alias("wilson_hi"),
    ).orderBy("step")


# ---------------------------------------------------------------------------
# Snapshot schema/stats drift profile.
# ---------------------------------------------------------------------------
@query(
    "profile_stats_drift",
    oracle="""
    WITH h AS (
      SELECT CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                  THEN 'H1' ELSE 'H2' END AS half,
             o_totalprice, o_custkey
      FROM orders)
    SELECT 'o_custkey' AS col_name, half,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
           ROUND(MIN(o_custkey) + 1e-9, 4) AS min_v,
           ROUND(MAX(o_custkey) + 1e-9, 4) AS max_v,
           ROUND(AVG(o_custkey) + 1e-9, 4) AS mean_v
    FROM h GROUP BY half
    UNION ALL
    SELECT 'o_totalprice', half,
           CAST(COUNT(*) AS BIGINT), CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
           ROUND(MIN(o_totalprice) + 1e-9, 4), ROUND(MAX(o_totalprice) + 1e-9, 4),
           ROUND(AVG(o_totalprice) + 1e-9, 4)
    FROM h GROUP BY half
    ORDER BY col_name, half
    """,
)
def profile_stats_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-over-snapshot column-stats profile: per column and
    calendar half (before/after 1998-01-01), row count, distinct count,
    min/max/mean — the data-contract table a pipeline diffs to catch
    silent upstream changes (id-space jumps, price rescaling,
    cardinality collapse) before they poison a training run.

    Shape: one scan, one (column x half) aggregate pair unioned;
    everything map-side combinable.
    """
    o = T(spark, sf_dir, "orders")
    half = F.when(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"), "H1"
    ).otherwise("H2")
    h = o.select(
        half.alias("half"), "o_totalprice", "o_custkey"
    )

    def stats(col: str):
        return h.groupBy("half").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.countDistinct(col).cast("bigint").alias("n_distinct"),
            F.round(F.min(col) + 1e-9, 4).alias("min_v"),
            F.round(F.max(col) + 1e-9, 4).alias("max_v"),
            F.round(F.avg(col) + 1e-9, 4).alias("mean_v"),
        ).select(F.lit(col).alias("col_name"), "half", "n", "n_distinct",
                 "min_v", "max_v", "mean_v")

    return (
        stats("o_custkey")
        .unionByName(stats("o_totalprice"))
        .orderBy("col_name", "half")
    )


# ---------------------------------------------------------------------------
# Hill tail-index estimate (heavy-tail risk).
# ---------------------------------------------------------------------------
@query(
    "orders_tail_index",
    oracle="""
    WITH top AS (
      SELECT o_totalprice AS x
      FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 101),
    r AS (SELECT MIN(x) AS ref FROM top),
    e AS (
      SELECT SUM(CASE WHEN x > r.ref THEN LN(x / r.ref) ELSE 0 END) AS s,
             CAST(SUM(CASE WHEN x > r.ref THEN 1 ELSE 0 END) AS BIGINT)
               AS k
      FROM top, r)
    SELECT k AS n_exceedances,
           ROUND((SELECT ref FROM r) + 1e-9, 4) AS threshold,
           ROUND(CASE WHEN k > 0 THEN s / k END + 1e-9, 6)
             AS hill_mean_log_excess,
           ROUND(CASE WHEN k > 0 THEN k / s END + 1e-9, 6) AS tail_alpha
    FROM e
    """,
)
def orders_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail-index of order values over the top-101 order statistics
    (tie-tolerant: exceedances are rows strictly above the boundary
    value, so duplicate boundary prices can't make the estimate
    engine-dependent): alpha ~ 1/mean(ln(x/threshold)) — the heavy-tail
    risk gauge (alpha <= 2 means infinite variance: mean-based monitors
    lie; pair with agg_median_of_means).

    Shape: one TakeOrdered(101) with a full tiebreak (never a global
    sort), a 1-row min broadcast, one closed-form aggregate.
    """
    o = T(spark, sf_dir, "orders")
    top = (
        o.select(F.col("o_totalprice").alias("x"), "o_orderkey")
        .orderBy(F.col("x").desc(), F.col("o_orderkey").asc())
        .limit(101)
        .select("x")
    )
    r = top.agg(F.min("x").alias("ref"))
    e = top.join(F.broadcast(r)).agg(
        F.sum(
            F.when(F.col("x") > F.col("ref"), F.log(F.col("x") / F.col("ref"))).otherwise(
                0.0
            )
        ).alias("s"),
        F.sum((F.col("x") > F.col("ref")).cast("bigint")).cast("bigint").alias("k"),
        F.round(F.min("ref") + 1e-9, 4).alias("threshold"),
    )
    ok = F.col("k") > 0  # all-ties top frame: NULL, not a 0/0 artifact
    return e.select(
        F.col("k").alias("n_exceedances"),
        "threshold",
        F.round(F.when(ok, F.col("s") / F.col("k")) + 1e-9, 6).alias(
            "hill_mean_log_excess"
        ),
        F.round(F.when(ok, F.col("k") / F.col("s")) + 1e-9, 6).alias(
            "tail_alpha"
        ),
    )


# ---------------------------------------------------------------------------
# Bipartite projection with cosine-normalized edge weights.
# ---------------------------------------------------------------------------
@query(
    "graph_coorder_projection",
    oracle="""
    WITH slim AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    freq AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS f FROM slim GROUP BY 1),
    co AS (
      SELECT a.p AS src, b.p AS dst, CAST(COUNT(*) AS BIGINT) AS co_count
      FROM slim a JOIN slim b ON a.o = b.o AND a.p < b.p
      GROUP BY 1, 2),
    w AS (
      SELECT co.src, co.dst, co.co_count,
             ROUND(co.co_count / sqrt(CAST(fa.f AS DOUBLE) * fb.f) + 1e-9, 6)
               AS weight
      FROM co JOIN freq fa ON co.src = fa.p JOIN freq fb ON co.dst = fb.p)
    SELECT src, dst, co_count, weight
    FROM w ORDER BY weight DESC, src, dst LIMIT 20
    """,
)
def graph_coorder_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted bipartite projection of the order-part graph: top-20 part
    pairs by cosine-normalized co-occurrence (co_count /
    sqrt(freq_a * freq_b)) — the association weight that, unlike the raw
    threshold the triangle/link-prediction queries use, doesn't let two
    bestsellers look related just because both are everywhere.

    Shape: one distinct, one frequency aggregate, one order-keyed
    equi self-join for co-counts, two part-keyed joins for the
    normalizer, TakeOrdered top-20 on the rounded weight.
    """
    li = T(spark, sf_dir, "lineitem")
    slim = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    freq = slim.groupBy("p").agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    a = slim.select(F.col("o"), F.col("p").alias("src"))
    b = slim.select(F.col("o"), F.col("p").alias("dst"))
    co = (
        a.join(b, "o")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("co_count"))
    )
    fa = freq.select(F.col("p").alias("src"), F.col("f").alias("_fa"))
    fb = freq.select(F.col("p").alias("dst"), F.col("f").alias("_fb"))
    w = (
        co.join(fa, "src")
        .join(fb, "dst")
        .select(
            "src",
            "dst",
            "co_count",
            F.round(
                F.col("co_count")
                / F.sqrt(F.col("_fa").cast("double") * F.col("_fb"))
                + 1e-9,
                6,
            ).alias("weight"),
        )
    )
    return w.orderBy(
        F.col("weight").desc(), F.col("src").asc(), F.col("dst").asc()
    ).limit(20)
