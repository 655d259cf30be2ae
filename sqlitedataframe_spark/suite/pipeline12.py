"""Round-6 wave: regression-model evaluation, daily-series ACF and the
Wald–Wolfowitz runs test, neighborhood-Jaccard link prediction, categorical
mutual information, and code-document detection — six capabilities the
registry did not cover (classification eval existed, regression eval did
not; KL existed, MI did not; triangles existed, link prediction did not).
Second wave: Jensen-Shannon source divergence (bounded/symmetric KL
companion), Cramér's V (chi-square association), trailing-window rolling
p90 (ops baseline), and inverse-propensity reweighting after a biased
sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlitedataframe_spark.operators import evalmetrics as E
from sqlitedataframe_spark.operators import text as X
from sqlitedataframe_spark.operators.features import mutual_information
from sqlitedataframe_spark.operators.graph import neighbor_jaccard
from sqlitedataframe_spark.operators.profiling import runs_test
from sqlitedataframe_spark.operators.relational import acf_lags
from sqlitedataframe_spark.suite import query
from sqlitedataframe_spark.suite.relational import T


# ---------------------------------------------------------------------------
# Regression-model evaluation: the per-priority mean as a price predictor.
# ---------------------------------------------------------------------------
@query(
    "eval_regression_metrics",
    oracle="""
    WITH means AS (
      SELECT o_orderpriority, AVG(o_totalprice) AS pred
      FROM orders GROUP BY 1),
    s AS (
      SELECT pred, o_totalprice AS actual
      FROM orders JOIN means USING (o_orderpriority)),
    a AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(actual) AS sy, SUM(actual * actual) AS sy2,
             SUM((pred - actual) * (pred - actual)) AS se2,
             SUM(ABS(pred - actual)) AS sae,
             SUM(CASE WHEN actual <> 0
                 THEN ABS((pred - actual) / actual) END) AS sape,
             CAST(COUNT(CASE WHEN actual <> 0 THEN 1 END) AS BIGINT) AS nnz,
             SUM(pred - actual) AS se
      FROM s)
    SELECT n,
           ROUND(sqrt(se2 / n) + 1e-9, 4) AS rmse,
           ROUND(sae / n + 1e-9, 4) AS mae,
           ROUND(1.0 - se2 / (sy2 - sy * sy / n) + 1e-9, 6) AS r2,
           ROUND(100.0 * sape / nnz + 1e-9, 4) AS mape_pct,
           ROUND(se / n + 1e-9, 4) AS bias
    FROM a
    """,
)
def eval_regression_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regression eval (n, RMSE, MAE, R^2, MAPE, bias) of the
    per-priority mean as a totalprice predictor — overall R^2 of a
    group-mean model is the correlation ratio (eta^2): how much price
    variance the priority class explains.

    operators.evalmetrics.regression_metrics: six map-side partial sums,
    one exchange, R^2 via SST = sum(y^2) - (sum y)^2/n (no second pass);
    the group means broadcast onto the fact table (5-row dim).
    """
    o = T(spark, sf_dir, "orders")
    means = o.groupBy("o_orderpriority").agg(
        F.avg("o_totalprice").alias("pred")
    )
    scored = o.join(F.broadcast(means), "o_orderpriority").select(
        "pred", F.col("o_totalprice").alias("actual")
    )
    return E.regression_metrics(scored, "pred", "actual")


# ---------------------------------------------------------------------------
# Daily-revenue autocorrelation at calendar lags 1..7.
# ---------------------------------------------------------------------------
@query(
    "orders_acf_lags",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
             SUM(o_totalprice) AS val
      FROM orders GROUP BY 1),
    lags AS (SELECT CAST(UNNEST(range(1, 8)) AS INT) AS lag)
    SELECT lag,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(corr(a.val, b.val) + 1e-9, 4) + 0.0 AS acf
    FROM daily a JOIN lags ON TRUE
    JOIN daily b ON b.d = a.d + lag
    GROUP BY lag ORDER BY lag
    """,
)
def orders_acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of daily order revenue at lags 1..7 days — the
    weekly-periodicity diagnostic preceding any forecast model.

    operators.relational.acf_lags: one data-sized aggregate to the
    #days frame, lags from an exploded 7-element literal (no cross
    join), shifted copy via broadcast equi-join on date_add(d, lag) —
    never a window or global sort.
    """
    o = T(spark, sf_dir, "orders")
    return acf_lags(
        o, "o_orderdate", F.sum("o_totalprice"), max_lag=7, round_dp=4
    )


# ---------------------------------------------------------------------------
# Runs test for randomness of the daily revenue sequence.
# ---------------------------------------------------------------------------
@query(
    "orders_runs_test",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
             CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT) AS cents
      FROM orders GROUP BY 1),
    tot AS (
      SELECT CAST(SUM(cents) AS BIGINT) AS t_total,
             CAST(COUNT(*) AS BIGINT) AS k_days
      FROM daily),
    signs AS (
      SELECT d, (k_days * cents > t_total) AS above
      FROM daily CROSS JOIN tot),
    seq AS (
      SELECT d, above, LEAD(above) OVER (ORDER BY d) AS next_above
      FROM signs),
    chg AS (
      SELECT CAST(SUM(CASE WHEN next_above IS NOT NULL
                           AND above <> next_above THEN 1 ELSE 0 END)
                  AS BIGINT) AS changes
      FROM seq),
    counts AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(CASE WHEN above THEN 1 ELSE 0 END) AS BIGINT)
               AS n_above,
             CAST(SUM(CASE WHEN above THEN 0 ELSE 1 END) AS BIGINT)
               AS n_below
      FROM signs)
    SELECT n_days, n_above, n_below,
           CAST(changes + 1 AS BIGINT) AS runs,
           ROUND(1.0 + 2.0 * n_above * n_below / n_days + 1e-9, 4)
             AS exp_runs,
           ROUND((changes + 1 - (1.0 + 2.0 * n_above * n_below / n_days))
                 / sqrt((2.0 * n_above * n_below
                         * (2.0 * n_above * n_below - n_days))
                        / (CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE)
                           * (CAST(n_days AS DOUBLE) - 1.0))) + 1e-9, 4) + 0.0
             AS z
    FROM counts CROSS JOIN chg
    """,
)
def orders_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test on daily revenue's above/below-mean
    sequence — trending (z < 0) vs mean-reverting (z > 0) vs random.

    operators.profiling.runs_test: the above/below split compares
    integer cents (k * cents_d > total) so no float accumulation can
    flip a day between engines; successor days via the bounded
    triangular day-frame self-join (level_shift family pattern, not a
    date-ordered global window).
    """
    o = T(spark, sf_dir, "orders")
    return runs_test(
        o,
        "o_orderdate",
        F.round(F.sum("o_totalprice") * 100, 0),
        round_dp=4,
    )


# ---------------------------------------------------------------------------
# Link prediction on the part co-order graph.
# ---------------------------------------------------------------------------
@query(
    "graph_jaccard_neighbors",
    oracle="""
    WITH slim AS (
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
      WHERE _wn <= 10000),
    cn AS (
      SELECT a.u AS x, b.u AS y, CAST(COUNT(*) AS BIGINT) AS cn
      FROM wedge a JOIN wedge b ON a.v = b.v AND a.u < b.u
      GROUP BY 1, 2),
    nonadj AS (
      SELECT cn.x, cn.y, cn.cn FROM cn
      ANTI JOIN e ON cn.x = e.u AND cn.y = e.v),
    scored AS (
      SELECT x AS u, y AS v, cn,
             du.deg AS deg_u, dv.deg AS deg_v,
             ROUND(cn / CAST(du.deg + dv.deg - cn AS DOUBLE), 6) AS jaccard
      FROM nonadj
      JOIN deg du ON nonadj.x = du.u
      JOIN deg dv ON nonadj.y = dv.u)
    SELECT u, v, cn, deg_u, deg_v, jaccard
    FROM scored ORDER BY jaccard DESC, u, v LIMIT 20
    """,
)
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 predicted links on the part co-order graph (same edge set
    as graph_triangles): non-adjacent part pairs ranked by neighborhood
    Jaccard — the recommend-an-edge / entity-merge-candidate primitive.

    operators.graph.neighbor_jaccard: symmetrize once, one equi wedge
    join on the shared-neighbor id, degrees from one groupBy, union via
    deg_u + deg_v - cn, anti-join to drop existing edges, TakeOrdered
    top-k. jaccard is one int/int division — bit-identical ordering
    across engines. The automatic hub-degree cap on wedge centers
    (max_center_degree=10000, VERDICT r6 #1) is replayed verbatim in the
    oracle's `wedge` CTE so the comparison stays exact at any SF.
    """
    li = T(spark, sf_dir, "lineitem")
    slim = li.select("l_orderkey", "l_partkey").distinct()
    a = slim.select(F.col("l_orderkey").alias("_o"), F.col("l_partkey").alias("src"))
    b = slim.select(F.col("l_orderkey").alias("_o"), F.col("l_partkey").alias("dst"))
    edges = (
        a.join(b, "_o")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= 2)
        .select("src", "dst")
    )
    return neighbor_jaccard(edges, top_k=20)


# ---------------------------------------------------------------------------
# Categorical mutual information: language x source.
# ---------------------------------------------------------------------------
@query(
    "feature_mutual_information",
    oracle="""
    WITH joint AS (
      SELECT lang AS a, source AS b, CAST(COUNT(*) AS BIGINT) AS nab
      FROM documents GROUP BY 1, 2),
    ma AS (SELECT a, CAST(SUM(nab) AS BIGINT) AS na FROM joint GROUP BY 1),
    mb AS (SELECT b, CAST(SUM(nab) AS BIGINT) AS nb FROM joint GROUP BY 1),
    tot AS (SELECT CAST(SUM(nab) AS BIGINT) AS n FROM joint),
    mi AS (
      SELECT MAX(n) AS n, CAST(COUNT(*) AS BIGINT) AS n_cells,
             SUM((nab / CAST(n AS DOUBLE))
                 * ln(nab * CAST(n AS DOUBLE) / (na * CAST(nb AS DOUBLE))))
               AS mi_nats
      FROM joint JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN tot),
    ha AS (
      SELECT -SUM((na / CAST(n AS DOUBLE)) * ln(na / CAST(n AS DOUBLE)))
               AS ha_nats
      FROM ma CROSS JOIN tot),
    hb AS (
      SELECT -SUM((nb / CAST(n AS DOUBLE)) * ln(nb / CAST(n AS DOUBLE)))
               AS hb_nats
      FROM mb CROSS JOIN tot)
    SELECT n, n_cells,
           ROUND(mi_nats / 0.6931471805599453 + 1e-9, 6) AS mi_bits,
           ROUND(ha_nats / 0.6931471805599453 + 1e-9, 6) AS h_a_bits,
           ROUND(hb_nats / 0.6931471805599453 + 1e-9, 6) AS h_b_bits,
           ROUND(mi_nats / sqrt(ha_nats * hb_nats) + 1e-9, 6) AS nmi
    FROM mi CROSS JOIN ha CROSS JOIN hb
    """,
)
def feature_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (bits) + sqrt-normalized NMI between document
    language and source — the redundancy / leakage screen run before a
    categorical column is admitted as a model feature.

    operators.features.mutual_information: one data-sized aggregate to
    the |lang| x |source| cell frame; marginals and the 1-row total are
    broadcast re-aggregations of that tiny frame.
    """
    d = T(spark, sf_dir, "documents")
    return mutual_information(d, "lang", "source")


# ---------------------------------------------------------------------------
# Code-document detection for corpus routing / mixture capping.
# ---------------------------------------------------------------------------
@query(
    "text_code_detect",
    oracle=r"""
    WITH scored AS (
      SELECT source,
             ROUND(
               LEAST((LENGTH(text)
                      - LENGTH(regexp_replace(text, '[{}()\[\];=<>]', '',
                               'g')))
                     / CAST(GREATEST(LENGTH(text), 1) AS DOUBLE) * 12.5,
                     1.0) * 0.6
               + LEAST(CAST(len(regexp_extract_all(lower(text),
                   '\b(def|return|class|import|function|var|const|lambda|void|struct)\b'))
                   AS DOUBLE) / 3.0, 1.0) * 0.4,
               6) AS score
      FROM documents)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(score) + 1e-9, 6) AS avg_code_score,
           CAST(SUM(CASE WHEN score >= 0.3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_code,
           ROUND(AVG(CASE WHEN score >= 0.3 THEN 1.0 ELSE 0.0 END) + 1e-9, 6)
             AS code_rate
    FROM scored GROUP BY source ORDER BY source
    """,
)
def text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source code-likeness profile: mean score, count and share of
    code-like documents (score >= 0.3) — the router a corpus pipeline
    uses to split code from prose (or cap code share in a mixture).

    operators.text.code_likeness: 60% saturated structural-symbol
    density + 40% saturated keyword density, pure Column expressions —
    runs inside the scan stage, zero extra shuffles before the one
    per-source aggregate.
    """
    d = T(spark, sf_dir, "documents")
    scored = d.select("source", X.code_likeness("text").alias("score"))
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.avg("score") + 1e-9, 6).alias("avg_code_score"),
            F.sum(F.when(F.col("score") >= 0.3, 1).otherwise(0))
            .cast("bigint")
            .alias("n_code"),
            F.round(
                F.avg(F.when(F.col("score") >= 0.3, 1.0).otherwise(0.0))
                + 1e-9,
                6,
            ).alias("code_rate"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Jensen-Shannon divergence of each source's unigram mix vs the corpus.
# ---------------------------------------------------------------------------
@query(
    "text_jsd_sources",
    oracle="""
    WITH t AS (
      SELECT source,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
      FROM documents),
    sc AS (SELECT source, tok, COUNT(*) AS n FROM t GROUP BY 1, 2),
    st AS (SELECT source, SUM(n) AS tot FROM sc GROUP BY 1),
    gc AS (SELECT tok, SUM(n) AS g FROM sc GROUP BY 1),
    gt AS (SELECT SUM(n) AS gtot FROM sc)
    SELECT sc.source,
           CAST(MAX(tot) AS BIGINT) AS n_tokens,
           ROUND(0.5 + SUM(0.5 * (
               (n * 1.0 / tot)
                 * ln(2.0 * (n * 1.0 / tot)
                      / ((n * 1.0 / tot) + (g * 1.0 / gtot)))
                 / 0.6931471805599453
               + (g * 1.0 / gtot)
                 * ln(2.0 * (g * 1.0 / gtot)
                      / ((n * 1.0 / tot) + (g * 1.0 / gtot)))
                 / 0.6931471805599453
               - (g * 1.0 / gtot))) + 1e-9, 6) AS jsd_bits
    FROM sc JOIN st USING (source) JOIN gc USING (tok), gt
    GROUP BY sc.source ORDER BY sc.source
    """,
)
def text_jsd_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence (bits) of each source's unigram
    distribution from the corpus mix — the bounded, symmetric companion
    to text_source_kl (JSD stays finite when a source misses corpus
    vocabulary, so it ranks disjoint feeds sanely where KL blows up).

    Words absent from a source contribute exactly 0.5 * q to its JSD
    (m = q/2 there), so the whole absent-vocabulary mass folds into the
    closed form ``0.5 + sum_present 0.5*(p lg(2p/(p+q)) + q lg(2q/(p+q))
    - q)`` — only PRESENT (source, token) cells are ever materialized.
    Plan shape is text_source_kl's: one (source, token) count aggregate,
    source totals and the global token distribution broadcast back.
    """
    from sqlitedataframe_spark.operators.text import tokens

    d = T(spark, sf_dir, "documents")
    sc = (
        d.select("source", F.explode(tokens("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    st = sc.groupBy("source").agg(F.sum("_n").alias("_tot"))
    gc = sc.groupBy("tok").agg(F.sum("_n").alias("_g"))
    gt = sc.agg(F.sum("_n").alias("_gtot"))
    p = F.col("_n") * 1.0 / F.col("_tot")
    q = F.col("_g") * 1.0 / F.col("_gtot")
    ln2 = F.lit(0.6931471805599453)
    term = 0.5 * (
        p * F.log(2.0 * p / (p + q)) / ln2
        + q * F.log(2.0 * q / (p + q)) / ln2
        - q
    )
    return (
        sc.join(F.broadcast(st), "source")
        .join(F.broadcast(gc), "tok")
        .join(F.broadcast(gt))
        .groupBy("source")
        .agg(
            F.max("_tot").cast("bigint").alias("n_tokens"),
            F.round(F.lit(0.5) + F.sum(term) + 1e-9, 6).alias("jsd_bits"),
        )
        .select("source", "n_tokens", "jsd_bits")
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Cramér's V association: the chi-square companion to MI.
# ---------------------------------------------------------------------------
@query(
    "feature_cramers_v",
    oracle="""
    WITH joint AS (
      SELECT lang AS a, source AS b, CAST(COUNT(*) AS BIGINT) AS nab
      FROM documents GROUP BY 1, 2),
    ma AS (SELECT a, CAST(SUM(nab) AS BIGINT) AS na FROM joint GROUP BY 1),
    mb AS (SELECT b, CAST(SUM(nab) AS BIGINT) AS nb FROM joint GROUP BY 1),
    tot AS (SELECT CAST(SUM(nab) AS BIGINT) AS n FROM joint),
    ra AS (SELECT CAST(COUNT(*) AS BIGINT) AS r_levels FROM ma),
    rb AS (SELECT CAST(COUNT(*) AS BIGINT) AS c_levels FROM mb),
    s AS (
      SELECT MAX(n) AS n,
             SUM((nab * nab) / (na * CAST(nb AS DOUBLE))) AS sfit
      FROM joint JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN tot)
    SELECT n, r_levels, c_levels,
           CAST((r_levels - 1) * (c_levels - 1) AS BIGINT) AS dof,
           ROUND(n * (sfit - 1.0) + 1e-9, 4) AS chi2,
           ROUND(sqrt(n * (sfit - 1.0)
                      / (n * LEAST(r_levels - 1, c_levels - 1))) + 1e-9, 6)
             AS cramers_v
    FROM s CROSS JOIN ra CROSS JOIN rb
    """,
)
def feature_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V between document language and source — the bounded
    [0,1] chi-square association report number, comparable across
    contingency tables of different shapes (the MI screen's standard
    companion in a categorical-feature audit).

    operators.features.cramers_v: chi2 via the present-cells identity
    n*(sum o^2/(n_i n_j) - 1) — absent cells (observed 0, expected > 0)
    never materialize. One data-sized aggregate; everything after is
    arithmetic on the tiny cell frame.
    """
    from sqlitedataframe_spark.operators.features import cramers_v

    d = T(spark, sf_dir, "documents")
    return cramers_v(d, "lang", "source")


# ---------------------------------------------------------------------------
# Rolling trailing-7-day p90 of daily event volume.
# ---------------------------------------------------------------------------
@query(
    "events_rolling_p90",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1),
    offs AS (SELECT CAST(UNNEST(range(0, 7)) AS INT) AS off),
    cells AS (
      SELECT a.d, b.n
      FROM daily a JOIN offs ON TRUE JOIN daily b ON b.d = a.d - off),
    agg AS (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS w, list_sort(list(n)) AS vs
      FROM cells GROUP BY d)
    SELECT d, w,
           CAST(vs[CAST(ceil(0.9 * w) AS INT)] AS BIGINT) AS p90
    FROM agg ORDER BY d
    """,
)
def events_rolling_p90(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day p90 of daily event counts — the rolling baseline
    an ops monitor alerts against (today's volume vs the 90th
    percentile of the recent window; exact nearest-rank, so the value
    is always an observed day's count).

    operators.relational.rolling_percentile_daily: one aggregate to the
    #days frame, window assembled by exploding 7 literal offsets +
    broadcast equi-join on the calendar key (acf_lags shape — never a
    date-ordered global window), per-day sort over <= 7 BIGINTs.
    """
    from sqlitedataframe_spark.operators.relational import (
        rolling_percentile_daily,
    )

    e = T(spark, sf_dir, "events")
    out = rolling_percentile_daily(e, "ts", window_days=7, pct=0.9)
    return out.select("d", "w", F.col("p").alias("p90"))


# ---------------------------------------------------------------------------
# Inverse-propensity reweighting after a deliberately biased sample.
# ---------------------------------------------------------------------------
@query(
    "sample_inverse_propensity",
    oracle="""
    WITH samp AS (
      SELECT lang FROM documents
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
            CASE WHEN lang = 'en' THEN '8000' ELSE '199a' END),
    p AS (SELECT lang AS grp, CAST(COUNT(*) AS BIGINT) AS pop_n
          FROM documents GROUP BY 1),
    s AS (SELECT lang AS grp, CAST(COUNT(*) AS BIGINT) AS samp_n
          FROM samp GROUP BY 1),
    pt AS (SELECT CAST(SUM(pop_n) AS BIGINT) AS ptot FROM p),
    st AS (SELECT CAST(SUM(samp_n) AS BIGINT) AS stot FROM s)
    SELECT grp, pop_n,
           CAST(COALESCE(samp_n, 0) AS BIGINT) AS samp_n,
           ROUND((pop_n * 1.0 / ptot) / (samp_n * 1.0 / stot) + 1e-9, 6)
             AS weight
    FROM p LEFT JOIN s USING (grp) CROSS JOIN pt CROSS JOIN st
    ORDER BY grp
    """,
)
def sample_inverse_propensity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-stratification weights after a deliberately biased hash
    sample (English kept at 50%, everything else at 10% — the shape of
    any quota-ed or cost-tiered ingestion): weight = pop share / sample
    share per language, the factor that makes the weighted sample match
    the population mix again.

    operators.sampling.inverse_propensity_weights over the md5-hex
    deterministic sample predicate (sample_hash_deterministic's exact
    portable thresholds): one count aggregate per side, 1-row totals
    broadcast — the fact table scans once per side, never joins.
    """
    from sqlitedataframe_spark.operators.sampling import (
        _hex4,
        inverse_propensity_weights,
    )

    d = T(spark, sf_dir, "documents").select("doc_id", "lang")
    samp = d.filter(
        _hex4("doc_id")
        < F.when(F.col("lang") == "en", "8000").otherwise("199a")
    )
    return inverse_propensity_weights(d, samp, "lang")
