"""Round-6 additions: change-point detection, ANOVA, Neyman allocation,
held-out perplexity, and the LSH estimate histogram (threshold-tuning
diagnostic on the shared signature table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlitedataframe_spark.operators import dedup as D
from sqlitedataframe_spark.operators import text as X
from sqlitedataframe_spark.operators.profiling import anova_oneway
from sqlitedataframe_spark.operators.relational import level_shift_locate
from sqlitedataframe_spark.operators.sampling import neyman_allocation
from sqlitedataframe_spark.suite import query
from sqlitedataframe_spark.suite.pipeline import (
    MH_EST_CTE,
    shared_doc_banded,
    shared_doc_sigs,
)
from sqlitedataframe_spark.suite.relational import T


@query(
    "events_level_shift_locate",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS t_total,
             CAST(COUNT(*) AS BIGINT) AS k_days
      FROM daily),
    cs AS (
      SELECT d, CAST(SUM(k_days * n - t_total)
                     OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS cusum_int,
             k_days
      FROM daily CROSS JOIN tot),
    star AS (
      SELECT d AS change_date,
             ROUND(ABS(cusum_int) / CAST(k_days AS DOUBLE), 4) AS cusum_abs
      FROM cs ORDER BY ABS(cusum_int) DESC, d ASC LIMIT 1)
    SELECT change_date, cusum_abs,
           ROUND(SUM(CASE WHEN d <= change_date THEN n END)
                 / CAST(SUM(CASE WHEN d <= change_date THEN 1 END) AS DOUBLE), 4)
             AS mean_before,
           ROUND(SUM(CASE WHEN d > change_date THEN n END)
                 / CAST(SUM(CASE WHEN d > change_date THEN 1 END) AS DOUBLE), 4)
             AS mean_after,
           CAST(SUM(CASE WHEN d <= change_date THEN 1 END) AS BIGINT)
             AS n_days_before,
           CAST(SUM(CASE WHEN d > change_date THEN 1 END) AS BIGINT)
             AS n_days_after
    FROM daily CROSS JOIN star
    GROUP BY change_date, cusum_abs
    """,
)
def events_level_shift_locate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point LOCATION on the daily event-count series:
    integer-scaled cusum (no fp argmax drift), bounded triangular prefix
    sum over #days (operators.relational.level_shift_locate)."""
    return level_shift_locate(T(spark, sf_dir, "events"), "ts")


@query(
    "events_anova_hour",
    oracle="""
    WITH per AS (
      SELECT CAST(extract(hour FROM ts) AS BIGINT) AS g,
             CAST(COUNT(*) AS DOUBLE) AS n,
             SUM(value) AS s,
             SUM(value * value) AS q
      FROM events GROUP BY 1),
    fold AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS k, SUM(n) AS nn, SUM(s) AS ss,
             SUM(s * s / n) AS sb, SUM(q - s * s / n) AS ssw
      FROM per)
    SELECT CAST(k - 1 AS BIGINT) AS df_between,
           CAST(nn - k AS BIGINT) AS df_within,
           ROUND(((sb - ss * ss / nn) / (k - 1)) / (ssw / (nn - k)), 4)
             AS f_stat,
           ROUND((sb - ss * ss / nn) / ((sb - ss * ss / nn) + ssw), 6)
             AS eta_squared
    FROM fold
    """,
)
def events_anova_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of event value across hour-of-day groups
    (operators.profiling.anova_oneway) — the k>2 seasonality screen."""
    ev = T(spark, sf_dir, "events")
    return anova_oneway(ev, F.hour("ts").cast("bigint"), "value")


@query(
    "sample_neyman_allocation",
    oracle="""
    WITH per AS (
      SELECT lang AS stratum,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(n_chars) AS BIGINT) AS s,
             CAST(SUM(n_chars * n_chars) AS BIGINT) AS q
      FROM documents GROUP BY 1),
    w AS (
      SELECT stratum, n_rows,
             sqrt((q - s * s / CAST(n_rows AS DOUBLE)) / (n_rows - 1)) AS sd,
             n_rows * sqrt((q - s * s / CAST(n_rows AS DOUBLE)) / (n_rows - 1))
               AS wgt
      FROM per),
    tot AS (SELECT SUM(wgt) AS wt FROM w)
    SELECT stratum, n_rows,
           ROUND(sd, 6) AS stddev,
           ROUND(wgt / wt, 6) AS share,
           CAST(ROUND(100 * wgt / wt, 0) AS BIGINT) AS n_alloc
    FROM w CROSS JOIN tot
    ORDER BY stratum
    """,
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal allocation of a 100-row labeling budget across langs
    by n_chars variability (operators.sampling.neyman_allocation) — the
    minimum-variance stratified-sampling design."""
    return neyman_allocation(T(spark, sf_dir, "documents"), "lang", "n_chars", 100)


@query(
    "text_perplexity_heldout",
    oracle="""
    WITH base AS (
      SELECT doc_id, lang,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS t
      FROM documents
      WHERE len(regexp_split_to_array(lower(trim(text)), '\\s+')) >= 2),
    bg AS (
      SELECT doc_id, lang,
             list_transform(range(1, len(t)),
                            i -> t[i] || ' ' || t[i + 1]) AS bgs
      FROM base),
    tr AS (SELECT lang, UNNEST(bgs) AS b FROM bg WHERE doc_id % 5 <> 0),
    te AS (SELECT lang, UNNEST(bgs) AS b FROM bg WHERE doc_id % 5 = 0),
    c2 AS (SELECT lang, b, CAST(COUNT(*) AS BIGINT) AS c2 FROM tr GROUP BY 1, 2),
    c1 AS (SELECT lang, string_split(b, ' ')[1] AS w1,
                  CAST(COUNT(*) AS BIGINT) AS c1
           FROM tr GROUP BY 1, 2),
    v AS (
      SELECT lang, CAST(COUNT(DISTINCT w) AS BIGINT) AS v
      FROM (SELECT lang, UNNEST(t) AS w FROM base WHERE doc_id % 5 <> 0)
      GROUP BY 1),
    scored AS (
      SELECT te.lang,
             ln((COALESCE(c2.c2, 0) + 0.5)
                / (COALESCE(c1.c1, 0) + 0.5 * v.v)) AS lp
      FROM te
      LEFT JOIN c2 ON c2.lang = te.lang AND c2.b = te.b
      LEFT JOIN c1 ON c1.lang = te.lang AND c1.w1 = string_split(te.b, ' ')[1]
      JOIN v ON v.lang = te.lang)
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(lp), 4) AS avg_logprob,
           ROUND(exp(-AVG(lp)), 2) AS perplexity
    FROM scored GROUP BY lang ORDER BY lang
    """,
)
def text_perplexity_heldout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out bigram perplexity per lang: add-0.5 LM trained on
    doc_id%5!=0, scored on the rest (operators.text.perplexity_heldout) —
    the corpus-predictability / domain-shift probe."""
    return X.perplexity_heldout(T(spark, sf_dir, "documents"))


@query(
    "dedup_lsh_est_hist",
    oracle=MH_EST_CTE
    + """
    SELECT CAST(FLOOR(est_jaccard * 10) AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(AVG(est_jaccard), 6) AS avg_est
    FROM est
    GROUP BY 1 ORDER BY 1
    """,
)
def dedup_lsh_est_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of estimated Jaccard over ALL LSH candidate pairs — the
    threshold-tuning S-curve diagnostic (how many pairs would each
    min_jaccard admit?), computed off the shared signature table
    (suite.pipeline.shared_doc_sigs) so the whole query costs one banded
    join over already-persisted signatures. est values are exact
    multiples of 1/64, so FLOOR and the 6-dp round are drift-free."""
    d = T(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(
        d,
        min_jaccard=0.0,
        sig=shared_doc_sigs(spark, sf_dir),
        banded=shared_doc_banded(spark, sf_dir),
    )
    return (
        pairs.groupBy(
            F.floor(F.col("est_jaccard") * 10).cast("int").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(F.avg("est_jaccard"), 6).alias("avg_est"),
        )
        .orderBy("bucket")
    )
