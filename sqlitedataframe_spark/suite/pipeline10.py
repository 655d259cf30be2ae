"""Round-5 wave: binary-classifier evaluation metrics (ROC AUC,
calibration bins, Brier/ECE, precision-recall threshold sweep,
cumulative-gains deciles, KS score separation).

The "model": the deterministic text quality score (operators.text.
quality_score) used as a classifier for ``lang = 'en'`` — a synthetic but
fully deterministic score/label pair, so every metric has an exact DuckDB
oracle. The machinery (operators.evalmetrics) is what ships: plug in any
score column + label column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlitedataframe_spark.operators import evalmetrics as E
from sqlitedataframe_spark.operators import text as X
from sqlitedataframe_spark.suite import query
from sqlitedataframe_spark.suite.relational import T

#: Shared oracle CTE: the text_quality SQL twin + the binary label.
_SCORED_CTE = """
    t AS (
      SELECT doc_id, text, lang,
             string_split(lower(trim(text)), ' ') AS toks,
             CAST(LENGTH(text) AS DOUBLE) AS n_char
      FROM documents),
    feats AS (
      SELECT doc_id, lang,
             LEAST(n_char / 200.0, 1.0) AS len_score,
             CAST(len(list_filter(toks, x -> list_contains(
                 ['the','a','an','and','or','of','to','in','is','it'], x)))
               AS DOUBLE) / len(toks) AS sw_ratio,
             CAST(LENGTH(regexp_replace(text, '[^.,;:!?''"()\\[\\]{}-]',
                 '', 'g')) AS DOUBLE) / n_char AS punct_ratio
      FROM t),
    scored AS (
      SELECT ROUND((len_score + LEAST(sw_ratio * 4, 1.0)
                    + GREATEST(0.0, 1.0 - punct_ratio * 5)) / 3, 6) AS s,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM feats)
"""


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return d.select(
        X.quality_score("text").alias("s"),
        (F.col("lang") == "en").cast("int").alias("y"),
    )


@query(
    "eval_auc_quality_lang",
    oracle=f"""
    WITH {_SCORED_CTE},
    g AS (SELECT s, SUM(y) AS pos, SUM(1 - y) AS neg FROM scored GROUP BY s),
    c AS (SELECT s, pos, neg,
                 SUM(neg) OVER (ORDER BY s) - neg AS below
          FROM g)
    SELECT ROUND(SUM(pos * (below + neg / 2.0))
                 / (SUM(pos) * SUM(neg)) + 1e-9, 6) AS auc,
           CAST(SUM(pos) AS BIGINT) AS n_pos,
           CAST(SUM(neg) AS BIGINT) AS n_neg,
           CAST(COUNT(*) AS BIGINT) AS n_scores
    FROM c
    """,
)
def eval_auc_quality_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC of the quality score as an English-language
    classifier — the Mann-Whitney rank identity with midrank ties.

    operators.evalmetrics.auc_roc: the fact table collapses to
    score-bucket counts map-side; the cumulative negative count uses the
    two-level distributed prefix sum (64 coarse buckets, partitioned
    windows, <= 64-row offset self-join) — never a global sort or
    unpartitioned window.
    """
    return E.auc_roc(_scored(spark, sf_dir), "s", "y")


@query(
    "eval_calibration_bins",
    oracle=f"""
    WITH {_SCORED_CTE}
    SELECT CAST(LEAST(FLOOR(s * 10), 9) AS INT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(y) AS BIGINT) AS n_pos,
           ROUND(AVG(s) + 1e-9, 6) AS avg_score,
           ROUND(AVG(y) + 1e-9, 6) AS frac_pos,
           ROUND(ABS(AVG(s) - AVG(y)) + 1e-9, 6) AS cal_gap
    FROM scored GROUP BY 1 ORDER BY 1
    """,
)
def eval_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table: decile-wide fixed score bins, mean predicted
    score vs observed positive rate — the calibration-curve data frame.

    operators.evalmetrics.calibration_bins: bin assignment is a pure
    scan-side expression; one partially-combined aggregate, <= 10 rows
    cross the exchange regardless of corpus size.
    """
    return E.calibration_bins(_scored(spark, sf_dir), "s", "y")


@query(
    "eval_brier_ece",
    oracle=f"""
    WITH {_SCORED_CTE},
    pb AS (
      SELECT LEAST(FLOOR(s * 10), 9) AS b, COUNT(*) AS n,
             SUM((s - y) * (s - y)) AS brier_sum,
             AVG(s) AS avg_s, AVG(y) AS frac
      FROM scored GROUP BY 1)
    SELECT ROUND(SUM(brier_sum) / SUM(n) + 1e-9, 6) AS brier,
           ROUND(SUM(n * ABS(avg_s - frac)) / SUM(n) + 1e-9, 6) AS ece,
           CAST(SUM(n) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_bins
    FROM pb
    """,
)
def eval_brier_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row probabilistic-accuracy summary: Brier score and expected
    calibration error over ten fixed-width bins.

    operators.evalmetrics.brier_ece: Brier partial sums and bin moments
    share ONE aggregate pass; the roll-up runs over <= 10 rows.
    """
    return E.brier_ece(_scored(spark, sf_dir), "s", "y")


@query(
    "eval_pr_sweep",
    oracle=f"""
    WITH {_SCORED_CTE},
    g AS (SELECT s, SUM(y) AS pos, SUM(1 - y) AS neg FROM scored GROUP BY s),
    tot AS (SELECT SUM(pos) AS p, SUM(neg) AS n FROM g),
    thr AS (SELECT i / 10.0 AS thr FROM generate_series(1, 9) AS t(i)),
    per AS (
      SELECT thr,
             COALESCE(SUM(CASE WHEN s >= thr THEN pos END), 0) AS tp,
             COALESCE(SUM(CASE WHEN s >= thr THEN neg END), 0) AS fp
      FROM thr LEFT JOIN g ON s >= thr GROUP BY thr),
    m AS (
      SELECT ROUND(thr, 6) AS thr,
             CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
             CAST(p - tp AS BIGINT) AS fn, CAST(n - fp AS BIGINT) AS tn,
             CASE WHEN tp + fp > 0 THEN tp * 1.0 / (tp + fp) END AS prec,
             CASE WHEN p > 0 THEN tp * 1.0 / p END AS rec
      FROM per, tot)
    SELECT thr, tp, fp, fn, tn,
           ROUND(prec + 1e-9, 6) AS precision,
           ROUND(rec + 1e-9, 6) AS recall,
           ROUND(CASE WHEN prec + rec > 0
                      THEN 2 * prec * rec / (prec + rec)
                      ELSE 0.0 END + 1e-9, 6) AS f1
    FROM m ORDER BY thr
    """,
)
def eval_pr_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision / recall / F1 at thresholds 0.1 .. 0.9 — the
    operating-point table for choosing the quality-gate cutoff.

    operators.evalmetrics.pr_threshold_sweep: ONE scan collapses the
    corpus to score-bucket counts; the score x threshold expansion is a
    broadcast range join over that tiny frame.
    """
    return E.pr_threshold_sweep(
        _scored(spark, sf_dir), "s", "y", [i / 10.0 for i in range(1, 10)]
    )


@query(
    "eval_gains_deciles",
    oracle=f"""
    WITH {_SCORED_CTE},
    qs AS (
      SELECT quantile_cont(s, [0.1, 0.2, 0.3, 0.4, 0.5,
                               0.6, 0.7, 0.8, 0.9]) AS q
      FROM scored),
    ranked AS (
      SELECT 1 + (s <= q[1])::INT + (s <= q[2])::INT + (s <= q[3])::INT
               + (s <= q[4])::INT + (s <= q[5])::INT + (s <= q[6])::INT
               + (s <= q[7])::INT + (s <= q[8])::INT + (s <= q[9])::INT
               AS decile, y
      FROM scored, qs),
    per AS (
      SELECT decile, COUNT(*) AS n, SUM(y) AS n_pos
      FROM ranked GROUP BY 1),
    cum AS (
      SELECT decile, n, n_pos,
             SUM(n) OVER (ORDER BY decile) AS cn,
             SUM(n_pos) OVER (ORDER BY decile) AS cp,
             SUM(n) OVER () AS tn, SUM(n_pos) OVER () AS tp
      FROM per)
    SELECT CAST(decile AS INT) AS decile,
           CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
           ROUND(cp * 1.0 / tp + 1e-9, 6) AS capture,
           ROUND((cp * 1.0 / tp) / (cn * 1.0 / tn) + 1e-9, 6) AS lift
    FROM cum ORDER BY decile
    """,
)
def eval_gains_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-gains / lift table by score decile (decile 1 = highest
    scores): "keep the top-k deciles, capture X% of English docs at Y x
    random" — the targeting readout for tiered curation.

    operators.evalmetrics.gains_deciles: exact percentile boundaries
    broadcast back (no ntile window), scan-side comparison-sum decile,
    cumulative via a <= 10-row triangular self-join.
    """
    return E.gains_deciles(_scored(spark, sf_dir), "s", "y")


@query(
    "eval_ks_separation",
    oracle=f"""
    WITH {_SCORED_CTE},
    ca AS (SELECT 'a' AS g, CAST(floor(s / 0.05) AS BIGINT) AS b,
                  COUNT(*) AS n
           FROM scored WHERE y = 1 GROUP BY 2),
    cb AS (SELECT 'b' AS g, CAST(floor(s / 0.05) AS BIGINT) AS b,
                  COUNT(*) AS n
           FROM scored WHERE y = 0 GROUP BY 2),
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
def eval_ks_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS statistic between the score distributions of the
    positive (English) and negative classes — the single-number score
    separability readout (KS ~ 2 * best-balanced-accuracy - 1).

    Pure reuse of operators.profiling.ks_drift with the label as the
    snapshot tag: each class collapses to <= |bins| counts map-side, the
    ECDF window runs partitioned by class over the tiny dense spine.
    """
    from sqlitedataframe_spark.operators.profiling import ks_drift

    scored = _scored(spark, sf_dir)
    return ks_drift(
        scored.filter(F.col("y") == 1),
        scored.filter(F.col("y") == 0),
        "s",
        bin_width=0.05,
    )
