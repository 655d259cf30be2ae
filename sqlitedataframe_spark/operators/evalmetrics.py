"""Binary-classifier evaluation metrics as distributed aggregates.

The ops a training pipeline runs after any scoring model (quality filter,
language classifier, dedup ranker) before its threshold gates data: ROC
AUC, calibration (reliability bins, Brier, ECE), precision/recall/F1
threshold sweeps, cumulative-gains deciles. Everything reduces the fact
table to score-bucket counts map-side first, so the exchange is bounded by
the score domain (scores are pre-rounded to ``round_dp``), never the data.

Reference behavioral parity: these extend the reference's analytics
surface the same way the sketch/drift operators do — the reference's
engine exposes aggregate and window primitives (pass-through SQL
surface, see SURVEY.md Tier B); the eval metrics are pure compositions
of those primitives.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _bucket_counts(
    df: DataFrame, score_col: str, label_col: str, round_dp: int
) -> DataFrame:
    """Collapse to one row per distinct (rounded) score: positive and
    negative counts. Map-side partial aggregation makes the exchange
    ~|score domain| regardless of input size — the anchor of every
    metric below."""
    s = F.round(F.col(score_col), round_dp).alias("_s")
    y = F.col(label_col).cast("int")
    return df.select(s, y.alias("_y")).groupBy("_s").agg(
        F.sum("_y").cast("bigint").alias("_pos"),
        F.sum(1 - F.col("_y")).cast("bigint").alias("_neg"),
    )


def auc_roc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    round_dp: int = 6,
    coarse_buckets: int = 64,
) -> DataFrame:
    """Exact ROC AUC via the Mann-Whitney rank identity with midrank tie
    handling: ``AUC = sum_s pos(s) * (neg_below(s) + neg(s)/2) / (P*N)``
    over distinct score values ``s``.

    No global sort / unpartitioned window: the cumulative
    ``neg_below`` uses the repo's two-level distributed prefix sum
    (pareto_classes recipe) — scores partition into ``coarse_buckets``
    equal-width coarse buckets (scores assumed in [0, 1]; widen for
    other ranges), a PARTITIONED window ranks within each bucket, and a
    <= ``coarse_buckets``-row totals self-join supplies each bucket's
    global offset. At 100 TB only |score domain| rows cross the
    exchange.
    """
    g = _bucket_counts(df, score_col, label_col, round_dp)
    bkt = F.least(
        F.floor(F.col("_s") * coarse_buckets), F.lit(coarse_buckets - 1)
    ).cast("int")
    b = g.withColumn("_bkt", bkt)
    w = (
        Window.partitionBy("_bkt")
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = b.withColumn("_cum_neg", F.sum("_neg").over(w))
    btot = b.groupBy("_bkt").agg(F.sum("_neg").alias("_bn"))
    lo, hi = btot.alias("lo"), btot.alias("hi")
    offsets = (
        hi.join(F.broadcast(lo), F.col("lo._bkt") < F.col("hi._bkt"), "left")
        .groupBy(F.col("hi._bkt").alias("_bkt"))
        .agg(F.coalesce(F.sum("lo._bn"), F.lit(0)).alias("_off"))
    )
    below = local.join(F.broadcast(offsets), "_bkt").select(
        "_s",
        "_pos",
        "_neg",
        (F.col("_off") + F.col("_cum_neg") - F.col("_neg")).alias("_below"),
    )
    return below.agg(
        F.round(
            F.sum(
                F.col("_pos")
                * (F.col("_below") + F.col("_neg") / F.lit(2.0))
            )
            / (F.sum("_pos") * F.sum("_neg"))
            + 1e-9,
            6,
        ).alias("auc"),
        F.sum("_pos").cast("bigint").alias("n_pos"),
        F.sum("_neg").cast("bigint").alias("n_neg"),
        F.count(F.lit(1)).cast("bigint").alias("n_scores"),
    )


def calibration_bins(
    df: DataFrame, score_col: str, label_col: str, n_bins: int = 10
) -> DataFrame:
    """Reliability table over fixed-width score bins: per bin, the
    count, positive count, mean predicted score, observed positive rate,
    and |gap| — the plot behind every calibration curve, plus the per-bin
    inputs ECE weights. Fixed-width (not quantile) bins keep the
    assignment a pure scan-side expression: one partially-combined
    aggregate, <= ``n_bins`` rows cross the exchange."""
    s = F.col(score_col)
    y = F.col(label_col).cast("int")
    b = F.least(F.floor(s * n_bins), F.lit(n_bins - 1)).cast("int")
    return (
        df.select(b.alias("bin"), s.alias("_s"), y.alias("_y"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("_y").cast("bigint").alias("n_pos"),
            F.round(F.avg("_s") + 1e-9, 6).alias("avg_score"),
            F.round(F.avg("_y") + 1e-9, 6).alias("frac_pos"),
            F.round(F.abs(F.avg("_s") - F.avg("_y")) + 1e-9, 6).alias(
                "cal_gap"
            ),
        )
        .orderBy("bin")
    )


def brier_ece(
    df: DataFrame, score_col: str, label_col: str, n_bins: int = 10
) -> DataFrame:
    """One-row calibration summary: Brier score ``mean((s - y)^2)`` and
    expected calibration error ``sum_b (n_b / N) * |avg_s_b - frac_pos_b|``
    over fixed-width bins. The Brier sum and the bin moments ride the
    SAME single aggregate pass (group by bin, then a 1-row roll-up), so
    the fact table is scanned once."""
    s = F.col(score_col)
    y = F.col(label_col).cast("int")
    b = F.least(F.floor(s * n_bins), F.lit(n_bins - 1)).cast("int")
    per_bin = (
        df.select(
            b.alias("_b"),
            s.alias("_s"),
            y.alias("_y"),
            ((s - y) * (s - y)).alias("_sq"),
        )
        .groupBy("_b")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("_sq").alias("_brier_sum"),
            F.avg("_s").alias("_avg_s"),
            F.avg("_y").alias("_frac"),
        )
    )
    return per_bin.agg(
        F.round(F.sum("_brier_sum") / F.sum("_n") + 1e-9, 6).alias("brier"),
        F.round(
            F.sum(F.col("_n") * F.abs(F.col("_avg_s") - F.col("_frac")))
            / F.sum("_n")
            + 1e-9,
            6,
        ).alias("ece"),
        F.sum("_n").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
    )


def pr_threshold_sweep(
    df: DataFrame,
    score_col: str,
    label_col: str,
    thresholds: list[float],
    round_dp: int = 6,
) -> DataFrame:
    """Precision / recall / F1 at each decision threshold (predict
    positive when ``score >= t``): the operating-point table behind
    threshold selection for a data-quality gate.

    Plan shape: the fact table collapses to score-bucket counts once;
    the |scores| x |thresholds| expansion happens on that TINY frame via
    a broadcast range join, then one ``n_thresholds``-row aggregate.
    The input is scanned exactly once for the whole sweep."""
    g = _bucket_counts(df, score_col, label_col, round_dp)
    spark = df.sparkSession
    t = spark.createDataFrame(
        [(float(x),) for x in thresholds], "thr double"
    )
    tot = g.agg(
        F.sum("_pos").alias("_p"), F.sum("_neg").alias("_n")
    )
    j = g.join(F.broadcast(t), F.col("_s") >= F.col("thr"))
    per_t = (
        t.join(
            j.groupBy("thr").agg(
                F.sum("_pos").alias("_tp"), F.sum("_neg").alias("_fp")
            ),
            "thr",
            "left",
        )
        .join(F.broadcast(tot))
        .select(
            F.round("thr", 6).alias("thr"),
            F.coalesce("_tp", F.lit(0)).cast("bigint").alias("tp"),
            F.coalesce("_fp", F.lit(0)).cast("bigint").alias("fp"),
            (F.col("_p") - F.coalesce("_tp", F.lit(0)))
            .cast("bigint")
            .alias("fn"),
            (F.col("_n") - F.coalesce("_fp", F.lit(0)))
            .cast("bigint")
            .alias("tn"),
        )
    )
    prec = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.col("tp") / (F.col("tp") + F.col("fp")),
    ).otherwise(F.lit(None))
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.col("tp") / (F.col("tp") + F.col("fn")),
    ).otherwise(F.lit(None))
    return per_t.select(
        "thr",
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(prec + 1e-9, 6).alias("precision"),
        F.round(rec + 1e-9, 6).alias("recall"),
        F.round(
            F.when(
                prec + rec > 0, 2 * prec * rec / (prec + rec)
            ).otherwise(F.lit(0.0))
            + 1e-9,
            6,
        ).alias("f1"),
    ).orderBy("thr")


def gains_deciles(
    df: DataFrame, score_col: str, label_col: str, n_buckets: int = 10
) -> DataFrame:
    """Cumulative-gains / lift table: rows bucket into score deciles by
    EXACT quantile boundaries (1 = highest scores), and each decile
    reports the cumulative positive capture rate and lift over random
    targeting — "contact the top 20% and reach 43% of responders".

    No ntile window: boundaries come from one exact ``percentile``
    aggregate broadcast back (curriculum_buckets recipe), the decile is
    a scan-side comparison sum, and the cumulative is a triangular
    self-join over the <= ``n_buckets``-row aggregate (never a global
    window)."""
    ps = [(i + 1) / n_buckets for i in range(n_buckets - 1)]
    bounds = df.agg(
        F.expr(
            f"percentile({score_col}, array("
            + ", ".join(str(p) for p in ps)
            + "))"
        ).alias("_qs")
    )
    # rank 1 = top decile: count boundaries at-or-above the score
    rank = F.lit(1)
    for i in range(n_buckets - 1):
        rank = rank + (
            F.col(score_col) <= F.element_at("_qs", n_buckets - 1 - i)
        ).cast("int")
    y = F.col(label_col).cast("int")
    per = (
        df.join(F.broadcast(bounds))
        .select(rank.alias("decile"), y.alias("_y"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("_y").cast("bigint").alias("n_pos"),
        )
    )
    a, b = per.alias("a"), per.alias("b")
    cum = (
        a.join(F.broadcast(b), F.col("b.decile") <= F.col("a.decile"))
        .groupBy(F.col("a.decile").alias("decile"))
        .agg(
            F.max("a.n").alias("n"),
            F.max("a.n_pos").alias("n_pos"),
            F.sum("b.n").alias("_cum_n"),
            F.sum("b.n_pos").alias("_cum_pos"),
        )
    )
    tot = per.agg(
        F.sum("n").alias("_tn"), F.sum("n_pos").alias("_tp")
    )
    return (
        cum.join(F.broadcast(tot))
        .select(
            "decile",
            "n",
            "n_pos",
            F.round(F.col("_cum_pos") / F.col("_tp") + 1e-9, 6).alias(
                "capture"
            ),
            F.round(
                (F.col("_cum_pos") / F.col("_tp"))
                / (F.col("_cum_n") / F.col("_tn"))
                + 1e-9,
                6,
            ).alias("lift"),
        )
        .orderBy("decile")
    )


def auc_roc_by_group(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_col: str,
    round_dp: int = 6,
    coarse_buckets: int = 64,
) -> DataFrame:
    """Per-slice ROC AUC — the fairness / slice-analysis form of
    ``auc_roc``: one AUC row per value of ``group_col`` (data source,
    language, fold id), flagging slices where the scorer quietly fails
    even though the pooled AUC looks healthy.

    Same two-level distributed prefix sum as ``auc_roc``, with every
    stage keyed by the group: score-bucket counts group by
    ``(group, score)``, the ranking window partitions by
    ``(group, coarse_bucket)``, and the offset self-join equi-joins on
    the group before the bucket inequality — all shuffles hash on the
    group key, so slices evaluate fully in parallel."""
    s = F.round(F.col(score_col), round_dp).alias("_s")
    y = F.col(label_col).cast("int")
    g = (
        df.select(F.col(group_col).alias("_g"), s, y.alias("_y"))
        .groupBy("_g", "_s")
        .agg(
            F.sum("_y").cast("bigint").alias("_pos"),
            F.sum(1 - F.col("_y")).cast("bigint").alias("_neg"),
        )
    )
    bkt = F.least(
        F.floor(F.col("_s") * coarse_buckets), F.lit(coarse_buckets - 1)
    ).cast("int")
    b = g.withColumn("_bkt", bkt)
    w = (
        Window.partitionBy("_g", "_bkt")
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = b.withColumn("_cum_neg", F.sum("_neg").over(w))
    btot = b.groupBy("_g", "_bkt").agg(F.sum("_neg").alias("_bn"))
    lo = btot.select(
        F.col("_g").alias("_glo"),
        F.col("_bkt").alias("_blo"),
        F.col("_bn").alias("_bnlo"),
    )
    offsets = (
        btot.join(
            F.broadcast(lo),
            (F.col("_g") == F.col("_glo")) & (F.col("_blo") < F.col("_bkt")),
            "left",
        )
        .groupBy("_g", "_bkt")
        .agg(F.coalesce(F.sum("_bnlo"), F.lit(0)).alias("_off"))
    )
    below = local.join(F.broadcast(offsets), ["_g", "_bkt"]).select(
        "_g",
        "_pos",
        "_neg",
        (F.col("_off") + F.col("_cum_neg") - F.col("_neg")).alias("_below"),
    )
    return (
        below.groupBy(F.col("_g").alias(group_col))
        .agg(
            F.round(
                F.sum(
                    F.col("_pos")
                    * (F.col("_below") + F.col("_neg") / F.lit(2.0))
                )
                / (F.sum("_pos") * F.sum("_neg"))
                + 1e-9,
                6,
            ).alias("auc"),
            F.sum("_pos").cast("bigint").alias("n_pos"),
            F.sum("_neg").cast("bigint").alias("n_neg"),
        )
        .orderBy(group_col)
    )


def cohen_kappa(
    df: DataFrame, pred_col: str, truth_col: str
) -> DataFrame:
    """Multiclass Cohen's kappa between a predicted and a true label:
    chance-corrected agreement ``(po - pe) / (1 - pe)`` where ``po`` is
    raw accuracy and ``pe`` the agreement expected from the marginal
    label distributions — the honest summary of a classifier whose
    classes are imbalanced (raw accuracy flatters the majority class).

    Plan shape: ONE ``(pred, truth)`` confusion-cell aggregate collapses
    the data (map-side partials, |classes|^2 rows cross the exchange);
    ``po``/``pe`` are arithmetic over that tiny frame — the marginals
    come from two grouped sums over the cells, joined back broadcast."""
    cells = df.groupBy(
        F.col(pred_col).alias("_p"), F.col(truth_col).alias("_t")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    row_m = cells.groupBy("_p").agg(F.sum("_n").alias("_np"))
    col_m = cells.groupBy("_t").agg(F.sum("_n").alias("_nt"))
    pe = (
        row_m.join(
            F.broadcast(col_m), F.col("_p") == F.col("_t"), "inner"
        )
        .agg(F.sum(F.col("_np") * F.col("_nt")).alias("_pe_num"))
    )
    po = cells.agg(
        F.sum(F.when(F.col("_p") == F.col("_t"), F.col("_n")).otherwise(0))
        .alias("_agree"),
        F.sum("_n").alias("_total"),
        F.count(F.lit(1)).alias("_cells"),
    )
    return (
        po.join(F.broadcast(pe))
        .select(
            F.round(F.col("_agree") / F.col("_total") + 1e-9, 6).alias("po"),
            F.round(
                F.col("_pe_num") / (F.col("_total") * F.col("_total"))
                + 1e-9,
                6,
            ).alias("pe"),
            F.round(
                (
                    F.col("_agree") / F.col("_total")
                    - F.col("_pe_num") / (F.col("_total") * F.col("_total"))
                )
                / (
                    1
                    - F.col("_pe_num")
                    / (F.col("_total") * F.col("_total"))
                )
                + 1e-9,
                6,
            ).alias("kappa"),
            F.col("_total").cast("bigint").alias("n"),
            F.col("_cells").cast("bigint").alias("n_cells"),
        )
    )


def conformal_threshold(
    cal: DataFrame,
    test: DataFrame,
    nonconf_col: str,
    alpha: float = 0.1,
    round_dp: int = 6,
    coarse_buckets: int = 64,
) -> DataFrame:
    """Split conformal prediction: the calibration quantile ``q_hat`` =
    the ``ceil((n+1)(1-alpha))``-th smallest calibration nonconformity
    score (a finite-sample-corrected DISCRETE order statistic, never
    interpolated), plus the empirical coverage ``P(nonconf <= q_hat)``
    on the held-out test split — which is guaranteed ``>= 1 - alpha`` in
    expectation by exchangeability.

    Plan shape: calibration scores collapse to distinct-value counts;
    the order statistic comes from the same two-level prefix sum as
    ``auc_roc`` (scores assumed in [0, 1]); coverage is one broadcast
    of the 1-row ``q_hat`` onto a test-side aggregate."""
    s = F.round(F.col(nonconf_col), round_dp).alias("_s")
    g = cal.select(s).groupBy("_s").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n")
    )
    bkt = F.least(
        F.floor(F.col("_s") * coarse_buckets), F.lit(coarse_buckets - 1)
    ).cast("int")
    b = g.withColumn("_bkt", bkt)
    w = (
        Window.partitionBy("_bkt")
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = b.withColumn("_cum", F.sum("_n").over(w))
    btot = b.groupBy("_bkt").agg(F.sum("_n").alias("_bn"))
    lo, hi = btot.alias("lo"), btot.alias("hi")
    offsets = (
        hi.join(F.broadcast(lo), F.col("lo._bkt") < F.col("hi._bkt"), "left")
        .groupBy(F.col("hi._bkt").alias("_bkt"))
        .agg(F.coalesce(F.sum("lo._bn"), F.lit(0)).alias("_off"))
    )
    cum = local.join(F.broadcast(offsets), "_bkt").select(
        "_s", (F.col("_off") + F.col("_cum")).alias("_cw")
    )
    n_cal = cal.agg(F.count(F.lit(1)).alias("_nc"))
    # k-th order statistic, k = ceil((n+1)(1-alpha)); if k > n (tiny
    # calibration sets) the conformal set is the whole space -> q_hat
    # saturates to the max score
    q = (
        cum.join(F.broadcast(n_cal))
        .select(
            "_s",
            "_cw",
            F.least(
                F.ceil((F.col("_nc") + 1) * F.lit(1.0 - alpha)),
                F.col("_nc").cast("bigint"),
            ).alias("_k"),
            F.col("_nc"),
        )
        .filter(F.col("_cw") >= F.col("_k"))
        .agg(
            F.min("_s").alias("q_hat"),
            F.max("_nc").cast("bigint").alias("n_cal"),
        )
    )
    return test.join(F.broadcast(q)).agg(
        F.max("q_hat").alias("q_hat"),
        F.max("n_cal").alias("n_cal"),
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.round(
            F.avg(
                (F.col(nonconf_col) <= F.col("q_hat")).cast("double")
            )
            + 1e-9,
            6,
        ).alias("coverage"),
    )


def average_precision(
    df: DataFrame,
    score_col: str,
    label_col: str,
    round_dp: int = 6,
    coarse_buckets: int = 64,
) -> DataFrame:
    """Exact average precision (area under the precision-recall curve,
    tie-grouped): descending through distinct score values,
    ``AP = sum_s (pos(s) / P) * precision_at(s)`` with
    ``precision_at(s) = cumPos(>= s) / cumAll(>= s)`` — the metric that
    stays honest under heavy class imbalance where ROC AUC flatters
    (the PR baseline is the positive rate, not 0.5).

    Same two-level distributed prefix sum as ``auc_roc`` (scores in
    [0, 1]); the >= cumulatives come from the totals minus the
    strictly-below prefix, so no descending pass is needed."""
    g = _bucket_counts(df, score_col, label_col, round_dp)
    bkt = F.least(
        F.floor(F.col("_s") * coarse_buckets), F.lit(coarse_buckets - 1)
    ).cast("int")
    b = g.withColumn("_bkt", bkt).withColumn(
        "_all", F.col("_pos") + F.col("_neg")
    )
    w = (
        Window.partitionBy("_bkt")
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = b.withColumn("_cum_pos", F.sum("_pos").over(w)).withColumn(
        "_cum_all", F.sum("_all").over(w)
    )
    btot = b.groupBy("_bkt").agg(
        F.sum("_pos").alias("_bp"), F.sum("_all").alias("_ba")
    )
    lo = btot.select(
        F.col("_bkt").alias("_blo"),
        F.col("_bp").alias("_bplo"),
        F.col("_ba").alias("_balo"),
    )
    offsets = (
        btot.join(F.broadcast(lo), F.col("_blo") < F.col("_bkt"), "left")
        .groupBy("_bkt")
        .agg(
            F.coalesce(F.sum("_bplo"), F.lit(0)).alias("_offp"),
            F.coalesce(F.sum("_balo"), F.lit(0)).alias("_offa"),
        )
    )
    tot = g.agg(
        F.sum("_pos").alias("_P"),
        (F.sum("_pos") + F.sum("_neg")).alias("_T"),
    )
    terms = (
        local.join(F.broadcast(offsets), "_bkt")
        .join(F.broadcast(tot))
        .select(
            "_pos",
            "_P",
            # >= s cumulatives: total minus the STRICTLY-below prefix
            (F.col("_P") - (F.col("_offp") + F.col("_cum_pos") - F.col("_pos")))
            .alias("_ge_pos"),
            (F.col("_T") - (F.col("_offa") + F.col("_cum_all") - F.col("_all")))
            .alias("_ge_all"),
        )
    )
    return terms.agg(
        F.round(
            F.sum(
                F.col("_pos")
                * (F.col("_ge_pos") / F.col("_ge_all"))
            )
            / F.max("_P")
            + 1e-9,
            6,
        ).alias("average_precision"),
        F.max("_P").cast("bigint").alias("n_pos"),
        F.count(F.lit(1)).cast("bigint").alias("n_scores"),
    )


def regression_metrics(
    df: DataFrame,
    pred_col: str,
    actual_col: str,
    by: str | None = None,
    round_dp: int = 4,
) -> DataFrame:
    """Regression-model evaluation in ONE distributed aggregate: n, RMSE,
    MAE, R^2, MAPE (over nonzero actuals) and mean signed error (bias) —
    the complement to the binary-classifier family above for pipelines
    that score continuous targets (price predictors, length estimators,
    reward models).

    Scale shape: everything reduces to six map-side partial sums
    (sum y, sum y^2, sum e^2, sum |e|, sum |e/y|, sum e); R^2 uses the
    algebraic identity SST = sum(y^2) - (sum y)^2 / n so no second pass
    over the data for the mean. One exchange (or one per ``by`` group),
    never a join.
    """
    y = F.col(actual_col)
    e = F.col(pred_col) - y
    keys = [by] if by else []
    agg = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(y).alias("_sy"),
        F.sum(y * y).alias("_sy2"),
        F.sum(e * e).alias("_se2"),
        F.sum(F.abs(e)).alias("_sae"),
        F.sum(F.when(y != 0, F.abs(e / y))).alias("_sape"),
        F.count(F.when(y != 0, 1)).cast("bigint").alias("_nnz"),
        F.sum(e).alias("_se"),
    )
    sst = F.col("_sy2") - F.col("_sy") * F.col("_sy") / F.col("n")
    out = agg.select(
        *keys,
        "n",
        F.round(F.sqrt(F.col("_se2") / F.col("n")) + 1e-9, round_dp).alias(
            "rmse"
        ),
        F.round(F.col("_sae") / F.col("n") + 1e-9, round_dp).alias("mae"),
        F.round(F.lit(1.0) - F.col("_se2") / sst + 1e-9, 6).alias("r2"),
        F.round(
            F.lit(100.0) * F.col("_sape") / F.col("_nnz") + 1e-9, round_dp
        ).alias("mape_pct"),
        F.round(F.col("_se") / F.col("n") + 1e-9, round_dp).alias("bias"),
    )
    return out.orderBy(*keys) if keys else out


def macro_f1(
    df: DataFrame,
    pred_col: str = "pred",
    truth_col: str = "truth",
    round_dp: int = 6,
) -> DataFrame:
    """Multi-class precision/recall/F1 per class plus the macro averages —
    the imbalance-honest companion to accuracy/kappa (each class counts
    equally regardless of support). Classes are the union of truth and
    prediction values; a class never predicted shows precision NULL in
    its own row (display honesty: the metric is undefined there), but
    the MACRO averages fill 0 for those NULLs — sklearn's
    ``zero_division=0`` — so macro precision/recall and macro F1 all
    average over the SAME class set (an AVG that skipped NULLs would
    exclude a never-predicted class from macro precision while its
    F1=0 still dragged macro F1: internally inconsistent).

    Shape: one |classes|^2 confusion aggregate collapses the corpus
    map-side (the cohen_kappa pattern); per-class tp/fp/fn and the macro
    roll-up are arithmetic over that tiny frame. Output: one row per
    class ordered by class, then one 'MACRO' row.
    """
    cells = (
        df.select(F.col(pred_col).alias("_p"), F.col(truth_col).alias("_t"))
        .groupBy("_p", "_t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    )
    classes = (
        cells.select(F.col("_t").alias("cls"))
        .union(cells.select(F.col("_p").alias("cls")))
        .distinct()
    )
    tp = cells.filter(F.col("_p") == F.col("_t")).select(
        F.col("_t").alias("cls"), F.col("_n").alias("tp")
    )
    pred_n = cells.groupBy(F.col("_p").alias("cls")).agg(
        F.sum("_n").cast("bigint").alias("n_pred")
    )
    true_n = cells.groupBy(F.col("_t").alias("cls")).agg(
        F.sum("_n").cast("bigint").alias("n_true")
    )
    per = (
        classes.join(tp, "cls", "left")
        .join(pred_n, "cls", "left")
        .join(true_n, "cls", "left")
        .select(
            "cls",
            F.coalesce(F.col("tp"), F.lit(0)).cast("bigint").alias("tp"),
            F.coalesce(F.col("n_pred"), F.lit(0)).cast("bigint").alias("n_pred"),
            F.coalesce(F.col("n_true"), F.lit(0)).cast("bigint").alias("n_true"),
        )
        .select(
            "cls",
            "tp",
            "n_pred",
            "n_true",
            F.when(
                F.col("n_pred") > 0,
                F.round(F.col("tp") / F.col("n_pred") + 1e-9, round_dp),
            ).alias("precision"),
            F.when(
                F.col("n_true") > 0,
                F.round(F.col("tp") / F.col("n_true") + 1e-9, round_dp),
            ).alias("recall"),
            F.round(
                F.when(
                    F.col("n_pred") + F.col("n_true") > 0,
                    2.0 * F.col("tp") / (F.col("n_pred") + F.col("n_true")),
                ).otherwise(F.lit(0.0))
                + 1e-9,
                round_dp,
            ).alias("f1"),
        )
    )
    macro = per.agg(
        F.lit("MACRO").alias("cls"),
        F.sum("tp").cast("bigint").alias("tp"),
        F.sum("n_pred").cast("bigint").alias("n_pred"),
        F.sum("n_true").cast("bigint").alias("n_true"),
        F.round(
            F.avg(F.coalesce(F.col("precision"), F.lit(0.0))) + 1e-9, round_dp
        ).alias("precision"),
        F.round(
            F.avg(F.coalesce(F.col("recall"), F.lit(0.0))) + 1e-9, round_dp
        ).alias("recall"),
        F.round(F.avg("f1") + 1e-9, round_dp).alias("f1"),
    )
    return per.unionByName(macro).orderBy("cls")


def mcnemar_test(
    df: DataFrame,
    correct_a,
    correct_b,
    round_dp: int = 6,
) -> DataFrame:
    """McNemar's paired test for two classifiers scored on the SAME
    examples: only the discordant counts matter — n01 (A right, B wrong)
    vs n10 (A wrong, B right) — with the continuity-corrected statistic
    (|n01 - n10| - 1)^2 / (n01 + n10), chi-square with 1 df under H0
    "same error rate". The honest way to compare two filter models on
    one eval set (accuracy deltas ignore pairing).

    ``correct_a`` / ``correct_b`` are boolean Columns. One global 1-row
    aggregate: four exact integer cell counts, one closed-form float.
    """
    a = correct_a.cast("int")
    b = correct_b.cast("int")
    agg = df.agg(
        F.sum(a * b).cast("bigint").alias("n_both"),
        F.sum(a * (1 - b)).cast("bigint").alias("n01"),
        F.sum((1 - a) * b).cast("bigint").alias("n10"),
        F.sum((1 - a) * (1 - b)).cast("bigint").alias("n_neither"),
    )
    disc = F.col("n01") + F.col("n10")
    diff = F.abs(F.col("n01") - F.col("n10")).cast("double")
    stat = F.when(
        disc > 0,
        (diff - 1.0) * (diff - 1.0) / disc.cast("double"),
    )
    return agg.select(
        "n_both",
        "n01",
        "n10",
        "n_neither",
        F.round(stat + 1e-9, round_dp).alias("mcnemar_chi2"),
    )


def cuped_adjustment(
    df: DataFrame,
    variant_col: str,
    pre_col: str,
    post_col: str,
    scale: int = 100,
    round_dp: int = 6,
) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al., WSDM'13):
    adjust each variant's post-period mean with the pooled pre-period
    covariate, Y_cuped = Y - theta * (X - E[X]) with
    theta = cov(X, Y) / var(X) — the standard trick that shrinks A/B
    confidence intervals by the pre/post correlation^2 without touching
    the estimate's expectation (events_ab_ztest's variance-reduction
    upgrade).

    Closed form on MOMENTS, not rows: mean_cuped(v) =
    mean_y(v) - theta * (mean_x(v) - mean_x_all), so after one grouped
    moment aggregate (per variant) and one 1-row pooled-moment broadcast,
    no per-row adjusted value is ever materialized. Exactness: pre/post
    quantize once to integers (round(x * scale)); all sums accumulate in
    DECIMAL(38,0); theta, the adjusted means, and the variance-reduction
    ratio (= corr^2) go double only in the final projection. Signed
    outputs carry the `+ 0.0` convention.
    """
    ix = F.round(F.col(pre_col).cast("double") * scale).cast("bigint")
    iy = F.round(F.col(post_col).cast("double") * scale).cast("bigint")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    per = df.groupBy(F.col(variant_col).alias("_v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dec(ix)).alias("_sx"),
        F.sum(dec(iy)).alias("_sy"),
    )
    pooled = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("_tn"),
        F.sum(dec(ix)).alias("_tsx"),
        F.sum(dec(iy)).alias("_tsy"),
        F.sum(dec(ix) * ix).alias("_txx"),
        F.sum(dec(iy) * iy).alias("_tyy"),
        F.sum(dec(ix) * iy).alias("_txy"),
    )
    j = per.join(F.broadcast(pooled))
    s = float(scale)
    tn = F.col("_tn").cast("double")
    tsx = F.col("_tsx").cast("double") / s
    tsy = F.col("_tsy").cast("double") / s
    txx = F.col("_txx").cast("double") / (s * s)
    tyy = F.col("_tyy").cast("double") / (s * s)
    txy = F.col("_txy").cast("double") / (s * s)
    cov = (txy - tsx * tsy / tn) / (tn - 1.0)
    varx = (txx - tsx * tsx / tn) / (tn - 1.0)
    vary = (tyy - tsy * tsy / tn) / (tn - 1.0)
    theta = cov / varx
    nn = F.col("n").cast("double")
    mean_y = F.col("_sy").cast("double") / s / nn
    mean_x = F.col("_sx").cast("double") / s / nn
    mean_x_all = tsx / tn
    mean_cuped = mean_y - theta * (mean_x - mean_x_all)
    corr2 = (cov * cov) / (varx * vary)
    return j.select(
        F.col("_v").alias(variant_col),
        "n",
        (F.round(mean_y + 1e-9, round_dp) + 0.0).alias("mean_post"),
        (F.round(mean_cuped + 1e-9, round_dp) + 0.0).alias("mean_cuped"),
        (F.round(theta + 1e-9, round_dp) + 0.0).alias("theta"),
        F.round(corr2 + 1e-9, round_dp).alias("var_reduction"),
    ).orderBy(variant_col)


def cuped_stratified(
    df: DataFrame,
    strata_col: str,
    variant_col: str,
    pre_col: str,
    post_col: str,
    scale: int = 100,
    round_dp: int = 6,
) -> DataFrame:
    """Group-aware CUPED (VERDICT r9 #2e): one theta PER STRATUM instead
    of one global theta. When the pre/post relationship differs across
    strata (new vs tenured users, mobile vs desktop), a pooled theta
    under-corrects the strata where the covariate is most informative;
    stratum-local theta_s = cov_s(X,Y)/var_s(X) recovers the full
    variance reduction inside each stratum (post-stratified CUPED, the
    standard composition of Deng et al.'s CUPED with blocking).

    Shape is :func:`cuped_adjustment` keyed one level deeper: one
    (stratum, variant) moment aggregate plus one per-stratum pooled
    moment aggregate, joined on the stratum key (broadcastable — the
    pooled frame is |strata| rows of model state). Exactness: identical
    integer-quantization + DECIMAL(38,0) convention; doubles appear
    only in the final projection, signed outputs carry `+ 0.0`.
    """
    ix = F.round(F.col(pre_col).cast("double") * scale).cast("bigint")
    iy = F.round(F.col(post_col).cast("double") * scale).cast("bigint")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    per = df.groupBy(
        F.col(strata_col).alias("_g"), F.col(variant_col).alias("_v")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dec(ix)).alias("_sx"),
        F.sum(dec(iy)).alias("_sy"),
    )
    pooled = df.groupBy(F.col(strata_col).alias("_g")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_tn"),
        F.sum(dec(ix)).alias("_tsx"),
        F.sum(dec(iy)).alias("_tsy"),
        F.sum(dec(ix) * ix).alias("_txx"),
        F.sum(dec(iy) * iy).alias("_tyy"),
        F.sum(dec(ix) * iy).alias("_txy"),
    )
    j = per.join(F.broadcast(pooled), "_g")
    s = float(scale)
    tn = F.col("_tn").cast("double")
    tsx = F.col("_tsx").cast("double") / s
    tsy = F.col("_tsy").cast("double") / s
    txx = F.col("_txx").cast("double") / (s * s)
    tyy = F.col("_tyy").cast("double") / (s * s)
    txy = F.col("_txy").cast("double") / (s * s)
    cov = (txy - tsx * tsy / tn) / (tn - 1.0)
    varx = (txx - tsx * tsx / tn) / (tn - 1.0)
    vary = (tyy - tsy * tsy / tn) / (tn - 1.0)
    theta = cov / varx
    nn = F.col("n").cast("double")
    mean_y = F.col("_sy").cast("double") / s / nn
    mean_x = F.col("_sx").cast("double") / s / nn
    mean_x_all = tsx / tn
    mean_cuped = mean_y - theta * (mean_x - mean_x_all)
    corr2 = (cov * cov) / (varx * vary)
    return j.select(
        F.col("_g").alias(strata_col),
        F.col("_v").alias(variant_col),
        "n",
        (F.round(mean_y + 1e-9, round_dp) + 0.0).alias("mean_post"),
        (F.round(mean_cuped + 1e-9, round_dp) + 0.0).alias("mean_cuped"),
        (F.round(theta + 1e-9, round_dp) + 0.0).alias("theta"),
        F.round(corr2 + 1e-9, round_dp).alias("var_reduction"),
    ).orderBy(strata_col, variant_col)


def delong_auc_ci(
    df: DataFrame,
    score_col: str,
    label_col: str,
    scale: int = 1_000_000,
    z: float = 1.959963985,
    round_dp: int = 6,
) -> DataFrame:
    """DeLong (1988) variance and confidence interval for the ROC AUC —
    the readout that upgrades "AUC = 0.84" to "0.84 ± 0.02", i.e. the
    decision-grade answer to "is model A actually better than B on this
    corpus slice". Nonparametric: Var(AUC) = S10/m + S01/n from the
    per-positive placements V10 (fraction of negatives below, ties half)
    and the per-negative placements V01.

    Exactness — the placements-from-buckets trick: the data collapses
    once to score-bucket (pos, neg) counts; every positive at score s
    shares the placement (neg_below(s) + neg_at(s)/2) / n, so the
    placement FIRST and SECOND moments are exact integer sums over the
    bucket frame when placements are kept as DOUBLED integer numerators
    (u10 = 2*neg_below + neg_at over 2n). S10, S01, the AUC and the CI
    go double only in the final projection from DECIMAL(38,0) sums —
    engine- and layout-independent to the last bit.

    Scale shape: one map-side-combined bucket aggregate (grid-bounded),
    cumulative counts via the two-level distributed prefix sum (never a
    global window), one 1-row final projection. CI bounds are NOT
    clamped to [0, 1] (DeLong intervals can overshoot; clamping hides
    that the normal approximation is straining).
    """
    from sqlitedataframe_spark.operators.profiling import _prefix_sum_on_spine

    iscore = F.round(F.col(score_col).cast("double") * scale).cast("bigint")
    y = F.col(label_col).cast("int")
    g = df.groupBy(iscore.alias("_s")).agg(
        F.sum(y).cast("bigint").alias("_pos"),
        F.sum(1 - y).cast("bigint").alias("_neg"),
    )
    # coarse-bucket width sized to the integer-score RANGE (~scale), so the
    # offsets frame stays ~64 rows regardless of the quantization grid
    bw = max(64, scale // 64)
    cum = _prefix_sum_on_spine(g, "_s", "_neg", "_cneg", bucket_width=bw)
    cum = _prefix_sum_on_spine(cum, "_s", "_pos", "_cpos", bucket_width=bw)
    # three consumers read cum (the V10 moments, the V01 moments, and the
    # totals join) — cache it so the bucket aggregate and both two-level
    # prefix sums run once, not three times; released by the harness via
    # util.release_caches after the query is consumed
    from sqlitedataframe_spark.operators.util import eager_cache

    cum = eager_cache(cum)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    one = cum.groupBy().agg(
        F.sum("_pos").cast("bigint").alias("_m"),
        F.sum("_neg").cast("bigint").alias("_n"),
        # u10 = 2*neg_below + neg_at, neg_below = cumulative-inclusive - at
        F.sum(
            dec(F.col("_pos")) * (2 * (F.col("_cneg") - F.col("_neg")) + F.col("_neg"))
        ).alias("_su10"),
        F.sum(
            dec(F.col("_pos"))
            * dec(2 * (F.col("_cneg") - F.col("_neg")) + F.col("_neg"))
            * (2 * (F.col("_cneg") - F.col("_neg")) + F.col("_neg"))
        ).alias("_sq10"),
    )
    # positives ABOVE a negative's score need the pos total; join the
    # 1-row moments back onto the bucket frame for the V01 pass
    tot = one.select("_m", "_n")
    cum2 = cum.join(F.broadcast(tot))
    u01 = 2 * (F.col("_m") - F.col("_cpos")) + F.col("_pos")
    two = cum2.groupBy().agg(
        F.sum(dec(F.col("_neg")) * u01).alias("_su01"),
        F.sum(dec(F.col("_neg")) * dec(u01) * u01).alias("_sq01"),
    )
    j = one.join(F.broadcast(two))
    m = F.col("_m").cast("double")
    n = F.col("_n").cast("double")
    su10 = F.col("_su10").cast("double")
    sq10 = F.col("_sq10").cast("double")
    su01 = F.col("_su01").cast("double")
    sq01 = F.col("_sq01").cast("double")
    auc = su10 / (2.0 * n) / m
    s10 = (sq10 - su10 * su10 / m) / (m - 1.0) / (2.0 * n) / (2.0 * n)
    s01 = (sq01 - su01 * su01 / n) / (n - 1.0) / (2.0 * m) / (2.0 * m)
    se = F.sqrt(s10 / m + s01 / n)
    return j.select(
        F.col("_m").alias("n_pos"),
        F.col("_n").alias("n_neg"),
        F.round(auc + 1e-9, round_dp).alias("auc"),
        F.round(se + 1e-9, round_dp).alias("se"),
        (F.round(auc - z * se + 1e-9, round_dp) + 0.0).alias("ci_lo"),
        F.round(auc + z * se + 1e-9, round_dp).alias("ci_hi"),
    )


def bradley_terry_strengths(
    wins: DataFrame,
    item_col: str = "i",
    opp_col: str = "j",
    wins_col: str = "w",
    iters: int = 3,
    round_dp: int = 6,
    max_items: int = 10_000,
) -> DataFrame:
    """Bradley-Terry preference strengths via ``iters`` fixed
    minorization-maximization rounds (Hunter 2004): p_i <-
    W_i / sum_j n_ij / (p_i + p_j), renormalized to sum 1 each round —
    the model every pairwise-preference data pipeline fits before
    building reward-model / DPO training sets ("which answer style
    actually wins head-to-heads, with strength-of-schedule accounted",
    where raw win RATE is confounded by who you happened to face).

    ``wins`` holds one row per ORDERED pair: ``w`` = wins of ``i`` over
    ``j`` (absent pairs count 0).

    Scale shape — the train_centroids / bpe_merge_rounds MODEL-STATE
    pattern: the raw comparison stream collapses DISTRIBUTEDLY to the
    |items|^2 win grid (one grouped integer aggregate + its transpose
    join), the grid crosses the driver ONCE (guarded by ``max_items`` —
    strengths over more than ~10k rated items is a different problem),
    and the MM rounds run on that bounded state. Exactness: win counts
    are exact integers; every float reduction is a FIXED-ORDER left
    fold (opponents sorted by id, items sorted by id, 0.0 seed), the
    exact sequence the oracle's ``list_reduce(list(x ORDER BY k))``
    performs — python floats ARE IEEE doubles, so all rounds are
    bit-identical to the SQL twin with no intermediate rounding. Only
    the published strength rounds.
    """
    pairs = (
        wins.select(
            F.col(item_col).alias("_i"),
            F.col(opp_col).alias("_j"),
            F.col(wins_col).cast("bigint").alias("_w"),
        )
        .groupBy("_i", "_j")
        .agg(F.sum("_w").alias("_w"))
    )
    rev = pairs.select(
        F.col("_j").alias("_i"), F.col("_i").alias("_j"), F.col("_w").alias("_rw")
    )
    grid_rows = (
        pairs.join(rev, ["_i", "_j"], "full")
        .select(
            "_i",
            "_j",
            F.coalesce(F.col("_w"), F.lit(0)).alias("_w"),
            (
                F.coalesce(F.col("_w"), F.lit(0))
                + F.coalesce(F.col("_rw"), F.lit(0))
            ).alias("_n"),
        )
        .collect()
    )
    items = sorted({r["_i"] for r in grid_rows})
    if len(items) > max_items:
        raise ValueError(
            f"bradley_terry_strengths: {len(items)} items exceeds "
            f"max_items={max_items}; the dense grid is no longer model state"
        )
    n_of: dict = {}
    w_tot: dict = {it: 0 for it in items}
    n_tot: dict = {it: 0 for it in items}
    opps: dict = {it: [] for it in items}
    for r in grid_rows:
        n_of[(r["_i"], r["_j"])] = int(r["_n"])
        w_tot[r["_i"]] += int(r["_w"])
        n_tot[r["_i"]] += int(r["_n"])
        opps[r["_i"]].append(r["_j"])
    for it in items:
        opps[it].sort()
    p = {it: 1.0 for it in items}
    for _ in range(iters):
        raw = {}
        for it in items:
            d = 0.0
            for j in opps[it]:  # fixed order: opponents ascending
                d = d + float(n_of[(it, j)]) / (p[it] + p[j])
            # d == 0 iff every grid row for `it` has n == 0 (all-zero win
            # counts, e.g. an item seen only in 0-0 ledger rows): defined
            # fallback = keep the current strength (ADVICE r10)
            raw[it] = float(w_tot[it]) / d if d > 0.0 else p[it]
        z = 0.0
        for it in items:  # fixed order: items ascending
            z = z + raw[it]
        p = {it: raw[it] / z for it in items}
    spark = wins.sparkSession
    # item column type is DERIVED from the input frame (ADVICE r10: the
    # old hardcoded "string" failed createDataFrame for integer item ids)
    item_dt = wins.schema[item_col].dataType.simpleString()
    out = spark.createDataFrame(
        [
            (it, w_tot[it], n_tot[it], round(p[it] + 1e-9, round_dp))
            for it in items
        ],
        f"{item_col} {item_dt}, wins bigint, n_comparisons bigint, strength double",
    )
    return out.orderBy(F.col("strength").desc(), F.col(item_col).asc())
