"""Feature-engineering operators for training-data preparation:
equal-frequency binning and leakage-free categorical target encoding.

Both are exact, oracle-checkable counterparts of the approximate forms
you would run at extreme scale (approx percentiles / sampled priors);
reference parity: the reference exposes no feature-engineering surface
(its query layer is SQL pass-through, SQLiteDataFrame.swift:295-304) —
these extend the Tier-D training-pipeline tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantile_bins(
    df: DataFrame,
    value_col: str,
    n_bins: int = 10,
    round_dp: int = 2,
) -> DataFrame:
    """Equal-frequency (quantile) discretization of a numeric column:
    compute the n_bins-1 interior exact percentile boundaries, assign
    each row ``bin = 1 + #(boundaries strictly below value)``, and
    report per-bin count/min/max/mean — the binning step behind WoE
    encoding, calibration buckets, and histogram features.

    Plan shape at 100 TB: boundaries are ONE global percentile
    aggregate (1 row) broadcast back onto the scan; bin assignment is a
    scan-side array fold (no per-row join, no global NTILE window —
    NTILE would be the audit-banned single-partition sort); the final
    rollup is an n_bins-group aggregate. Two scans total. Ties sit in
    the lower bin in both engines because the comparison is strict
    ``boundary < value``.
    """
    qs = [i / n_bins for i in range(1, n_bins)]
    bounds = df.agg(
        F.percentile(value_col, F.array(*[F.lit(q) for q in qs])).alias("_bs")
    )
    j = df.select(F.col(value_col).alias("_v")).join(F.broadcast(bounds))
    bin_idx = F.lit(1) + F.aggregate(
        "_bs",
        F.lit(0),
        lambda acc, b: acc + F.when(b < F.col("_v"), 1).otherwise(0),
    )
    return (
        j.groupBy(bin_idx.cast("int").alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.min("_v") + 1e-9, round_dp).alias("bin_min"),
            F.round(F.max("_v") + 1e-9, round_dp).alias("bin_max"),
            F.round(F.avg("_v") + 1e-9, round_dp).alias("bin_mean"),
        )
        .orderBy("bin")
    )


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    smoothing: float = 10.0,
    round_dp: int = 6,
) -> DataFrame:
    """Leakage-free (leave-one-out) target encoding of a categorical
    column against a binary/numeric target with additive smoothing
    toward the global prior:

        enc_i = (sum_target(cat) - target_i + m * prior) / (n(cat) - 1 + m)

    Excluding each row's own target from its encoding is what keeps the
    feature honest at training time (plain mean encoding leaks the
    label). Output is the per-category audit view: n, mean/min/max of
    the encoded value — the spread shows how much the LOO correction
    moves individual rows.

    Plan shape at 100 TB: one category-sized aggregate (sum, count) and
    a 1-row global prior, both broadcast back; the per-row encoding is
    then scan-side arithmetic and the audit rollup is a category-sized
    aggregate. No shuffle carries the fact table more than once.
    """
    prior = df.agg(F.avg(target_col).alias("_prior"))
    cat = df.groupBy(cat_col).agg(
        F.sum(target_col).alias("_s"), F.count(F.lit(1)).alias("_n")
    )
    j = df.join(F.broadcast(cat), cat_col).join(F.broadcast(prior))
    enc = (
        F.col("_s") - F.col(target_col) + F.lit(smoothing) * F.col("_prior")
    ) / (F.col("_n") - 1 + F.lit(smoothing))
    return (
        j.groupBy(cat_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.avg(enc) + 1e-9, round_dp).alias("enc_mean"),
            F.round(F.min(enc) + 1e-9, round_dp).alias("enc_min"),
            F.round(F.max(enc) + 1e-9, round_dp).alias("enc_max"),
        )
        .orderBy(cat_col)
    )


def woe_iv(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Weight-of-evidence encoding + information value per quantile bin
    of a numeric feature against a binary label — the credit-scoring
    standard for "how predictive is this feature, and where":
    ``woe_b = ln((pos_b / P) / (neg_b / N))`` with Laplace 0.5
    smoothing (so empty cells never hit ln(0)), and
    ``iv_term_b = (pos_share_b - neg_share_b) * woe_b``; total IV is
    the sum over bins (rule of thumb: < 0.02 useless, > 0.3 strong).

    Plan shape: boundaries are one exact ``percentile`` aggregate
    broadcast back (quantile_bins recipe, no NTILE); bin assignment is
    a scan-side array fold; per-bin pos/neg is a <= ``n_bins``-group
    partially-combined aggregate; shares/WOE are arithmetic over that
    tiny frame against a 1-row broadcast total.
    """
    qs = [i / n_bins for i in range(1, n_bins)]
    bounds = df.agg(
        F.percentile(score_col, F.array(*[F.lit(q) for q in qs])).alias(
            "_bs"
        )
    )
    y = F.col(label_col).cast("int")
    j = df.select(F.col(score_col).alias("_v"), y.alias("_y")).join(
        F.broadcast(bounds)
    )
    bin_idx = F.lit(1) + F.aggregate(
        "_bs",
        F.lit(0),
        lambda acc, b: acc + F.when(b < F.col("_v"), 1).otherwise(0),
    )
    per = (
        j.groupBy(bin_idx.cast("int").alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("_y").cast("bigint").alias("n_pos"),
            F.sum(1 - F.col("_y")).cast("bigint").alias("n_neg"),
        )
    )
    tot = per.agg(
        F.sum("n_pos").alias("_p"),
        F.sum("n_neg").alias("_n"),
        F.count(F.lit(1)).alias("_b"),
    )
    ps = (F.col("n_pos") + 0.5) / (F.col("_p") + 0.5 * F.col("_b"))
    ns = (F.col("n_neg") + 0.5) / (F.col("_n") + 0.5 * F.col("_b"))
    woe = F.log(ps / ns)
    return (
        per.join(F.broadcast(tot))
        .select(
            "bin",
            "n",
            "n_pos",
            "n_neg",
            # + 0.0: signed-zero convention (WOE/IV straddle zero near
            # uninformative bins; DuckDB ROUND -> -0.0 vs Spark +0.0)
            (F.round(woe + 1e-9, 6) + 0.0).alias("woe"),
            (F.round((ps - ns) * woe + 1e-9, 6) + 0.0).alias("iv_term"),
        )
        .orderBy("bin")
    )


def quantile_normalize_map(
    df: DataFrame,
    group_col: str,
    value_col: str,
    grid: list[float] | None = None,
    round_dp: int = 4,
) -> DataFrame:
    """Quantile-normalization mapping table: for each group (data
    source, batch, lab run) the exact per-group quantiles at a fixed
    probability grid, next to the cross-group mean profile — the
    artifact a pipeline broadcasts to map every group's value
    distribution onto the shared reference (the microarray-classic
    quantile normalization, applied to feature columns), plus the gap
    that says WHICH group deviates.

    Plan shape at 100 TB: ONE per-group exact ``percentile`` aggregate
    collapses the fact table to |groups| rows (swap percentile_approx
    beyond memory scale — same shape); the grid explode and the
    reference-profile average run on that tiny frame; nothing else
    shuffles.
    """
    grid = grid or [i / 20 + 0.025 for i in range(0, 20, 2)]
    qs = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.percentile(
            value_col, F.array(*[F.lit(p) for p in grid])
        ).alias("_qs")
    )
    per = qs.select(
        "_g", F.posexplode("_qs").alias("_i", "_q")
    )
    ref = per.groupBy("_i").agg(F.avg("_q").alias("_r"))
    pcol = F.element_at(
        F.array(*[F.lit(p) for p in grid]), F.col("_i") + 1
    )
    return (
        per.join(F.broadcast(ref), "_i")
        .select(
            F.col("_g").alias(group_col),
            F.round(pcol, 4).alias("p"),
            F.round(F.col("_q") + 1e-9, round_dp).alias("group_q"),
            F.round(F.col("_r") + 1e-9, round_dp).alias("ref_q"),
            F.round(F.col("_q") - F.col("_r") + 1e-9, round_dp).alias(
                "gap"
            ),
        )
        .orderBy(group_col, "p")
    )


def mutual_information(
    df: DataFrame,
    col_a: str,
    col_b: str,
    round_dp: int = 6,
) -> DataFrame:
    """Mutual information (bits) between two categorical columns, with
    the marginal entropies and the sqrt-normalized NMI — the standard
    feature-redundancy / label-leakage screen run before a categorical
    column is admitted as a model feature.

    Scale shape: ONE data-sized aggregate (the joint contingency counts,
    bounded by |A| x |B| cells); marginals re-aggregate the tiny cell
    frame, and the 1-row grand total broadcasts onto it (the house
    pattern for corpus-stat rows — adjudicated in plans/flags.py). The
    fact table is scanned once.

    Exactness: every p*log2 term is a ratio of exact BIGINT counts; the
    final sums run over <= |A|x|B| values and are rounded.
    """
    joint = df.groupBy(
        F.col(col_a).alias("a"), F.col(col_b).alias("b")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("nab"))
    ma = joint.groupBy("a").agg(F.sum("nab").cast("bigint").alias("na"))
    mb = joint.groupBy("b").agg(F.sum("nab").cast("bigint").alias("nb"))
    tot = joint.agg(F.sum("nab").cast("bigint").alias("n"))
    cells = (
        joint.join(F.broadcast(ma), "a")
        .join(F.broadcast(mb), "b")
        .join(F.broadcast(tot))
    )
    log2 = F.lit(0.6931471805599453)  # ln 2
    mi = cells.agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum(
            (F.col("nab") / F.col("n"))
            * F.log(F.col("nab") * F.col("n") / (F.col("na") * F.col("nb")))
        ).alias("_mi_nats"),
    )
    ha = ma.join(F.broadcast(tot)).agg(
        (-F.sum((F.col("na") / F.col("n")) * F.log(F.col("na") / F.col("n"))))
        .alias("_ha_nats")
    )
    hb = mb.join(F.broadcast(tot)).agg(
        (-F.sum((F.col("nb") / F.col("n")) * F.log(F.col("nb") / F.col("n"))))
        .alias("_hb_nats")
    )
    return (
        mi.join(F.broadcast(ha))
        .join(F.broadcast(hb))
        .select(
            "n",
            "n_cells",
            F.round(F.col("_mi_nats") / log2 + 1e-9, round_dp).alias("mi_bits"),
            F.round(F.col("_ha_nats") / log2 + 1e-9, round_dp).alias("h_a_bits"),
            F.round(F.col("_hb_nats") / log2 + 1e-9, round_dp).alias("h_b_bits"),
            F.round(
                F.col("_mi_nats")
                / F.sqrt(F.col("_ha_nats") * F.col("_hb_nats"))
                + 1e-9,
                round_dp,
            ).alias("nmi"),
        )
    )


def cramers_v(
    df: DataFrame,
    col_a: str,
    col_b: str,
    round_dp: int = 6,
) -> DataFrame:
    """Cramér's V association between two categorical columns — the
    chi-square companion to :func:`mutual_information` (V is bounded
    [0, 1] and comparable across tables of different shapes, the usual
    report number for a categorical-feature screen).

    Uses the present-cells identity ``chi2 = n * (sum o^2/(n_i n_j) - 1)``
    so absent contingency cells (observed 0, expected > 0) never need
    materializing. Same plan shape as mutual_information: one data-sized
    aggregate to the cell frame, broadcast marginals, 1-row total.
    """
    joint = df.groupBy(
        F.col(col_a).alias("a"), F.col(col_b).alias("b")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("nab"))
    ma = joint.groupBy("a").agg(F.sum("nab").cast("bigint").alias("na"))
    mb = joint.groupBy("b").agg(F.sum("nab").cast("bigint").alias("nb"))
    tot = joint.agg(
        F.sum("nab").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
    )
    ra = ma.agg(F.count(F.lit(1)).cast("bigint").alias("r_levels"))
    rb = mb.agg(F.count(F.lit(1)).cast("bigint").alias("c_levels"))
    cells = (
        joint.join(F.broadcast(ma), "a")
        .join(F.broadcast(mb), "b")
        .join(F.broadcast(tot))
    )
    s = cells.agg(
        F.max("n").alias("n"),
        F.max("n_cells").alias("n_cells"),
        F.sum(
            (F.col("nab") * F.col("nab"))
            / (F.col("na") * F.col("nb").cast("double"))
        ).alias("_s"),
    )
    out = s.join(F.broadcast(ra)).join(F.broadcast(rb))
    chi2 = F.col("n") * (F.col("_s") - 1.0)
    kmin = F.least(F.col("r_levels") - 1, F.col("c_levels") - 1)
    return out.select(
        "n",
        "r_levels",
        "c_levels",
        ((F.col("r_levels") - 1) * (F.col("c_levels") - 1))
        .cast("bigint")
        .alias("dof"),
        F.round(chi2 + 1e-9, 4).alias("chi2"),
        F.round(F.sqrt(chi2 / (F.col("n") * kmin)) + 1e-9, round_dp).alias(
            "cramers_v"
        ),
    )


def robust_scale_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    iqr_k: float = 1.5,
    round_dp: int = 4,
) -> DataFrame:
    """Per-group robust-scaler parameters (median, IQR via exact DISCRETE
    percentiles) plus the count of robust outliers
    (|x - median| > k * IQR) — the outlier-resistant sibling of z-score
    standardization, and the screen that decides whether a feature needs
    winsorizing before training.

    Exactness: DISCRETE percentiles pick MEMBERS of the group (no
    interpolation — Spark lacks PERCENTILE_DISC as a builtin, so this
    uses the agg_percentile_disc two-level shape: collapse to per-(group,
    value) counts, cumulative weights in a per-group window over that
    tiny frame, smallest value with cum >= p*total), so median/IQR are
    bit-identical across engines; the outlier test compares exact values.

    Shape: one (group, value) count aggregate collapses the fact table,
    partitioned windows over the collapsed frame, one hash join back on
    the group key for the outlier count.
    """
    v = F.col(value_col).cast("double")
    c = df.groupBy(F.col(group_col).alias("grp"), v.alias("_x")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    wq = Window.partitionBy("grp").orderBy("_x")
    cum = c.select(
        "grp",
        "_x",
        F.sum("_n").over(wq).alias("_cw"),
        F.sum("_n").over(Window.partitionBy("grp")).alias("_tot"),
    )

    def _disc(p: float, name: str) -> DataFrame:
        return (
            cum.filter(F.col("_cw") >= F.lit(p) * F.col("_tot"))
            .groupBy("grp")
            .agg(F.min("_x").alias(name))
        )

    params = (
        _disc(0.5, "med")
        .join(_disc(0.25, "q1"), "grp")
        .join(_disc(0.75, "q3"), "grp")
        .join(
            c.groupBy("grp").agg(F.sum("_n").cast("bigint").alias("n")),
            "grp",
        )
    )
    joined = df.select(F.col(group_col).alias("grp"), v.alias("_x")).join(
        params, "grp"
    )
    iqr = F.col("q3") - F.col("q1")
    out = (
        joined.groupBy("grp", "n", "med", "q1", "q3")
        .agg(
            F.sum(
                (F.abs(F.col("_x") - F.col("med")) > F.lit(iqr_k) * iqr)
                .cast("bigint")
            ).cast("bigint").alias("n_outliers")
        )
    )
    return out.select(
        F.col("grp").alias(group_col),
        "n",
        F.round(F.col("med") + 1e-9, round_dp).alias("median"),
        F.round(iqr + 1e-9, round_dp).alias("iqr"),
        "n_outliers",
    ).orderBy(group_col)
