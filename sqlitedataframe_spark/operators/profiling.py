"""Data-quality profiling: the summary statistics a curation pipeline
computes before and after every transformation step (null rates, distinct
counts, value ranges) — df.summary()'s shape, but deterministic,
long-form, and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str] | None = None, exact: bool = True) -> DataFrame:
    """Column profiling: one output row per column with
    (n_rows, n_nulls, n_distinct, min/max) — the data-quality summary a
    curation pipeline runs before and after every transformation.

    Plan shape (chosen by measurement, see git history):

    - nulls/min/max/count: ONE aggregation pass (map-side partials, one
      exchange of a single row) — HashAggregate throughout.
    - exact distinct counts: Catalyst's native multi-COUNT(DISTINCT)
      rewrite Expands the input ×(N+1) and falls back to SortAggregate
      (first()'s buffer is hash-incompatible), sorting the amplified input
      — 6× slower than this formulation at sf0.1 and quadratically worse
      with column count. Instead the input is melted to slim
      (column, value-as-string) pairs and deduplicated with a plain
      two-level hash aggregate: map-side partial dedup means the shuffle
      carries at most (distinct values per partition), and both levels
      stay in whole-stage-codegen HashAggregate. String casts are
      injective for the profiled types (bigint, double via Java
      shortest-repr, string), so dedup-by-cast equals dedup-by-value.
    - ``exact=False``: HyperLogLog (approx_count_distinct) folded into the
      single-pass agg — the 100 TB default, no melt at all.

    Numeric columns report min_d/max_d (double, 2 dp); other columns
    min_s/max_s (string form) — the unused pair is NULL, keeping one
    uniform schema in long form.
    """
    from pyspark.sql.types import NumericType

    cols = list(cols or df.columns)
    by_name = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__nulls"))
        if not exact:
            aggs.append(F.approx_count_distinct(c).alias(f"{c}__distinct"))
        if isinstance(by_name[c], NumericType):
            aggs.append(F.round(F.min(c).cast("double") + 1e-9, 2).alias(f"{c}__min"))
            aggs.append(F.round(F.max(c).cast("double") + 1e-9, 2).alias(f"{c}__max"))
        else:
            aggs.append(F.min(c).cast("string").alias(f"{c}__min"))
            aggs.append(F.max(c).cast("string").alias(f"{c}__max"))
    one = df.agg(*aggs)
    rows = []
    for c in cols:
        numeric = isinstance(by_name[c], NumericType)
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                (
                    F.lit(None).cast("bigint")
                    if exact
                    else F.col(f"{c}__distinct").cast("bigint")
                ).alias("n_distinct"),
                (F.col(f"{c}__min") if numeric else F.lit(None).cast("double")).alias("min_d"),
                (F.col(f"{c}__max") if numeric else F.lit(None).cast("double")).alias("max_d"),
                (F.lit(None).cast("string") if numeric else F.col(f"{c}__min")).alias("min_s"),
                (F.lit(None).cast("string") if numeric else F.col(f"{c}__max")).alias("max_s"),
            )
        )
    stats = one.select(F.explode(F.array(*rows)).alias("r")).select("r.*")
    if not exact:
        return stats

    # exact distinct via melt + two-level hash dedup (COUNT(DISTINCT)
    # ignores NULLs, hence the filter; an all-NULL column melts to zero
    # rows and coalesces to 0 below — the COUNT(DISTINCT) value).
    from pyspark.sql.types import FractionalType

    def _melt_val(c: str):
        # Aggregation keys normalize -0.0 to 0.0; a plain string cast does
        # not ('-0.0' != '0.0'), so floating columns must fold signed zero
        # before casting or the exact path over-counts by one vs
        # COUNT(DISTINCT) semantics. `col == 0` matches both zeros and is
        # false for NaN/NULL, so only the zeros are rewritten.
        col = F.col(c)
        if isinstance(by_name[c], FractionalType):
            col = F.when(col == 0, F.lit(0).cast(by_name[c])).otherwise(col)
        return col.cast("string").alias("v")

    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(c).alias("column"), _melt_val(c))
                    for c in cols
                ]
            )
        ).alias("kv")
    ).select("kv.*").filter(F.col("v").isNotNull())
    dcounts = (
        melted.distinct()
        .groupBy("column")
        .agg(F.count(F.lit(1)).alias("_nd"))
    )
    # 1 row per profiled column: always broadcast-size
    return (
        stats.drop("n_distinct")
        .join(F.broadcast(dcounts), "column", "left")
        .select(
            "column",
            "n_rows",
            "n_nulls",
            F.coalesce(F.col("_nd"), F.lit(0)).alias("n_distinct"),
            "min_d",
            "max_d",
            "min_s",
            "max_s",
        )
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_cols: list[str],
    thresh: float = 5.0,
    round_dp: int = 4,
    exact: bool = True,
) -> DataFrame:
    """Robust per-group anomaly detection: flag rows whose
    ``|value - median|`` exceeds ``thresh`` x MAD (median absolute
    deviation). Median/MAD, unlike mean/stddev, are not dragged toward the
    outliers they are supposed to measure — the standard robust yardstick
    for telemetry / label-noise / sensor-glitch screens.

    Two aggregation passes (median, then MAD of deviations), each a tiny
    per-group table broadcast back onto the fact stream, so the fact side
    is scanned twice but NEVER shuffled — only the group key crosses an
    exchange. With ``exact=True`` Spark's exact interpolated median buffers
    each group's values in one aggregator (fine for bounded groups, and
    bit-matches the SQL oracle); at 100 TB per group set ``exact=False``
    for the fixed-memory approx-percentile sketch — identical plan shape,
    mergeable state instead of a buffer.

    Rows in a group whose MAD is 0 (constant-majority) flag on ANY
    deviation and report a NULL score: deliberately loud, because a value
    deviating from an otherwise-constant group is the strongest anomaly
    signal there is.
    """
    med_fn = F.median if exact else (lambda c: F.percentile_approx(c, 0.5))
    v = F.col(value_col)
    med = df.groupBy(group_col).agg(med_fn(v).alias("_med"))
    with_med = df.join(F.broadcast(med), group_col)
    dev = F.abs(v - F.col("_med"))
    mad = with_med.groupBy(group_col).agg(med_fn(dev).alias("_mad"))
    return (
        with_med.join(F.broadcast(mad), group_col)
        .filter(dev > F.lit(thresh) * F.col("_mad"))
        .select(
            *id_cols,
            group_col,
            value_col,
            F.round(dev / F.nullif(F.col("_mad"), F.lit(0.0)), round_dp).alias(
                "mad_score"
            ),
        )
    )


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    group_col: str,
    value_col: str,
    bin_width: float,
    n_bins: int = 20,
    round_dp: int = 6,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    snapshot of a numeric column, per group — THE standard drift monitor
    for features/labels between training time and serving time
    (rule of thumb: psi < 0.1 stable, 0.1-0.25 drifting, > 0.25 act).

    PSI = sum_bins (p_cur - p_ref) * ln(p_cur / p_ref) over a FIXED
    equal-width binning (floor(value / bin_width), clamped to
    [0, n_bins-1]) — fixed bounds, not data-dependent quantiles, so the
    statistic is deterministic and the two snapshots can be binned
    independently (e.g. on different days) and compared later. Bins are
    Laplace-smoothed (+0.5) on a dense (group x bin) grid so empty bins
    contribute finite, engine-identical terms.

    Scale shape: each snapshot collapses to at most |groups| x n_bins
    count rows with map-side partial aggregation — input-size-independent
    exchange, the sketch property — and everything after the two
    aggregates is arithmetic on the tiny dense grid. The two snapshots
    are scanned once each and never joined row-wise.
    """
    v = F.col(value_col)
    b = F.least(
        F.greatest(F.floor(v / F.lit(bin_width)).cast("int"), F.lit(0)),
        F.lit(n_bins - 1),
    )

    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(F.col(group_col).alias("_g"), b.alias("_b"))
            .groupBy("_g", "_b")
            .agg(F.count(F.lit(1)).alias(name))
        )

    grid = (
        ref.select(F.col(group_col).alias("_g"))
        .union(cur.select(F.col(group_col).alias("_g")))
        .distinct()
        .select("_g", F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("_b"))
    )
    dense = (
        grid.join(counts(ref, "_cr"), ["_g", "_b"], "left")
        .join(counts(cur, "_cc"), ["_g", "_b"], "left")
        .select(
            "_g",
            "_b",
            (F.coalesce(F.col("_cr"), F.lit(0)) + 0.5).alias("_cr"),
            (F.coalesce(F.col("_cc"), F.lit(0)) + 0.5).alias("_cc"),
        )
    )
    tot = dense.groupBy("_g").agg(
        F.sum("_cr").alias("_tr"), F.sum("_cc").alias("_tc")
    )
    p_ref = F.col("_cr") / F.col("_tr")
    p_cur = F.col("_cc") / F.col("_tc")
    return (
        dense.join(F.broadcast(tot), "_g")
        .groupBy(F.col("_g").alias(group_col))
        .agg(
            F.round(
                F.sum((p_cur - p_ref) * F.log(p_cur / p_ref)) + 1e-9, round_dp
            ).alias("psi")
        )
    )


def ab_ztest(
    df: DataFrame,
    metric_col: str,
    group_col: str,
    variant_col,
    round_dp: int = 4,
    z_crit: float = 1.96,
) -> DataFrame:
    """Two-sample Welch z-test per group: is the metric's mean different
    between variant A (``variant_col`` false/0) and B (true/1)? The
    experiment-analysis primitive (A/B readout, canary comparison,
    guardrail metric check).

    z = (mean_a - mean_b) / sqrt(v_a/n_a + v_b/n_b) with sample
    variances — Welch's unequal-variance form, the safe default. The
    normal approximation is what you want at data-platform sample sizes
    (every per-variant n here is >> 30); no t-distribution table needed.

    Scale shape: ONE aggregation pass over the fact stream computes
    (n, mean, variance) per (group, variant) — map-side partial moments,
    a |groups| x 2 result — and the test statistic is arithmetic on that
    tiny frame after a self-join on the group key.
    """
    v = F.col(metric_col)
    variant = variant_col if isinstance(variant_col, Column) else F.col(variant_col)
    s = (
        df.select(
            F.col(group_col).alias("_g"), variant.cast("int").alias("_b"), v.alias("_v")
        )
        .groupBy("_g", "_b")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.avg("_v").alias("_mean"),
            F.var_samp("_v").alias("_var"),
        )
    )
    a = s.filter(F.col("_b") == 0).select(
        "_g",
        F.col("_n").alias("n_a"),
        F.col("_mean").alias("_ma"),
        F.col("_var").alias("_va"),
    )
    b = s.filter(F.col("_b") == 1).select(
        "_g",
        F.col("_n").alias("n_b"),
        F.col("_mean").alias("_mb"),
        F.col("_var").alias("_vb"),
    )
    z = (F.col("_ma") - F.col("_mb")) / F.sqrt(
        F.col("_va") / F.col("n_a") + F.col("_vb") / F.col("n_b")
    )
    return (
        a.join(b, "_g")
        .select(
            F.col("_g").alias(group_col),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.round(F.col("_ma") + 1e-9, round_dp).alias("mean_a"),
            F.round(F.col("_mb") + 1e-9, round_dp).alias("mean_b"),
            # + 0.0: signed-zero convention (tiny-negative z -> -0.0 in
            # DuckDB ROUND but +0.0 in Spark; driver hash distinguishes)
            (F.round(z + 1e-9, round_dp) + 0.0).alias("z"),
            (F.abs(z) > z_crit).alias("significant"),
        )
    )


def forecast_baseline_eval(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    season: int = 7,
) -> DataFrame:
    """Seasonal-naive forecast evaluation: predict each day's total by the
    value ``season`` days earlier and report MAE/MAPE per group — the
    baseline every real forecasting model must beat, and the monitoring
    primitive for "is this week shaped like last week".

    Scale shape: the fact stream collapses to a (group, day) daily total
    with map-side partial aggregation — input-size-independent exchange —
    and the lag window + error aggregate run on that bounded calendar
    frame (one small re-exchange on the group key). Days without a
    ``season``-back reference are excluded from the error means.
    """
    d = df.groupBy(
        F.col(group_col).alias("_g"), F.to_date(ts_col).alias("_day")
    ).agg(F.sum(value_col).alias("_y"))
    w = Window.partitionBy("_g").orderBy("_day")
    l = d.withColumn("_yhat", F.lag("_y", season).over(w)).filter(
        F.col("_yhat").isNotNull()
    )
    err = F.abs(F.col("_y") - F.col("_yhat"))
    return (
        l.groupBy(F.col("_g").alias(group_col))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.round(F.avg(err) + 1e-9, 2).alias("mae"),
            F.round(
                F.avg(err / F.nullif(F.col("_y"), F.lit(0.0))) + 1e-9, 4
            ).alias("mape"),
        )
    )


def changepoint_cusum(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    round_dp: int = 2,
) -> DataFrame:
    """Offline mean-shift evidence per group, CUSUM-style: daily totals'
    deviations from the group mean accumulate into a prefix-sum path, and
    the path's maximum drawup (rise above its running minimum) / drawdown
    (fall below its running maximum) measure the strongest sustained
    upward / downward shift anywhere in the window — the changepoint
    screen behind "did this metric's level change, not just spike".

    The classic recursive CUSUM ``s_t = max(0, s_{t-1} + dev_t)`` is not
    window-expressible, but its supremum IS: max drawup of the deviation
    prefix sums equals the max over t of (P_t - min_{s<=t} P_s) — two
    stacked running windows, no recursion.

    Scale shape: the fact stream collapses to the (group, day) calendar
    map-side (input-size-independent exchange); the mean join and all
    three windows run on that bounded frame, partitioned by group.
    """
    d = df.groupBy(
        F.col(group_col).alias("_g"), F.to_date(ts_col).alias("_day")
    ).agg(F.sum(value_col).alias("_y"))
    mu = d.groupBy("_g").agg(F.avg("_y").alias("_mu"))
    w = (
        Window.partitionBy("_g")
        .orderBy("_day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    p = d.join(F.broadcast(mu), "_g").withColumn(
        "_ps", F.sum(F.col("_y") - F.col("_mu")).over(w)
    )
    dr = p.select(
        "_g",
        (F.col("_ps") - F.min("_ps").over(w)).alias("_up"),
        (F.max("_ps").over(w) - F.col("_ps")).alias("_down"),
    )
    return dr.groupBy(F.col("_g").alias(group_col)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.round(F.max("_up") + 1e-9, round_dp).alias("max_drawup"),
        F.round(F.max("_down") + 1e-9, round_dp).alias("max_drawdown"),
    )


def rfm_segments(
    orders: DataFrame,
    customer_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation — the
    classic behavioral-cohort analysis: per customer, days since last
    order, order count, and total spend, each quartile-coded 1-4, and
    the population counted per 3-digit segment (rfm = r*100 + f*10 + m;
    4 = top quartile on every axis).

    Plan shape: one groupBy(customer) aggregate builds the per-customer
    RFM triple; the anchor date and the nine quartile boundaries ride as
    TWO 1-row broadcasts (the curriculum_buckets pattern — no global
    window, no ntile); codes are scan-side comparison sums and the final
    segment count is a partially-combined aggregate over <= 64 groups.
    Engine-exact: both engines interpolate percentiles with the same
    IEEE formula, and ties landing exactly on a boundary compare
    identically.
    """
    anchor = orders.agg(F.max(F.col(date_col).cast("date")).alias("_maxd"))
    cust = (
        orders.join(F.broadcast(anchor))
        .groupBy(F.col(customer_col).alias("cust"))
        .agg(
            F.min(
                F.datediff(F.col("_maxd"), F.col(date_col).cast("date"))
            ).alias("recency"),
            F.count(F.lit(1)).cast("double").alias("freq"),
            # cents-rounded BEFORE the quantiles: parallel-summation ulp
            # drift must not be able to move a quartile boundary
            F.round(F.sum(F.col(amount_col)), 2).alias("monetary"),
        )
    )
    bounds = cust.agg(
        F.expr("percentile(recency, array(0.25, 0.5, 0.75))").alias("_qr"),
        F.expr("percentile(freq, array(0.25, 0.5, 0.75))").alias("_qf"),
        F.expr("percentile(monetary, array(0.25, 0.5, 0.75))").alias("_qm"),
    )

    def code(col: str, qs: str, invert: bool) -> Column:
        # quartile code 1-4; recency INVERTED (smaller = more recent = 4)
        c = F.lit(1)
        for i in range(3):
            c = c + (F.col(col) > F.element_at(qs, i + 1)).cast("int")
        return (F.lit(5) - c) if invert else c

    return (
        cust.join(F.broadcast(bounds))
        .select(
            (
                code("recency", "_qr", True) * 100
                + code("freq", "_qf", False) * 10
                + code("monetary", "_qm", False)
            ).alias("rfm"),
        )
        .groupBy("rfm")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
        .orderBy("rfm")
    )


def ks_drift(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    bin_width: float,
    round_dp: int = 6,
) -> DataFrame:
    """Binned two-sample Kolmogorov-Smirnov statistic between two
    snapshots of a numeric column: ``D = max_bins |ECDF_a - ECDF_b|``
    evaluated at fixed equal-width bin edges. The complement to
    psi_drift: KS reads the CUMULATIVE gap (sensitive to location/shape
    shifts PSI's per-bin sum can wash out), and the fixed binning makes
    it deterministic and mergeable — each snapshot bins independently,
    possibly on different days, exactly like the PSI recipe.

    Scale shape at 100 TB: each snapshot collapses to <= |bins| count
    rows via partially-combined aggregation (input-size-independent
    exchange); the ECDFs come from ONE window ordered by bin over the
    tiny dense bin spine — partitioned by the snapshot tag, so no
    unpartitioned window over data-sized input anywhere — and the max
    gap is a 1-row aggregate. The snapshots are never joined row-wise.

    Exact-oracle determinism: ECDF values are ratios of integer counts;
    the gap rounds to ``round_dp`` before the max so both engines pick
    the same supremum.
    """
    bcol = F.floor(F.col(value_col) / F.lit(bin_width)).cast("bigint")

    def counts(df: DataFrame, tag: str) -> DataFrame:
        return (
            df.select(bcol.alias("_b"))
            .groupBy("_b")
            .agg(F.count(F.lit(1)).alias("_n"))
            .select(F.lit(tag).alias("_g"), "_b", "_n")
        )

    ca, cb = counts(a, "a"), counts(b, "b")
    spine = (
        ca.select("_b").union(cb.select("_b")).distinct()
        .crossJoin(F.broadcast(
            ca.sparkSession.createDataFrame([("a",), ("b",)], "_g string")
        ))
    )
    dense = (
        spine.join(ca.union(cb), ["_g", "_b"], "left")
        .select("_g", "_b", F.coalesce("_n", F.lit(0)).alias("_n"))
    )
    w = Window.partitionBy("_g").orderBy("_b")
    tot = Window.partitionBy("_g")
    ecdf = dense.select(
        "_g", "_b",
        (F.sum("_n").over(w).cast("double") / F.sum("_n").over(tot)).alias("_f"),
        F.sum("_n").over(tot).alias("_nt"),
    )
    gaps = (
        ecdf.groupBy("_b")
        .agg(
            F.round(
                F.abs(
                    F.sum(F.when(F.col("_g") == "a", F.col("_f"))) -
                    F.sum(F.when(F.col("_g") == "b", F.col("_f")))
                ),
                round_dp,
            ).alias("_gap"),
            F.max(F.when(F.col("_g") == "a", F.col("_nt"))).alias("_na"),
            F.max(F.when(F.col("_g") == "b", F.col("_nt"))).alias("_nb"),
        )
    )
    return gaps.agg(
        F.max("_gap").alias("ks_d"),
        F.max("_na").cast("bigint").alias("n_a"),
        F.max("_nb").cast("bigint").alias("n_b"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
    )


#: Benford expected first-digit probabilities ln(1 + 1/d) / ln(10).
def benford_digits(
    df: DataFrame,
    value_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """First-significant-digit distribution of a positive numeric column
    against Benford's law, with per-digit chi-square contributions — the
    classic forensic screen for fabricated or truncated numeric data
    (amounts, populations, counts), and a cheap data-quality profile for
    any scale-spanning money column.

    The observed side is one partially-combined 9-row aggregate over a
    scan-side ``substr(cast(floor(value)))`` digit extraction — no
    shuffle wider than 9 rows, no window. Expected frequencies
    ``log10(1 + 1/d)`` are literals; the chi-square contribution
    ``(obs - exp)^2 / exp`` (on proportions, scaled by n) is arithmetic
    on the tiny grid. Rows where the value is null or < 1 are excluded
    scan-side (the filter is ``v >= 1``: sub-1 magnitudes are dropped by
    design so the first digit is just the leading integer digit, no
    log10 rescaling of fractions).
    """
    v = F.col(value_col)
    digit = F.substring(F.floor(v).cast("bigint").cast("string"), 1, 1).cast("int")
    obs = (
        df.filter(v >= 1)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    tot = obs.agg(F.sum("_n").alias("_nt"))
    p_exp = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    p_obs = F.col("_n").cast("double") / F.col("_nt")
    return (
        obs.join(F.broadcast(tot))
        .select(
            "digit",
            F.col("_n").cast("bigint").alias("n"),
            F.round(p_obs, round_dp).alias("p_obs"),
            F.round(p_exp, round_dp).alias("p_benford"),
            F.round(
                (p_obs - p_exp) * (p_obs - p_exp) / p_exp * F.col("_nt"),
                round_dp,
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


def pareto_key_classes(
    df: DataFrame,
    key_col: str,
    weight_col,
    bounds: tuple[float, float] = (0.8, 0.95),
) -> DataFrame:
    """Per-KEY ABC/Pareto classes: (key, _c cents, pareto_class) — the
    row-level form behind :func:`pareto_classes` (which aggregates it to
    the class summary) and :func:`pareto migration <suite>` views that
    need the key->class map itself. Same two-level prefix sum, same
    integer-cents exactness contract.

    The interesting part is the DISTRIBUTED PREFIX SUM: a global
    running total over keys sorted by weight is the textbook
    single-partition trap, so the cumulative builds in two levels —
    (1) keys bucket by floor(log2(weight)); (2) within a bucket, one
    PARTITIONED window (ordered weight DESC, key) computes the local
    running sum; (3) the tiny bucket-totals table (<= 64 rows: one per
    exponent) joins to itself on ``higher-bucket`` to give each bucket
    its global offset. Total order = (bucket DESC, weight DESC, key) —
    exactly the single-sort order, recovered without a global sort.

    Weights are summed in exact integer CENTS after one money rounding,
    so the cumulative and the class cuts are integer arithmetic both
    engines reproduce bit-for-bit (the RFM cents-rounding recipe).
    """
    lo, hi = bounds
    agg = weight_col if not isinstance(weight_col, str) else F.sum(weight_col)
    # +1e-9 before the money rounding: the repo's standard guard against
    # partial-sum ulp drift flipping ROUND at a .xx5 cent boundary
    per_key = df.groupBy(F.col(key_col).alias("key")).agg(
        F.round(agg + 1e-9, 2).alias("_w")
    )
    cents = per_key.select(
        "key", F.round(F.col("_w") * 100).cast("bigint").alias("_c")
    ).filter(F.col("_c") > 0)
    bucketed = cents.withColumn(
        "_bkt", F.floor(F.log2(F.col("_c"))).cast("int")
    )
    w = (
        Window.partitionBy("_bkt")
        .orderBy(F.col("_c").desc(), F.col("key"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bucketed.withColumn("_cum_local", F.sum("_c").over(w))
    btot = bucketed.groupBy("_bkt").agg(F.sum("_c").alias("_bt"))
    # per-bucket global offset: total cents in all STRICTLY HIGHER buckets
    # (tiny inequality self-join over <= 64 exponent rows)
    a, b = btot.alias("a"), btot.alias("b")
    offsets = (
        a.join(F.broadcast(b), F.col("b._bkt") > F.col("a._bkt"), "left")
        .groupBy(F.col("a._bkt").alias("_bkt"))
        .agg(F.coalesce(F.sum("b._bt"), F.lit(0)).alias("_off"))
    )
    total = cents.agg(F.sum("_c").alias("_tot"))
    cum = (
        local.join(F.broadcast(offsets), "_bkt")
        .join(F.broadcast(total))
        .select(
            "key",
            F.col("_c"),
            (F.col("_off") + F.col("_cum_local")).alias("_cum"),
            F.col("_tot"),
        )
    )
    cls = (
        F.when(F.col("_cum") * 100 <= F.col("_tot") * int(lo * 100), "A")
        .when(F.col("_cum") * 100 <= F.col("_tot") * int(hi * 100), "B")
        .otherwise("C")
    )
    return cum.withColumn("pareto_class", cls).select(
        "key", "_c", "_tot", "pareto_class"
    )


def pareto_classes(
    df: DataFrame,
    key_col: str,
    weight_col,
    bounds: tuple[float, float] = (0.8, 0.95),
) -> DataFrame:
    """ABC/Pareto classification: rank keys by total weight descending,
    cut the CUMULATIVE share at ``bounds`` -> class A (top ~80% of
    weight), B (next ~15%), C (tail). The classic inventory/revenue
    concentration screen, and a corpus-curation tool (which sources
    carry the token mass?).

    The interesting part is the DISTRIBUTED PREFIX SUM: a global
    running total over keys sorted by weight is the textbook
    single-partition trap, so the cumulative builds in two levels —
    (1) keys bucket by floor(log2(weight)); (2) within a bucket, one
    PARTITIONED window (ordered weight DESC, key) computes the local
    running sum; (3) the tiny bucket-totals table (<= 64 rows: one per
    exponent) joins to itself on ``higher-bucket`` to give each bucket
    its global offset. Total order = (bucket DESC, weight DESC, key) —
    exactly the single-sort order, recovered without a global sort.

    Weights are summed in exact integer CENTS after one money rounding,
    so the cumulative and the class cuts are integer arithmetic both
    engines reproduce bit-for-bit (the RFM cents-rounding recipe).
    """
    keyed = pareto_key_classes(df, key_col, weight_col, bounds)
    return (
        keyed.groupBy(F.col("pareto_class"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.round(F.sum("_c") / 100.0, 2).alias("class_weight"),
            F.round(F.sum("_c") / F.max("_tot"), 6).alias("weight_share"),
        )
        .orderBy("pareto_class")
    )


#: Poisson(1) CDF ladder for the bootstrap weight draw — written as exact
#: decimal literals so both engines compare against IDENTICAL doubles.
POISSON1_CDF = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238462",
    "0.9963401531726563",
    "0.9994058151824183",
)


def poisson_bootstrap_ci(
    df: DataFrame,
    key_col: str,
    value_col: str,
    b_reps: int = 100,
    lo: float = 0.025,
    hi: float = 0.975,
    round_dp: int = 4,
) -> DataFrame:
    """Bootstrap confidence interval for the MEAN of a column via the
    Poisson bootstrap (the resampling scheme that works on data too big
    to index: each row independently receives a Poisson(1) multiplicity
    per replicate, approximating multinomial resampling without any
    global coordination).

    Determinism: replicate ``b``'s weight for a row is the Poisson(1)
    inverse CDF applied to a uniform derived from ``md5(key || ':' ||
    b)`` — the repo's portable count-min recipe, so any engine
    reproduces the exact same resamples. Weights cap at 6 (CDF there is
    0.99994; the truncation bias is far below the CI's own Monte Carlo
    noise).

    Scale shape — the whole point: NO row explosion. The ``2 * B``
    replicate sums compute as one partially-combined single-pass
    aggregate (B weighted sums + B weight totals, all scan-side
    expressions), so the exchange carries ONE row regardless of input
    size; replicate means and the percentile CI are arithmetic on that
    row (a B-row explode of the 1-row frame). Compare the naive explode
    formulation, which multiplies the corpus by B before aggregating.
    """
    v = F.col(value_col)

    # One md5 digest yields FOUR independent 32-bit uniforms (the _cells
    # trick from the count-min sketch): replicate b reads hex window b%4
    # of digest md5(key || ':' || b//4) — 4x fewer hashes per row. The
    # whole weight vector materializes ONCE per row as an array column in
    # a projection (25 md5 + 100 ladder evaluations, evaluated one time),
    # so the 2B aggregate expressions degenerate to element_at slices of
    # that array. Measured at sf0.1: per-aggregate hash chains 52 s,
    # digest sharing inside the aggregate 20 s, this projection form ~3 s
    # — the aggregate expressions must be cheap, not just the hashing.
    n_digests = (b_reps + 3) // 4

    def ladder(u):
        w = F.lit(6)
        for i in range(len(POISSON1_CDF) - 1, -1, -1):
            w = F.when(u < F.lit(float(POISSON1_CDF[i])), F.lit(i)).otherwise(w)
        return w.cast("double")

    def ws_over(kcol: str):
        key = F.col(kcol).cast("string")
        digs = F.transform(
            F.sequence(F.lit(0), F.lit(n_digests - 1)),
            lambda g: F.md5(
                F.concat(key, F.lit(":"), g.cast("string")).cast("binary")
            ),
        )
        # let-bind the digest array (transform over a 1-element array,
        # the repo's standard idiom) so the md5 calls evaluate once per
        # row, not once per replicate element
        return F.element_at(
            F.transform(
                F.array(digs),
                lambda d: F.transform(
                    F.sequence(F.lit(0), F.lit(b_reps - 1)),
                    lambda b: ladder(
                        F.conv(
                            F.substring(
                                F.element_at(d, (b / 4).cast("int") + 1),
                                (b % 4).cast("int") * 8 + 1,  # 1-based hex
                                8,
                            ),
                            16,
                            10,
                        ).cast("bigint")
                        / F.lit(4294967296.0)
                    ),
                ),
            ),
            1,
        )
    # a small compressed file scans as ONE partition, serializing the
    # B-ladder projection on a single core — spread() pre-parallelizes
    # exactly like the text_repetition fold fix (no-op on fact-scale
    # inputs that already have many splits)
    from sqlitedataframe_spark.operators.util import spread

    staged = spread(df.select(v.alias("_v"), F.col(key_col).alias("_k")), "_k")
    staged = staged.select("_v", ws_over("_k").alias("_ws"))

    aggs = [F.round(F.avg("_v") + 1e-9, round_dp).alias("mean"),
            F.count(F.lit(1)).cast("bigint").alias("n")]
    for b in range(b_reps):
        w = F.element_at("_ws", b + 1)
        aggs.append(F.sum(w * F.col("_v")).alias(f"_s{b}"))
        aggs.append(F.sum(w).alias(f"_w{b}"))
    one = staged.agg(*aggs)
    means = F.array(*[
        F.col(f"_s{b}") / F.col(f"_w{b}") for b in range(b_reps)
    ])
    exploded = one.select(
        "mean", "n", F.explode(means).alias("_m")
    )
    return exploded.groupBy("mean", "n").agg(
        F.round(F.expr(f"percentile(_m, {lo})") + 1e-9, round_dp).alias("ci_lo"),
        F.round(F.expr(f"percentile(_m, {hi})") + 1e-9, round_dp).alias("ci_hi"),
        F.count(F.lit(1)).cast("bigint").alias("b_reps"),
    ).select("mean", "ci_lo", "ci_hi", "n", "b_reps")


def weighted_median(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Exact weighted median: the smallest value whose cumulative weight
    reaches half the total — e.g. the quantity-weighted median price,
    where the plain median over line items over-weights small orders.

    No global sort: this reuses the two-level distributed prefix-sum
    primitive from pareto_classes. Values collapse to integer cents
    (money-rounded once), weights aggregate per distinct cent value (a
    value-distinct-sized frame), the cents bucket by floor(log2) with a
    partitioned within-bucket running sum, and the <= 64-row
    bucket-totals self-join supplies global offsets — the ascending-
    value cumulative recovered with no unpartitioned window. The median
    row is then a 1-row filter + min-aggregate. Integer arithmetic end
    to end: both engines agree bit-for-bit.
    """
    gcols = [group_col] if group_col else []
    cents = (
        df.select(
            *gcols,
            F.round(F.col(value_col) * 100).cast("bigint").alias("_c"),
            F.col(weight_col).cast("bigint").alias("_w"),
        )
        .groupBy(*gcols, "_c")
        .agg(F.sum("_w").alias("_w"))
    )
    bucketed = cents.withColumn(
        "_bkt", F.floor(F.log2(F.greatest(F.col("_c"), F.lit(1)))).cast("int")
    )
    w = (
        Window.partitionBy(*gcols, "_bkt")
        .orderBy(F.col("_c").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bucketed.withColumn("_cum_local", F.sum("_w").over(w))
    btot = bucketed.groupBy(*gcols, "_bkt").agg(F.sum("_w").alias("_bt"))
    a = btot.alias("a")
    b = btot.alias("b")
    cond = F.col("b._bkt") < F.col("a._bkt")
    for g in gcols:
        cond = cond & (F.col(f"b.{g}") == F.col(f"a.{g}"))
    offsets = (
        a.join(F.broadcast(b), cond, "left")
        .groupBy(*[F.col(f"a.{g}").alias(g) for g in gcols],
                 F.col("a._bkt").alias("_bkt"))
        .agg(F.coalesce(F.sum("b._bt"), F.lit(0)).alias("_off"))
    )
    total = cents.groupBy(*gcols).agg(F.sum("_w").alias("_tot"))
    joined = (
        local.join(offsets, gcols + ["_bkt"])
        .join(F.broadcast(total), gcols) if gcols else
        local.join(F.broadcast(offsets), ["_bkt"]).join(F.broadcast(total))
    )
    # smallest value whose cumulative weight reaches ceil(total / 2)
    reached = joined.filter(
        (F.col("_off") + F.col("_cum_local")) * 2 >= F.col("_tot")
    )
    return (
        reached.groupBy(*gcols)
        .agg(
            (F.min("_c") / 100.0).alias("weighted_median"),
            F.max("_tot").cast("bigint").alias("total_weight"),
        )
        .orderBy(*gcols) if gcols else
        reached.agg(
            (F.min("_c") / 100.0).alias("weighted_median"),
            F.max("_tot").cast("bigint").alias("total_weight"),
        )
    )


def grouped_log_log_slope(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Per-group OLS slope of ``ln(y)`` on ``ln(x)`` with r^2 — the
    closed-form power-law regression behind price elasticity
    (d ln(qty) / d ln(price)), Kleiber-style scaling fits, and Zipf-type
    diagnostics on grouped data.

    One aggregate per group over scan-side ln transforms (rows with
    non-positive x or y are excluded scan-side — ln is undefined there);
    the five OLS moments partially combine map-side, so only
    |groups| rows cross the exchange.
    """
    x = F.log(F.col(x_col))
    y = F.log(F.col(y_col))
    base = df.filter((F.col(x_col) > 0) & (F.col(y_col) > 0)).select(
        F.col(group_col), x.alias("_x"), y.alias("_y")
    )
    n = F.count(F.lit(1)).cast("double")
    sx, sy = F.sum("_x"), F.sum("_y")
    sxx, syy, sxy = (
        F.sum(F.col("_x") * F.col("_x")),
        F.sum(F.col("_y") * F.col("_y")),
        F.sum(F.col("_x") * F.col("_y")),
    )
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    r_num = n * sxy - sx * sy
    r_den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return (
        base.groupBy(group_col)
        .agg(
            F.round(slope, round_dp).alias("slope"),
            F.round((r_num / r_den) * (r_num / r_den), round_dp).alias("r2"),
            n.cast("bigint").alias("n_points"),
        )
        .orderBy(group_col)
    )


def referential_audit(
    relations: list[tuple[str, DataFrame, str, DataFrame, str]],
    round_dp: int = 4,
) -> DataFrame:
    """Referential-integrity audit over a list of FK relationships:
    for each ``(name, child_df, child_key, parent_df, parent_key)`` emit
    one row with the child row count, the number of child rows whose key
    has no parent (orphans), and the orphan percentage — the first gate
    any warehouse-ingest pipeline runs before joining fact to dimension
    (an orphan rate regression upstream silently drops rows from every
    inner join downstream).

    Plan shape at 100 TB: the child is first aggregated to DISTINCT keys
    with their row counts (key-sized, map-side partial agg), the parent
    to its DISTINCT key set; the anti semantics are a key-on-key
    left join (null parent => orphan) over key-sized tables only — the
    full child fact table is never shuffled, and each relation reduces
    to two 1-row aggregates unioned at the end (k rows total).
    """
    outs = []
    for name, child, ckey, parent, pkey in relations:
        ck = (
            child.select(F.col(ckey).alias("_k"))
            .groupBy("_k")
            .agg(F.count(F.lit(1)).alias("_rows"))
        )
        pk = parent.select(F.col(pkey).alias("_k")).distinct()
        joined = ck.join(pk.withColumn("_hit", F.lit(1)), "_k", "left")
        outs.append(
            joined.agg(
                F.lit(name).alias("relation"),
                F.sum("_rows").cast("bigint").alias("child_rows"),
                F.coalesce(
                    F.sum(F.when(F.col("_hit").isNull(), F.col("_rows"))),
                    F.lit(0),
                ).cast("bigint").alias("orphan_rows"),
            ).select(
                "relation",
                "child_rows",
                "orphan_rows",
                F.round(
                    F.col("orphan_rows") * 100.0 / F.col("child_rows") + 1e-9,
                    round_dp,
                ).alias("orphan_pct"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.orderBy("relation")


def key_candidates(df: DataFrame, cols: list[str]) -> DataFrame:
    """Candidate-key discovery profile: for each column, row count,
    exact distinct count, null count, distinct ratio, and an
    ``is_candidate_key`` flag (distinct == rows and no nulls) — the
    schema-inference step a curation pipeline runs on an unfamiliar
    extract before choosing dedup keys and join keys.

    Plan shape at 100 TB: ONE aggregate pass over the table computes all
    columns' ``count_distinct`` together (Spark expands multi-distinct
    aggregates; for very wide tables prefer ``approx_count_distinct``
    per column in a single Expand-free pass — this exact form is the
    correctness anchor). Output is #cols rows via a literal unpivot of
    the 1-row aggregate, never a per-column rescan.
    """
    aggs = [F.count(F.lit(1)).cast("bigint").alias("_n")]
    for c in cols:
        aggs.append(F.count_distinct(F.col(c)).cast("bigint").alias(f"_d_{c}"))
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"_z_{c}")
        )
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("_n").alias("n_rows"),
                F.col(f"_d_{c}").alias("n_distinct"),
                F.col(f"_z_{c}").alias("n_nulls"),
            )
            for c in cols
        ]
    )
    e = one.select(F.explode(rows).alias("r")).select("r.*")
    return e.select(
        "column_name",
        "n_rows",
        "n_distinct",
        "n_nulls",
        F.round(F.col("n_distinct") / F.col("n_rows") + 1e-9, 6).alias(
            "distinct_ratio"
        ),
        (
            (F.col("n_distinct") == F.col("n_rows")) & (F.col("n_nulls") == 0)
        ).alias("is_candidate_key"),
    ).orderBy("column_name")


def winsorized_stats(
    df: DataFrame,
    value_col: str,
    group_col: str,
    p_lo: float = 0.05,
    p_hi: float = 0.95,
) -> DataFrame:
    """Winsorized (clipped-tail) moments per group: exact p_lo/p_hi
    percentiles, the mean/stddev AFTER clamping values into that range,
    and how many rows each tail clipped — the robust location/scale
    estimate used when raw means are hostage to a few outliers (price
    glitches, bot sessions) and you still need a differentiable, scalar
    answer (unlike the median).

    Plan shape at 100 TB: pass 1 is one percentile aggregate per group
    (group-sized result); the bounds ride back via a key-sized broadcast
    join; pass 2 is a plain clamped aggregate — two scans, zero wide
    shuffles beyond the group-by. (At extreme scale swap
    ``percentile_approx`` in for pass 1; this exact form is the anchor.)
    """
    bounds = df.groupBy(group_col).agg(
        F.percentile(value_col, F.lit(p_lo)).alias("_lo"),
        F.percentile(value_col, F.lit(p_hi)).alias("_hi"),
    )
    j = df.join(F.broadcast(bounds), group_col)
    clipped = F.least(F.greatest(F.col(value_col), F.col("_lo")), F.col("_hi"))
    return (
        j.groupBy(group_col)
        .agg(
            F.round(F.min("_lo") + 1e-9, 4).alias("p_lo"),
            F.round(F.max("_hi") + 1e-9, 4).alias("p_hi"),
            # money magnitudes: 2 dp so parallel-summation ulp drift cannot
            # flip the rounding (suite determinism convention)
            F.round(F.avg(clipped) + 1e-9, 2).alias("winsorized_mean"),
            F.round(F.stddev_samp(clipped) + 1e-9, 2).alias("winsorized_sd"),
            F.sum(F.when(F.col(value_col) < F.col("_lo"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped_low"),
            F.sum(F.when(F.col(value_col) > F.col("_hi"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped_high"),
        )
        .orderBy(group_col)
    )


def chi_square_independence(
    df: DataFrame,
    row_col: str,
    col_col: str,
    round_dp: int = 4,
) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns, with Cramér's V effect size — the drift/association check
    a feature pipeline runs between a categorical feature and a label
    (or between a dimension and an experiment arm) before trusting the
    feature.

    Plan shape at 100 TB: one contingency aggregate (r*c cells, tiny),
    then margins and the statistic are aggregates over the cell table;
    expected counts come from a cells-join-margins broadcast. The raw
    table is scanned once. The full r x c grid is materialized (margins
    cross margins, left-joined to observed cells) because EMPTY cells
    still contribute (0 - e)^2 / e to the statistic — dropping them
    understates chi2 exactly when association is strongest.
    """
    obs = df.groupBy(
        F.col(row_col).alias("_r"), F.col(col_col).alias("_c")
    ).agg(F.count(F.lit(1)).cast("double").alias("_obs"))
    rm = obs.groupBy("_r").agg(F.sum("_obs").alias("_rt"))
    cm = obs.groupBy("_c").agg(F.sum("_obs").alias("_ct"))
    tot = obs.agg(F.sum("_obs").alias("_n"))
    full = (
        rm.crossJoin(F.broadcast(cm))
        .join(obs, ["_r", "_c"], "left")
        .join(F.broadcast(tot))
        .withColumn("_o", F.coalesce("_obs", F.lit(0.0)))
    )
    e = F.col("_rt") * F.col("_ct") / F.col("_n")
    chi = ((F.col("_o") - e) * (F.col("_o") - e) / e)
    r_levels = F.count_distinct("_r")
    c_levels = F.count_distinct("_c")
    return full.agg(
        F.round(F.sum(chi) + 1e-9, round_dp).alias("chi2"),
        ((r_levels - 1) * (c_levels - 1)).cast("bigint").alias("dof"),
        F.round(
            F.sqrt(
                F.sum(chi)
                / (F.max("_n") * F.least(r_levels - 1, c_levels - 1))
            )
            + 1e-9,
            round_dp,
        ).alias("cramers_v"),
        F.max("_n").cast("bigint").alias("n_obs"),
    )


def ewma_series(
    df: DataFrame,
    time_col: str,
    value_agg: Column,
    decay: float = 0.8,
    round_dp: int = 4,
) -> DataFrame:
    """Exponentially-weighted moving average of a daily aggregate
    series, decaying by ACTUAL day distance (gaps decay more):
    ``ewma(d) = sum_{i<=d} decay^(d-i) x_i / sum decay^(d-i)`` — the
    smoothed operational health line behind alert thresholds.

    Plan shape at 100 TB: the data-sized work is the one daily
    aggregate; the frame is then #days-sized, and the EWMA is a bounded
    triangular self-join over day pairs (days^2/2 rows — thousands, not
    billions) instead of a date-ordered single-partition window, the
    audit-banned shape. Decay weights use exact integer day differences
    so both engines agree bit-for-bit.
    """
    daily = df.groupBy(
        F.to_date(F.col(time_col)).alias("_d")
    ).agg(value_agg.alias("_x"))
    a = daily.select(F.col("_d").alias("day"))
    b = daily.select(F.col("_d").alias("_bd"), F.col("_x").alias("_bx"))
    pairs = a.join(b, F.col("_bd") <= F.col("day"))
    w = F.pow(F.lit(decay), F.datediff(F.col("day"), F.col("_bd")))
    return (
        pairs.groupBy("day")
        .agg(
            F.round(F.sum(w * F.col("_bx")) / F.sum(w) + 1e-9, round_dp).alias(
                "ewma"
            ),
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        )
        .orderBy("day")
    )


def did_estimate(
    df: DataFrame,
    metric_col: str,
    treat_col,
    post_col,
    round_dp: int = 4,
) -> DataFrame:
    """Difference-in-differences estimate of a treatment effect from a
    2x2 (treatment x period) design: the four cell means, the DiD
    point estimate ``(T1-T0) - (C1-C0)``, its large-sample standard
    error ``sqrt(sum var_i/n_i)`` (independent cells), and the t
    statistic — the standard quasi-experimental readout when random
    assignment wasn't available but a parallel-trends control was.

    Scale shape: ONE aggregation pass computes (n, mean, var) for the
    4 cells map-side; everything after is arithmetic on a 4-row frame
    pivoted into one row.
    """
    treat = treat_col if isinstance(treat_col, Column) else F.col(treat_col)
    post = post_col if isinstance(post_col, Column) else F.col(post_col)
    cells = (
        df.select(
            treat.cast("int").alias("_tr"),
            post.cast("int").alias("_po"),
            F.col(metric_col).alias("_v"),
        )
        .groupBy("_tr", "_po")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.avg("_v").alias("_m"),
            F.var_samp("_v").alias("_var"),
        )
    )

    def cell(tr: int, po: int, field: str):
        return F.max(
            F.when((F.col("_tr") == tr) & (F.col("_po") == po), F.col(field))
        )

    one = cells.agg(
        *[
            cell(tr, po, f).alias(f"_{f[1:]}{tr}{po}")
            for tr in (0, 1)
            for po in (0, 1)
            for f in ("_n", "_m", "_var")
        ]
    )
    did = (F.col("_m11") - F.col("_m10")) - (F.col("_m01") - F.col("_m00"))
    se = F.sqrt(
        F.col("_var00") / F.col("_n00")
        + F.col("_var01") / F.col("_n01")
        + F.col("_var10") / F.col("_n10")
        + F.col("_var11") / F.col("_n11")
    )
    return one.select(
        F.round(F.col("_m00") + 1e-9, round_dp).alias("mean_ctrl_pre"),
        F.round(F.col("_m01") + 1e-9, round_dp).alias("mean_ctrl_post"),
        F.round(F.col("_m10") + 1e-9, round_dp).alias("mean_treat_pre"),
        F.round(F.col("_m11") + 1e-9, round_dp).alias("mean_treat_post"),
        F.round(did + 1e-9, round_dp).alias("did"),
        F.round(se + 1e-9, round_dp).alias("se"),
        F.round(did / se + 1e-9, round_dp).alias("t_stat"),
        (F.col("_n00") + F.col("_n01") + F.col("_n10") + F.col("_n11"))
        .cast("bigint")
        .alias("n_obs"),
    )


def normal_sf_twosided(z: Column) -> Column:
    """Two-sided normal p-value ``2 * (1 - Phi(|z|))`` via the
    Abramowitz & Stegun 7.1.26 erf polynomial (max abs error 1.5e-7 —
    plenty for a 4-6 dp test readout). Spelled as plain arithmetic so
    any SQL engine reproduces the identical doubles (neither Spark nor
    DuckDB exposes erf as a builtin)."""
    x = F.abs(z) / F.lit(1.4142135623730951)  # |z| / sqrt(2)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * x)
    poly = (
        F.lit(0.254829592) * t
        - F.lit(0.284496736) * t * t
        + F.lit(1.421413741) * t * t * t
        - F.lit(1.453152027) * t * t * t * t
        + F.lit(1.061405429) * t * t * t * t * t
    )
    erf = F.lit(1.0) - poly * F.exp(-x * x)
    return F.lit(2.0) * (F.lit(1.0) - (F.lit(0.5) * (F.lit(1.0) + erf)))


#: the same polynomial as a SQL fragment (for oracle twins); {z} is the
#: z-expression to plug in.
NORMAL_SF_SQL = (
    "(2.0 * (1.0 - (0.5 * (1.0 + (1.0 - "
    "(0.254829592 * (1.0 / (1.0 + 0.3275911 * (abs({z}) / 1.4142135623730951)))"
    " - 0.284496736 * power(1.0 / (1.0 + 0.3275911 * (abs({z}) / 1.4142135623730951)), 2)"
    " + 1.421413741 * power(1.0 / (1.0 + 0.3275911 * (abs({z}) / 1.4142135623730951)), 3)"
    " - 1.453152027 * power(1.0 / (1.0 + 0.3275911 * (abs({z}) / 1.4142135623730951)), 4)"
    " + 1.061405429 * power(1.0 / (1.0 + 0.3275911 * (abs({z}) / 1.4142135623730951)), 5))"
    " * exp(-(abs({z}) / 1.4142135623730951) * (abs({z}) / 1.4142135623730951)))))))"
)


def bh_fdr(
    pvals: DataFrame,
    test_col: str,
    p_col: str,
    q: float = 0.10,
    round_dp: int = 6,
) -> DataFrame:
    """Benjamini-Hochberg FDR correction over a (small) table of test
    p-values: ascending rank, the BH threshold ``rank / m * q``, and
    the step-up rejection flag (reject every test with rank <= the
    LARGEST rank whose p <= its threshold) — what turns a per-segment
    metric sweep into an honest discovery list instead of 20
    uncorrected t-tests.

    Scale shape: the input is tests-sized (one row per segment/metric
    pair — dozens), already reduced from the fact data by whatever
    test produced it; ranks come from a bounded count-of-smaller
    self-join (the audit-safe form), the cutoff is a 1-row aggregate
    broadcast back.
    """
    base = pvals.select(
        F.col(test_col).alias("test"), F.col(p_col).alias("_p")
    )
    other = base.select(
        F.col("test").alias("_jt"), F.col("_p").alias("_jp")
    )
    ranked = (
        base.join(
            other,
            (F.col("_jp") < F.col("_p"))
            | ((F.col("_jp") == F.col("_p")) & (F.col("_jt") < F.col("test"))),
            "left",
        )
        .groupBy("test", "_p")
        .agg((F.count("_jt") + 1).alias("_rank"))
    )
    m = ranked.agg(F.count(F.lit(1)).alias("_m"))
    thr = ranked.join(F.broadcast(m)).withColumn(
        "_thr", F.col("_rank") * F.lit(q) / F.col("_m")
    )
    cut = thr.agg(
        F.max(F.when(F.col("_p") <= F.col("_thr"), F.col("_rank"))).alias(
            "_kstar"
        )
    )
    return (
        thr.join(F.broadcast(cut))
        .select(
            "test",
            F.round(F.col("_p") + 1e-9, round_dp).alias("p_value"),
            F.col("_rank").cast("bigint").alias("p_rank"),
            F.round(F.col("_thr") + 1e-9, round_dp).alias("bh_threshold"),
            F.when(
                F.col("_kstar").isNotNull()
                & (F.col("_rank") <= F.col("_kstar")),
                1,
            )
            .otherwise(0)
            .cast("int")
            .alias("rejected"),
        )
        .orderBy("p_rank")
    )


def key_skew_profile(
    labeled: list[tuple[str, DataFrame, str]],
    round_dp: int = 4,
) -> DataFrame:
    """Join/shuffle skew diagnostic for candidate partition keys: for
    each ``(name, df, key_col)``, the key count, the heaviest key's row
    count and share, the p99/p50 key-size ratio, and the salt factor
    that would level the heaviest key to the median (``ceil(max/p50)``)
    — the numbers that decide between a plain shuffle join, AQE skew
    handling, and explicit salting (operators.skew) BEFORE the job
    runs, not after the 1-straggler stage.

    Plan shape at 100 TB: one key-sized count aggregate per relation
    (map-side partials), then a 1-row stats aggregate over the count
    table (exact percentiles over #keys values — at extreme key
    cardinality swap percentile_approx; this is the anchor). The fact
    table is scanned once per relation and never re-shuffled.
    """
    outs = []
    for name, df, key in labeled:
        counts = df.groupBy(F.col(key).alias("_k")).agg(
            F.count(F.lit(1)).alias("_c")
        )
        outs.append(
            counts.agg(
                F.lit(name).alias("relation"),
                F.count(F.lit(1)).cast("bigint").alias("n_keys"),
                F.sum("_c").cast("bigint").alias("n_rows"),
                F.max("_c").cast("bigint").alias("max_key_rows"),
                F.percentile("_c", F.lit(0.5)).alias("_p50"),
                F.percentile("_c", F.lit(0.99)).alias("_p99"),
            ).select(
                "relation",
                "n_keys",
                "n_rows",
                "max_key_rows",
                F.round(
                    F.col("max_key_rows") / F.col("n_rows") + 1e-9, 6
                ).alias("max_share"),
                F.round(F.col("_p99") / F.col("_p50") + 1e-9, round_dp).alias(
                    "p99_over_p50"
                ),
                F.ceil(F.col("max_key_rows") / F.col("_p50"))
                .cast("bigint")
                .alias("suggested_salt"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.orderBy("relation")


def gini_by_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    weight_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Per-group Gini coefficient of a weight distribution over keys
    (revenue over customers per nation): the classic inequality index
    ``G = 2 * sum_i(i * x_(i)) / (n * sum x) - (n + 1) / n`` with
    values ranked ascending — 0 = perfectly even, -> 1 = one key holds
    everything. The Lorenz-curve single number next to the Pareto/HHI
    views.

    Plan shape at 100 TB: one (group, key) aggregate collapses the
    fact table; the rank window is PARTITIONED by the group (ordered
    weight, key — key-parallel, never a global sort); weights are
    exact integer cents after one money rounding so ``sum(i * x_i)``
    is integer arithmetic both engines reproduce bit-for-bit.
    """
    per_key = df.groupBy(
        F.col(group_col).alias("_g"), F.col(key_col).alias("_k")
    ).agg(F.round(F.sum(weight_col) + 1e-9, 2).alias("_w"))
    cents = per_key.select(
        "_g", "_k", F.round(F.col("_w") * 100).cast("bigint").alias("_c")
    )
    w = Window.partitionBy("_g").orderBy("_c", "_k")
    ranked = cents.withColumn("_i", F.row_number().over(w))
    return (
        ranked.groupBy(F.col("_g").alias(group_col))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.round(F.sum("_c") / 100.0, 2).alias("total_weight"),
            F.round(
                2.0 * F.sum(F.col("_i") * F.col("_c"))
                / (F.count(F.lit(1)) * F.sum("_c"))
                - (F.count(F.lit(1)) + 1) / F.count(F.lit(1))
                + 1e-9,
                round_dp,
            ).alias("gini"),
        )
        .orderBy(group_col)
    )


def interarrival_cv_summary(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_cols: list[str] | None = None,
    min_gaps: int = 2,
) -> DataFrame:
    """Burstiness screen: per-key coefficient of variation of
    inter-event gaps (CV = stddev/mean over epoch-microsecond deltas;
    Poisson arrivals -> CV ~ 1, regular heartbeats -> CV ~ 0, bursty
    sessions -> CV > 1), summarized as a 1-row distribution over keys —
    the bot/heartbeat/burst triage next to per-user entropy.

    Plan shape: ONE per-key ordered lag window (PARTITIONED by the key
    — key-parallel), a per-key moments aggregate, then a 1-row summary;
    gaps are exact integer microseconds so both engines see identical
    inputs.
    """
    order_cols = order_cols or [ts_col]
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    gaps = df.select(
        F.col(key_col).alias("_k"),
        (
            F.unix_micros(F.col(ts_col))
            - F.unix_micros(F.lag(ts_col).over(w))
        ).alias("_gap"),
    ).filter(F.col("_gap").isNotNull())
    per_key = (
        gaps.groupBy("_k")
        .agg(
            F.count(F.lit(1)).alias("_ng"),
            F.avg("_gap").alias("_mean"),
            F.stddev_samp("_gap").alias("_sd"),
        )
        .filter((F.col("_ng") >= min_gaps) & (F.col("_mean") > 0))
        .select((F.col("_sd") / F.col("_mean")).alias("_cv"))
    )
    return per_key.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.round(F.avg("_cv") + 1e-9, 6).alias("avg_cv"),
        F.round(F.percentile("_cv", F.lit(0.5)) + 1e-9, 6).alias("p50_cv"),
        F.round(F.percentile("_cv", F.lit(0.9)) + 1e-9, 6).alias("p90_cv"),
        F.round(
            F.avg((F.col("_cv") > 1.0).cast("double")) + 1e-9, 6
        ).alias("frac_bursty"),
    )


def cliffs_delta(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    bucket_width: float = 16.0,
    round_dp: int = 4,
) -> DataFrame:
    """Cliff's delta rank effect size between two samples:
    ``d = P(a > b) - P(a < b)`` over all cross pairs — the
    distribution-free companion to the Welch z readout (ab_ztest):
    robust to outliers and meaningful when means lie (|d| < .147
    negligible, < .33 small, < .474 medium, else large — Romano 2006).

    Plan shape: each side collapses to distinct-(rounded-)value counts
    map-side; the cross-pair sums come from a prefix sum of the B
    counts over the shared value spine — realized with the repo's
    two-level recipe (coarse ``bucket_width`` partitions + tiny offset
    self-join), so no unpartitioned window and no pair materialization:
    the |a| x |b| pair space never exists anywhere.
    """
    v = F.round(F.col(value_col), round_dp).alias("_v")

    def counts(df: DataFrame, name: str) -> DataFrame:
        return df.select(v).groupBy("_v").agg(
            F.count(F.lit(1)).cast("bigint").alias(name)
        )
    ca = counts(a, "_ca")
    cb = counts(b, "_cb")
    dense = ca.join(cb, "_v", "full").select(
        "_v",
        F.coalesce("_ca", F.lit(0)).alias("_ca"),
        F.coalesce("_cb", F.lit(0)).alias("_cb"),
    )
    bkt = F.floor(F.col("_v") / F.lit(bucket_width)).cast("bigint")
    d = dense.withColumn("_bkt", bkt)
    w = (
        Window.partitionBy("_bkt")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = d.withColumn("_cum_b", F.sum("_cb").over(w))
    btot = d.groupBy("_bkt").agg(F.sum("_cb").alias("_bn"))
    lo, hi = btot.alias("lo"), btot.alias("hi")
    offsets = (
        hi.join(F.broadcast(lo), F.col("lo._bkt") < F.col("hi._bkt"), "left")
        .groupBy(F.col("hi._bkt").alias("_bkt"))
        .agg(F.coalesce(F.sum("lo._bn"), F.lit(0)).alias("_off"))
    )
    nb_tot = dense.agg(F.sum("_cb").alias("_nb"))
    terms = (
        local.join(F.broadcast(offsets), "_bkt")
        .join(F.broadcast(nb_tot))
        .select(
            "_ca",
            "_nb",
            (F.col("_off") + F.col("_cum_b") - F.col("_cb")).alias(
                "_b_below"
            ),
            (F.col("_nb") - F.col("_off") - F.col("_cum_b")).alias(
                "_b_above"
            ),
        )
    )
    return terms.agg(
        F.round(
            F.sum(F.col("_ca") * (F.col("_b_below") - F.col("_b_above")))
            / (F.sum("_ca") * F.max("_nb")).cast("double")
            + 1e-9,
            6,
        ).alias("cliffs_d"),
        F.sum("_ca").cast("bigint").alias("n_a"),
        F.max("_nb").cast("bigint").alias("n_b"),
    )


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    k_threshold: int = 5,
) -> DataFrame:
    """Privacy-release audit: treat ``quasi_cols`` as the
    quasi-identifier, measure each equivalence class's size k, and
    report the re-identification surface — min k, the class-size
    histogram in release-review bands (k = 1 unique, 2-4 small,
    5-19, 20+), and the fraction of ROWS living under ``k_threshold``
    (the share a k-anonymous release would have to suppress or
    generalize).

    Plan shape at 100 TB: ONE quasi-identifier-keyed count aggregate
    collapses the data (map-side partials); the banding and the 1-row
    summary are arithmetic over class counts. The histogram's bands are
    fixed so the output stays 1 row regardless of class count.
    """
    counts = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("_k")
    )
    band_1 = F.sum((F.col("_k") == 1).cast("long"))
    band_2_4 = F.sum(((F.col("_k") >= 2) & (F.col("_k") <= 4)).cast("long"))
    band_5_19 = F.sum(
        ((F.col("_k") >= 5) & (F.col("_k") <= 19)).cast("long")
    )
    band_20p = F.sum((F.col("_k") >= 20).cast("long"))
    rows_below = F.sum(
        F.when(F.col("_k") < k_threshold, F.col("_k")).otherwise(0)
    )
    return counts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum("_k").cast("bigint").alias("n_rows"),
        F.min("_k").cast("bigint").alias("min_k"),
        band_1.cast("bigint").alias("classes_k1"),
        band_2_4.cast("bigint").alias("classes_k2_4"),
        band_5_19.cast("bigint").alias("classes_k5_19"),
        band_20p.cast("bigint").alias("classes_k20_plus"),
        F.round(rows_below / F.sum("_k") + 1e-9, 6).alias(
            "frac_rows_below_k"
        ),
    )


def l_diversity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l_threshold: int = 3,
) -> DataFrame:
    """l-diversity companion to ``k_anonymity_audit``: within each
    quasi-identifier equivalence class, count DISTINCT sensitive
    values (distinct l-diversity) — a class can be large (k-anonymous)
    yet reveal the sensitive attribute outright when every member
    shares one value. Reports min l, the class share below
    ``l_threshold``, and the worst single-value dominance share
    (the homogeneity-attack surface).

    Plan shape: one (QI, sensitive) count aggregate, one QI-level
    roll-up — both map-side partially combined; 1 row out.
    """
    cell = df.groupBy(
        *[F.col(c) for c in quasi_cols], F.col(sensitive_col).alias("_s")
    ).agg(F.count(F.lit(1)).alias("_n"))
    per_class = cell.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("_l"),
        F.sum("_n").alias("_k"),
        F.max("_n").alias("_top"),
    )
    return per_class.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("_l").cast("bigint").alias("min_l"),
        F.round(
            F.avg((F.col("_l") < l_threshold).cast("double")) + 1e-9, 6
        ).alias("frac_classes_below_l"),
        F.round(F.max(F.col("_top") / F.col("_k")) + 1e-9, 6).alias(
            "max_dominance"
        ),
    )


def t_closeness_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t_threshold: float = 0.2,
) -> DataFrame:
    """t-closeness companion to the k-anonymity / l-diversity audits:
    for each quasi-identifier class, the variational distance
    ``t = 0.5 * sum_s |p_class(s) - p_global(s)|`` between the class's
    sensitive-value distribution and the global one — l-diversity can
    pass while a class's distribution still leaks (90/10 where the
    population is 50/50). Reports the worst class t and the class
    share above ``t_threshold``.

    Plan shape: one (QI, sensitive) cell aggregate; the global
    distribution is a |sensitive|-row aggregate broadcast onto the
    DENSE class x sensitive spine (classes missing a value contribute
    |0 - p_global|), then a QI roll-up — everything past the first
    aggregate is arithmetic on bounded frames.
    """
    cell = df.groupBy(
        *[F.col(c) for c in quasi_cols], F.col(sensitive_col).alias("_s")
    ).agg(F.count(F.lit(1)).alias("_n"))
    qi = [f"_q{i}" for i in range(len(quasi_cols))]
    cell = cell.select(
        *[F.col(c).alias(a) for c, a in zip(quasi_cols, qi)], "_s", "_n"
    )
    glob = cell.groupBy("_s").agg(F.sum("_n").alias("_gn"))
    tot = cell.agg(F.sum("_n").alias("_tot"))
    classes = cell.groupBy(*qi).agg(F.sum("_n").alias("_k"))
    spine = classes.crossJoin(F.broadcast(glob)).join(F.broadcast(tot))
    dense = spine.join(cell, qi + ["_s"], "left").select(
        *qi,
        "_k",
        (F.coalesce("_n", F.lit(0)) / F.col("_k")).alias("_p"),
        (F.col("_gn") / F.col("_tot")).alias("_pg"),
    )
    per_class = dense.groupBy(*qi, "_k").agg(
        (0.5 * F.sum(F.abs(F.col("_p") - F.col("_pg")))).alias("_t")
    )
    return per_class.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.round(F.max("_t") + 1e-9, 6).alias("max_t"),
        F.round(
            F.sum(F.col("_k") * F.col("_t")) / F.sum("_k") + 1e-9, 6
        ).alias("row_weighted_avg_t"),
        F.round(
            F.avg((F.col("_t") > t_threshold).cast("double")) + 1e-9, 6
        ).alias("frac_classes_above_t"),
    )


def anova_oneway(
    df: DataFrame, group_col, value_col: str, round_dp: int = 4
) -> DataFrame:
    """One-way ANOVA over the groups of ``group_col`` (a column name or
    Column expression): F statistic, degrees of freedom, and eta-squared
    effect size — the "does the mean differ across buckets?" screen
    (hour-of-day seasonality, source quality tiers, experiment arms with
    k > 2 where the pairwise z-test doesn't apply).

    Everything reduces to per-group (n, sum, sum of squares): SSB =
    sum(S_h^2/n_h) - S^2/N, SSW = sum(Q_h - S_h^2/n_h), F =
    (SSB/(k-1))/(SSW/(N-k)). One partially-combined aggregate to the
    #groups frame, then a 1-row fold — the fact table is scanned once,
    no windows.
    """
    g = F.col(group_col) if isinstance(group_col, str) else group_col
    per = (
        df.select(g.alias("_g"), F.col(value_col).cast("double").alias("_v"))
        .groupBy("_g")
        .agg(
            F.count(F.lit(1)).cast("double").alias("_n"),
            F.sum("_v").alias("_s"),
            F.sum(F.col("_v") * F.col("_v")).alias("_q"),
        )
    )
    ssb_term = F.col("_s") * F.col("_s") / F.col("_n")
    folded = per.agg(
        F.count(F.lit(1)).cast("double").alias("_k"),
        F.sum("_n").alias("_nn"),
        F.sum("_s").alias("_ss"),
        F.sum(ssb_term).alias("_sb"),
        F.sum(F.col("_q") - ssb_term).alias("_ssw"),
    )
    ssb = F.col("_sb") - F.col("_ss") * F.col("_ss") / F.col("_nn")
    df1 = F.col("_k") - 1
    df2 = F.col("_nn") - F.col("_k")
    return folded.select(
        df1.cast("bigint").alias("df_between"),
        df2.cast("bigint").alias("df_within"),
        F.round((ssb / df1) / (F.col("_ssw") / df2), round_dp).alias("f_stat"),
        F.round(ssb / (ssb + F.col("_ssw")), 6).alias("eta_squared"),
    )


def runs_test(
    df: DataFrame,
    ts_col: str,
    value_cents_expr,
    round_dp: int = 4,
) -> DataFrame:
    """Wald–Wolfowitz runs test on the daily series: is the sequence of
    above/below-mean days random, or does it trend / mean-revert? Returns
    one row (n_days, n_above, n_below, runs, exp_runs, z) — |z| > 1.96
    rejects randomness (z < 0: fewer runs than chance = trending; z > 0:
    more = oscillating).

    Exactness: the above/below split compares ``k * cents_d > total``
    on BIGINTs (``value_cents_expr`` must produce an integer-cent value),
    so no float accumulation order can flip a day's side between engines;
    the only doubles are the final expectation/variance formulas.

    Scale shape: one data-sized aggregate to the #days frame; the
    successor day comes from a bounded triangular self-join over days
    (the level_shift_locate / ewma family pattern — chosen over the
    audit-banned date-ordered global window); run boundaries are then a
    single count over the (day, next-day) sign pairs.
    """
    daily = (
        df.groupBy(F.date_trunc("day", F.col(ts_col)).cast("date").alias("d"))
        .agg(value_cents_expr.cast("bigint").alias("cents"))
    )
    tot = daily.agg(
        F.sum("cents").cast("bigint").alias("t_total"),
        F.count(F.lit(1)).cast("bigint").alias("k_days"),
    )
    signs = daily.join(F.broadcast(tot)).select(
        "d",
        (F.col("k_days") * F.col("cents") > F.col("t_total")).alias("above"),
    )
    nxt = (
        signs.alias("a")
        .join(
            F.broadcast(signs.select(F.col("d").alias("_d2"))),
            F.col("_d2") > F.col("a.d"),
        )
        .groupBy("a.d")
        .agg(F.min("_d2").alias("next_d"))
    )
    chg = (
        nxt.join(signs.select("d", "above"), "d")
        .join(
            signs.select(
                F.col("d").alias("next_d"), F.col("above").alias("next_above")
            ),
            "next_d",
        )
        .agg(
            F.sum(
                F.when(F.col("above") != F.col("next_above"), 1).otherwise(0)
            ).cast("bigint").alias("changes")
        )
    )
    counts = signs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(F.col("above").cast("int")).cast("bigint").alias("n_above"),
        F.sum((~F.col("above")).cast("int")).cast("bigint").alias("n_below"),
    )
    j = counts.join(F.broadcast(chg))
    n = F.col("n_days").cast("double")
    n1 = F.col("n_above").cast("double")
    n2 = F.col("n_below").cast("double")
    runs = (F.col("changes") + 1).cast("bigint")
    exp_runs = F.lit(1.0) + 2.0 * n1 * n2 / n
    var = (2.0 * n1 * n2 * (2.0 * n1 * n2 - n)) / (n * n * (n - 1.0))
    return j.select(
        "n_days",
        "n_above",
        "n_below",
        runs.alias("runs"),
        F.round(exp_runs + 1e-9, round_dp).alias("exp_runs"),
        # + 0.0: signed-zero convention (z is signed, can round to -0.0)
        (F.round((runs - exp_runs) / F.sqrt(var) + 1e-9, round_dp) + 0.0).alias("z"),
    )


def column_entropy(
    df: DataFrame, cols: list[str], round_dp: int = 6
) -> DataFrame:
    """Data-profiling primitive: Shannon entropy (nats) and distinct count
    of each listed categorical column — the one-number uniformity screen
    (near-zero = constant column, ln(k) = uniform over k values) used to
    rank candidate stratification/partition keys.

    Shape: one value-count aggregate per column over the same scan
    (Catalyst shares it), each collapsing map-side to |domain| rows, then
    a 1-row entropy aggregate per column, unioned. NULLs count as a
    value (a mostly-NULL column is informative).
    """
    outs = []
    for c in cols:
        vc = df.groupBy(F.coalesce(F.col(c).cast("string"), F.lit("<NULL>")).alias("_v")).agg(
            F.count(F.lit(1)).cast("bigint").alias("_n")
        )
        outs.append(
            vc.agg(
                F.lit(c).alias("column"),
                F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
                F.sum("_n").cast("bigint").alias("n_rows"),
                F.round(
                    F.log(F.sum("_n"))
                    - F.sum(F.col("_n") * F.log("_n")) / F.sum("_n")
                    + 1e-9,
                    round_dp,
                ).alias("entropy_nats"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.orderBy("column")


def fd_candidates(
    df: DataFrame, cols: list[str]
) -> DataFrame:
    """Functional-dependency screen over a column list: for every ordered
    pair (a, b), ``a -> b`` holds iff the distinct count of a equals the
    distinct count of (a, b) — the schema-discovery primitive behind key
    detection, normalization advice, and join-safety checks.

    Shape — PER-DETERMINANT aggregation (r9, replacing the 1-row
    multi-count-distinct): |distinct(a, b)| = sum over a's groups of
    |distinct b within the group|, so one groupBy(a) computes a's
    distinct count (row count of the grouped frame) AND all k-1 of its
    pair counts. k slim aggregates with an Expand factor of k-1 each,
    vs the old single aggregate whose k*(k-1)+k distinct aggregates
    made Catalyst expand the scan k^2-fold — measured 4.3 s -> 2.8 s at
    sf1 warm (the k branches also run as independent parallel jobs at
    cluster scale). Map-side partial distinct still collapses each
    branch before its exchange; no per-pair scans, no driver loops.

    NULL semantics: every grouping key and count-distinct is taken over
    a STRUCT wrapper, so NULL counts as a value on both the
    single-column and the pair side (a bare countDistinct(a, b)
    silently drops any row where either column is NULL while
    countDistinct(a) only drops NULL a — divergent fd verdicts on
    nullable columns). The oracle mirrors this with
    COUNT(DISTINCT ROW(a)) / COUNT(DISTINCT (a, b)).
    """
    outs = []
    for a in cols:
        others = [b for b in cols if b != a]
        per_a = df.groupBy(F.struct(F.col(a)).alias("_k")).agg(
            *[
                F.countDistinct(F.struct(F.col(b)))
                .cast("bigint")
                .alias(f"_db_{b}")
                for b in others
            ]
        )
        one = per_a.agg(
            F.count(F.lit(1)).cast("bigint").alias("_nd"),
            *[F.sum(f"_db_{b}").cast("bigint").alias(f"_dp_{b}") for b in others],
        )
        rows = F.array(
            *[
                F.struct(
                    F.lit(a).alias("det"),
                    F.lit(b).alias("dep"),
                    F.col("_nd").alias("nd_det"),
                    F.col(f"_dp_{b}").alias("nd_pair"),
                )
                for b in others
            ]
        )
        outs.append(
            one.select(F.explode(rows).alias("r")).select(
                "r.det", "r.dep", "r.nd_det", "r.nd_pair"
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.select(
        "det",
        "dep",
        "nd_det",
        "nd_pair",
        (F.col("nd_det") == F.col("nd_pair")).alias("fd_holds"),
    ).orderBy("det", "dep")


def welch_ttest_onevsrest(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_dp: int = 4,
) -> DataFrame:
    """Welch's unequal-variance t-test of each group's mean against the rest
    of the population — the per-segment "is this slice different?" screen
    (the df-corrected upgrade of the z-test family; honest when segment
    variances differ).

    Shape: one group aggregate (n, sum, sum-of-squares per group) plus a
    1-row broadcast of the grand totals; the complement's moments are
    derived by subtraction, so the data is scanned ONCE for all groups.
    t and the Welch–Satterthwaite df are closed-form floats, rounded.

    Drift-proofing: the per-group sums s and q are computed on values
    scaled to EXACT integers (round(value * 1e6), summed in
    DECIMAL(38,0)), so the partial-aggregation order chosen by the
    engine cannot move the doubles feeding the final ROUND by even one
    ulp — any engine/partition layout reproduces the same bits. The
    closed forms switch to double only at the final projection, from
    those exact integer sums. Values up to ~|3e9| stay exact (iv fits
    int64; iv*iv is formed in decimal).
    """
    iv = F.round(F.col(value_col).cast("double") * 1e6).cast("bigint")
    ivd = iv.cast("decimal(38,0)")
    g = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(ivd).alias("sc"),
        F.sum(ivd * iv).alias("qc"),
    )
    tot = g.agg(
        F.sum("n").cast("bigint").alias("tn"),
        F.sum("sc").alias("tsc"),
        F.sum("qc").alias("tqc"),
    )
    j = g.join(F.broadcast(tot))
    # exact-integer sums -> doubles; identical op sequence in the oracle
    s = F.col("sc").cast("double") / 1e6
    q = F.col("qc").cast("double") / 1e12
    ts = F.col("tsc").cast("double") / 1e6
    tq = F.col("tqc").cast("double") / 1e12
    n1 = F.col("n").cast("double")
    n2 = (F.col("tn") - F.col("n")).cast("double")
    m1 = s / n1
    m2 = (ts - s) / n2
    v1 = (q - s * s / n1) / (n1 - 1)
    v2 = ((tq - q) - (ts - s) * (ts - s) / n2) / (n2 - 1)
    se2 = v1 / n1 + v2 / n2
    t = (m1 - m2) / F.sqrt(se2)
    dof = (se2 * se2) / (
        (v1 / n1) * (v1 / n1) / (n1 - 1) + (v2 / n2) * (v2 / n2) / (n2 - 1)
    )
    ok = (F.col("n") >= 2) & (F.col("tn") - F.col("n") >= 2)
    return j.select(
        F.col("grp").alias(group_col),
        F.col("n"),
        F.round(m1 + 1e-9, round_dp).alias("mean_grp"),
        F.round(m2 + 1e-9, round_dp).alias("mean_rest"),
        # + 0.0 after the ROUND: a tiny-negative t rounds to a zero whose
        # SIGN the engines disagree on (DuckDB ROUND -> -0.0, Spark's
        # BigDecimal round -> +0.0); IEEE -0.0 + 0.0 = +0.0 in both.
        (F.round(F.when(ok, t) + 1e-9, round_dp) + 0.0).alias("t_stat"),
        (F.round(F.when(ok, dof) + 1e-9, round_dp) + 0.0).alias("welch_df"),
    ).orderBy(group_col)


def median_of_means(
    df: DataFrame,
    value_col: str,
    key_col: str,
    n_buckets: int = 16,
    round_dp: int = 4,
) -> DataFrame:
    """Median-of-means robust mean estimator: hash rows into ``n_buckets``
    deterministic buckets (portable md5 of the key), average each bucket,
    take the DISCRETE median of the bucket means — the
    heavy-tail-resistant estimator (sub-Gaussian concentration even when
    the variance is infinite) a monitor prefers over the raw mean when a
    few corrupt rows can drag it.

    Returns one row: n, plain mean, median-of-means, both rounded — the
    gap between them is itself the outlier alarm.

    Shape: one bucket aggregate (map-side combine to n_buckets rows), the
    median via sort_array over the n_buckets-element list — never a
    global sort of the data.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    b = (
        F.conv(
            F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
        ).cast("bigint")
        % n_buckets
    )
    v = F.col(value_col).cast("double")
    per = df.groupBy(b.alias("_b")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum(v).alias("_s"),
    )
    agg = per.agg(
        F.sum("_n").cast("bigint").alias("n"),
        (F.sum("_s") / F.sum("_n")).alias("_mean"),
        F.sort_array(F.collect_list(F.col("_s") / F.col("_n"))).alias("_ms"),
    )
    idx = F.ceil(F.lit(0.5) * F.size("_ms")).cast("int")
    return agg.select(
        "n",
        F.round(F.col("_mean") + 1e-9, round_dp).alias("mean"),
        F.round(F.element_at("_ms", idx) + 1e-9, round_dp).alias(
            "median_of_means"
        ),
    )


def _prefix_sum_on_spine(
    df: DataFrame,
    value_col: str,
    sum_col: str,
    out_col: str,
    part_cols: list[str] | None = None,
    bucket_width: int = 64,
) -> DataFrame:
    """INCLUSIVE prefix sum of ``sum_col`` over rows ordered by
    ``value_col`` (within ``part_cols`` if given) — the repo's two-level
    recipe instead of a banned global ordered window: (1) coarse buckets
    by floor(value / width); (2) one PARTITIONED window inside each
    bucket; (3) a tiny bucket-totals frame joined triangularly (bounded
    by #buckets) supplies each bucket's offset. Adds ``out_col``;
    preserves all input columns.
    """
    parts = list(part_cols or [])
    d = df.withColumn(
        "_psbkt", F.floor(F.col(value_col) / F.lit(bucket_width)).cast("bigint")
    )
    w = (
        Window.partitionBy(*(parts + ["_psbkt"]))
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = d.withColumn("_pslocal", F.sum(sum_col).over(w))
    btot = d.groupBy(*(parts + ["_psbkt"])).agg(
        F.sum(sum_col).alias("_psbn")
    )
    lo, hi = btot.alias("lo"), btot.alias("hi")
    cond = F.col("lo._psbkt") < F.col("hi._psbkt")
    for p in parts:
        cond = cond & (F.col(f"lo.{p}") == F.col(f"hi.{p}"))
    offsets = (
        hi.join(F.broadcast(lo), cond, "left")
        .groupBy(
            *[F.col(f"hi.{p}").alias(p) for p in parts],
            F.col("hi._psbkt").alias("_psbkt"),
        )
        .agg(F.coalesce(F.sum("lo._psbn"), F.lit(0)).alias("_psoff"))
    )
    return (
        local.join(F.broadcast(offsets), parts + ["_psbkt"])
        .withColumn(out_col, F.col("_psoff") + F.col("_pslocal"))
        .drop("_psbkt", "_pslocal", "_psoff")
    )


def wasserstein_pairwise(
    df: DataFrame,
    group_col: str,
    value_col: str,
    bucket_width: int = 64,
    round_dp: int = 6,
) -> DataFrame:
    """Exact 1-Wasserstein (earth-mover) distance between every pair of
    groups' empirical distributions of an INTEGER-valued column — the
    drift metric that, unlike KS/PSI, weighs HOW FAR mass moved, not
    just whether it moved (the source-mixture monitor for corpus
    curation: 'did src3's length distribution drift, and by how many
    characters?').

    W1(a, b) = sum over the shared value grid of |F_a(v) - F_b(v)| *
    (next_v - v). Everything before the final division is EXACT integer
    arithmetic: |cum_a * n_b - cum_b * n_a| * gap summed in
    DECIMAL(38,0), then one double division by n_a * n_b — so any
    engine/partition layout reproduces the rounding bit-for-bit (the
    welch lesson, applied from birth).

    Plan: per-(group, value) counts collapse map-side; the value grid is
    densified per group (a #groups-bounded spine cross, adjudicated);
    cumulative counts use the two-level prefix-sum recipe (no global
    window); pairs join on the grid value (equi) and aggregate — the
    |a| x |b| pair space never materializes.
    """
    c = df.groupBy(
        F.col(group_col).alias("_g"),
        F.col(value_col).cast("bigint").alias("_v"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    grid = c.select("_v").distinct()
    # next grid value: two-level lead (within-bucket lead + next bucket's
    # min stitched from the tiny bucket frame)
    g = grid.withColumn(
        "_bkt", F.floor(F.col("_v") / F.lit(bucket_width)).cast("bigint")
    )
    wl = Window.partitionBy("_bkt").orderBy("_v")
    g = g.withColumn("_lead_in", F.lead("_v").over(wl))
    bmin = g.groupBy("_bkt").agg(F.min("_v").alias("_bminv"))
    nb, cur = bmin.alias("nb"), bmin.alias("cur")
    nxt = (
        cur.join(F.broadcast(nb), F.col("nb._bkt") > F.col("cur._bkt"), "left")
        .groupBy(F.col("cur._bkt").alias("_bkt"))
        .agg(F.min("nb._bminv").alias("_nextbmin"))
    )
    grid_gap = (
        g.join(F.broadcast(nxt), "_bkt")
        .select(
            "_v",
            (
                F.coalesce(F.col("_lead_in"), F.col("_nextbmin"), F.col("_v"))
                - F.col("_v")
            ).alias("_gap"),
        )
    )
    groups = c.select("_g").distinct()
    dense = (
        groups.join(grid_gap)  # #groups-bounded spine cross (adjudicated)
        .join(c, ["_g", "_v"], "left")
        .select(
            "_g", "_v", "_gap", F.coalesce("_n", F.lit(0)).alias("_n")
        )
    )
    cum = _prefix_sum_on_spine(
        dense, "_v", "_n", "_cum", part_cols=["_g"], bucket_width=bucket_width
    )
    tot = c.groupBy("_g").agg(F.sum("_n").cast("bigint").alias("_tot"))
    a = cum.join(tot, "_g").select(
        F.col("_g").alias("_ga"),
        "_v",
        "_gap",
        F.col("_cum").alias("_cuma"),
        F.col("_tot").alias("_na"),
    )
    b = cum.join(tot, "_g").select(
        F.col("_g").alias("_gb"),
        F.col("_v").alias("_vb"),
        F.col("_cum").alias("_cumb"),
        F.col("_tot").alias("_nb"),
    )
    pairs = a.join(
        b, (F.col("_v") == F.col("_vb")) & (F.col("_ga") < F.col("_gb"))
    )
    term = (
        F.abs(
            F.col("_cuma").cast("decimal(38,0)") * F.col("_nb")
            - F.col("_cumb").cast("decimal(38,0)") * F.col("_na")
        )
        * F.col("_gap")
    )
    return (
        pairs.groupBy(
            F.col("_ga").alias("grp_a"), F.col("_gb").alias("grp_b")
        )
        .agg(
            F.max("_na").cast("bigint").alias("n_a"),
            F.max("_nb").cast("bigint").alias("n_b"),
            F.round(
                F.sum(term).cast("double")
                / (F.max("_na") * F.max("_nb")).cast("double")
                + 1e-9,
                round_dp,
            ).alias("w1"),
        )
        .orderBy("grp_a", "grp_b")
    )


def mannwhitney_onevsrest(
    df: DataFrame,
    group_col: str,
    value_col: str,
    scale: int = 100,
    bucket_width: int = 4096,
    round_dp: int = 4,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) of each group against the rest —
    the distribution-free sibling of welch_ttest_onevsrest: honest under
    skew and outliers where the t-test's mean/variance lie. Reports the
    tie-corrected normal z and the rank-biserial effect size
    ``r = 2U/(n1*n2) - 1``.

    Exactness: values quantize once to integers (round(value * scale));
    U is assembled from per-value counts as 2U (an exact integer:
    ``sum_v 2*c_g(v)*rest_below(v) + c_g(v)*rest_tied(v)``) summed in
    DECIMAL(38,0); the tie term ``sum(t^3 - t)`` likewise. Only the
    final z/r are doubles — bit-stable under any partition layout.

    Plan: per-(group, value) counts collapse map-side; ONE two-level
    prefix sum over the global value spine gives every group its
    below-counts by subtraction (cum_total - cum_own); no global window,
    no pair materialization, one 1-row grand-total broadcast.
    """
    iv = F.round(F.col(value_col).cast("double") * scale).cast("bigint")
    cg = df.groupBy(
        F.col(group_col).alias("_g"), iv.alias("_v")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("_cg"))
    ct = cg.groupBy("_v").agg(F.sum("_cg").cast("bigint").alias("_ct"))
    ct_cum = _prefix_sum_on_spine(
        ct, "_v", "_ct", "_cumt", bucket_width=bucket_width
    )
    cg_cum = _prefix_sum_on_spine(
        cg, "_v", "_cg", "_cumg", part_cols=["_g"], bucket_width=bucket_width
    )
    j = cg_cum.join(ct_cum, "_v")
    # rest strictly below v, and rest tied at v (exact integers)
    rest_below = (F.col("_cumt") - F.col("_ct")) - (
        F.col("_cumg") - F.col("_cg")
    )
    rest_tied = F.col("_ct") - F.col("_cg")
    per_g = j.groupBy("_g").agg(
        F.sum("_cg").cast("bigint").alias("_n1"),
        F.sum(
            (
                F.lit(2) * F.col("_cg").cast("decimal(38,0)") * rest_below
                + F.col("_cg").cast("decimal(38,0)") * rest_tied
            )
        ).alias("_u2"),
    )
    ties = ct.agg(
        F.sum(
            F.col("_ct").cast("decimal(38,0)") * F.col("_ct") * F.col("_ct")
            - F.col("_ct")
        ).alias("_t3t"),
        F.sum("_ct").cast("bigint").alias("_nn"),
    )
    out = per_g.join(F.broadcast(ties))
    n1 = F.col("_n1").cast("double")
    n2 = (F.col("_nn") - F.col("_n1")).cast("double")
    nn = F.col("_nn").cast("double")
    u = F.col("_u2").cast("double") / 2.0
    mu = n1 * n2 / 2.0
    tie_adj = F.col("_t3t").cast("double") / (nn * (nn - 1.0))
    sigma = F.sqrt(n1 * n2 / 12.0 * ((nn + 1.0) - tie_adj))
    ok = (F.col("_n1") >= 1) & (F.col("_nn") - F.col("_n1") >= 1) & (sigma > 0)
    return out.select(
        F.col("_g").alias(group_col),
        F.col("_n1").alias("n"),
        F.round(u + 1e-9, 2).alias("u_stat"),
        # + 0.0: signed-zero convention (z / rank-biserial straddle zero)
        (F.round(F.when(ok, (u - mu) / sigma) + 1e-9, round_dp) + 0.0).alias("z"),
        (
            F.round(F.when(ok, 2.0 * u / (n1 * n2) - 1.0) + 1e-9, round_dp) + 0.0
        ).alias("rank_biserial"),
    ).orderBy(group_col)


def spearman_by_group(
    df: DataFrame,
    group_col: str,
    x_col,
    y_col,
    x_bucket: int = 16,
    y_bucket: int = 1 << 20,
    round_dp: int = 6,
) -> DataFrame:
    """Spearman rank correlation of two INTEGER-valued columns within each
    group — Pearson on midranks, the monotone-association readout that
    survives outliers and nonlinearity (quantity vs price: is bigger
    really dearer, per return-status slice?).

    Exactness: midranks come from per-value counts as 2R = 2*below + t + 1
    (exact integers; the doubled form keeps tie-midpoints integral), the
    five correlation moments are DECIMAL(38,0) sums of integer products,
    and the closed form switches to double once at the end — the doubled
    factors cancel algebraically, so the output IS Spearman's rho.

    Plan: the (group, x, y) cell frame collapses map-side; each
    marginal's midranks come from a two-level prefix sum partitioned by
    group (no global window); two hash joins attach ranks back to cells.
    """
    xc = F.col(x_col) if isinstance(x_col, str) else x_col
    yc = F.col(y_col) if isinstance(y_col, str) else y_col
    cells = df.groupBy(
        F.col(group_col).alias("_g"),
        xc.cast("bigint").alias("_x"),
        yc.cast("bigint").alias("_y"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("_n"))

    def midranks(col: str, bucket: int, out: str) -> DataFrame:
        marg = cells.groupBy("_g", col).agg(F.sum("_n").alias("_mn"))
        cum = _prefix_sum_on_spine(
            marg, col, "_mn", "_mcum", part_cols=["_g"], bucket_width=bucket
        )
        return cum.select(
            "_g",
            col,
            (
                F.lit(2) * (F.col("_mcum") - F.col("_mn"))
                + F.col("_mn")
                + F.lit(1)
            ).alias(out),
        )

    rx = midranks("_x", x_bucket, "_r2x")
    ry = midranks("_y", y_bucket, "_r2y")
    ranked = cells.join(rx, ["_g", "_x"]).join(ry, ["_g", "_y"])
    nd = F.col("_n").cast("decimal(38,0)")
    agg = ranked.groupBy("_g").agg(
        F.sum("_n").cast("bigint").alias("n"),
        F.sum(nd * F.col("_r2x")).alias("_sx"),
        F.sum(nd * F.col("_r2y")).alias("_sy"),
        F.sum(nd * F.col("_r2x") * F.col("_r2x")).alias("_sxx"),
        F.sum(nd * F.col("_r2y") * F.col("_r2y")).alias("_syy"),
        F.sum(nd * F.col("_r2x") * F.col("_r2y")).alias("_sxy"),
    )
    nn = F.col("n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    num = nn * F.col("_sxy").cast("double") - sx * sy
    den = F.sqrt(
        (nn * F.col("_sxx").cast("double") - sx * sx)
        * (nn * F.col("_syy").cast("double") - sy * sy)
    )
    return agg.select(
        F.col("_g").alias(group_col),
        "n",
        # + 0.0: signed-zero convention — rho near 0 can round to a zero
        # whose sign DuckDB and Spark disagree on (the welch lesson)
        (
            F.round(
                F.when(den > 0, num / den).otherwise(F.lit(None)) + 1e-9, round_dp
            )
            + 0.0
        ).alias("spearman_rho"),
    ).orderBy(group_col)


def kendall_tau_by_group(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Exact Kendall's tau-b of two INTEGER-VALUED columns within each
    group — the rank-stats family's missing member next to
    :func:`spearman_by_group` and :func:`mannwhitney_onevsrest`: unlike
    Spearman it counts pairwise order agreements directly, so it is the
    statistic of record for small-grid ordinal data (ratings, bucketed
    scores) where Spearman's midranks wash out.

    Scale shape — the contingency-grid trick instead of the O(n log n)
    merge-sort inversion count (which needs a global sort, the
    audit-banned shape): collapse the data ONCE to per-(group, x, y)
    cell counts (map-side combine; cells are bounded by the value GRID,
    not the row count — quantity 1..50 x discount 0..10 is 550 cells per
    group at ANY data scale), then classify every unordered cell pair
    with one group-keyed equi-join over the tiny cell frame:

      concordant   (x_a - x_b)(y_a - y_b) > 0  ->  C += n_a * n_b
      discordant   (x_a - x_b)(y_a - y_b) < 0  ->  D += n_a * n_b
      x-tie / y-tie pairs feed the tau-b denominator corrections.

    Exactness (the welch lesson, applied from birth): C, D and the tie
    terms are pure integer counts summed in DECIMAL(38,0) (pair counts
    reach n^2/2, past int64 at corpus scale), so every engine and
    partition layout produces identical integers; tau-b goes double only
    in the final closed form, and the ROUND output carries the `+ 0.0`
    signed-zero convention (tau straddles zero).

    tau_b = (C - D) / sqrt((n0 - n1) * (n0 - n2)), with n0 = n(n-1)/2,
    n1 = sum_x t_x(t_x-1)/2, n2 = sum_y u_y(u_y-1)/2.

    The reference has no rank-correlation surface (SQLiteDataFrame.swift
    delegates all analytics to SQLite, which ships neither corr nor
    tau); Tier-D extension.
    """
    cells = (
        df.groupBy(
            F.col(group_col).alias("_g"),
            F.col(x_col).cast("bigint").alias("_x"),
            F.col(y_col).cast("bigint").alias("_y"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    )
    a, b = cells.alias("a"), cells.alias("b")
    # unordered cell pairs, lexicographic (x, y) guard so each pair counts
    # once; the join key is the GROUP (equi/hash join) and the pair space
    # is grid^2 per group — input-size-independent
    pair_lex = (F.col("a._x") < F.col("b._x")) | (
        (F.col("a._x") == F.col("b._x")) & (F.col("a._y") < F.col("b._y"))
    )
    prod = (F.col("a._n").cast("decimal(38,0)") * F.col("b._n")).cast(
        "decimal(38,0)"
    )
    sgn = (F.col("a._x") - F.col("b._x")) * (F.col("a._y") - F.col("b._y"))
    pairs = (
        a.join(b, F.col("a._g") == F.col("b._g"))
        .filter(pair_lex)
        .groupBy(F.col("a._g").alias("_g"))
        .agg(
            F.sum(F.when(sgn > 0, prod).otherwise(F.lit(0).cast("decimal(38,0)"))).alias("_c"),
            F.sum(F.when(sgn < 0, prod).otherwise(F.lit(0).cast("decimal(38,0)"))).alias("_d"),
        )
    )
    dec2 = lambda c: (c.cast("decimal(38,0)") * (c - 1) / 2).cast("decimal(38,0)")  # noqa: E731
    n_tot = cells.groupBy("_g").agg(F.sum("_n").cast("bigint").alias("_nn"))
    tx = (
        cells.groupBy("_g", "_x")
        .agg(F.sum("_n").cast("bigint").alias("_t"))
        .groupBy("_g")
        .agg(F.sum(dec2(F.col("_t"))).alias("_n1"))
    )
    uy = (
        cells.groupBy("_g", "_y")
        .agg(F.sum("_n").cast("bigint").alias("_u"))
        .groupBy("_g")
        .agg(F.sum(dec2(F.col("_u"))).alias("_n2"))
    )
    j = (
        n_tot.join(pairs, "_g", "left")
        .join(tx, "_g")
        .join(uy, "_g")
        .na.fill(0, ["_c", "_d"])
    )
    n0 = (
        F.col("_nn").cast("decimal(38,0)") * (F.col("_nn") - 1) / 2
    ).cast("decimal(38,0)")
    den = F.sqrt(
        (n0 - F.col("_n1")).cast("double") * (n0 - F.col("_n2")).cast("double")
    )
    num = (F.col("_c") - F.col("_d")).cast("double")
    return j.select(
        F.col("_g").alias(group_col),
        F.col("_nn").alias("n"),
        # internal sums are decimal(38,0) (pair counts pass int64 at corpus
        # scale); the OUTPUT casts to bigint so both engines hash the same
        # integer rendering — n(n-1)/2 < 2^63 up to ~4e9 rows per group
        (F.col("_c") - F.col("_d")).cast("bigint").alias("c_minus_d"),
        # + 0.0: signed-zero convention (tau straddles zero)
        (F.round(F.when(den > 0, num / den) + 1e-9, round_dp) + 0.0).alias(
            "tau_b"
        ),
    ).orderBy(group_col)


def inclusion_deps(
    pairs: list[tuple[str, DataFrame, str, DataFrame, str]],
    round_dp: int = 6,
) -> DataFrame:
    """Inclusion-dependency screen across tables: for each candidate
    (src.col ⊆ dst.col), the distinct non-NULL source values, how many
    are contained in the destination, and whether the dependency HOLDS —
    foreign-key discovery, referential-integrity audit, and join-safety
    advice in one table (:func:`fd_candidates`' cross-table sibling in
    the schema-discovery family).

    ``pairs`` is a list of (label, src_df, src_col, dst_df, dst_col).

    Shape per pair: the source side collapses to its DISTINCT values
    first (map-side combine — the shuffle carries distinct keys, never
    rows), the destination side likewise, and containment is one
    LEFT ANTI hash join between the two distinct sets; the per-pair
    verdict is a cross of two 1-row aggregates (adjudicated benign).
    At 100 TB each pair costs two distinct-aggregations and one
    key-sized join — nothing row-sized survives the first exchange.
    NULLs are excluded on both sides (the standard IND convention:
    a NULL fk asserts nothing).
    """
    outs = []
    for label, src, sc, dst, dc in pairs:
        fk = (
            src.select(F.col(sc).alias("_v"))
            .filter(F.col("_v").isNotNull())
            .distinct()
        )
        pk = (
            dst.select(F.col(dc).alias("_v"))
            .filter(F.col("_v").isNotNull())
            .distinct()
        )
        n_missing = fk.join(pk, "_v", "left_anti").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_missing")
        )
        n_distinct = fk.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_distinct")
        )
        outs.append(
            n_distinct.join(n_missing).select(
                F.lit(label).alias("dependency"),
                "n_distinct",
                (F.col("n_distinct") - F.col("n_missing"))
                .cast("bigint")
                .alias("n_contained"),
                F.round(
                    (F.col("n_distinct") - F.col("n_missing"))
                    / F.col("n_distinct")
                    + 1e-9,
                    round_dp,
                ).alias("containment"),
                (F.col("n_missing") == 0).alias("holds"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.orderBy("dependency")


def poisson_rate_shift(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    round_dp: int = 4,
) -> DataFrame:
    """Two-Poisson rate-shift test per group: split the observation
    window at its midpoint and test whether each group's event RATE
    changed between the halves — the conditional test (Przyborowski &
    Wilenski): under H0, n_first | total ~ Binomial(total, 1/2), so
    z = (n_first - n_second) / sqrt(n_first + n_second). The volume
    monitor that catches a feed going quiet or doubling, per segment,
    without any distributional assumption on values.

    Exactness: the midpoint is INTEGER epoch-microsecond arithmetic
    (lo + (hi - lo) / 2 floored) computed once from one min/max
    aggregate and broadcast; the halves are integer counts; z and the
    rate ratio go double only in the final projection. z carries the
    `+ 0.0` signed-zero convention.

    Plan: two aggregates (1-row bounds, then per-group conditional
    counts off one scan), one broadcast join — no window, no shuffle
    beyond the group-by exchange.
    """
    us = F.unix_micros(F.col(ts_col))
    bounds = df.agg(
        F.min(us).alias("_lo"), F.max(us).alias("_hi")
    ).select(
        (F.col("_lo") + F.floor((F.col("_hi") - F.col("_lo")) / 2)).alias("_mid")
    )
    counted = (
        df.join(F.broadcast(bounds))
        .groupBy(F.col(group_col).alias("_g"))
        .agg(
            F.sum((us < F.col("_mid")).cast("int")).cast("bigint").alias("n_first"),
            F.sum((us >= F.col("_mid")).cast("int")).cast("bigint").alias("n_second"),
        )
    )
    n1 = F.col("n_first").cast("double")
    n2 = F.col("n_second").cast("double")
    ok = (F.col("n_first") + F.col("n_second")) > 0
    return counted.select(
        F.col("_g").alias(group_col),
        "n_first",
        "n_second",
        F.round(F.when(F.col("n_second") > 0, n1 / n2) + 1e-9, round_dp).alias(
            "rate_ratio"
        ),
        # + 0.0: signed-zero convention (z straddles zero by construction)
        (
            F.round(F.when(ok, (n1 - n2) / F.sqrt(n1 + n2)) + 1e-9, round_dp)
            + 0.0
        ).alias("z"),
    ).orderBy(group_col)


def brown_double_ewma(
    df: DataFrame,
    time_col: str,
    value_agg: Column,
    decay: float = 0.8,
    round_dp: int = 4,
) -> DataFrame:
    """Brown's double exponential smoothing over a daily aggregate: the
    trend-aware upgrade of ewma_series — S1 smooths the series, S2
    smooths S1, and the (level, trend, one-step forecast) triple falls
    out in closed form (level = 2*S1 - S2, trend = alpha/(1-alpha) *
    (S1 - S2) with alpha = 1 - decay). The forecasting baseline that
    tracks a drifting series where single EWMA lags systematically.

    Both smoothing passes are WEIGHT-NORMALIZED over actual day
    distance (gaps decay more), like ewma_series — and, unlike it,
    every weighted sum here is a FIXED-ORDER fold over the day-sorted
    term list (day totals are exact integer cents first), so the floats
    are bit-identical in any engine/layout by construction.

    Plan: one daily aggregate (data-sized work ends there), then two
    #days-bounded triangular self-joins (days^2/2 pairs — thousands) —
    never a date-ordered global window.
    """
    daily = df.groupBy(F.to_date(F.col(time_col)).alias("_d")).agg(
        F.round(value_agg + 1e-9, 2).alias("_x")
    )
    daily = daily.select(
        "_d", (F.round(F.col("_x") * 100).cast("bigint")).alias("_c")
    )

    def smooth(frame: DataFrame, val_col: str, out: str) -> DataFrame:
        a = frame.select(F.col("_d").alias("day"))
        b = frame.select(
            F.col("_d").alias("_bd"), F.col(val_col).alias("_bx")
        )
        pairs = a.join(b, F.col("_bd") <= F.col("day"))
        lst = F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("_bd").alias("bd"),
                    F.col("_bx").cast("double").alias("x"),
                )
            )
        )
        g = pairs.groupBy("day").agg(lst.alias("_l"))
        w = lambda s: F.pow(  # noqa: E731
            F.lit(decay), F.datediff(F.col("day"), s["bd"])
        )
        num = F.aggregate(
            F.transform("_l", lambda s: w(s) * s["x"]),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        den = F.aggregate(
            F.transform("_l", lambda s: w(s)),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        return g.select("day", (num / den).alias(out))

    s1 = smooth(daily, "_c", "_s1")  # cents scale
    s1d = s1.select(F.col("day").alias("_d"), F.col("_s1"))
    s2 = smooth(s1d, "_s1", "_s2")
    alpha = 1.0 - decay
    ratio = alpha / decay
    j = s1.join(s2, "day")
    lvl = 2.0 * F.col("_s1") - F.col("_s2")
    trd = F.lit(ratio) * (F.col("_s1") - F.col("_s2"))
    return j.select(
        "day",
        F.round(F.col("_s1") / 100.0 + 1e-9, round_dp).alias("s1"),
        F.round(F.col("_s2") / 100.0 + 1e-9, round_dp).alias("s2"),
        F.round(lvl / 100.0 + 1e-9, round_dp).alias("level"),
        # + 0.0: trend is signed and can cross zero (signed-zero convention)
        (F.round(trd / 100.0 + 1e-9, round_dp) + 0.0).alias("trend"),
        F.round((lvl + trd) / 100.0 + 1e-9, round_dp).alias("forecast_next"),
    ).orderBy("day")


def periodogram_daily(
    df: DataFrame,
    time_col: str,
    max_k: int = 12,
    round_dp: int = 6,
) -> DataFrame:
    """Discrete-Fourier periodogram of the daily event-count series at
    harmonics k = 1..max_k, reported as the NORMALIZED power fraction
    ``(C_k^2 + S_k^2) / (sum x)^2`` with
    ``C_k = sum_t x_t cos(2*pi*k*t/N)`` (S_k with sin) — the seasonality
    detector that says WHICH cycle dominates (k = N/7 spikes on weekly
    traffic) where ACF only says "some lag correlates".

    Drift-proofing: daily counts are exact integers; the day index t is
    a count-of-earlier-days (triangular join over the #days frame, the
    repo's rank recipe — no global window); C_k and S_k fold over the
    t-ascending struct list, and 2*pi enters as the same double literal
    in both engines.

    Plan: one daily aggregate (data-sized work ends there), one
    #days-triangular index join, a 1-list x max_k harmonic cross, and
    per-k fixed-order folds — everything after the aggregate is
    frame-bounded.
    """
    spark = df.sparkSession
    daily = df.groupBy(F.to_date(F.col(time_col)).alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    other = daily.select(F.col("d").alias("d2"))
    idx = (
        daily.join(other, F.col("d2") < F.col("d"), "left")
        .groupBy("d", "x")
        .agg(F.count("d2").cast("bigint").alias("t"))
    )
    series = idx.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("t").alias("t"), F.col("x").cast("double").alias("x")
                )
            )
        ).alias("_s"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("x").cast("bigint").alias("_sx"),
    )
    ks = spark.range(1, max_k + 1).select(F.col("id").cast("int").alias("k"))
    j = series.crossJoin(ks)
    two_pi = 6.283185307179586
    ang = lambda s: (  # noqa: E731
        F.lit(two_pi) * F.col("k").cast("double") * s["t"].cast("double")
    ) / F.col("n_days").cast("double")
    c = F.aggregate(
        "_s", F.lit(0.0), lambda acc, s: acc + s["x"] * F.cos(ang(s))
    )
    s_ = F.aggregate(
        "_s", F.lit(0.0), lambda acc, s: acc + s["x"] * F.sin(ang(s))
    )
    j = j.select("k", "n_days", "_sx", c.alias("_c"), s_.alias("_sv"))
    # normalized power (P_k / (sum x)^2, an O(1) fraction): rounding the
    # RAW power would round a ~1e10 double at 4 dp — libm-fragile
    sxd = F.col("_sx").cast("double")
    return j.select(
        "k",
        "n_days",
        F.round(
            F.col("n_days").cast("double") / F.col("k").cast("double") + 1e-9,
            2,
        ).alias("period_days"),
        F.round(
            (F.col("_c") * F.col("_c") + F.col("_sv") * F.col("_sv"))
            / (sxd * sxd)
            + 1e-9,
            round_dp,
        ).alias("power_frac"),
    ).orderBy("k")


def mahalanobis_top(
    df: DataFrame,
    key_col: str,
    x_col,
    y_col,
    top: int = 20,
    round_dp: int = 4,
) -> DataFrame:
    """Top-``top`` bivariate outliers by squared Mahalanobis distance
    over two per-key aggregates (e.g. order count x total spend): the
    multivariate screen that catches the "normal count, absurd spend"
    keys a per-column z-score calls ordinary. The 2x2 covariance is
    inverted in closed form, so no linear algebra library enters.

    Exactness: all five moment sums (Sx, Sy, Sxx, Syy, Sxy) accumulate
    as exact integers (DECIMAL(38,0) — products of cents overflow
    int64), and every double is a closed form of those sums — the Welch
    integer-moments recipe, drift-free under any partitioning.

    Plan: one keyed aggregate, one 1-row moments broadcast back onto the
    keys, one TakeOrderedAndProject.
    """
    per = df.groupBy(F.col(key_col).alias("k")).agg(
        x_col.cast("long").alias("x"), y_col.cast("long").alias("y")
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    mom = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dec("x")).alias("sx"),
        F.sum(dec("y")).alias("sy"),
        F.sum((dec("x") * dec("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((dec("y") * dec("y")).cast("decimal(38,0)")).alias("syy"),
        F.sum((dec("x") * dec("y")).cast("decimal(38,0)")).alias("sxy"),
    )
    j = per.crossJoin(F.broadcast(mom))
    nd = F.col("n").cast("double")
    mx = F.col("sx").cast("double") / nd
    my = F.col("sy").cast("double") / nd
    vxx = F.col("sxx").cast("double") / nd - mx * mx
    vyy = F.col("syy").cast("double") / nd - my * my
    vxy = F.col("sxy").cast("double") / nd - mx * my
    det = vxx * vyy - vxy * vxy
    dx = F.col("x").cast("double") - mx
    dy = F.col("y").cast("double") - my
    j = j.select(
        "k",
        "x",
        "y",
        (vyy / det).alias("_ivxx"),
        (vxx / det).alias("_ivyy"),
        (-(vxy) / det).alias("_ivxy"),
        dx.alias("_dx"),
        dy.alias("_dy"),
    )
    d2 = F.col("_dx") * (
        F.col("_ivxx") * F.col("_dx") + F.col("_ivxy") * F.col("_dy")
    ) + F.col("_dy") * (
        F.col("_ivxy") * F.col("_dx") + F.col("_ivyy") * F.col("_dy")
    )
    return (
        j.select(
            F.col("k").alias(key_col),
            F.col("x").alias("x_val"),
            F.col("y").alias("y_val"),
            F.round(d2 + 1e-9, round_dp).alias("mahalanobis_sq"),
        )
        .orderBy(F.col("mahalanobis_sq").desc(), F.col(key_col).asc())
        .limit(top)
    )


def dp_released_counts(
    df: DataFrame,
    group_col: str,
    epsilon: float = 1.0,
    round_dp: int = 4,
) -> DataFrame:
    """Differentially-private count release per group via the Laplace
    mechanism with DETERMINISTIC seeded noise: u = uniform(0,1) from the
    md5 of the group key (the repo's portable hash-uniform), noise =
    -(1/eps) * sign(u - 1/2) * ln(1 - 2|u - 1/2|) — the inverse-CDF
    Laplace draw with sensitivity 1. Seeding noise from the key makes
    the release a pure function of the data (reproducible audits, exact
    SQL oracle); a production release would swap the seed for fresh
    randomness per publication, changing NOTHING else in the plan.

    Shape: one grouped count (map-side combine), noise is a scan-side
    expression over the #groups frame. The noised count carries the
    `+ 0.0` signed-zero convention (noise straddles zero).
    """
    b = 1.0 / epsilon
    counts = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    # first 8 hex chars of md5(key), half-offset -> uniform in (0, 1):
    # the +0.5 keeps u strictly inside the interval so ln(1 - 2|u - 1/2|)
    # can never hit ln(0) on a pathological hash
    u = (
        F.conv(F.substring(F.md5(F.col("_g").cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("double")
        + 0.5
    ) / float(16**8)
    centered = u - 0.5
    noise = (
        -b
        * F.signum(centered)
        * F.log(1.0 - 2.0 * F.abs(centered))
    )
    return counts.select(
        F.col("_g").alias(group_col),
        "n",
        (F.round(noise + 1e-9, round_dp) + 0.0).alias("noise"),
        (F.round(F.col("n") + noise + 1e-9, round_dp) + 0.0).alias("released"),
    ).orderBy(group_col)
