"""Scale-safe window-frame operators.

Spark evaluates an ORDER BY window with no PARTITION BY on a single task
("No Partition Defined" warning) — correct, but a one-machine bottleneck at
cluster scale. ``global_range_frame`` re-expresses the global value-RANGE
frame as a bucketed, fully partitioned plan with identical semantics.

``groups_frame`` implements SQL's GROUPS frame mode (frames counted in
peer groups) and the EXCLUDE clause — both absent from Spark's window
engine — as compositions of partitioned windows: dense_rank gives the
group index, group-level partial aggregates make GROUPS a RANGE frame
over that index, and EXCLUDE falls out of invertible-aggregate
arithmetic (frame − group ± current).

Reference parity: the reference delegates every frame mode to SQLite's
window engine (single-threaded by nature; GROUPS/EXCLUDE are SQLite 3.28+
features); these are the distributed re-expressions.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def global_range_frame(
    df: DataFrame,
    order_col: str,
    lower: float,
    upper: float,
    aggs: Mapping[str, Callable[[WindowSpec], Column]],
) -> DataFrame:
    """Global ``RANGE BETWEEN lower AND upper`` frame without a global window.

    For each row x, every frame peer lies within ``w = max(|lower|, |upper|)``
    of x's value, so with value buckets of width w (``bucket = floor(v / w)``)
    the whole frame is contained in buckets ``b-1, b, b+1``. Plan:

    1. replicate each row to its home bucket and both neighbors (3x, map-side
       — no data-dependent blowup);
    2. ONE hash exchange on the bucket id;
    3. the RANGE window runs *partitioned by bucket* — every qualifying peer
       of a home-bucket row is present in that bucket exactly once, so the
       in-bucket frame equals the global frame;
    4. keep only home-bucket rows.

    Scale: shuffle carries 3x the projected rows (bounded, data-independent);
    window work parallelizes across buckets. Value skew concentrates a hot
    bucket at worst to 3x its population — same order as the skew any
    value-partitioned plan faces, vs. the global window's *total*
    serialization. NULL ordering values keep only their home replica and
    remain mutual peers (SQL RANGE-frame NULL semantics) in the NULL bucket.

    ``aggs`` maps output column name -> (WindowSpec -> Column), e.g.
    ``{"peers": lambda w: F.count(F.lit(1)).over(w)}``.
    """
    if not aggs:
        raise ValueError("aggs must name at least one window aggregate")
    width = float(max(abs(lower), abs(upper)))
    if width <= 0:
        raise ValueError("RANGE frame must extend beyond the current row")

    home = F.floor(F.col(order_col).cast("double") / F.lit(width))
    tagged = df.withColumn("_home", home)
    replicas = tagged.withColumn(
        "_delta",
        F.explode(
            F.when(F.col("_home").isNull(), F.array(F.lit(0))).otherwise(
                F.array(F.lit(-1), F.lit(0), F.lit(1))
            )
        ),
    ).withColumn("_bucket", F.col("_home") + F.col("_delta"))

    w = (
        Window.partitionBy("_bucket")
        .orderBy(F.col(order_col).cast("double"))
        .rangeBetween(lower, upper)
    )
    out = replicas.select(
        *df.columns,
        F.col("_delta"),
        *[fn(w).alias(name) for name, fn in aggs.items()],
    )
    return out.filter(F.col("_delta") == 0).drop("_delta")


#: agg name -> (row-level partial exprs, group-combiner over partials,
#: invertible). Partials are per peer group; the combiner re-aggregates
#: them over the GROUPS frame; invertible aggs additionally support the
#: EXCLUDE arithmetic (frame − group ± current).
_GROUPS_AGGS = {
    "sum": True,
    "count": True,
    "avg": True,
    "min": False,
    "max": False,
}

_EXCLUDES = ("no others", "current row", "group", "ties")


def groups_frame(
    df: DataFrame,
    partition_cols: list[str],
    order_col: str,
    lower: int,
    upper: int,
    agg: str,
    value_col: str,
    out_name: str,
    exclude: str = "no others",
) -> DataFrame:
    """Single-aggregate convenience wrapper over ``groups_frames``."""
    return groups_frames(
        df, partition_cols, order_col,
        [(lower, upper, agg, value_col, out_name, exclude)],
    )


def groups_frames(
    df: DataFrame,
    partition_cols: list[str],
    order_col: str,
    specs: list[tuple],
) -> DataFrame:
    """SQL ``GROUPS BETWEEN lower AND upper [EXCLUDE ...]`` window frames —
    frames counted in *peer groups* (rows tying on the order key), which
    Spark's window engine does not implement (SQLite 3.28+ and DuckDB do;
    declared a gap in round 1, now closed).

    ``specs`` is a list of ``(lower, upper, agg, value_col, out_name,
    exclude)`` tuples — EVERY spec is computed in one shared pass (one
    dense_rank, one group-level aggregate, one join back), so asking for N
    window aggregates costs one composition, not N.

    Composition, every step partitioned by ``partition_cols``:

    1. ``dense_rank`` over (partition, order) = the 1-based group index g;
    2. one row of partial aggregates per (partition, g) — sum/count/min/max
       partials per referenced value column;
    3. each GROUPS frame is now exactly a RANGE frame over g (group indexes
       are dense integers), evaluated on the *group-level* rows — state per
       partition is #distinct-order-values, not #rows;
    4. join the frame results back on (partition, g) — a co-partitioned
       shuffle join;
    5. EXCLUDE arithmetic on invertible aggs (sum/count/avg):
       ``current row`` subtracts the row's own value, ``group`` subtracts
       the row's whole peer group, ``ties`` subtracts the peers but adds
       the row back. Exclusion terms apply only when the frame actually
       covers the current group (``lower <= 0 <= upper``) — EXCLUDE
       removes rows from the frame, it never implies their membership.
    6. EXCLUDE on min/max (not invertible) decomposes the frame into a
       strictly-before part ``[lower, -1]`` and strictly-after part
       ``[1, upper]`` — two more RANGE windows over g — then recombines:
       ``group`` = least/greatest(pre, post); ``ties`` adds the row's own
       value back; ``current row`` additionally needs min/max-except-self
       *within* the peer group, maintained from the group's (min, count of
       min, second-distinct min) — two peer-group window stages over the
       same exchange, no extra shuffle.

    ``agg`` in {sum, count, avg, min, max}; ``count`` counts non-NULL
    ``value_col`` rows. NULL values follow SQL aggregate semantics (ignored
    by sum/avg/min/max; the exclusion arithmetic coalesces them to 0).
    """
    if not specs:
        raise ValueError("specs must name at least one window aggregate")
    for lower, upper, agg, value_col, out_name, exclude in specs:
        if agg not in _GROUPS_AGGS:
            raise ValueError(f"agg must be one of {sorted(_GROUPS_AGGS)}")
        if exclude not in _EXCLUDES:
            raise ValueError(f"exclude must be one of {_EXCLUDES}")

    P = [F.col(c) for c in partition_cols]
    g_win = Window.partitionBy(*P).orderBy(order_col)
    rows = df.withColumn("_g", F.dense_rank().over(g_win))

    # min/max EXCLUDE 'current row' needs within-peer-group except-self
    # stats. Two window stages over the SAME (partition, _g) partitioning —
    # Catalyst reuses one exchange, no extra shuffle.
    mm_self_cols = {
        (s[3], s[2])
        for s in specs
        if s[2] in ("min", "max")
        and s[5] == "current row"
        and s[0] <= 0 <= s[1]  # exclusion is a no-op on non-covering frames
    }
    if mm_self_cols:
        wg = Window.partitionBy(*P, "_g")
        stage1, stage2 = [], []
        for vc, agg in mm_self_cols:
            fn, cmp_beyond = (F.min, F.col(vc) > F.col(f"_pm_{agg}_{vc}")) if agg == "min" else (
                F.max, F.col(vc) < F.col(f"_pm_{agg}_{vc}"))
            stage1.append(fn(vc).over(wg).alias(f"_pm_{agg}_{vc}"))
            stage2.append(
                F.sum(
                    F.when(F.col(vc) == F.col(f"_pm_{agg}_{vc}"), 1).otherwise(0)
                ).over(wg).alias(f"_pmn_{agg}_{vc}")
            )
            stage2.append(
                fn(F.when(cmp_beyond, F.col(vc))).over(wg).alias(f"_pm2_{agg}_{vc}")
            )
        rows = rows.select("*", *stage1).select("*", *stage2)

    # one partial-aggregate set per distinct value column
    vcols = list(dict.fromkeys(s[3] for s in specs))
    partials = []
    for vc in vcols:
        partials += [
            F.sum(F.col(vc).cast("double")).alias(f"_gsum_{vc}"),
            F.count(vc).alias(f"_gcnt_{vc}"),
            F.min(vc).alias(f"_gmin_{vc}"),
            F.max(vc).alias(f"_gmax_{vc}"),
        ]
    glevel = rows.groupBy(*partition_cols, "_g").agg(*partials)

    # one frame-window column set per spec (bounds may differ per spec)
    frame_cols = []
    for i, (lower, upper, agg, vc, _, exclude) in enumerate(specs):
        fw = Window.partitionBy(*P).orderBy("_g").rangeBetween(lower, upper)
        frame_cols += [
            F.sum(f"_gsum_{vc}").over(fw).alias(f"_fsum_{i}"),
            F.sum(f"_gcnt_{vc}").over(fw).alias(f"_fcnt_{i}"),
            F.min(f"_gmin_{vc}").over(fw).alias(f"_fmin_{i}"),
            F.max(f"_gmax_{vc}").over(fw).alias(f"_fmax_{i}"),
        ]
        if agg in ("min", "max") and exclude != "no others" and lower <= 0 <= upper:
            # prefix [lower, -1] / suffix [1, upper] parts of the frame,
            # empty sides as typed NULL
            fn = F.min if agg == "min" else F.max
            src = f"_gmin_{vc}" if agg == "min" else f"_gmax_{vc}"
            if lower <= -1:
                pw = Window.partitionBy(*P).orderBy("_g").rangeBetween(
                    lower, min(upper, -1)
                )
                pre = fn(src).over(pw)
            else:
                pre = F.lit(None)
            if upper >= 1:
                sw = Window.partitionBy(*P).orderBy("_g").rangeBetween(
                    max(lower, 1), upper
                )
                post = fn(src).over(sw)
            else:
                post = F.lit(None)
            frame_cols += [
                pre.cast(df.schema[vc].dataType).alias(f"_fpre_{i}"),
                post.cast(df.schema[vc].dataType).alias(f"_fpost_{i}"),
            ]
    frame = glevel.select(
        *partition_cols,
        "_g",
        *[c for vc in vcols for c in (f"_gsum_{vc}", f"_gcnt_{vc}")],
        *frame_cols,
    )

    joined = rows.join(frame, on=[*partition_cols, "_g"])
    outputs = []
    for i, (lower, upper, agg, vc, out_name, exclude) in enumerate(specs):
        # EXCLUDE removes rows from the frame; when the frame bounds do not
        # cover the current group there is nothing to remove
        covers = lower <= 0 <= upper
        v = F.coalesce(F.col(vc).cast("double"), F.lit(0.0))
        v_cnt = F.when(F.col(vc).isNull(), 0).otherwise(1)
        fsum, fcnt = F.col(f"_fsum_{i}"), F.col(f"_fcnt_{i}")
        gsum = F.coalesce(F.col(f"_gsum_{vc}"), F.lit(0.0))
        gcnt = F.col(f"_gcnt_{vc}")
        if not covers or exclude == "no others":
            esum, ecnt = fsum, fcnt
        elif exclude == "current row":
            esum, ecnt = fsum - v, fcnt - v_cnt
        elif exclude == "group":
            esum, ecnt = fsum - gsum, fcnt - gcnt
        else:  # ties
            esum, ecnt = fsum - gsum + v, fcnt - gcnt + v_cnt

        if agg == "sum":
            # SQL: empty frame (or all-NULL) -> NULL
            result = F.when(ecnt > 0, esum)
        elif agg == "count":
            # COUNT over an empty frame is 0, never NULL (the frame sum of
            # group partials is NULL when no group falls in the bounds)
            result = F.coalesce(ecnt, F.lit(0)).cast("bigint")
        elif agg == "avg":
            result = F.when(ecnt > 0, esum / ecnt)
        else:  # min / max via prefix/suffix decomposition
            plain = F.col(f"_fmin_{i}" if agg == "min" else f"_fmax_{i}")
            if not covers or exclude == "no others":
                result = plain
            else:
                pre, post = F.col(f"_fpre_{i}"), F.col(f"_fpost_{i}")
                if exclude == "group":
                    parts = [pre, post]
                elif exclude == "ties":
                    parts = [pre, post, F.col(vc)]
                else:  # current row: peer-group min/max except self
                    m = F.col(f"_pm_{agg}_{vc}")
                    n = F.col(f"_pmn_{agg}_{vc}")
                    m2 = F.col(f"_pm2_{agg}_{vc}")
                    beyond = F.col(vc) > m if agg == "min" else F.col(vc) < m
                    within = (
                        F.when(F.col(vc).isNull() | beyond, m)
                        .when(n > 1, m)
                        .otherwise(m2)
                    )
                    parts = [pre, post, within]
                comb = F.least if agg == "min" else F.greatest
                result = comb(*parts)
        outputs.append(result.alias(out_name))

    return joined.select(*df.columns, *outputs)
