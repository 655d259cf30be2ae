"""Composite relational operators the reference's SQL surface implies but
Spark has no single primitive for: batch sessionization and as-of joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the previous
    event of the same user exceeds ``gap_seconds``. Classic lag + cumulative
    sum over one window — a single shuffle on the user key, then in-partition
    sorts; scales with per-user event counts, not global ordering.

    Adds ``session_id`` (0-based per user).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap = F.unix_timestamp(ts_col) - F.unix_timestamp(F.lag(ts_col).over(w))
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        (F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1).cast(
            "bigint"
        ),
    )


def with_rowid(df: DataFrame, *order_cols: str, name: str = "rowid") -> DataFrame:
    """Stable, dense, 1-based row id over an explicit total order — the
    engine-provided surrogate for SQLite's implicit ``rowid`` pseudo-column
    on non-SQLite sources (SURVEY §7 hard part 1; README.md:30 usage).

    Requires a caller-chosen deterministic order; ``monotonically_
    increasing_id`` is neither stable nor dense, so it is not used.

    Scale-safe zipWithIndex shape (no global window, so no single-partition
    WindowExec anywhere in the plan):

    1. one range exchange on the order key — partition p holds keys strictly
       below partition p+1 (equal keys never straddle a boundary);
    2. ``row_number`` partitioned by ``spark_partition_id`` — numbering runs
       in parallel per partition;
    3. per-partition counts from a second, column-pruned pass — Catalyst
       slims it to the order key alone, so the extra scan+shuffle carries
       only the key column (a few % of the main exchange's bytes; its two
       uses share one ReusedExchange). Counts become cumulative offsets via
       a broadcast triangle join over at most ``shuffle.partitions`` rows —
       O(P²) on cluster-sized, not data-sized, cardinality;
    4. broadcast the offsets back onto the partition id.

    The frame itself is never serialized through one task at any step.
    """
    cols = [F.col(c) for c in order_cols]
    # Explicit partition count pins REPARTITION_BY_NUM shuffle origin: AQE
    # must not coalesce the two range exchanges differently (branch sizes
    # differ once pruning slims the count branch to the key column), or the
    # spark_partition_id spaces would disagree and offsets would misalign.
    # Range boundaries themselves are deterministic for identical input
    # (RangePartitioner samples with a fixed per-partition seed).
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    ranged = df.repartitionByRange(n, *cols).withColumn("_pid", F.spark_partition_id())
    in_part = F.row_number().over(Window.partitionBy("_pid").orderBy(*cols))
    counts = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    offsets = (
        counts.alias("a")
        .join(
            F.broadcast(counts.select(F.col("_pid").alias("_q"), "_cnt").alias("b")),
            F.col("b._q") < F.col("a._pid"),
            "left",
        )
        .groupBy(F.col("a._pid").alias("_pid"))
        .agg(F.coalesce(F.sum("b._cnt"), F.lit(0)).alias("_off"))
    )
    return (
        ranged.withColumn("_rn", in_part)
        .join(F.broadcast(offsets), "_pid")
        .withColumn(name, (F.col("_off") + F.col("_rn")).cast("int"))
        .drop("_pid", "_rn", "_off")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """As-of join: for each left row, attach the latest right row with
    right_ts <= left_ts (backward) or the earliest with >= (forward), per key.
    With ``tolerance_seconds``, a match further than the tolerance from the
    left timestamp is rejected (the standard as-of max-gap option) — the
    matched columns come back NULL, exactly as if no right row qualified.

    Implemented as union + ordered window (the merge-sort formulation): both
    sides shuffle once on the key, then one ordered pass carries the most
    recent right payload forward onto left rows — no range cross-join blowup,
    so it scales like a regular shuffle join. The tolerance adds no extra
    pass: the matched right timestamp rides along in the same window.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    lcols = left.columns
    rcols = [c for c in right.columns if c != on]

    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in rcols]).alias("_r"),
    )
    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in lcols]).alias("_l"),
    ).withColumn("_r", F.lit(None).cast(r_tag.schema["_r"].dataType))
    r_tag = r_tag.withColumn("_l", F.lit(None).cast(l_tag.schema["_l"].dataType))
    unioned = l_tag.select("_k", "_ts", "_side", "_l", "_r").unionByName(
        r_tag.select("_k", "_ts", "_side", "_l", "_r")
    )

    # Order so the qualifying right row precedes the left row, then carry the
    # last non-null right payload forward. _side=0 sorts before _side=1 at
    # equal timestamps, making the join inclusive (<= / >=).
    ts_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy("_k")
        .orderBy(ts_order, F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rm = F.last("_r", ignorenulls=True).over(w)
    if tolerance_seconds is not None:
        # matched right ts rides the same window (evaluated BEFORE the side
        # filter, while right rows are still present); gap beyond tolerance
        # voids the match (NULL payload), like no right row qualified
        matched_ts = F.last(
            F.when(F.col("_side") == 0, F.col("_ts")), ignorenulls=True
        ).over(w)
        # cast via "timestamp" first: legal on both timestamp and
        # timestamp_ntz inputs (ntz->double directly is a Spark 4.1 error)
        gap = F.abs(
            F.col("_ts").cast("timestamp").cast("double")
            - matched_ts.cast("timestamp").cast("double")
        )
        rm = F.when(gap <= float(tolerance_seconds), rm)
    matched = unioned.withColumn("_rm", rm).filter(F.col("_side") == 1)
    return matched.select(
        *[F.col("_l")[c].alias(c) for c in lcols],
        *[F.col("_rm")[c].alias(c) for c in rcols],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lookback_seconds: int,
) -> DataFrame:
    """Range join: pair each right row with every left row of the same key
    whose timestamp falls in ``(right_ts - lookback, right_ts]``.

    Spark plans a raw ``l.ts BETWEEN r.ts - X AND r.ts`` join condition as
    BroadcastNestedLoopJoin — O(|L|x|R|) per key and a non-starter at scale.
    This implementation makes it an equi-join:

    1. bucket both sides by ``floor(epoch / lookback)`` (map-side);
    2. the interval side (right) is replicated to BOTH buckets its window
       can touch — exactly 2, because the window length equals the bucket
       width (``sequence`` + explode, map-side, 2x right only);
    3. equi-join on (key, bucket) — a plain shuffled hash/sort-merge join —
       then the exact range predicate filters residual pairs.

    Each matching pair meets in exactly one bucket (the left row's home
    bucket), so no post-join dedup is needed. Cost: one 2x replication of
    the slim right projection instead of a nested loop; skewed keys fall
    out to AQE skew-join handling like any other equi-join.
    """
    lb = int(lookback_seconds)
    # floor(epoch_sec / width): epoch seconds are positive, so the
    # truncating bigint cast after double division IS floor here.
    def bkt(ts: str):
        return (F.unix_timestamp(F.col(ts)) / F.lit(lb)).cast("bigint")

    # A matching left row's second-truncated epoch lies in
    # [sec(right)-lb, sec(right)], so its home bucket is bucket(right)-1 or
    # bucket(right) — replicate the interval side to exactly those two.
    l_b = left.withColumn("_bkt", bkt(left_ts))
    r_b = right.withColumn(
        "_bkt", F.explode(F.sequence(bkt(right_ts) - 1, bkt(right_ts)))
    )
    lk, rk = F.col(f"l.{on}"), F.col(f"r.{on}")
    lt, rt = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    window_lo = rt - F.make_interval(secs=F.lit(lb))
    return (
        l_b.alias("l")
        .join(
            r_b.alias("r"),
            (lk == rk)
            & (F.col("l._bkt") == F.col("r._bkt"))
            & (lt > window_lo)
            & (lt <= rt),
        )
        .drop("_bkt")
    )


def merge_into(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    delete_col: str | None = None,
) -> DataFrame:
    """MERGE semantics on plain (non-transactional) storage: upsert
    ``updates`` into ``base`` by ``keys`` — matched rows are replaced by the
    update row, unmatched update rows are inserted, and (optionally) update
    rows with ``delete_col = true`` delete their match instead.

    The CDC-compaction shape: ``merged = merge_into(snapshot, changes, keys)``
    then write ``merged`` as the next snapshot. On transactional formats
    (Delta/Iceberg) this is ``MERGE INTO``; on raw parquet it has to be a
    rewrite, and this is the rewrite's one-shuffle plan:

    - union both sides tagged with a priority bit, one ``row_number`` window
      partitioned by key (priority DESC) keeps the winning row per key —
      a single hash exchange on the merge keys, no join at all;
    - deletes fall out by filtering the winner, so a delete still shadows
      (and thereby removes) its base row.

    Schemas must agree on all non-key columns (updates may omit
    ``delete_col``). Updates must be unique per key (enforce upstream with
    dedup_exact; duplicate update keys would make "the" update row
    nondeterministic — exactly the constraint real MERGE implementations
    impose).
    """
    upd_cols = set(updates.columns)
    data_cols = [c for c in base.columns if c not in keys]
    if delete_col is not None and delete_col not in upd_cols:
        raise ValueError(f"delete_col {delete_col!r} not in updates")
    missing = [c for c in keys + data_cols if c not in upd_cols]
    if missing:
        raise ValueError(f"updates missing columns {missing}")

    sel = [*keys, *data_cols]
    del_flag = (
        F.col(delete_col).cast("boolean") if delete_col is not None else F.lit(False)
    )
    u = updates.select(
        *sel, F.lit(1).alias("_prio"), F.coalesce(del_flag, F.lit(False)).alias("_del")
    )
    b = base.select(*sel, F.lit(0).alias("_prio"), F.lit(False).alias("_del"))
    w = Window.partitionBy(*keys).orderBy(F.col("_prio").desc())
    return (
        u.unionByName(b)
        .withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (~F.col("_del")))
        .select(*sel)
    )


def scd2_history(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    attr_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension Type-2 build: per key, collapse consecutive
    rows with unchanged tracked attributes, then version the survivors with
    half-open validity intervals ``[valid_from, valid_to)`` (``valid_to``
    NULL = current). The standard warehouse shape for "what did this
    dimension look like on date X" joins.

    Scale shape: ONE shuffle on the dimension key. Change detection
    (lag-compare, null-safe) and re-versioning (row_number + lead) are two
    window passes over the SAME partitioning spec; the filter between them
    preserves the hash partitioning, so Spark plans the second window
    without a new exchange. Nothing collects; attribute payloads ride along
    untouched.

    The reference has no temporal surface (SQLiteDataFrame.swift:295-304
    delegates SQL to SQLite, which also lacks SCD tooling); Tier-D
    extension.
    """
    order = [order_col] + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).asc() for c in order])
    unchanged = F.lit(True)
    for a in attr_cols:
        unchanged = unchanged & F.col(a).eqNullSafe(F.lag(a).over(w))
    chg = (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_same", unchanged)
        .filter((F.col("_rn") == 1) | ~F.col("_same"))
        .drop("_rn", "_same")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*[F.col(c).asc() for c in order])
    return (
        chg.withColumn("version", F.row_number().over(w2).cast("bigint"))
        .withColumn("valid_from", F.col(order_col))
        .withColumn("valid_to", F.lead(order_col).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def scd2_apply_changes(
    dim: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    order_col: str,
    attr_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Incremental SCD2 merge: apply a batch of change events to an
    existing :func:`scd2_history` dimension. Touched keys are rebuilt
    from their VERSION-START events plus the new changes; untouched keys
    pass through — merge cost scales with the batch, not the dimension.

    Correctness argument (the suite oracle checks it end-to-end): SCD2
    collapse depends only on each key's ordered attribute sequence, and a
    version-start list IS that sequence with consecutive duplicates
    already removed — so rebuilding from (version starts ∪ new events)
    equals rebuilding from all original events. A change carrying the
    same attribute as the key's current version collapses away, exactly
    as in the batch build. ``tiebreak_col`` must ride through both inputs
    when order values can tie (scd2_history keeps it on the dim rows).

    Plan shape: the touched-key set (bounded by the batch) drives a
    semi/anti split of the dimension; the rebuild is scd2_history over
    version-start + change rows only — per key that is one row per
    historical CHANGE, not per source row.
    """
    sel = [*key_cols, order_col, *attr_cols] + (
        [tiebreak_col] if tiebreak_col and tiebreak_col != order_col else []
    )
    touched = changes.select(*key_cols).distinct()
    dim_events = (
        dim.join(touched, key_cols, "left_semi")
        .withColumn(order_col, F.col("valid_from"))
        .select(*sel)
    )
    events = dim_events.unionByName(changes.select(*sel))
    rebuilt = scd2_history(
        events, key_cols, order_col, attr_cols, tiebreak_col=tiebreak_col
    )
    out_cols = [
        *key_cols,
        *attr_cols,
        "version",
        "valid_from",
        "valid_to",
        "is_current",
    ]
    untouched = dim.join(touched, key_cols, "left_anti").select(*out_cols)
    return untouched.unionByName(rebuilt.select(*out_cols))


def snapshot_diff(
    base: DataFrame,
    cur: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Symmetric diff of two snapshots of the same table: one summary row
    per compared column with (n_added, n_removed, n_changed) — the data
    regression report run between pipeline versions, vendor drops, or
    backfill attempts ("what did the rerun actually change?").

    A full-outer join on the key classifies every row once: key only in
    ``cur`` = added, only in ``base`` = removed, in both = changed per
    column where values differ null-safely. One shuffle per side on the
    key; the per-column comparison is map-side arithmetic post-join, and
    the output is |compare_cols| rows — a driver-safe summary no matter
    the table size (row-level drill-down is the same join minus the
    aggregate).
    """
    b = base.select(
        *key_cols, *[F.col(c).alias(f"_b_{c}") for c in compare_cols]
    ).withColumn("_in_b", F.lit(1))
    c = cur.select(
        *key_cols, *[F.col(x).alias(f"_c_{x}") for x in compare_cols]
    ).withColumn("_in_c", F.lit(1))
    j = b.join(c, key_cols, "full_outer")
    added = F.col("_in_b").isNull()
    removed = F.col("_in_c").isNull()
    per_col = [
        F.struct(
            F.lit(col).alias("column"),
            F.sum(added.cast("bigint")).alias("n_added"),
            F.sum(removed.cast("bigint")).alias("n_removed"),
            F.sum(
                (
                    ~added
                    & ~removed
                    & ~F.col(f"_b_{col}").eqNullSafe(F.col(f"_c_{col}"))
                ).cast("bigint")
            ).alias("n_changed"),
        )
        for col in compare_cols
    ]
    return (
        j.agg(F.array(*per_col).alias("_r"))
        .select(F.explode("_r").alias("r"))
        .select("r.column", "r.n_added", "r.n_removed", "r.n_changed")
    )


def activity_streaks(
    events: DataFrame,
    user_col: str,
    date_col,
    min_len: int = 1,
) -> DataFrame:
    """Gaps-and-islands: per user, maximal runs of CONSECUTIVE active
    days -> (user, streak_start, streak_end, streak_days). The classic
    retention/engagement primitive (login streaks, daily-active runs)
    and the canonical difference-of-sequences SQL pattern: for distinct
    active days ranked per user, ``date - rank`` is constant exactly
    within a consecutive run, so one groupBy on that anchor collapses
    each island.

    Scale shape: distinct (user, day) then ONE window partitioned by
    user (rank over day) and one aggregate on (user, anchor) — both
    shuffle on the user key, no self-joins, no global window. Days,
    not timestamps, bound the window state.
    """
    from pyspark.sql import Window

    d = events.select(
        F.col(user_col).alias("user"), F.col(date_col).cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user").orderBy("day")
    anchored = d.withColumn(
        "_anchor", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    return (
        anchored.groupBy("user", "_anchor")
        .agg(
            F.min("day").alias("streak_start"),
            F.max("day").alias("streak_end"),
            F.count(F.lit(1)).cast("bigint").alias("streak_days"),
        )
        .filter(F.col("streak_days") >= min_len)
        .drop("_anchor")
    )


def cohort_matrix(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    period: str = "week",
) -> DataFrame:
    """Cohort-retention matrix: users grouped by their first-activity
    period (the cohort), counted in each subsequent period offset ->
    (cohort, period_offset, n_users, pct_of_cohort). THE standard
    product-analytics view of retention decay, and the generalization of
    the single-window ``retention`` query this suite already has.

    Scale shape: distinct (user, period) first (one shuffle on the user
    key, partially combined), a min-aggregate per user for the cohort
    (same key, same exchange reusable), a key join back on the user, and
    a final small aggregate on (cohort, offset) — |periods|^2 output
    rows. No windows, no self-join of the raw events.
    """
    if period not in ("week", "day"):
        raise ValueError(
            f"cohort_matrix: period must be 'week' or 'day', got {period!r} "
            "(calendar months have no fixed day step; use date_trunc + a "
            "months_between offset variant instead)"
        )
    per = F.date_trunc(period, F.col(ts_col)).cast("date")
    active = events.select(
        F.col(user_col).alias("_u"), per.alias("_p")
    ).distinct()
    cohorts = active.groupBy("_u").agg(F.min("_p").alias("_c"))
    sized = cohorts.groupBy("_c").agg(F.count(F.lit(1)).alias("_size"))
    step = {"week": 7, "day": 1}[period]
    return (
        active.join(cohorts, "_u")
        .groupBy(
            F.col("_c").alias("cohort"),
            (F.datediff(F.col("_p"), F.col("_c")) / step)
            .cast("bigint")
            .alias("period_offset"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .join(F.broadcast(sized.select(F.col("_c").alias("cohort"), "_size")), "cohort")
        .select(
            "cohort", "period_offset", "n_users",
            F.round(F.col("n_users") / F.col("_size"), 6).alias("pct_of_cohort"),
        )
        .orderBy("cohort", "period_offset")
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    round_dp: int = 4,
) -> DataFrame:
    """Per-key time-weighted average of a value over irregularly-spaced
    observations: each value is weighted by the time it was "in effect"
    (until the key's next observation) — the right mean for sampled
    state (account balances, prices, sensor readings), where the plain
    AVG over-weights bursts. Keys need >= 2 observations (the last one
    has no holding period and is excluded, the standard left-Riemann
    convention).

    One window partitioned by the key (lead over the timestamp; state
    bounded by the key's own row count), one aggregate on the same key —
    both land on the same exchange, no self-join, no global window.
    Weights are epoch-second differences scaled to days as
    ``(next - cur) / 86400`` — identical arithmetic on both engines.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(value_col))
    nxt = F.lead(F.unix_timestamp(F.col(ts_col))).over(w)
    dt_days = (nxt - F.unix_timestamp(F.col(ts_col))).cast("double") / 86400.0
    staged = df.select(
        F.col(key_col), F.col(value_col).alias("_v"), dt_days.alias("_w")
    ).filter(F.col("_w").isNotNull())
    return (
        staged.groupBy(key_col)
        .agg(
            # the 1e-9 nudge is this repo's standard round-boundary guard:
            # partial-aggregation sum order differs across engines by ~1 ulp,
            # which flips ROUND exactly at a .xxxx5 boundary
            F.round(
                F.sum(F.col("_v") * F.col("_w")) / F.sum("_w") + 1e-9, round_dp
            ).alias("twa"),
            F.round(F.avg("_v") + 1e-9, round_dp).alias("plain_avg"),
            F.count(F.lit(1)).cast("bigint").alias("n_periods"),
            F.sum("_w").alias("_sw"),
        )
        # all-zero holding time (every observation simultaneous) makes the
        # weighted mean undefined; engines disagree on 0/0 (NULL vs NaN),
        # so gate on the weight sum explicitly rather than on the quotient
        .filter(F.col("_sw") > 0)
        .drop("_sw")
        .orderBy(key_col)
    )


def rolling_active_users(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    window_days: int = 7,
    round_dp: int = 4,
) -> DataFrame:
    """Daily active users, rolling-window active users (WAU for
    window_days=7), and the DAU/WAU stickiness ratio per day — the
    standard engagement dashboard triple.

    The scale trap is the naive "COUNT(DISTINCT user) OVER (RANGE 6
    PRECEDING)" — distinct-over-window doesn't compose and forces
    per-day re-scans. Instead each distinct (user, day) row EXPANDS to
    the ``window_days`` future days it keeps the user active on (a
    map-side 7-way explode of slim id/day rows), and one distinct +
    count per day finishes — two key-partitioned aggregates, no
    windows at all. Days with no activity of their own are excluded
    (inner join with the DAU side), matching the dashboard convention.
    """
    day = F.col(ts_col).cast("date")
    active = events.select(
        F.col(user_col).alias("_u"), day.alias("_d")
    ).distinct()
    dau = active.groupBy(F.col("_d").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("dau")
    )
    expanded = (
        active.select(
            "_u",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(window_days - 1)),
                    lambda i: F.date_add(F.col("_d"), i),
                )
            ).alias("day"),
        )
        .distinct()
    )
    wau = expanded.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("wau")
    )
    return (
        dau.join(wau, "day")
        .select(
            "day", "dau", "wau",
            F.round(F.col("dau") / F.col("wau"), round_dp).alias("stickiness"),
        )
        .orderBy("day")
    )


def yoy_growth(
    df: DataFrame,
    ts_col: str,
    value_expr,
    round_dp: int = 4,
) -> DataFrame:
    """Monthly totals with year-over-year growth percentage — the
    standard finance/ops trend readout.

    The lag-12-months comparison is NOT a lag(12) over one global
    month-ordered window (an unpartitioned window, the audit's
    serialization flag): partitioning by MONTH-OF-YEAR makes the
    same-month-last-year row exactly lag(1) within each of 12 bounded
    partitions. One aggregate to months, one 12-way partitioned window.
    """
    monthly = (
        df.groupBy(
            F.year(F.col(ts_col)).alias("year"),
            F.month(F.col(ts_col)).alias("month"),
        )
        .agg(F.round(value_expr + 1e-9, 2).alias("revenue"))
    )
    w = Window.partitionBy("month").orderBy("year")
    prev = F.lag("revenue").over(w)
    prev_year = F.lag("year").over(w)
    yoy = F.when(
        prev_year == F.col("year") - 1,
        F.round((F.col("revenue") - prev) / prev * 100 + 1e-9, round_dp),
    )
    return monthly.withColumn("yoy_pct", yoy).orderBy("year", "month")


def seasonal_decompose(
    df: DataFrame,
    ts_col: str,
    value_expr,
    ma_halfwidth: int = 6,
    round_dp: int = 2,
) -> DataFrame:
    """Classical additive decomposition of a monthly series:
    value = trend (centered moving average) + seasonal (month-of-year
    mean of the detrended series) + residual — the first diagnostic cut
    on any business/ops time series.

    The series is MONTHLY — after the first aggregate the frame is
    #months-sized (bounded: years x 12), so the trend's centered moving
    average runs as a bounded range SELF-JOIN over month indexes
    (|months| x (2w+1) comparisons) instead of a month-ordered window —
    a single-partition WindowExec over even a bounded frame is the
    plan-audit flag this repo bans. Seasonal means then aggregate BY
    month-of-year (12 groups) over the detrended rows. Everything after
    the one data-sized aggregate is arithmetic on the tiny month frame.
    """
    monthly = df.groupBy(
        F.year(F.col(ts_col)).alias("year"),
        F.month(F.col(ts_col)).alias("month"),
    ).agg(F.round(value_expr + 1e-9, 2).alias("revenue"))
    m = monthly.withColumn(
        "_idx", F.col("year") * 12 + F.col("month")
    )
    a = m.alias("a")
    b = m.select(F.col("_idx").alias("_bidx"), F.col("revenue").alias("_brev"))
    trend = (
        a.join(
            F.broadcast(b),
            F.abs(F.col("_bidx") - F.col("a._idx")) <= ma_halfwidth,
        )
        .groupBy("a.year", "a.month", "a.revenue", "a._idx")
        .agg(
            F.count(F.lit(1)).alias("_nw"),
            F.round(F.avg("_brev") + 1e-9, round_dp).alias("trend"),
        )
        # edge months lack a full window; classical decomposition leaves
        # them without a trend estimate
        .filter(F.col("_nw") == 2 * ma_halfwidth + 1)
    )
    detrended = trend.select(
        "year", "month", "revenue", "trend",
        (F.col("revenue") - F.col("trend")).alias("_det"),
    )
    # + 0.0 on seasonal/residual: both are signed and hover near zero, so a
    # DuckDB ROUND can mint a -0.0 the driver's hash distinguishes from
    # Spark's +0.0 (the welch lesson); IEEE -0.0 + 0.0 = +0.0 on both
    seasonal = detrended.groupBy("month").agg(
        (F.round(F.avg("_det") + 1e-9, round_dp) + 0.0).alias("seasonal")
    )
    return (
        detrended.join(F.broadcast(seasonal), "month")
        .select(
            "year", "month", "revenue", "trend", "seasonal",
            (
                F.round(
                    F.col("revenue") - F.col("trend") - F.col("seasonal") + 1e-9,
                    round_dp,
                )
                + 0.0
            ).alias("residual"),
        )
        .orderBy("year", "month")
    )


def price_index_pairs(
    df: DataFrame,
    item_col: str,
    year_col: Column,
    qty_col: str,
    price_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Laspeyres / Paasche / Fisher price indexes between every adjacent
    year pair over the MATCHED basket (items transacting in both years)
    — the index-number decomposition that separates price inflation from
    volume mix, per the classic formulas:

      L = sum(p1*q0) / sum(p0*q0)   (base-year basket)
      P = sum(p1*q1) / sum(p0*q1)   (current-year basket)
      F = sqrt(L * P)

    Exactness (the revenue-bridge discipline): per (item, year) the
    quantity sum is an exact BIGINT and revenue an exact integer-cents
    sum; the unit price quantizes ONCE to integer micro-currency
    (round(cents * 1e4 / qty) — one deterministic double division of
    exact integers, then a half-up round both engines reproduce), so
    every index numerator/denominator is an exact DECIMAL(38,0) sum of
    integer products and the indexes are single double divisions at the
    end. No float accumulates across rows anywhere.

    Plan: one map-side-combined aggregate to the (item, year) grain, one
    self-join on (item, year+1) — co-partitioned on the item key — and
    one tiny per-pair aggregate.
    """
    per = df.groupBy(
        F.col(item_col).alias("_item"), year_col.alias("_y")
    ).agg(
        F.sum(F.col(qty_col).cast("bigint")).cast("bigint").alias("_q"),
        F.sum(F.round(F.col(price_col) * 100).cast("bigint"))
        .cast("bigint")
        .alias("_r100"),
    )
    # integer micro-currency unit price: exact ints in, one deterministic
    # division, half-up round (+1e-9 nudges the engines off true midpoints)
    unit = F.round(
        F.col("_r100").cast("double") * 1e4 / F.col("_q").cast("double") + 1e-9
    ).cast("bigint")
    per = per.withColumn("_p", unit)
    a = per.select(
        F.col("_item"), F.col("_y").alias("_y0"),
        F.col("_q").alias("_q0"), F.col("_p").alias("_p0"),
    )
    b = per.select(
        F.col("_item"), (F.col("_y") - 1).alias("_y0"),
        F.col("_q").alias("_q1"), F.col("_p").alias("_p1"),
    )
    j = a.join(b, ["_item", "_y0"])
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = j.groupBy(F.col("_y0").alias("year_from")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum(dec(F.col("_p1")) * F.col("_q0")).alias("_l_num"),
        F.sum(dec(F.col("_p0")) * F.col("_q0")).alias("_l_den"),
        F.sum(dec(F.col("_p1")) * F.col("_q1")).alias("_p_num"),
        F.sum(dec(F.col("_p0")) * F.col("_q1")).alias("_p_den"),
    )
    lasp = F.col("_l_num").cast("double") / F.col("_l_den").cast("double")
    paas = F.col("_p_num").cast("double") / F.col("_p_den").cast("double")
    return agg.select(
        F.col("year_from").cast("int").alias("year_from"),
        (F.col("year_from") + 1).cast("int").alias("year_to"),
        "n_items",
        F.round(lasp + 1e-9, round_dp).alias("laspeyres"),
        F.round(paas + 1e-9, round_dp).alias("paasche"),
        F.round(F.sqrt(lasp * paas) + 1e-9, round_dp).alias("fisher"),
    ).orderBy("year_from")


def level_shift_locate(
    df: DataFrame, ts_col: str, round_dp: int = 4
) -> DataFrame:
    """LOCATE the single strongest level shift in the daily event-count
    series via CUSUM: the day t* maximizing |sum_{s<=t}(n_s - mean)| —
    the localization complement to profiling.changepoint_cusum (which
    reports per-type shift magnitude but not the date). Returns one row: (change_date, cusum_abs, mean_before,
    mean_after, n_days_before, n_days_after), segments split at t*
    inclusive.

    Exactness: the argmax runs on the INTEGER-scaled cusum
    ``k*S_t = sum_{s<=t}(k*n_s - T)`` (k = #days, T = total events) — no
    floating accumulation order can flip the location between engines;
    the only doubles are three final single divisions, rounded.

    Scale shape: one count aggregate to the #days frame, a 1-row totals
    broadcast, a bounded triangular self-join over days (days^2/2 pairs
    — the events_ewma_daily family, chosen over the audit-banned
    date-ordered global window), and a days-sized TakeOrdered for the
    argmax. The fact table is touched once.
    """
    daily = (
        df.select(F.date_trunc("day", F.col(ts_col)).cast("date").alias("d"))
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    totals = daily.agg(
        F.sum("n").cast("bigint").alias("t_total"),
        F.count(F.lit(1)).cast("bigint").alias("k_days"),
    )
    dev = daily.join(F.broadcast(totals)).select(
        "d", "n", "t_total", "k_days",
        (F.col("k_days") * F.col("n") - F.col("t_total")).alias("dev_int"),
    )
    a = dev.select(F.col("d").alias("da"), F.col("dev_int").alias("deva"))
    cusum = (
        dev.join(a, F.col("da") <= F.col("d"))
        .groupBy("d", "t_total", "k_days")
        .agg(F.sum("deva").cast("bigint").alias("cusum_int"))
    )
    top = cusum.orderBy(
        F.abs(F.col("cusum_int")).desc(), F.col("d").asc()
    ).limit(1)
    star = top.select(
        F.col("d").alias("change_date"),
        F.round(F.abs(F.col("cusum_int")) / F.col("k_days"), round_dp).alias(
            "cusum_abs"
        ),
    )
    segs = daily.join(F.broadcast(star)).select(
        "change_date", "cusum_abs", "n",
        (F.col("d") <= F.col("change_date")).alias("_before"),
    )
    return segs.groupBy("change_date", "cusum_abs").agg(
        F.round(
            F.sum(F.when(F.col("_before"), F.col("n"))) /
            F.sum(F.when(F.col("_before"), 1)), round_dp
        ).alias("mean_before"),
        F.round(
            F.sum(F.when(~F.col("_before"), F.col("n"))) /
            F.sum(F.when(~F.col("_before"), 1)), round_dp
        ).alias("mean_after"),
        F.sum(F.when(F.col("_before"), 1)).cast("bigint").alias("n_days_before"),
        F.sum(F.when(~F.col("_before"), 1)).cast("bigint").alias("n_days_after"),
    )


def acf_lags(
    df: DataFrame,
    ts_col: str,
    value_expr,
    max_lag: int = 7,
    round_dp: int = 4,
) -> DataFrame:
    """Autocorrelation function of a daily series at calendar lags
    1..``max_lag``: Pearson correlation between the series and itself
    shifted k days — the periodicity / weekly-seasonality diagnostic
    that precedes any forecasting model.

    Scale shape: ONE data-sized aggregate to the #days frame; lags come
    from exploding a k-element literal array (no cross join), and the
    shifted copy is a broadcast hash join on the computed calendar key
    ``date_add(d, lag)`` — equi, never a window, never a global sort.
    Pairs drop automatically where d+k has no observation (calendar ACF).
    """
    daily = (
        df.groupBy(F.date_trunc("day", F.col(ts_col)).cast("date").alias("d"))
        .agg(value_expr.alias("val"))
    )
    lagged = daily.select(
        "d",
        "val",
        F.explode(
            F.array(*[F.lit(k).cast("int") for k in range(1, max_lag + 1)])
        ).alias("lag"),
    )
    shifted = daily.select(
        F.col("d").alias("_d2"), F.col("val").alias("val2")
    )
    pairs = lagged.join(
        F.broadcast(shifted),
        F.date_add(F.col("d"), F.col("lag")) == F.col("_d2"),
    )
    return (
        pairs.groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            # + 0.0: signed-zero convention for signed stats (welch lesson)
            (F.round(F.corr("val", "val2") + 1e-9, round_dp) + 0.0).alias("acf"),
        )
        .orderBy("lag")
    )


def rolling_percentile_daily(
    df: DataFrame,
    ts_col: str,
    window_days: int = 7,
    pct: float = 0.9,
) -> DataFrame:
    """Trailing-window discrete percentile of the daily count series:
    for each day, the nearest-rank ``pct`` percentile of the counts over
    the last ``window_days`` observed calendar days (including the day
    itself) — the rolling-baseline readout an ops monitor alerts
    against. Returns (d, w, p) with ``w`` the actual window population
    (< window_days at the series start / across gaps).

    Exactness: counts are BIGINTs, the percentile is a member of the
    window (nearest rank, index ceil(pct * w) into the sorted window) —
    no interpolation, no float accumulation.

    Scale shape: one data-sized aggregate to the #days frame; the
    window is assembled by exploding ``window_days`` literal offsets and
    broadcast equi-joining on the computed calendar key (the acf_lags
    shape — never a date-ordered global window), then per-day
    sort_array over <= window_days values.
    """
    if not 0 < pct <= 1:
        raise ValueError(f"pct must be in (0, 1], got {pct}")
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    daily = (
        df.groupBy(F.date_trunc("day", F.col(ts_col)).cast("date").alias("d"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    anchors = daily.select(
        "d",
        F.explode(
            F.array(*[F.lit(k).cast("int") for k in range(window_days)])
        ).alias("off"),
    )
    b = daily.select(F.col("d").alias("_d2"), F.col("n").alias("_bn"))
    cells = anchors.join(
        F.broadcast(b), F.date_sub(F.col("d"), F.col("off")) == F.col("_d2")
    )
    agg = cells.groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("w"),
        F.sort_array(F.collect_list("_bn")).alias("_vs"),
    )
    idx = F.ceil(F.lit(pct) * F.col("w")).cast("int")
    return agg.select(
        "d", "w", F.element_at("_vs", idx).alias("p")
    ).orderBy("d")


def peak_days(
    df: DataFrame,
    ts_col: str,
    neighborhood_days: int = 3,
) -> DataFrame:
    """Local-maximum detection on the daily count series: a day is a peak
    iff its count STRICTLY exceeds every other observed day within
    ±``neighborhood_days`` (ties disqualify both; a day with no observed
    neighbors is trivially a peak). The burst-localization readout an
    ops/trending monitor runs after the anomaly screens.

    Scale shape: one data-sized aggregate to the #days frame, then the
    bounded triangular self-join on the calendar key (the level-shift /
    acf_lags pattern — join fan-out <= 2*neighborhood_days per day,
    never a date-ordered global window), one per-day max aggregate.
    """
    if neighborhood_days < 1:
        raise ValueError(
            f"neighborhood_days must be >= 1, got {neighborhood_days}"
        )
    daily = df.groupBy(
        F.date_trunc("day", F.col(ts_col)).cast("date").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    b = daily.select(F.col("d").alias("_d2"), F.col("n").alias("_n2"))
    w = neighborhood_days
    nb = daily.join(
        b,
        (F.col("_d2") >= F.date_sub(F.col("d"), w))
        & (F.col("_d2") <= F.date_add(F.col("d"), w))
        & (F.col("_d2") != F.col("d")),
        "left",
    )
    return (
        nb.groupBy("d", "n")
        .agg(F.max("_n2").alias("_mx"))
        .filter(F.col("_mx").isNull() | (F.col("n") > F.col("_mx")))
        .select("d", "n")
        .orderBy("d")
    )


def revenue_bridge(
    lineitem: DataFrame,
    part: DataFrame,
    date_col: str = "l_shipdate",
    group_col: str = "p_brand",
) -> DataFrame:
    """Price/volume/mix revenue bridge between consecutive ship years,
    per part brand: decomposes each brand's year-over-year revenue delta
    into a VOLUME effect ``(q1 - q0) * p0`` (sold more units at last
    year's unit price) and a PRICE effect ``q1 * (p1 - p0)`` (this
    year's units at the price change), with ``p = revenue / qty``. The
    two effects sum to the delta EXACTLY by construction; brands that
    appear or disappear between the years are tagged ``new`` /
    ``discontinued`` and carried entirely as volume. The standard
    finance waterfall, computed over the whole fact table.

    Exactness: revenue is summed in 1e-4 currency units as
    DECIMAL(38,0) (extendedprice cents x discount-complement percent —
    both exact 2-dp inputs), quantity as BIGINT; the effects are
    closed-form doubles over those exact sums.

    Plan: one join lineitem->part (AQE picks broadcast when part fits),
    one (year, brand) aggregate, then a year-shifted self-join of the
    #years x #brands frame — bounded. The year-bounds guard is a 1-row
    broadcast.
    """
    rev_u = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * F.round((1 - F.col("l_discount")) * 100).cast("long")
    ).cast("decimal(38,0)")
    g = (
        lineitem.join(part, lineitem["l_partkey"] == part["p_partkey"])
        .groupBy(
            F.year(F.col(date_col)).alias("yr"),
            F.col(group_col).alias("brand"),
        )
        .agg(
            F.sum(F.round(F.col("l_quantity")).cast("long"))
            .cast("bigint")
            .alias("q"),
            F.sum(rev_u).alias("r"),
        )
    )
    bounds = g.agg(
        F.min("yr").alias("_ymin"), F.max("yr").alias("_ymax")
    )
    prev = g.select(
        (F.col("yr") + 1).alias("year_to"),
        "brand",
        F.col("q").alias("q0"),
        F.col("r").alias("r0"),
    )
    curr = g.select(
        F.col("yr").alias("year_to"),
        "brand",
        F.col("q").alias("q1"),
        F.col("r").alias("r1"),
    )
    j = prev.join(curr, ["year_to", "brand"], "full").crossJoin(
        F.broadcast(bounds)
    )
    j = j.filter(
        (F.col("year_to") > F.col("_ymin")) & (F.col("year_to") <= F.col("_ymax"))
    )
    r0d = F.col("r0").cast("double")
    r1d = F.col("r1").cast("double")
    q0d = F.col("q0").cast("double")
    q1d = F.col("q1").cast("double")
    status = (
        F.when(F.col("q0").isNull(), F.lit("new"))
        .when(F.col("q1").isNull(), F.lit("discontinued"))
        .otherwise(F.lit("both"))
    )
    vol = (
        F.when(F.col("q0").isNull(), r1d / 10000.0)
        .when(F.col("q1").isNull(), -(r0d / 10000.0))
        .otherwise(((q1d - q0d) * (r0d / q0d)) / 10000.0)
    )
    price = (
        F.when(
            F.col("q0").isNotNull() & F.col("q1").isNotNull(),
            (r1d - (q1d * (r0d / q0d))) / 10000.0,
        ).otherwise(F.lit(0.0))
    )
    delta_u = F.coalesce(F.col("r1"), F.lit(0).cast("decimal(38,0)")) - F.coalesce(
        F.col("r0"), F.lit(0).cast("decimal(38,0)")
    )

    def money(v):
        # exact half-up integer rounding of 1e-4 currency units to cents,
        # THEN one division: the true values have 4 decimals, so a float
        # ROUND(x, 2) lands exactly on .5 midpoints where Java's
        # shortest-repr BigDecimal and C round() break ties differently
        # (observed: last-cent flip at sf0.1). Integer arithmetic first
        # makes the tie-break explicit and engine-free.
        cents = F.when(
            v >= 0, F.floor((v + 50) / 100)
        ).otherwise(-F.floor((-v + 50) / 100))
        return cents.cast("double") / 100.0

    return j.select(
        "year_to",
        "brand",
        status.alias("status"),
        money(F.col("r0")).alias("rev_prev"),
        money(F.col("r1")).alias("rev_curr"),
        money(delta_u).alias("rev_delta"),
        # + 0.0: signed-zero convention (effects straddle zero)
        (F.round(vol + 1e-9, 4) + 0.0).alias("volume_effect"),
        (F.round(price + 1e-9, 4) + 0.0).alias("price_effect"),
    ).orderBy("year_to", "brand")


def skyline_2d(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Exact 2-D skyline (Pareto front, maximize both): keeps every row
    no other row strictly dominates (>= in both dims, > in at least
    one). Equal points are mutually non-dominating and all kept. The
    classic dominance operator — "which customers are on the
    spend/frequency frontier" — that a top-k by either single column
    cannot answer.

    Scale shape: a naive skyline is an n^2 self-join; this one collapses
    to the per-x maxima FIRST (one keyed aggregate over the full data),
    then resolves dominance with a triangular join over the #distinct-x
    frame (bounded by the x cardinality — order counts, ratings, day
    indices — not by row count), and one hash join back to recover the
    winning rows. A point (x, y) survives iff y == max_y(x) and
    max_y(x) > max_y(x') for every x' > x.
    """
    base = df.select(
        F.col(key_col).alias("k"),
        F.col(x_col).alias("x"),
        F.col(y_col).alias("y"),
    )
    mx = base.groupBy("x").agg(F.max("y").alias("my"))
    hi = mx.select(F.col("x").alias("x2"), F.col("my").alias("my2"))
    # triangular: for each x, the best y among strictly larger x
    dom = (
        mx.join(hi, F.col("x2") > F.col("x"), "left")
        .groupBy("x", "my")
        .agg(F.max("my2").alias("best_hi"))
    )
    sky = dom.filter(
        F.col("best_hi").isNull() | (F.col("my") > F.col("best_hi"))
    ).select("x", F.col("my").alias("y"))
    return (
        base.join(sky, ["x", "y"], "semi")
        .select("k", "x", "y")
        .orderBy("x", "k")
    )
