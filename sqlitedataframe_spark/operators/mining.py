"""Sequential-pattern and co-occurrence mining: frequent event paths
within sessions, market-basket item pairs.

The reference (jackpal/SQLiteDataFrame) has no mining surface; these are
Tier-D training/analytics extensions in the same scale discipline as the
dedup family: per-group work bounded by group size, hot-group guards, and
shuffles that carry slim key rows only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sqlitedataframe_spark.operators.relational import sessionize


def top_paths(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    n: int = 3,
    k: int = 20,
    gap_seconds: int = 1800,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Most frequent ``n``-step event-type paths within user sessions —
    the sequential-pattern view of a clickstream (what do users actually
    DO, in order), the input to funnel design and next-action models.

    Scale shape: sessionize shuffles once on the user key; the path
    window partitions by (user, session) — a superset of that
    partitioning, so no second exchange — and emits one path string per
    event with ``n-1`` LEADs (paths never span sessions; rows whose
    lookahead runs off the session end are filtered by the LAST lead's
    null, which implies all shorter leads exist). Path counting is a
    partially-combined aggregate on the path string; top-k compiles to
    TakeOrderedAndProject with the path text as tiebreak.
    """
    s = sessionize(df, user_col, ts_col, gap_seconds)
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy(user_col, "session_id").orderBy(
        *[F.col(c).asc() for c in order]
    )
    steps = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, n)
    ]
    return (
        s.select(
            F.concat_ws(">", *steps).alias("path"),
            F.lead(type_col, n - 1).over(w).alias("_last"),
        )
        .filter(F.col("_last").isNotNull())
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), F.col("path"))
        .limit(k)
    )


def cooccurrence_pairs(
    df: DataFrame,
    group_col: str,
    item_col: str,
    k: int = 20,
    max_basket: int | None = 10_000,
) -> DataFrame:
    """Market-basket 2-itemset support: the ``k`` item pairs most often
    present together in the same basket/group — the co-occurrence kernel
    behind "frequently bought together", co-citation, and tag-affinity
    analyses.

    Scale shape: baskets dedup to distinct (group, item) rows first
    (support counts a pair once per basket), ONE exchange on the group
    key that the self-join then reuses on both sides (same frame, same
    partitioning — ReuseExchange). Pair volume is sum-of-basket-sizes
    squared, so ``max_basket`` drops degenerate mega-baskets before the
    join (the basket analogue of the LSH hot-bucket guard — a basket
    containing half the catalog identifies nothing). ``item < item``
    keeps each unordered pair once; the support aggregate partially
    combines map-side and top-k compiles to TakeOrderedAndProject.
    """
    slim = df.select(
        F.col(group_col).alias("_g"), F.col(item_col).alias("_i")
    ).distinct()
    if max_basket is not None:
        wb = Window.partitionBy("_g")
        slim = (
            slim.withColumn("_bn", F.count(F.lit(1)).over(wb))
            .filter(F.col("_bn") <= max_basket)
            .drop("_bn")
        )
    a = slim.select(F.col("_g"), F.col("_i").alias("item_a"))
    b = slim.select(F.col("_g"), F.col("_i").alias("item_b"))
    return (
        a.join(b, on="_g")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), F.col("item_a"), F.col("item_b"))
        .limit(k)
    )


def session_item_pairs(
    events: DataFrame,
    user_col: str,
    order_cols: list[str],
    item_col: str,
    lookahead: int = 2,
    k: int = 20,
) -> DataFrame:
    """Top-``k`` (item, following-item) co-occurrence counts within a
    per-user ordered event stream, looking ahead up to ``lookahead``
    events — the item2vec/prod2vec pair-generation step of sequential-
    recommendation training (the event-stream twin of text skip-grams,
    but partitioned by user and ordered by time, not token position).

    Scale shape: ONE window pass computes all ``lookahead`` lead columns
    (single hash exchange on the user key, sorted once per partition);
    the pair expansion is a map-side array explode; the count aggregate
    partially combines map-side; top-k compiles to
    TakeOrderedAndProject. ``order_cols`` must end in a unique tiebreak
    (e.g. event_id) so both engines see one total order.
    """
    w = Window.partitionBy(user_col).orderBy(*[F.col(c) for c in order_cols])
    leads = [
        F.lead(item_col, d).over(w).alias(f"_n{d}")
        for d in range(1, lookahead + 1)
    ]
    s = events.select(F.col(item_col).alias("a"), *leads)
    return (
        s.select(
            "a",
            F.explode(
                F.array(*[F.col(f"_n{d}") for d in range(1, lookahead + 1)])
            ).alias("b"),
        )
        .filter(F.col("b").isNotNull())
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), F.col("a"), F.col("b"))
        .limit(k)
    )


def markov_transitions(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    tiebreak_col: str | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """First-order Markov transition matrix between event types:
    (from_type, to_type, n, p) where ``p`` is the row-normalized
    transition probability. The aggregate view of sequential behavior —
    next-action models, anomaly screens ("this transition never
    happens"), and the stationary input to PageRank-style session
    analysis; complements top_paths, which mines full n-step paths.

    One lead() window partitioned by user (state bounded per user), one
    count aggregate on the (from, to) pair — |types|^2 output rows via
    partial map-side combine — and the row normalizer joins back as a
    broadcast of the tiny per-from totals. No self-joins of the events.
    """
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(user_col).orderBy(*order)
    pairs = (
        events.select(
            F.col(user_col),
            F.col(type_col).alias("from_type"),
            F.lead(F.col(type_col)).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("_tot"))
    return (
        pairs.join(F.broadcast(totals), "from_type")
        .select(
            "from_type", "to_type",
            F.col("n").cast("bigint").alias("n"),
            F.round(F.col("n") / F.col("_tot"), round_dp).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


def last_touch_attribution(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    value_col: str,
    conversion_type: str,
    window_days: int = 7,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Last-touch marketing attribution: credit each conversion event to
    the user's most recent PRECEDING non-conversion touch within
    ``window_days`` -> per touch type, conversions credited and value
    attributed. The baseline attribution model every funnel/ROI readout
    starts from.

    ONE window pass, no self-join of the events (the naive formulation
    is a range join of conversions x touches): ``last(..., ignorenulls)``
    over (user, time) with an UNBOUNDED PRECEDING .. 1 PRECEDING frame
    carries the latest touch type and its timestamp forward; the
    recency cut is then a scan-side filter. State per window = one
    (type, ts) pair, independent of user history length.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = (
        Window.partitionBy(user_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col(type_col) != conversion_type
    touched = events.select(
        F.col(user_col),
        F.col(type_col),
        F.col(ts_col),
        F.col(value_col).alias("_v"),
        F.last(F.when(is_touch, F.col(type_col)), ignorenulls=True)
        .over(w)
        .alias("_touch"),
        F.last(F.when(is_touch, F.col(ts_col)), ignorenulls=True)
        .over(w)
        .alias("_touch_ts"),
    )
    return (
        touched.filter(
            (F.col(type_col) == conversion_type)
            & F.col("_touch").isNotNull()
            & (
                F.unix_timestamp(F.col(ts_col))
                - F.unix_timestamp(F.col("_touch_ts"))
                <= window_days * 86400
            )
        )
        .groupBy(F.col("_touch").alias("touch_type"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_conversions"),
            F.round(F.sum("_v") + 1e-9, 2).alias("attributed_value"),
        )
        .orderBy("touch_type")
    )


def association_rules(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_support: int = 5,
    k: int = 20,
    round_dp: int = 6,
    max_basket: int | None = 10_000,
) -> DataFrame:
    """Directed association rules a -> b over baskets with support,
    confidence (= P(b | a)) and lift (= confidence / P(b)) — the
    Agrawal/Srikant market-basket completion of cooccurrence_pairs,
    which stops at raw pair support. Lift > 1 marks genuinely
    associated items; confidence drives "customers who bought X".

    Scale shape inherits cooccurrence_pairs exactly (distinct basket
    rows, one reusable exchange on the basket key, the max_basket
    degenerate-basket guard, pair aggregate partially combined); the
    two item-frequency lookups are key joins of vocabulary-sized
    tables, and the basket total rides in as a 1-row broadcast. All
    inputs to confidence/lift are integer counts -> both engines
    compute identical doubles.
    """
    slim = df.select(
        F.col(group_col).alias("_g"), F.col(item_col).alias("_i")
    ).distinct()
    if max_basket is not None:
        wb = Window.partitionBy("_g")
        slim = (
            slim.withColumn("_bn", F.count(F.lit(1)).over(wb))
            .filter(F.col("_bn") <= max_basket)
            .drop("_bn")
        )
    n_baskets = slim.select("_g").distinct().agg(
        F.count(F.lit(1)).alias("_nb")
    )
    item_n = slim.groupBy("_i").agg(F.count(F.lit(1)).alias("_ni"))
    a = slim.select(F.col("_g"), F.col("_i").alias("ante"))
    b = slim.select(F.col("_g"), F.col("_i").alias("cons"))
    pairs = (
        a.join(b, on="_g")
        .filter(F.col("ante") != F.col("cons"))  # directed: both orders
        .groupBy("ante", "cons")
        .agg(F.count(F.lit(1)).alias("_nab"))
        .filter(F.col("_nab") >= min_support)
    )
    conf = F.col("_nab").cast("double") / F.col("_na")
    lift = conf * F.col("_nb") / F.col("_nc")
    return (
        pairs.join(item_n.select(F.col("_i").alias("ante"), F.col("_ni").alias("_na")), "ante")
        .join(item_n.select(F.col("_i").alias("cons"), F.col("_ni").alias("_nc")), "cons")
        .join(F.broadcast(n_baskets))
        .select(
            "ante", "cons",
            F.col("_nab").cast("bigint").alias("n_ab"),
            F.round(conf, round_dp).alias("confidence"),
            F.round(lift, round_dp).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "ante", "cons")
        .limit(k)
    )


def funnel_stage_times(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Per-user strictly-ordered funnel timestamps: for each user, the
    first occurrence of step[0], the first step[1] AFTER it, the first
    step[2] after that, ... -> one row per user who completed ALL steps,
    with a timestamp column per step (``t_<step>``). The per-user basis
    for conversion timing ("how long from view to purchase"), the
    complement of the stage-count funnel.

    Each stage is a min-timestamp aggregate keyed on the user, joined to
    the previous stage — all frames co-partition on the user key (one
    exchange lineage, the events_funnel plan shape); event-type filters
    push to the scan.
    """
    e = events.select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_t"),
        F.col(ts_col).alias("_ts"),
    )
    stage = (
        e.filter(F.col("_t") == steps[0])
        .groupBy("_u")
        .agg(F.min("_ts").alias(f"t_{steps[0]}"))
    )
    prev = f"t_{steps[0]}"
    for s in steps[1:]:
        stage = (
            e.filter(F.col("_t") == s)
            .join(stage, "_u")
            .filter(F.col("_ts") > F.col(prev))
            .groupBy("_u", *[c for c in stage.columns if c != "_u"])
            .agg(F.min("_ts").alias(f"t_{s}"))
        )
        prev = f"t_{s}"
    return stage.withColumnRenamed("_u", user_col)


def path_pattern_stats(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    mapping: dict[str, str],
    pattern: str,
    tiebreak_col: str,
) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence-pattern matching — the row-pattern
    operator Spark's SQL surface lacks (Trino/Oracle MATCH_RECOGNIZE,
    Flink CEP): each user's event history is encoded as an ordered
    single-char string and a regex over that alphabet finds the
    non-overlapping leftmost matches, exactly the semantics of
    MATCH_RECOGNIZE ... AFTER MATCH SKIP PAST LAST ROW with greedy
    quantifiers.

    Keep ``pattern`` inside the portable regex core (literals, character
    classes, * + ? alternation) so Java (Spark) and RE2 (DuckDB/Trino)
    agree; both are leftmost-greedy for that subset.

    First-match position correctness: strpos(path, first_match) IS the
    first match's offset — if the extracted match string occurred
    earlier in the path, the regex scan would have matched at that
    earlier offset instead (the string itself matches the pattern),
    a contradiction.

    Scale: one shuffle on user_id; per-user state is the user's own
    event string (bounded by per-user activity, the same contract as
    top_paths/sessionize), built with an order-free collect + in-row
    array_sort so no window ever sees more than one user's rows.

    Returns per user: (user, n_events, path_len, n_matches,
    first_match_pos 1-based or 0, longest_match_len, matched_chars).
    """
    ch = None
    for k, v in mapping.items():
        ch = (F.when(F.col(type_col) == k, F.lit(v)) if ch is None
              else ch.when(F.col(type_col) == k, F.lit(v)))
    ch = ch.otherwise(F.lit("_"))
    paths = (
        df.select(
            F.col(user_col), F.col(ts_col), F.col(tiebreak_col), ch.alias("_c")
        )
        .groupBy(user_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(ts_col, tiebreak_col, "_c"))
                    ),
                    lambda s: s["_c"],
                ),
                "",
            ).alias("_path"),
        )
    )
    m = F.expr(f"regexp_extract_all(_path, '{pattern}', 0)")
    first = F.expr(f"regexp_extract(_path, '{pattern}', 0)")
    lens = F.transform(m, F.length)
    return paths.select(
        user_col,
        "n_events",
        F.length("_path").cast("int").alias("path_len"),
        F.size(m).cast("int").alias("n_matches"),
        F.when(first == "", F.lit(0))
        .otherwise(F.instr("_path", first))
        .cast("int")
        .alias("first_match_pos"),
        F.coalesce(F.array_max(lens), F.lit(0)).cast("int").alias(
            "longest_match_len"
        ),
        F.coalesce(
            F.aggregate(lens, F.lit(0), lambda a, x: a + x), F.lit(0)
        ).cast("bigint").alias("matched_chars"),
    )
