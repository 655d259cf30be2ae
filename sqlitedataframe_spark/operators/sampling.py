"""Deterministic hash-based sampling: reproducible samples, stratified
samples, and train/valid/test splits keyed on a stable row identifier.

Why not ``df.sample()``: Spark's sampler is seeded *per partition*, so the
selected rows change whenever partitioning changes (repartition, AQE, a
different cluster size) — unacceptable for training-data pipelines where a
split must be stable across reruns and engines. Hashing a row key instead
makes the decision a pure function of the data:

    keep  <=>  substr(md5(cast(key as string)), 1, 4) < hex_threshold

Scale: pure map-side Column expressions — zero shuffles, zero RNG state,
trivially parallel at 100 TB, and the same rows are selected by any engine
with a standard md5 (the DuckDB oracles run the identical predicate).

The reference (jackpal/SQLiteDataFrame) has no sampling surface; this module
is part of the training-data pipeline extension (SURVEY.md north-star).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Number of distinct values of the 4-hex-digit hash prefix (16 bits).
_SPACE = 1 << 16


def _hex4(key: Column | str) -> Column:
    """First 4 hex chars of md5(key) — a uniform 16-bit label as a string.

    String form (not an integer) so the identical predicate runs on any
    engine with md5: lowercase-hex substrings compare bytewise the same
    everywhere, with no hex->int conversion portability trap.
    """
    c = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(c.cast("string").cast("binary")), 1, 4)


def hex_threshold(fraction: float) -> str:
    """The cut string so that P[_hex4(key) < cut] ~= fraction.

    Fraction 1.0 returns ``"g000"`` — lexicographically above every hex
    string, so a 100% sample keeps ALL rows (a clamp to ``"ffff"`` with the
    strict ``<`` would silently drop the ~1/65536 keys whose md5 starts
    with ffff)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    cut = int(round(fraction * _SPACE))
    return "g000" if cut >= _SPACE else format(cut, "04x")


def sample_by_hash(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """Deterministic ~``fraction`` sample of ``df`` keyed on ``key``."""
    return df.filter(_hex4(key) < F.lit(hex_threshold(fraction)))


def split_assign(key: Column | str, splits: dict[str, float]) -> Column:
    """Assign each row to a named split with the given proportions.

    ``splits`` maps name -> fraction (must sum to ~1.0). Assignment is by
    cumulative hash threshold, so splits are disjoint, exhaustive, and
    stable: adding rows never moves an existing row between splits.
    """
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1.0, got {total}")
    h = _hex4(key)
    names = list(splits)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += splits[name]
        cond = h < F.lit(hex_threshold(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def stratified_sample(
    df: DataFrame, key: str, stratum: str, fractions: dict[str, float]
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample dominant
    languages, keep all of a rare class). Strata absent from ``fractions``
    are dropped — the common curation shape ("keep x% of web, all of
    wiki"). Still a single map-side filter: the per-stratum threshold is a
    CASE expression, no groupBy, no per-stratum pass.
    """
    thr = None
    for name, frac in fractions.items():
        cond = F.col(stratum) == name
        lit = F.lit(hex_threshold(frac))
        thr = F.when(cond, lit) if thr is None else thr.when(cond, lit)
    if thr is None:
        raise ValueError("fractions must be non-empty")
    return df.filter(_hex4(key) < thr)


def sample_sql_predicate(key_sql: str, fraction: float) -> str:
    """The oracle-side WHERE clause matching :func:`sample_by_hash` —
    kept here so Spark and SQL twins can never drift apart."""
    return f"substr(md5(CAST({key_sql} AS VARCHAR)), 1, 4) < '{hex_threshold(fraction)}'"


def cap_per_class(
    df: DataFrame, class_cols: list[str], key: str, cap: int
) -> DataFrame:
    """Keep at most ``cap`` rows per class, chosen in deterministic
    md5-hash order (random-but-reproducible, like :func:`sample_by_hash`)
    — the per-domain/per-language cap every large-corpus curation recipe
    applies so one dominant source cannot swamp the mixture.

    One shuffle on the class key; the per-class ``row_number`` window is
    partitioned, so parallelism = #classes. For classes so large that a
    single reducer per class is a bottleneck at 100 TB, do the two-phase
    variant instead: count per class, then ``sample_by_hash`` each class at
    ``cap / count`` (approximate cap, fully map-side) — this exact variant
    is the oracle-checkable one.
    """
    from pyspark.sql import Window

    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    w = Window.partitionBy(*class_cols).orderBy(_hex4(key).asc(), F.col(key).asc())
    return (
        df.withColumn("_cap_rn", F.row_number().over(w))
        .filter(F.col("_cap_rn") <= cap)
        .drop("_cap_rn")
    )


def cap_per_class_approx(
    df: DataFrame, class_cols: list[str], key: str, cap: int
) -> DataFrame:
    """The 100 TB variant of :func:`cap_per_class`: approximate per-class
    cap with NO per-class serialization point.

    Two phases: (1) one aggregate computes per-class counts (map-side
    partials, classes are the only rows that shuffle); (2) each class's
    keep-fraction ``cap / count`` becomes an md5-threshold predicate —
    applied as a broadcast-joined map-side filter, so the data pass itself
    is embarrassingly parallel regardless of class sizes. The kept count
    per class is Binomial(count, cap/count) — within ~sqrt(cap) of the
    target, the standard trade for unbounded class sizes.

    The per-class cut string is computed with the same integer rounding as
    :func:`hex_threshold` so results are engine-reproducible (classes at or
    under the cap keep everything via the 'g000' sentinel).
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    counts = df.groupBy(*class_cols).agg(F.count(F.lit(1)).alias("_cnt"))
    space = F.lit(float(_SPACE))
    # Integer cut first, then clamp: keep-rates within ~1/131072 of 1.0
    # round to _SPACE itself, whose hex is 5 digits — lpad(...,4) would
    # TRUNCATE '10000' to '1000' and silently collapse the rate to ~6%.
    # Mirror hex_threshold's `cut >= _SPACE -> 'g000'` clamp instead.
    cut_int = F.round(space * cap / F.col("_cnt")).cast("int")
    cut = F.when(
        (F.col("_cnt") <= cap) | (cut_int >= F.lit(_SPACE)), F.lit("g000")
    ).otherwise(F.lpad(F.lower(F.hex(cut_int)), 4, "0"))
    thresholds = counts.select(*class_cols, cut.alias("_cut"))
    return (
        df.join(F.broadcast(thresholds), on=class_cols)
        .filter(_hex4(key) < F.col("_cut"))
        .drop("_cut")
    )


def weighted_sample_topk(
    df: DataFrame, key: str, weight: str, k: int, key_out: str = "_wkey"
) -> DataFrame:
    """Deterministic weighted sampling without replacement (A-ES / Efraimidis-
    Spirakis): keep the ``k`` rows with the largest ``u^(1/w)`` where ``u``
    is a uniform drawn deterministically from ``md5(key)``.

    Ordering by ``u^(1/w)`` is order-equivalent to ordering by
    ``ln(u)/w`` (exp is monotone), which needs one ``ln`` instead of a
    ``pow`` — fewer transcendental calls and one fewer cross-engine
    rounding hazard. The uniform is the first 8 md5 hex digits as an
    integer, shifted to (0, 1] so ``ln`` never sees 0.

    Scale: the sort key is a pure map-side expression; ``orderBy.limit``
    compiles to Spark's TakeOrdered — each partition keeps its local
    top-k and only k rows per partition reach the driver-side merge, so
    there is no global sort and no full shuffle at any size. This is the
    standard one-pass distributed weighted reservoir.

    The key is rounded to 10 dp so rank order is reproducible across
    engines (the DuckDB oracle computes the identical expression).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h8 = F.substring(F.md5(F.col(key).cast("string").cast("binary")), 1, 8)
    u = (F.conv(h8, 16, 10).cast("bigint") + 1) / F.lit(4294967297.0)
    wkey = F.round(F.log(u) / F.col(weight), 10)
    return (
        df.filter(F.col(weight) > 0)
        .withColumn(key_out, wkey)
        .orderBy(F.col(key_out).desc(), F.col(key))
        .limit(k)
    )


def allocate_token_budget(
    df: DataFrame,
    class_col: str,
    tokens_col: str,
    budget_fraction: float,
    key: str,
) -> DataFrame:
    """Mixture re-balancing under a token budget: give every class an EQUAL
    share of ``budget_fraction * total_tokens``, translate each class's
    share into a keep-rate ``min(1, share / class_tokens)``, and apply it
    as a deterministic md5-threshold filter keyed on ``key``.

    This is the standard "hit the target training mixture" operator:
    over-represented classes (languages, sources) are down-sampled to
    their token share, under-represented ones pass through whole (rate
    caps at 1). Same two-phase shape as :func:`cap_per_class_approx`:

    - phase 1 aggregates per-class token totals — only one row per class
      shuffles;
    - the per-class cut is a broadcast-joined map-side predicate, so the
      data pass is embarrassingly parallel whatever the class sizes; the
      kept token count per class is within ~sqrt(n_class) docs of target.

    All arithmetic uses the same integer threshold rounding as
    :func:`hex_threshold` (+1e-9 nudge before the 0-dp round so both
    engines resolve exact .5 boundaries identically), which keeps results
    engine-reproducible — the suite oracle recomputes the identical plan
    in SQL.
    """
    if not 0.0 < budget_fraction <= 1.0:
        raise ValueError(f"budget_fraction must be in (0, 1], got {budget_fraction}")
    totals = df.groupBy(class_col).agg(F.sum(tokens_col).alias("_class_toks"))
    grand = totals.agg(
        F.sum("_class_toks").alias("_all_toks"), F.count(F.lit(1)).alias("_n_classes")
    )
    rate = F.least(
        F.lit(1.0),
        (F.lit(budget_fraction) * F.col("_all_toks") / F.col("_n_classes"))
        / F.col("_class_toks"),
    )
    # Same clamp as hex_threshold / cap_per_class_approx: a keep-rate in
    # (see also sample_temperature, which shares this threshold machinery)
    # [~0.9999924, 1.0) rounds to _SPACE, whose 5-digit hex would be
    # truncated by lpad(...,4) to '1000' (~6.25%). Clamp cut >= _SPACE to
    # the keep-everything sentinel before formatting.
    cut_int = F.round(rate * _SPACE + F.lit(1e-9)).cast("int")
    cut = F.when(
        (rate >= 1.0) | (cut_int >= F.lit(_SPACE)), F.lit("g000")
    ).otherwise(F.lpad(F.lower(F.hex(cut_int)), 4, "0"))
    thresholds = totals.crossJoin(F.broadcast(grand)).select(
        class_col, cut.alias("_cut")
    )
    return (
        df.join(F.broadcast(thresholds), on=class_col)
        .filter(_hex4(key) < F.col("_cut"))
        .drop("_cut")
    )


def sample_temperature(
    df: DataFrame,
    class_col: str,
    tokens_col: str,
    budget_fraction: float,
    temperature: float,
    key: str,
) -> DataFrame:
    """Temperature-based mixture re-sampling (the multilingual-corpus
    rebalancing rule of XLM-R and friends): class i's share of a
    ``budget_fraction * total_tokens`` budget is
    ``q_i = w_i^(1/T) / sum_j w_j^(1/T)`` where ``w_i`` is the class's
    token mass. T = 1 reproduces natural proportions, T -> infinity
    approaches the uniform split of :func:`allocate_token_budget`, and
    intermediate T up-weights the tail without flattening the head.

    Same two-phase scale shape as the other mixture operators: one
    aggregate (one row per class crosses the exchange), then a
    broadcast-joined map-side md5-threshold predicate — no per-class
    serialization point, deterministic under repartitioning, and
    engine-reproducible (the cut uses hex_threshold's integer rounding
    and >= 2^16 clamp; pow/ln differ across engines by <= 1 ulp,
    absorbed by the 1/65536 threshold granularity).
    """
    if not 0.0 < budget_fraction <= 1.0:
        raise ValueError(f"budget_fraction must be in (0, 1], got {budget_fraction}")
    if temperature <= 0.0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    totals = df.groupBy(class_col).agg(F.sum(tokens_col).alias("_w"))
    powed = totals.withColumn(
        "_wp", F.pow(F.col("_w").cast("double"), F.lit(1.0 / temperature))
    )
    grand = powed.agg(
        F.sum("_wp").alias("_z"), F.sum("_w").alias("_tot")
    )
    rate = F.least(
        F.lit(1.0),
        (F.lit(budget_fraction) * F.col("_tot") * (F.col("_wp") / F.col("_z")))
        / F.col("_w"),
    )
    cut_int = F.round(rate * _SPACE + F.lit(1e-9)).cast("int")
    cut = F.when(
        (rate >= 1.0) | (cut_int >= F.lit(_SPACE)), F.lit("g000")
    ).otherwise(F.lpad(F.lower(F.hex(cut_int)), 4, "0"))
    thresholds = powed.crossJoin(F.broadcast(grand)).select(
        class_col, cut.alias("_cut")
    )
    return (
        df.join(F.broadcast(thresholds), on=class_col)
        .filter(_hex4(key) < F.col("_cut"))
        .drop("_cut")
    )


def curriculum_buckets(
    df: DataFrame,
    score_col: str,
    n_buckets: int = 4,
    agg_cols: dict[str, Column] | None = None,
) -> DataFrame:
    """Partition rows into ``n_buckets`` curriculum stages by quantile
    boundaries of ``score_col`` (easy -> hard ordering for curriculum
    training schedules), returning per-bucket aggregates.

    NOT ntile(): a global ntile is an unpartitioned window — the whole
    corpus serialized through one task, the canonical scale bug this
    repo's own plan audit flags. Instead the (n_buckets - 1) boundaries
    come from one exact ``percentile`` aggregate (swap in
    ``percentile_approx`` beyond memory scale — same plan shape), ride
    back as a 1-row broadcast, and the bucket label is a pure scan-side
    comparison sum ``1 + sum_i(score > q_i)`` — zero windows, one tiny
    agg, one broadcast, fully parallel. Both engines interpolate
    percentiles identically (lower + frac * (upper - lower) on IEEE
    doubles), so bucket assignment is engine-exact.

    ``agg_cols`` maps output name -> aggregate Column over the bucketed
    rows (defaults to count + mean score).
    """
    ps = [(i + 1) / n_buckets for i in range(n_buckets - 1)]
    bounds = df.agg(
        F.expr(
            f"percentile({score_col}, array({', '.join(str(p) for p in ps)}))"
        ).alias("_qs")
    )
    bucket = F.lit(1)
    for i in range(n_buckets - 1):
        bucket = bucket + (
            F.col(score_col) > F.element_at("_qs", i + 1)
        ).cast("int")
    aggs = agg_cols or {
        "n_rows": F.count(F.lit(1)).cast("bigint"),
        "avg_score": F.round(F.avg(score_col), 6),
    }
    return (
        df.join(F.broadcast(bounds))
        .withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(*[c.alias(name) for name, c in aggs.items()])
        .orderBy("bucket")
    )


def dsir_scores(
    docs: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    hex_chars: int = 3,
    round_dp: int = 6,
) -> DataFrame:
    """DSIR-style importance scores: how target-like is each document
    under hashed-n-gram bag-of-words language models (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling").

    Two unigram LMs are estimated over HASHED token buckets (md5 prefix,
    ``16^hex_chars`` buckets — the portable count-min recipe this repo
    uses everywhere hashing must be engine-exact): a TARGET model from
    the rows where ``target_pred`` holds and a RAW model from the whole
    pool. Each bucket's add-0.5-smoothed log-likelihood ratio
    ``ln(((n_t + .5) * (N_r + .5 * B)) / ((n_r + .5) * (N_t + .5 * B)))``
    is a pure function of integer counts, so both engines compute the
    identical double. A document's importance is the MEAN ratio over its
    token occurrences — DSIR's log importance weight normalized by
    length — rounded for cross-engine stability.

    Scale shape at 100 TB: postings carry (id, 12-bit bucket) only —
    the text never shuffles. One partial-aggregated groupBy collapses
    postings to the <= B-row bucket table (input-size-independent, the
    sketch property), which broadcasts back onto the postings for the
    per-document mean (second shuffle on the id). Selection downstream
    is a scan-side filter/top-k on the score — resampling never
    re-touches the text.
    """
    from sqlitedataframe_spark.operators.text import tokens

    n_buckets = 16 ** hex_chars
    postings = docs.select(
        F.col(id_col),
        target_pred.alias("_is_t"),
        F.explode(tokens(text_col)).alias("_tok"),
    ).select(
        id_col,
        "_is_t",
        F.substring(F.md5(F.col("_tok").cast("binary")), 1, hex_chars).alias("_b"),
    )
    buckets = postings.groupBy("_b").agg(
        F.sum(F.col("_is_t").cast("bigint")).alias("_nt"),
        F.count(F.lit(1)).alias("_nr"),
    )
    tot = buckets.agg(
        F.sum("_nt").alias("_tot_t"), F.sum("_nr").alias("_tot_r")
    )
    lam = F.log(
        ((F.col("_nt") + 0.5) * (F.col("_tot_r") + 0.5 * n_buckets))
        / ((F.col("_nr") + 0.5) * (F.col("_tot_t") + 0.5 * n_buckets))
    )
    weighted = buckets.join(F.broadcast(tot)).select("_b", lam.alias("_lam"))
    return (
        postings.join(F.broadcast(weighted), "_b")
        .groupBy(id_col)
        .agg(F.round(F.avg("_lam"), round_dp).alias("dsir_score"))
    )


def negative_sampling_quotas(
    docs: DataFrame,
    text_col: str = "text",
    total: int = 100_000,
    power: float = 0.75,
    k: int = 30,
) -> DataFrame:
    """word2vec-style negative-sampling table: per token, the number of
    negative-sample slots out of ``total`` proportional to
    ``count^power`` (the 3/4-power unigram smoothing of Mikolov et al.
    that keeps rare words drawable). The precomputation behind skip-gram
    negative sampling and contrastive-batch construction.

    One vocabulary-sized count aggregate (partial map-side combine), a
    1-row normalizer broadcast, and scan-side pow/round arithmetic.
    Quotas are ``floor(total * w / Z + 0.5 + 1e-9)`` — the +1e-9 shifts
    the half-even boundary identically on both engines so the ~1-ulp
    normalizer drift can't flip a rounding.
    """
    from sqlitedataframe_spark.operators.text import tokens

    cnt = (
        docs.select(F.explode(tokens(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("_w", F.pow(F.col("_n").cast("double"), F.lit(power)))
    )
    z = cnt.agg(F.sum("_w").alias("_z"))
    return (
        cnt.join(F.broadcast(z))
        .select(
            "tok",
            F.col("_n").cast("bigint").alias("n"),
            F.floor(F.lit(float(total)) * F.col("_w") / F.col("_z") + 0.5 + 1e-9)
            .cast("bigint")
            .alias("quota"),
        )
        .orderBy(F.col("quota").desc(), F.col("tok"))
        .limit(k)
    )


def kfold_assign(
    df: DataFrame,
    key: str,
    n_folds: int = 5,
    group_col: str | None = None,
) -> DataFrame:
    """Deterministic k-fold cross-validation assignment: fold =
    md5-uniform(key) scaled to ``n_folds`` — reproducible across
    engines, reruns, and repartitioning, like every sampler here. With
    ``group_col``, the GROUP is hashed instead (leakage-safe folds: all
    rows of a group land in one fold, the group-split rule applied to
    CV).

    Pure map-side column arithmetic — zero shuffles to assign; fold
    statistics downstream are one small aggregate.
    """
    hash_col = group_col if group_col else key
    u = (
        F.conv(_hex4(hash_col), 16, 10).cast("bigint")
        * n_folds / F.lit(float(_SPACE))
    )
    return df.withColumn("fold", F.floor(u).cast("int"))


def neyman_allocation(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    n_total: int,
    round_dp: int = 6,
) -> DataFrame:
    """Neyman-optimal stratified-sample allocation: stratum h gets
    ``n_h = n_total * N_h*S_h / sum(N_h*S_h)`` — minimum-variance
    allocation of a fixed labeling/inspection budget across strata, the
    survey-sampling complement to the proportional ``sample_stratified``.

    Exactness: the per-stratum variance comes from EXACT integer moments
    (sum, sum of squares over an integer value column), so both engines
    take sqrt of identical doubles; only the final share involves a
    cross-stratum sum of a handful of doubles, rounded.

    Scale shape: one partially-combined aggregate to the #strata frame,
    then a 1-row total broadcast back over it. The fact table is scanned
    once; no windows, no collect.
    """
    per = (
        df.select(F.col(stratum_col).alias("stratum"), F.col(value_col).cast("bigint").alias("_v"))
        .groupBy("stratum")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("_v").cast("bigint").alias("_s"),
            F.sum(F.col("_v") * F.col("_v")).cast("bigint").alias("_q"),
        )
        .withColumn(
            "stddev",
            F.sqrt(
                (F.col("_q") - F.col("_s") * F.col("_s") / F.col("n_rows"))
                / (F.col("n_rows") - 1)
            ),
        )
        .withColumn("_w", F.col("n_rows") * F.col("stddev"))
    )
    tot = per.agg(F.sum("_w").alias("_wt"))
    return (
        per.join(F.broadcast(tot))
        .select(
            "stratum",
            "n_rows",
            F.round("stddev", round_dp).alias("stddev"),
            F.round(F.col("_w") / F.col("_wt"), round_dp).alias("share"),
            F.round(F.lit(n_total) * F.col("_w") / F.col("_wt"), 0)
            .cast("bigint")
            .alias("n_alloc"),
        )
        .orderBy("stratum")
    )


def inverse_propensity_weights(
    pop: DataFrame,
    sample: DataFrame,
    group_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Post-stratification / inverse-propensity weights per group: how
    much each group's sampled rows must be up- or down-weighted so the
    weighted sample matches the population's group shares — the standard
    debiasing step after any non-uniform (cheaper, quota-ed, or
    convenience) sampling pass. weight = (pop share) / (sample share);
    groups absent from the sample come back with NULL weight (they are
    unrecoverable by reweighting — the caller must resample).

    Scale shape: one count aggregate per side to the #groups frame,
    1-row totals broadcast onto it (house stats-row pattern); neither
    input is scanned twice.
    """
    p = pop.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("pop_n")
    )
    s = sample.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("samp_n")
    )
    pt = p.agg(F.sum("pop_n").cast("bigint").alias("_pt"))
    st = s.agg(F.sum("samp_n").cast("bigint").alias("_st"))
    j = (
        p.join(s, "grp", "left")
        .join(F.broadcast(pt))
        .join(F.broadcast(st))
    )
    w = (F.col("pop_n") / F.col("_pt")) / (F.col("samp_n") / F.col("_st"))
    return j.select(
        "grp",
        "pop_n",
        F.coalesce("samp_n", F.lit(0)).cast("bigint").alias("samp_n"),
        F.round(w + 1e-9, round_dp).alias("weight"),
    ).orderBy("grp")


def stratified_reservoir(
    df: DataFrame,
    strata_cols: list[str],
    key: str,
    k: int,
    oversample: int = 16,
) -> DataFrame:
    """Deterministic reservoir of ``k`` rows per stratum with a NEAR-
    SHUFFLE-FREE plan: the shuffle moves ~oversample*k rows per stratum,
    not the stratum (cap_per_class shuffles everything and then ranks;
    this is its 100 TB sibling for small k over huge strata).

    Two phases, both pure functions of the data (so an oracle replays
    them bit-for-bit):
    1. map-side hash gate: keep a row iff ``h32(key) * n_stratum <
       oversample * k * 2^32`` (exact integer compare; h32 = first 8 md5
       hex digits; n from one tiny count aggregate broadcast back). The
       survivors are the ~oversample*k smallest hashes w.h.p. —
       P(fewer than k survive) ~ Poisson(oversample*k < k) ~ 1e-26 at
       the default, and even then both engines agree (the gate replays).
    2. exact rank: row_number over (h32, md5, key) per stratum on the
       survivors only; keep rank <= k.

    Returns the sampled rows + (reservoir_rank). The sample equals "the k
    smallest md5 hashes per stratum" — a uniform simple random sample
    without replacement, stable under any partitioning and any scale.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    kc = F.col(key).cast("string").cast("binary")
    h32 = F.conv(F.substring(F.md5(kc), 1, 8), 16, 10).cast("bigint")
    counts = df.groupBy(*strata_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("_res_n")
    )
    gated = (
        df.join(F.broadcast(counts), strata_cols)
        .withColumn("_res_h", h32)
        .filter(
            # DECIMAL product: h32 < 2^32 times n up to ~1e12 would wrap
            # a bigint product; the oracle mirrors with HUGEINT
            F.col("_res_h").cast("decimal(38,0)") * F.col("_res_n")
            < F.lit(int(oversample) * int(k) * 2**32).cast("decimal(38,0)")
        )
    )
    w = Window.partitionBy(*strata_cols).orderBy(
        F.col("_res_h").asc(), F.md5(kc).asc(), F.col(key).asc()
    )
    return (
        gated.withColumn("reservoir_rank", F.row_number().over(w))
        .filter(F.col("reservoir_rank") <= k)
        .drop("_res_h", "_res_n")
    )


def contrastive_triplets(
    pairs: DataFrame,
    corpus_ids: DataFrame,
    id_col: str = "doc_id",
    min_pos_score: float = 0.5,
    score_col: str = "est_jaccard",
    mult: int = 2_654_435_761,
    offset: int = 13,
) -> DataFrame:
    """(anchor, positive, negative) triplet table for contrastive
    embedding training: positives are near-duplicate pairs above
    ``min_pos_score`` (both directions of each LSH pair — each doc
    anchors once per partner), negatives are drawn by a DETERMINISTIC
    Knuth-style multiplicative hash over the dense id space
    (``(anchor * mult + offset) mod N``), re-rolled once if the draw
    collides with the anchor or the positive — the in-batch-negative
    prep stage of every embedding-model data pipeline, reproducible
    across engines and runs.

    Scale shape: the positive side arrives k-bounded from the LSH
    candidate table (never all-pairs); the negative draw is a pure
    scan-side expression plus one hash join back to the corpus id set
    (to guarantee the drawn id exists); one 1-row count broadcast
    supplies N. Shuffles carry id triples only.
    """
    n_row = corpus_ids.agg(
        F.count(F.lit(1)).cast("bigint").alias("_n")
    )
    # r12: lazily persisted — `pos` feeds both orientations of the anchor
    # union; unpersisted, an expensive upstream (the banded LSH join) ran
    # twice
    from sqlitedataframe_spark.operators.util import register_cache

    pos = register_cache(
        pairs.filter(F.col(score_col) >= min_pos_score).persist()
    )
    anchors = pos.select(
        F.col("id_a").alias("anchor"),
        F.col("id_b").alias("positive"),
        F.col(score_col).alias("pos_score"),
    ).unionByName(
        pos.select(
            F.col("id_b").alias("anchor"),
            F.col("id_a").alias("positive"),
            F.col(score_col).alias("pos_score"),
        )
    )
    # decimal(38,0): anchor * mult exceeds int64 once anchor > ~3.4e9 and
    # Spark int64 would silently wrap (DuckDB HUGEINT stays exact) — wide
    # decimal keeps the draw exact at 100TB-scale id spaces, then the
    # modulo result (< N) drops back to bigint.
    draw0 = (
        (F.col("anchor").cast("decimal(38,0)") * F.lit(mult) + F.lit(offset))
        % F.col("_n")
    ).cast("bigint")
    with_neg = anchors.join(F.broadcast(n_row)).withColumn("_d0", draw0)
    # one deterministic re-roll on collision with anchor or positive
    reroll = (F.col("_d0") + F.lit(1)) % F.col("_n")
    neg = F.when(
        (F.col("_d0") == F.col("anchor")) | (F.col("_d0") == F.col("positive")),
        reroll,
    ).otherwise(F.col("_d0"))
    out = with_neg.withColumn("negative", neg.cast("bigint"))
    # keep only negatives that exist in the corpus (dense ids make this a
    # no-op; sparse ids drop the row rather than emit a phantom id)
    exists = corpus_ids.select(F.col(id_col).alias("negative"))
    return (
        out.join(exists, "negative")
        .select("anchor", "positive", "negative", "pos_score")
        .orderBy("anchor", "positive")
    )


def preference_pairs(
    df: DataFrame,
    group_col: str,
    id_col: str,
    score_col: str,
    top_n: int = 3,
    bottom_n: int = 3,
    min_margin: float = 0.2,
    round_dp: int = 6,
) -> DataFrame:
    """(chosen, rejected) preference-pair mining per group: the ``top_n``
    highest-scored items crossed with the ``bottom_n`` lowest-scored,
    kept when the score gap clears ``min_margin`` — the heuristic-signal
    stage that builds reward-model / DPO training pairs before any human
    labels exist (pair quality extremes WITHIN a group so the contrast
    is attributable to content, not to the group).

    Determinism: both rank windows carry the id tiebreaker; the margin
    is a difference of already-rounded scores. Scale: the windows
    partition by group (bounded by group size — use the two-level
    bottom-k pattern if single groups outgrow a task), and the cross is
    top_n x bottom_n per group, never data-sized.
    """
    from pyspark.sql import Window

    wd = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    wa = Window.partitionBy(group_col).orderBy(
        F.col(score_col).asc(), F.col(id_col).asc()
    )
    base = df.select(group_col, id_col, score_col)
    top = (
        base.withColumn("_rn", F.row_number().over(wd))
        .filter(F.col("_rn") <= top_n)
        .select(
            group_col,
            F.col(id_col).alias("chosen"),
            F.col(score_col).alias("chosen_score"),
        )
    )
    bot = (
        base.withColumn("_rn", F.row_number().over(wa))
        .filter(F.col("_rn") <= bottom_n)
        .select(
            group_col,
            F.col(id_col).alias("rejected"),
            F.col(score_col).alias("rejected_score"),
        )
    )
    return (
        top.join(bot, group_col)
        .filter(F.col("chosen") != F.col("rejected"))
        # a group smaller than top_n + bottom_n ranks the same doc in
        # both windows and could pair a LOWER-scored chosen with a
        # higher-scored rejected; correctness must not depend on the
        # caller passing min_margin > 0, so exclude inverted/flat pairs
        # outright (ADVICE r10)
        .filter(F.col("chosen_score") > F.col("rejected_score"))
        .select(
            group_col,
            "chosen",
            "rejected",
            "chosen_score",
            "rejected_score",
            F.round(
                F.col("chosen_score") - F.col("rejected_score") + 1e-9,
                round_dp,
            ).alias("margin"),
        )
        .filter(F.col("margin") >= min_margin)
        .orderBy(group_col, "chosen", "rejected")
    )


def systematic_pps(
    df: DataFrame,
    key_col: str,
    weight_col: Column | str,
    n: int,
    seed: str = "pps-v1",
    n_shards: int = 256,
) -> DataFrame:
    """Systematic PPS (probability-proportional-to-size) sample: rows
    are laid on a weight line in deterministic md5-hash order, the line
    is cut into ``n`` equal intervals of length I = W div n, and one
    point r + j*I (r = md5(seed) mod I) is drawn per interval — the
    classic survey-sampling design where a row of weight w receives
    ``picks ~ w / I`` hits (large rows can be hit multiple times), and
    every pick estimates exactly I units of weight mass.

    Everything is INTEGER arithmetic: weights are exact BIGINTs, the
    pick count of the span [cum_prev, cum) is g(cum-1) - g(cum_prev-1)
    with g(x) = (x - r + I) div I - 1 (the +I offset keeps the dividend
    non-negative, so truncating and flooring division agree on every
    engine). No floats anywhere until a caller divides for a ratio.

    Scale shape (distributed prefix sum): the hash order is
    (h, key); the leading 8 bits of h define ``n_shards`` ORDER-ALIGNED
    shards, per-shard weight totals produce shard offsets via a bounded
    n_shards-row triangular join (the adjudicated bucket-offset
    pattern), and the intra-shard running sum is a window over shard
    partitions — no global window, no single-task sort.

    Returns one row per input row: (key, weight w, h, cum_prev, cum,
    picks) with ``sum(picks) == n`` exactly.
    """
    from pyspark.sql import Window

    wc = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    hexd = F.md5(F.col(key_col).cast("string").cast("binary"))
    h = F.conv(F.substring(hexd, 1, 12), 16, 10).cast("bigint")
    # leading-8-bit shard: shard order == hash order, so shard offsets +
    # intra-shard cumsums compose to the global prefix sum
    shard = F.conv(F.substring(hexd, 1, 2), 16, 10).cast("int")
    base = df.select(
        F.col(key_col),
        wc.cast("bigint").alias("w"),
        h.alias("h"),
        shard.alias("_shard"),
    )
    sw = base.groupBy("_shard").agg(F.sum("w").alias("_sw"))
    off = (
        sw.alias("x")
        .join(
            F.broadcast(sw.select("_shard", "_sw").alias("y")),
            F.expr("y._shard < x._shard"),
            "left",
        )
        .groupBy(F.col("x._shard").alias("_shard"))
        .agg(F.coalesce(F.sum("y._sw"), F.lit(0)).cast("bigint").alias("_off"))
    )
    wseed = F.conv(
        F.substring(F.md5(F.lit(seed).cast("binary")), 1, 12), 16, 10
    ).cast("bigint")
    tot = sw.agg(F.sum("_sw").cast("bigint").alias("_wtot")).select(
        "_wtot",
        F.expr(f"_wtot div {n}").alias("ival"),
    ).select("_wtot", "ival", (wseed % F.col("ival")).alias("_r"))
    wcum = Window.partitionBy("_shard").orderBy("h", key_col)
    c = (
        base.join(F.broadcast(off), "_shard")
        .withColumn("_cin", F.sum("w").over(wcum))
        .withColumn("cum", F.col("_off") + F.col("_cin"))
        .withColumn("cum_prev", F.col("cum") - F.col("w"))
        .join(F.broadcast(tot))
    )
    g_hi = F.expr("(cum - 1 - _r + ival) div ival - 1")
    g_lo = F.expr("(cum_prev - 1 - _r + ival) div ival - 1")
    return c.select(
        key_col,
        "w",
        "h",
        "cum_prev",
        "cum",
        "ival",
        (g_hi - g_lo).cast("bigint").alias("picks"),
    )
