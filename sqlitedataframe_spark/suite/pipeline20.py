"""Round-12 wave 4: the set-operation sketch and sequence/decision
operators a 100 TB curation stack still lacked.

- KMV/theta sketches (`operators/sketch.py kmv_*`): bounded distinct
  summaries that — unlike HLL — support INTERSECTION / Jaccard
  estimates between groups, plus the union-merge law proven through
  the driver (`agg_kmv_merge`'s oracle is the one-shot sketch).
- MATCH_RECOGNIZE-style row-pattern matching
  (`operators/mining.py path_pattern_stats`) — the sequence operator
  Spark's SQL surface lacks (Trino/Oracle MATCH_RECOGNIZE, Flink CEP),
  expressed as ordered per-user path strings + portable-core regex.
- Sequential decision (SPRT) over the daily experiment stream, with
  pre-computed double literals so NO libm call appears on either
  engine (`events_sprt_sequential`).
- Krippendorff's alpha (multi-annotator nominal agreement — the
  labeling-pipeline health metric beyond pairwise Cohen's kappa).
- Qini/uplift curve over score thresholds (`eval_qini_uplift`) — the
  targeting readout for treatment-effect models.
- Systematic PPS sampling (`operators/sampling.py systematic_pps`)
  with the all-integer pick-count identity and a distributed prefix
  sum (no global window).
- Croston/SBA intermittent-demand forecast (closed-form means variant
  — pure aggregates, zero windows).
- Silence-gap detection per event type (the gaps-and-islands kernel,
  two-level so no window ever exceeds a day/partition frame).
- Linear CKA between embedding views (`operators/similarity.py
  linear_cka_views`) — representation-similarity with exact
  integer/DECIMAL internals and float only in the two published
  ratios.

Determinism tools reused: md5-derived integers, integer-exact
cumulatives, single-IEEE-operation float trees, decimal-literal
constants instead of libm, and ROUND(x + 1e-9, dp) on every published
float. No Decimal-typed output cell leaves any query (the r12
convention): DECIMAL(38,0) arithmetic stays internal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sqlitedataframe_spark.operators.mining import path_pattern_stats
from sqlitedataframe_spark.operators.sampling import systematic_pps
from sqlitedataframe_spark.operators.similarity import linear_cka_views
from sqlitedataframe_spark.operators.sketch import (
    _KMV_SPACE,
    kmv_merge_rank,
    kmv_sketch,
    kmv_theta_summary,
)
from sqlitedataframe_spark.suite import query
from sqlitedataframe_spark.suite.relational import T

_KMV_K = 128
_KMV_SPACE_SQL = "281474976710656"  # 2^48 as an integer literal


def shared_month_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distinct (ship-month, partkey) frame both KMV queries sketch
    and exact-check — one distinct pass over lineitem, persisted via the
    documented shared-cache lifecycle (util.shared_eager_cache): without
    it every downstream consumer (sketch build, exact month-pair
    intersection, per-month counts) re-runs the 5M-row distinct, which
    the 10x scale check measured as the whole cost of the query."""
    from sqlitedataframe_spark.operators.util import shared_eager_cache

    return shared_eager_cache(
        spark,
        ("month_parts", sf_dir),
        lambda: T(spark, sf_dir, "lineitem")
        .select(
            F.date_trunc("month", "l_shipdate").cast("date").alias("m"),
            F.col("l_partkey").alias("p"),
        )
        .distinct(),
    )

# Shared oracle prefix: per-month distinct part sets and their KMV
# sketches (the one-shot construction both KMV queries compare against).
_KMV_CTE = f"""
    WITH mp AS (
      SELECT DISTINCT CAST(date_trunc('month', l_shipdate) AS DATE) AS m,
                      l_partkey AS p
      FROM lineitem),
    dh AS (
      SELECT DISTINCT m,
             CAST('0x' || substr(md5(CAST(p AS VARCHAR)), 1, 12) AS BIGINT)
               AS h
      FROM mp),
    sk AS (
      SELECT m, h FROM (
        SELECT m, h, ROW_NUMBER() OVER (PARTITION BY m ORDER BY h) AS rnk
        FROM dh)
      WHERE rnk <= {_KMV_K}),
    th AS (
      SELECT m, COUNT(*) AS n_sk,
             CASE WHEN COUNT(*) >= {_KMV_K} THEN MAX(h)
                  ELSE {_KMV_SPACE_SQL} END AS theta
      FROM sk GROUP BY m),
    mo AS (SELECT m, COUNT(*) AS n_m FROM mp GROUP BY m)
"""


@query(
    "agg_kmv_intersect",
    oracle=_KMV_CTE
    + f""",
    pairs AS (
      SELECT a.m AS m, b.m AS mb, LEAST(a.theta, b.theta) AS theta
      FROM th a JOIN th b ON b.m = CAST(a.m + INTERVAL 1 MONTH AS DATE)),
    uh AS (
      SELECT pr.m, s.h, 1 AS ina, 0 AS inb
      FROM pairs pr JOIN sk s ON s.m = pr.m
      UNION ALL
      SELECT pr.m, s.h, 0, 1
      FROM pairs pr JOIN sk s ON s.m = pr.mb),
    un AS (
      SELECT m, h, MAX(ina) AS ina, MAX(inb) AS inb FROM uh GROUP BY m, h),
    cnt AS (
      SELECT u.m,
             SUM(CASE WHEN u.h < pr.theta THEN 1 ELSE 0 END) AS kmv_union,
             SUM(CASE WHEN u.h < pr.theta AND u.ina = 1 AND u.inb = 1
                      THEN 1 ELSE 0 END) AS kmv_inter
      FROM un u JOIN pairs pr ON pr.m = u.m GROUP BY u.m),
    ex AS (
      SELECT pr.m, COUNT(*) AS exact_inter
      FROM pairs pr
      JOIN mp a ON a.m = pr.m
      JOIN mp b ON b.m = pr.mb AND b.p = a.p
      GROUP BY pr.m)
    SELECT pr.m AS month, ma.n_m AS exact_a, mb2.n_m AS exact_b,
           COALESCE(ex.exact_inter, 0) AS exact_inter,
           ma.n_m + mb2.n_m - COALESCE(ex.exact_inter, 0) AS exact_union,
           CAST(c.kmv_union AS BIGINT) AS kmv_union,
           CAST(c.kmv_inter AS BIGINT) AS kmv_inter,
           ROUND(CAST(c.kmv_union AS DOUBLE) * {_KMV_SPACE_SQL}.0
                   / pr.theta + 1e-9, 1) AS est_union,
           ROUND(CAST(c.kmv_inter AS DOUBLE) * {_KMV_SPACE_SQL}.0
                   / pr.theta + 1e-9, 1) AS est_inter,
           ROUND(CAST(COALESCE(ex.exact_inter, 0) AS DOUBLE)
                   / (ma.n_m + mb2.n_m - COALESCE(ex.exact_inter, 0))
                 + 1e-9, 6) AS jaccard_exact,
           ROUND(CASE WHEN c.kmv_union > 0
                      THEN CAST(c.kmv_inter AS DOUBLE) / c.kmv_union
                      ELSE 0 END + 1e-9, 6) AS jaccard_est
    FROM pairs pr
    JOIN mo ma ON ma.m = pr.m
    JOIN mo mb2 ON mb2.m = pr.mb
    JOIN cnt c ON c.m = pr.m
    LEFT JOIN ex ON ex.m = pr.m
    ORDER BY month
    """,
)
def agg_kmv_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month part-catalog overlap estimated from KMV/theta
    sketches — the set-OPERATION capability HLL cannot provide: two
    groups' bottom-k hash samples share a comparable region below the
    pairwise theta = min(theta_a, theta_b), so intersection / Jaccard /
    union are all estimable from 2 x 128 retained hashes regardless of
    input size, next to the exact answer for the realized error.

    The 100 TB shape: per-shard sketches merge by union + re-rank
    (agg_kmv_merge proves the law), and any pair of feeds/snapshots
    compares in O(k) — the "how much does today's crawl overlap
    yesterday's" probe that would otherwise be a distinct-join over the
    full corpus.

    Exactness: hashes are md5-prefix integers, counts are integers,
    and the only floats are the two single-divide estimates and
    ratios, published via ROUND(x + 1e-9, dp).
    """
    mp = shared_month_parts(spark, sf_dir)
    # The sketch IS bounded mergeable state (#months x k rows — that is
    # the entire point of a KMV summary): run the heavy distinct+rank
    # pass ONCE, collect the tiny state, and do the pairwise set
    # arithmetic driver-side in exact integers (the adjudicated
    # bounded-model-state collect class — same as centroids/BPE merge
    # tables; a DataFrame re-expression would re-run the sketch lineage
    # per consumer and pay ~15 micro-shuffles for 10k rows). Float
    # estimates are NOT computed in Python: the integer pair stats go
    # back into a local DataFrame and the single-divide/ROUND trees run
    # in Spark, matching the oracle's expressions operation for
    # operation.
    sk_rows = (
        kmv_sketch(mp, ["m"], "p", k=_KMV_K).select("m", "h").collect()
    )
    by_month: dict = {}
    for r in sk_rows:
        by_month.setdefault(r["m"], set()).add(r["h"])
    months = sorted(by_month)
    theta_of = {
        m: (max(hs) if len(hs) >= _KMV_K else _KMV_SPACE)
        for m, hs in by_month.items()
    }
    pair_rows = []
    for ma, mb in zip(months, months[1:]):
        if (mb.year * 12 + mb.month) - (ma.year * 12 + ma.month) != 1:
            continue
        theta = min(theta_of[ma], theta_of[mb])
        a, b = by_month[ma], by_month[mb]
        ku = sum(1 for h in a | b if h < theta)
        ki = sum(1 for h in a & b if h < theta)
        pair_rows.append((ma, mb, theta, ku, ki))
    pairs = spark.createDataFrame(
        pair_rows,
        schema="m date, mb date, theta bigint, kmv_union bigint, "
        "kmv_inter bigint",
    )
    mo = mp.groupBy("m").agg(F.count(F.lit(1)).cast("bigint").alias("n_m"))
    # exact month-over-month intersection: ONE self-join pass on the
    # part key (equi), instead of two separate pair-spine joins
    ex = (
        mp.alias("x")
        .join(
            mp.select(
                F.add_months("m", -1).alias("m"), F.col("p")
            ).alias("y"),
            ["m", "p"],
        )
        .groupBy("m")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_inter"))
    )
    space = F.lit(float(_KMV_SPACE))
    out = (
        pairs.join(mo.select(F.col("m"), F.col("n_m").alias("exact_a")), "m")
        .join(
            mo.select(F.col("m").alias("mb"), F.col("n_m").alias("exact_b")),
            "mb",
        )
        .join(ex, "m", "left")
        .withColumn("exact_inter", F.coalesce("exact_inter", F.lit(0)))
        .withColumn(
            "exact_union",
            F.col("exact_a") + F.col("exact_b") - F.col("exact_inter"),
        )
    )
    return out.select(
        F.col("m").alias("month"),
        "exact_a",
        "exact_b",
        "exact_inter",
        "exact_union",
        "kmv_union",
        "kmv_inter",
        F.round(
            F.col("kmv_union").cast("double") * space / F.col("theta") + 1e-9,
            1,
        ).alias("est_union"),
        F.round(
            F.col("kmv_inter").cast("double") * space / F.col("theta") + 1e-9,
            1,
        ).alias("est_inter"),
        F.round(
            F.col("exact_inter").cast("double") / F.col("exact_union") + 1e-9,
            6,
        ).alias("jaccard_exact"),
        F.round(
            F.when(
                F.col("kmv_union") > 0,
                F.col("kmv_inter").cast("double") / F.col("kmv_union"),
            ).otherwise(0.0)
            + 1e-9,
            6,
        ).alias("jaccard_est"),
    ).orderBy("month")


@query(
    "agg_kmv_merge",
    oracle=_KMV_CTE
    + f""",
    exd AS (SELECT m, COUNT(*) AS exact_distinct FROM mp GROUP BY m)
    SELECT t.m AS month, CAST(t.n_sk AS BIGINT) AS n_sk,
           CAST(t.theta AS BIGINT) AS theta,
           ROUND(CAST(t.n_sk AS DOUBLE) * {_KMV_SPACE_SQL}.0 / t.theta
                 + 1e-9, 1) AS est_distinct,
           CAST(e.exact_distinct AS BIGINT) AS exact_distinct,
           ROUND((CAST(t.n_sk AS DOUBLE) * {_KMV_SPACE_SQL}.0 / t.theta
                  - e.exact_distinct) / e.exact_distinct + 1e-9, 6)
             AS rel_err
    FROM th t JOIN exd e USING (m)
    ORDER BY month
    """,
)
def agg_kmv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge == one-shot for the KMV sketch: the per-month part set is
    cut into 3 shards (p % 3), each shard reduces to its own bottom-128
    distinct-hash state, and the states union + re-rank
    (operators/sketch.py kmv_merge_rank) into the published sketch
    summary. The ORACLE is the ONE-SHOT sketch over the whole month:
    driver hash equality proves the mergeability law (the k smallest
    hashes of a union are among the concatenation of each shard's k
    smallest) — what lets 1000 executors sketch a 100 TB corpus and
    roll the states up without re-reading data.

    The readout is the theta estimator n_sk * 2^48 / theta (exact
    = n_sk when the group holds under k distinct hashes), next to the
    exact distinct count and the realized relative error.
    """
    mp = shared_month_parts(spark, sf_dir)
    states = kmv_sketch(
        mp.withColumn("sh", F.col("p") % 3), ["m", "sh"], "p", k=_KMV_K
    ).select("m", "h")
    # merged sketch = bounded state (#months x k rows): pin it so the
    # theta readout doesn't re-run the shard-sketch lineage
    merged = spark.createDataFrame(
        kmv_merge_rank(states, ["m"], k=_KMV_K).select("m", "h").collect(),
        schema="m date, h bigint",
    )
    th = kmv_theta_summary(merged, ["m"], k=_KMV_K)
    exd = mp.groupBy("m").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_distinct")
    )
    est = F.col("n_sk").cast("double") * F.lit(float(_KMV_SPACE)) / F.col(
        "theta"
    )
    return (
        th.join(exd, "m")
        .select(
            F.col("m").alias("month"),
            "n_sk",
            F.col("theta").cast("bigint").alias("theta"),
            F.round(est + 1e-9, 1).alias("est_distinct"),
            "exact_distinct",
            F.round(
                (est - F.col("exact_distinct")) / F.col("exact_distinct")
                + 1e-9,
                6,
            ).alias("rel_err"),
        )
        .orderBy("month")
    )


_PAT = "S[CV]*P"
_PAT_SQL = f"""
    WITH p AS (
      SELECT user_id, COUNT(*) AS n_events,
             string_agg(CASE event_type WHEN 'signup' THEN 'S'
                                        WHEN 'click' THEN 'C'
                                        WHEN 'view' THEN 'V'
                                        WHEN 'purchase' THEN 'P'
                                        WHEN 'error' THEN 'E'
                                        ELSE '_' END,
                        '' ORDER BY ts, event_id) AS path
      FROM events GROUP BY user_id)
    SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
           CAST(length(path) AS INT) AS path_len,
           CAST(len(regexp_extract_all(path, '{_PAT}')) AS INT) AS n_matches,
           CAST(CASE WHEN regexp_extract(path, '{_PAT}') = '' THEN 0
                     ELSE strpos(path, regexp_extract(path, '{_PAT}'))
                END AS INT) AS first_match_pos,
           CAST(COALESCE(list_max(list_transform(
                  regexp_extract_all(path, '{_PAT}'), x -> length(x))), 0)
                AS INT) AS longest_match_len,
           CAST(COALESCE(list_sum(list_transform(
                  regexp_extract_all(path, '{_PAT}'), x -> length(x))), 0)
                AS BIGINT) AS matched_chars
    FROM p ORDER BY user_id
"""


@query("events_pattern_match", oracle=_PAT_SQL)
def events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style row-pattern matching over the clickstream
    (operators/mining.py path_pattern_stats): each user's history
    becomes an ordered single-char string (S=signup C=click V=view
    P=purchase E=error) and the conversion pattern S[CV]*P — a signup,
    any browsing, then a purchase with no intervening error/signup —
    is counted with non-overlapping leftmost-greedy semantics, exactly
    MATCH_RECOGNIZE ... AFTER MATCH SKIP PAST LAST ROW.

    This is the sequence operator Spark SQL lacks (Trino/Oracle
    MATCH_RECOGNIZE, Flink CEP); the path-string encoding keeps it one
    shuffle on user_id with per-user-bounded state, and the regex core
    (classes + star) is portable: Java (Spark) and RE2 (DuckDB) are
    leftmost-greedy-identical on it. All-integer output.
    """
    e = T(spark, sf_dir, "events")
    return path_pattern_stats(
        e,
        "user_id",
        "ts",
        "event_type",
        {
            "signup": "S",
            "click": "C",
            "view": "V",
            "purchase": "P",
            "error": "E",
        },
        _PAT,
        "event_id",
    ).orderBy("user_id")


# SPRT constants, precomputed as decimal literals so NEITHER engine
# calls libm: H0 p0=0.17 vs H1 p1=0.21, alpha=beta=0.05.
#   L1 = ln(0.21/0.17) = 0.21130909366720677 -> 2.1130909e-1
#   L0 = ln(0.79/0.83) = -0.049392755329576356 -> -4.9392755e-2
#   thr = ln(0.95/0.05) = 2.9444389791664403 -> 2.9444390e0
_SPRT_L1 = 2.1130909e-1
_SPRT_L0 = -4.9392755e-2
_SPRT_THR = 2.9444390


@query(
    "events_sprt_sequential",
    oracle=f"""
    WITH d AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
             CAST(ts AS DATE) AS day, COUNT(*) AS t,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS s
      FROM events GROUP BY 1, 2),
    c AS (
      SELECT arm, day,
             SUM(t) OVER (PARTITION BY arm ORDER BY day) AS cum_trials,
             SUM(s) OVER (PARTITION BY arm ORDER BY day) AS cum_succ
      FROM d),
    l AS (
      SELECT arm, day, CAST(cum_trials AS BIGINT) AS cum_trials,
             CAST(cum_succ AS BIGINT) AS cum_succ,
             ROUND(CAST(cum_succ AS DOUBLE) * {_SPRT_L1!r}
                   + CAST(cum_trials - cum_succ AS DOUBLE) * ({_SPRT_L0!r})
                   + 1e-9, 6) AS llr
      FROM c),
    st AS (
      SELECT *, CASE WHEN llr >= {_SPRT_THR!r} THEN 'accept_h1'
                     WHEN llr <= -{_SPRT_THR!r} THEN 'accept_h0'
                     ELSE 'continue' END AS state
      FROM l),
    cd AS (SELECT arm, MIN(day) AS dday FROM st
           WHERE state <> 'continue' GROUP BY arm)
    SELECT st.arm, st.day, st.cum_trials, st.cum_succ, st.llr, st.state,
           COALESCE(st.day >= cd.dday, FALSE) AS decided
    FROM st LEFT JOIN cd USING (arm)
    ORDER BY arm, day
    """,
)
def events_sprt_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential probability-ratio test (Wald SPRT) on the daily
    purchase-conversion stream, per experiment arm (user_id parity):
    the cumulative log-likelihood ratio for H1: p=0.21 vs H0: p=0.17
    is published per day with the accept/continue state and the
    first-crossing flag — the "stop the experiment as soon as the
    evidence suffices" monitor an always-on A/B platform runs nightly.

    Exactness: cum_trials/cum_succ are INTEGER window cumsums over the
    <= #days post-aggregate frame (partitioned by arm — never a global
    window); the LLR is two multiplies + one add on those integers
    against PRE-COMPUTED decimal literals (no ln() on either engine;
    e-notation literals parse to identical doubles in Spark and
    DuckDB, where a bare 0.21... literal would be DECIMAL-typed), and
    the crossing decision compares the ROUNDED llr so both engines
    branch on bit-identical values.
    """
    e = T(spark, sf_dir, "events")
    daily = e.groupBy(
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("arm"),
        F.to_date("ts").alias("day"),
    ).agg(
        F.count(F.lit(1)).alias("t"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("s"),
    )
    w = Window.partitionBy("arm").orderBy("day")
    c = daily.select(
        "arm",
        "day",
        F.sum("t").over(w).cast("bigint").alias("cum_trials"),
        F.sum("s").over(w).cast("bigint").alias("cum_succ"),
    )
    llr = F.round(
        F.col("cum_succ").cast("double") * F.lit(_SPRT_L1)
        + (F.col("cum_trials") - F.col("cum_succ")).cast("double")
        * F.lit(_SPRT_L0)
        + 1e-9,
        6,
    )
    st = c.withColumn("llr", llr).withColumn(
        "state",
        F.when(F.col("llr") >= _SPRT_THR, "accept_h1")
        .when(F.col("llr") <= -_SPRT_THR, "accept_h0")
        .otherwise("continue"),
    )
    cd = (
        st.filter(F.col("state") != "continue")
        .groupBy("arm")
        .agg(F.min("day").alias("dday"))
    )
    return (
        st.join(cd, "arm", "left")
        .select(
            "arm",
            "day",
            "cum_trials",
            "cum_succ",
            "llr",
            "state",
            F.coalesce(F.col("day") >= F.col("dday"), F.lit(False)).alias(
                "decided"
            ),
        )
        .orderBy("arm", "day")
    )


# Deterministic 3-annotator construction shared by the Spark and SQL
# sides: annotator j relabels a doc to a noise category 'xx0'..'xx2'
# with hash probability (10 + 5j)%, else reports the true lang.
_KRIPP_SQL = """
    WITH u0 AS (
      SELECT d.doc_id, j.j AS ann, d.lang,
             CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' ||
                                      CAST(j.j AS VARCHAR)), 1, 6)
                  AS BIGINT) % 100 AS u
      FROM documents d CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS j) j),
    r AS (
      SELECT doc_id, ann,
             CASE WHEN u < 10 + 5 * ann
                  THEN 'xx' || CAST(u % 3 AS VARCHAR)
                  ELSE lang END AS label
      FROM u0),
    p AS (
      SELECT COUNT(*) AS disagree
      FROM r a JOIN r b
        ON a.doc_id = b.doc_id AND a.ann < b.ann AND a.label <> b.label),
    nc AS (SELECT label, COUNT(*) AS c FROM r GROUP BY label),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
                   CAST(SUM(c * c) AS BIGINT) AS s,
                   COUNT(*) AS n_cats
            FROM nc)
    SELECT CAST(t.n // 3 AS BIGINT) AS n_units,
           t.n AS n_ratings,
           CAST(t.n_cats AS INT) AS n_categories,
           CAST(p.disagree AS BIGINT) AS disagree_pairs,
           ROUND(CAST(t.n - p.disagree AS DOUBLE) / t.n + 1e-9, 6)
             AS p_agree,
           ROUND(CAST(t.n * t.n - t.s AS DOUBLE) / (t.n * (t.n - 1))
                 + 1e-9, 6) AS exp_disagree,
           ROUND(1.0e0 - CAST(p.disagree * (t.n - 1) AS DOUBLE)
                           / CAST(t.n * t.n - t.s AS DOUBLE)
                 + 1e-9, 6) AS alpha
    FROM tot t CROSS JOIN p
"""


@query("eval_krippendorff_alpha", oracle=_KRIPP_SQL)
def eval_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (nominal) over a deterministic 3-annotator
    relabeling of the documents table — the chance-corrected
    multi-annotator agreement metric a labeling pipeline tracks per
    batch (Cohen's kappa, already in the suite, only handles exactly
    two raters; alpha generalizes to any m with missing data).

    Closed form from exact integers: with every unit carrying m=3
    ratings, observed disagreement Do = P/n (P = disagreeing unordered
    pairs, n = total ratings) and expected disagreement
    De = (n^2 - sum_c n_c^2) / (n(n-1)), so
    alpha = 1 - P(n-1)/(n^2 - sum n_c^2) — one integer-exact fraction,
    one divide. The per-unit pair join is bounded (3 ratings/unit);
    the two 1-row aggregates cross at the end (adjudicated).
    """
    d = T(spark, sf_dir, "documents")
    j = d.select(
        "doc_id",
        "lang",
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("ann"),
    )
    u = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("ann").cast("string"),
                ).cast("binary")
            ),
            1,
            6,
        ),
        16,
        10,
    ).cast("bigint") % 100
    r = j.select(
        "doc_id",
        "ann",
        F.when(
            u < 10 + 5 * F.col("ann"),
            F.concat(F.lit("xx"), (u % 3).cast("string")),
        )
        .otherwise(F.col("lang"))
        .alias("label"),
    )
    p = (
        r.alias("a")
        .join(
            r.alias("b"),
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.ann") < F.col("b.ann"))
            & (F.col("a.label") != F.col("b.label")),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("disagree"))
    )
    nc = r.groupBy("label").agg(F.count(F.lit(1)).alias("c"))
    tot = nc.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("int").alias("n_cats"),
    )
    out = tot.join(p)
    return out.select(
        F.expr("n div 3").cast("bigint").alias("n_units"),
        F.col("n").alias("n_ratings"),
        F.col("n_cats").alias("n_categories"),
        F.col("disagree").alias("disagree_pairs"),
        F.round(
            (F.col("n") - F.col("disagree")).cast("double") / F.col("n")
            + 1e-9,
            6,
        ).alias("p_agree"),
        F.round(
            (F.col("n") * F.col("n") - F.col("s")).cast("double")
            / (F.col("n") * (F.col("n") - 1))
            + 1e-9,
            6,
        ).alias("exp_disagree"),
        F.round(
            F.lit(1.0)
            - (F.col("disagree") * (F.col("n") - 1)).cast("double")
            / (F.col("n") * F.col("n") - F.col("s")).cast("double")
            + 1e-9,
            6,
        ).alias("alpha"),
    )


@query(
    "eval_qini_uplift",
    oracle="""
    WITH u AS (
      SELECT user_id, CAST(user_id % 2 AS INT) AS treat,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS conv,
             SUM(CASE WHEN event_type IN ('click', 'view') THEN 1 ELSE 0 END)
               AS score
      FROM events GROUP BY user_id),
    g AS (
      SELECT score, SUM(treat) AS nt, SUM(1 - treat) AS nc,
             SUM(treat * conv) AS st, SUM((1 - treat) * conv) AS sc
      FROM u GROUP BY score),
    c AS (
      SELECT x.score, SUM(y.nt) AS cum_nt, SUM(y.nc) AS cum_nc,
             SUM(y.st) AS cum_conv_t, SUM(y.sc) AS cum_conv_c
      FROM g x JOIN g y ON y.score >= x.score GROUP BY x.score)
    SELECT CAST(score AS BIGINT) AS score,
           CAST(cum_nt AS BIGINT) AS cum_nt,
           CAST(cum_nc AS BIGINT) AS cum_nc,
           CAST(cum_conv_t AS BIGINT) AS cum_conv_t,
           CAST(cum_conv_c AS BIGINT) AS cum_conv_c,
           ROUND(CASE WHEN cum_nt > 0 AND cum_nc > 0
                      THEN CAST(cum_conv_t AS DOUBLE) / cum_nt
                           - CAST(cum_conv_c AS DOUBLE) / cum_nc
                 END + 1e-9, 6) AS uplift,
           ROUND(CASE WHEN cum_nc > 0
                      THEN cum_conv_t
                           - CAST(cum_conv_c AS DOUBLE) * cum_nt / cum_nc
                 END + 1e-9, 4) AS qini
    FROM c ORDER BY score DESC
    """,
)
def eval_qini_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini / uplift curve over engagement-score thresholds: users split
    into treated (user_id odd) and control, a deterministic proxy
    model score (click+view count) ranks them, and each threshold row
    publishes cumulative treated/control counts and conversions, the
    incremental uplift, and the Qini value
    cum_conv_t - cum_conv_c * cum_nt / cum_nc — the targeting readout
    that decides how deep a treatment-effect model is worth acting on.

    Shape: one per-user aggregate, then per-SCORE-VALUE aggregates
    (bounded by max per-user engagement, not user count), cumulated by
    the adjudicated bounded triangular self-join over that score frame
    — the suite's standard alternative to an unpartitioned window.
    Counts exact integers; uplift/qini are single-divide trees.
    """
    e = T(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
        F.sum(
            F.when(F.col("event_type").isin("click", "view"), 1).otherwise(0)
        ).alias("score"),
    ).withColumn("treat", (F.col("user_id") % 2).cast("int"))
    g = u.groupBy("score").agg(
        F.sum("treat").alias("nt"),
        F.sum(1 - F.col("treat")).alias("nc"),
        F.sum(F.col("treat") * F.col("conv")).alias("st"),
        F.sum((1 - F.col("treat")) * F.col("conv")).alias("sc"),
    )
    c = (
        g.alias("x")
        .join(
            F.broadcast(g.select("score", "nt", "nc", "st", "sc").alias("y")),
            F.expr("y.score >= x.score"),
        )
        .groupBy(F.col("x.score").alias("score"))
        .agg(
            F.sum("y.nt").cast("bigint").alias("cum_nt"),
            F.sum("y.nc").cast("bigint").alias("cum_nc"),
            F.sum("y.st").cast("bigint").alias("cum_conv_t"),
            F.sum("y.sc").cast("bigint").alias("cum_conv_c"),
        )
    )
    return c.select(
        F.col("score").cast("bigint").alias("score"),
        "cum_nt",
        "cum_nc",
        "cum_conv_t",
        "cum_conv_c",
        F.round(
            F.when(
                (F.col("cum_nt") > 0) & (F.col("cum_nc") > 0),
                F.col("cum_conv_t").cast("double") / F.col("cum_nt")
                - F.col("cum_conv_c").cast("double") / F.col("cum_nc"),
            )
            + 1e-9,
            6,
        ).alias("uplift"),
        F.round(
            F.when(
                F.col("cum_nc") > 0,
                F.col("cum_conv_t")
                - F.col("cum_conv_c").cast("double")
                * F.col("cum_nt")
                / F.col("cum_nc"),
            )
            + 1e-9,
            4,
        ).alias("qini"),
    ).orderBy(F.col("score").desc())


_PPS_N = 25
_PPS_SEED = "pps-v1"


@query(
    "sample_systematic_pps",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, source, CAST(n_chars AS BIGINT) AS w,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
                  AS BIGINT) AS h
      FROM documents),
    c AS (SELECT *, CAST(SUM(w) OVER (ORDER BY h, doc_id) AS BIGINT) AS cum
          FROM b),
    pr AS (
      SELECT CAST(SUM(w) AS BIGINT) AS wtot,
             CAST(SUM(w) // {_PPS_N} AS BIGINT) AS ival,
             CAST(CAST('0x' || substr(md5('{_PPS_SEED}'), 1, 12) AS BIGINT)
                  % (SUM(w) // {_PPS_N}) AS BIGINT) AS r
      FROM b),
    p AS (
      SELECT c.source, c.w,
             ((c.cum - 1 - pr.r + pr.ival) // pr.ival - 1)
           - ((c.cum - c.w - 1 - pr.r + pr.ival) // pr.ival - 1) AS picks,
             pr.ival
      FROM c CROSS JOIN pr)
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN picks > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sampled,
           CAST(SUM(picks) AS BIGINT) AS picks_total,
           CAST(SUM(picks * ival) AS BIGINT) AS est_chars,
           CAST(SUM(w) AS BIGINT) AS exact_chars,
           ROUND(CAST(SUM(picks * ival) - SUM(w) AS DOUBLE) / SUM(w)
                 + 1e-9, 6) AS rel_err
    FROM p GROUP BY source ORDER BY source
    """,
)
def sample_systematic_pps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic PPS sample of the corpus char mass
    (operators/sampling.py systematic_pps): documents lie on a weight
    line in md5-hash order, the line is cut into 25 equal integer
    intervals, one deterministic point per interval — the classic
    survey design whose per-source estimate sum(picks) * I is compared
    here against the exact per-source char totals with realized error.
    sum(picks) == 25 EXACTLY by the integer pick-count identity
    (tests/test_round12b_ops.py asserts it).

    Scale shape: a distributed prefix sum — leading-8-bit hash shards,
    per-shard totals offset by the adjudicated 256-row bounded
    triangular join, intra-shard running sums as shard-partitioned
    windows, and a 1-row (W, I, r) broadcast; no global window, no
    floats anywhere (the one published ratio divides exact integers).
    """
    d = T(spark, sf_dir, "documents")
    s = systematic_pps(
        d.select("doc_id", "n_chars"), "doc_id", "n_chars", n=_PPS_N,
        seed=_PPS_SEED,
    )
    agg = (
        s.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("picks") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_sampled"),
            F.sum("picks").cast("bigint").alias("picks_total"),
            F.sum(F.col("picks") * F.col("ival"))
            .cast("bigint")
            .alias("est_chars"),
            F.sum("w").cast("bigint").alias("exact_chars"),
        )
    )
    return agg.select(
        "source",
        "n_docs",
        "n_sampled",
        "picks_total",
        "est_chars",
        "exact_chars",
        F.round(
            (F.col("est_chars") - F.col("exact_chars")).cast("double")
            / F.col("exact_chars")
            + 1e-9,
            6,
        ).alias("rel_err"),
    ).orderBy("source")


@query(
    "orders_croston_forecast",
    oracle="""
    WITH top AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_lines
      FROM lineitem GROUP BY l_partkey
      ORDER BY n_lines DESC, l_partkey LIMIT 20),
    dly AS (
      SELECT l.l_partkey, CAST(l.l_shipdate AS DATE) AS d,
             CAST(SUM(l.l_quantity) AS BIGINT) AS qty
      FROM lineitem l JOIN top t ON t.l_partkey = l.l_partkey
      GROUP BY 1, 2),
    st AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_dd,
             CAST(SUM(qty) AS BIGINT) AS tot, MIN(d) AS d0, MAX(d) AS d1
      FROM dly GROUP BY 1)
    SELECT t.l_partkey, t.n_lines, s.n_dd AS n_demand_days,
           s.tot AS total_qty,
           ROUND(CAST(s.tot AS DOUBLE) / s.n_dd + 1e-9, 4) AS mean_size,
           ROUND(CASE WHEN s.n_dd > 1
                      THEN CAST(date_diff('day', s.d0, s.d1) AS DOUBLE)
                           / (s.n_dd - 1) END + 1e-9, 4) AS mean_interval,
           ROUND(CASE WHEN s.n_dd > 1 AND s.d0 <> s.d1
                      THEN (CAST(s.tot AS DOUBLE) / s.n_dd)
                           / (CAST(date_diff('day', s.d0, s.d1) AS DOUBLE)
                              / (s.n_dd - 1)) END + 1e-9, 6)
             AS croston_daily,
           ROUND(CASE WHEN s.n_dd > 1 AND s.d0 <> s.d1
                      THEN (CAST(s.tot AS DOUBLE) / s.n_dd)
                           / (CAST(date_diff('day', s.d0, s.d1) AS DOUBLE)
                              / (s.n_dd - 1))
                           * (1.0e0 - 1.0e0 / (2 * s.n_dd)) END + 1e-9, 6)
             AS sba_daily
    FROM top t JOIN st s USING (l_partkey)
    ORDER BY t.n_lines DESC, t.l_partkey
    """,
)
def orders_croston_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston intermittent-demand forecast (means variant, with the
    Syntetos-Boylan approximation) for the 20 most-ordered parts:
    demand arrives only on scattered ship days, so the demand RATE
    decomposes into mean demand size z / mean inter-demand interval p,
    and SBA multiplies by (1 - 1/(2n)) to debias — the standard
    spare-parts/long-tail forecasting kernel naive daily averages get
    wrong.

    Shape: pure aggregates — per-(part, day) demand rollup, then one
    per-part row; the mean interval needs no per-gap window because
    mean(intervals) == (last_day - first_day)/(n-1) exactly. The
    top-20 selection is a TakeOrderedAndProject broadcast-joined back
    (equi). Floats are fixed single-divide trees on exact integers.
    """
    li = T(spark, sf_dir, "lineitem")
    top = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_lines"))
        .orderBy(F.col("n_lines").desc(), "l_partkey")
        .limit(20)
    )
    dly = (
        li.join(F.broadcast(top.select("l_partkey")), "l_partkey")
        .groupBy("l_partkey", F.to_date("l_shipdate").alias("d"))
        .agg(F.sum("l_quantity").cast("bigint").alias("qty"))
    )
    st = dly.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dd"),
        F.sum("qty").cast("bigint").alias("tot"),
        F.min("d").alias("d0"),
        F.max("d").alias("d1"),
    )
    mean_size = F.col("tot").cast("double") / F.col("n_dd")
    mean_int = F.datediff("d1", "d0").cast("double") / (F.col("n_dd") - 1)
    croston = mean_size / mean_int
    ok = (F.col("n_dd") > 1) & (F.col("d0") != F.col("d1"))
    return (
        top.join(st, "l_partkey")
        .select(
            "l_partkey",
            "n_lines",
            F.col("n_dd").alias("n_demand_days"),
            F.col("tot").alias("total_qty"),
            F.round(mean_size + 1e-9, 4).alias("mean_size"),
            F.round(
                F.when(F.col("n_dd") > 1, mean_int) + 1e-9, 4
            ).alias("mean_interval"),
            F.round(F.when(ok, croston) + 1e-9, 6).alias("croston_daily"),
            F.round(
                F.when(
                    ok,
                    croston * (F.lit(1.0) - F.lit(1.0) / (2 * F.col("n_dd"))),
                )
                + 1e-9,
                6,
            ).alias("sba_daily"),
        )
        .orderBy(F.col("n_lines").desc(), "l_partkey")
    )


@query(
    "events_silence_gaps",
    oracle="""
    WITH m AS (
      SELECT DISTINCT event_type, epoch_ms(ts) // 60000 AS mn FROM events),
    g AS (
      SELECT event_type, mn + 1 AS silent_from_min, nxt - 1 AS silent_to_min,
             nxt - mn - 1 AS gap_minutes
      FROM (SELECT event_type, mn,
                   LEAD(mn) OVER (PARTITION BY event_type ORDER BY mn) AS nxt
            FROM m)
      WHERE nxt - mn > 1),
    r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY gap_minutes DESC,
                                            silent_from_min) AS rank
      FROM g),
    c AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_active_minutes
          FROM m GROUP BY 1)
    SELECT r.event_type, CAST(r.rank AS INT) AS rank,
           CAST(r.silent_from_min AS BIGINT) AS silent_from_min,
           CAST(r.silent_to_min AS BIGINT) AS silent_to_min,
           CAST(r.gap_minutes AS BIGINT) AS gap_minutes,
           c.n_active_minutes
    FROM r JOIN c USING (event_type)
    WHERE r.rank <= 5
    ORDER BY r.event_type, r.rank
    """,
)
def events_silence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 longest SILENCE windows per event type — the
    gaps-and-islands kernel run on the minute grid ("this feed went
    quiet for 93 minutes on the 14th"), the outage/monitoring readout
    an SLO dashboard derives from raw telemetry.

    Scale shape (two-level gaps-and-islands, no unbounded window):
    distinct active minutes bucket by DAY; intra-day gaps come from a
    lead() over (type, day)-partitioned frames (<= 1440 rows each),
    and day-boundary gaps — including multi-day silences — from a
    lag() over the per-(type, day) AGGREGATE frame (<= #days rows per
    type). The union ranks per type. All-integer output (epoch
    minutes, not timestamps, so no tz-typing ambiguity crosses the
    driver hash).
    """
    e = T(spark, sf_dir, "events")
    mins = e.select(
        "event_type", F.expr("unix_millis(ts) div 60000").alias("mn")
    ).distinct()
    md = mins.withColumn("_day", F.expr("mn div 1440"))
    w1 = Window.partitionBy("event_type", "_day").orderBy("mn")
    g1 = (
        md.withColumn("nxt", F.lead("mn").over(w1))
        .filter(F.col("nxt") - F.col("mn") > 1)
        .select(
            "event_type",
            (F.col("mn") + 1).alias("silent_from_min"),
            (F.col("nxt") - 1).alias("silent_to_min"),
            (F.col("nxt") - F.col("mn") - 1).alias("gap_minutes"),
        )
    )
    daily = md.groupBy("event_type", "_day").agg(
        F.min("mn").alias("mn_min"), F.max("mn").alias("mn_max")
    )
    w2 = Window.partitionBy("event_type").orderBy("_day")
    g2 = (
        daily.withColumn("prev_max", F.lag("mn_max").over(w2))
        .filter(
            F.col("prev_max").isNotNull()
            & (F.col("mn_min") - F.col("prev_max") > 1)
        )
        .select(
            "event_type",
            (F.col("prev_max") + 1).alias("silent_from_min"),
            (F.col("mn_min") - 1).alias("silent_to_min"),
            (F.col("mn_min") - F.col("prev_max") - 1).alias("gap_minutes"),
        )
    )
    gaps = g1.unionByName(g2)
    w3 = Window.partitionBy("event_type").orderBy(
        F.col("gap_minutes").desc(), "silent_from_min"
    )
    cnts = mins.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active_minutes")
    )
    return (
        gaps.withColumn("rank", F.row_number().over(w3))
        .filter(F.col("rank") <= 5)
        .join(cnts, "event_type")
        .select(
            "event_type",
            F.col("rank").cast("int").alias("rank"),
            F.col("silent_from_min").cast("bigint").alias("silent_from_min"),
            F.col("silent_to_min").cast("bigint").alias("silent_to_min"),
            F.col("gap_minutes").cast("bigint").alias("gap_minutes"),
            "n_active_minutes",
        )
        .orderBy("event_type", "rank")
    )


@query(
    "embed_cka_views",
    oracle="""
    WITH q AS (
      SELECT vec_id, label, generate_subscripts(embedding, 1) AS dim,
             CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT)
               AS q
      FROM embeddings),
    m AS (
      SELECT label, dim,
             CAST(ROUND(CAST(SUM(q) AS DOUBLE) / COUNT(*)) AS BIGINT) AS mq
      FROM q GROUP BY 1, 2),
    c AS (
      SELECT q.vec_id, q.label, q.dim, q.q - m.mq AS c
      FROM q JOIN m USING (label, dim)),
    g AS (
      SELECT a.label, a.dim AS i, b.dim AS j,
             CAST(SUM(a.c * b.c) AS BIGINT) AS g
      FROM c a JOIN c b ON a.vec_id = b.vec_id
      GROUP BY 1, 2, 3),
    s AS (
      SELECT label,
             SUM(CASE WHEN i <= 32 AND j <= 32
                      THEN CAST(g AS HUGEINT) * g ELSE 0 END) AS xx,
             SUM(CASE WHEN i > 32 AND j > 32
                      THEN CAST(g AS HUGEINT) * g ELSE 0 END) AS yy,
             SUM(CASE WHEN i <= 32 AND j > 32
                      THEN CAST(g AS HUGEINT) * g ELSE 0 END) AS xy
      FROM g GROUP BY label),
    n AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs
          FROM embeddings GROUP BY label)
    SELECT n.label, n.n_vecs,
           ROUND(CAST(s.xy AS DOUBLE)
                 / SQRT(CAST(s.xx AS DOUBLE) * CAST(s.yy AS DOUBLE))
                 + 1e-9, 6) AS cka,
           ROUND(SQRT(CAST(s.xx AS DOUBLE) / CAST(s.yy AS DOUBLE))
                 + 1e-9, 6) AS frob_ratio
    FROM n JOIN s USING (label)
    ORDER BY label
    """,
)
def embed_cka_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear CKA (centered kernel alignment) between the first and
    second 32 dimensions of the embedding space, per label
    (operators/similarity.py linear_cka_views) — the
    representation-similarity metric that answers "do these two halves
    of the encoder carry the same geometry", the check run when a
    model revision or a truncation (Matryoshka-style serving) changes
    the embedding layout.

    Computed feature-side (64x64 integer Gram per label — O(d^2)
    state no matter the row count); components quantize to milli-units
    scan-side, centering subtracts integer-rounded means, every Gram
    entry is an exact BIGINT and the Frobenius sums are exact
    DECIMAL(38,0)/HUGEINT — order-free, engine-identical. Only the two
    published ratios convert to DOUBLE (correctly-rounded conversion +
    one sqrt + one divide); no Decimal-typed cell leaves the query.
    """
    emb = T(spark, sf_dir, "embeddings")
    r = linear_cka_views(
        emb, "label", "vec_id", "embedding", split_dim=32, unit=1000
    )
    return r.select(
        "label",
        "n_vecs",
        F.round(
            F.col("xy").cast("double")
            / F.sqrt(F.col("xx").cast("double") * F.col("yy").cast("double"))
            + 1e-9,
            6,
        ).alias("cka"),
        F.round(
            F.sqrt(F.col("xx").cast("double") / F.col("yy").cast("double"))
            + 1e-9,
            6,
        ).alias("frob_ratio"),
    ).orderBy("label")
