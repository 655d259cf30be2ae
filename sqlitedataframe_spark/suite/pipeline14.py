"""Round-8 wave: exact 1-Wasserstein source drift; Mann-Whitney /
Spearman exact rank statistics; k-core peeling on the co-order graph;
product-quantization codebooks + code signatures; URL parsing,
canonical-URL dedup, and per-domain corpus stats (the C4 pipeline
stage); a near-shuffle-free stratified reservoir; Dirichlet query
likelihood retrieval; char-trigram language profiles; doc-length
percentiles; Pareto class migration; hourly-profile similarity; Markov
conditional entropy; and per-channel stats from real decoded PNGs.

Every float output is derived from exact integer (DECIMAL(38,0) ⇄
HUGEINT) sums or fixed-order array folds — the drift-proofing contract
the r8 parity sweep (tools/parity_sweep.py) enforces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sqlitedataframe_spark.operators.graph import kcore_rounds
from sqlitedataframe_spark.operators.multimodal import png_channel_stats
from sqlitedataframe_spark.operators.profiling import (
    mannwhitney_onevsrest,
    pareto_key_classes,
    spearman_by_group,
    wasserstein_pairwise,
)
from sqlitedataframe_spark.operators.sampling import stratified_reservoir
from sqlitedataframe_spark.operators.similarity import (
    pq_code_signatures,
    pq_codebook_stats,
)
from sqlitedataframe_spark.operators.text import (
    char_ngram_topk,
    ql_topk,
    url_canonical,
    url_features,
)
from sqlitedataframe_spark.suite import query
from sqlitedataframe_spark.suite.pipeline13 import _coorder_edges
from sqlitedataframe_spark.suite.relational import T


# ---------------------------------------------------------------------------
# Exact 1-Wasserstein drift between sources.
# ---------------------------------------------------------------------------
@query(
    "profile_wasserstein_drift",
    oracle="""
    WITH c AS (
      SELECT source AS g, CAST(n_chars AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY 1, 2),
    grid AS (SELECT DISTINCT v FROM c),
    gap AS (
      SELECT v, COALESCE(LEAD(v) OVER (ORDER BY v), v) - v AS gap
      FROM grid),
    grp AS (SELECT DISTINCT g FROM c),
    dense AS (
      SELECT grp.g, gap.v, gap.gap, COALESCE(c.n, 0) AS n
      FROM grp CROSS JOIN gap
      LEFT JOIN c ON c.g = grp.g AND c.v = gap.v),
    cum AS (
      SELECT g, v, gap, SUM(n) OVER (PARTITION BY g ORDER BY v) AS cum
      FROM dense),
    tot AS (SELECT g, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY 1),
    pairs AS (
      SELECT a.g AS grp_a, b.g AS grp_b,
             MAX(ta.tot) AS n_a, MAX(tb.tot) AS n_b,
             SUM(ABS(CAST(a.cum AS HUGEINT) * tb.tot
                     - CAST(b.cum AS HUGEINT) * ta.tot) * a.gap) AS num
      FROM cum a JOIN cum b ON a.v = b.v AND a.g < b.g
      JOIN tot ta ON ta.g = a.g JOIN tot tb ON tb.g = b.g
      GROUP BY 1, 2)
    SELECT grp_a, grp_b, CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           ROUND(CAST(num AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) + 1e-9, 6)
             AS w1
    FROM pairs ORDER BY grp_a, grp_b
    """,
)
def profile_wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact earth-mover distance between every pair of sources' document-
    length distributions — the drift metric that weighs HOW FAR the mass
    moved (in characters), where KS/PSI only say that it moved. The
    source-mixture monitor for corpus curation.

    operators.profiling.wasserstein_pairwise: per-(source, length) counts
    collapse map-side; cumulative counts via the two-level prefix-sum
    recipe (no global window); the integral is exact DECIMAL(38,0)
    integer arithmetic until one final double division.
    """
    return wasserstein_pairwise(
        T(spark, sf_dir, "documents"), "source", "n_chars"
    )


# ---------------------------------------------------------------------------
# Mann-Whitney U, one-vs-rest per event type.
# ---------------------------------------------------------------------------
@query(
    "events_mann_whitney",
    oracle="""
    WITH iv AS (
      SELECT event_type AS g,
             CAST(ROUND(CAST(value AS DOUBLE) * 100) AS BIGINT) AS v
      FROM events),
    cg AS (SELECT g, v, CAST(COUNT(*) AS BIGINT) AS cg FROM iv GROUP BY 1, 2),
    ct AS (SELECT v, CAST(SUM(cg) AS BIGINT) AS ct FROM cg GROUP BY 1),
    ctc AS (SELECT v, ct, SUM(ct) OVER (ORDER BY v) AS cumt FROM ct),
    cgc AS (
      SELECT g, v, cg, SUM(cg) OVER (PARTITION BY g ORDER BY v) AS cumg
      FROM cg),
    j AS (SELECT g, cg, ct, cumt, cumg FROM cgc JOIN ctc USING (v)),
    per AS (
      SELECT g, CAST(SUM(cg) AS BIGINT) AS n1,
             SUM(2 * CAST(cg AS HUGEINT) * ((cumt - ct) - (cumg - cg))
                 + CAST(cg AS HUGEINT) * (ct - cg)) AS u2
      FROM j GROUP BY 1),
    ties AS (
      SELECT SUM(CAST(ct AS HUGEINT) * ct * ct - ct) AS t3t,
             CAST(SUM(ct) AS BIGINT) AS nn
      FROM ct),
    f AS (
      SELECT g, n1, nn,
             CAST(u2 AS DOUBLE) / 2.0 AS u,
             CAST(n1 AS DOUBLE) AS n1d,
             CAST(nn - n1 AS DOUBLE) AS n2d,
             CAST(nn AS DOUBLE) AS nnd,
             CAST(t3t AS DOUBLE) AS t3td
      FROM per, ties),
    s AS (
      SELECT g, n1, u, n1d, n2d,
             sqrt(n1d * n2d / 12.0
                  * ((nnd + 1.0) - t3td / (nnd * (nnd - 1.0)))) AS sigma,
             n1 >= 1 AND nn - n1 >= 1 AS okc
      FROM f)
    SELECT g AS event_type, n1 AS n,
           ROUND(u + 1e-9, 2) AS u_stat,
           ROUND(CASE WHEN okc AND sigma > 0
                 THEN (u - n1d * n2d / 2.0) / sigma END + 1e-9, 4) + 0.0 AS z,
           ROUND(CASE WHEN okc AND sigma > 0
                 THEN 2.0 * u / (n1d * n2d) - 1.0 END + 1e-9, 4) + 0.0
             AS rank_biserial
    FROM s ORDER BY event_type
    """,
)
def events_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U of each event type's value against the rest — the
    distribution-free sibling of events_welch_ttest (honest under skew
    and outliers), with tie-corrected z and rank-biserial effect size.

    operators.profiling.mannwhitney_onevsrest: per-(type, cent-value)
    counts, ONE two-level prefix sum over the shared value spine (rest
    counts by subtraction), U and the tie term as exact DECIMAL(38,0)
    integers, closed-form doubles only at the end.
    """
    return mannwhitney_onevsrest(
        T(spark, sf_dir, "events"), "event_type", "value"
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation per return flag.
# ---------------------------------------------------------------------------
@query(
    "lineitem_spearman",
    oracle="""
    WITH cells AS (
      SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS x,
             CAST(ROUND(CAST(l_extendedprice AS DOUBLE) * 100) AS BIGINT)
               AS y,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY 1, 2, 3),
    mx AS (SELECT g, x, SUM(n) AS mn FROM cells GROUP BY 1, 2),
    rx AS (
      SELECT g, x,
             2 * (SUM(mn) OVER (PARTITION BY g ORDER BY x) - mn) + mn + 1
               AS r2x
      FROM mx),
    my AS (SELECT g, y, SUM(n) AS mn FROM cells GROUP BY 1, 2),
    ry AS (
      SELECT g, y,
             2 * (SUM(mn) OVER (PARTITION BY g ORDER BY y) - mn) + mn + 1
               AS r2y
      FROM my),
    ranked AS (
      SELECT c.g, c.n, rx.r2x, ry.r2y
      FROM cells c
      JOIN rx ON rx.g = c.g AND rx.x = c.x
      JOIN ry ON ry.g = c.g AND ry.y = c.y),
    agg AS (
      SELECT g, CAST(SUM(n) AS BIGINT) AS n,
             SUM(CAST(n AS HUGEINT) * r2x) AS sx,
             SUM(CAST(n AS HUGEINT) * r2y) AS sy,
             SUM(CAST(n AS HUGEINT) * r2x * r2x) AS sxx,
             SUM(CAST(n AS HUGEINT) * r2y * r2y) AS syy,
             SUM(CAST(n AS HUGEINT) * r2x * r2y) AS sxy
      FROM ranked GROUP BY 1),
    d AS (
      SELECT g, n,
             CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
             sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS den
      FROM agg)
    SELECT g AS l_returnflag, n,
           ROUND(CASE WHEN den > 0 THEN num / den END + 1e-9, 6) + 0.0
             AS spearman_rho
    FROM d ORDER BY l_returnflag
    """,
)
def lineitem_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation of quantity vs extended price within each
    return-status slice — the outlier-proof monotone-association readout
    (is bigger really dearer?), exact even under heavy ties.

    operators.profiling.spearman_by_group: doubled midranks (2R =
    2*below + t + 1, exact integers) from two-level prefix sums per
    marginal; five DECIMAL(38,0) moment sums; one closed-form double.
    """
    li = T(spark, sf_dir, "lineitem")
    return spearman_by_group(
        li,
        "l_returnflag",
        F.col("l_quantity"),
        F.round(F.col("l_extendedprice").cast("double") * 100),
        y_bucket=1 << 20,
    )


# ---------------------------------------------------------------------------
# k-core peeling on the co-order graph.
# ---------------------------------------------------------------------------

#: Base edge set — same as pipeline13's _GRAPH_CTE slim/e (parts that
#: co-occur in >= 2 orders), re-declared standalone for the unrolled chain.
_KCORE_EDGES = """
    slim AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    e0 AS (
      SELECT a.p AS u, b.p AS v
      FROM slim a JOIN slim b ON a.o = b.o AND a.p < b.p
      GROUP BY 1, 2 HAVING COUNT(*) >= 2)
"""


def _kcore_oracle(k: int, rounds: int) -> str:
    """Unrolled CTE chain mirroring kcore_rounds' fixed peels: level r
    keeps edges whose BOTH endpoints still have degree >= k among level
    r-1 survivors. Pure integer set arithmetic — any engine agrees."""
    # every e{r} is referenced 3x (both adj directions + the next filter)
    # and each final select re-reads its level: without MATERIALIZED,
    # DuckDB's CTE inlining re-evaluates the whole chain per reference —
    # exponential in rounds (observed: minutes at sf0.01 vs <1 s here)
    parts = ["WITH " + _KCORE_EDGES.replace("e0 AS (", "e0 AS MATERIALIZED (")]
    for r in range(1, rounds + 1):
        parts.append(
            f"""adj{r} AS (
          SELECT u, v FROM e{r - 1}
          UNION ALL SELECT v AS u, u AS v FROM e{r - 1})"""
        )
        parts.append(
            f"deg{r} AS (SELECT u, COUNT(*) AS d FROM adj{r} GROUP BY 1)"
        )
        parts.append(
            f"keep{r} AS MATERIALIZED (SELECT u FROM deg{r} WHERE d >= {k})"
        )
        parts.append(
            f"""e{r} AS MATERIALIZED (
          SELECT a.u, a.v FROM e{r - 1} a
          JOIN keep{r} ku ON a.u = ku.u
          JOIN keep{r} kv ON a.v = kv.u)"""
        )
    selects = [
        f"""SELECT {r} AS round,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM
               (SELECT u FROM e{r} UNION SELECT v FROM e{r})) AS n_nodes,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM e{r}) AS n_edges"""
        for r in range(1, rounds + 1)
    ]
    return (
        ",\n".join(parts)
        + "\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY round"
    )


@query("graph_kcore", oracle=_kcore_oracle(3, 8))
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core peeling of the part co-order graph, 8 FIXED rounds: each
    round drops nodes with < 3 surviving neighbors and reports
    (round, n_nodes, n_edges) — the dense-region screen (spam rings and
    template farms live in high cores; organic tails do not), with the
    stabilized tail of the sequence as the convergence witness.

    operators.graph.kcore_rounds: per round one degree aggregate + two
    semi-joins, persisted with the pagerank block lifecycle; the fixed
    round count (not run-to-convergence) is the determinism contract
    both engines honor.
    """
    return kcore_rounds(_coorder_edges(spark, sf_dir), k=3, rounds=8)


# ---------------------------------------------------------------------------
# Hour-of-day profile similarity between event types.
# ---------------------------------------------------------------------------
@query(
    "events_hourly_similarity",
    oracle="""
    WITH h AS (
      SELECT event_type AS g, CAST(EXTRACT(hour FROM ts) AS INT) AS hr,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    nrm AS (
      SELECT g, SUM(CAST(n AS HUGEINT) * n) AS s2 FROM h GROUP BY 1),
    pairs AS (
      SELECT a.g AS type_a, b.g AS type_b,
             SUM(CAST(a.n AS HUGEINT) * b.n) AS dp
      FROM h a JOIN h b ON a.hr = b.hr AND a.g < b.g
      GROUP BY 1, 2)
    SELECT type_a, type_b,
           ROUND(CAST(dp AS DOUBLE)
                 / (sqrt(CAST(na.s2 AS DOUBLE)) * sqrt(CAST(nb.s2 AS DOUBLE)))
                 + 1e-9, 6) AS cos_hourly
    FROM pairs
    JOIN nrm na ON na.g = pairs.type_a
    JOIN nrm nb ON nb.g = pairs.type_b
    ORDER BY type_a, type_b
    """,
)
def events_hourly_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine similarity between event types' hour-of-day activity
    profiles (24-dim exact integer count vectors) — the behavioral-
    clustering readout that says which actions share a daily rhythm
    (bot-like types pair at ~1.0 across all hours; human actions pair by
    timezone shape).

    Pure composition: one (type, hour) count aggregate; the dot products
    and norms are exact DECIMAL(38,0) integer sums joined on the
    24-value hour key; one closed-form double per pair.
    """
    ev = T(spark, sf_dir, "events")
    h = ev.groupBy(
        F.col("event_type").alias("g"), F.hour("ts").alias("hr")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    nrm = h.groupBy("g").agg(
        F.sum(F.col("n").cast("decimal(38,0)") * F.col("n")).alias("s2")
    )
    a = h.select(F.col("g").alias("type_a"), "hr", F.col("n").alias("na"))
    b = h.select(
        F.col("g").alias("type_b"), F.col("hr").alias("hrb"),
        F.col("n").alias("nb"),
    )
    pairs = (
        a.join(b, (F.col("hr") == F.col("hrb")) & (F.col("type_a") < F.col("type_b")))
        .groupBy("type_a", "type_b")
        .agg(
            F.sum(F.col("na").cast("decimal(38,0)") * F.col("nb")).alias("dp")
        )
    )
    na = nrm.select(F.col("g").alias("type_a"), F.col("s2").alias("s2a"))
    nb2 = nrm.select(F.col("g").alias("type_b"), F.col("s2").alias("s2b"))
    return (
        pairs.join(na, "type_a")
        .join(nb2, "type_b")
        .select(
            "type_a",
            "type_b",
            F.round(
                F.col("dp").cast("double")
                / (
                    F.sqrt(F.col("s2a").cast("double"))
                    * F.sqrt(F.col("s2b").cast("double"))
                )
                + 1e-9,
                6,
            ).alias("cos_hourly"),
        )
        .orderBy("type_a", "type_b")
    )


# ---------------------------------------------------------------------------
# Markov conditional entropy.
# ---------------------------------------------------------------------------
@query(
    "events_markov_entropy",
    oracle="""
    WITH p AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      FROM events),
    c AS (
      SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2),
    t AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY 1),
    perh AS (
      -- fixed-order fold over the to_type-sorted count list: both
      -- engines sum the identical IEEE term sequence (tot is a GROUP BY
      -- column so the lambda sees a plain column, not an aggregate)
      SELECT c.from_type, t.tot,
             -list_aggregate(
                list_transform(
                  list(CAST(c.n AS DOUBLE) ORDER BY c.to_type),
                  x -> (x / CAST(t.tot AS DOUBLE))
                       * log2(x / CAST(t.tot AS DOUBLE))),
                'sum') AS h
      FROM c JOIN t USING (from_type) GROUP BY c.from_type, t.tot),
    tot2 AS (SELECT CAST(SUM(tot) AS BIGINT) AS nn FROM perh),
    overall AS (
      SELECT -- weighted fold in from_type order: H(next|cur)
             list_aggregate(
               list_transform(
                 list((CAST(tot AS DOUBLE), h) ORDER BY from_type),
                 s -> (s[1] / CAST(nn AS DOUBLE)) * s[2]),
               'sum') AS hc,
             nn
      FROM perh, tot2 GROUP BY nn)
    SELECT from_type, tot AS n_transitions,
           ROUND(h + 1e-9, 6) AS entropy_bits
    FROM perh
    UNION ALL
    SELECT 'ALL', nn, ROUND(hc + 1e-9, 6) FROM overall
    ORDER BY from_type
    """,
)
def events_markov_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional next-event entropy per current event type (plus the
    overall H(next|cur) roll-up) — the predictability readout over the
    Markov transition matrix: near-0 bits = deterministic funnels,
    high bits = exploratory behavior; drops in it flag bot scripting.

    One lead() window partitioned by user, one |types|^2 count
    aggregate; each entropy is a FIXED-ORDER sequential fold over the
    to_type-sorted count list (the repo's array-fold recipe), so the
    float sums are bit-identical in any engine — counts themselves are
    exact integers.
    """
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    c = p.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    t = c.groupBy("from_type").agg(F.sum("n").cast("bigint").alias("tot"))
    per = (
        c.join(t, "from_type")
        .groupBy("from_type")
        .agg(
            F.max("tot").alias("tot"),
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("to_type"), F.col("n").cast("double").alias("n")
                    )
                )
            ).alias("_lst"),
        )
    )
    td = F.col("tot").cast("double")
    h = -F.aggregate(
        F.transform(
            "_lst", lambda s: (s["n"] / td) * F.log2(s["n"] / td)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    perh = per.select("from_type", "tot", h.alias("h"))
    nn = perh.agg(F.sum("tot").cast("bigint").alias("nn"))
    ov = (
        perh.join(F.broadcast(nn))
        .groupBy()
        .agg(
            F.max("nn").alias("nn"),
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "from_type", F.col("tot").cast("double").alias("td"),
                        "h",
                    )
                )
            ).alias("_l2"),
        )
    )
    hc = F.aggregate(
        F.transform(
            "_l2",
            lambda s: (s["td"] / F.col("nn").cast("double")) * s["h"],
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    rows = perh.select(
        "from_type",
        F.col("tot").alias("n_transitions"),
        F.round(F.col("h") + 1e-9, 6).alias("entropy_bits"),
    )
    allrow = ov.select(
        F.lit("ALL").alias("from_type"),
        F.col("nn").alias("n_transitions"),
        F.round(hc + 1e-9, 6).alias("entropy_bits"),
    )
    return rows.unionByName(allrow).orderBy("from_type")


# ---------------------------------------------------------------------------
# Pareto class migration between date halves.
# ---------------------------------------------------------------------------

#: Period pivot: orders strictly before 1995-01-01 are period 1.
_PARETO_PIVOT = "1995-01-01"


def _pareto_period_sql(cmp: str) -> str:
    """Per-key pareto class for one period (the part_pareto_classes CTE
    with an order-date filter; cmp is '<' or '>=')."""
    return f"""
      SELECT key,
             CASE WHEN cm * 100 <= tot * 80 THEN 'A'
                  WHEN cm * 100 <= tot * 95 THEN 'B'
                  ELSE 'C' END AS cls
      FROM (
        SELECT key, c,
               SUM(c) OVER (ORDER BY c DESC, key ROWS UNBOUNDED PRECEDING)
                 AS cm,
               SUM(c) OVER () AS tot
        FROM (
          SELECT l_partkey AS key,
                 CAST(ROUND(ROUND(SUM(l_extendedprice * (1 - l_discount))
                                  + 1e-9, 2) * 100) AS BIGINT) AS c
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderdate {cmp} DATE '{_PARETO_PIVOT}'
          GROUP BY 1) pk
        WHERE c > 0) cum
    """


@query(
    "part_pareto_migration",
    oracle=f"""
    WITH p1 AS ({_pareto_period_sql("<")}),
    p2 AS ({_pareto_period_sql(">=")})
    SELECT COALESCE(p1.cls, 'NONE') AS class_from,
           COALESCE(p2.cls, 'NONE') AS class_to,
           CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM p1 FULL OUTER JOIN p2 USING (key)
    GROUP BY 1, 2 ORDER BY class_from, class_to
    """,
)
def part_pareto_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC-class migration matrix: each part's Pareto revenue class before
    vs after 1995 (NONE = no revenue in that half) — the churn view of
    concentration (stable A-parts vs risers vs faders), and the corpus
    analogue of 'which sources gained token share between snapshots'.

    operators.profiling.pareto_key_classes twice (two-level prefix sums,
    integer cents) + one full-outer join on part and a 4x4-bounded count
    matrix.
    """
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    pivot = F.lit(_PARETO_PIVOT).cast("date")
    p1 = pareto_key_classes(
        j.filter(F.col("o_orderdate") < pivot), "l_partkey", rev
    ).select("key", F.col("pareto_class").alias("c1"))
    p2 = pareto_key_classes(
        j.filter(F.col("o_orderdate") >= pivot), "l_partkey", rev
    ).select("key", F.col("pareto_class").alias("c2"))
    return (
        p1.join(p2, "key", "full")
        .groupBy(
            F.coalesce("c1", F.lit("NONE")).alias("class_from"),
            F.coalesce("c2", F.lit("NONE")).alias("class_to"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"))
        .orderBy("class_from", "class_to")
    )


# ---------------------------------------------------------------------------
# URL family: parse, canonical dedup, per-domain stats.
#
# documents carries no URL column, so each query derives one as a PURE
# FUNCTION of (doc_id, source, lang) — scheme/www/port/path/query/fragment
# variants spread across the id space — and the ORACLE recomputes the
# expected parse CLOSED-FORM from the same construction (never running the
# parser), so a wrong regex, port rule, or param sort anywhere in the
# operator fails the hash compare. Same replay principle as the skew
# guards.
# ---------------------------------------------------------------------------

#: DuckDB twin of _url_expr — keep the two in lockstep.
_URL_SQL = """
      CASE WHEN doc_id % 11 = 0 THEN 'http' ELSE 'https' END || '://'
      || CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END
      || source || '-corp.'
      || CASE lang WHEN 'en' THEN 'com' WHEN 'fr' THEN 'fr'
                   WHEN 'zh' THEN 'cn' ELSE 'org' END
      || CASE WHEN doc_id % 7 = 0 THEN ':8080' ELSE '' END
      || '/' || lang || '/doc-' || doc_id
      || CASE WHEN doc_id % 4 = 0 THEN '/v2' ELSE '' END
"""
_URL_Q1_SQL = """
      CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&id=' || doc_id
           WHEN doc_id % 3 = 1
             THEN '?id=' || doc_id || '&utm_campaign=x&page=2'
           ELSE '' END
      || CASE WHEN doc_id % 5 = 0 THEN '#s2' ELSE '' END
"""
_URL_Q2_SQL = """
      CASE WHEN doc_id % 3 = 0 THEN '?utm_source=mail&id=' || doc_id
           WHEN doc_id % 3 = 1
             THEN '?utm_campaign=y&id=' || doc_id || '&page=2'
           ELSE '' END
"""


def _url_base(doc_id, source, lang):
    """Spark twin of _URL_SQL (scheme://host[:port]/path, no query)."""
    tld = (
        F.when(lang == "en", "com")
        .when(lang == "fr", "fr")
        .when(lang == "zh", "cn")
        .otherwise("org")
    )
    return F.concat(
        F.when(doc_id % 11 == 0, "http").otherwise("https"),
        F.lit("://"),
        F.when(doc_id % 2 == 0, "www.").otherwise(""),
        source,
        F.lit("-corp."),
        tld,
        F.when(doc_id % 7 == 0, ":8080").otherwise(""),
        F.lit("/"),
        lang,
        F.lit("/doc-"),
        doc_id.cast("string"),
        F.when(doc_id % 4 == 0, "/v2").otherwise(""),
    )


def _url_q(doc_id, variant: int):
    """Spark twin of _URL_Q1_SQL / _URL_Q2_SQL (query + fragment)."""
    if variant == 1:
        return F.concat(
            F.when(
                doc_id % 3 == 0,
                F.concat(F.lit("?utm_source=feed&id="), doc_id.cast("string")),
            )
            .when(
                doc_id % 3 == 1,
                F.concat(
                    F.lit("?id="),
                    doc_id.cast("string"),
                    F.lit("&utm_campaign=x&page=2"),
                ),
            )
            .otherwise(""),
            F.when(doc_id % 5 == 0, "#s2").otherwise(""),
        )
    return (
        F.when(
            doc_id % 3 == 0,
            F.concat(F.lit("?utm_source=mail&id="), doc_id.cast("string")),
        )
        .when(
            doc_id % 3 == 1,
            F.concat(
                F.lit("?utm_campaign=y&id="),
                doc_id.cast("string"),
                F.lit("&page=2"),
            ),
        )
        .otherwise("")
    )


def _docs_with_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    i, s, lg = F.col("doc_id"), F.col("source"), F.col("lang")
    return d.withColumn(
        "url", F.concat(_url_base(i, s, lg), _url_q(i, 1))
    )


@query(
    "text_url_parse",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, source, lang,
             CASE WHEN doc_id % 11 = 0 THEN 'http' ELSE 'https' END
               AS xscheme,
             source || '-corp.'
               || CASE lang WHEN 'en' THEN 'com' WHEN 'fr' THEN 'fr'
                            WHEN 'zh' THEN 'cn' ELSE 'org' END AS xdomain,
             doc_id % 7 = 0 AS xport,
             2 + CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS xdepth,
             CASE WHEN doc_id % 3 = 0 THEN 2
                  WHEN doc_id % 3 = 1 THEN 3 ELSE 0 END AS xnparams,
             doc_id % 3 IN (0, 1) AS xtracking
      FROM documents)
    SELECT xdomain AS domain,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(SUM(CASE WHEN xscheme = 'http' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_http,
           CAST(SUM(CASE WHEN xport THEN 1 ELSE 0 END) AS BIGINT)
             AS n_with_port,
           ROUND(CAST(SUM(xdepth) AS DOUBLE) / COUNT(*) + 1e-9, 4)
             AS avg_path_depth,
           CAST(SUM(CASE WHEN xtracking THEN 1 ELSE 0 END) AS BIGINT)
             AS n_tracking
    FROM u GROUP BY 1 ORDER BY domain
    """,
)
def text_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registrable-domain URL stats (scheme mix, explicit ports, path
    depth, tracking-param rate) — the C4-pipeline grouping stage, with
    the parse VERIFIED against a closed-form oracle that recomputes every
    expected value from the URL construction without running a parser.

    operators.text.url_features: pure scan-side regexp_extract columns
    (no UDF, no extra shuffle beyond the domain aggregate).
    """
    parsed = url_features(_docs_with_url(spark, sf_dir))
    return (
        parsed.groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_urls"),
            F.sum((F.col("scheme") == "http").cast("int"))
            .cast("bigint")
            .alias("n_http"),
            F.sum(F.col("port").isNotNull().cast("int"))
            .cast("bigint")
            .alias("n_with_port"),
            F.round(
                F.sum("path_depth").cast("double") / F.count(F.lit(1)) + 1e-9,
                4,
            ).alias("avg_path_depth"),
            F.sum(F.col("has_tracking").cast("int"))
            .cast("bigint")
            .alias("n_tracking"),
        )
        .orderBy("domain")
    )


@query(
    "text_url_canonical_dedup",
    oracle=f"""
    WITH raw AS (
      SELECT doc_id, source, lang, ({_URL_SQL}) || ({_URL_Q1_SQL}) AS url
      FROM documents
      UNION ALL
      SELECT doc_id, source, lang, ({_URL_SQL}) || ({_URL_Q2_SQL}) AS url
      FROM documents),
    canon AS (
      -- closed-form canonical: fragment dropped, tracking params removed,
      -- kept params sorted ('id=N' < 'page=2' lexicographically)
      SELECT source || '-corp.'
               || CASE lang WHEN 'en' THEN 'com' WHEN 'fr' THEN 'fr'
                            WHEN 'zh' THEN 'cn' ELSE 'org' END AS domain,
             ({_URL_SQL})
             || CASE WHEN doc_id % 3 = 0 THEN '?id=' || doc_id
                     WHEN doc_id % 3 = 1
                       THEN '?id=' || doc_id || '&page=2'
                     ELSE '' END AS curl
      FROM raw)
    SELECT domain,
           CAST(COUNT(*) AS BIGINT) AS n_raw_urls,
           CAST(COUNT(DISTINCT curl) AS BIGINT) AS n_canonical
    FROM canon GROUP BY 1 ORDER BY domain
    """,
)
def text_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL dedup: two click-variant raw URLs per document
    (different utm values, param order, fragment) collapse to ONE
    canonical form — per domain, raw count vs distinct canonicals. The
    oracle builds the canonical CLOSED-FORM from the construction, so a
    canonicalizer that mis-sorts params, keeps a fragment, or strips the
    wrong key hash-fails.

    operators.text.url_canonical: pure column expression (regexp parse,
    param filter + array_sort, rebuild); one domain aggregate.
    """
    d = T(spark, sf_dir, "documents")
    i, s, lg = F.col("doc_id"), F.col("source"), F.col("lang")
    base = _url_base(i, s, lg)
    raw = d.select(
        F.concat(base, _url_q(i, 1)).alias("url")
    ).unionAll(d.select(F.concat(base, _url_q(i, 2)).alias("url")))
    canon = raw.select(url_canonical("url").alias("curl"))
    dom = F.regexp_extract(
        F.regexp_extract(F.col("curl"), r"^[a-z]+://([^/:]+)", 1),
        r"([^.]+\.[^.]+)$",
        1,
    )
    return (
        canon.select(dom.alias("domain"), "curl")
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_raw_urls"),
            F.countDistinct("curl").cast("bigint").alias("n_canonical"),
        )
        .orderBy("domain")
    )


@query(
    "dedup_per_domain",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, text, n_chars,
             source || '-corp.'
               || CASE lang WHEN 'en' THEN 'com' WHEN 'fr' THEN 'fr'
                            WHEN 'zh' THEN 'cn' ELSE 'org' END AS domain
      FROM documents),
    per AS (
      SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
             MAX(n_chars) AS mx
      FROM u GROUP BY 1),
    kept AS (
      SELECT u.domain, MIN(u.doc_id) AS kept_doc_id
      FROM u JOIN per ON u.domain = per.domain AND u.n_chars = per.mx
      GROUP BY 1)
    SELECT per.domain AS domain, n_docs, n_distinct,
           ROUND(1.0 - CAST(n_distinct AS DOUBLE) / n_docs + 1e-9, 6)
             AS dup_rate,
           kept_doc_id
    FROM per JOIN kept ON per.domain = kept.domain
    ORDER BY 1
    """,
)
def dedup_per_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain dedup prior + keep-best: document count, distinct text
    count (md5), duplicate rate, and the kept representative (longest
    text, ties -> min doc_id) — the C4 stage that turns URL grouping
    into domain-level curation decisions (a domain with dup_rate ~1 is a
    template farm; keep one page, downweight the rest).

    One domain aggregate over md5 fingerprints + a max-length keep-best
    join; domain comes from url_features on the derived URL column.
    """
    parsed = url_features(_docs_with_url(spark, sf_dir))
    per = parsed.groupBy("domain").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct(F.md5("text")).cast("bigint").alias("n_distinct"),
        F.max("n_chars").alias("mx"),
    )
    kept = (
        parsed.join(
            per.select("domain", "mx"),
            ["domain"],
        )
        .filter(F.col("n_chars") == F.col("mx"))
        .groupBy("domain")
        .agg(F.min("doc_id").alias("kept_doc_id"))
    )
    return (
        per.join(kept, "domain")
        .select(
            "domain",
            "n_docs",
            "n_distinct",
            F.round(
                1.0 - F.col("n_distinct").cast("double") / F.col("n_docs")
                + 1e-9,
                6,
            ).alias("dup_rate"),
            "kept_doc_id",
        )
        .orderBy("domain")
    )


# ---------------------------------------------------------------------------
# Near-shuffle-free stratified reservoir.
# ---------------------------------------------------------------------------
@query(
    "sample_stratified_reservoir",
    oracle="""
    WITH n AS (
      SELECT o_orderpriority AS p, CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY 1),
    h AS (
      SELECT o_orderpriority AS p, o_orderkey AS k,
             CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)
                  AS BIGINT) AS h32,
             md5(CAST(o_orderkey AS VARCHAR)) AS hh
      FROM orders),
    g AS (
      SELECT h.p, h.k, h.h32, h.hh
      FROM h JOIN n USING (p)
      WHERE CAST(h.h32 AS HUGEINT) * n.n
            < CAST(80 AS HUGEINT) * 4294967296),
    r AS (
      SELECT p, k,
             ROW_NUMBER() OVER (PARTITION BY p ORDER BY h32, hh, k) AS rnk
      FROM g)
    SELECT p AS o_orderpriority, rnk AS reservoir_rank, k AS o_orderkey
    FROM r WHERE rnk <= 5 ORDER BY o_orderpriority, reservoir_rank
    """,
)
def sample_stratified_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-row reservoir per order priority with the near-
    shuffle-free plan: a replayable integer hash gate keeps ~80 rows per
    stratum map-side (P(starvation) ~ 1e-26), then an exact rank window
    runs on the survivors only — the shuffle moves ~80 rows per stratum
    at ANY corpus size, where cap_per_class would move the stratum.

    operators.sampling.stratified_reservoir; the oracle replays both the
    gate and the rank bit-for-bit (md5 hash order).
    """
    o = T(spark, sf_dir, "orders")
    res = stratified_reservoir(o, ["o_orderpriority"], "o_orderkey", k=5)
    return res.select(
        "o_orderpriority", "reservoir_rank", "o_orderkey"
    ).orderBy("o_orderpriority", "reservoir_rank")


# ---------------------------------------------------------------------------
# Dirichlet query likelihood retrieval.
# ---------------------------------------------------------------------------
@query(
    "retrieval_query_likelihood",
    oracle="""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
      FROM documents),
    base AS (
      SELECT doc_id, len(t) AS dl,
             [len(list_filter(t, x -> x = 'spark')),
              len(list_filter(t, x -> x = 'join')),
              len(list_filter(t, x -> x = 'window'))] AS tfs
      FROM t),
    stats AS (
      SELECT CAST(SUM(dl) AS BIGINT) AS tt,
             CAST(SUM(tfs[1]) AS BIGINT) AS cf0,
             CAST(SUM(tfs[2]) AS BIGINT) AS cf1,
             CAST(SUM(tfs[3]) AS BIGINT) AS cf2
      FROM base),
    scored AS (
      SELECT doc_id, ROUND(
        ln((tfs[1] + 100.0 * cf0 / CAST(tt AS DOUBLE))
           / (CAST(dl AS DOUBLE) + 100.0))
        + ln((tfs[2] + 100.0 * cf1 / CAST(tt AS DOUBLE))
             / (CAST(dl AS DOUBLE) + 100.0))
        + ln((tfs[3] + 100.0 * cf2 / CAST(tt AS DOUBLE))
             / (CAST(dl AS DOUBLE) + 100.0))
        + 1e-9, 6) AS ql_score
      FROM base, stats WHERE dl > 0)
    SELECT doc_id, ql_score FROM scored
    ORDER BY ql_score DESC, doc_id LIMIT 20
    """,
)
def retrieval_query_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents by Dirichlet-smoothed query likelihood (mu=100)
    against the fixed 3-term query — BM25's language-model sibling
    (Zhai-Lafferty), the scorer that borrows from the corpus unigram
    model instead of zeroing docs that miss a term.

    operators.text.ql_topk: scan-side tf vectors, ONE 1-row (cf_t, T)
    broadcast, TakeOrderedAndProject — no posting shuffle; every model
    input is an exact integer so the log closed form is deterministic.
    """
    return ql_topk(
        T(spark, sf_dir, "documents"), ["spark", "join", "window"],
        mu=100.0, k=20,
    )


# ---------------------------------------------------------------------------
# Char-trigram language profiles.
# ---------------------------------------------------------------------------
@query(
    "text_char_trigrams",
    oracle="""
    WITH t AS (
      SELECT lang, lower(text) AS t FROM documents
      WHERE LENGTH(lower(text)) >= 3),
    g AS (
      -- UNNEST(range(...)) instead of a lateral generate_series: DuckDB
      -- rejects column parameters in table-function laterals
      SELECT lang, substr(t, u.i, 3) AS gram
      FROM t, UNNEST(range(1, CAST(LENGTH(t) AS BIGINT) - 1)) AS u(i)),
    c AS (
      SELECT lang, gram, CAST(COUNT(*) AS BIGINT) AS n_occurrences
      FROM g GROUP BY 1, 2),
    r AS (
      SELECT lang, gram, n_occurrences,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n_occurrences DESC, gram) AS rank
      FROM c)
    SELECT lang, CAST(rank AS INT) AS rank, gram, n_occurrences
    FROM r WHERE rank <= 10 ORDER BY lang, rank
    """,
)
def text_char_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 character trigrams per language — the langid feature
    profile (trigram distributions separate languages before any model)
    and the boilerplate detector (one trigram dominating a source =
    template).

    operators.text.char_ngram_topk: trigrams explode scan-side from a
    position sequence (no UDF), collapse map-side; top-k is a
    PARTITIONED rank window over the per-language gram counts.
    """
    return char_ngram_topk(T(spark, sf_dir, "documents"), n=3, top=10)


# ---------------------------------------------------------------------------
# Doc-length percentiles by source.
# ---------------------------------------------------------------------------
@query(
    "text_length_percentiles",
    oracle="""
    WITH c AS (
      SELECT source, CAST(n_chars AS BIGINT) AS v, COUNT(*) AS n
      FROM documents GROUP BY 1, 2),
    cum AS (
      SELECT source, v,
             SUM(n) OVER (PARTITION BY source ORDER BY v) AS cw,
             SUM(n) OVER (PARTITION BY source) AS tot
      FROM c)
    SELECT source,
           CAST(MAX(tot) AS BIGINT) AS n_docs,
           MIN(CASE WHEN cw >= CEIL(0.10 * tot) THEN v END) AS p10_chars,
           MIN(CASE WHEN cw >= CEIL(0.50 * tot) THEN v END) AS p50_chars,
           MIN(CASE WHEN cw >= CEIL(0.90 * tot) THEN v END) AS p90_chars
    FROM cum GROUP BY source ORDER BY source
    """,
)
def text_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete p10/p50/p90 document length per source — the length-
    distribution fingerprint a mixture designer reads before setting
    chunking and packing parameters (agg_percentile_disc's shape,
    pointed at the corpus).

    One (source, length) count aggregate; cumulative weights in a
    PARTITIONED window over that collapsed frame — never a global sort.
    """
    d = T(spark, sf_dir, "documents")
    c = d.groupBy("source", F.col("n_chars").cast("bigint").alias("v")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("source").orderBy("v")
    cum = c.select(
        "source",
        "v",
        F.sum("n").over(w).alias("cw"),
        F.sum("n").over(Window.partitionBy("source")).alias("tot"),
    )

    def disc(p: float, alias: str):
        return F.min(
            F.when(F.col("cw") >= F.ceil(F.lit(p) * F.col("tot")), F.col("v"))
        ).alias(alias)

    return (
        cum.groupBy("source")
        .agg(
            F.max("tot").cast("bigint").alias("n_docs"),
            disc(0.10, "p10_chars"),
            disc(0.50, "p50_chars"),
            disc(0.90, "p90_chars"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Product quantization: codebook stats + joint code signatures.
# ---------------------------------------------------------------------------


def _pq_oracle_cte(m: int = 4, k: int = 4, iterations: int = 2) -> str:
    """Unrolled CTE chain mirroring operators.similarity.pq_train_assign:
    integer-quantized subvectors, k min-id seeds, ``iterations`` Lloyd
    rounds (assign by double distance to exact rational centroids, ties
    -> min code, empty clusters keep the previous centroid), then the
    final assignment as ``assignF``. Centroid sums are HUGEINT ⇄ the
    engine's DECIMAL(38,0); distances are identical IEEE doubles."""
    dim = 64 // m
    dist = (
        "list_aggregate(list_transform(list_zip(r.sub, c.sv), "
        "z -> (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE)"
        " / CAST(c.cnt AS DOUBLE))"
        " * (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE)"
        " / CAST(c.cnt AS DOUBLE))), 'sum')"
    )
    vals = ", ".join(f"({s})" for s in range(m))
    parts = [
        """iv AS (
      SELECT vec_id AS id,
             list_transform(embedding,
               x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS iv
      FROM embeddings)""",
        f"""subs AS (
      SELECT id, sp.s AS s,
             list_slice(iv, {dim} * sp.s + 1, {dim} * sp.s + {dim}) AS sub
      FROM iv CROSS JOIN (VALUES {vals}) AS sp(s))""",
        f"""seeds AS (
      SELECT id, ROW_NUMBER() OVER (ORDER BY id) - 1 AS c
      FROM (SELECT DISTINCT id FROM subs) ORDER BY id LIMIT {k})""",
        """cent0 AS (
      SELECT subs.s, seeds.c,
             list_transform(subs.sub, x -> CAST(x AS HUGEINT)) AS sv,
             CAST(1 AS BIGINT) AS cnt
      FROM subs JOIN seeds ON subs.id = seeds.id)""",
    ]
    for r in range(1, iterations + 1):
        parts.append(
            f"""dist{r} AS (
      SELECT r.id, r.s, r.sub, c.c, {dist} AS d
      FROM subs r JOIN cent{r - 1} c ON r.s = c.s)"""
        )
        parts.append(
            f"""amin{r} AS (
      SELECT id, s, MIN(d) AS dmin FROM dist{r} GROUP BY 1, 2)"""
        )
        parts.append(
            f"""assign{r} AS (
      SELECT d.id, d.s, ANY_VALUE(d.sub) AS sub, MIN(d.c) AS c
      FROM dist{r} d
      JOIN amin{r} a ON d.id = a.id AND d.s = a.s AND d.d = a.dmin
      GROUP BY 1, 2)"""
        )
        parts.append(
            f"""sums{r} AS (
      SELECT s, c, t.j, SUM(CAST(sub[t.j] AS HUGEINT)) AS sx
      FROM assign{r}, generate_series(1, {dim}) AS t(j)
      GROUP BY 1, 2, 3)"""
        )
        parts.append(
            f"""newc{r} AS (
      SELECT su.s, su.c, list(su.sx ORDER BY su.j) AS sv, MAX(cn.cnt) AS cnt
      FROM sums{r} su
      JOIN (SELECT s, c, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM assign{r} GROUP BY 1, 2) cn
        ON su.s = cn.s AND su.c = cn.c
      GROUP BY 1, 2)"""
        )
        parts.append(
            f"""cent{r} AS (
      SELECT p.s, p.c, COALESCE(n.sv, p.sv) AS sv,
             COALESCE(n.cnt, p.cnt) AS cnt
      FROM cent{r - 1} p
      LEFT JOIN newc{r} n ON p.s = n.s AND p.c = n.c)"""
        )
    fr = iterations + 1
    parts.append(
        f"""distF AS (
      SELECT r.id, r.s, r.sub, c.c, {dist} AS d
      FROM subs r JOIN cent{iterations} c ON r.s = c.s)"""
    )
    parts.append(
        """aminF AS (SELECT id, s, MIN(d) AS dmin FROM distF GROUP BY 1, 2)"""
    )
    parts.append(
        """assignF AS (
      SELECT d.id, d.s, ANY_VALUE(d.sub) AS sub, MIN(d.c) AS c
      FROM distF d
      JOIN aminF a ON d.id = a.id AND d.s = a.s AND d.d = a.dmin
      GROUP BY 1, 2)"""
    )
    return "WITH " + ",\n".join(parts)


_PQ_DIM = 16


def _shared_pq_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The default-parameter trained PQ assignment (m=4, k=4, 2 Lloyd
    rounds) over the embeddings table, built once per (app, sf_dir) and
    persisted across queries (util.shared_eager_cache, the
    shared_doc_sigs pattern — r12): embed_pq_codebook and embed_pq_codes
    train the IDENTICAL model from the identical scan, so the second
    query was re-running the whole Lloyd chain for nothing."""
    from sqlitedataframe_spark.operators.similarity import pq_train_assign
    from sqlitedataframe_spark.operators.util import shared_eager_cache

    return shared_eager_cache(
        spark,
        ("pq_final_assign", sf_dir, 4, 4, 2, 1_000_000),
        lambda: pq_train_assign(T(spark, sf_dir, "embeddings"), 4, 4, 2),
    )


@query(
    "embed_pq_codebook",
    oracle=_pq_oracle_cte()
    + f""",
    fsums AS (
      SELECT s, c, t.j,
             SUM(CAST(sub[t.j] AS HUGEINT)) AS sx,
             SUM(CAST(sub[t.j] AS HUGEINT) * sub[t.j]) AS sxx
      FROM assignF, generate_series(1, {_PQ_DIM}) AS t(j)
      GROUP BY 1, 2, 3),
    fcnt AS (
      SELECT s, c, CAST(COUNT(*) AS BIGINT) AS n FROM assignF GROUP BY 1, 2),
    tn AS (
      SELECT fs.s, fs.c, MAX(fc.n) AS n,
             SUM(CAST(fc.n AS HUGEINT) * fs.sxx - fs.sx * fs.sx) AS num
      FROM fsums fs JOIN fcnt fc ON fs.s = fc.s AND fs.c = fc.c
      GROUP BY 1, 2)
    SELECT s AS subspace, c AS code, CAST(n AS BIGINT) AS n_assigned,
           ROUND(CAST(num AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 1e12)
                 + 1e-9, 6) AS mse
    FROM tn ORDER BY subspace, code
    """,
)
def embed_pq_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codebook quality: per (subspace, code) cluster
    size and within-cluster MSE after 2 fixed Lloyd rounds (m=4
    subspaces x k=4 codes over the 64-dim embeddings) — the compression
    readout behind IVFPQ-style billion-scale ANN (dead codes, lopsided
    usage, residual distortion per subspace).

    operators.similarity.pq_codebook_stats: exact integer-quantized
    subvectors, centroids as exact (DECIMAL(38,0) sumvec, count)
    rationals, distances as deterministic IEEE doubles, MSE via the
    exact identity sum_j(C*Sxx_j - Sx_j^2)/C^2 — the oracle unrolls the
    identical rounds as CTE levels.
    """
    return pq_codebook_stats(
        T(spark, sf_dir, "embeddings"), assign=_shared_pq_assign(spark, sf_dir)
    )


@query(
    "embed_pq_codes",
    oracle=_pq_oracle_cte()
    + """,
    sig AS (
      SELECT id, string_agg(CAST(c AS VARCHAR), '-' ORDER BY s) AS signature
      FROM assignF GROUP BY id)
    SELECT signature, CAST(COUNT(*) AS BIGINT) AS n_vectors
    FROM sig GROUP BY 1
    ORDER BY n_vectors DESC, signature LIMIT 10
    """,
)
def embed_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joint PQ code-word histogram: every vector encoded to its 4-code
    signature, top-10 most used words (ties -> signature asc) — the
    collision/diversity readout that says whether the codebook separates
    the corpus or funnels it into a few cells.

    operators.similarity.pq_code_signatures over the same trained
    codebook as embed_pq_codebook (identical unrolled oracle).
    """
    return pq_code_signatures(
        T(spark, sf_dir, "embeddings"), assign=_shared_pq_assign(spark, sf_dir)
    )


# ---------------------------------------------------------------------------
# Per-channel stats from real decoded PNGs.
# ---------------------------------------------------------------------------
@query(
    "multimodal_channel_stats",
    oracle="""
    WITH d AS (
      SELECT doc_id, n_chars % 37 + 4 AS w, doc_id % 23 + 4 AS h
      FROM documents WHERE doc_id % 5 = 0),
    cells AS (
      SELECT d.doc_id, d.w, d.h, c.i AS ch,
             (7 * x.i + 13 * y.i + 31 * c.i) % 256 AS v
      FROM d,
           generate_series(0, 40) AS x(i),
           generate_series(0, 26) AS y(i),
           generate_series(0, 2) AS c(i)
      WHERE x.i < d.w AND y.i < d.h)
    SELECT doc_id AS media_id, CAST(ch AS INT) AS channel,
           CAST(w * h AS BIGINT) AS n_px,
           ROUND(CAST(SUM(v) AS DOUBLE) / (w * h) + 1e-9, 4) AS px_mean
    FROM cells GROUP BY doc_id, ch, w, h
    ORDER BY media_id, channel
    """,
)
def multimodal_channel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-channel pixel means from REAL decoded PNGs (every 5th document's
    synthetic gradient image, same construction as
    multimodal_png_roundtrip) — the image-QA stage that catches dead
    channels and colour casts, hash-gated by a closed-form oracle that
    recomputes each mean without image code.

    operators.multimodal.png_channel_stats: one Arrow mapInPandas inside
    the scan (encode -> decode -> channel sums), no shuffle.
    """
    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return png_channel_stats(docs).orderBy("media_id", "channel")


# ---------------------------------------------------------------------------
# Wave 2: Brown double smoothing, shared shingles, BFS hops, local
# clustering.
# ---------------------------------------------------------------------------
@query(
    "events_double_ewma",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(ROUND(ROUND(SUM(CAST(value AS DOUBLE)) + 1e-9, 2) * 100)
                  AS BIGINT) AS c
      FROM events GROUP BY 1),
    p1 AS (
      SELECT a.d AS day, list((b.d, CAST(b.c AS DOUBLE)) ORDER BY b.d) AS l
      FROM daily a JOIN daily b ON b.d <= a.d GROUP BY 1),
    s1 AS (
      SELECT day,
             list_aggregate(list_transform(l,
               s -> pow(0.8, date_diff('day', s[1], day)) * s[2]), 'sum')
             / list_aggregate(list_transform(l,
               s -> pow(0.8, date_diff('day', s[1], day))), 'sum') AS v1
      FROM p1),
    p2 AS (
      SELECT a.day AS day, list((b.day, b.v1) ORDER BY b.day) AS l
      FROM s1 a JOIN s1 b ON b.day <= a.day GROUP BY 1),
    s2 AS (
      SELECT day,
             list_aggregate(list_transform(l,
               s -> pow(0.8, date_diff('day', s[1], day)) * s[2]), 'sum')
             / list_aggregate(list_transform(l,
               s -> pow(0.8, date_diff('day', s[1], day))), 'sum') AS v2
      FROM p2),
    f AS (
      SELECT s1.day, v1, v2,
             2.0 * v1 - v2 AS lvl,
             ((1.0 - 0.8) / 0.8) * (v1 - v2) AS trd
      FROM s1 JOIN s2 ON s1.day = s2.day)
    SELECT day,
           ROUND(v1 / 100.0 + 1e-9, 4) AS s1,
           ROUND(v2 / 100.0 + 1e-9, 4) AS s2,
           ROUND(lvl / 100.0 + 1e-9, 4) AS level,
           ROUND(trd / 100.0 + 1e-9, 4) + 0.0 AS trend,
           ROUND((lvl + trd) / 100.0 + 1e-9, 4) AS forecast_next
    FROM f ORDER BY day
    """,
)
def events_double_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown's double exponential smoothing of daily event value (decay
    0.8): level, trend, and one-step forecast per day — the trend-aware
    forecasting baseline that single EWMA systematically lags on a
    drifting series.

    operators.profiling.brown_double_ewma: one daily cents aggregate,
    two #days-bounded triangular self-joins, every weighted sum a
    FIXED-ORDER fold over the day-sorted term list (drift-proof floats
    by construction).
    """
    from sqlitedataframe_spark.operators.profiling import brown_double_ewma

    ev = T(spark, sf_dir, "events")
    return brown_double_ewma(
        ev, "ts", F.sum(F.col("value").cast("double")), decay=0.8
    )


@query(
    "text_shared_shingles",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, source,
             regexp_split_to_array(lower(trim(text)), '\s+') AS t
      FROM documents),
    f AS (SELECT doc_id, source, t FROM t WHERE len(t) >= 5),
    sh AS (
      SELECT doc_id, source,
             array_to_string(list_slice(t, u.i, u.i + 4), ' ') AS shingle
      FROM f, UNNEST(range(1, CAST(len(t) AS BIGINT) - 3)) AS u(i)),
    agg AS (
      SELECT shingle,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(COUNT(*) AS BIGINT) AS n_occurrences,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM sh GROUP BY 1)
    SELECT shingle, n_sources, n_occurrences, n_docs
    FROM agg WHERE n_sources >= 2
    ORDER BY n_sources DESC, n_occurrences DESC, shingle LIMIT 20
    """,
)
def text_shared_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 five-token shingles shared across >= 2 sources — the
    cross-source boilerplate screen (license headers, template
    sentences) run BEFORE near-dup clustering; within-source repeats
    are house style, cross-source repeats are chrome.

    operators.text.shared_shingles_topk: scan-side shingle explode
    (let-bound token array, one split per doc), map-side-combined
    counts, TakeOrderedAndProject top-k.
    """
    from sqlitedataframe_spark.operators.text import shared_shingles_topk

    return shared_shingles_topk(T(spark, sf_dir, "documents"))


def _bfs_oracle(rounds: int = 6) -> str:
    """Unrolled BFS levels mirroring operators.graph.bfs_hops: frontier
    r = neighbors of frontier r-1 minus visited; FIXED round count; a
    hop row is emitted only while the PREVIOUS frontier was nonempty
    (after the first empty frontier every later one is empty too)."""
    parts = [
        "WITH " + _KCORE_EDGES.replace("e0 AS (", "e0 AS MATERIALIZED ("),
        """adj AS MATERIALIZED (
      SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0)""",
        "dg AS (SELECT u, COUNT(*) AS d FROM adj GROUP BY 1)",
        """f0 AS (SELECT u AS node FROM dg ORDER BY d DESC, u LIMIT 1)""",
        "v0 AS (SELECT node FROM f0)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""f{r} AS MATERIALIZED (
      SELECT DISTINCT a.v AS node
      FROM adj a JOIN f{r - 1} f ON a.u = f.node
      WHERE a.v NOT IN (SELECT node FROM v{r - 1}))"""
        )
        parts.append(
            f"""v{r} AS MATERIALIZED (
      SELECT node FROM v{r - 1} UNION SELECT node FROM f{r})"""
        )
    # hop-0 guarded on the seed existing: operators.graph.bfs_hops returns
    # an EMPTY frame on an empty edge set, and the oracle must mirror that
    selects = [
        "SELECT 0 AS hop, CAST(1 AS BIGINT) AS n_new"
        " WHERE EXISTS (SELECT 1 FROM f0)"
    ]
    for r in range(1, rounds + 1):
        guard = (
            f"WHERE (SELECT COUNT(*) FROM f{r - 1}) > 0" if r >= 2 else ""
        )
        selects.append(
            f"SELECT {r}, (SELECT CAST(COUNT(*) AS BIGINT) FROM f{r}) {guard}"
        )
    return (
        ",\n".join(parts)
        + "\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY hop"
    )


@query("graph_bfs_hops", oracle=_bfs_oracle(6))
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS reachability profile from the co-order graph's top-degree hub:
    newly reached nodes per hop, 6 fixed rounds — hub-and-spoke graphs
    saturate in 2 hops, chain-shaped ones trail; the one-glance diameter
    proxy that says whether hub caps and pointer-jump CC will converge
    fast on this graph.

    operators.graph.bfs_hops: one hash join + one anti-join per round on
    slim node pairs, localCheckpoint-truncated round state.
    """
    from sqlitedataframe_spark.operators.graph import bfs_hops

    return bfs_hops(_coorder_edges(spark, sf_dir), rounds=6)


@query(
    "graph_local_clustering",
    oracle=f"""
    WITH {_KCORE_EDGES},
    adj AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
    dg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM adj GROUP BY 1),
    tri AS (
      SELECT ab.u AS a, ab.v AS b, bc.v AS c
      FROM e0 ab
      JOIN e0 bc ON ab.v = bc.u
      JOIN e0 ac ON ac.u = ab.u AND ac.v = bc.v),
    pv AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri)
      GROUP BY 1)
    SELECT node, deg, triangles,
           ROUND(2.0 * CAST(triangles AS DOUBLE)
                 / CAST(deg * (deg - 1) AS DOUBLE) + 1e-9, 6)
             AS clustering_coef
    FROM pv JOIN dg ON pv.node = dg.u
    ORDER BY triangles DESC, node LIMIT 20
    """,
)
def graph_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex triangle counts + local clustering coefficient for the
    20 most triangle-heavy parts — the node-level density screen that
    locates the cliques graph_triangles can only count globally (a
    near-1 coefficient on a high-degree node = spam ring / template
    cluster membership).

    operators.graph.local_clustering_topk: degree-ordered compact-forward
    triangle enumeration (edges oriented low-degree -> high-degree, so
    oriented out-degree is O(sqrt m) and hub-skewed graphs cannot emit
    deg^2 wedges; only the ORACLE uses the simple a<b<c orientation),
    3-role explode for per-vertex counts, exact integers + one
    closed-form double, TakeOrderedAndProject.
    """
    from sqlitedataframe_spark.operators.graph import local_clustering_topk

    return local_clustering_topk(_coorder_edges(spark, sf_dir), top=20)


# ---------------------------------------------------------------------------
# Wave 3: vocabulary richness, stylometry, revenue bridge, JL distortion,
# intrinsic dimension, k-truss, image entropy.
# ---------------------------------------------------------------------------
_TOK_CTE = r"""
    tok AS (
      SELECT g, u.tok FROM (
        SELECT source AS g,
               regexp_split_to_array(lower(trim(text)), '\s+') AS t
        FROM documents), UNNEST(t) AS u(tok)
      WHERE u.tok <> '')
"""


@query(
    "text_chao1_vocab",
    oracle=f"""
    WITH {_TOK_CTE},
    freq AS (
      SELECT g, tok, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
    spec AS (
      SELECT g,
             CAST(COUNT(*) AS BIGINT) AS vocab,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
             CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
      FROM freq GROUP BY 1)
    SELECT g AS source, n_tokens, vocab, f1, f2,
           ROUND(CAST(vocab AS DOUBLE)
                 + (CAST(f1 AS DOUBLE) * (CAST(f1 AS DOUBLE) - 1.0))
                   / (2.0 * (CAST(f2 AS DOUBLE) + 1.0)) + 1e-9, 4)
             AS chao1_est,
           ROUND(CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE) + 1e-9, 6)
             AS gt_unseen_mass
    FROM spec ORDER BY source
    """,
)
def text_chao1_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 vocabulary-richness lower bound + Good-Turing unseen-type
    mass per source — the corpus-coverage readout (a source with high
    unseen mass is still surfacing new vocabulary; freeze the tokenizer
    later).

    operators.text.chao1_vocab: one token explode + two keyed
    aggregations; every estimate a closed form of exact integers.
    """
    from sqlitedataframe_spark.operators.text import chao1_vocab

    return chao1_vocab(T(spark, sf_dir, "documents"))


@query(
    "text_burrows_delta",
    oracle=f"""
    WITH {_TOK_CTE},
    cnt AS (
      SELECT g, tok, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
    tot AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY 1),
    top AS (
      SELECT tok FROM (SELECT tok, SUM(c) AS tc FROM cnt GROUP BY 1)
      ORDER BY tc DESC, tok ASC LIMIT 30),
    grid AS (SELECT tot.g, tot.n, top.tok FROM tot CROSS JOIN top),
    f AS (
      SELECT grid.g, grid.tok,
             CAST(COALESCE(cnt.c, 0) AS DOUBLE) / CAST(grid.n AS DOUBLE) AS f
      FROM grid LEFT JOIN cnt ON cnt.g = grid.g AND cnt.tok = grid.tok),
    pt AS (SELECT tok, list((g, f) ORDER BY g) AS l FROM f GROUP BY 1),
    m AS (
      SELECT tok, l,
             list_aggregate(list_transform(l, s -> s[2]), 'sum')
               / CAST(len(l) AS DOUBLE) AS m
      FROM pt),
    sd AS (
      SELECT tok, l, m,
             sqrt(list_aggregate(list_transform(l,
                    s -> (s[2] - m) * (s[2] - m)), 'sum')
                  / CAST(len(l) AS DOUBLE)) AS sd
      FROM m),
    z AS (
      SELECT tok, u.s[1] AS g, (u.s[2] - m) / sd AS z
      FROM sd, UNNEST(l) AS u(s) WHERE sd > 0),
    pairs AS (
      SELECT a.g AS ga, b.g AS gb, a.tok, abs(a.z - b.z) AS ad
      FROM z a JOIN z b ON a.tok = b.tok AND a.g < b.g),
    agg AS (
      SELECT ga, gb, list((tok, ad) ORDER BY tok) AS p
      FROM pairs GROUP BY 1, 2)
    SELECT ga AS source_a, gb AS source_b,
           CAST(len(p) AS BIGINT) AS n_tokens_used,
           ROUND(list_aggregate(list_transform(p, s -> s[2]), 'sum')
                 / CAST(len(p) AS DOUBLE) + 1e-9, 4) AS delta
    FROM agg ORDER BY source_a, source_b
    """,
)
def text_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta stylometric distance between every source pair over
    the 30 globally most-frequent tokens — the authorship/style screen
    (two sources with near-zero Delta are the same template farm wearing
    different domains).

    operators.text.burrows_delta: exact integer counts; every float
    reduction a FIXED-ORDER fold over an array_sort'ed struct list
    (group asc / token asc) — bit-identical in any engine or layout.
    """
    from sqlitedataframe_spark.operators.text import burrows_delta

    return burrows_delta(T(spark, sf_dir, "documents"), top_m=30)


@query(
    "lineitem_revenue_bridge",
    oracle="""
    WITH g AS (
      SELECT CAST(EXTRACT(year FROM l_shipdate) AS INT) AS yr,
             p_brand AS brand,
             CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS q,
             SUM(CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                      * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)
                      AS HUGEINT)) AS r
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2),
    b AS (SELECT MIN(yr) AS ymin, MAX(yr) AS ymax FROM g),
    prev AS (SELECT yr + 1 AS year_to, brand, q AS q0, r AS r0 FROM g),
    curr AS (SELECT yr AS year_to, brand, q AS q1, r AS r1 FROM g),
    j AS (
      SELECT COALESCE(prev.year_to, curr.year_to) AS year_to,
             COALESCE(prev.brand, curr.brand) AS brand, q0, r0, q1, r1
      FROM prev FULL JOIN curr
        ON prev.year_to = curr.year_to AND prev.brand = curr.brand),
    f AS (
      SELECT j.* FROM j CROSS JOIN b
      WHERE j.year_to > b.ymin AND j.year_to <= b.ymax)
    SELECT year_to, brand,
           CASE WHEN q0 IS NULL THEN 'new'
                WHEN q1 IS NULL THEN 'discontinued'
                ELSE 'both' END AS status,
           -- exact half-up integer rounding of the 1e-4 units to cents
           -- (float ROUND at 2 dp hits true .5 midpoints here and the
           -- engines break ties differently)
           CAST(CASE WHEN r0 >= 0 THEN (r0 + 50) // 100
                     ELSE -((-r0 + 50) // 100) END AS DOUBLE) / 100.0
             AS rev_prev,
           CAST(CASE WHEN r1 >= 0 THEN (r1 + 50) // 100
                     ELSE -((-r1 + 50) // 100) END AS DOUBLE) / 100.0
             AS rev_curr,
           CAST(CASE WHEN COALESCE(r1, 0) - COALESCE(r0, 0) >= 0
                     THEN (COALESCE(r1, 0) - COALESCE(r0, 0) + 50) // 100
                     ELSE -((-(COALESCE(r1, 0) - COALESCE(r0, 0)) + 50) // 100)
                END AS DOUBLE) / 100.0 AS rev_delta,
           ROUND(CASE WHEN q0 IS NULL THEN CAST(r1 AS DOUBLE) / 10000.0
                      WHEN q1 IS NULL THEN -(CAST(r0 AS DOUBLE) / 10000.0)
                      ELSE ((CAST(q1 AS DOUBLE) - CAST(q0 AS DOUBLE))
                            * (CAST(r0 AS DOUBLE) / CAST(q0 AS DOUBLE)))
                           / 10000.0 END + 1e-9, 4) + 0.0 AS volume_effect,
           ROUND(CASE WHEN q0 IS NOT NULL AND q1 IS NOT NULL
                      THEN (CAST(r1 AS DOUBLE)
                            - (CAST(q1 AS DOUBLE)
                               * (CAST(r0 AS DOUBLE) / CAST(q0 AS DOUBLE))))
                           / 10000.0
                      ELSE 0.0 END + 1e-9, 4) + 0.0 AS price_effect
    FROM f ORDER BY year_to, brand
    """,
)
def lineitem_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price/volume/mix revenue bridge per brand between consecutive ship
    years — the finance waterfall that says whether revenue moved because
    of units sold (volume) or realized unit price, with new/discontinued
    brands tagged; volume + price == delta exactly by construction.

    operators.relational.revenue_bridge: revenue summed in exact 1e-4
    currency units (DECIMAL(38,0) ⇄ HUGEINT), qty as BIGINT; the effects
    are closed-form doubles over those exact sums.
    """
    from sqlitedataframe_spark.operators.relational import revenue_bridge

    return revenue_bridge(
        T(spark, sf_dir, "lineitem"), T(spark, sf_dir, "part")
    )


def _jl_oracle(out_dim: int = 16, in_dim: int = 64) -> str:
    """Inlined-literal JL oracle: each projected coordinate folds
    v[t] * sign[t] over t = 1..in_dim with list_aggregate (the
    sequential-sum twin of the Spark-side ``dot`` fold), signs from the
    shared md5 matrix (similarity.jl_signs)."""
    from sqlitedataframe_spark.operators.similarity import jl_signs

    signs = jl_signs(out_dim, in_dim)
    ys = []
    for i in range(out_dim):
        lit = "[" + ", ".join(f"{float(s):.1f}" for s in signs[i]) + "]"
        ys.append(
            f"list_aggregate(list_transform(range(1, {in_dim + 1}), "
            f"t -> v[t] * ({lit})[t]), 'sum') AS y{i}"
        )
    ysq = " + ".join(f"(y{i} * y{i})" for i in range(out_dim))
    return f"""
    WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
    n AS (
      SELECT v, list_aggregate(list_transform(v, x -> x * x), 'sum') AS vv
      FROM e),
    p AS (
      SELECT vv, {", ".join(ys)}
      FROM n WHERE vv > 0),
    r AS (
      SELECT (({ysq}) / {float(out_dim)}) / vv AS ratio FROM p)
    SELECT ROUND(ratio + 1e-9, 1) AS ratio_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_vecs
    FROM r GROUP BY 1 ORDER BY ratio_bucket
    """


@query("embed_jl_distortion", oracle=_jl_oracle(16, 64))
def embed_jl_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Norm-distortion histogram of a deterministic +/-1
    Johnson-Lindenstrauss projection 64 -> 16 dims — the is-4x-compression
    -safe readout run BEFORE re-indexing the vector table (JL preserves
    norms/distances with ~1/sqrt(k) spread; a fat or shifted histogram
    says the ANN recall will crater).

    operators.similarity.jl_distortion_hist: pure scan-side JVM fold
    (16 x 64 multiply-adds per row, the ``dot`` sequential fold) + one
    tiny bucket aggregate; the md5 sign matrix is replayed inline in the
    oracle.
    """
    from sqlitedataframe_spark.operators.similarity import jl_distortion_hist

    return jl_distortion_hist(
        T(spark, sf_dir, "embeddings"), out_dim=16, in_dim=64
    )


@query(
    "embed_intrinsic_dim",
    oracle="""
    WITH e AS (
      SELECT vec_id AS i, embedding::DOUBLE[] AS v
      FROM embeddings WHERE vec_id < 300),
    d AS (
      SELECT a.i, b.i AS j,
             list_aggregate(list_transform(range(1, 65),
               t -> (a.v[t] - b.v[t]) * (a.v[t] - b.v[t])), 'sum') AS dsq
      FROM e a JOIN e b ON a.i <> b.i),
    nn AS (SELECT i, list((dsq, j) ORDER BY dsq, j) AS l FROM d GROUP BY 1),
    mu AS (
      SELECT i, l[2][1] / l[1][1] AS musq FROM nn WHERE l[1][1] > 0),
    lg AS (SELECT i, ln(musq) * 0.5 AS lnmu FROM mu),
    one AS (SELECT list((i, lnmu) ORDER BY i) AS l FROM lg)
    SELECT CAST(len(l) AS BIGINT) AS n_used,
           ROUND(list_aggregate(list_transform(l, s -> s[2]), 'sum')
                 + 1e-9, 6) AS sum_log_mu,
           ROUND(CAST(len(l) AS DOUBLE)
                 / list_aggregate(list_transform(l, s -> s[2]), 'sum')
                 + 1e-9, 4) AS intrinsic_dim
    FROM one
    """,
)
def embed_intrinsic_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TwoNN intrinsic-dimension estimate of the embedding manifold
    (Facco et al. 2017): MLE ``n / sum(ln d2/d1)`` over each sampled
    point's two nearest neighbors — how aggressively PQ/JL can compress
    before neighborhoods collapse.

    operators.similarity.intrinsic_dim_twonn: fixture-bounded sample
    (vec_id < 300 — constant work at any SF), sequential-fold distances,
    vec_id-ordered final fold; one closed-form division.
    """
    from sqlitedataframe_spark.operators.similarity import intrinsic_dim_twonn

    return intrinsic_dim_twonn(T(spark, sf_dir, "embeddings"), max_id=300)


def _ktruss_oracle(k: int, rounds: int) -> str:
    """Unrolled CTE chain mirroring ktruss_rounds' fixed peels: level r
    keeps edges sitting in >= k-2 triangles among level r-1 survivors.
    Pure integer set arithmetic — any engine agrees. MATERIALIZED for
    the same CTE-inlining reason as _kcore_oracle."""
    need = k - 2
    parts = ["WITH " + _KCORE_EDGES.replace("e0 AS (", "e0 AS MATERIALIZED (")]
    for r in range(1, rounds + 1):
        parts.append(
            f"""tri{r} AS (
          SELECT ab.u AS a, ab.v AS b, bc.v AS c
          FROM e{r - 1} ab
          JOIN e{r - 1} bc ON ab.v = bc.u
          JOIN e{r - 1} ac ON ac.u = ab.u AND ac.v = bc.v)"""
        )
        parts.append(
            f"""e{r} AS MATERIALIZED (
          SELECT u, v FROM (
            SELECT a AS u, b AS v FROM tri{r}
            UNION ALL SELECT b AS u, c AS v FROM tri{r}
            UNION ALL SELECT a AS u, c AS v FROM tri{r})
          GROUP BY 1, 2 HAVING COUNT(*) >= {need})"""
        )
    selects = [
        f"""SELECT {r} AS round,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM
               (SELECT u FROM e{r} UNION SELECT v FROM e{r})) AS n_nodes,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM e{r}) AS n_edges"""
        for r in range(1, rounds + 1)
    ]
    return (
        ",\n".join(parts)
        + "\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY round"
    )


@query("graph_ktruss", oracle=_ktruss_oracle(4, 4))
def graph_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-truss peeling of the part co-order graph, 4 FIXED rounds: each
    round keeps only edges inside >= 2 surviving triangles and reports
    (round, n_nodes, n_edges). One notch stricter than graph_kcore — a
    core hub can be a triangle-free star, a truss edge cannot, so the
    truss isolates the actually-clique-like spam/template rings.

    operators.graph.ktruss_rounds: per round one oriented triangle
    enumeration (two hash joins) + a 3-role explode to per-edge support;
    localCheckpoint-truncated round state, kcore block lifecycle.
    """
    from sqlitedataframe_spark.operators.graph import ktruss_rounds

    return ktruss_rounds(_coorder_edges(spark, sf_dir), k=4, rounds=4)


@query(
    "multimodal_image_entropy",
    oracle="""
    WITH d AS (
      SELECT doc_id, n_chars % 37 + 4 AS w, doc_id % 23 + 4 AS h
      FROM documents WHERE doc_id % 7 = 0),
    cells AS (
      SELECT d.doc_id, d.w, d.h,
             (7 * x.i + 13 * y.i + 31 * c.i) % 256 AS v
      FROM d,
           generate_series(0, 40) AS x(i),
           generate_series(0, 26) AS y(i),
           generate_series(0, 2) AS c(i)
      WHERE x.i < d.w AND y.i < d.h),
    hist AS (
      SELECT doc_id, w, h, v, CAST(COUNT(*) AS BIGINT) AS c
      FROM cells GROUP BY 1, 2, 3, 4),
    img AS (
      SELECT doc_id, CAST(w * h * 3 AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS nd,
             list((v, c) ORDER BY v) AS l
      FROM hist GROUP BY 1, 2)
    SELECT doc_id AS media_id, n AS n_px, nd AS n_distinct_vals,
           ROUND(list_aggregate(list_transform(l,
                   s -> -(CAST(s[2] AS DOUBLE) / n)
                        * log2(CAST(s[2] AS DOUBLE) / n)), 'sum')
                 + 1e-9, 4) AS entropy_bits
    FROM img ORDER BY media_id
    """,
)
def multimodal_image_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image Shannon entropy of REAL decoded pixel histograms — the
    flat/synthetic-image screen (natural photos sit near 8 bits; solid
    fills and generated gradients sit far lower), through the same
    encode->decode PNG path as png_roundtrip_dims with closed-form
    synthetic pixels so the SQL oracle recomputes every histogram.

    operators.multimodal.png_image_entropy: one Arrow mapInPandas inside
    the scan; the entropy folds over the histogram in ascending pixel
    value — the same float order in any engine.
    """
    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    from sqlitedataframe_spark.operators.multimodal import png_image_entropy

    return png_image_entropy(docs).orderBy("media_id")


# ---------------------------------------------------------------------------
# Wave 4: skyline, periodogram, Mahalanobis outliers, rich club.
# ---------------------------------------------------------------------------
_CUST_PER = """
    per AS (
      SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS x,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS y
      FROM orders GROUP BY 1)
"""


@query(
    "orders_skyline_customers",
    oracle=f"""
    WITH {_CUST_PER},
    mx AS (SELECT x, MAX(y) AS my FROM per GROUP BY 1),
    dom AS (
      SELECT a.x, a.my, MAX(b.my) AS best_hi
      FROM mx a LEFT JOIN mx b ON b.x > a.x
      GROUP BY 1, 2),
    sky AS (
      SELECT x, my AS y FROM dom
      WHERE best_hi IS NULL OR my > best_hi)
    SELECT per.k AS o_custkey, per.x AS n_orders,
           ROUND(CAST(per.y AS DOUBLE) / 100.0 + 1e-9, 2) AS total_spend
    FROM per JOIN sky ON per.x = sky.x AND per.y = sky.y
    ORDER BY n_orders, o_custkey
    """,
)
def orders_skyline_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 2-D skyline (Pareto front) of customers on (order count,
    total spend), maximizing both — the dominance frontier a top-k by
    either single column cannot answer ("who is undominated?").

    operators.relational.skyline_2d: collapses to per-count maxima first
    (one keyed aggregate over the full data), resolves dominance with a
    triangular join over the #distinct-counts frame (bounded), one semi
    join back — never an n^2 row self-join.
    """
    from sqlitedataframe_spark.operators.relational import skyline_2d

    per = (
        T(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("bigint")
            .alias("_cents"),
        )
    )
    sky = skyline_2d(per, "o_custkey", "n_orders", "_cents")
    return sky.select(
        F.col("k").alias("o_custkey"),
        F.col("x").alias("n_orders"),
        F.round(F.col("y").cast("double") / 100.0 + 1e-9, 2).alias(
            "total_spend"
        ),
    ).orderBy("n_orders", "o_custkey")


@query(
    "events_periodogram",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1),
    idx AS (
      SELECT a.d, a.x, CAST(COUNT(b.d) AS BIGINT) AS t
      FROM daily a LEFT JOIN daily b ON b.d < a.d GROUP BY 1, 2),
    series AS (
      SELECT list((t, CAST(x AS DOUBLE)) ORDER BY t) AS s,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(x) AS BIGINT) AS sx
      FROM idx),
    j AS (SELECT u.k, s, n_days, sx FROM series, UNNEST(range(1, 13)) AS u(k)),
    f AS (
      SELECT CAST(k AS INT) AS k, n_days, sx,
             list_aggregate(list_transform(s, e -> e[2]
               * cos((6.283185307179586 * CAST(k AS DOUBLE)
                      * CAST(e[1] AS DOUBLE))
                     / CAST(n_days AS DOUBLE))), 'sum') AS c,
             list_aggregate(list_transform(s, e -> e[2]
               * sin((6.283185307179586 * CAST(k AS DOUBLE)
                      * CAST(e[1] AS DOUBLE))
                     / CAST(n_days AS DOUBLE))), 'sum') AS sv
      FROM j)
    SELECT k, n_days,
           ROUND(CAST(n_days AS DOUBLE) / CAST(k AS DOUBLE) + 1e-9, 2)
             AS period_days,
           ROUND((c * c + sv * sv)
                 / (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) + 1e-9, 6)
             AS power_frac
    FROM f ORDER BY k
    """,
)
def events_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-Fourier periodogram of daily event counts at harmonics
    k = 1..12 (normalized power fraction) — the seasonality detector
    that says WHICH cycle dominates where ACF only says "some lag
    correlates".

    operators.profiling.periodogram_daily: one daily aggregate, a
    #days-triangular index join (the rank recipe, no global window),
    per-k fixed-order folds with 2*pi as the same double literal both
    engines.
    """
    from sqlitedataframe_spark.operators.profiling import periodogram_daily

    return periodogram_daily(T(spark, sf_dir, "events"), "ts", max_k=12)


@query(
    "customer_mahalanobis_top",
    oracle=f"""
    WITH {_CUST_PER},
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
             SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy,
             SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy
      FROM per),
    cf AS (
      SELECT n,
             CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
             CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
             CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
               - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS vxx,
             CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
               - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS vyy,
             CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
               - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS vxy
      FROM mom),
    iv AS (
      SELECT vyy / (vxx * vyy - vxy * vxy) AS ivxx,
             vxx / (vxx * vyy - vxy * vxy) AS ivyy,
             -(vxy) / (vxx * vyy - vxy * vxy) AS ivxy,
             mx, my
      FROM cf),
    d AS (
      SELECT per.k, per.x, per.y,
             (CAST(per.x AS DOUBLE) - mx) AS dx,
             (CAST(per.y AS DOUBLE) - my) AS dy,
             ivxx, ivyy, ivxy
      FROM per CROSS JOIN iv)
    SELECT k AS o_custkey, x AS x_val, y AS y_val,
           ROUND(dx * (ivxx * dx + ivxy * dy)
                 + dy * (ivxy * dx + ivyy * dy) + 1e-9, 4)
             AS mahalanobis_sq
    FROM d
    ORDER BY mahalanobis_sq DESC, o_custkey ASC LIMIT 20
    """,
)
def customer_mahalanobis_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by squared Mahalanobis distance over (order
    count, total spend cents) — the multivariate outlier screen that
    catches "normal count, absurd spend" keys a per-column z-score calls
    ordinary; the 2x2 covariance inverts in closed form.

    operators.profiling.mahalanobis_top: five exact integer moment sums
    (DECIMAL(38,0) ⇄ HUGEINT — the Welch recipe), one 1-row broadcast,
    one TakeOrderedAndProject.
    """
    from sqlitedataframe_spark.operators.profiling import mahalanobis_top

    return mahalanobis_top(
        T(spark, sf_dir, "orders"),
        "o_custkey",
        F.count(F.lit(1)),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")),
        top=20,
    )


@query(
    "graph_rich_club",
    oracle=f"""
    WITH {_KCORE_EDGES},
    adj AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
    dg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM adj GROUP BY 1),
    ks AS (SELECT UNNEST([2, 4, 8, 16, 32]) AS k),
    nk AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS n_nodes
      FROM dg, ks WHERE deg > k GROUP BY 1),
    tg AS (
      SELECT LEAST(da.deg, db.deg) AS dmin
      FROM e0 JOIN dg da ON e0.u = da.u JOIN dg db ON e0.v = db.u),
    ek AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS n_edges
      FROM tg, ks WHERE dmin > k GROUP BY 1)
    SELECT nk.k, n_nodes,
           CAST(COALESCE(ek.n_edges, 0) AS BIGINT) AS n_edges,
           CASE WHEN n_nodes > 1 THEN
             ROUND((2.0 * CAST(COALESCE(ek.n_edges, 0) AS DOUBLE))
                   / (CAST(n_nodes AS DOUBLE)
                      * (CAST(n_nodes AS DOUBLE) - 1.0)) + 1e-9, 6)
           END AS rich_club_coef
    FROM nk LEFT JOIN ek ON nk.k = ek.k ORDER BY nk.k
    """,
)
def graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient of the co-order graph at degree thresholds
    {{2,4,8,16,32}}: do hubs preferentially wire to EACH OTHER (rising
    phi = an elite template/spam clique) or sit as independent stars —
    the hub-structure readout degree_stats cannot give.

    operators.graph.rich_club: one degree aggregate, two hash joins to
    tag each edge's min endpoint degree, one threshold explode, exact
    integer counts + one closed-form double.
    """
    from sqlitedataframe_spark.operators.graph import rich_club

    return rich_club(_coorder_edges(spark, sf_dir))


@query(
    "graph_label_modularity",
    oracle=f"""
    WITH {_KCORE_EDGES},
    lab AS (SELECT DISTINCT p_partkey AS n, p_brand AS c FROM part),
    adj AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
    dg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM adj GROUP BY 1),
    mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e0),
    tg AS (
      SELECT lu.c AS cu, lv.c AS cv
      FROM e0 JOIN lab lu ON e0.u = lu.n JOIN lab lv ON e0.v = lv.n),
    w AS (
      SELECT cu AS c, CAST(COUNT(*) AS BIGINT) AS within_edges
      FROM tg WHERE cu = cv GROUP BY 1),
    ds AS (
      SELECT lab.c, CAST(COUNT(*) AS BIGINT) AS n_nodes,
             CAST(SUM(dg.deg) AS BIGINT) AS degree_sum
      FROM dg JOIN lab ON dg.u = lab.n GROUP BY 1),
    per AS (
      SELECT ds.c, ds.n_nodes,
             CAST(COALESCE(w.within_edges, 0) AS BIGINT) AS within_edges,
             ds.degree_sum, mm.m
      FROM ds LEFT JOIN w ON ds.c = w.c CROSS JOIN mm),
    rows_ AS (
      SELECT CAST(c AS VARCHAR) AS community, n_nodes, within_edges,
             degree_sum,
             ROUND(CAST(within_edges AS DOUBLE) / CAST(m AS DOUBLE)
                   - (CAST(degree_sum AS DOUBLE)
                      / (2.0 * CAST(m AS DOUBLE)))
                     * (CAST(degree_sum AS DOUBLE)
                        / (2.0 * CAST(m AS DOUBLE))) + 1e-9, 6) + 0.0
               AS contribution
      FROM per),
    tot AS (
      SELECT 'TOTAL' AS community,
             CAST(SUM(n_nodes) AS BIGINT) AS n_nodes,
             CAST(SUM(within_edges) AS BIGINT) AS within_edges,
             CAST(SUM(degree_sum) AS BIGINT) AS degree_sum,
             ROUND(CAST(SUM(within_edges) AS DOUBLE) / CAST(ANY_VALUE(m) AS DOUBLE)
                   - CAST(SUM(CAST(degree_sum AS HUGEINT)
                              * CAST(degree_sum AS HUGEINT)) AS DOUBLE)
                     / ((2.0 * CAST(ANY_VALUE(m) AS DOUBLE))
                        * (2.0 * CAST(ANY_VALUE(m) AS DOUBLE))) + 1e-9, 6) + 0.0
               AS contribution
      FROM per)
    SELECT * FROM rows_ UNION ALL SELECT * FROM tot ORDER BY community
    """,
)
def graph_label_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the p_brand partition over the co-order
    graph, per community + TOTAL — does the brand attribute explain who
    co-orders with whom (Q >> 0 means brand is a usable blocking key for
    dedup/linkage; Q ~ 0 means the communities are fictional).

    operators.graph.label_modularity: exact integer m / e_c / d_c, the
    TOTAL row folds exact integer sums (sum e_c, sum d_c^2 as
    DECIMAL(38,0) ⇄ HUGEINT) before any division — drift-proof.
    """
    from sqlitedataframe_spark.operators.graph import label_modularity

    part = T(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("node"), F.col("p_brand").alias("label")
    )
    return label_modularity(_coorder_edges(spark, sf_dir), part)
