"""Round-10 wave 2: HyperBall harmonic centrality (per-node HLL
neighborhood balls — the web-scale centrality algorithm, composed from
the repo's deterministic md5 HLL family); Bradley-Terry preference
strengths via fixed MM rounds (the pairwise-preference model behind
reward-model / DPO data prep); the LSH banding tuning curve (expected
recall / candidate waste per (bands, rows) split, integrated over the
OBSERVED candidate similarity distribution); and quality-gap preference
pair mining.

New determinism tool used throughout: the FIXED-ORDER FLOAT FOLD —
Spark ``F.aggregate(array_sort(collect_list(...)), 0.0, +)`` is the
same left fold as DuckDB ``list_reduce(list(x ORDER BY k), +)`` (the
0.0 seed is exact: 0.0 + x1 == x1), so multi-term float reductions are
bit-identical across engines with no intermediate rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlitedataframe_spark.operators import dedup as D
from sqlitedataframe_spark.operators.evalmetrics import (
    bradley_terry_strengths,
)
from sqlitedataframe_spark.operators.graph import hyperball_harmonic
from sqlitedataframe_spark.operators.sampling import preference_pairs
from sqlitedataframe_spark.operators.sketch import _hll_alpha
from sqlitedataframe_spark.operators.text import quality_score
from sqlitedataframe_spark.suite import query
from sqlitedataframe_spark.suite.pipeline import (
    MH_EST_CTE,
    shared_doc_banded,
    shared_doc_sigs,
)
from sqlitedataframe_spark.suite.pipeline13 import _coorder_edges
from sqlitedataframe_spark.suite.pipeline14 import _KCORE_EDGES
from sqlitedataframe_spark.suite.relational import T


# ---------------------------------------------------------------------------
# HyperBall harmonic centrality.
# ---------------------------------------------------------------------------
def _hyperball_oracle(rounds: int = 3, top: int = 20) -> str:
    """Unrolled HyperBall at p=4 (m=16): per-node registers grow by one
    hop per round via bucket-wise MAX merge over neighbors; estimates
    replay operators.sketch.hll_estimate's formula (alpha interpolated,
    small-range linear counting at e <= 2.5m)."""
    alpha = _hll_alpha(16)
    parts = [
        f"""WITH {_KCORE_EDGES},
    adj AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
    nds AS (SELECT DISTINCT u AS node FROM adj),
    h0 AS (
      SELECT node,
             CAST('0x' || substr(md5(CAST(node AS VARCHAR)), 1, 1) AS INT)
               AS bucket,
             CAST('0x' || substr(md5(CAST(node AS VARCHAR)), 2, 8) AS BIGINT)
               AS v
      FROM nds),
    m0 AS (
      SELECT node, bucket,
             MAX(CASE WHEN v = 0 THEN 33 ELSE 33 - length(bin(v)) END) AS r
      FROM h0 GROUP BY 1, 2)"""
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f"""n{k} AS (
      SELECT a.u AS node, c.bucket, MAX(c.r) AS r
      FROM adj a JOIN m{k - 1} c ON c.node = a.v GROUP BY 1, 2),
    m{k} AS (
      SELECT node, bucket, MAX(r) AS r FROM
        (SELECT * FROM n{k} UNION ALL SELECT * FROM m{k - 1})
      GROUP BY 1, 2)"""
        )
    for k in range(rounds + 1):
        parts.append(
            f"""est{k} AS (
      SELECT node,
             ROUND(CASE WHEN (CAST({alpha!r} AS DOUBLE) * 256.0 / s) <= 40.0 AND vv > 0
                        THEN 16.0 * ln(16.0 / vv)
                        ELSE CAST({alpha!r} AS DOUBLE) * 256.0 / s END, 4) AS ball{k}
      FROM (SELECT node, SUM(power(2.0, -r)) + (16 - COUNT(*)) AS s,
                   16 - COUNT(*) AS vv
            FROM m{k} GROUP BY node))"""
        )
    harm = " + ".join(
        f"(ball{k} - ball{k - 1}) / {float(k)!r}" for k in range(1, rounds + 1)
    )
    joins = " ".join(f"JOIN est{k} USING (node)" for k in range(1, rounds + 1))
    balls = ", ".join(f"ball{k}" for k in range(rounds + 1))
    return (
        ",\n".join(parts)
        + f"""
    SELECT node, {balls},
           ROUND({harm} + 1e-9, 4) AS harmonic_est
    FROM est0 {joins}
    ORDER BY harmonic_est DESC, node
    LIMIT {top}
    """
    )


@query("graph_hyperball_harmonic", oracle=_hyperball_oracle(3, 20))
def graph_hyperball_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperBall harmonic-centrality estimates over the co-order graph
    (Boldi & Vigna 2013): per node, HLL sketches of the radius-1/2/3
    balls grown by register-max merges over neighbors; harmonic
    centrality = sum_r (|ball_r| - |ball_{r-1}|)/r, top 20 nodes. THE
    100 TB centrality algorithm — exact all-pairs BFS carries O(n^2)
    (source, node) state, HyperBall carries n x 16 registers per round
    and each round is one join + one grouped max.

    operators.graph.hyperball_harmonic on the deterministic md5 HLL
    family: every register is a pure function of the graph, so the
    whole centrality table is EXACTLY oracle-checked (the harmonic sum
    combines per-round estimates AFTER their 4-dp round; ln() ulp
    drift is absorbed upstream, the agg_hll_sketch convention).
    """
    return hyperball_harmonic(
        _coorder_edges(spark, sf_dir), rounds=3, p=4, top=20
    )


# ---------------------------------------------------------------------------
# Bradley-Terry preference strengths.
# ---------------------------------------------------------------------------
def _bt_iter_sql(k: int) -> str:
    return f"""t{k} AS (
      SELECT g.i, g.j, CAST(g.n AS DOUBLE) / (pi.p + pj.p) AS t
      FROM nij g
      JOIN p{k - 1} pi ON pi.it = g.i
      JOIN p{k - 1} pj ON pj.it = g.j),
    d{k} AS (
      SELECT i, list_reduce(list(t ORDER BY j), (a, x) -> a + x) AS d
      FROM t{k} GROUP BY i),
    r{k} AS (
      SELECT w.i AS it, CAST(w.wi AS DOUBLE) / d.d AS pr
      FROM wtot w JOIN d{k} d ON d.i = w.i),
    z{k} AS (
      SELECT list_reduce(list(pr ORDER BY it), (a, x) -> a + x) AS z
      FROM r{k}),
    p{k} AS (SELECT it, pr / z AS p FROM r{k}, z{k})"""


@query(
    "eval_bradley_terry",
    oracle="""
    WITH u AS (
      SELECT user_id, event_type,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2),
    duel AS (
      SELECT CASE WHEN a.cents > b.cents THEN a.event_type
                  ELSE b.event_type END AS winner,
             CASE WHEN a.cents > b.cents THEN b.event_type
                  ELSE a.event_type END AS loser
      FROM u a JOIN u b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      WHERE a.cents <> b.cents),
    wins AS (
      SELECT winner AS i, loser AS j, CAST(COUNT(*) AS BIGINT) AS w
      FROM duel GROUP BY 1, 2),
    allw AS (SELECT i, j, w FROM wins
             UNION ALL SELECT j AS i, i AS j, 0 AS w FROM wins),
    grid AS (SELECT i, j, CAST(SUM(w) AS BIGINT) AS w FROM allw GROUP BY 1, 2),
    nij AS (
      SELECT g.i, g.j, g.w, g.w + r.w AS n
      FROM grid g JOIN grid r ON r.i = g.j AND r.j = g.i),
    wtot AS (SELECT i, CAST(SUM(w) AS BIGINT) AS wi FROM nij GROUP BY 1),
    ntot AS (SELECT i, CAST(SUM(n) AS BIGINT) AS ni FROM nij GROUP BY 1),
    p0 AS (SELECT DISTINCT i AS it, 1.0 AS p FROM grid),
    """
    + ",\n    ".join(_bt_iter_sql(k) for k in (1, 2, 3))
    + """
    SELECT p3.it AS event_type, wtot.wi AS wins, ntot.ni AS n_comparisons,
           ROUND(p3.p + 1e-9, 6) AS strength
    FROM p3
    JOIN wtot ON wtot.i = p3.it
    JOIN ntot ON ntot.i = p3.it
    ORDER BY strength DESC, event_type
    """,
)
def eval_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry strengths for event types from per-user spend
    duels: within each user, every pair of event types they used
    competes (higher total integer cents wins; ties skip), and three
    fixed MM rounds fit the preference strengths — the
    strength-of-schedule-aware ranking every pairwise-preference
    pipeline (reward models, DPO pair grading, arena-style evals) fits
    where a raw win rate would be confounded by matchup mix.

    operators.evalmetrics.bradley_terry_strengths: the duel table
    collapses to a |types|^2 win grid (model state); every float
    reduction in the MM rounds is a fixed-order fold, bit-identical to
    the oracle's list_reduce with no intermediate rounding.
    """
    ev = T(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    u = ev.groupBy("user_id", "event_type").agg(
        F.sum(cents).cast("bigint").alias("cents")
    )
    a, b = u.alias("a"), u.alias("b")
    duel = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .filter(F.col("a.cents") != F.col("b.cents"))
        .select(
            F.when(
                F.col("a.cents") > F.col("b.cents"), F.col("a.event_type")
            )
            .otherwise(F.col("b.event_type"))
            .alias("i"),
            F.when(
                F.col("a.cents") > F.col("b.cents"), F.col("b.event_type")
            )
            .otherwise(F.col("a.event_type"))
            .alias("j"),
        )
    )
    wins = duel.groupBy("i", "j").agg(
        F.count(F.lit(1)).cast("bigint").alias("w")
    )
    return bradley_terry_strengths(wins, "i", "j", "w", iters=3).select(
        F.col("i").alias("event_type"),
        "wins",
        "n_comparisons",
        "strength",
    )


# ---------------------------------------------------------------------------
# LSH banding tuning curve.
# ---------------------------------------------------------------------------
@query(
    "dedup_lsh_tuning",
    oracle=MH_EST_CTE
    + """,
    cells AS (
      SELECT CAST(ROUND(est_jaccard * 64) AS INT) AS k,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM est GROUP BY 1),
    cfg AS (SELECT * FROM (VALUES (2, 32), (4, 16), (8, 8), (16, 4),
                                  (32, 2)) AS t(bands, rows_per_band)),
    j AS (
      SELECT bands, rows_per_band, k, n,
             CASE WHEN k >= 32 THEN
               n * (1.0 - power(1.0 - power(k / 64.0, rows_per_band), bands))
             ELSE 0.0 END AS whi,
             CASE WHEN k < 19 THEN
               n * (1.0 - power(1.0 - power(k / 64.0, rows_per_band), bands))
             ELSE 0.0 END AS wlo
      FROM cells, cfg),
    agg AS (
      SELECT bands, rows_per_band,
             list_reduce(list(whi ORDER BY k), (a, x) -> a + x) AS shi,
             list_reduce(list(wlo ORDER BY k), (a, x) -> a + x) AS slo,
             CAST(SUM(CASE WHEN k >= 32 THEN n ELSE 0 END) AS BIGINT)
               AS n_pairs_high,
             CAST(SUM(CASE WHEN k < 19 THEN n ELSE 0 END) AS BIGINT)
               AS n_pairs_low
      FROM j GROUP BY 1, 2)
    SELECT bands, rows_per_band,
           ROUND(power(1.0 / bands, 1.0 / rows_per_band) + 1e-9, 6) AS thr50,
           n_pairs_high, n_pairs_low,
           ROUND(shi / GREATEST(n_pairs_high, 1) + 1e-9, 6)
             AS exp_recall_highsim,
           ROUND(slo / GREATEST(n_pairs_low, 1) + 1e-9, 6)
             AS exp_prob_lowsim
    FROM agg ORDER BY bands
    """,
)
def dedup_lsh_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding tuning curve over the OBSERVED candidate similarity
    distribution: for each (bands, rows-per-band) split of the 64-hash
    signature, the analytic S-curve midpoint plus the expected detection
    probability averaged over high-sim (est >= 0.5) and low-sim
    (est < 0.3) candidate pairs — the data-driven answer to "16x4 or
    8x8 for THIS corpus" (recall kept vs candidate-generation waste).

    operators.dedup.lsh_tuning_curve over the un-thresholded candidate
    table from the SAME shared signature table: pairs collapse to
    <= 65 integer match-count cells, the config cross is a literal
    grid, and the float expectations are fixed-order folds by k.
    """
    d = T(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(
        d,
        min_jaccard=0.0,
        sig=shared_doc_sigs(spark, sf_dir),
        banded=shared_doc_banded(spark, sf_dir),
    )
    return D.lsh_tuning_curve(pairs)


# ---------------------------------------------------------------------------
# Quality-gap preference pair mining.
# ---------------------------------------------------------------------------
@query(
    "sample_preference_pairs",
    oracle="""
    WITH t AS (
      SELECT doc_id, source, text,
             string_split(lower(trim(text)), ' ') AS toks,
             CAST(LENGTH(text) AS DOUBLE) AS n_char
      FROM documents),
    q AS (
      SELECT doc_id, source,
             ROUND((LEAST(n_char / 200.0, 1.0)
                    + LEAST(CAST(len(list_filter(toks, x -> list_contains(
                        ['the','a','an','and','or','of','to','in','is','it'],
                        x))) AS DOUBLE) / len(toks) * 4, 1.0)
                    + GREATEST(0.0, 1.0 - CAST(LENGTH(regexp_replace(text,
                        '[^.,;:!?''"()\\[\\]{}-]', '', 'g')) AS DOUBLE)
                        / n_char * 5)) / 3, 6) AS quality
      FROM t),
    topd AS (
      SELECT source, doc_id AS chosen, quality AS chosen_score,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY quality DESC, doc_id) AS rn
      FROM q),
    botd AS (
      SELECT source, doc_id AS rejected, quality AS rejected_score,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY quality ASC, doc_id) AS rn
      FROM q)
    SELECT topd.source, chosen, rejected, chosen_score, rejected_score,
           ROUND(chosen_score - rejected_score + 1e-9, 6) AS margin
    FROM topd JOIN botd USING (source)
    WHERE topd.rn <= 3 AND botd.rn <= 3 AND chosen <> rejected
      AND ROUND(chosen_score - rejected_score + 1e-9, 6) >= 0.2
    ORDER BY source, chosen, rejected
    """,
)
def sample_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gap preference pairs per source: the 3 highest- vs 3
    lowest-quality documents within each feed, kept when the score gap
    clears 0.2 — the heuristic-signal stage that mines reward-model /
    DPO training pairs before human labels exist (contrast WITHIN a
    source so the gap is attributable to content, not feed identity).

    operators.sampling.preference_pairs over the shared quality_score:
    two id-tiebroken rank windows partitioned by source, a 3x3
    per-group cross, one rounded-margin filter.
    """
    d = T(spark, sf_dir, "documents")
    scored = d.select(
        "source", "doc_id", quality_score("text").alias("quality")
    )
    return preference_pairs(
        scored,
        group_col="source",
        id_col="doc_id",
        score_col="quality",
        top_n=3,
        bottom_n=3,
        min_margin=0.2,
    )


# ---------------------------------------------------------------------------
# End-to-end curation funnel report.
# ---------------------------------------------------------------------------
@query(
    "pipeline_curation_funnel",
    oracle=MH_EST_CTE
    + """,
    d0 AS (
      SELECT doc_id, source, lang, n_chars, text FROM documents
      WHERE doc_id % 50 <> 0),
    gate AS (
      SELECT * FROM d0
      WHERE lang IN ('en', 'fr', 'es', 'de') AND n_chars BETWEEN 50 AND 5000),
    exact AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text)
                                     ORDER BY doc_id) AS _rn
        FROM gate) WHERE _rn = 1),
    near AS (
      SELECT e.* FROM exact e
      WHERE NOT EXISTS (
        SELECT 1 FROM est p
        JOIN exact a ON a.doc_id = p.id_a
        WHERE p.id_b = e.doc_id AND p.est_jaccard >= 0.5)),
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
      SELECT doc_id, array_to_string(t[i:i+3], ' ') AS gram
      FROM toks, UNNEST(generate_series(1, len(t) - 3)) AS r(i)),
    test_grams AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 50 = 0),
    cont AS (
      SELECT DISTINCT g.doc_id FROM grams g JOIN test_grams USING (gram)
      WHERE g.doc_id % 50 <> 0),
    decon AS (
      SELECT n.* FROM near n
      WHERE NOT EXISTS (SELECT 1 FROM cont c WHERE c.doc_id = n.doc_id)),
    qual AS (
      SELECT doc_id, source FROM (
        SELECT doc_id, source,
               (LEAST(CAST(LENGTH(text) AS DOUBLE) / 200.0, 1.0)
                + LEAST(CAST(len(list_filter(string_split(lower(trim(text)),
                    ' '), x -> list_contains(['the','a','an','and','or','of',
                    'to','in','is','it'], x))) AS DOUBLE)
                    / len(string_split(lower(trim(text)), ' ')) * 4, 1.0)
                + GREATEST(0.0, 1.0 - CAST(LENGTH(regexp_replace(text,
                    '[^.,;:!?''"()\\[\\]{}-]', '', 'g')) AS DOUBLE)
                    / CAST(LENGTH(text) AS DOUBLE) * 5)) / 3 AS q
        FROM decon)
      WHERE ROUND(q, 6) >= 0.5),
    per AS (
      SELECT s.source,
             CAST(COUNT(*) AS BIGINT) AS n_raw,
             CAST(SUM(CASE WHEN g.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_gate,
             CAST(SUM(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_exact,
             CAST(SUM(CASE WHEN n.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_near,
             CAST(SUM(CASE WHEN dc.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_decontam,
             CAST(SUM(CASE WHEN q.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_quality
      FROM d0 s
      LEFT JOIN gate g USING (doc_id)
      LEFT JOIN exact e ON e.doc_id = s.doc_id
      LEFT JOIN near n ON n.doc_id = s.doc_id
      LEFT JOIN decon dc ON dc.doc_id = s.doc_id
      LEFT JOIN qual q ON q.doc_id = s.doc_id
      GROUP BY s.source)
    SELECT source, n_raw, n_gate, n_exact, n_near, n_decontam, n_quality,
           ROUND(CAST(n_quality AS DOUBLE) / n_raw + 1e-9, 6) AS retention
    FROM per ORDER BY source
    """,
)
def pipeline_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation FUNNEL report: per source, survivor counts through
    every stage of the standard LLM-corpus pipeline — raw (train side)
    -> lang/length gate -> exact dedup (md5 fingerprint, keep-min-id)
    -> near-dedup (drop any doc with a smaller LSH partner at est >=
    0.5 among exact survivors) -> eval-set 4-gram decontamination ->
    quality gate (shared quality_score >= 0.5) — plus end-to-end
    retention. The dashboard that shows WHERE each feed loses its data
    (a feed dying at near-dedup is syndication; at decontam it is
    leaking the benchmark; at quality it is junk).

    Shape: one documents scan fans into stage flags — the gates are
    scan-side predicates, exact dedup is one hash-partitioned window
    (32-char keys, never text), near-dedup is two semi/anti joins
    against the SHARED signature table's pair list, decontamination
    broadcasts the bounded test-gram set, and the funnel is one rollup
    of left-join flags. Every stage membership is deterministic, so the
    whole funnel is exactly oracle-checked.
    """
    from pyspark.sql import Window

    d = T(spark, sf_dir, "documents")
    d0 = d.filter(F.col("doc_id") % 50 != 0)
    gate = d0.filter(
        F.col("lang").isin("en", "fr", "es", "de")
        & F.col("n_chars").between(50, 5000)
    )
    w = Window.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
    exact = (
        gate.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    pairs = D.minhash_lsh_pairs(
        d,
        min_jaccard=0.5,
        sig=shared_doc_sigs(spark, sf_dir),
        banded=shared_doc_banded(spark, sf_dir),
    )
    # r12: every stage frame is lazily persisted — the funnel counts each
    # stage AND each later stage's lineage contains all earlier ones, so
    # unpersisted the exact-dedup window re-ran ~4x and the banded LSH
    # pair build ~3x inside the one rollup plan
    from sqlitedataframe_spark.operators.util import register_cache

    exact = register_cache(exact.persist())
    ex_ids = exact.select("doc_id")
    drop_b = (
        pairs.join(ex_ids.withColumnRenamed("doc_id", "id_a"), "id_a", "semi")
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    near = register_cache(exact.join(drop_b, "doc_id", "anti").persist())
    from sqlitedataframe_spark.operators.text import ngram_contamination

    test = d.filter(F.col("doc_id") % 50 == 0)
    cont = ngram_contamination(d0, test, n=4).select("doc_id")
    decon = register_cache(near.join(cont, "doc_id", "anti").persist())
    qual = decon.filter(quality_score("text") >= 0.5)

    def cnt(frame: DataFrame, name: str) -> DataFrame:
        return frame.groupBy("source").agg(
            F.count(F.lit(1)).cast("bigint").alias(name)
        )

    out = cnt(d0, "n_raw")
    for frame, name in [
        (gate, "n_gate"),
        (exact, "n_exact"),
        (near, "n_near"),
        (decon, "n_decontam"),
        (qual, "n_quality"),
    ]:
        out = out.join(cnt(frame, name), "source", "left")
    zeroed = [
        F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(c)
        for c in ("n_gate", "n_exact", "n_near", "n_decontam", "n_quality")
    ]
    return out.select(
        "source",
        "n_raw",
        *zeroed,
    ).select(
        "*",
        F.round(
            F.col("n_quality").cast("double") / F.col("n_raw") + 1e-9, 6
        ).alias("retention"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# Streaming mergeable bottom-k rollup.
# ---------------------------------------------------------------------------
@query(
    "stream_bottomk_rollup",
    oracle="""
    WITH s AS (
      SELECT event_type AS g, value AS v,
             CAST(event_id AS VARCHAR) AS kc,
             md5(CAST(event_id AS VARCHAR)) AS h
      FROM events),
    rk AS (
      SELECT g, v, ROW_NUMBER() OVER (PARTITION BY g ORDER BY h, kc) AS rn
      FROM s)
    SELECT g AS event_type, CAST(COUNT(*) AS BIGINT) AS k_eff,
           ROUND(quantile_cont(v, 0.5) + 1e-9, 4) AS p50_est,
           ROUND(quantile_cont(v, 0.9) + 1e-9, 4) AS p90_est
    FROM rk WHERE rn <= 64 GROUP BY g ORDER BY event_type
    """,
)
def stream_bottomk_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming mergeable bottom-k rollup through the SQLite bridge:
    each micro-batch keeps only its per-event-type bottom-64 sample
    (operators.sketch.bottomk_sample — the KMV law makes per-batch
    samples MERGEABLE: bottom-k of the union == bottom-k of the
    per-batch bottom-ks), appends the tiny sample to an append-only
    SQLite log, and the final answer re-merges the log and reads off
    the sampled value quantiles. The continuous-profile pattern at
    100 TB: raw events are touched once per batch, the log grows by at
    most k rows per (batch, group), and re-aggregation never replays
    the stream. Exactly oracle-checked against the one-shot flat
    bottom-k over the whole table — the merge must be bit-identical.
    """
    import os as _os
    import tempfile as _tempfile

    from sqlitedataframe_spark.operators.sketch import bottomk_sample
    from sqlitedataframe_spark.sources.sqlite import (
        read_sql,
        table_exists,
        write_sql,
    )
    from sqlitedataframe_spark.streaming.core import read_table_stream

    db = _os.path.join(
        _tempfile.gettempdir(),
        f"sdfspark_bk_{_os.path.basename(sf_dir)}.db",
    )
    if _os.path.exists(db):
        _os.remove(db)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        samp = bottomk_sample(
            batch_df.select("event_type", "event_id", "value"),
            "event_type",
            F.col("event_id"),
            k=64,
        )
        mode = "append" if table_exists(db, "bk_log") else "replace"
        write_sql(samp, db, table="bk_log", if_exists=mode)

    s = read_table_stream(spark, sf_dir, "events").select(
        "event_type", "event_id", "value"
    )
    with _tempfile.TemporaryDirectory() as ckpt:
        q = (
            s.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    log = read_sql(spark, db, table="bk_log").select(
        "event_type", "event_id", "value"
    )
    merged = bottomk_sample(log, "event_type", F.col("event_id"), k=64)
    return (
        merged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k_eff"),
            F.round(F.percentile("value", F.lit(0.5)) + 1e-9, 4).alias(
                "p50_est"
            ),
            F.round(F.percentile("value", F.lit(0.9)) + 1e-9, 4).alias(
                "p90_est"
            ),
        )
        .orderBy("event_type")
    )
