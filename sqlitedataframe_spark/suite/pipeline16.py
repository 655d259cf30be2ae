"""Round-10 wave: span-cluster rollups over the LCS evidence (exact
substring dedup ACROSS sources at the cluster grain); tokenizer
fertility / compression by lang x source from the learned BPE merge
table; a stratified eval-set decontamination report; mergeable bottom-k
quantile sketches next to the exact percentiles; group-aware CUPED with
per-stratum theta; a customer-cohort LTV triangle; and three
checker-fidelity probe queries whose outputs live in exactly the cell
classes the r9->r10 normalizer audit flagged (scaled DECIMAL cells,
BIGINTs past 1e15, and full->9dp doubles) so any driver-vs-local hash
divergence in those classes surfaces as a driver signal immediately
(VERDICT r9 tasks #2 and #3).

Conventions unchanged: exact integer (DECIMAL(38,0) <-> HUGEINT)
moments, ROUND(...) on both sides for float outputs, `+ 0.0` on signed
near-zero statistics, identical aliases in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlitedataframe_spark.operators import dedup as D
from sqlitedataframe_spark.operators.evalmetrics import cuped_stratified
from sqlitedataframe_spark.operators.graph import connected_components
from sqlitedataframe_spark.operators.sketch import bottomk_quantiles
from sqlitedataframe_spark.operators.text import (
    BPE_SEP,
    bpe_fertility_by_group,
    ngram_contamination,
)
from sqlitedataframe_spark.suite import query
from sqlitedataframe_spark.suite.pipeline import MH_EST_CTE, shared_doc_sigs
from sqlitedataframe_spark.suite.pipeline15 import LCS_SPANS_CTES
from sqlitedataframe_spark.suite.relational import T


# ---------------------------------------------------------------------------
# Span-cluster rollups: ExactSubstr evidence composed to the cluster grain.
# ---------------------------------------------------------------------------
@query(
    "dedup_span_clusters",
    oracle=MH_EST_CTE.replace("WITH t AS", "WITH RECURSIVE t AS", 1)
    + LCS_SPANS_CTES
    + """,
    ed AS (SELECT id_a, id_b, lcs_est FROM spanstats WHERE lcs_ratio >= 0.2),
    nds AS (SELECT id_a AS id FROM ed UNION SELECT id_b FROM ed),
    sym AS (SELECT id_a AS src, id_b AS dst FROM ed
            UNION SELECT id_b, id_a FROM ed),
    walk(node, comp) AS (
      SELECT id, id FROM nds
      UNION
      SELECT s.dst, w.comp FROM walk w JOIN sym s ON s.src = w.node),
    comp AS (
      SELECT node AS doc_id, CAST(MIN(comp) AS BIGINT) AS component
      FROM walk GROUP BY node),
    dstats AS (
      SELECT c.component, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT doc.source) AS BIGINT) AS n_sources
      FROM comp c JOIN documents doc USING (doc_id) GROUP BY 1),
    estats AS (
      SELECT c.component, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(MAX(e.lcs_est) AS BIGINT) AS max_lcs_est,
             CAST(SUM(e.lcs_est) AS BIGINT) AS total_lcs_est
      FROM ed e JOIN comp c ON c.doc_id = e.id_a GROUP BY 1)
    SELECT d.component, n_docs, n_sources, n_pairs, max_lcs_est,
           total_lcs_est, n_sources > 1 AS cross_source
    FROM dstats d JOIN estats USING (component)
    ORDER BY component
    """,
)
def dedup_span_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-CLUSTER rollup (VERDICT r9 #2a): the per-pair LCS span
    evidence of dedup_lcs_spans, upgraded to the grain dedup decisions
    are actually made at — connected components over the strong-span
    pairs (lcs_ratio >= 0.2), with per-cluster doc/source/pair counts,
    the largest and total shared-span estimates, and the cross_source
    flag that separates intra-feed boilerplate from cross-feed
    syndication (the case where naive per-source dedup misses every
    duplicate).

    Shape: operators.dedup.lcs_span_stats over the SAME shared LSH
    candidate table, filtered to strong spans; operators.graph.
    connected_components (pointer-jumped, bounded rounds) labels the
    cluster; two slim aggregates (doc grain, edge grain) join on the
    component id. The corpus text never shuffles past the shingle
    stage; everything after the span filter is id-sized.
    """
    from sqlitedataframe_spark.suite.pipeline15 import shared_lcs_spanstats

    d = T(spark, sf_dir, "documents")
    spans = shared_lcs_spanstats(spark, sf_dir)
    ed = spans.filter(F.col("lcs_ratio") >= 0.2).select(
        "id_a", "id_b", "lcs_est"
    )
    nodes = (
        ed.select(F.col("id_a").alias("doc_id"))
        .unionByName(ed.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    comp = connected_components(
        ed.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        nodes=nodes,
        node_col="doc_id",
    ).select(F.col("node").alias("doc_id"), F.col("comp").alias("component"))
    dstats = (
        comp.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("component")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
        )
    )
    estats = (
        ed.join(comp, ed["id_a"] == comp["doc_id"])
        .groupBy("component")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.max("lcs_est").cast("bigint").alias("max_lcs_est"),
            F.sum("lcs_est").cast("bigint").alias("total_lcs_est"),
        )
    )
    return (
        dstats.join(estats, "component")
        .select(
            "component",
            "n_docs",
            "n_sources",
            "n_pairs",
            "max_lcs_est",
            "total_lcs_est",
            (F.col("n_sources") > 1).alias("cross_source"),
        )
        .orderBy("component")
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility / compression by lang x source.
# ---------------------------------------------------------------------------
def _bpe_fertility_oracle(n_merges: int) -> str:
    """DuckDB twin of operators.text.bpe_fertility_by_group: the same
    merge-learning chain as pipeline15._bpe_oracle, but the apply chain
    carries WORD IDENTITY so per-word symbol counts can join back to the
    (lang, source, word) occurrence stream."""
    S = BPE_SEP
    parts = [
        f"""WITH v AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS f
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE length(word) >= 1 GROUP BY word),
    w0 AS (
      SELECT word, array_to_string(
               list_transform(range(1, length(word) + 1),
                              i -> substr(word, i, 1)), '{S}') AS s, f
      FROM v)"""
    ]
    for r in range(1, n_merges + 1):
        parts.append(
            f"""m{r} AS (
      SELECT p AS pair, CAST(SUM(f) AS BIGINT) AS n,
             string_split(p, '{S}')[1] AS a, string_split(p, '{S}')[2] AS b
      FROM (
        SELECT t.a[i.i] || '{S}' || t.a[i.i + 1] AS p, t.f AS f
        FROM (SELECT string_split(s, '{S}') AS a, f FROM w{r - 1}) t,
             UNNEST(generate_series(1, len(t.a) - 1)) i(i))
      GROUP BY p ORDER BY n DESC, p LIMIT 1)"""
        )
        parts.append(
            f"""w{r} AS (
      SELECT word, list_reduce(string_split(s, '{S}'), (acc, x) ->
        CASE WHEN x = m.b AND (acc = m.a OR ends_with(acc, '{S}' || m.a))
             THEN substr(acc, 1, length(acc) - length(m.a)) || m.a || m.b
             ELSE acc || '{S}' || x END) AS s, f
      FROM w{r - 1} CROSS JOIN m{r} m)"""
        )
    return (
        ",\n".join(parts)
        + f""",
    wsyms AS (
      SELECT word, CAST(len(string_split(s, '{S}')) AS BIGINT) AS syms
      FROM w{n_merges}),
    occ AS (
      SELECT lang, source, unnest(string_split(text, ' ')) AS word
      FROM documents),
    occ2 AS (SELECT lang, source, word FROM occ WHERE length(word) >= 1),
    gw AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_words,
             CAST(SUM(syms) AS BIGINT) AS n_symbols
      FROM occ2 JOIN wsyms USING (word) GROUP BY 1, 2),
    gd AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(strlen(text)) AS BIGINT) AS n_bytes
      FROM documents GROUP BY 1, 2)
    SELECT gd.lang, gd.source, n_docs, n_words, n_symbols, n_bytes,
           ROUND(CAST(n_symbols AS DOUBLE) / n_words + 1e-9, 6) AS fertility,
           ROUND(CAST(n_bytes AS DOUBLE) / n_symbols + 1e-9, 6)
             AS bytes_per_symbol
    FROM gd JOIN gw USING (lang, source)
    ORDER BY lang, source
    """
    )


@query("text_tokenizer_fertility", oracle=_bpe_fertility_oracle(5))
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility / compression-ratio table by lang x source
    (VERDICT r9 #2b): the 5-round corpus-learned BPE merge table of
    text_bpe_merges, APPLIED per source — BPE symbols per whitespace
    word (fertility) and bytes per symbol (compression) — the readout
    that converts a mixture plan's byte budgets into token budgets per
    feed.

    operators.text.bpe_fertility_by_group: merges learned once (5-row
    model-state collect), symbol counts computed once per UNIQUE word
    and joined back to the slim (lang, source, word) occurrence stream;
    ratios are single divisions over exact integer sums.
    """
    return bpe_fertility_by_group(
        T(spark, sf_dir, "documents"), ["lang", "source"], "text", n_merges=5
    )


# ---------------------------------------------------------------------------
# Stratified eval-set decontamination report.
# ---------------------------------------------------------------------------
@query(
    "dedup_decontam_stratified",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
      SELECT doc_id, array_to_string(t[i:i+3], ' ') AS gram
      FROM toks, UNNEST(generate_series(1, len(t) - 3)) AS r(i)),
    test_grams AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 50 = 0),
    cont AS (
      SELECT DISTINCT g.doc_id
      FROM grams g JOIN test_grams USING (gram)
      WHERE g.doc_id % 50 <> 0),
    tr AS (
      SELECT doc_id, source, lang, n_chars FROM documents
      WHERE doc_id % 50 <> 0)
    SELECT source, lang,
           CAST(COUNT(*) AS BIGINT) AS n_train,
           CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contaminated,
           CAST(SUM(CASE WHEN c.doc_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clean,
           CAST(SUM(CASE WHEN c.doc_id IS NULL THEN n_chars ELSE 0 END)
                AS BIGINT) AS clean_chars,
           ROUND(CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*) + 1e-9, 6) AS contam_rate
    FROM tr LEFT JOIN cont c USING (doc_id)
    GROUP BY source, lang
    ORDER BY source, lang
    """,
)
def dedup_decontam_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified decontamination report (VERDICT r9 #2c): the
    dedup_decontaminate 4-gram contamination check, rolled up to the
    (source, lang) strata a curation pipeline actually acts on — how
    much of each feed survives the eval-set anti-join (docs and chars),
    and each feed's contamination rate (a feed with 30% contamination
    is leaking the benchmark; a uniform 1% is shared boilerplate).

    Shape: operators.text.ngram_contamination (bounded test grams
    broadcast; the train side never shuffles) -> LEFT join back to the
    slim (doc_id, source, lang, n_chars) frame -> one rollup. The
    anti-join survivors are counted, never materialized.
    """
    d = T(spark, sf_dir, "documents")
    test = d.filter(F.col("doc_id") % 50 == 0)
    train = d.filter(F.col("doc_id") % 50 != 0)
    cont = ngram_contamination(train, test, n=4).select(
        "doc_id", F.lit(1).alias("_c")
    )
    base = train.select("doc_id", "source", "lang", "n_chars")
    return (
        base.join(cont, "doc_id", "left")
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_train"),
            F.sum(F.when(F.col("_c").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_contaminated"),
            F.sum(F.when(F.col("_c").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clean"),
            F.sum(F.when(F.col("_c").isNull(), F.col("n_chars")).otherwise(0))
            .cast("bigint")
            .alias("clean_chars"),
        )
        .select(
            "source",
            "lang",
            "n_train",
            "n_contaminated",
            "n_clean",
            "clean_chars",
            F.round(
                F.col("n_contaminated").cast("double") / F.col("n_train")
                + 1e-9,
                6,
            ).alias("contam_rate"),
        )
        .orderBy("source", "lang")
    )


# ---------------------------------------------------------------------------
# Mergeable bottom-k quantile sketch vs exact percentiles.
# ---------------------------------------------------------------------------
@query(
    "agg_bottomk_quantiles",
    oracle="""
    WITH s AS (
      SELECT l_returnflag AS g, l_extendedprice AS v,
             CAST(l_orderkey AS VARCHAR) || ':' ||
               CAST(l_linenumber AS VARCHAR) AS kc,
             md5(CAST(l_orderkey AS VARCHAR) || ':' ||
                 CAST(l_linenumber AS VARCHAR)) AS h
      FROM lineitem),
    ex AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
             quantile_cont(v, 0.5) AS x50, quantile_cont(v, 0.9) AS x90
      FROM s GROUP BY 1),
    rk AS (
      SELECT g, v, ROW_NUMBER() OVER (PARTITION BY g ORDER BY h, kc) AS rn
      FROM s),
    sk AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS k_eff,
             quantile_cont(v, 0.5) AS s50, quantile_cont(v, 0.9) AS s90
      FROM rk WHERE rn <= 256 GROUP BY 1)
    SELECT ex.g AS l_returnflag, n, k_eff,
           ROUND(x50 + 1e-9, 4) AS p50_exact,
           ROUND(s50 + 1e-9, 4) AS p50_est,
           ROUND(ABS(s50 - x50) + 1e-9, 4) AS p50_abs_err,
           ROUND(x90 + 1e-9, 4) AS p90_exact,
           ROUND(s90 + 1e-9, 4) AS p90_est,
           ROUND(ABS(s90 - x90) + 1e-9, 4) AS p90_abs_err
    FROM ex JOIN sk USING (g)
    ORDER BY l_returnflag
    """,
)
def agg_bottomk_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k (KMV-family) quantile sketch next to the exact
    interpolated percentiles (VERDICT r9 #2d): per return flag, the
    256-row deterministic min-hash sample's p50/p90 beside the exact
    ones and the absolute error — the sketch-qualification readout,
    with MERGEABILITY structural in the plan (per-shard bottom-k
    windows merge to the group bottom-k; no window ever sees a whole
    group — see operators.sketch.bottomk_sample; merge parity is
    pytest-proven in tests/test_round10_ops.py).
    """
    li = T(spark, sf_dir, "lineitem")
    return bottomk_quantiles(
        li.select("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber"),
        group_col="l_returnflag",
        value_col="l_extendedprice",
        key_col=F.concat_ws(":", "l_orderkey", "l_linenumber"),
        k=256,
        qs=(0.5, 0.9),
    )


# ---------------------------------------------------------------------------
# Group-aware CUPED: per-stratum theta.
# ---------------------------------------------------------------------------
@query(
    "events_cuped_stratified",
    oracle="""
    WITH b AS (
      SELECT CAST(MIN(epoch_us(ts)) AS BIGINT) AS lo,
             CAST(MAX(epoch_us(ts)) AS BIGINT) AS hi
      FROM events),
    m AS (SELECT lo + (hi - lo) // 2 AS mid FROM b),
    u AS (
      SELECT user_id % 3 AS stratum, user_id % 2 AS variant,
             CAST(SUM(CASE WHEN epoch_us(ts) < mid
                      THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(SUM(CASE WHEN epoch_us(ts) >= mid
                      THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS y
      FROM events, m GROUP BY user_id, user_id % 3, user_id % 2),
    per AS (
      SELECT stratum, variant, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy
      FROM u GROUP BY 1, 2),
    pooled AS (
      SELECT stratum, CAST(COUNT(*) AS BIGINT) AS tn,
             SUM(CAST(x AS HUGEINT)) AS tsx, SUM(CAST(y AS HUGEINT)) AS tsy,
             SUM(CAST(x AS HUGEINT) * x) AS txx,
             SUM(CAST(y AS HUGEINT) * y) AS tyy,
             SUM(CAST(x AS HUGEINT) * y) AS txy
      FROM u GROUP BY 1),
    d AS (
      SELECT per.stratum, variant, n,
             CAST(tn AS DOUBLE) AS tn,
             CAST(tsx AS DOUBLE) AS tsx, CAST(tsy AS DOUBLE) AS tsy,
             CAST(txx AS DOUBLE) AS txx, CAST(tyy AS DOUBLE) AS tyy,
             CAST(txy AS DOUBLE) AS txy,
             CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
             CAST(n AS DOUBLE) AS nn
      FROM per JOIN pooled USING (stratum)),
    f AS (
      SELECT stratum, variant, n,
             (txy - tsx * tsy / tn) / (tn - 1.0) AS cov,
             (txx - tsx * tsx / tn) / (tn - 1.0) AS varx,
             (tyy - tsy * tsy / tn) / (tn - 1.0) AS vary,
             sy / nn AS mean_y, sx / nn AS mean_x,
             tsx / tn AS mean_x_all
      FROM d)
    SELECT stratum, variant, n,
           ROUND(mean_y + 1e-9, 6) + 0.0 AS mean_post,
           ROUND(mean_y - (cov / varx) * (mean_x - mean_x_all) + 1e-9, 6)
             + 0.0 AS mean_cuped,
           ROUND(cov / varx + 1e-9, 6) + 0.0 AS theta,
           ROUND((cov * cov) / (varx * vary) + 1e-9, 6) AS var_reduction
    FROM f ORDER BY stratum, variant
    """,
)
def events_cuped_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware CUPED (VERDICT r9 #2e): events_cuped with the theta
    estimated PER STRATUM (here the user_id % 3 blocking key standing
    in for an activity tier) — when the pre/post relationship differs
    across strata, a pooled theta under-corrects exactly the strata
    where the covariate is strongest; stratum-local theta recovers the
    full per-block variance reduction (post-stratified CUPED).

    operators.evalmetrics.cuped_stratified: cuped_adjustment keyed one
    level deeper — one (stratum, variant) integer-cent moment aggregate
    plus one |strata|-row pooled-moment broadcast join; every sum is
    DECIMAL(38,0), doubles only in the final projection. NOTE: pre/post
    sums are in integer cents already, so scale=1 (quantization happened
    upstream — same convention as events_cuped).
    """
    ev = T(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    bounds = ev.agg(F.min(us).alias("_lo"), F.max(us).alias("_hi")).select(
        (F.col("_lo") + F.floor((F.col("_hi") - F.col("_lo")) / 2)).alias("_mid")
    )
    cents = F.round(F.col("value") * 100).cast("bigint")
    per_user = (
        ev.join(F.broadcast(bounds))
        .groupBy(
            "user_id",
            (F.col("user_id") % 3).alias("stratum"),
            (F.col("user_id") % 2).alias("variant"),
        )
        .agg(
            F.sum(F.when(us < F.col("_mid"), cents).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("x"),
            F.sum(F.when(us >= F.col("_mid"), cents).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("y"),
        )
    )
    return cuped_stratified(
        per_user, "stratum", "variant", "x", "y", scale=1
    )


# ---------------------------------------------------------------------------
# Checker-fidelity probe: scaled-DECIMAL ledger.
# ---------------------------------------------------------------------------
@query(
    "agg_decimal_ledger",
    oracle="""
    WITH q AS (
      SELECT l_returnflag, l_linestatus,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(ROUND(l_discount * 10000) AS BIGINT) AS bps_d,
             CAST(ROUND(l_tax * 10000) AS BIGINT) AS bps_t
      FROM lineitem),
    s AS (
      SELECT l_returnflag, l_linestatus,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(cents AS HUGEINT)) AS gross,
             SUM(CAST(cents AS HUGEINT) * (10000 - bps_d)) AS disc,
             SUM(CAST(cents AS HUGEINT) * (10000 - bps_d) * (10000 + bps_t))
               AS charged
      FROM q GROUP BY 1, 2)
    SELECT l_returnflag, l_linestatus, n,
           CAST(gross AS VARCHAR) AS gross_cents,
           CAST(disc AS VARCHAR) AS disc_micros,
           CAST(charged AS VARCHAR) AS charged_e10
    FROM s ORDER BY l_returnflag, l_linestatus
    """,
)
def agg_decimal_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL revenue ledger — gross (cent), discounted
    (micro-dollar) and charged (1e-10-dollar) ledgers, all arithmetic
    in exact DECIMAL(38,0)/HUGEINT, every money cell crossing the
    driver hash as a plain VARCHAR digit string on BOTH engines.

    Probe history (VERDICT r10 #1, r11 #1): the r10 fractional-scale
    DECIMAL(38,2) cell was driver-red on bit-identical local cells, and
    the r11 integer-scale DECIMAL(38,0) re-emit was STILL driver-red
    while the BIGINT>2^53 probe (profile_key_checksums) and the
    full-precision-double probe (profile_exact_ratios) stayed green —
    so the driver's normalizer diverges on the Decimal TYPE itself
    (Spark returns decimal.Decimal objects, DuckDB returns ints), not
    on any scale. Suite-wide convention adopted from that evidence: NO
    Decimal-typed column may appear in hashed output at all — exact
    wide integers ship as VARCHAR digits (this query) or hi/lo BIGINT
    limbs (profile_wide_limbs); the DECIMAL(38,0) arithmetic stays
    internal. Enforced as a hard error by tools/plan_audit.py
    (decimal_output_cols), tools/checker_fidelity_scan.py's DECOUT
    class, and tests/test_round11_ops.py.

    Shape: one scan, integer quantization scan-side, one grouped
    DECIMAL(38,0) moment aggregate (map-side combined; 6 output rows).
    """
    li = T(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    bps_d = F.round(F.col("l_discount") * 10000).cast("bigint")
    bps_t = F.round(F.col("l_tax") * 10000).cast("bigint")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    return (
        li.select(
            "l_returnflag",
            "l_linestatus",
            cents.alias("_c"),
            bps_d.alias("_d"),
            bps_t.alias("_t"),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(dec(F.col("_c"))).alias("_gross"),
            F.sum(dec(F.col("_c")) * (10000 - F.col("_d"))).alias("_disc"),
            F.sum(
                dec(F.col("_c"))
                * (10000 - F.col("_d"))
                * (10000 + F.col("_t"))
            ).alias("_charged"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "n",
            F.col("_gross").cast("decimal(38,0)").cast("string").alias("gross_cents"),
            F.col("_disc").cast("decimal(38,0)").cast("string").alias("disc_micros"),
            F.col("_charged").cast("decimal(38,0)").cast("string").alias("charged_e10"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Checker-fidelity probe: near-2^60 BIGINT key checksums.
# ---------------------------------------------------------------------------
_CHK_PRIME = 1_000_000_000_000_000_003  # prime just above 1e18, < 2^63


def _chk_oracle_one(table: str, key_sql: str) -> str:
    return f"""
    SELECT '{table}' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(CAST('0x' || substr(md5({key_sql}), 1, 12)
                          AS BIGINT) AS HUGEINT)) % {_CHK_PRIME}
                AS BIGINT) AS key_checksum
    FROM {table}"""


@query(
    "profile_key_checksums",
    oracle="\nUNION ALL\n".join(
        [
            _chk_oracle_one("customer", "CAST(c_custkey AS VARCHAR)"),
            _chk_oracle_one("documents", "CAST(doc_id AS VARCHAR)"),
            _chk_oracle_one("events", "CAST(event_id AS VARCHAR)"),
            _chk_oracle_one(
                "lineitem",
                "CAST(l_orderkey AS VARCHAR) || ':' || "
                "CAST(l_linenumber AS VARCHAR)",
            ),
            _chk_oracle_one("orders", "CAST(o_orderkey AS VARCHAR)"),
        ]
    )
    + "\nORDER BY tbl",
)
def profile_key_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive per-table key checksums — and the r10
    checker-fidelity PROBE for BIGINT cells beyond 1e15 (VERDICT r9
    #3): the md5-prefix hash of every key accumulates in DECIMAL(38,0)
    / HUGEINT and reduces mod a prime just above 1e18, so each checksum
    cell is a bigint far past the 1e15 float==int rendering boundary —
    any driver-side normalization that rounds large integers through a
    double mangles this cell and reds the query instantly. Operationally
    it is the cross-copy integrity check a migration runs per table
    (same checksum <=> same key multiset, mod collisions).

    Shape: five 1-row scan aggregates (map-side combined; the hash is a
    scan-side expression) unioned driver-side — no shuffle carries more
    than one row per partition.
    """
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731

    def one(table: str, key_col) -> DataFrame:
        h = F.conv(
            F.substring(F.md5(key_col.cast("string").cast("binary")), 1, 12),
            16,
            10,
        ).cast("bigint")
        return (
            T(spark, sf_dir, table)
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                (F.sum(dec(h)) % F.lit(_CHK_PRIME).cast("decimal(38,0)"))
                .cast("bigint")
                .alias("key_checksum"),
            )
            .select(F.lit(table).alias("tbl"), "n_rows", "key_checksum")
        )

    frames = [
        one("customer", F.col("c_custkey")),
        one("documents", F.col("doc_id")),
        one("events", F.col("event_id")),
        one("lineitem", F.concat_ws(":", "l_orderkey", "l_linenumber")),
        one("orders", F.col("o_orderkey")),
    ]
    out = frames[0]
    for fdf in frames[1:]:
        out = out.unionByName(fdf)
    return out.orderBy("tbl")


# ---------------------------------------------------------------------------
# Checker-fidelity probe PAIR: the SAME >2^63 exact integer as (a) VARCHAR
# digits and (b) hi/lo BIGINT limbs — pins the driver's Decimal behavior.
# ---------------------------------------------------------------------------
_WIDE_TOTAL_CTE = """
    WITH q AS (
      SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(ROUND(l_discount * 10000) AS BIGINT) AS bps_d,
             CAST(ROUND(l_tax * 10000) AS BIGINT) AS bps_t
      FROM lineitem),
    t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(cents AS HUGEINT) * (10000 - bps_d) * (10000 + bps_t))
               AS total
      FROM q)
"""


def _wide_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared exact wide total: SUM(cents*(10000-d_bps)*(10000+t_bps))
    over lineitem in DECIMAL(38,0) — ~6e19 at sf0.01, past 2^63, so any
    int64 truncation or float collapse anywhere in a hash path mangles
    it instantly. One scan, map-side combined, 1 output row."""
    li = T(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    bps_d = F.round(F.col("l_discount") * 10000).cast("bigint")
    bps_t = F.round(F.col("l_tax") * 10000).cast("bigint")
    term = (
        cents.cast("decimal(38,0)")
        * (F.lit(10000) - bps_d)
        * (F.lit(10000) + bps_t)
    )
    return li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(term).cast("decimal(38,0)").alias("_total"),
    )


@query(
    "profile_wide_varchar",
    oracle=_WIDE_TOTAL_CTE
    + """
    SELECT n, CAST(total AS VARCHAR) AS charged_total FROM t
    """,
)
def profile_wide_varchar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-normalizer probe (VERDICT r11 #2), VARCHAR half: the exact
    >2^63 charged-ledger total emitted as a digit STRING on both engines.
    Paired with profile_wide_limbs (same value as two BIGINT limbs); the
    r11 capture proved Decimal-typed cells red in the driver hash even at
    integer scale, so these two representations are the only sanctioned
    carriers for exact wide integers — both must stay driver-green, and
    together they turn the no-Decimal-output convention into pinned
    evidence rather than folklore."""
    return _wide_total(spark, sf_dir).select(
        "n", F.col("_total").cast("string").alias("charged_total")
    )


@query(
    "profile_wide_limbs",
    oracle=_WIDE_TOTAL_CTE
    + """
    SELECT n, CAST(total // 1000000000 AS BIGINT) AS charged_hi,
           CAST(total % 1000000000 AS BIGINT) AS charged_lo
    FROM t
    """,
)
def profile_wide_limbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-normalizer probe (VERDICT r11 #2), BIGINT-limbs half: the
    SAME exact >2^63 total as profile_wide_varchar, split as
    (total div 1e9, total mod 1e9) — both limbs comfortably inside
    int64, reconstructible as hi*1e9 + lo. See profile_wide_varchar for
    the evidence chain this pair pins down."""
    t = _wide_total(spark, sf_dir)
    return t.select(
        "n",
        F.expr("_total div 1000000000").cast("bigint").alias("charged_hi"),
        (F.col("_total") % F.lit(1000000000)).cast("bigint").alias("charged_lo"),
    )


# ---------------------------------------------------------------------------
# Checker-fidelity probe: full-precision doubles from exact ratios.
# ---------------------------------------------------------------------------
@query(
    "profile_exact_ratios",
    oracle="""
    WITH s AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             CAST(SUM(len(regexp_split_to_array(lower(trim(text)), '\\s+')))
                  AS BIGINT) AS sum_tokens
      FROM documents GROUP BY 1)
    SELECT source, n_docs, sum_chars, sum_tokens,
           CAST(sum_chars AS DOUBLE) / n_docs AS chars_per_doc,
           CAST(sum_tokens AS DOUBLE) / n_docs AS tokens_per_doc,
           CAST(sum_chars AS DOUBLE) / sum_tokens AS chars_per_token
    FROM s ORDER BY source
    """,
)
def profile_exact_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus ratios at FULL double precision — the r10
    checker-fidelity PROBE for the >9-dp float class (VERDICT r9 #3):
    each ratio is ONE division of two exactly-represented integers, so
    both engines produce the bit-identical double and the cells ship
    UNROUNDED (reprs run past 9 decimal digits). Under the r9
    norm_cell, a sub-9dp divergence here was invisible; under the r10
    full-repr norm and in the driver's hash it reds immediately.

    Shape: one scan aggregate per source (token counts are scan-side
    expressions), divisions in the final projection.
    """
    from sqlitedataframe_spark.operators.text import tokens

    d = T(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.sum(F.size(tokens("text"))).cast("bigint").alias("sum_tokens"),
    )
    return s.select(
        "source",
        "n_docs",
        "sum_chars",
        "sum_tokens",
        (F.col("sum_chars").cast("double") / F.col("n_docs")).alias(
            "chars_per_doc"
        ),
        (F.col("sum_tokens").cast("double") / F.col("n_docs")).alias(
            "tokens_per_doc"
        ),
        (F.col("sum_chars").cast("double") / F.col("sum_tokens")).alias(
            "chars_per_token"
        ),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# Customer-cohort LTV triangle.
# ---------------------------------------------------------------------------
@query(
    "orders_cohort_ltv",
    oracle="""
    WITH firstm AS (
      SELECT o_custkey,
             CAST(MIN(date_trunc('month', o_orderdate)) AS DATE) AS m0
      FROM orders GROUP BY 1),
    rev AS (
      SELECT o_custkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    g AS (
      SELECT m0 AS cohort_month,
             CAST(date_diff('month', m0, m) AS BIGINT) AS month_offset,
             CAST(COUNT(DISTINCT rev.o_custkey) AS BIGINT) AS n_active,
             CAST(SUM(cents) AS BIGINT) AS rev_cents
      FROM rev JOIN firstm USING (o_custkey) GROUP BY 1, 2),
    sz AS (
      SELECT m0 AS cohort_month, CAST(COUNT(*) AS BIGINT) AS cohort_users
      FROM firstm GROUP BY 1),
    cum AS (
      SELECT g.cohort_month, month_offset, n_active, rev_cents, cohort_users,
             CAST(SUM(rev_cents) OVER (PARTITION BY g.cohort_month
                                       ORDER BY month_offset)
                  AS BIGINT) AS cum_rev_cents
      FROM g JOIN sz USING (cohort_month))
    SELECT cohort_month, month_offset, cohort_users, n_active, rev_cents,
           cum_rev_cents,
           ROUND(CAST(cum_rev_cents AS DOUBLE) / cohort_users / 100 + 1e-9, 4)
             AS ltv_usd
    FROM cum ORDER BY cohort_month, month_offset
    """,
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-cohort LTV triangle: customers grouped by first-order
    month, revenue accumulated per month offset, cumulative LTV per
    cohort member — the acquisition-quality readout (do newer cohorts
    monetize faster?) that events_retention gives for activity and this
    gives for revenue.

    Shape: one per-customer first-month aggregate, one join back on the
    SAME key (no extra exchange under AQE), one (cohort, offset) rollup
    in integer cents, and a running sum over a window partitioned by
    cohort (bounded: |offsets| rows per cohort after the rollup).
    """
    o = T(spark, sf_dir, "orders")
    m = F.trunc("o_orderdate", "month")
    firstm = o.groupBy("o_custkey").agg(F.min(m).alias("m0"))
    rev = o.select(
        "o_custkey",
        m.alias("m"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    g = (
        rev.join(firstm, "o_custkey")
        .groupBy(
            F.col("m0").alias("cohort_month"),
            F.months_between(F.col("m"), F.col("m0"))
            .cast("bigint")
            .alias("month_offset"),
        )
        .agg(
            F.countDistinct("o_custkey").cast("bigint").alias("n_active"),
            F.sum("cents").cast("bigint").alias("rev_cents"),
        )
    )
    sz = firstm.groupBy(F.col("m0").alias("cohort_month")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_users")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cohort_month").orderBy("month_offset")
    return (
        g.join(sz, "cohort_month")
        .withColumn(
            "cum_rev_cents", F.sum("rev_cents").over(w).cast("bigint")
        )
        .select(
            "cohort_month",
            "month_offset",
            "cohort_users",
            "n_active",
            "rev_cents",
            "cum_rev_cents",
            F.round(
                F.col("cum_rev_cents").cast("double")
                / F.col("cohort_users")
                / 100
                + 1e-9,
                4,
            ).alias("ltv_usd"),
        )
        .orderBy("cohort_month", "month_offset")
    )
