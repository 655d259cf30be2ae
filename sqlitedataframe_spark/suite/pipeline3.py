"""Round-3 pipeline queries: train/test decontamination, cohort retention,
ANN recall evaluation.

Like every suite module, each query pairs an idiomatic-Spark plan with a
DuckDB oracle (or is rows-only where no exact oracle exists by nature).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sqlitedataframe_spark.operators import similarity as S
from sqlitedataframe_spark.operators import text as X
from sqlitedataframe_spark.suite import query
from sqlitedataframe_spark.suite.relational import T


# ---------------------------------------------------------------------------
# Train/test decontamination: exact n-gram overlap against a held-out set.
# ---------------------------------------------------------------------------
@query(
    "dedup_decontaminate",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
      SELECT doc_id, array_to_string(t[i:i+3], ' ') AS gram
      FROM toks, UNNEST(generate_series(1, len(t) - 3)) AS r(i)
    ),
    test_grams AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 50 = 0),
    train_grams AS (SELECT DISTINCT doc_id, gram FROM grams WHERE doc_id % 50 <> 0)
    SELECT train_grams.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_grams
    FROM train_grams JOIN test_grams USING (gram)
    GROUP BY train_grams.doc_id
    ORDER BY doc_id
    """,
)
def dedup_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any word
    4-gram with the held-out set (every 50th doc plays the "test set").

    operators.text.ngram_contamination: grams expand map-side (scan-stage
    expressions, per-doc dedup via array_distinct), the bounded test-gram
    set broadcasts, so the train side — the 100 TB side — never shuffles;
    one aggregate on doc_id finishes it.
    """
    d = T(spark, sf_dir, "documents")
    test = d.filter(F.col("doc_id") % 50 == 0)
    train = d.filter(F.col("doc_id") % 50 != 0)
    return X.ngram_contamination(train, test, n=4).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Cohort retention: day-0 cohort x day-offset activity matrix.
# ---------------------------------------------------------------------------
@query(
    "events_retention",
    oracle="""
    WITH firstd AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id),
    act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
    SELECT d0 AS cohort_date, CAST(date_diff('day', d0, d) AS BIGINT) AS day_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM firstd JOIN act USING (user_id)
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort retention: users grouped by first-activity date,
    counted at each day offset they return.

    Plan shape: both inputs aggregate on user_id first (min-date and
    distinct active days — map-side partials shrink each to one slim row
    per user/user-day), then join on the SAME user_id key (no extra
    exchange under AQE since both sides are already hash-partitioned on
    it), then a tiny (cohort, offset) aggregate.
    """
    e = T(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    firstd = e.groupBy("user_id").agg(F.min("d").alias("d0"))
    act = e.distinct()
    return (
        act.join(firstd, "user_id")
        .groupBy(
            F.col("d0").alias("cohort_date"),
            F.datediff(F.col("d"), F.col("d0")).cast("bigint").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_date", "day_offset")
    )


# ---------------------------------------------------------------------------
# ANN quality evaluation: recall@10 of the sign-LSH path vs exact top-10.
# ---------------------------------------------------------------------------
def _lsh_plane_values() -> str:
    """The seeded 16 x 64 hyperplanes as a DuckDB VALUES literal (same
    constants the Spark query bakes in — pure function of seed 42)."""
    from sqlitedataframe_spark.operators.similarity import random_hyperplanes

    return ",\n      ".join(
        "({}, [{}]::DOUBLE[])".format(i, ", ".join(repr(x) for x in p))
        for i, p in enumerate(random_hyperplanes(64, 16, seed=42))
    )


@query(
    "sim_ann_recall",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    qs AS (SELECT vec_id AS qid, v AS q FROM e WHERE vec_id < 8),
    planes(pid, p) AS (VALUES
      {_lsh_plane_values()}),
    scored AS (
      SELECT qs.qid, e.vec_id,
             ROUND(list_dot_product(e.v, qs.q)
                   / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(qs.q, qs.q))),
                   6) AS cos_sim
      FROM e CROSS JOIN qs),
    exact AS (
      SELECT qid, vec_id FROM scored
      QUALIFY ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id) <= 10),
    sb AS (
      SELECT e.vec_id, pl.pid // 4 AS band,
             string_agg(CASE WHEN list_dot_product(e.v, pl.p) >= 0
                             THEN '1' ELSE '0' END, '' ORDER BY pl.pid) AS bucket
      FROM e CROSS JOIN planes pl
      GROUP BY e.vec_id, pl.pid // 4),
    qb AS (SELECT vec_id AS qid, band, bucket FROM sb WHERE vec_id < 8),
    cand AS (
      SELECT DISTINCT qb.qid, sb.vec_id
      FROM sb JOIN qb USING (band, bucket)),
    approx AS (
      SELECT s.qid, s.vec_id FROM scored s JOIN cand c USING (qid, vec_id)
      QUALIFY ROW_NUMBER() OVER (PARTITION BY s.qid ORDER BY s.cos_sim DESC, s.vec_id) <= 10),
    hits AS (
      SELECT ex.qid, COUNT(*) AS n_hits
      FROM exact ex JOIN approx ap USING (qid, vec_id)
      GROUP BY ex.qid)
    SELECT q.qid,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           ROUND(COALESCE(h.n_hits, 0) / 10.0, 2) AS recall_at_10
    FROM (SELECT DISTINCT qid FROM qs) q LEFT JOIN hits h USING (qid)
    ORDER BY q.qid
    """,
)
def sim_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the banded sign-LSH candidate path against exact
    brute-force cosine, over 8 query vectors at once — the evaluation
    harness that justifies shipping an ANN index at 100 TB. Exactly
    oracle-checked: the seeded hyperplanes are inlined constants, so both
    the exact and the LSH top-10 sets are pure functions of the data.

    Multi-query formulation: the 8 queries broadcast everywhere, the
    corpus is scanned twice (once scored exactly, once bucket-joined);
    per-query top-k comes from a window over qid — no per-query jobs, no
    driver loop.
    """
    k, dim, n_planes, bands = 10, 64, 16, 4
    e = T(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qs = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q")
    )

    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.col("vec_id"))

    # exact top-10 per query: corpus x broadcast(8 queries)
    exact = (
        e.crossJoin(F.broadcast(qs))
        .select(
            "qid",
            "vec_id",
            F.round(S.cosine(S.as_double("embedding"), S.as_double("q")), 6).alias(
                "cos_sim"
            ),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "vec_id")
    )

    # LSH candidates: same banded signatures as operators.similarity.lsh_topk
    planes = S.random_hyperplanes(dim, n_planes, seed=42)
    width = n_planes // bands

    def banded(vec) -> "F.Column":
        # r12 (util.hof_let): the per-band slices reference the signature
        # `bands` times — unbound, the whole 16-dot-product tree (and its
        # 16x64 plane literals) was duplicated AND evaluated once per band
        # (4x per row; the committed before-plan was 223 KB of repeated
        # literals). Same let-bind as operators.similarity.lsh_topk.
        from sqlitedataframe_spark.operators.util import hof_let

        return hof_let(
            S.signature_bits(vec, planes),
            lambda s: F.array(
                *[
                    F.array_join(
                        F.transform(
                            F.slice(s, b * width + 1, width),
                            lambda x: x.cast("string"),
                        ),
                        "",
                    )
                    for b in range(bands)
                ]
            ),
        )

    corpus_b = e.select(
        "vec_id",
        "embedding",
        F.posexplode(banded(F.col("embedding"))).alias("band", "bucket"),
    )
    qs_b = qs.select(
        "qid",
        "q",
        F.posexplode(banded(F.col("q"))).alias("band", "bucket"),
    )
    approx = (
        corpus_b.join(F.broadcast(qs_b), ["band", "bucket"])
        .dropDuplicates(["qid", "vec_id"])
        .select(
            "qid",
            "vec_id",
            F.round(S.cosine(S.as_double("embedding"), S.as_double("q")), 6).alias(
                "cos_sim"
            ),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "vec_id")
    )

    hits = exact.join(approx, ["qid", "vec_id"], "left_semi")
    hit_counts = hits.groupBy("qid").agg(F.count(F.lit(1)).alias("n_hits"))
    # Every probe must report a row: a query whose LSH buckets returned
    # nothing would otherwise VANISH from the report (inner semantics of
    # semi-join + groupBy), silently overstating aggregate recall. Left-join
    # the counts back onto the full probe set and coalesce misses to 0.
    return (
        qs.select("qid")
        .join(F.broadcast(hit_counts), "qid", "left")
        .select(
            "qid",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_hits"),
            F.round(F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(k), 2).alias(
                "recall_at_10"
            ),
        )
        .orderBy("qid")
    )


# ---------------------------------------------------------------------------
# Skew handling, driver-verified: salting must not change results.
# ---------------------------------------------------------------------------
@query(
    "join_skew_salted",
    oracle="""
    SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey ORDER BY s_nationkey
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join (operators.skew.salted_join) equals the plain join:
    the left (fact) side salts randomly, the right side replicates across
    the salt domain, so one hot key spreads over salt_buckets reducers.
    The oracle is the UNsalted join — salting must be invisible in the
    result, which is exactly what this row checks."""
    from sqlitedataframe_spark.operators.skew import salted_join

    l = T(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"), "l_quantity"
    )
    s = T(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_nationkey"
    )
    return (
        salted_join(l, s, on="suppkey", salt_buckets=8)
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .orderBy("s_nationkey")
    )


@query(
    "agg_skew_salted",
    oracle="""
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(MIN(l_extendedprice), 2) AS min_price,
           ROUND(MAX(l_extendedprice), 2) AS max_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (operators.skew.salted_agg) equals the
    plain GROUP BY: three group keys over millions of rows is the
    definitional hot-key shape, and the salt spreads each key over 32
    partial reducers before the tiny final combine. min_/max_ prefixes
    route the re-combine (min/max re-apply; sums/counts re-sum)."""
    from sqlitedataframe_spark.operators.skew import salted_agg

    l = T(spark, sf_dir, "lineitem")
    out = salted_agg(
        l,
        ["l_returnflag"],
        [
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("sum_qty_raw"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        ],
        salt_buckets=32,
    )
    return out.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("sum_qty_raw"), 2).alias("sum_qty"),
        F.round(F.col("min_price"), 2).alias("min_price"),
        F.round(F.col("max_price"), 2).alias("max_price"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# Chunk-level exact dedup: boilerplate paragraphs shared across documents.
# ---------------------------------------------------------------------------
@query(
    "dedup_chunk_exact",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS t
                  FROM documents),
    chunks AS (
      SELECT DISTINCT doc_id, array_to_string(t[i*16+1 : i*16+16], ' ') AS chunk
      FROM toks, UNNEST(generate_series(0, CAST(floor((len(t)-1)/16) AS BIGINT))) AS r(i)
    ),
    dup AS (SELECT chunk FROM chunks GROUP BY chunk HAVING COUNT(*) >= 2)
    SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_chunks
    FROM chunks c JOIN dup USING (chunk)
    GROUP BY c.doc_id ORDER BY doc_id
    """,
)
def dedup_chunk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document dedup: per document, how many of its 16-token chunks
    also appear in at least one other document — the boilerplate/template
    removal signal that document-level dedup misses.

    Plan shape: chunks split map-side (non-overlapping windows, per-doc
    dedup via array_distinct — no shuffle for within-doc repeats); ONE
    shuffle on the chunk key counts containing docs; only chunks seen in
    >=2 docs (rare by construction) flow into the join back. At 100 TB
    swap the chunk string for xxhash64(chunk) to shuffle 8-byte keys —
    string keys kept here so the DuckDB oracle is byte-identical.
    """
    from sqlitedataframe_spark.operators.util import hof_let

    # let-bound (r12, util.hof_let): inlined, the tokenize re-ran once per
    # chunk window inside the interpreted HOF lambda
    chunk_arr = hof_let(
        X.tokens(F.col("text")),
        lambda toks: F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(0), F.floor((F.size(toks) - 1) / 16).cast("int")
                ),
                lambda i: F.array_join(F.slice(toks, i * 16 + 1, 16), " "),
            )
        ),
    )
    d = T(spark, sf_dir, "documents")
    chunks = d.select(F.col("doc_id"), F.explode(chunk_arr).alias("chunk"))
    dup = (
        chunks.groupBy("chunk")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("chunk")
    )
    return (
        chunks.join(dup, "chunk")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_dup_chunks"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Corpus mixture report: per (lang, source) doc/token counts + token share.
# ---------------------------------------------------------------------------
@query(
    "corpus_mixture",
    oracle="""
    WITH per AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
            CAST(SUM(len(string_split(lower(trim(text)),' '))) AS BIGINT) AS n_tokens
          FROM documents GROUP BY lang, source),
    tot AS (SELECT SUM(n_tokens) AS t FROM per)
    SELECT lang, source, n_docs, n_tokens,
           ROUND(n_tokens / t + 1e-9, 6) AS token_share
    FROM per, tot ORDER BY lang, source
    """,
)
def corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture report: documents and whitespace tokens per
    (language, source) with each cell's share of total tokens — the
    sampling-weight input every corpus curation run starts from.

    The global total comes from a 1-row broadcast cross join of the
    aggregated (not raw) table — never an unpartitioned window."""
    d = T(spark, sf_dir, "documents")
    per = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(X.token_count_ws("text").cast("bigint")).alias("n_tokens"),
    )
    tot = per.agg(F.sum("n_tokens").alias("t"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "source",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens") / F.col("t") + 1e-9, 6).alias("token_share"),
        )
        .orderBy("lang", "source")
    )


# ---------------------------------------------------------------------------
# Arrow grouped-map surface, exactly oracled: per-group z-score.
# ---------------------------------------------------------------------------
@query(
    "pandas_zscore_groups",
    oracle="""
    SELECT doc_id, lang,
           ROUND((n_chars - AVG(n_chars) OVER (PARTITION BY lang))
                 / (STDDEV_SAMP(n_chars) OVER (PARTITION BY lang)) + 1e-9, 4)
             + 0.0 AS z
    FROM documents ORDER BY doc_id
    """,
)
def pandas_zscore_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language z-score of document length via ``applyInPandas`` — the
    Arrow grouped-map path, verified EXACTLY against a SQL window oracle
    (sample stddev, ddof=1 on both sides).

    This is deliberately a computation Spark's built-in window functions
    also express (the oracle IS that expression): the point of the row is
    gate-checking the Arrow batch transfer + grouped pandas execution
    surface itself, which the real custom operators (stateful sessionize,
    multimodal features) rely on. One shuffle on the group key; batches
    stream through pandas one language at a time, so executor memory holds
    one group's slim (id, n_chars) frame, not the corpus.
    """
    import pandas as pd

    d = T(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")

    def z(pdf: "pd.DataFrame") -> "pd.DataFrame":
        mu = pdf["n_chars"].mean()
        sd = pdf["n_chars"].std(ddof=1)
        out = pdf[["doc_id", "lang"]].copy()
        # + 0.0 de-signs any -0.0 from numpy's round (signed-zero convention)
        out["z"] = ((pdf["n_chars"] - mu) / sd + 1e-9).round(4) + 0.0
        return out

    return (
        d.groupBy("lang")
        .applyInPandas(z, "doc_id long, lang string, z double")
        .orderBy("doc_id")
    )
