"""Training-data pipeline queries, part 2: deterministic sampling /
train-test splits, TF-IDF, duplicate-cluster connected components, and the
bucketed interval (range) join — each with a DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlitedataframe_spark.operators import sampling as SM
from sqlitedataframe_spark.operators import text as X
from sqlitedataframe_spark.operators.graph import connected_components
from sqlitedataframe_spark.operators.relational import interval_join
from sqlitedataframe_spark.suite import query
from sqlitedataframe_spark.suite.relational import T

# ---------------------------------------------------------------------------
# Deterministic hash sampling: the same rows are selected by both engines
# because the predicate is a pure function of md5(key) — see
# operators/sampling.py for why df.sample() can't provide this.
# ---------------------------------------------------------------------------


@query(
    "sample_hash_deterministic",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_orderstatus
    FROM orders
    WHERE {SM.sample_sql_predicate("o_orderkey", 0.1)}
    ORDER BY o_orderkey
    """,
)
def sample_hash_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% reproducible sample of orders keyed on o_orderkey (map-side
    filter, zero shuffles, stable under any repartitioning)."""
    o = T(spark, sf_dir, "orders")
    return (
        SM.sample_by_hash(o, "o_orderkey", 0.1)
        .select("o_orderkey", "o_custkey", "o_orderstatus")
        .orderBy("o_orderkey")
    )


@query(
    "sample_train_test_split",
    oracle="""
    WITH h AS (
      SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS hx
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN hx < 'cccd' THEN 'train'
                WHEN hx < 'e666' THEN 'valid'
                ELSE 'test' END AS split
    FROM h
    ORDER BY doc_id
    """,
)
def sample_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/valid/test assignment for every document — disjoint,
    exhaustive, and stable (adding documents never reassigns existing ones).
    The oracle's literal thresholds are hex_threshold(0.8)='cccd' and
    hex_threshold(0.9)='e666'."""
    d = T(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            SM.split_assign(
                "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1}
            ).alias("split"),
        )
        .orderBy("doc_id")
    )


@query(
    "sample_stratified",
    oracle=f"""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE (c_mktsegment = 'BUILDING'
           AND {SM.sample_sql_predicate("c_custkey", 0.05)})
       OR (c_mktsegment = 'MACHINERY'
           AND {SM.sample_sql_predicate("c_custkey", 0.5)})
    ORDER BY c_custkey
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum rates (downsample BUILDING to 5%, keep 50% of MACHINERY,
    drop the rest) as ONE map-side CASE filter — no groupBy, no per-stratum
    passes."""
    c = T(spark, sf_dir, "customer")
    return (
        SM.stratified_sample(
            c, "c_custkey", "c_mktsegment", {"BUILDING": 0.05, "MACHINERY": 0.5}
        )
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# TF-IDF: the inverted-index shape (explode -> tf -> df -> join -> window).
# ---------------------------------------------------------------------------
@query(
    "text_tfidf_topk",
    oracle=f"""
    WITH terms AS (
      SELECT doc_id, unnest(string_split_regex(lower(text),
                                               '{X.WORD_SPLIT_PATTERN}')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM terms WHERE length(term) >= {X.TFIDF_MIN_TERM_LEN}
      GROUP BY doc_id, term
    ),
    df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    ranked AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY tf.doc_id
               ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS INT) AS rank,
             ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df) + 1e-9, 6)
               AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, rank, tfidf
    FROM ranked WHERE rank <= 3
    ORDER BY doc_id, rank
    """,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (integer-keyed deterministic
    ranking; see operators.text.tfidf_topk for the 3-shuffle plan shape)."""
    d = T(spark, sf_dir, "documents")
    return X.tfidf_topk(d, "doc_id", "text", k=3).orderBy("doc_id", "rank")


# ---------------------------------------------------------------------------
# Connected components over near-dup candidate edges: pairs -> dup groups.
# The oracle walks the same edges with a recursive CTE (min reachable id).
# ---------------------------------------------------------------------------
_CC_EDGE_SQL = """
    toks AS (
      SELECT doc_id, list_distinct(string_split(lower(trim(text)), ' ')) AS t
      FROM documents
    ),
    edges AS (
      SELECT a.doc_id AS src, b.doc_id AS dst
      FROM toks a JOIN toks b ON b.doc_id = a.doc_id + 1
      WHERE CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
            / len(list_distinct(list_concat(a.t, b.t))) >= 0.5
    )
"""


@query(
    "dedup_connected_components",
    oracle=f"""
    WITH RECURSIVE {_CC_EDGE_SQL},
    sym AS (SELECT src, dst FROM edges
            UNION SELECT dst, src FROM edges),
    walk(node, comp) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT s.dst, w.comp FROM walk w JOIN sym s ON s.src = w.node
    )
    SELECT node AS doc_id, CAST(MIN(comp) AS BIGINT) AS component
    FROM walk GROUP BY node ORDER BY doc_id
    """,
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters: consecutive-id pairs with token Jaccard >= 0.5
    as edges, then min-label connected components (pointer-jumped, O(log
    diameter) rounds — operators/graph.py). Every document gets a
    component id = min doc_id of its dup cluster."""
    d = T(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.array_distinct(X.tokens("text")).alias("t"))
    a, b = toks.alias("a"), toks.alias("b")
    inter = F.size(F.array_intersect(F.col("a.t"), F.col("b.t")))
    union = F.size(F.array_union(F.col("a.t"), F.col("b.t")))
    edges = (
        a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .filter(inter.cast("double") / union >= 0.5)
        .select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
    )
    labels = connected_components(edges, nodes=d.select("doc_id"), node_col="doc_id")
    return labels.select(
        F.col("node").alias("doc_id"), F.col("comp").alias("component")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Interval (range) join: purchases matched to the same user's clicks in the
# preceding 30 minutes — bucketed equi-join, no nested-loop join anywhere.
# ---------------------------------------------------------------------------
@query(
    "range_join_events",
    oracle="""
    SELECT b.event_id AS purchase_id, a.event_id AS click_id,
           CAST(round(date_part('epoch', b.ts - a.ts)) AS BIGINT)
             AS seconds_before
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'click' AND b.event_type = 'purchase'
     AND a.ts > b.ts - INTERVAL 30 MINUTE AND a.ts <= b.ts
    ORDER BY purchase_id, click_id
    """,
)
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks within 30 min before each purchase by the same user.
    operators.relational.interval_join turns the range predicate into a
    (user, time-bucket) equi-join with 2x replication of the purchase side
    — the plan contains no BroadcastNestedLoopJoin (asserted in
    tests/test_plans.py)."""
    e = T(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts"), "user_id"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        "user_id",
    )
    j = interval_join(
        clicks, purchases, on="user_id", left_ts="click_ts",
        right_ts="purchase_ts", lookback_seconds=1800,
    )
    return j.select(
        "purchase_id",
        "click_id",
        # NTZ-safe epoch math: cast("timestamp") is a no-op on timestamp and
        # a UTC reinterpretation on timestamp_ntz; a direct ntz->double cast
        # is illegal on Spark 4.1 (this crashed the r02 driver bench).
        F.round(
            F.col("purchase_ts").cast("timestamp").cast("double")
            - F.col("click_ts").cast("timestamp").cast("double")
        ).cast("bigint").alias("seconds_before"),
    ).orderBy("purchase_id", "click_id")


# ---------------------------------------------------------------------------
# Per-label embedding centroids: exact-checked distributed vector
# aggregation (the oracle-verified twin of the k-means/IVF rows-only path).
# ---------------------------------------------------------------------------
@query(
    "embed_label_centroids",
    oracle="""
    SELECT label, pos, ROUND(AVG(v) + 1e-9, 6) AS centroid
    FROM (SELECT label, unnest(embedding::DOUBLE[]) AS v,
                 generate_subscripts(embedding, 1) AS pos
          FROM embeddings)
    GROUP BY label, pos
    ORDER BY label, pos
    """,
)
def embed_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroids in exploded form (see operators.similarity.
    label_centroids: slim posexplode shuffle, no array reassembly)."""
    from sqlitedataframe_spark.operators.similarity import label_centroids

    e = T(spark, sf_dir, "embeddings")
    return label_centroids(e).orderBy("label", "pos")


# ---------------------------------------------------------------------------
# MERGE (CDC upsert) on plain storage: one window over the union, no join.
# ---------------------------------------------------------------------------
@query(
    "merge_upsert_orders",
    oracle="""
    WITH b AS (
      SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 2) AS o_totalprice
      FROM orders
    ),
    upd AS (
      SELECT o_orderkey, 'P' AS o_orderstatus,
             ROUND(o_totalprice * 1.1 + 1e-9, 2) AS o_totalprice,
             (o_orderkey % 37 = 1) AS is_del
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey + 100000000, 'N', 1.0, FALSE
      FROM orders WHERE o_orderkey % 1000 = 1
    ),
    merged AS (
      SELECT COALESCE(u.o_orderkey, b.o_orderkey) AS o_orderkey,
             COALESCE(u.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
             COALESCE(u.o_totalprice, b.o_totalprice) AS o_totalprice,
             COALESCE(u.is_del, FALSE) AS is_del
      FROM b FULL JOIN upd u ON b.o_orderkey = u.o_orderkey
    )
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM merged WHERE NOT is_del
    ORDER BY o_orderkey
    """,
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics on parquet (operators.relational.merge_into):
    updates replace matched orders, inserts add new keys, delete-flagged
    updates remove their match — one hash exchange on the key, no join.
    The update set is derived deterministically from orders itself so the
    oracle can rebuild it in SQL."""
    from sqlitedataframe_spark.operators.relational import merge_into

    o = T(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("o_totalprice")
    )
    updates = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            F.lit("P").alias("o_orderstatus"),
            F.round(F.col("o_totalprice") * 1.1 + 1e-9, 2).alias("o_totalprice"),
            (F.col("o_orderkey") % 37 == 1).alias("is_del"),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 1000 == 1).select(
                (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
                F.lit("N").alias("o_orderstatus"),
                F.lit(1.0).alias("o_totalprice"),
                F.lit(False).alias("is_del"),
            )
        )
    )
    return merge_into(base, updates, ["o_orderkey"], delete_col="is_del").orderBy(
        "o_orderkey"
    )


# ---------------------------------------------------------------------------
# Data profiling: per-column quality stats in one aggregation pass.
# ---------------------------------------------------------------------------
_PROFILE_COLS = [
    ("o_orderkey", True),
    ("o_custkey", True),
    ("o_totalprice", True),
    ("o_orderstatus", False),
    ("o_orderpriority", False),
]


def _profile_oracle() -> str:
    parts = []
    for c, numeric in _PROFILE_COLS:
        if numeric:
            mm = (
                f"ROUND(CAST(MIN({c}) AS DOUBLE) + 1e-9, 2) AS min_d,\n"
                f"       ROUND(CAST(MAX({c}) AS DOUBLE) + 1e-9, 2) AS max_d,\n"
                "       CAST(NULL AS VARCHAR) AS min_s, CAST(NULL AS VARCHAR) AS max_s"
            )
        else:
            mm = (
                "CAST(NULL AS DOUBLE) AS min_d, CAST(NULL AS DOUBLE) AS max_d,\n"
                f"       CAST(MIN({c}) AS VARCHAR) AS min_s, CAST(MAX({c}) AS VARCHAR) AS max_s"
            )
        parts.append(
            f"""SELECT '{c}' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       {mm}
FROM orders"""
        )
    return "\nUNION ALL\n".join(parts) + '\nORDER BY "column"'


@query("profile_orders", oracle=_profile_oracle())
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of orders (operators.profiling.profile): all
    stats from ONE aggregation pass; exact distinct counts here for the
    oracle, approx_count_distinct at 100 TB."""
    from sqlitedataframe_spark.operators.profiling import profile

    o = T(spark, sf_dir, "orders")
    return profile(o, [c for c, _ in _PROFILE_COLS]).orderBy("column")


# ---------------------------------------------------------------------------
# Context-window preparation: chunking + sequence packing.
# ---------------------------------------------------------------------------
@query(
    "text_chunk_windows",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(lower(trim(text)), ' ') AS t
      FROM documents
    ),
    starts AS (
      SELECT doc_id, t,
             unnest(generate_series(
               0,
               CAST(CEIL(GREATEST(len(t) - 64, 0) / 48.0) AS INT) * 48,
               48)) AS start
      FROM toks
    )
    SELECT doc_id,
           CAST(start / 48 AS INT) AS chunk_id,
           CAST(len(list_slice(t, start + 1, start + 64)) AS INT) AS n_tokens,
           array_to_string(list_slice(t, start + 1, start + 64), ' ') AS chunk_text
    FROM starts
    ORDER BY doc_id, chunk_id
    """,
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-token chunks with 16-token overlap (stride 48) for every document
    — zero-shuffle map-side chunking (operators.text.chunk_text)."""
    d = T(spark, sf_dir, "documents")
    return X.chunk_text(d, chunk_tokens=64, overlap=16).orderBy("doc_id", "chunk_id")


@query(
    "text_pack_sequential",
    oracle="""
    WITH sized AS (
      SELECT doc_id, doc_id % 8 AS shard,
             CAST(len(string_split(lower(trim(text)), ' ')) AS INT) AS n_tokens
      FROM documents
    )
    SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tokens,
           CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                         ROWS UNBOUNDED PRECEDING) - n_tokens)
                      / 2048.0) AS BIGINT) AS bin
    FROM sized
    ORDER BY doc_id
    """,
)
def text_pack_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard sequence packing into 2048-token bins
    (operators.text.pack_sequential): one window per shard, parallel
    across shards."""
    from sqlitedataframe_spark.operators.text import pack_sequential

    d = T(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id",
        (F.col("doc_id") % 8).alias("shard"),
        X.token_count_ws("text").alias("n_tokens"),
    )
    return pack_sequential(sized, "n_tokens", "shard", "doc_id", 2048).orderBy("doc_id")


# ---------------------------------------------------------------------------
# End-to-end NEAR-duplicate removal: blocking -> exact Jaccard edges ->
# connected components -> min-id representative -> corpus stats. The fully
# deterministic twin of the MinHash-LSH path (same pipeline shape, exact
# candidate generation), so the whole chain is oracle-checkable — the
# oracle computes the transitive closure with a recursive CTE.
# ---------------------------------------------------------------------------
@query(
    "pipeline_near_dedup",
    oracle=f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, lang, source,
             CAST(floor(n_chars / 100) AS BIGINT) AS bkt,
             list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t,
             len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tokens
      FROM documents
      WHERE {SM.sample_sql_predicate("doc_id", 0.4)}),
    edges AS (
      SELECT a.doc_id AS src, b.doc_id AS dst
      FROM toks a JOIN toks b
        ON a.lang = b.lang AND a.bkt = b.bkt AND b.doc_id > a.doc_id
      WHERE CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
            / len(list_distinct(list_concat(a.t, b.t))) >= 0.8),
    sym AS (
      SELECT src, dst FROM edges
      UNION ALL SELECT dst AS src, src AS dst FROM edges),
    reach(a, b) AS (
      SELECT doc_id, doc_id FROM toks
      UNION
      SELECT r.a, s.dst FROM reach r JOIN sym s ON s.src = r.b),
    comp AS (SELECT a AS doc_id, MIN(b) AS comp FROM reach GROUP BY a)
    SELECT d.lang, d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN c.comp = d.doc_id THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(SUM(CASE WHEN c.comp = d.doc_id THEN 0 ELSE 1 END) AS BIGINT)
             AS n_removed,
           CAST(SUM(CASE WHEN c.comp = d.doc_id THEN d.n_tokens ELSE 0 END)
                AS BIGINT) AS tokens_kept
    FROM toks d JOIN comp c ON c.doc_id = d.doc_id
    GROUP BY d.lang, d.source
    ORDER BY d.lang, d.source
    """,
)
def pipeline_near_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-duplicate REMOVAL (not just pair detection): block on
    (lang, n_chars/100 band) -> exact token-Jaccard >= 0.8 within each block
    -> connected components (operators.graph, pointer-jumped) -> keep the
    min-doc_id representative per dup cluster -> per-(lang, source) corpus
    stats. Runs on a deterministic 40% hash-sample of the corpus — the
    "develop on a reproducible sample, promote to full scale" workflow;
    the oracle applies the identical md5 predicate so both engines see the
    exact same rows.

    Scale design: blocking bounds the candidate space to sum(block size^2)
    — the all-pairs join never crosses blocks, shuffles on the slim
    (lang, bkt) key, and skewed blocks fall out to AQE skew-join. A
    lossless size-ratio prefilter (J >= 0.8 implies token counts within
    25%) prunes pairs before any intersect is computed. At 100 TB swap the
    exact edge generator for ``dedup.minhash_lsh_pairs`` (identical
    downstream shape); this deterministic variant exists so the WHOLE chain
    — candidates, clustering, representative choice — hash-checks against
    the oracle's recursive-CTE transitive closure."""
    from sqlitedataframe_spark.operators import dedup as D

    from sqlitedataframe_spark.operators.util import register_cache

    # r12: lazily persisted — `d` is referenced four times (both block-join
    # sides, the CC node set, the final stats join); unpersisted, the
    # tokenize + array_distinct ran once per reference
    d = register_cache(
        SM.sample_by_hash(T(spark, sf_dir, "documents"), "doc_id", 0.4)
        .select(
            "doc_id",
            "lang",
            "source",
            F.floor(F.col("n_chars") / 100).cast("bigint").alias("bkt"),
            F.array_distinct(X.tokens("text")).alias("t"),
            X.token_count_ws("text").alias("n_tokens"),
        )
        .withColumn("nt", F.size("t"))
        .persist()
    )
    a, b = d.alias("a"), d.alias("b")
    na, nb = F.col("a.nt"), F.col("b.nt")
    inter = F.size(F.array_intersect(F.col("a.t"), F.col("b.t")))
    # Lossless prefilter: J >= 0.8 implies min(|A|,|B|)/max(|A|,|B|) >= 0.8
    # — integer compare prunes most candidate pairs BEFORE the O(|A|+|B|)
    # intersect runs. Union size is |A|+|B|-i (inputs are distinct sets),
    # so no array_union materialization either.
    edges = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.bkt") == F.col("b.bkt"))
            & (F.col("b.doc_id") > F.col("a.doc_id")),
        )
        .filter(F.least(na, nb) * 5 >= F.greatest(na, nb) * 4)
        .filter(inter.cast("double") / (na + nb - inter) >= 0.8)
        .select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
    )
    labels = connected_components(
        edges, nodes=d.select("doc_id"), node_col="doc_id"
    )
    joined = d.join(labels, d.doc_id == labels.node)
    kept = F.col("comp") == F.col("doc_id")
    return (
        joined.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(kept.cast("bigint")).alias("n_kept"),
            F.sum((~kept).cast("bigint")).alias("n_removed"),
            F.sum(F.when(kept, F.col("n_tokens")).otherwise(F.lit(0))).alias(
                "tokens_kept"
            ),
        )
        .orderBy("lang", "source")
    )


# ---------------------------------------------------------------------------
# int8 embedding quantization: the standard 4x storage cut for embedding
# corpora, exact-checked element-by-element against the oracle.
# ---------------------------------------------------------------------------
@query(
    "embed_quantize_int8",
    oracle="""
    WITH s AS (
      SELECT vec_id, label,
             embedding::DOUBLE[] AS v,
             list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) / 127.0
               AS sc
      FROM embeddings
      WHERE vec_id % 5 = 0)
    SELECT vec_id, label,
           CAST(generate_subscripts(v, 1) AS INTEGER) AS pos,
           unnest(list_transform(v, x ->
             CAST(CASE WHEN sc = 0 THEN 0 ELSE round(x / sc) END AS INTEGER)))
             AS q,
           ROUND(sc + 1e-9, 6) AS scale
    FROM s
    ORDER BY vec_id, pos
    """,
)
def embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector symmetric int8 quantization (operators.similarity.
    quantize_int8), exploded to (vec_id, pos, q, scale) so every quantized
    element hash-checks against the oracle. The modulo filter keeps the
    exploded check set bounded; the operator itself is a pure map."""
    from sqlitedataframe_spark.operators.similarity import quantize_int8

    e = T(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 5 == 0)
    qz = quantize_int8(e)
    return (
        qz.select(
            "vec_id",
            "label",
            F.posexplode("q").alias("pos0", "q"),
            F.round(F.col("q_scale") + 1e-9, 6).alias("scale"),
        )
        .select(
            "vec_id",
            "label",
            (F.col("pos0") + 1).cast("int").alias("pos"),
            "q",
            "scale",
        )
        .orderBy("vec_id", "pos")
    )


# ---------------------------------------------------------------------------
# Per-class cap: no language may contribute more than N documents — the
# per-domain cap every large-corpus mixture recipe applies.
# ---------------------------------------------------------------------------
@query(
    "sample_cap_per_class",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang, source,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 4), doc_id)
               AS INT) AS pick_order
      FROM documents)
    SELECT doc_id, lang, source, pick_order
    FROM ranked WHERE pick_order <= 8
    ORDER BY doc_id
    """,
)
def sample_cap_per_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At most 8 documents per language, picked in deterministic md5-hash
    order (operators.sampling.cap_per_class) — reproducible across engines
    and stable under repartitioning."""
    d = T(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    capped = SM.cap_per_class(d, ["lang"], "doc_id", 8)
    # re-derive the pick order for the check output (the operator drops it)
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 4),
        F.col("doc_id"),
    )
    return (
        capped.withColumn("pick_order", F.row_number().over(w).cast("int"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# n-gram repetition filter signal (Gopher-style): fraction of a document's
# trigrams covered by its single most frequent trigram.
# ---------------------------------------------------------------------------
@query(
    "text_repetition",
    oracle="""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
      FROM documents),
    grams AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, greatest(len(t) - 1, 2)),
               i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS gram
      FROM toks),
    per_gram AS (
      SELECT doc_id, gram, COUNT(*) AS c FROM grams GROUP BY doc_id, gram)
    SELECT doc_id AS id,
           CAST(SUM(c) AS BIGINT) AS n_grams,
           CAST(MAX(c) AS BIGINT) AS top_count,
           ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c) + 1e-9, 6) AS rep_ratio
    FROM per_gram
    GROUP BY doc_id
    ORDER BY id
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram repetition ratio per document (operators.text.
    repetition_stats) — the repetition-based quality gate signal."""
    d = T(spark, sf_dir, "documents")
    return X.repetition_stats(d, "doc_id", "text", n=3).orderBy("id")


@query(
    "sample_cap_per_class_approx",
    oracle="""
    WITH cnt AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang),
    cut AS (
      SELECT lang,
             CASE WHEN c <= 40
                       OR CAST(round(65536.0 * 40 / c) AS INT) >= 65536
                  THEN 'g000'
                  ELSE printf('%04x', CAST(round(65536.0 * 40 / c) AS INT))
             END AS cut
      FROM cnt)
    SELECT d.doc_id, d.lang, d.source
    FROM documents d JOIN cut USING (lang)
    WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < cut
    ORDER BY d.doc_id
    """,
)
def sample_cap_per_class_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~40 documents per language via the two-phase threshold cap
    (operators.sampling.cap_per_class_approx) — the no-serialization-point
    variant for classes too large for a per-class window at 100 TB."""
    d = T(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return SM.cap_per_class_approx(d, ["lang"], "doc_id", 40).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Redaction / normalization: long-token spans replaced with a placeholder (the
# PII-scrub plan shape: pure map-side regexp over the scan). The md5 of the
# redacted text makes the oracle sensitive to every replacement byte.
# ---------------------------------------------------------------------------
@query(
    "text_redact_spans",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z]{6,}')) AS INT) AS n_spans,
           md5(regexp_replace(text, '[a-z]{6,}', '<num>', 'g')) AS redacted_md5
    FROM documents
    WHERE len(regexp_extract_all(text, '[a-z]{6,}')) > 0
    ORDER BY doc_id
    """,
)
def text_redact_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replace every 6+-letter token span with ``<num>`` (the PII-redaction plan
    shape — pure map-side regexp, zero shuffles before the final sort) and
    fingerprint the redacted text so the oracle checks every byte of the
    replacement, not just the counts."""
    d = T(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.size(F.regexp_extract_all("text", F.lit("[a-z]{6,}"), F.lit(0))).alias(
                "n_spans"
            ),
            F.md5(F.regexp_replace("text", "[a-z]{6,}", "<num>")).alias(
                "redacted_md5"
            ),
        )
        .filter(F.col("n_spans") > 0)
        .orderBy("doc_id")
    )
