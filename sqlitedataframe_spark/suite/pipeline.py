"""Training-data pipeline queries: dedup, similarity search, text analysis,
multimodal — the north-star surface, each over the documents/embeddings
fixtures with a DuckDB oracle where SQL can express the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlitedataframe_spark.operators import dedup as D
from sqlitedataframe_spark.operators import similarity as S
from sqlitedataframe_spark.operators import text as X
from sqlitedataframe_spark.operators.multimodal import attach_media, extract_features
from sqlitedataframe_spark.suite import query
from sqlitedataframe_spark.suite.relational import T


# --------------------------------------------------------------------------
# Exact dedup (hash-groupBy): representative id per exact-text group.
# --------------------------------------------------------------------------
@query(
    "dedup_exact",
    oracle="""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM (
      SELECT lang, text,
             doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep
      FROM documents
    )
    GROUP BY lang
    ORDER BY lang
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by text hash, min-id representative; per-lang stats."""
    d = T(spark, sf_dir, "documents")
    kept = D.dedup_exact(d, ["text"], "doc_id").select("doc_id").withColumn("keep", F.lit(1))
    return (
        d.join(kept, on="doc_id", how="left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(F.md5("text")).alias("n_unique"),
            F.sum(F.coalesce(F.col("keep"), F.lit(0))).alias("n_kept"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Fingerprint dedup: md5 over the sorted distinct token set — permutation-
# and repetition-invariant duplicate groups.
# --------------------------------------------------------------------------
@query(
    "dedup_fingerprint",
    oracle="""
    WITH fp AS (
      SELECT doc_id,
             md5(array_to_string(list_sort(list_distinct(string_split(lower(trim(text)), ' '))), ' ')) AS fingerprint
      FROM documents
    )
    SELECT fingerprint, CAST(COUNT(*) AS BIGINT) AS group_size,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_id
    FROM fp
    GROUP BY fingerprint
    HAVING COUNT(*) > 1
    ORDER BY fingerprint
    """,
)
def dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup groups by token-set fingerprint (operators.text.fingerprint)."""
    d = T(spark, sf_dir, "documents")
    return (
        d.select("doc_id", X.fingerprint("text").alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.min("doc_id").alias("keeper_id"),
        )
        .filter(F.col("group_size") > 1)
        .orderBy("fingerprint")
    )


# --------------------------------------------------------------------------
# Exact n-gram Jaccard on adjacent-id pairs (linear, SQL-expressible — the
# oracle-checked twin of the LSH candidate path below).
# --------------------------------------------------------------------------
@query(
    "dedup_ngram_jaccard",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_distinct(string_split(lower(trim(text)), ' ')) AS t
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.t, b.t))) + 1e-9, 6) AS jaccard
    FROM toks a JOIN toks b ON b.doc_id = a.doc_id + 1
    ORDER BY id_a
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard between consecutive doc ids."""
    d = T(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(X.tokens("text")).alias("t")
    )
    a = d.alias("a")
    b = d.alias("b")
    return (
        a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.round(D.jaccard_tokens(F.col("a.t"), F.col("b.t")) + 1e-9, 6).alias("jaccard"),
        )
        .orderBy("id_a")
    )


# --------------------------------------------------------------------------
# MinHash LSH and SimHash candidate generation — not SQL-expressible
# (seeded xxhash64 signatures); rows-only checks.
# --------------------------------------------------------------------------
@query("dedup_minhash_lsh", oracle=None)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidate pairs (est. Jaccard >= 0.3)."""
    d = T(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(d, min_jaccard=0.3).orderBy("id_a", "id_b")


@query("dedup_simhash", oracle=None)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash banded near-dup pairs (Hamming <= 3 on 64-bit signatures —
    the 4-band/16-bit pigeonhole guarantees recall only up to distance 3)."""
    d = T(spark, sf_dir, "documents")
    return D.simhash_pairs(d, max_hamming=3).orderBy("id_a", "id_b")


# --------------------------------------------------------------------------
# Embedding near-dup: cosine between consecutive vec ids (oracle), plus the
# LSH-bucketed ANN variant (rows-only).
# --------------------------------------------------------------------------
@query(
    "dedup_embedding_cosine",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
                 6) AS cos_sim
    FROM e a JOIN e b ON b.vec_id = a.vec_id + 1
    ORDER BY id_a
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine similarity between consecutive embeddings (near-dup signal)."""
    e = T(spark, sf_dir, "embeddings").select("vec_id", S.as_double("embedding").alias("v"))
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, F.col("b.vec_id") == F.col("a.vec_id") + 1)
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round(S.cosine(F.col("a.v"), F.col("b.v")), 6).alias("cos_sim"),
        )
        .orderBy("id_a")
    )


@query(
    "sim_bruteforce_topk",
    oracle="""
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
         e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT vec_id,
           ROUND(list_dot_product(v, qv)
                 / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))),
                 6) AS cos_sim
    FROM e CROSS JOIN q
    ORDER BY cos_sim DESC, vec_id
    LIMIT 10
    """,
)
def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 against the vec_id=0 query vector."""
    e = T(spark, sf_dir, "embeddings")
    qdf = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    return S.brute_force_topk(e, qdf, k=10)


@query("sim_ann_lsh", oracle=None)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via sign-LSH buckets + exact re-rank (scale path)."""
    e = T(spark, sf_dir, "embeddings")
    qdf = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    return S.lsh_topk(e, qdf, dim=64, k=10)


@query("sim_ivf_topk", oracle=None)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN: 8 deterministic centroids (the first 8 corpus
    vectors), query probes its 2 nearest cells, exact re-rank inside."""
    e = T(spark, sf_dir, "embeddings")
    cents = [
        [float(x) for x in r.embedding]
        for r in e.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ]
    qdf = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    return S.ivf_topk(e, qdf, cents, k=10, n_probe=2)


# --------------------------------------------------------------------------
# Text analysis: token counts, quality stats, language ID.
# --------------------------------------------------------------------------
@query(
    "text_stats",
    oracle="""
    SELECT doc_id,
           CAST(LENGTH(text) AS INT) AS n_char,
           CAST(len(string_split(lower(trim(text)), ' ')) AS INT) AS n_tokens_ws,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS n_tokens_bpe,
           CAST(len(list_distinct(string_split(lower(trim(text)), ' '))) AS INT) AS n_vocab
    FROM documents
    WHERE doc_id < 200
    ORDER BY doc_id
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char/token/vocab counts per document (whitespace + BPE-ish regex)."""
    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        X.char_count("text").cast("int").alias("n_char"),
        X.token_count_ws("text").cast("int").alias("n_tokens_ws"),
        X.token_count_bpe("text").cast("int").alias("n_tokens_bpe"),
        F.size(F.array_distinct(X.tokens("text"))).cast("int").alias("n_vocab"),
    ).orderBy("doc_id")


@query(
    "text_quality",
    oracle="""
    WITH t AS (
      SELECT doc_id, text,
             string_split(lower(trim(text)), ' ') AS toks,
             CAST(LENGTH(text) AS DOUBLE) AS n_char
      FROM documents
    ),
    feats AS (
      SELECT doc_id,
             LEAST(n_char / 200.0, 1.0) AS len_score,
             CAST(len(list_filter(toks, x -> list_contains(
                 ['the','a','an','and','or','of','to','in','is','it'], x))) AS DOUBLE)
               / len(toks) AS sw_ratio,
             CAST(LENGTH(regexp_replace(text, '[^.,;:!?''"()\\[\\]{}-]', '', 'g')) AS DOUBLE)
               / n_char AS punct_ratio
      FROM t
    )
    SELECT doc_id,
           ROUND((len_score + LEAST(sw_ratio * 4, 1.0)
                  + GREATEST(0.0, 1.0 - punct_ratio * 5)) / 3, 6) AS quality
    FROM feats
    ORDER BY doc_id
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality score (length/stopword/punctuation composite) per document."""
    d = T(spark, sf_dir, "documents")
    return d.select("doc_id", X.quality_score("text").alias("quality")).orderBy("doc_id")


@query(
    "text_langid",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, text, string_split(lower(trim(text)), ' ') AS toks
      FROM documents
    ),
    feats AS (
      SELECT doc_id, text,
             CAST(len(list_filter(toks, x -> list_contains(
                 ['the','a','an','and','or','of','to','in','is','it'], x))) AS DOUBLE)
               / len(toks) AS sw_ratio
      FROM t
    )
    SELECT doc_id,
           CASE WHEN LENGTH(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) > 0 THEN 'zh'
                WHEN sw_ratio >= 0.08 THEN 'en'
                WHEN LENGTH(regexp_replace(text, '[^\x{e0}-\x{ff}]', '', 'g')) > 0 THEN 'fr'
                ELSE 'unknown' END AS lang_pred
    FROM feats
    ORDER BY doc_id
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID (stopword/charset rules) per document."""
    d = T(spark, sf_dir, "documents")
    return d.select("doc_id", X.lang_id("text").alias("lang_pred")).orderBy("doc_id")


@query(
    "text_rolling_hash",
    oracle="""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(regexp_extract_all(text, '.'),
                               c -> CAST(ascii(c) AS BIGINT))),
             (a, b) -> (a * 31 + b) % 144115188075855859
           ) AS rhash
    FROM documents
    WHERE doc_id < 500
    ORDER BY doc_id
    """,
)
def text_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive polynomial rolling hash per document (Rabin-Karp
    document fingerprint) — sequential fold, engine-portable."""
    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    return d.select("doc_id", X.rolling_hash("text").alias("rhash")).orderBy("doc_id")


# --------------------------------------------------------------------------
# Multimodal plumbing: binary payload + metadata, JVM-side; the mapInPandas
# feature extraction is exercised separately (fake decode isn't SQL).
# --------------------------------------------------------------------------
@query(
    "multimodal_bytes",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS sha256
    FROM documents
    WHERE doc_id < 100
    ORDER BY media_id
    """,
)
def multimodal_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload metadata (byte length + sha256) computed JVM-side."""
    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return attach_media(d, "doc_id", "text").select("media_id", "n_bytes", "sha256").orderBy(
        "media_id"
    )


@query("multimodal_features", oracle=None)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (stubbed decode,
    real Arrow plumbing + bytes-bounded batching)."""
    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return extract_features(attach_media(d, "doc_id", "text")).orderBy("media_id")


@query(
    "pipeline_curation",
    oracle="""
    WITH kept AS (
      SELECT lang, source, doc_id, n_chars,
             len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS n_tokens,
             md5(text) AS h
      FROM documents
      WHERE lang IN ('en', 'fr', 'es', 'de') AND n_chars BETWEEN 50 AND 5000),
    deduped AS (
      SELECT * FROM kept
      QUALIFY ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) = 1)
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT)      AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           ROUND(AVG(n_chars) + 1e-9, 2) AS avg_chars
    FROM deduped
    GROUP BY lang, source
    ORDER BY lang, source
    """,
)
def pipeline_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data curation in ONE Spark plan: language
    allowlist + length gate (both pushed to the parquet scan) -> exact
    dedup on an md5 text fingerprint (shuffle carries the 32-char hash,
    never the document body) -> per-(lang, source) corpus stats. The shape
    a 100 TB curation job runs nightly."""
    d = T(spark, sf_dir, "documents").filter(
        F.col("lang").isin("en", "fr", "es", "de")
        & F.col("n_chars").between(50, 5000)
    )
    kept = d.select(
        "lang",
        "source",
        "doc_id",
        "n_chars",
        X.token_count_ws("text").alias("n_tokens"),
        F.md5("text").alias("h"),
    )
    deduped = D.dedup_exact(kept, ["h"], "doc_id")
    return (
        deduped.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_chars") + 1e-9, 2).alias("avg_chars"),
        )
        .orderBy("lang", "source")
    )
