"""Round-3 pipeline queries II: iterative graph rank, record linkage,
weighted sampling, Z-order layout keys, mergeable sketches, and the
video-frame-sampling mapInPandas surface.

Like every suite module, each query pairs an idiomatic-Spark plan with a
DuckDB oracle (or is rows-only where no exact oracle exists by nature).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlitedataframe_spark.operators.layout import zorder_key, zorder_key_sql
from sqlitedataframe_spark.suite import query
from sqlitedataframe_spark.suite.relational import T


# ---------------------------------------------------------------------------
# PageRank, fixed 3 iterations — the iterative-algorithm capability row.
# ---------------------------------------------------------------------------
def _pagerank_oracle(iterations: int = 3) -> str:
    """Unrolled PageRank: one CTE pair (contrib, ranks) per iteration.

    Recursive CTEs cannot aggregate in the recursive term, so a
    fixed-iteration unroll is the only exact SQL twin of the loop."""
    parts = [
        """
    WITH e0 AS (
      SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    edges AS (SELECT src, dst FROM e0
              UNION ALL SELECT dst AS src, src AS dst FROM e0),
    deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM edges
              UNION SELECT DISTINCT dst FROM edges),
    r0 AS (SELECT node, 1.0 AS pr FROM nodes)"""
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f""",
    c{i} AS (
      SELECT e.dst AS node, ROUND(0.15 + 0.85 * SUM(r.pr / deg.d), 6) AS pr
      FROM edges e JOIN r{i - 1} r ON e.src = r.node
      JOIN deg ON deg.src = e.src
      GROUP BY e.dst
    ),
    r{i} AS (
      SELECT n.node, COALESCE(c{i}.pr, 0.15) AS pr
      FROM nodes n LEFT JOIN c{i} ON n.node = c{i}.node
    )"""
        )
    parts.append(
        f"""
    SELECT node, pr FROM r{iterations} ORDER BY node"""
    )
    return "".join(parts)


@query("graph_pagerank", oracle=_pagerank_oracle(3))
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 3 iterations) on the undirected bipartite
    customer-supplier graph induced by order lines.

    The Spark side is operators.graph.pagerank — the canonical iterative
    DataFrame loop (degree-joined edge list built once; per iteration one
    join + one aggregation, localCheckpoint lineage truncation). Ranks are
    rounded to 6 dp *every* iteration on both engines, which makes the
    parallel-summed Spark result bit-identical to the serial DuckDB unroll
    (see pagerank docstring: rounding is the determinism contract).

    Perf shape: the loop runs on compact LONG node ids (customer 2k,
    supplier 2k+1) so every per-iteration shuffle carries 8-byte keys; the
    'c<id>'/'s<id>' display labels the oracle uses are attached once,
    after the last iteration. The graph is undirected, so
    ``all_nodes_receive=True`` drops the isolated-node re-attach join
    (one fewer shuffle per iteration).
    """
    from sqlitedataframe_spark.operators.graph import pagerank

    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e0 = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    # symmetric expansion map-side (explode), NOT union-of-two-branches:
    # a union would run the join+distinct subplan twice
    edges = e0.select(
        F.explode(
            F.array(
                F.struct(F.col("src"), F.col("dst")),
                F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    ranks = pagerank(
        edges,
        iterations=3,
        damping=0.85,
        round_dp=6,
        all_nodes_receive=True,
        # 16k nodes: ranks/degree frames broadcast, so each iteration is a
        # map-side join over the persisted edges + one 16k-row agg exchange
        broadcast_ranks=True,
    )
    label = F.when(
        F.col("node") % 2 == 0,
        F.concat(F.lit("c"), (F.col("node") / 2).cast("bigint").cast("string")),
    ).otherwise(
        F.concat(F.lit("s"), ((F.col("node") - 1) / 2).cast("bigint").cast("string"))
    )
    return ranks.select(label.alias("node"), "pr").orderBy("node")


# ---------------------------------------------------------------------------
# Record linkage: blocked levenshtein join (entity resolution shape).
# ---------------------------------------------------------------------------
@query(
    "link_blocked_levenshtein",
    oracle="""
    WITH p0 AS (
      SELECT p_partkey AS id, p_name, p_brand,
             string_split(p_name, ' ')[1] AS w1
      FROM part
    ),
    p AS (
      SELECT *, CAST('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8) AS BIGINT)
                % CAST(CEIL(COUNT(*) OVER (PARTITION BY p_brand, w1)
                            / 1000.0) AS BIGINT) AS _salt
      FROM p0
    )
    SELECT a.id AS id_a, b.id AS id_b,
           levenshtein(a.p_name, b.p_name) AS lev
    FROM p a JOIN p b ON a.p_brand = b.p_brand AND a.w1 = b.w1
                     AND a._salt = b._salt AND a.id < b.id
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    ORDER BY id_a, id_b
    """,
)
def link_blocked_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical part names via blocking + in-block edit distance
    (operators.linkage.blocked_levenshtein_pairs).

    Blocking key = (brand, first name token): the quadratic levenshtein
    work is confined to co-partitioned blocks after one hash exchange per
    side — the at-scale entity-resolution join shape (never all-pairs).
    The automatic in-block salt cap (max_block=1000, VERDICT r6 #1) is
    replayed verbatim in the oracle's `_salt` column — a no-op at the
    gate SFs (max block 17 @sf0.01 / 128 @sf0.1) and an exact-parity
    sub-split wherever a block exceeds 1000 rows.
    """
    from sqlitedataframe_spark.operators.linkage import blocked_levenshtein_pairs

    p = T(spark, sf_dir, "part").select("p_partkey", "p_name", "p_brand")
    return blocked_levenshtein_pairs(
        p,
        id_col="p_partkey",
        text_col="p_name",
        block_cols=["p_brand", F.split(F.col("p_name"), " ").getItem(0)],
        max_distance=3,
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (A-ES), deterministic.
# ---------------------------------------------------------------------------
@query(
    "sample_weighted",
    oracle="""
    WITH s AS (
      SELECT doc_id, n_chars,
             ROUND(LN((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                            AS BIGINT) + 1) / 4294967297.0)
                   / n_chars, 10) AS _wkey
      FROM documents WHERE n_chars > 0
      ORDER BY _wkey DESC, doc_id LIMIT 100
    )
    SELECT doc_id, n_chars, _wkey FROM s ORDER BY doc_id
    """,
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted deterministic document sample, k=100 (operators.
    sampling.weighted_sample_topk): Efraimidis-Spirakis keys from md5-
    derived uniforms, ranked map-side and TakeOrdered-merged — one pass,
    no global sort, reproducible across engines and reruns.
    """
    from sqlitedataframe_spark.operators.sampling import weighted_sample_topk

    d = T(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return weighted_sample_topk(d, key="doc_id", weight="n_chars", k=100).orderBy(
        "doc_id"
    )


# ---------------------------------------------------------------------------
# Z-order (Morton) layout key — multi-column data clustering for pruning.
# ---------------------------------------------------------------------------
@query(
    "zorder_layout",
    oracle=f"""
    WITH k AS (
      SELECT o_orderkey,
             o_custkey % 65536 AS x,
             date_diff('day', DATE '1970-01-01', o_orderdate) % 65536 AS y
      FROM orders
    )
    SELECT o_orderkey, {zorder_key_sql("x", "y", 16)} AS zkey
    FROM k ORDER BY zkey, o_orderkey LIMIT 300
    """,
)
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 300 orders in Z-order of (customer, order-day) — the Morton
    key that operators.layout.zorder_layout range-partitions and sorts by
    at write time so parquet zone maps prune on BOTH columns. Pure integer
    shift/mask arithmetic, bit-identical across engines; the query itself
    is a map-side key + TakeOrdered (no global sort).
    """
    o = T(spark, sf_dir, "orders")
    zk = zorder_key(
        F.col("o_custkey") % 65536,
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")) % 65536,
        16,
    )
    return (
        o.select("o_orderkey", zk.alias("zkey"))
        .orderBy("zkey", "o_orderkey")
        .limit(300)
    )


# ---------------------------------------------------------------------------
# Mergeable distinct-count sketches (Apache DataSketches HLL).
# ---------------------------------------------------------------------------
_PCA_ITER = """
    w{n} AS (
      SELECT c.i AS j, SUM(c.c * v.val) AS wv
      FROM cells c JOIN v{p} v ON v.j = c.j GROUP BY c.i),
    n{n} AS (SELECT sqrt(SUM(wv * wv)) AS nn FROM w{n}),
    v{n} AS (SELECT w.j, ROUND(w.wv / n.nn, 6) AS val FROM w{n} w, n{n} n)"""

@query(
    "embed_pca_power",
    oracle=f"""
    WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
    cells AS (
      SELECT ii.i AS i, jj.j AS j,
             ROUND(SUM(e.v[ii.i + 1] * e.v[jj.j + 1]), 3) AS c
      FROM e,
           UNNEST(generate_series(0, 63)) ii(i),
           UNNEST(generate_series(0, 63)) jj(j)
      GROUP BY ii.i, jj.j),
    v0 AS (SELECT t.j, CAST(0.125 AS DOUBLE) AS val
           FROM UNNEST(generate_series(0, 63)) t(j)),
    {_PCA_ITER.format(n=1, p=0)},
    {_PCA_ITER.format(n=2, p=1)},
    {_PCA_ITER.format(n=3, p=2)}
    SELECT CAST(j + 1 AS INT) AS pos, val AS loading FROM v3 ORDER BY pos
    """,
)
def embed_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding corpus by distributed
    Gram-matrix build + driver-side power iteration (operators.
    similarity.gram_matrix / top_component) — the whitening/PCA step of
    embedding-curation recipes.

    Scale story: the only data-sized pass is ONE aggregation whose
    map-side partials collapse to dim^2 cells per partition before the
    exchange (input-size-independent shuffle, the sketch pattern); the
    64x64 model iterates on the driver like train_centroids. Exactly
    oracle-checked: rounded Gram cells + rounded iterates make the
    trajectory a pure function of the data; the DuckDB twin replays the
    3 iterations as CTEs.
    """
    from sqlitedataframe_spark.operators.similarity import top_component

    e = T(spark, sf_dir, "embeddings")
    return top_component(e, "embedding", dim=64, iters=3).orderBy("pos")


#: histogram-quantile sketch constants, inlined identically in both engines.
_HQ_LO, _HQ_HI, _HQ_NB = 900.0, 105000.0, 64
_HQ_W = (_HQ_HI - _HQ_LO) / _HQ_NB

@query(
    "agg_hist_quantiles",
    oracle=f"""
    WITH b AS (
      SELECT l_returnflag AS g,
             LEAST({_HQ_NB - 1}, GREATEST(0,
               CAST(floor((CAST(l_extendedprice AS DOUBLE) - {_HQ_LO!r}) / {_HQ_W!r})
                    AS INT))) AS bin
      FROM lineitem),
    counts AS (SELECT g, bin, COUNT(*) AS c FROM b GROUP BY g, bin),
    u AS (
      SELECT g, bin, c FROM counts
      UNION ALL
      SELECT 'ALL' AS g, bin, SUM(c) AS c FROM counts GROUP BY bin),
    cum AS (
      SELECT g, bin, c,
             SUM(c) OVER (PARTITION BY g ORDER BY bin) AS cum,
             SUM(c) OVER (PARTITION BY g) AS tot
      FROM u),
    hit AS (
      SELECT g, qq, bin, c, cum, tot,
             ROW_NUMBER() OVER (PARTITION BY g, qq ORDER BY bin) AS rn
      FROM cum
      CROSS JOIN (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.95 AS DOUBLE)),
                         (CAST(0.99 AS DOUBLE))) t(qq)
      WHERE cum >= qq * tot),
    est AS (
      SELECT g, qq,
             ROUND({_HQ_LO!r} + (bin + (qq * tot - (cum - c)) / c) * {_HQ_W!r}, 4)
               AS v
      FROM hit WHERE rn = 1)
    SELECT g AS l_returnflag,
           MAX(CASE WHEN qq = 0.5 THEN v END) AS p50,
           MAX(CASE WHEN qq = 0.95 THEN v END) AS p95,
           MAX(CASE WHEN qq = 0.99 THEN v END) AS p99
    FROM est GROUP BY g ORDER BY l_returnflag
    """,
)
def agg_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch: fixed-boundary histogram of
    l_extendedprice per return flag (operators.sketch.hist_build), p50/
    p95/p99 read off the cumulative counts with in-bin interpolation,
    plus a bin-wise-MERGED grand total row.

    The deterministic sibling of agg_approx's engine-internal KLL: bin
    boundaries are constants, so the sketch is a pure function of the
    data and EXACTLY oracle-checked (the count-min recipe for
    quantiles); approximation error is bounded by one bin width. Scale:
    at most nbins rows per group cross the exchange per map partition,
    and shard histograms roll up by addition without re-reading data —
    the same operational story as the HLL and count-min rollups. Exact
    twin: agg_percentile_exact.
    """
    from sqlitedataframe_spark.operators.sketch import (
        hist_build,
        hist_merge,
        hist_quantile,
    )

    l = T(spark, sf_dir, "lineitem")
    sk = hist_build(l, "l_extendedprice", ["l_returnflag"], _HQ_LO, _HQ_HI, _HQ_NB)
    allk = hist_merge(sk.withColumn("l_returnflag", F.lit("ALL")))
    u = sk.unionByName(allk)
    args = (["l_returnflag"],)
    kw = {"lo": _HQ_LO, "hi": _HQ_HI, "nbins": _HQ_NB}
    p50 = hist_quantile(u, *args, q=0.5, out="p50", **kw)
    p95 = hist_quantile(u, *args, q=0.95, out="p95", **kw)
    p99 = hist_quantile(u, *args, q=0.99, out="p99", **kw)
    return (
        p50.join(p95, "l_returnflag").join(p99, "l_returnflag").orderBy("l_returnflag")
    )


#: alpha_m for m=256 buckets, inlined identically in Spark and the oracle.
_HLL_ALPHA_256 = 0.7213 / (1.0 + 1.079 / 256)

@query(
    "agg_hll_sketch",
    oracle=f"""
    WITH h AS (
      SELECT l_returnflag AS g,
             CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 2) AS INT) AS bucket,
             CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 3, 8) AS BIGINT) AS v
      FROM lineitem),
    regs AS (
      SELECT g, bucket,
             MAX(CASE WHEN v = 0 THEN 33 ELSE 33 - length(bin(v)) END) AS r
      FROM h GROUP BY g, bucket),
    u AS (
      SELECT g, bucket, r FROM regs
      UNION ALL
      SELECT 'ALL' AS g, bucket, MAX(r) AS r FROM regs GROUP BY bucket),
    agg AS (
      SELECT g,
             SUM(power(2.0, -r)) + (256 - COUNT(*)) AS s,
             256 - COUNT(*) AS v
      FROM u GROUP BY g)
    SELECT g AS l_returnflag,
           ROUND(CASE WHEN (CAST({_HLL_ALPHA_256!r} AS DOUBLE) * 65536 / s) <= 640.0 AND v > 0
                      THEN 256.0 * ln(256.0 / v)
                      ELSE CAST({_HLL_ALPHA_256!r} AS DOUBLE) * 65536 / s END, 4) AS approx_parts
    FROM agg ORDER BY l_returnflag
    """,
)
def agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group HyperLogLog distinct-part estimates + a register-MERGED
    grand total ('ALL' row), built from scratch on a deterministic md5
    hash (operators.sketch.hll_registers/hll_merge/hll_estimate).

    The 100 TB pattern this demonstrates: per-group register tables are
    tiny (<= 256 rows each), re-aggregate to any rollup level by
    bucket-wise MAX without touching raw data again, and the shuffle per
    map partition is bounded at m rows per group regardless of input
    size. Unlike engine-internal HLL (hll_sketch_agg), the md5-keyed
    registers are a pure function of the data, so the whole structure —
    registers, merge, and estimate — is EXACTLY oracle-checked (the
    count-min recipe); the exact twin is agg_count_distinct_exact.
    """
    from sqlitedataframe_spark.operators.sketch import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    l = T(spark, sf_dir, "lineitem")
    regs = hll_registers(l, "l_partkey", ["l_returnflag"], p=8)
    per = hll_estimate(regs, ["l_returnflag"], p=8, out="approx_parts")
    merged = hll_merge(regs.withColumn("l_returnflag", F.lit("ALL")), ["l_returnflag"])
    grand = hll_estimate(merged, ["l_returnflag"], p=8, out="approx_parts")
    return per.unionByName(grand).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# Video-frame sampling plumbing (multimodal mapInPandas, exactly oracled).
# ---------------------------------------------------------------------------
@query(
    "multimodal_frames",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id, hex(encode(text)) AS h,
             octet_length(encode(text)) AS n
      FROM documents
    ),
    f AS (
      SELECT media_id, h,
             n % 30 + 1 AS nf,
             GREATEST(1, n // (n % 30 + 1)) AS w
      FROM m
    )
    SELECT media_id, CAST(i AS INT) AS frame_idx,
           lower(substr(h, i * w * 2 + 1, w * 2)) AS frame_hex
    FROM f, UNNEST(generate_series(0, nf - 1, 5)) AS r(i)
    WHERE i <= 15
    ORDER BY media_id, frame_idx
    """,
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling stage (operators.multimodal.sample_frames) driven
    end-to-end: binary payloads -> mapInPandas one-to-many frame rows.

    The decode is the container's deterministic fake (equal byte slices;
    real codecs slot into the same stage), which makes this mapInPandas
    surface EXACTLY oracle-checkable: the oracle recomputes the identical
    slice arithmetic over the hex encoding. Frames are emitted as
    lowercase hex on both sides (DuckDB cannot substring BLOBs).
    Scale: the stage runs inside the scan (no shuffle); payload bytes
    cross into Python once, Arrow-batched.
    """
    from sqlitedataframe_spark.operators.multimodal import attach_media, sample_frames

    d = T(spark, sf_dir, "documents")
    media = attach_media(d, id_col="doc_id", text_col="text")
    frames = sample_frames(media, every_n=5, max_frames=4)
    return frames.select(
        "media_id",
        "frame_idx",
        F.lower(F.hex("frame_bytes")).alias("frame_hex"),
    ).orderBy("media_id", "frame_idx")


# ---------------------------------------------------------------------------
# Token-budget mixture allocation (training-mixture rebalancing).
# ---------------------------------------------------------------------------
@query(
    "mixture_token_budget",
    oracle="""
    WITH d AS (SELECT doc_id, lang, n_chars // 4 AS toks FROM documents),
    tot AS (SELECT lang, SUM(toks) AS class_toks FROM d GROUP BY lang),
    g AS (SELECT SUM(class_toks) AS all_toks, COUNT(*) AS n_classes FROM tot),
    r AS (
      SELECT lang,
             LEAST(1.0, (0.30 * all_toks / n_classes) / class_toks) AS rate
      FROM tot, g
    ),
    cuts AS (
      SELECT lang,
             CASE WHEN rate >= 1.0
                       OR CAST(ROUND(rate * 65536 + 1e-9, 0) AS INT) >= 65536
                  THEN 'g000'
                  ELSE lpad(lower(hex(CAST(ROUND(rate * 65536 + 1e-9, 0)
                                           AS INT))), 4, '0')
             END AS cut
      FROM r
    ),
    kept AS (
      SELECT d.doc_id, d.lang, d.toks
      FROM d JOIN cuts USING (lang)
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < cut
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(toks) AS BIGINT) AS tokens_kept
    FROM kept GROUP BY lang ORDER BY lang
    """,
)
def mixture_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalance the corpus to a target training mixture: every language
    gets an equal share of a 30%-of-corpus token budget; over-represented
    languages are deterministically down-sampled to their share,
    under-represented ones pass through (operators.sampling.
    allocate_token_budget — broadcast per-class thresholds, map-side
    md5 predicate, no per-class serialization point).
    """
    from sqlitedataframe_spark.operators.sampling import allocate_token_budget

    d = T(spark, sf_dir, "documents").select(
        "doc_id", "lang", (F.col("n_chars") / 4).cast("bigint").alias("toks")
    )
    kept = allocate_token_budget(
        d, class_col="lang", tokens_col="toks", budget_fraction=0.30, key="doc_id"
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").alias("tokens_kept"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup-style) over the embeddings table.
# ---------------------------------------------------------------------------
@query(
    "dedup_semantic",
    oracle="""
    WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    init AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv
      FROM e ORDER BY vec_id LIMIT 8),
    d0 AS (
      SELECT e.vec_id, e.v, i.cell,
             list_sum(list_transform(range(1, 65),
                      j -> (e.v[j] - i.cv[j]) * (e.v[j] - i.cv[j]))) AS d
      FROM e CROSS JOIN init i),
    a0 AS (
      SELECT vec_id, v, cell FROM d0
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) = 1),
    means AS (
      SELECT cell, j, ROUND(SUM(v[j]) / COUNT(*), 6) AS m
      FROM a0, UNNEST(generate_series(1, 64)) AS t(j)
      GROUP BY cell, j),
    cents AS (
      SELECT i.cell, COALESCE(n.cv, i.cv) AS cv
      FROM init i LEFT JOIN (
        SELECT cell, list(m ORDER BY j) AS cv FROM means GROUP BY cell
      ) n USING (cell)),
    d1 AS (
      SELECT e.vec_id, e.v, c.cell,
             list_sum(list_transform(range(1, 65),
                      j -> (e.v[j] - c.cv[j]) * (e.v[j] - c.cv[j]))) AS d
      FROM e CROSS JOIN cents c),
    a1 AS (
      SELECT vec_id, v, cell FROM d1
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) = 1),
    nv AS (
      SELECT vec_id, cell,
             CASE WHEN sqrt(list_dot_product(v, v)) > 0
                  THEN list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
                  ELSE v END AS u
      FROM a1),
    edges AS (
      SELECT a.vec_id AS src, b.vec_id AS dst
      FROM nv a JOIN nv b ON a.cell = b.cell AND b.vec_id > a.vec_id
      WHERE list_dot_product(a.u, b.u) >= 0.40),
    sym AS (
      SELECT src, dst FROM edges
      UNION ALL SELECT dst AS src, src AS dst FROM edges),
    reach(a, b) AS (
      SELECT vec_id, vec_id FROM e
      UNION
      SELECT r.a, s.dst FROM reach r JOIN sym s ON s.src = r.b),
    comp AS (SELECT a AS vec_id, MIN(b) AS comp FROM reach GROUP BY a)
    SELECT comp AS component, CAST(COUNT(*) AS BIGINT) AS group_size
    FROM comp GROUP BY comp HAVING COUNT(*) > 1
    ORDER BY group_size DESC, component
    """,
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped semantic pruning (operators.dedup.semantic_dedup):
    k-means cells -> intra-cell cosine pairs -> connected components ->
    min-id representative. Output: per-component sizes of the non-trivial
    duplicate groups.

    Exactly oracle-checked (was rows-only in r1-r3): deterministic init
    (the 8 min-vec_id vectors) + engine-side 6-dp rounding of the Lloyd
    means makes the cells, the intra-cell pair set and the components a
    pure function of the data; the DuckDB twin replays the iteration as
    CTEs and resolves components with a recursive transitive closure.
    The only cross-engine float exposure is exact ties in the argmin /
    the 0.40 dot threshold (~1e-13-wide windows — vanishing).
    """
    from sqlitedataframe_spark.operators.dedup import semantic_dedup

    e = T(spark, sf_dir, "embeddings")
    # threshold 0.40: the synthetic embeddings' pairwise cosine tops out
    # near 0.46, so the production-typical 0.9+ would be a vacuous demo;
    # k=8 / 1 Lloyd iteration keeps the k-means expression tree (and its
    # per-row cost) small — cell quality barely matters for a demo corpus
    # whose "clusters" are noise
    marked = semantic_dedup(
        e, id_col="vec_id", vec_col="embedding", k=8, threshold=0.40, kmeans_iters=1
    )
    return (
        marked.groupBy("component")
        .agg(F.count(F.lit(1)).alias("group_size"))
        .filter(F.col("group_size") > 1)
        .orderBy(F.col("group_size").desc(), "component")
    )


# ---------------------------------------------------------------------------
# Bigram LM quality scoring (perplexity-filter shape, corpus-trained).
# ---------------------------------------------------------------------------
@query(
    "text_bigram_lm",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      FROM documents
    ),
    doc_bi AS (
      SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS r(i)
      WHERE len(t) >= 2
    ),
    uni AS (SELECT unnest(t) AS w1 FROM toks),
    c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM doc_bi GROUP BY 1, 2),
    c1 AS (SELECT w1, COUNT(*) AS c1 FROM uni GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT w1) AS v FROM uni)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(LN((c12 + 1) / CAST(c1 + v AS DOUBLE))), 6) AS avg_logp
    FROM doc_bi JOIN c12 USING (w1, w2) JOIN c1 USING (w1), v
    GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean bigram log-likelihood per document under a corpus-trained
    Laplace bigram model (operators.text.bigram_lm_scores) — the
    perplexity-style quality filter. Bigrams built map-side; the model is
    two count aggregations; scoring is a hash join on the bigram key
    (model never broadcast by assumption — web-scale bigram tables are
    huge), then one per-doc aggregation.
    """
    from sqlitedataframe_spark.operators.text import bigram_lm_scores

    d = T(spark, sf_dir, "documents").select("doc_id", "text")
    return bigram_lm_scores(d).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Dedup keeping the BEST representative (not min-id): longest doc wins.
# ---------------------------------------------------------------------------
@query(
    "dedup_keep_best",
    oracle="""
    WITH fp AS (
      SELECT doc_id, n_chars,
             md5(array_to_string(list_sort(list_distinct(
                 string_split(lower(trim(text)), ' '))), ' ')) AS fingerprint
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, n_chars, fingerprint,
             ROW_NUMBER() OVER (PARTITION BY fingerprint
                                ORDER BY n_chars DESC, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY fingerprint) AS group_size
      FROM fp
    )
    SELECT doc_id, fingerprint, CAST(group_size AS BIGINT) AS group_size
    FROM ranked WHERE rn = 1
    ORDER BY doc_id
    """,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup: one survivor per fingerprint group, keeping
    the LONGEST duplicate (deterministic doc_id tiebreak) instead of the
    arbitrary min-id — what curation pipelines actually want when near-
    dups differ in truncation. One hash exchange on the fingerprint;
    row_number + count over the same window partitioning share it.
    """
    from pyspark.sql import Window

    from sqlitedataframe_spark.operators.text import fingerprint

    d = T(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", fingerprint("text").alias("fingerprint")
    )
    w = Window.partitionBy("fingerprint").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    wc = Window.partitionBy("fingerprint")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .withColumn("group_size", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == 1)
        .select("doc_id", "fingerprint", "group_size")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Multimodal resize/downsample stage (mapInPandas, exactly oracled).
# ---------------------------------------------------------------------------
@query(
    "multimodal_resize",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id, hex(encode(text)) AS h,
             octet_length(encode(text)) AS n
      FROM documents
    )
    SELECT media_id,
           CAST(CEIL(n / 4.0) AS BIGINT) AS out_bytes,
           lower(string_agg(substr(h, i * 2 + 1, 2), '' ORDER BY i)) AS thumb_hex
    FROM m, UNNEST(generate_series(0, n - 1, 4)) AS r(i)
    GROUP BY media_id, n
    ORDER BY media_id
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/downsample stage (operators.multimodal.resize_media) driven
    end-to-end: payloads stream through an Arrow-batched mapInPandas that
    emits stride-4 decimated thumbnails. The deterministic fake resampler
    makes the stage EXACTLY oracle-checkable — the oracle rebuilds the
    identical byte selection over the hex encoding (compared as lowercase
    hex; DuckDB cannot substring BLOBs). No shuffle: runs inside the scan.
    """
    from sqlitedataframe_spark.operators.multimodal import attach_media, resize_media

    d = T(spark, sf_dir, "documents")
    thumbs = resize_media(attach_media(d, id_col="doc_id", text_col="text"), stride=4)
    return thumbs.select(
        "media_id",
        "out_bytes",
        F.lower(F.hex("thumb")).alias("thumb_hex"),
    ).orderBy("media_id")


# ---------------------------------------------------------------------------
# Count-min sketch frequency estimation (exactly oracled sketch).
# ---------------------------------------------------------------------------
@query(
    "agg_countmin_sketch",
    oracle="""
    WITH cells AS (
      SELECT d,
             CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1 + 8 * d, 8)
                  AS BIGINT) % 1024 AS cell,
             COUNT(*) AS c
      FROM lineitem, UNNEST([0, 1, 2, 3]) AS t(d)
      GROUP BY 1, 2
    ),
    probes AS (SELECT DISTINCT l_partkey AS k FROM lineitem WHERE l_partkey < 10),
    est AS (
      SELECT p.k, MIN(c.c) AS cm_est
      FROM probes p, UNNEST([0, 1, 2, 3]) AS t(d)
      JOIN cells c
        ON c.d = t.d
       AND c.cell = CAST('0x' || substr(md5(CAST(p.k AS VARCHAR)), 1 + 8 * t.d, 8)
                         AS BIGINT) % 1024
      GROUP BY p.k
    ),
    tru AS (
      SELECT l_partkey AS k, COUNT(*) AS true_count
      FROM lineitem WHERE l_partkey < 10 GROUP BY 1
    )
    SELECT k AS l_partkey, CAST(cm_est AS BIGINT) AS cm_est,
           CAST(true_count AS BIGINT) AS true_count
    FROM est JOIN tru USING (k) ORDER BY l_partkey
    """,
)
def agg_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (4x1024, md5 hashing) over lineitem part keys,
    probed for ten keys against their exact counts (operators.sketch).

    Scale story in the plan: the sketch exchange carries at most
    depth*width rows per partition regardless of input size, the built
    sketch broadcasts for estimation, and shard sketches merge cell-wise
    without re-reading data. The md5 cell hash makes the whole structure
    deterministic — the oracle rebuilds the identical sketch in SQL, and
    the output shows the CM guarantee live (cm_est >= true_count).
    """
    from sqlitedataframe_spark.operators.sketch import countmin_build, countmin_estimate

    l = T(spark, sf_dir, "lineitem").select("l_partkey")
    sketch = countmin_build(l, "l_partkey", depth=4, width=1024)
    probes = l.filter(F.col("l_partkey") < 10)
    est = countmin_estimate(sketch, probes, "l_partkey", depth=4, width=1024)
    tru = probes.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("true_count"))
    return est.join(tru, "l_partkey").orderBy("l_partkey")


# ---------------------------------------------------------------------------
# Sketch mergeability, proven live: shard sketches == full-data sketch.
# ---------------------------------------------------------------------------
@query(
    "agg_countmin_merge",
    oracle="""
    WITH cells AS (
      SELECT d,
             CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1 + 8 * d, 8)
                  AS BIGINT) % 256 AS cell,
             COUNT(*) AS c
      FROM lineitem, UNNEST([0, 1, 2]) AS t(d)
      GROUP BY 1, 2
    )
    SELECT d, cell, CAST(c AS BIGINT) AS c
    FROM cells ORDER BY d, cell
    """,
)
def agg_countmin_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build count-min sketches on two DISJOINT halves of lineitem (even /
    odd order keys — two "shards"), merge them cell-wise
    (operators.sketch.countmin_merge), and return the merged sketch. The
    oracle builds the sketch over the FULL table in one pass: equality is
    the mergeability proof — rollups over shard sketches reproduce the
    global sketch exactly, without re-reading data.
    """
    from sqlitedataframe_spark.operators.sketch import countmin_build, countmin_merge

    l = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    even = countmin_build(
        l.filter(F.col("l_orderkey") % 2 == 0), "l_partkey", depth=3, width=256
    )
    odd = countmin_build(
        l.filter(F.col("l_orderkey") % 2 == 1), "l_partkey", depth=3, width=256
    )
    return countmin_merge(even, odd).orderBy("d", "cell")


# ---------------------------------------------------------------------------
# Bloom-filter decontamination (mergeable membership sketch, exactly oracled).
# ---------------------------------------------------------------------------
@query(
    "dedup_bloom_decontaminate",
    oracle="""
    WITH test AS (
      SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id % 5 = 0),
    bloom AS (
      SELECT DISTINCT CAST('0x' || substr(md5(fp), 1 + 8 * j, 8) AS BIGINT)
               % 512 AS bit
      FROM test, UNNEST([0, 1, 2, 3]) AS t(j)),
    train AS (
      SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 5 <> 0),
    probe AS (
      SELECT p.doc_id, SUM(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END) AS nb
      FROM (SELECT doc_id,
                   CAST('0x' || substr(md5(fp), 1 + 8 * j, 8) AS BIGINT)
                     % 512 AS bit
            FROM train, UNNEST([0, 1, 2, 3]) AS t(j)) p
      LEFT JOIN bloom b USING (bit)
      GROUP BY p.doc_id)
    SELECT f.doc_id,
           (t2.fp IS NOT NULL) AS is_true_match
    FROM (SELECT doc_id FROM probe WHERE nb = 4) f
    JOIN train tr USING (doc_id)
    LEFT JOIN test t2 ON t2.fp = tr.fp
    ORDER BY f.doc_id
    """,
)
def dedup_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination — the 100 TB front door to exact
    decontamination: build a Bloom filter over the held-out set's text
    fingerprints (every 5th doc plays the test set), BROADCAST the
    few-hundred-KB bit set, and flag training docs whose fingerprint hits
    all k bits. Candidates are a superset of true contamination (no false
    negatives); the query reports each flagged doc with its exact-match
    verdict, surfacing the false-positive behavior the m/k choice buys.

    operators.sketch.bloom_build/bloom_probe: deterministic md5-window
    bits (exactly oracle-checked), shard blooms OR-merge without
    re-reading data, and the train-side probe is one broadcast join —
    the corpus never shuffles."""
    from sqlitedataframe_spark.operators.sketch import bloom_build, bloom_probe

    d = T(spark, sf_dir, "documents")
    fp = F.md5(F.encode("text", "UTF-8")).alias("fp")
    test = d.filter(F.col("doc_id") % 5 == 0).select(fp).distinct()
    train = d.filter(F.col("doc_id") % 5 != 0).select("doc_id", fp)
    # m = 512 (deliberately small for the demo corpus) so the
    # false-positive behavior is visible in the output; production sizes m
    # for the target FP rate ((1 - e^(-kn/m))^k) and stays broadcastable
    bloom = bloom_build(test, "fp", m=512)
    probed = bloom_probe(train, bloom, "fp", m=512)
    return (
        probed.filter(F.col("bloom_hit"))
        .join(test.withColumn("_t", F.lit(True)), "fp", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("_t"), F.lit(False)).alias("is_true_match"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Temperature-based mixture sampling (XLM-R-style multilingual rebalancing).
# ---------------------------------------------------------------------------
@query(
    "sample_temperature_mix",
    oracle="""
    WITH d AS (SELECT doc_id, lang, n_chars // 4 AS toks FROM documents),
    tot AS (SELECT lang, SUM(toks) AS w FROM d GROUP BY lang),
    p AS (SELECT lang, w, power(CAST(w AS DOUBLE), 0.5) AS wp FROM tot),
    g AS (SELECT SUM(wp) AS z, SUM(w) AS tot FROM p),
    r AS (
      SELECT lang, w,
             LEAST(1.0, (0.5 * tot * (wp / z)) / w) AS rate
      FROM p, g),
    cuts AS (
      SELECT lang,
             CASE WHEN rate >= 1.0
                       OR CAST(ROUND(rate * 65536 + 1e-9, 0) AS INT) >= 65536
                  THEN 'g000'
                  ELSE lpad(lower(hex(CAST(ROUND(rate * 65536 + 1e-9, 0)
                                           AS INT))), 4, '0')
             END AS cut
      FROM r),
    kept AS (
      SELECT d.doc_id, d.lang, d.toks
      FROM d JOIN cuts USING (lang)
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < cut)
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(toks) AS BIGINT) AS tokens_kept
    FROM kept GROUP BY lang ORDER BY lang
    """,
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture resampling (T = 2, 50% token budget):
    class shares follow w^(1/T)/Z, up-weighting tail languages without
    flattening the head — the XLM-R multilingual rebalancing rule
    (operators.sampling.sample_temperature; same broadcast-threshold
    scale shape as the other mixture operators, exactly oracle-checked).
    """
    from sqlitedataframe_spark.operators.sampling import sample_temperature

    d = T(spark, sf_dir, "documents").select(
        "doc_id", "lang", (F.col("n_chars") / 4).cast("bigint").alias("toks")
    )
    kept = sample_temperature(
        d, class_col="lang", tokens_col="toks",
        budget_fraction=0.5, temperature=2.0, key="doc_id",
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").alias("tokens_kept"),
        )
        .orderBy("lang")
    )
