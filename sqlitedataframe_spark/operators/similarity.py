"""Similarity search over embedding columns (array<float>).

Two paths, per the standard ANN playbook:
- ``brute_force_topk``: exact cosine top-k. The dot product is a pure Column
  expression (zip_with + aggregate) so it runs JVM-side inside the scan
  stage; top-k is TakeOrderedAndProject (no full sort). This is the
  verification baseline and is already the right answer when the query set
  is small.
- ``lsh_topk``: random-hyperplane (sign) LSH. Signatures are computed
  scan-side against a broadcast hyperplane matrix; candidates come from
  bucket equality on signature bands, then exact cosine re-ranks. At 100 TB
  this probes a tiny fraction of partitions' rows instead of every vector.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sqlitedataframe_spark.operators.util import spread as _spread


def as_double(vec: Column | str) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns — sequential fold, so the
    result is bit-reproducible across engines that fold left-to-right."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity with both inputs let-bound: zip_with over two
    1-element arrays binds `a` and `b` to lambda variables, so each side's
    cast/transform tree is evaluated ONCE per row even though dot+norm
    reference it twice (HOFs are codegen-fallback — no CSE rescues a
    duplicated subtree)."""
    return F.element_at(
        F.zip_with(
            F.array(a),
            F.array(b),
            lambda x, y: dot(x, y) / (norm(x) * norm(y)),
        ),
        1,
    )


def brute_force_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "q",
) -> DataFrame:
    """Exact cosine top-k of ``df`` vectors against a 1-row query DataFrame
    (broadcast — the query never forces a shuffle of the corpus)."""
    joined = _spread(df, id_col).crossJoin(F.broadcast(query_df))
    scored = joined.select(
        F.col(id_col),
        F.round(cosine(as_double(vec_col), as_double(query_vec_col)), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), id_col).limit(k)


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic unit-free Gaussian hyperplanes for sign-LSH."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def signature_bits(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH signature as array<int> of 0/1 bits (one per hyperplane).

    The planes are baked into the expression as literals — equivalent to
    broadcasting a small matrix; no shuffle, no UDF. The cast vector is
    let-bound (transform over a 1-element array) so the input transform
    runs once per row, not once per plane.
    """

    def bits(v: Column) -> Column:
        out = []
        for plane in planes:
            p = F.array(*[F.lit(x) for x in plane])
            out.append((dot(v, p) >= 0).cast("int"))
        return F.array(*out)

    return F.element_at(
        F.transform(F.array(as_double(vec_col)), lambda v: bits(v)), 1
    )


def lsh_topk(
    df: DataFrame,
    query_df: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "q",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: sign-LSH bucket candidates, exact cosine re-rank.

    Recall/probe tradeoff via (n_planes, bands): candidates share at least
    one band of sign bits with the query.
    """
    planes = random_hyperplanes(dim, n_planes, seed)
    width = n_planes // bands

    def banded(vec: Column) -> Column:
        # let-bind the signature: the slice-per-band expressions reference
        # it `bands` times, and without the binding the whole 16-dot-product
        # tree would be duplicated (and evaluated) once per band
        sig = signature_bits(vec, planes)
        return F.element_at(
            F.transform(
                F.array(sig),
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
            ),
            1,
        )

    corpus = _spread(df, id_col).select(
        F.col(id_col),
        F.col(vec_col),
        F.posexplode(banded(F.col(vec_col))).alias("band", "bucket"),
    )
    qsig = query_df.select(
        F.col(query_vec_col),
        F.posexplode(banded(F.col(query_vec_col))).alias("band", "bucket"),
    )
    cand = (
        corpus.join(F.broadcast(qsig), on=["band", "bucket"])
        .dropDuplicates([id_col])
        .select(
            F.col(id_col),
            F.round(cosine(as_double(vec_col), as_double(query_vec_col)), 6).alias("cos_sim"),
        )
    )
    return cand.orderBy(F.desc("cos_sim"), id_col).limit(k)


def knn_join_lsh(
    df: DataFrame,
    dim: int,
    k: int = 1,
    n_planes: int = 32,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_bucket: int | None = 10_000,
    label_col: str | None = None,
) -> DataFrame:
    """Approximate kNN SELF-join: for EVERY vector, its top-k nearest
    neighbors among sign-LSH bucket mates, exact-cosine re-ranked —
    the all-pairs neighbor primitive behind SemDeDup-style analyses and
    duplicate-graph construction (lsh_topk's query-vs-corpus sibling).

    With ``label_col`` set, neighbors are restricted to a DIFFERENT label
    than the query vector — hard-negative mining for contrastive
    training: the nearest cross-label neighbor is exactly the
    most-confusable negative a triplet/contrastive objective wants, and
    the LSH bucketing finds it without the O(n^2) cross join a naive
    miner runs. Null-labeled rows mine no negatives (strict inequality
    is null-falsy — deliberately conservative). Output then gains
    ``label`` and ``nn_label`` columns.

    Scale shape: candidates come from band-bucket equality on slim
    (id, band, bucket) rows — the self-join never sees vectors; pair
    volume is sum-of-bucket-squares, bounded by the band width choice
    (width = n_planes/bands sign bits per bucket; more planes => smaller
    buckets => fewer candidates, lower recall) and by the same hot-bucket
    suppression guard as the dedup paths. Vectors whose buckets yield NO
    candidate still emit a row (null neighbor) — a silent drop would
    overstate coverage (the sim_ann_recall lesson).

    Returns (id_col, nn_id, cos_sim, rank), rank 1..k, nullable
    neighbor columns.
    """
    from sqlitedataframe_spark.operators.dedup import _suppress_hot_buckets

    planes = random_hyperplanes(dim, n_planes, seed)
    width = n_planes // bands

    def banded_sig(vec: Column) -> Column:
        sig = signature_bits(vec, planes)
        return F.element_at(
            F.transform(
                F.array(sig),
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
            ),
            1,
        )

    keep = [id_col, vec_col] + ([label_col] if label_col else [])
    base = _spread(df.select(*keep), id_col)
    banded = base.select(
        F.col(id_col).alias("_id"),
        F.posexplode(banded_sig(F.col(vec_col))).alias("band", "bucket"),
    )
    banded = _suppress_hot_buckets(banded, ["band", "bucket"], max_bucket)
    # r12: lazily persisted — both sides of the candidate self-join read
    # this frame; unpersisted, the 32-dot-product signature (and the
    # hot-bucket suppression) evaluated twice per row
    from sqlitedataframe_spark.operators.util import register_cache

    banded = register_cache(banded.persist())
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._id") != F.col("b._id")),
        )
        .select(F.col("a._id").alias("_qid"), F.col("b._id").alias("_nid"))
        .dropDuplicates(["_qid", "_nid"])
    )
    va = base.select(
        F.col(id_col).alias("_qid"),
        F.col(vec_col).alias("_va"),
        *([F.col(label_col).alias("_la")] if label_col else []),
    )
    vb = base.select(
        F.col(id_col).alias("_nid"),
        F.col(vec_col).alias("_vb"),
        *([F.col(label_col).alias("_lb")] if label_col else []),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("_qid").orderBy(F.desc("cos_sim"), F.col("_nid"))
    scored = cand.join(va, "_qid").join(vb, "_nid")
    if label_col:
        # strict != is null-falsy: null-labeled rows mine no negatives
        scored = scored.filter(F.col("_la") != F.col("_lb"))
    topk = (
        scored.select(
            "_qid",
            "_nid",
            *([F.col("_lb")] if label_col else []),
            F.round(cosine(as_double("_va"), as_double("_vb")), 6).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    if label_col:
        return (
            df.select(F.col(id_col), F.col(label_col).alias("label"))
            .join(topk, F.col(id_col) == F.col("_qid"), "left")
            .select(
                id_col,
                "label",
                F.col("_nid").alias("nn_id"),
                F.col("_lb").alias("nn_label"),
                "cos_sim",
                "rank",
            )
        )
    return (
        df.select(F.col(id_col))
        .join(topk, F.col(id_col) == F.col("_qid"), "left")
        .select(id_col, F.col("_nid").alias("nn_id"), "cos_sim", "rank")
    )


def train_centroids(
    df: DataFrame,
    k: int = 8,
    iters: int = 5,
    vec_col: str = "embedding",
    sample_fraction: float | None = None,
    seed: int = 42,
    init_vectors: list[list[float]] | None = None,
    round_dp: int | None = None,
) -> list[list[float]]:
    """Lloyd's k-means over the embedding column, as DataFrame ops: assign
    (ivf_assign) -> per-cell mean (groupBy + element-wise array agg) ->
    repeat. Init = k deterministic samples (or caller-supplied
    ``init_vectors``). Each iteration is one shuffle on the cell id; the
    centroid matrix (k x dim floats) collects to the driver between
    iterations — the standard iterative-algorithm shape on Spark (only
    the tiny model state crosses the driver boundary).

    ``sample_fraction`` trains on a sample (plenty for IVF bucketing at
    100 TB; assignment still covers every row downstream).

    ``round_dp`` rounds each centroid mean (engine-side F.round, AFTER
    the division) — with deterministic ``init_vectors`` this makes the
    whole training trajectory reproducible across engines to the rounding
    granularity, which is what lets a SQL oracle replay the iterations.
    """
    data = df.select(as_double(vec_col).alias("_v"))
    if sample_fraction:
        data = data.sample(fraction=sample_fraction, seed=seed)
    data = data.persist()
    try:
        if init_vectors is not None:
            cents = [[float(x) for x in v] for v in init_vectors]
        else:
            cents = [list(r._v) for r in data.limit(k).collect()]
        if len(cents) < k:
            raise ValueError(f"need at least {k} vectors, got {len(cents)}")
        dim = len(cents[0])
        for _ in range(iters):
            assigned = ivf_assign(data, cents, "_v")
            n = F.count(F.lit(1))
            mean = lambda i: F.sum(F.element_at("_v", i + 1)) / n  # noqa: E731
            sums = assigned.groupBy("ivf_cell").agg(
                n.alias("_n"),
                *[
                    (
                        F.round(mean(i), round_dp)
                        if round_dp is not None
                        else mean(i)
                    ).alias(f"_m{i}")
                    for i in range(dim)
                ],
            )
            rows = {r.ivf_cell: r for r in sums.collect()}
            cents = [
                [rows[c][f"_m{i}"] for i in range(dim)]
                if c in rows
                else cents[c]  # empty cell keeps its old centroid
                for c in range(k)
            ]
        return cents
    finally:
        data.unpersist()


def ivf_topk(
    df: DataFrame,
    query_df: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "q",
) -> DataFrame:
    """IVF search: corpus vectors are assigned to their nearest centroid
    cell; a query probes only its ``n_probe`` nearest cells and exact-cosine
    re-ranks inside them. At 100 TB, with the corpus written partitioned/
    clustered by ``ivf_cell``, a probe touches ~n_probe/n_cells of the data
    (partition pruning on the cell column) instead of every row.
    """
    corpus = ivf_assign(df, centroids, vec_col)
    qv = as_double(query_vec_col)
    qdists = F.array(*[_sqdist(qv, c) for c in centroids])
    # the query's n_probe nearest cells, as an array of cell indices
    probe_cells = F.slice(
        F.transform(
            F.array_sort(
                F.transform(
                    qdists, lambda d, i: F.struct(d.alias("d"), i.alias("cell"))
                )
            ),
            lambda s: s["cell"],
        ),
        1,
        n_probe,
    )
    q = query_df.select(F.col(query_vec_col), F.explode(probe_cells).alias("ivf_cell"))
    cand = corpus.join(F.broadcast(q), on="ivf_cell").select(
        F.col(id_col),
        F.round(cosine(as_double(vec_col), as_double(query_vec_col)), 6).alias("cos_sim"),
    )
    return cand.orderBy(F.desc("cos_sim"), id_col).limit(k)


def _sqdist(v: Column, centroid: list[float]) -> Column:
    """Squared euclidean distance of an array<double> column to a literal
    centroid (sequential fold — engine-reproducible)."""
    return F.aggregate(
        F.zip_with(
            v,
            F.array(*[F.lit(x) for x in centroid]),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def ivf_assign(df: DataFrame, centroids: list[list[float]], vec_col: str = "embedding") -> DataFrame:
    """IVF-style partition assignment: nearest centroid index per vector
    (centroids baked as literals = broadcast). Downstream, repartitioning by
    ``ivf_cell`` co-locates each cell so probes touch one partition.

    Both the cast vector (referenced once per centroid) and the distance
    array (referenced twice by argmin) are let-bound so each is computed
    once per row."""

    def argmin_cell(v: Column) -> Column:
        dists = F.array(*[_sqdist(v, c) for c in centroids])
        return F.element_at(
            F.transform(
                F.array(dists), lambda d: F.array_position(d, F.array_min(d))
            ),
            1,
        )

    cell = F.element_at(
        F.transform(F.array(as_double(vec_col)), lambda v: argmin_cell(v)), 1
    )
    return df.withColumn("ivf_cell", cell.cast("int") - 1)


def ivf_recall(
    df: DataFrame,
    centroids: list[list[float]],
    n_queries: int = 8,
    k: int = 10,
    nprobes: tuple[int, ...] = (1, 2, 4),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall@k of the IVF candidate path against exact brute-force
    cosine, per (n_probe, query) — the tuning curve that decides how many
    cells a 100 TB ANN deployment must probe to hit its recall SLO
    (sim_ann_recall's twin for the IVF index instead of sign-LSH).

    Multi-query, multi-probe, ONE plan: every vector argmin-assigns to
    its cell once (:func:`ivf_assign`, centroid literals = broadcast),
    the ``n_queries`` query vectors rank all cells by distance (a
    #queries x #cells frame), the probe grid crosses that tiny frame
    with the nprobe values, candidates come from one hash join on the
    cell id, and the per-(nprobe, query) top-k is a window over bounded
    candidate partitions. The corpus is scanned twice (exact scoring +
    assignment) regardless of how many probe settings are evaluated —
    no per-query jobs, no driver loops.

    Determinism: centroids are caller-fixed literals; distance folds are
    sequential; argmin and probe ranking tie-break on cell id; top-k
    orders on the pre-rounded score with the id tiebreak (the
    sim_ivf_topk contract, extended).
    """
    e = df.select(F.col(id_col), as_double(vec_col).alias("_v"))
    qs = e.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("qid"), F.col("_v").alias("_q")
    )
    w_exact = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.col(id_col))
    scored = e.crossJoin(F.broadcast(qs)).select(
        "qid",
        id_col,
        F.round(cosine(F.col("_v"), F.col("_q")), 6).alias("cos_sim"),
    )
    exact = (
        scored.withColumn("_rnk", F.row_number().over(w_exact))
        .filter(F.col("_rnk") <= k)
        .select("qid", id_col)
    )
    assign = ivf_assign(df, centroids, vec_col).select(
        F.col(id_col), F.col("ivf_cell").alias("_cell")
    )
    # query -> ranked cells (a #queries x #cells frame), crossed with the
    # probe grid
    qcell = qs.select(
        "qid",
        F.posexplode(
            F.array(*[_sqdist(F.col("_q"), c) for c in centroids])
        ).alias("_cell", "_d"),
    )
    w_probe = Window.partitionBy("qid").orderBy("_d", "_cell")
    ranked = qcell.withColumn("_crnk", F.row_number().over(w_probe))
    grid = df.sparkSession.createDataFrame(
        [(int(p),) for p in nprobes], "n_probe int"
    )
    probes = ranked.crossJoin(F.broadcast(grid)).filter(
        F.col("_crnk") <= F.col("n_probe")
    ).select("n_probe", "qid", "_cell")
    cands = probes.join(assign, "_cell").select("n_probe", "qid", id_col)
    cand_scored = cands.join(scored, ["qid", id_col])
    w_top = Window.partitionBy("n_probe", "qid").orderBy(
        F.desc("cos_sim"), F.col(id_col)
    )
    approx = (
        cand_scored.withColumn("_rnk", F.row_number().over(w_top))
        .filter(F.col("_rnk") <= k)
        .select("n_probe", "qid", id_col)
    )
    hits = (
        approx.join(exact, ["qid", id_col])
        .groupBy("n_probe", "qid")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
    )
    spine = grid.crossJoin(qs.select("qid"))
    return (
        spine.join(hits, ["n_probe", "qid"], "left")
        .select(
            "n_probe",
            "qid",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_hits"),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)) / float(k), 2
            ).alias(f"recall_at_{k}"),
        )
        .orderBy("n_probe", "qid")
    )


def prefix_recall(
    df: DataFrame,
    prefix_dims: tuple[int, ...] = (16, 32),
    n_queries: int = 8,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka-style prefix-dimension recall: recall@k of cosine
    search over only the FIRST ``d`` coordinates against full-dimension
    brute force, per (prefix_dim, query) — the measurement that decides
    whether a deployment can store/scan truncated vectors (MRL-trained
    encoders pack information front-first; this is the check that the
    corpus's embeddings actually permit it, and by how much).

    One plan for all prefix dims: the full-dim exact top-k computes once
    (corpus x broadcast queries, the sim_ann_recall shape), each prefix
    scoring is another scan-side fold over a sliced array, and per-query
    top-k is a window over bounded candidate partitions. Determinism:
    slices are positional, folds are fixed-order, ordering is on the
    pre-rounded score with the id tiebreak.
    """
    e = df.select(F.col(id_col), as_double(vec_col).alias("_v"))
    qs = e.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("qid"), F.col("_v").alias("_q")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.col(id_col))
    joined = e.crossJoin(F.broadcast(qs))
    exact = (
        joined.select(
            "qid",
            id_col,
            F.round(cosine(F.col("_v"), F.col("_q")), 6).alias("cos_sim"),
        )
        .withColumn("_rnk", F.row_number().over(w))
        .filter(F.col("_rnk") <= k)
        .select("qid", id_col)
    )
    outs = []
    for d in prefix_dims:
        approx = (
            joined.select(
                "qid",
                id_col,
                F.round(
                    cosine(
                        F.slice(F.col("_v"), 1, d), F.slice(F.col("_q"), 1, d)
                    ),
                    6,
                ).alias("cos_sim"),
            )
            .withColumn("_rnk", F.row_number().over(w))
            .filter(F.col("_rnk") <= k)
            .select(F.lit(d).cast("int").alias("prefix_dim"), "qid", id_col)
        )
        outs.append(approx)
    allx = outs[0]
    for o in outs[1:]:
        allx = allx.unionByName(o)
    hits = (
        allx.join(exact, ["qid", id_col])
        .groupBy("prefix_dim", "qid")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
    )
    grid = df.sparkSession.createDataFrame(
        [(int(d),) for d in prefix_dims], "prefix_dim int"
    )
    spine = grid.crossJoin(qs.select("qid"))
    return (
        spine.join(hits, ["prefix_dim", "qid"], "left")
        .select(
            "prefix_dim",
            "qid",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_hits"),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)) / float(k), 2
            ).alias(f"recall_at_{k}"),
        )
        .orderBy("prefix_dim", "qid")
    )


def gram_matrix(
    df: DataFrame, vec_col: str = "embedding", round_dp: int = 3
) -> DataFrame:
    """Gram (uncentered covariance) matrix of an embedding column as
    ``(i, j, c)`` cells, c = round(sum_rows(v[i] * v[j]), round_dp).

    Scale shape: the two chained posexplodes emit dim^2 slim rows per
    input row INSIDE the scan stage, and map-side partial aggregation
    collapses them to at most dim^2 cells per partition before the
    exchange — input-size-independent shuffle, the same operational story
    as the count-min/HLL/histogram sketches. No driver involvement until
    a consumer collects the dim x dim result.

    ``round_dp`` makes the cells engine-reproducible: cross-engine
    partial-sum ordering perturbs the raw sums by ~1e-12, and rounding at
    a coarse granularity (3 dp) makes a boundary straddle vanishingly
    unlikely while leaving PCA-grade precision.
    """
    v = as_double(vec_col)
    e = df.select(F.posexplode(v).alias("i", "xi"), v.alias("_v"))
    return (
        e.select("i", "xi", F.posexplode("_v").alias("j", "xj"))
        .groupBy("i", "j")
        .agg(F.round(F.sum(F.col("xi") * F.col("xj")), round_dp).alias("c"))
    )


def top_component(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    iters: int = 3,
    round_dp: int = 6,
) -> DataFrame:
    """Top principal direction of the (uncentered) embedding cloud via
    power iteration: build the Gram matrix distributed (one pass,
    bounded shuffle — see :func:`gram_matrix`), collect the dim x dim
    model (32 KB at dim 64) to the driver, iterate
    ``v <- round(Cv / ||Cv||, round_dp)`` from the uniform start, and
    return 64 (pos, loading) rows.

    This is the whitening/PCA step of embedding-curation recipes
    (SemDeDup et al.). Determinism: the rounded Gram cells and the
    per-iteration rounding make the trajectory a pure function of the
    data — a SQL oracle replays the same iterations as CTEs. Only the
    tiny model state crosses the driver boundary (train_centroids'
    pattern); at 100 TB the heavy pass is the one distributed aggregate.
    """
    cells = {(r["i"], r["j"]): float(r["c"]) for r in gram_matrix(df, vec_col).collect()}
    c = [[cells.get((i, j), 0.0) for j in range(dim)] for i in range(dim)]
    v = [1.0 / 8.0] * dim
    for _ in range(iters):
        w = [sum(c[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        nn = math.sqrt(sum(x * x for x in w))
        v = [round(x / nn, round_dp) for x in w]
    spark = df.sparkSession
    return spark.createDataFrame(
        [(i + 1, v[i]) for i in range(dim)], "pos int, loading double"
    )


def whitening_params(
    df: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
    scale: int = 1_000_000,
    round_dp: int = 6,
) -> DataFrame:
    """Per-group DIAGONAL whitening parameter table: for every
    (group, dimension), the mean, standard deviation, and share of the
    group's total per-dimension variance — the broadcastable model a
    100 TB pipeline applies as z = (x - mean) / sd to normalize each
    source's embedding distribution before mixing sources (per-source
    whitening: retrieval and dedup thresholds tuned on one source
    transfer to another only after their embedding clouds are brought
    to a common scale), and the anisotropy diagnostic on its own
    (var_share far from 1/dim = a rogue dimension dominating one feed).

    Exactness (the welch recipe): coordinates quantize once to
    round(x * scale) integers; per-(group, dim) n / sum / sum-of-squares
    accumulate in DECIMAL(38,0), so every engine and partition layout
    produces identical integers. mean and sd go double only in the final
    closed form; var_share is a ratio of EXACT integer variance
    numerators (q*n - s^2, summed exactly over the group's dims), so
    even the share is drift-proof. Means carry the `+ 0.0` signed-zero
    convention (they straddle zero).

    Plan shape: one posexplode inside the scan (n*dim slim rows,
    map-side partial combine to #groups*dim cells before the exchange),
    one #groups*dim-sized self-aggregation for the group totals,
    broadcast-joined back. Output is model-sized: #groups * dim rows.
    """
    iv = F.transform(
        as_double(vec_col), lambda x: F.round(x * scale).cast("bigint")
    )
    e = df.select(
        F.col(group_col).alias("_g"), F.posexplode(iv).alias("dim", "_xi")
    )
    ivd = F.col("_xi").cast("decimal(38,0)")
    cells = e.groupBy("_g", "dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(ivd).alias("_s"),
        F.sum(ivd * F.col("_xi")).alias("_q"),
    )
    # exact integer variance numerator: q*n - s^2 (decimal arithmetic)
    vnum = (
        F.col("_q") * F.col("n") - F.col("_s") * F.col("_s")
    ).cast("decimal(38,0)")
    cells = cells.withColumn("_vnum", vnum)
    tot = cells.groupBy("_g").agg(F.sum("_vnum").alias("_vtot"))
    nn = F.col("n").cast("double")
    mean = F.col("_s").cast("double") / scale / nn
    var = F.col("_vnum").cast("double") / (scale * float(scale)) / (nn * (nn - 1.0))
    return (
        cells.join(F.broadcast(tot), "_g")
        .select(
            F.col("_g").alias(group_col),
            F.col("dim").cast("int").alias("dim"),
            "n",
            # + 0.0: signed-zero convention (per-dim means straddle zero)
            (F.round(mean + 1e-9, round_dp) + 0.0).alias("mean"),
            F.round(F.sqrt(var) + 1e-9, round_dp).alias("sd"),
            F.round(
                F.col("_vnum").cast("double") / F.col("_vtot").cast("double")
                + 1e-9,
                round_dp,
            ).alias("var_share"),
        )
        .orderBy(group_col, "dim")
    )


def abtt_projections(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    iters: int = 3,
    top: int = 20,
    round_dp: int = 6,
) -> DataFrame:
    """All-but-the-top (Mu & Viswanath, ICLR 2018) projection screen:
    project every vector onto the corpus's top principal direction
    (:func:`top_component` — distributed Gram build + deterministic
    rounded power iteration) and report the ``top`` vectors most
    dominated by it, with the residual norm each would keep after the
    common-direction removal. The embedding post-processing step that
    fixes anisotropic encoder outputs before cosine search — and, as a
    screen, the detector for vectors that are ~pure common direction
    (boilerplate / collapsed encodings contributing nothing to
    retrieval).

    Determinism: the component is a pure function of the data (rounded
    Gram cells, rounded iterates); projection and norm are FIXED-ORDER
    folds over the array (identical IEEE sequence both engines);
    ordering is on the pre-rounded |projection| with the id tiebreak.
    Plan: one data-sized Gram aggregate (dim^2-cell shuffle), one scan
    with two array folds against the 64-float broadcast literal, one
    TakeOrderedAndProject. proj carries `+ 0.0` (signed).
    """
    comp = top_component(df, vec_col, dim=dim, iters=iters, round_dp=round_dp)
    u = [0.0] * dim
    for r in comp.collect():
        u[r["pos"] - 1] = float(r["loading"])
    ulit = F.array(*[F.lit(x) for x in u])
    v = as_double(vec_col)
    proj = F.aggregate(
        F.zip_with(v, ulit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    norm2 = F.aggregate(
        F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, t: acc + t
    )
    scored = df.select(
        F.col(id_col),
        proj.alias("_proj"),
        norm2.alias("_n2"),
    )
    return (
        scored.select(
            id_col,
            (F.round(F.col("_proj") + 1e-9, round_dp) + 0.0).alias("proj"),
            F.round(
                F.sqrt(F.greatest(F.lit(0.0), F.col("_n2") - F.col("_proj") * F.col("_proj")))
                + 1e-9,
                round_dp,
            ).alias("resid_norm"),
            F.round(F.abs("_proj") + 1e-9, round_dp).alias("_absp"),
        )
        .orderBy(F.col("_absp").desc(), id_col)
        .limit(top)
        .drop("_absp")
    )


def label_centroids(
    df: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label centroid of a vector column, in exploded (label, pos, value)
    form.

    posexplode + groupBy(label, pos) is the scale-right shape for wide
    vectors: the exchange carries slim (label, pos, partial-sum) triples
    with map-side partial aggregation — never whole arrays — and no
    order-sensitive array reassembly (collect_list order is undefined under
    parallel merge). Re-assemble downstream with sort_array(collect_list(
    struct(pos, v))) only if an array form is genuinely needed.

    ``pos`` is 1-based (portable to SQL engines' generate_subscripts).
    """
    return (
        df.select(F.col(label_col).alias("label"), F.posexplode(as_double(vec_col)))
        .groupBy("label", (F.col("pos") + 1).alias("pos"))
        .agg(F.round(F.avg("col") + 1e-9, 6).alias("centroid"))
    )


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "q"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: q_i = round(x_i / scale),
    scale = max|x| / 127 — the standard 4x storage/bandwidth cut for
    embedding corpora (float32 -> int8 + one float scale per vector).

    Entirely JVM-side column arithmetic (no UDF): the cast vector and the
    scale are let-bound via 1-element-array transforms, so max|x| is
    computed once per row, not once per element. Zero vectors quantize to
    all-zero with scale 0 (guarded division).

    Adds ``out_col`` (array<int>, values in [-127, 127]) and
    ``{out_col}_scale`` (double); reconstruct with q_i * scale.
    """
    v = as_double(vec_col)
    quantized = F.element_at(
        F.transform(
            F.array(v),
            lambda vv: F.element_at(
                F.transform(
                    F.array(F.array_max(F.transform(vv, F.abs)) / F.lit(127.0)),
                    lambda s: F.struct(
                        F.transform(
                            vv,
                            lambda x: F.when(s == 0.0, F.lit(0))
                            .otherwise(F.round(x / s).cast("int"))
                            .alias("x"),
                        ).alias("q"),
                        s.alias("scale"),
                    ),
                ),
                1,
            ),
        ),
        1,
    )
    return df.withColumn("_qz", quantized).select(
        "*",
        F.col("_qz.q").alias(out_col),
        F.col("_qz.scale").alias(f"{out_col}_scale"),
    ).drop("_qz")


def label_centroid_outliers(
    df: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
    per_label: int = 5,
    round_dp: int = 6,
) -> DataFrame:
    """Label-noise screening: per label, the ``per_label`` vectors FARTHEST
    (lowest cosine) from their own label's centroid — the standard
    cheap mislabel/outlier detector run before training a classifier or
    curating a labeled corpus (confident-learning lite).

    Scale shape: the centroid table is n_labels x dim — bounded model
    state — built by :func:`label_centroids`' slim posexplode aggregate,
    reassembled to arrays only AFTER the aggregate (sort_array of
    (pos, value) structs: collect_list order is undefined under parallel
    merge, sorting by pos restores it deterministically), and broadcast
    back; the 100-TB embedding side joins map-side and never shuffles
    until the tiny per-label top-k window on (label, cos) — which
    partitions on the label key, the bounded dimension. Centroid means are
    rounded (same 6-dp contract as ``label_centroids``) so the whole
    report is a pure function of the data.
    """
    cent = label_centroids(df, label_col, vec_col)
    carr = (
        cent.groupBy("label")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "centroid"))).alias("_pc")
        )
        .select(
            "label", F.transform("_pc", lambda s: s["centroid"]).alias("_c")
        )
    )
    base = df.select(
        F.col(id_col), F.col(label_col).alias("label"), as_double(vec_col).alias("_v")
    ).join(F.broadcast(carr), "label")
    scored = base.select(
        id_col,
        "label",
        F.round(cosine(F.col("_v"), F.col("_c")), round_dp).alias("cos_to_centroid"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("label").orderBy(
        F.col("cos_to_centroid").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank_in_label", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank_in_label") <= per_label)
        .select("label", "rank_in_label", id_col, "cos_to_centroid")
    )


def silhouette_by_label(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Simplified (centroid-based) silhouette per label: for each point,
    ``a`` = distance to its own label centroid, ``b`` = distance to the
    nearest OTHER centroid, ``s = (b - a) / max(a, b)``; report the
    per-label mean — the standard clustering/labeling QA number
    (negative mean = the label's points sit closer to another class).
    The centroid form is the one that scales: the full silhouette's
    all-pairs distances are O(n^2) and add little for cluster QA.

    Plan shape at 100 TB: centroids are a labels x dims aggregate
    (tiny) broadcast back; the per-point work is an n x |labels|
    map-side expansion collapsed by partially-combined aggregation —
    no point-point joins anywhere. Centroid coordinates round to 9 dp
    (with the repo's +1e-9 boundary guard) so parallel-summation ulp
    drift cannot flip which foreign centroid is nearest.
    """
    pt = df.select(
        F.col(id_col).alias("_id"),
        F.col(label_col).alias("_l"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias(
            "_pos", "_v"
        ),
    )
    cen = pt.groupBy(F.col("_l").alias("_lc"), "_pos").agg(
        F.round(F.avg("_v") + 1e-9, 9).alias("_c")
    )
    d = (
        pt.join(F.broadcast(cen), "_pos")
        .groupBy("_id", "_l", "_lc")
        .agg(
            F.sum((F.col("_v") - F.col("_c")) * (F.col("_v") - F.col("_c")))
            .alias("_sq")
        )
    )
    pp = d.groupBy("_id", "_l").agg(
        F.sqrt(F.min(F.when(F.col("_lc") == F.col("_l"), F.col("_sq"))))
        .alias("_a"),
        F.sqrt(F.min(F.when(F.col("_lc") != F.col("_l"), F.col("_sq"))))
        .alias("_b"),
    )
    s = F.when(
        F.greatest("_a", "_b") > 0,
        (F.col("_b") - F.col("_a")) / F.greatest("_a", "_b"),
    ).otherwise(F.lit(0.0))
    return (
        pp.groupBy(F.col("_l").alias(label_col))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.avg(s) + 1e-9, 6).alias("avg_silhouette"),
            F.round(F.avg((s < 0).cast("double")) + 1e-9, 6).alias(
                "frac_negative"
            ),
        )
        .orderBy(label_col)
    )


def norm_stats(
    emb: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    round_dp: int = 4,
) -> DataFrame:
    """Per-label L2-norm distribution of an embedding column (count,
    avg/min/max norm) — the first QA readout on any vector table: a
    label whose norms collapse toward 0 or blow up signals a broken
    encoder run or an unnormalized mix before anything cosine-based
    consumes it.

    Shape: the norm is a scan-side sequential array fold (cast to double
    FIRST, so both engines sum the same float64 sequence left-to-right);
    one group aggregate.
    """
    sq = F.aggregate(
        F.transform(F.col(vec_col), lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x * x,
    )
    per = emb.select(F.col(label_col).alias("lbl"), F.sqrt(sq).alias("_nrm"))
    return (
        per.groupBy(F.col("lbl").alias(label_col))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.avg("_nrm") + 1e-9, round_dp).alias("avg_norm"),
            F.round(F.min("_nrm") + 1e-9, round_dp).alias("min_norm"),
            F.round(F.max("_nrm") + 1e-9, round_dp).alias("max_norm"),
        )
        .orderBy(label_col)
    )


def dimension_variance(
    emb: DataFrame,
    vec_col: str = "embedding",
    top_k: int = 8,
    round_dp: int = 6,
) -> DataFrame:
    """Top-k embedding dimensions by population variance (with mean) —
    the pre-PCA screen that finds dead dimensions (zero variance: wasted
    capacity, or a broken projection) and dominant ones (a single dim
    carrying the norm means the encoder collapsed).

    Shape: posexplode to (dim, value) — the shuffle carries dim-keyed
    scalars, never whole vectors — then one #dims-group moment
    aggregate; top-k is a TakeOrdered over #dims rows.
    """
    per = emb.select(
        F.posexplode(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("dim", "_v")
    )
    agg = per.groupBy("dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("_v").alias("_s"),
        F.sum(F.col("_v") * F.col("_v")).alias("_q"),
    )
    mean = F.col("_s") / F.col("n")
    var = (F.col("_q") - F.col("_s") * F.col("_s") / F.col("n")) / F.col("n")
    scored = agg.select(
        "dim",
        "n",
        F.round(mean + 1e-9, round_dp).alias("mean"),
        F.round(var + 1e-9, round_dp).alias("variance"),
    )
    return scored.orderBy(
        F.col("variance").desc(), F.col("dim").asc()
    ).limit(top_k)


def kcenter_coreset(
    emb: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_dp: int = 6,
) -> DataFrame:
    """Greedy k-center coreset selection (farthest-point traversal): the
    data-pruning primitive that picks k maximally-spread exemplars — seed
    with the min-id point, then repeatedly add the point FARTHEST from
    its nearest already-chosen center. The selected radius sequence is
    the classic 2-approximation of the optimal k-center cover and doubles
    as a diversity readout (how fast does coverage improve?).

    Returns UP TO k rows (step, center_id, radius): ``radius`` is the
    point's min-distance to the previous centers at selection time
    (sqrt, rounded; NULL for the seed) — monotonically non-increasing by
    construction. If k exceeds the number of DISTINCT points, selection
    stops early when the farthest remaining distance reaches 0 (fewer
    than k rows) instead of re-selecting chosen centers.

    Scale shape: k bounded driver iterations, each ONE distributed pass —
    broadcast the 1-row newly-chosen center vector, fold the squared
    distance scan-side (zip_with + sequential sum, cast double first so
    any engine reproduces the floats bit-exactly), keep the running min,
    TakeOrdered(1) for the argmax. Driver traffic is k scalars; vectors
    never collect. The point set is cached ONCE and each round's
    min-distance frame is persisted and materialized by its own argmax
    action with the previous round released (the pagerank/CC block
    lifecycle) — so round i reads the round i-1 cache instead of
    re-executing an i-deep join chain (the naive chained form does
    O(k^2) scans; measured 6.6 s -> ~2 s at k=8 on the suite fixture).

    Exactness: distances are identical IEEE doubles in any engine (exact
    float32→float64 widening, same left-to-right fold), so the argmax
    choices — and therefore the SELECTED SET — are bit-deterministic;
    ties break on min id.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from sqlitedataframe_spark.operators.util import register_cache

    pts = emb.select(
        F.col(id_col).alias("_id"), as_double(vec_col).alias("_v")
    ).persist()
    try:
        seed_id = pts.agg(F.min("_id")).collect()[0][0]
        if seed_id is None:
            raise ValueError("kcenter_coreset: empty input")
        rows = [(1, seed_id, None)]
        cur = pts
        chosen = seed_id
        have_d = False
        prev_cached = None
        for step in range(2, k + 1):
            cvec = pts.filter(F.col("_id") == chosen).select(
                F.col("_v").alias("_c")
            )
            d_new = F.aggregate(
                F.zip_with("_v", "_c", lambda x, c: (x - c) * (x - c)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            cur = (
                cur.join(F.broadcast(cvec))
                .withColumn("_d", F.least("_d", d_new) if have_d else d_new)
                .drop("_c")
                .persist()
            )
            have_d = True
            top = (
                cur.orderBy(F.col("_d").desc(), F.col("_id").asc())
                .limit(1)
                .collect()[0]
            )
            if prev_cached is not None:
                prev_cached.unpersist()
            prev_cached = cur
            if float(top["_d"]) <= 0.0:
                # every point coincides with a chosen center: k exceeds
                # the number of DISTINCT points, and continuing would
                # re-select already-chosen centers forever (duplicate
                # center_id rows at radius 0). Stop with the < k rows
                # actually selected; callers see n_rows < k as the
                # "corpus has fewer distinct points than k" signal.
                break
            chosen = top["_id"]
            rows.append(
                (step, chosen, round(float(top["_d"]) ** 0.5 + 1e-9, round_dp))
            )
        if prev_cached is not None:
            # safe to release lazily: the result below is driver-local
            register_cache(prev_cached)
    finally:
        pts.unpersist()
    spark = emb.sparkSession
    return spark.createDataFrame(
        rows, "step: int, center_id: long, radius: double"
    )


def _pq_subvectors(
    emb: DataFrame,
    m: int,
    vec_col: str,
    id_col: str,
    scale: int,
) -> DataFrame:
    """(id, s, sub): each vector's m subspace slices as EXACT integer
    arrays (round(x * scale) per coordinate) — the quantization that
    makes every later centroid sum order-free, hence engine-portable."""
    iv = F.transform(
        as_double(vec_col),
        lambda x: F.round(x * scale).cast("bigint"),
    )
    base = emb.select(F.col(id_col).alias("_id"), iv.alias("_iv"))
    # fail loudly on a non-divisible dimension: size/m cast to int would
    # silently DROP the trailing coordinates of every vector (and diverge
    # from the oracle, which assumes an exact split)
    probe = base.select(F.size("_iv").alias("d")).limit(1).collect()
    if probe and probe[0]["d"] % m != 0:
        raise ValueError(
            f"_pq_subvectors: embedding dimension {probe[0]['d']} is not "
            f"divisible by m={m}; trailing coordinates would be dropped"
        )
    dim_expr = F.size("_iv") / m
    subs = F.array(
        *[
            F.struct(
                F.lit(s).alias("s"),
                F.slice(
                    F.col("_iv"),
                    (F.lit(s) * dim_expr.cast("int") + 1),
                    dim_expr.cast("int"),
                ).alias("sub"),
            )
            for s in range(m)
        ]
    )
    return base.select("_id", F.explode(subs).alias("_e")).select(
        "_id", F.col("_e.s").alias("_s"), F.col("_e.sub").alias("_sub")
    )


def _pq_assign(rows: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment per (vector, subspace): distance to the
    RATIONAL centroid (sum_j / cnt) in doubles derived from exact integer
    sums (deterministic IEEE both engines); ties -> min code.

    r12 (guide §2.4 "remove shuffles outright"): the k candidates are
    folded into ONE row per subspace (collect_list), broadcast-joined on
    the m-row key, and each vector row takes ``array_min`` over its
    (distance, code) structs in-row — min distance, ties -> min code,
    the exact semantics of the two-aggregate + self-join formulation this
    replaces (struct ordering compares _d then _c; distances are sums of
    squares, so no NaN/-0.0 cells exist to order). Per Lloyd round this
    removes BOTH groupBy exchanges and the self-join: assignment is now a
    pure map over the persisted subvector frame. The per-candidate
    distance keeps the identical IEEE op sequence (zip, per-element
    (x - sx/cnt)^2, left-to-right double fold from 0.0)."""
    packed = cents.groupBy("_s").agg(
        F.collect_list(F.struct("_c", "_sv", "_cnt")).alias("_cands")
    )
    cand = rows.join(F.broadcast(packed), "_s")
    scored = F.transform(
        "_cands",
        lambda cd: F.struct(
            F.aggregate(
                F.zip_with(
                    "_sub",
                    cd["_sv"],
                    lambda x, sx: (
                        x.cast("double") - sx.cast("double") / cd["_cnt"]
                    )
                    * (x.cast("double") - sx.cast("double") / cd["_cnt"]),
                ),
                F.lit(0.0),
                lambda acc, t: acc + t,
            ).alias("_d"),
            cd["_c"].alias("_c"),
        ),
    )
    return cand.select(
        "_id",
        "_s",
        F.array_min(scored).getField("_c").alias("_c"),
        "_sub",
    )


def _pq_update(assign: DataFrame, prev: DataFrame, dim: int) -> DataFrame:
    """New (s, c, sumvec, cnt) from an assignment; clusters that received
    no members keep their previous centroid (the deterministic
    empty-cluster convention, mirrored in the oracle)."""
    sums = assign.groupBy("_s", "_c").agg(
        F.count(F.lit(1)).cast("bigint").alias("_newcnt"),
        F.array(
            *[
                F.sum(
                    F.element_at("_sub", j + 1).cast("decimal(38,0)")
                ).alias(f"_j{j}")
                for j in range(dim)
            ]
        ).alias("_newsv"),
    )
    return (
        prev.select("_s", "_c", "_sv", "_cnt")
        .join(sums, ["_s", "_c"], "left")
        .select(
            "_s",
            "_c",
            F.coalesce("_newsv", "_sv").alias("_sv"),
            F.coalesce("_newcnt", "_cnt").alias("_cnt"),
        )
    )


def _pq_localize(cents: DataFrame) -> DataFrame:
    """Materialize the m*k-row centroid frame to the driver and rebuild it
    as a local relation — the adjudicated k-bounded-model-state pattern
    (train_centroids collects its k x dim float matrix the same way).

    r12: WITHOUT this, the Lloyd chain stays one lazy plan in which every
    reference to round t's centroids embeds round t-1's ENTIRE subtree —
    the shipped 2-round plan had 140 Exchange nodes
    (plans/r12/embed_pq_codebook_before.txt) and re-executed the chain per
    reference. Values are exact across the round-trip: the sum vectors are
    DECIMAL(38,0) (python decimal.Decimal collects and re-injects
    bit-exactly), codes/counts are integers."""
    spark = cents.sparkSession
    slim = cents.select("_s", "_c", "_sv", "_cnt")
    return spark.createDataFrame(
        [(r["_s"], r["_c"], r["_sv"], r["_cnt"]) for r in slim.collect()],
        slim.schema,
    )


def pq_train_assign(
    emb: DataFrame,
    m: int = 4,
    k: int = 4,
    iterations: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1_000_000,
) -> DataFrame:
    """Product-quantization training + encoding: split each vector into
    ``m`` subspaces, run ``iterations`` fixed Lloyd rounds of k-means
    (k codes) per subspace, then encode every vector — the embedding-
    compression primitive (a 64-dim float32 vector becomes m bytes)
    behind billion-scale ANN indexes (IVFPQ) and cheap near-dup sweeps.

    Returns the final assignment (_id, _s, _c, _sub) against the trained
    codebook. DETERMINISM CONTRACT (what makes a SQL oracle possible):
    coordinates quantize once to integers, centroids live as exact
    (integer sumvec, count) rationals — so distances are identical IEEE
    doubles in any engine — init is the k smallest ids' subvectors,
    ties break to the smallest code, empty clusters keep their previous
    centroid, and the round count is FIXED (never run-to-convergence).

    Plan shape: the subvector frame is (n*m) slim rows; each round is
    one broadcast join against the m*k centroid frame + two bounded
    aggregates; centroid frames are m*k rows throughout. No windows, no
    driver loops over data (the k seed rows come from a TakeOrdered).
    """
    from sqlitedataframe_spark.operators.util import register_cache

    if k < 1 or m < 1 or iterations < 1:
        raise ValueError("m, k, iterations must all be >= 1")
    rows = _pq_subvectors(emb, m, vec_col, id_col, scale).persist()
    # released at the harness boundary (register_cache), NOT here: the
    # returned assignment is lazy, so an immediate unpersist would make
    # every consumer re-derive the subvector frame per reference
    register_cache(rows)
    dim_row = rows.select(F.size("_sub").alias("d")).limit(1).collect()
    if not dim_row:
        raise ValueError("pq_train_assign: empty input")
    dim = dim_row[0]["d"]
    # seed: the k smallest ids' subvectors as 1-member clusters. The _s=0
    # slice carries each id exactly once, so no distinct shuffle is needed
    # (r12; TakeOrdered over n rows, same ids).
    seed_ids = [
        r["_id"]
        for r in rows.filter(F.col("_s") == 0)
        .select("_id")
        .orderBy("_id")
        .limit(k)
        .collect()
    ]
    id_to_code = F.create_map(
        *[F.lit(x) for pair in zip(seed_ids, range(k)) for x in pair]
    )
    cents = _pq_localize(
        rows.filter(F.col("_id").isin(seed_ids)).select(
            "_s",
            id_to_code[F.col("_id")].alias("_c"),
            F.transform("_sub", lambda x: x.cast("decimal(38,0)")).alias("_sv"),
            F.lit(1).cast("bigint").alias("_cnt"),
        )
    )
    for _ in range(iterations):
        assign = _pq_assign(rows, cents)
        cents = _pq_localize(_pq_update(assign, cents, dim))
    return _pq_assign(rows, cents)


def pq_codebook_stats(
    emb: DataFrame,
    m: int = 4,
    k: int = 4,
    iterations: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1_000_000,
    round_dp: int = 6,
    assign: DataFrame | None = None,
) -> DataFrame:
    """Per-(subspace, code) cluster size and within-cluster MSE after PQ
    training — the codebook-quality readout (dead codes, lopsided
    usage, residual distortion per subspace).

    MSE is computed about each FINAL cluster's own mean via the exact
    integer identity ``sum_j (C*Sxx_j - Sx_j^2) / C^2`` (all sums
    DECIMAL(38,0), one double division at the end, /scale^2 to undo the
    input quantization) — order-free, engine-portable, overflow-safe to
    ~1e12-member clusters.

    ``assign``: an already-trained final assignment (pq_train_assign
    output) to reuse — the codebook and the code-histogram queries train
    the identical model, so the suite shares one session-cached
    assignment between them (r12, the shared_doc_sigs pattern).
    """
    final = (
        assign
        if assign is not None
        else pq_train_assign(emb, m, k, iterations, vec_col, id_col, scale)
    )
    dim_row = final.select(F.size("_sub").alias("d")).limit(1).collect()
    dim = dim_row[0]["d"]
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_assigned")]
    for j in range(dim):
        xj = F.element_at("_sub", j + 1)
        aggs.append(F.sum(xj.cast("decimal(38,0)")).alias(f"_sx{j}"))
        aggs.append(
            F.sum(xj.cast("decimal(38,0)") * xj).alias(f"_sxx{j}")
        )
    g = final.groupBy("_s", "_c").agg(*aggs)
    cd = F.col("n_assigned").cast("decimal(38,0)")
    total_num = None
    for j in range(dim):
        term = cd * F.col(f"_sxx{j}") - F.col(f"_sx{j}") * F.col(f"_sx{j}")
        total_num = term if total_num is None else total_num + term
    nd = F.col("n_assigned").cast("double")
    # scale^2 folds to ONE double literal in Python so the oracle can
    # mirror the exact IEEE op sequence: num / ((n*n) * 1e12)
    scale_sq = float(scale) * float(scale)
    return g.select(
        F.col("_s").alias("subspace"),
        F.col("_c").alias("code"),
        "n_assigned",
        F.round(
            total_num.cast("double") / (nd * nd * F.lit(scale_sq)) + 1e-9,
            round_dp,
        ).alias("mse"),
    ).orderBy("subspace", "code")


def pq_code_signatures(
    emb: DataFrame,
    m: int = 4,
    k: int = 4,
    iterations: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1_000_000,
    top: int = 10,
    assign: DataFrame | None = None,
) -> DataFrame:
    """Joint PQ code-signature histogram: encode every vector to its
    m-byte code word ('c0-c1-...'), count signature usage, return the
    ``top`` most common (ties -> signature asc) — the collision-rate /
    diversity readout that says whether the codebook actually separates
    the corpus or funnels it into a few cells.

    ``assign``: reuse an already-trained final assignment (see
    pq_codebook_stats).
    """
    final = (
        assign
        if assign is not None
        else pq_train_assign(emb, m, k, iterations, vec_col, id_col, scale)
    )
    sig = (
        final.groupBy("_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_s", "_c"))),
                    lambda t: t["_c"].cast("string"),
                ),
                "-",
            ).alias("signature")
        )
        .groupBy("signature")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_vectors"))
        .orderBy(F.col("n_vectors").desc(), F.col("signature").asc())
        .limit(top)
    )
    return sig


def jl_signs(out_dim: int, in_dim: int) -> list[list[int]]:
    """Deterministic +/-1 Johnson-Lindenstrauss sign matrix: entry (i, j)
    is +1 iff the top 32 bits of md5("jl:i:j") are even. A pure function
    of the indices, so an oracle in any engine (or an inlined literal)
    replays the projection bit-for-bit — the same portability trick as
    the md5-affine MinHash signatures."""
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"jl:{i}:{j}".encode()).hexdigest()[:8], 16) % 2
            == 0
            else -1
            for j in range(in_dim)
        ]
        for i in range(out_dim)
    ]


def jl_distortion_hist(
    emb: DataFrame,
    out_dim: int = 16,
    in_dim: int = 64,
    vec_col: str = "embedding",
) -> DataFrame:
    """Norm-distortion histogram of a +/-1 Johnson-Lindenstrauss
    projection: project every embedding to ``out_dim`` dims with the
    deterministic sign matrix, compute
    ``ratio = (||y||^2 / out_dim) / ||x||^2`` (JL preserves norms — and
    hence pairwise distances — in expectation with spread ~1/sqrt(k)),
    and histogram the ratios at 0.1 width. The readout that says whether
    a 4x embedding compression is safe for the downstream ANN stage
    BEFORE re-indexing 100 TB of vectors.

    Exactness: each y_i and both squared norms are sequential
    left-to-right folds (``dot``), so the doubles are engine-identical;
    the bucket edges come after a +1e-9 nudge.

    Plan: pure scan-side map (out_dim x in_dim multiply-adds per row,
    JVM-side HOFs) + one tiny bucket aggregate — no joins, no windows.
    """
    signs = jl_signs(out_dim, in_dim)
    vd = emb.select(as_double(vec_col).alias("v"))
    ys = [
        dot(
            F.col("v"),
            F.array(*[F.lit(float(s)) for s in signs[i]]),
        ).alias(f"_y{i}")
        for i in range(out_dim)
    ]
    proj = vd.select(F.col("v"), *ys)
    ysq = None
    for i in range(out_dim):
        term = F.col(f"_y{i}") * F.col(f"_y{i}")
        ysq = term if ysq is None else ysq + term
    scored = proj.select(
        ((ysq / float(out_dim)) / dot(F.col("v"), F.col("v"))).alias("ratio")
    ).where(dot(F.col("v"), F.col("v")) > 0)
    return (
        scored.select(F.round(F.col("ratio") + 1e-9, 1).alias("ratio_bucket"))
        .groupBy("ratio_bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_vecs"))
        .orderBy("ratio_bucket")
    )


def intrinsic_dim_twonn(
    emb: DataFrame,
    max_id: int = 300,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """TwoNN intrinsic-dimension estimate (Facco et al. 2017, public) on
    a fixture-bounded sample: for each point, the ratio
    ``mu = d2 / d1`` of its second- to first-nearest-neighbor distance;
    the MLE intrinsic dimension is ``n / sum(ln mu)``. The
    embedding-geometry readout that says how aggressively PQ / JL can
    compress before neighborhoods collapse (a 64-d table with intrinsic
    dim ~9 compresses happily; ~40 does not).

    Sample is bounded by ``vec_id < max_id`` (constant work at any SF —
    the estimator needs hundreds of points, not the corpus). Squared
    distances are sequential folds; per-point NN extraction sorts the
    bounded candidate list; the final sum folds in vec_id order. One
    closed-form division at the end.

    Plan: one fixture-bounded self-join (max_id^2 slim rows), one
    collect_list per point, one 1-row reduce.
    """
    pts = emb.filter(F.col(id_col) < max_id).select(
        F.col(id_col).alias("i"), as_double(vec_col).alias("v")
    )
    b = pts.select(F.col("i").alias("j"), F.col("v").alias("w"))
    d2 = (
        pts.crossJoin(b)
        .where(F.col("i") != F.col("j"))
        .select(
            "i",
            "j",
            F.aggregate(
                F.zip_with(
                    F.col("v"), F.col("w"), lambda x, y: (x - y) * (x - y)
                ),
                F.lit(0.0),
                lambda acc, t: acc + t,
            ).alias("dsq"),
        )
    )
    nn = d2.groupBy("i").agg(
        F.slice(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("dsq").alias("dsq"), F.col("j").alias("j"))
                )
            ),
            1,
            2,
        ).alias("_nn")
    )
    mu = nn.where(F.element_at("_nn", 1)["dsq"] > 0).select(
        "i",
        (
            F.element_at("_nn", 2)["dsq"] / F.element_at("_nn", 1)["dsq"]
        ).alias("_musq"),
    )
    logs = mu.select(
        "i", (F.log(F.col("_musq")) * 0.5).alias("_lnmu")
    )
    one = logs.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("i").alias("i"), F.col("_lnmu").alias("x")))
        ).alias("_l")
    )
    total = F.aggregate("_l", F.lit(0.0), lambda a, s: a + s["x"])
    return one.select(
        F.size("_l").cast("bigint").alias("n_used"),
        F.round(total + 1e-9, 6).alias("sum_log_mu"),
        F.round(F.size("_l").cast("double") / total + 1e-9, 4).alias(
            "intrinsic_dim"
        ),
    )


def linear_cka_views(
    emb: DataFrame,
    label_col: str,
    id_col: str,
    vec_col: str,
    split_dim: int,
    unit: int = 1000,
) -> DataFrame:
    """Linear CKA (centered kernel alignment, Kornblith et al. 2019)
    between two VIEWS of an embedding table — dims 1..split_dim (X) vs
    the rest (Y) — per label group:

        CKA = ||Y^T X||_F^2 / (||X^T X||_F * ||Y^T Y||_F)

    computed feature-side (d x d cross-covariance Grams, never an
    n x n kernel), which is the only shape that scales: state is
    O(d^2) per label regardless of row count, built by one
    posexplode + self-join on the row id and a map-side-combining
    integer aggregate.

    Exactness discipline: components quantize to 1/unit-units
    scan-side (the embed_drift_cusum convention), centering subtracts
    the INTEGER-rounded per-(label, dim) mean, so every Gram entry is
    an exact BIGINT; the Frobenius accumulations square those into
    DECIMAL(38,0) — exact, order-free, identical on any engine (DuckDB
    sums HUGEINT). Callers convert the three exact sums to DOUBLE for
    the final ratio (correctly-rounded conversions + one sqrt + one
    divide).

    Returns per label: (label, n_vecs, xx, yy, xy) with xx/yy/xy
    DECIMAL(38,0) — convert before publishing (no Decimal-typed output
    cells leave a query; COVERAGE.md normalizer evidence).
    """
    q = emb.select(
        F.col(label_col).alias("label"),
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.transform(
                F.col(vec_col),
                lambda x: F.round(x.cast("double") * unit).cast("bigint"),
            )
        ).alias("dim0", "q"),
    ).select("label", "_id", (F.col("dim0") + 1).alias("dim"), "q")
    means = q.groupBy("label", "dim").agg(
        F.round(F.sum("q").cast("double") / F.count(F.lit(1)))
        .cast("bigint")
        .alias("mq")
    )
    c = q.join(F.broadcast(means), ["label", "dim"]).select(
        "label", "_id", "dim", (F.col("q") - F.col("mq")).alias("c")
    )
    gram = (
        c.alias("a")
        .join(
            c.select("_id", F.col("dim").alias("jdim"), F.col("c").alias("cj")).alias("b"),
            F.col("a._id") == F.col("b._id"),
        )
        .groupBy(
            F.col("a.label").alias("label"),
            F.col("a.dim").alias("i"),
            F.col("b.jdim").alias("j"),
        )
        .agg(F.sum(F.col("a.c") * F.col("b.cj")).alias("g"))
    )
    gd = gram.withColumn("g2", (F.col("g").cast("decimal(38,0)")
                                * F.col("g").cast("decimal(38,0)")))
    n = emb.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs")
    )
    s = F.lit(split_dim)
    sums = gd.groupBy("label").agg(
        F.sum(F.when((F.col("i") <= s) & (F.col("j") <= s), F.col("g2"))
              .otherwise(F.lit(0).cast("decimal(38,0)"))).alias("xx"),
        F.sum(F.when((F.col("i") > s) & (F.col("j") > s), F.col("g2"))
              .otherwise(F.lit(0).cast("decimal(38,0)"))).alias("yy"),
        F.sum(F.when((F.col("i") <= s) & (F.col("j") > s), F.col("g2"))
              .otherwise(F.lit(0).cast("decimal(38,0)"))).alias("xy"),
    )
    return n.join(sums, "label")
