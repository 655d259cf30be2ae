"""Similarity-search tests: brute-force cosine vs a NumPy oracle, LSH recall
of the exact top hit, IVF assignment.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from sqlitedataframe_spark.operators import similarity as S


@pytest.fixture(scope="module")
def vectors():
    rng = np.random.default_rng(7)
    return rng.normal(size=(50, 16)).astype("float32")


@pytest.fixture(scope="module")
def vec_df(spark, vectors):
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(vectors)]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def _np_topk(vectors, q, k):
    sims = vectors @ q / (np.linalg.norm(vectors, axis=1) * np.linalg.norm(q))
    order = sorted(range(len(sims)), key=lambda i: (-round(float(sims[i]), 6), i))
    return order[:k]


def test_brute_force_matches_numpy(spark, vec_df, vectors):
    q = vectors[0]
    qdf = vec_df.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    got = [r.vec_id for r in S.brute_force_topk(vec_df, qdf, k=5).collect()]
    assert got == _np_topk(vectors.astype("float64"), q.astype("float64"), 5)
    assert got[0] == 0  # the query matches itself first


def test_lsh_topk_recalls_self_and_reranks_exactly(spark, vec_df, vectors):
    qdf = vec_df.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    got = S.lsh_topk(vec_df, qdf, dim=16, k=5).collect()
    assert got[0].vec_id == 0 and abs(got[0].cos_sim - 1.0) < 1e-6
    # scores must be exact cosine (re-rank), descending
    sims = [r.cos_sim for r in got]
    assert sims == sorted(sims, reverse=True)


def test_dot_and_norm(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], ["a", "b"])
    r = df.select(
        S.dot(F.col("a"), F.col("b")).alias("d"),
        S.norm(F.col("a")).alias("n"),
        S.cosine(F.col("a"), F.col("a")).alias("c"),
    ).collect()[0]
    assert r.d == 32.0
    assert abs(r.n - 14**0.5) < 1e-12
    assert abs(r.c - 1.0) < 1e-12


def test_ivf_topk_recalls_self(spark, vec_df, vectors):
    cents = [[float(x) for x in vectors[i]] for i in range(4)]
    qdf = vec_df.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    got = S.ivf_topk(vec_df, qdf, cents, k=3, n_probe=2).collect()
    assert got[0].vec_id == 0 and abs(got[0].cos_sim - 1.0) < 1e-6
    sims = [r.cos_sim for r in got]
    assert sims == sorted(sims, reverse=True)


def test_train_centroids_separates_clusters(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    a = rng.normal(loc=0.0, scale=0.1, size=(40, 4))
    b = rng.normal(loc=5.0, scale=0.1, size=(40, 4))
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(list(a) + list(b))]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = S.train_centroids(df, k=2, iters=4)
    means = sorted(sum(c) / len(c) for c in cents)
    assert abs(means[0] - 0.0) < 0.5 and abs(means[1] - 5.0) < 0.5
    # downstream assignment splits the corpus cleanly
    counts = {
        r.ivf_cell: r.n
        for r in S.ivf_assign(df, cents).groupBy("ivf_cell").agg(F.count("*").alias("n")).collect()
    }
    assert sorted(counts.values()) == [40, 40]


def test_ivf_assign(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 10.0]), (2, [0.5, 0.0])], ["vec_id", "embedding"]
    )
    cents = [[0.0, 0.0], [10.0, 10.0]]
    got = {r.vec_id: r.ivf_cell for r in S.ivf_assign(df, cents).collect()}
    assert got == {0: 0, 1: 1, 2: 0}


def test_label_centroids_small(spark):
    from pyspark.sql import Row

    from sqlitedataframe_spark.operators.similarity import label_centroids

    df = spark.createDataFrame(
        [
            Row(label=0, embedding=[1.0, 2.0]),
            Row(label=0, embedding=[3.0, 6.0]),
            Row(label=1, embedding=[10.0, 0.0]),
        ]
    )
    got = {(r.label, r.pos): r.centroid for r in label_centroids(df).collect()}
    assert got == {(0, 1): 2.0, (0, 2): 4.0, (1, 1): 10.0, (1, 2): 0.0}


def test_knn_join_lsh_finds_planted_neighbor(spark):
    """A vector and its tiny perturbation must be each other's top-1
    neighbor; every input id must appear in the output (null neighbor
    rather than a dropped row)."""
    import random

    from pyspark.sql import functions as F

    from sqlitedataframe_spark.operators.similarity import knn_join_lsh

    rng = random.Random(5)
    base = [rng.gauss(0, 1) for _ in range(64)]
    near = [x + 0.001 for x in base]
    far1 = [rng.gauss(0, 1) for _ in range(64)]
    far2 = [rng.gauss(0, 1) for _ in range(64)]
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, far1), (3, far2)],
        "vec_id long, embedding array<double>",
    )
    out = {r.vec_id: r for r in knn_join_lsh(df, dim=64, k=1).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert out[0].nn_id == 1 and out[1].nn_id == 0
    assert out[0].cos_sim > 0.999
