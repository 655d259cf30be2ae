"""Round-8 operator unit tests: Wasserstein, Mann-Whitney, Spearman,
k-core, PQ, URL parse/canonical, stratified reservoir, query likelihood,
char n-grams. The suite oracle gate is the primary correctness check;
these pin closed-form values, edge cases, and determinism contracts."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sqlitedataframe_spark.operators.graph import kcore_rounds
from sqlitedataframe_spark.operators.profiling import (
    mannwhitney_onevsrest,
    spearman_by_group,
    wasserstein_pairwise,
)
from sqlitedataframe_spark.operators.sampling import stratified_reservoir
from sqlitedataframe_spark.operators.similarity import (
    pq_codebook_stats,
    pq_train_assign,
)
from sqlitedataframe_spark.operators.text import (
    char_ngram_topk,
    ql_topk,
    url_canonical,
    url_features,
)


def test_wasserstein_known_value(spark):
    # A: mass at 0 and 10; B: mass at 5 -> W1 = 5 exactly
    rows = [("a", 0), ("a", 10), ("b", 5), ("b", 5)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = wasserstein_pairwise(df, "g", "v").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["grp_a"], r["grp_b"], r["n_a"], r["n_b"]) == ("a", "b", 2, 2)
    assert r["w1"] == pytest.approx(5.0, abs=1e-9)
    # identical distributions -> 0
    df2 = spark.createDataFrame(
        [("a", 1), ("a", 7), ("b", 1), ("b", 7)], "g string, v long"
    )
    assert wasserstein_pairwise(df2, "g", "v").collect()[0]["w1"] == 0.0


def test_mannwhitney_no_overlap(spark):
    # group 'hi' strictly above the rest -> U = n1*n2, rank_biserial = 1
    rows = [("hi", 100.0 + i) for i in range(10)] + [
        ("lo", 1.0 + i) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "g string, value double")
    out = {r["g"]: r for r in mannwhitney_onevsrest(df, "g", "value").collect()}
    assert out["hi"]["u_stat"] == 200.0  # 10 * 20
    assert out["hi"]["rank_biserial"] == pytest.approx(1.0, abs=1e-9)
    assert out["lo"]["rank_biserial"] == pytest.approx(-1.0, abs=1e-9)
    assert out["hi"]["z"] > 4.0


def test_spearman_perfect_monotone(spark):
    rows = [("g", i, i * i) for i in range(1, 20)]  # monotone, nonlinear
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = spearman_by_group(df, "g", "x", "y", x_bucket=8, y_bucket=64)
    r = out.collect()[0]
    assert r["spearman_rho"] == pytest.approx(1.0, abs=1e-9)
    anti = spark.createDataFrame(
        [("g", i, 100 - i) for i in range(1, 20)], "g string, x long, y long"
    )
    r2 = spearman_by_group(anti, "g", "x", "y", x_bucket=8, y_bucket=64)
    assert r2.collect()[0]["spearman_rho"] == pytest.approx(-1.0, abs=1e-9)


def test_kcore_peels_tail(spark):
    # a 4-clique (3-core) plus a pendant chain that must peel away
    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    chain = [(3, 10), (10, 11), (11, 12)]
    df = spark.createDataFrame(clique + chain, "src long, dst long")
    rows = {r["round"]: r for r in kcore_rounds(df, k=3, rounds=4).collect()}
    assert rows[4]["n_nodes"] == 4 and rows[4]["n_edges"] == 6
    assert rows[1]["n_edges"] < len(clique + chain)  # something peeled


def test_pq_assignment_deterministic_and_complete(spark):
    emb = spark.createDataFrame(
        [(i, [float((i * 7 + j * 3) % 5) for j in range(8)]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    a1 = pq_train_assign(emb, m=2, k=3)
    a2 = pq_train_assign(emb, m=2, k=3)
    r1 = sorted((r["_id"], r["_s"], r["_c"]) for r in a1.collect())
    r2 = sorted((r["_id"], r["_s"], r["_c"]) for r in a2.collect())
    assert r1 == r2  # bit-deterministic
    assert len(r1) == 40 * 2  # every vector encoded in every subspace
    stats = pq_codebook_stats(emb, m=2, k=3).collect()
    assert sum(r["n_assigned"] for r in stats) == 40 * 2
    assert all(r["mse"] >= 0 for r in stats)


def test_url_parse_and_canonical(spark):
    df = spark.createDataFrame(
        [
            ("https://www.Ex-A.example.com:443/a/b?utm_source=x&id=9&page=2#f",),
            ("http://ex-b.example.org:8080/",),
            ("https://plain.net/x",),
        ],
        ["url"],
    )
    rows = {r["host"]: r for r in url_features(df).collect()}
    a = rows["www.ex-a.example.com"]
    assert a["scheme"] == "https" and a["port"] == 443
    assert a["domain"] == "example.com" and a["path_depth"] == 2
    assert a["n_params"] == 3 and a["has_tracking"] is True
    b = rows["ex-b.example.org"]
    assert b["port"] == 8080 and b["path_depth"] == 1 and b["n_params"] == 0
    canon = [r["c"] for r in df.select(url_canonical("url").alias("c")).collect()]
    # default https port dropped, params sorted + tracking stripped, no frag
    assert "https://www.ex-a.example.com/a/b?id=9&page=2" in canon
    # explicit non-default port kept
    assert "http://ex-b.example.org:8080/" in canon


def test_stratified_reservoir_exact_and_stable(spark):
    df = spark.createDataFrame(
        [(f"s{i % 3}", i) for i in range(3000)], "p string, k long"
    )
    out = stratified_reservoir(df, ["p"], "k", k=5)
    rows = sorted((r["p"], r["reservoir_rank"], r["k"]) for r in out.collect())
    assert len(rows) == 15  # 5 per stratum
    # equals the brute-force "5 smallest md5 per stratum"
    brute = (
        df.withColumn("_h", F.md5(F.col("k").cast("string").cast("binary")))
        .withColumn(
            "_rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("p")
                .orderBy("_h", "k")
            ),
        )
        .filter(F.col("_rn") <= 5)
    )
    want = sorted((r["p"], r["_rn"], r["k"]) for r in brute.collect())
    assert rows == want


def test_ql_topk_prefers_term_dense_docs(spark):
    df = spark.createDataFrame(
        [
            (1, "spark spark join window"),
            (2, "spark other words here"),
            (3, "nothing relevant at all"),
        ],
        "doc_id long, text string",
    )
    out = ql_topk(df, ["spark", "join"], mu=10.0, k=3).collect()
    assert [r["doc_id"] for r in out][0] == 1  # densest doc wins
    assert out[0]["ql_score"] > out[-1]["ql_score"]
    # closed-form check for doc 3, term 'spark': tf=0, dl=4
    tt = 4 + 4 + 4
    cf_spark, cf_join = 3, 1
    want = math.log((0 + 10.0 * cf_spark / tt) / (4 + 10.0)) + math.log(
        (0 + 10.0 * cf_join / tt) / (4 + 10.0)
    )
    got = {r["doc_id"]: r["ql_score"] for r in out}[3]
    assert got == pytest.approx(want, abs=1e-5)


def test_char_ngram_topk_counts(spark):
    df = spark.createDataFrame(
        [("en", "ababa"), ("en", "aba"), ("fr", "xy")], "lang string, text string"
    )
    rows = char_ngram_topk(df, n=3, top=2).collect()
    en = [(r["gram"], r["n_occurrences"]) for r in rows if r["lang"] == "en"]
    assert en == [("aba", 3), ("bab", 1)]  # 'fr' doc too short -> absent
    assert all(r["lang"] == "en" for r in rows)
