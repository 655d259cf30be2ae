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


# --- waves 2-4 ------------------------------------------------------------


def test_skyline_keeps_undominated_and_ties(spark):
    from sqlitedataframe_spark.operators.relational import skyline_2d

    rows = [
        ("p1", 1, 100),  # skyline (best y at x=1, no higher-x beats 100)
        ("p2", 1, 90),   # dominated by p1
        ("p3", 2, 80),   # skyline
        ("p4", 3, 80),   # dominates p3? x=3>2, y equal -> p3 dominated
        ("p5", 3, 80),   # tie with p4 -> both kept
        ("p6", 4, 10),   # skyline (max x)
    ]
    df = spark.createDataFrame(rows, "k string, x long, y long")
    out = [(r["k"], r["x"], r["y"]) for r in skyline_2d(df, "k", "x", "y").collect()]
    assert out == [("p1", 1, 100), ("p4", 3, 80), ("p5", 3, 80), ("p6", 4, 10)]


def test_ktruss_keeps_clique_drops_star(spark):
    from sqlitedataframe_spark.operators.graph import ktruss_rounds

    # K4 clique (every edge in 2 triangles) + a degree-5 star hub:
    # the 4-truss keeps exactly the clique, the star dies round 1
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    star = [(100, 100 + i) for i in range(1, 6)]
    df = spark.createDataFrame(k4 + star, "src long, dst long")
    out = {r["round"]: r for r in ktruss_rounds(df, k=4, rounds=3).collect()}
    assert (out[1]["n_nodes"], out[1]["n_edges"]) == (4, 6)
    assert (out[3]["n_nodes"], out[3]["n_edges"]) == (4, 6)  # stable


def test_bfs_hops_stops_after_first_empty(spark):
    from sqlitedataframe_spark.operators.graph import bfs_hops

    # path graph 0-1-2 plus isolated edge 10-11: hub = node 1 (deg 2);
    # hop1 reaches {0,2}, hop2 empty (emitted), then stop
    df = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "src long, dst long"
    )
    out = [(r["hop"], r["n_new"]) for r in bfs_hops(df, rounds=6).collect()]
    assert out == [(0, 1), (1, 2), (2, 0)]


def test_rich_club_elite_clique(spark):
    from sqlitedataframe_spark.operators.graph import rich_club

    # 4 hubs in a clique, each hub also wired to 3 private leaves:
    # deg(hub) = 6, deg(leaf) = 1 -> at k=2 only hubs survive and their
    # subgraph is complete: phi = 1.0
    hubs = [(a, b) for a in range(4) for b in range(4) if a < b]
    leaves = [(h, 100 + 10 * h + i) for h in range(4) for i in range(3)]
    df = spark.createDataFrame(hubs + leaves, "src long, dst long")
    out = {r["k"]: r for r in rich_club(df, thresholds=(2,)).collect()}
    assert out[2]["n_nodes"] == 4 and out[2]["n_edges"] == 6
    assert out[2]["rich_club_coef"] == pytest.approx(1.0, abs=1e-9)


def test_chao1_closed_form(spark):
    from sqlitedataframe_spark.operators.text import chao1_vocab

    # tokens: a a b c -> V=3, N=4, f1=2 (b,c), f2=1 (a)
    df = spark.createDataFrame([("s", "a a b c")], "source string, text string")
    r = chao1_vocab(df).collect()[0]
    assert (r["vocab"], r["n_tokens"], r["f1"], r["f2"]) == (3, 4, 2, 1)
    assert r["chao1_est"] == pytest.approx(3 + 2 * 1 / (2 * 2), abs=1e-6)
    assert r["gt_unseen_mass"] == pytest.approx(0.5, abs=1e-9)


def test_burrows_delta_identical_and_disjoint(spark):
    from sqlitedataframe_spark.operators.text import burrows_delta

    # s1 == s2 exactly, s3 flips the token balance: Delta(s1,s2) = 0 and
    # Delta(s1,s3) > 0
    rows = [
        ("s1", "x x x y"),
        ("s2", "x x x y"),
        ("s3", "y y y x"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {(r["source_a"], r["source_b"]): r for r in burrows_delta(df, top_m=2).collect()}
    assert out[("s1", "s2")]["delta"] == 0.0
    assert out[("s1", "s3")]["delta"] > 0.5


def test_revenue_bridge_effects_sum_to_delta(spark):
    from sqlitedataframe_spark.operators.relational import revenue_bridge

    li = spark.createDataFrame(
        [
            # year 2000, brand B: 10 units @ 100.00, no discount
            (1, 1, 10.0, 100.0, 0.0, "2000-06-01"),
            # year 2001, brand B: 20 units @ 110.00
            (2, 1, 20.0, 110.0, 0.0, "2001-06-01"),
            # year 2001, brand C appears (new)
            (3, 2, 5.0, 50.0, 0.0, "2001-06-01"),
        ],
        "l_orderkey long, l_partkey long, l_quantity double, "
        "l_extendedprice double, l_discount double, _d string",
    ).withColumn("l_shipdate", F.col("_d").cast("timestamp"))
    part = spark.createDataFrame(
        [(1, "B"), (2, "C")], "p_partkey long, p_brand string"
    )
    out = {r["brand"]: r for r in revenue_bridge(li, part).collect()}
    b = out["B"]
    # unit price 10.0 -> volume = (20-10)*10 = 100? NO: revenue is the
    # extendedprice itself (TPC-H extendedprice is the line total):
    # r0=100, q0=10, p0=10; r1=110, q1=20 -> volume=(20-10)*10=100,
    # price=110-20*10=-90, delta=10
    assert b["status"] == "both" and b["rev_delta"] == pytest.approx(10.0)
    assert b["volume_effect"] == pytest.approx(100.0, abs=1e-6)
    assert b["price_effect"] == pytest.approx(-90.0, abs=1e-6)
    assert b["volume_effect"] + b["price_effect"] == pytest.approx(
        b["rev_delta"], abs=1e-6
    )
    c = out["C"]
    assert c["status"] == "new" and c["volume_effect"] == pytest.approx(50.0)
    assert c["price_effect"] == 0.0


def test_mahalanobis_flags_covariance_breaker(spark):
    from sqlitedataframe_spark.operators.profiling import mahalanobis_top

    # x and y strongly correlated for 40 keys; one key breaks the
    # correlation (normal x, absurd y) and must rank first even though
    # its per-column values are inside the marginal ranges
    rows = [(f"k{i}", float(i % 20 + 1), float((i % 20 + 1) * 10)) for i in range(40)]
    rows.append(("odd", 5.0, 195.0))
    df = spark.createDataFrame(rows, "k string, x double, y double")
    out = mahalanobis_top(
        df, "k", F.first("x"), F.first("y"), top=3
    ).collect()
    assert out[0]["k"] == "odd"


def test_double_ewma_constant_series_is_flat(spark):
    from sqlitedataframe_spark.operators.profiling import brown_double_ewma

    rows = [(f"2024-01-{d:02d} 00:00:00", 10.0) for d in range(1, 11)]
    df = spark.createDataFrame(rows, "ts string, value double").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = brown_double_ewma(df, "ts", F.sum("value"), decay=0.8).collect()
    for r in out:
        assert r["level"] == pytest.approx(10.0, abs=1e-4)
        assert r["trend"] == pytest.approx(0.0, abs=1e-4)
        assert r["forecast_next"] == pytest.approx(10.0, abs=1e-4)


def test_jl_signs_deterministic_and_balanced():
    from sqlitedataframe_spark.operators.similarity import jl_signs

    s1 = jl_signs(16, 64)
    s2 = jl_signs(16, 64)
    assert s1 == s2
    flat = [v for row in s1 for v in row]
    assert set(flat) == {-1, 1}
    # md5 bits are balanced enough that neither sign exceeds ~65%
    assert 0.35 < flat.count(1) / len(flat) < 0.65


def test_intrinsic_dim_line_is_one_dimensional(spark):
    from sqlitedataframe_spark.operators.similarity import intrinsic_dim_twonn

    # TwoNN assumes DENSITY sampling (mu = d2/d1 ~ Pareto(ID)); a
    # deterministic grid makes mu constant and the estimate 1/ln(mu),
    # not the geometric dimension. Seeded-uniform points on a 1-D line
    # embedded in 4-D -> estimate ~1.
    import random as _r

    rng = _r.Random(42)
    pts = [
        (i, [rng.random() * 100.0, 0.0, 0.0, 0.0], 0) for i in range(120)
    ]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>, label int")
    r = intrinsic_dim_twonn(df, max_id=120).collect()[0]
    assert r["n_used"] == 120
    assert 0.6 < r["intrinsic_dim"] < 1.6
