"""Tests for the round-2 pipeline operators: deterministic sampling,
TF-IDF, connected components, and the bucketed interval join."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sqlitedataframe_spark.operators import sampling as SM
from sqlitedataframe_spark.operators import text as X
from sqlitedataframe_spark.operators.graph import connected_components
from sqlitedataframe_spark.operators.relational import interval_join


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------
def test_hex_threshold_values():
    assert SM.hex_threshold(0.0) == "0000"
    assert SM.hex_threshold(0.5) == "8000"
    # 1.0 sorts above every hex string so a 100% sample keeps ffff-keys too
    assert SM.hex_threshold(1.0) == "g000"
    with pytest.raises(ValueError):
        SM.hex_threshold(1.5)


def test_sample_by_hash_stable_under_repartition(spark):
    df = spark.range(2000)
    a = {r.id for r in SM.sample_by_hash(df, "id", 0.2).collect()}
    b = {r.id for r in SM.sample_by_hash(df.repartition(7), "id", 0.2).collect()}
    assert a == b  # decision depends on the key only, never on partitioning
    assert 0.15 < len(a) / 2000 < 0.25


def test_split_assign_disjoint_exhaustive(spark):
    df = spark.range(3000).select(
        "id", SM.split_assign("id", {"train": 0.8, "valid": 0.1, "test": 0.1}).alias("s")
    )
    counts = {r.s: r["count"] for r in df.groupBy("s").count().collect()}
    assert set(counts) == {"train", "valid", "test"}
    assert sum(counts.values()) == 3000  # exhaustive, disjoint by construction
    assert counts["train"] > 2200
    with pytest.raises(ValueError):
        SM.split_assign("id", {"a": 0.5, "b": 0.2})


def test_stratified_sample_rates(spark):
    rows = [Row(k=i, g="big" if i % 2 else "small") for i in range(4000)]
    df = spark.createDataFrame(rows)
    out = SM.stratified_sample(df, "k", "g", {"big": 0.5, "small": 0.05})
    counts = {r.g: r["count"] for r in out.groupBy("g").count().collect()}
    assert 800 < counts["big"] < 1200
    assert 40 < counts["small"] < 180
    # strata not listed are dropped entirely
    out2 = SM.stratified_sample(df, "k", "g", {"big": 1.0})
    assert out2.filter(F.col("g") == "small").count() == 0


# ---------------------------------------------------------------------------
# TF-IDF
# ---------------------------------------------------------------------------
def test_tfidf_topk_small_corpus(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="apple apple banana"),
            Row(doc_id=2, text="apple cherry cherry cherry"),
            Row(doc_id=3, text="durian"),
        ]
    )
    out = {
        (r.doc_id, r.rank): r
        for r in X.tfidf_topk(docs, k=2).collect()
    }
    # doc 1: apple tf=2 (df=2), banana tf=1 (df=1) -> apple ranks first on tf
    assert out[(1, 1)].term == "apple" and out[(1, 1)].tf == 2
    assert out[(1, 2)].term == "banana"
    # doc 2: cherry tf=3 beats apple tf=1
    assert out[(2, 1)].term == "cherry" and out[(2, 1)].df == 1
    # doc 3: single rare term, idf = ln(3/1)
    r3 = out[(3, 1)]
    assert r3.term == "durian"
    assert abs(r3.tfidf - round(1 * 1.0986123, 6)) < 1e-5
    # k bound respected
    assert all(rank <= 2 for (_, rank) in out)


def test_tfidf_tie_break_deterministic(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="zzz aaa")] )
    out = X.tfidf_topk(docs, k=2).orderBy("rank").collect()
    # equal tf and df: term ASC breaks the tie
    assert [r.term for r in out] == ["aaa", "zzz"]


# ---------------------------------------------------------------------------
# connected components
# ---------------------------------------------------------------------------
def test_connected_components_chain_and_isolates(spark):
    # chain 1-2-3-4-5, pair 10-11, isolate 20
    edges = spark.createDataFrame(
        [Row(src=1, dst=2), Row(src=2, dst=3), Row(src=3, dst=4),
         Row(src=4, dst=5), Row(src=11, dst=10)]
    )
    nodes = spark.createDataFrame([Row(node=i) for i in [1, 2, 3, 4, 5, 10, 11, 20]])
    got = {
        r.node: r.comp for r in connected_components(edges, nodes=nodes).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 20: 20}


def test_connected_components_defaults_nodes_from_edges(spark):
    edges = spark.createDataFrame([Row(src=7, dst=3), Row(src=3, dst=9)])
    got = {r.node: r.comp for r in connected_components(edges).collect()}
    assert got == {3: 3, 7: 3, 9: 3}


def test_connected_components_long_chain_converges(spark):
    # 64-node chain: min-propagation alone would need 63 rounds; pointer
    # jumping must land it well inside max_iter=25.
    edges = spark.createDataFrame([Row(src=i, dst=i + 1) for i in range(63)])
    got = connected_components(edges)
    assert got.filter(F.col("comp") != 0).count() == 0
    assert got.count() == 64


# ---------------------------------------------------------------------------
# interval join
# ---------------------------------------------------------------------------
def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_interval_join_matches_naive(spark):
    clicks = spark.createDataFrame(
        [
            Row(click_id=1, user_id=1, click_ts=_ts("2024-01-01 10:00:01")),
            Row(click_id=2, user_id=1, click_ts=_ts("2024-01-01 10:29:59")),
            Row(click_id=3, user_id=1, click_ts=_ts("2024-01-01 10:00:00")),  # = lo, excluded
            Row(click_id=4, user_id=2, click_ts=_ts("2024-01-01 10:00:00")),  # other user
            Row(click_id=5, user_id=1, click_ts=_ts("2024-01-01 10:30:00")),  # = ts, included
        ]
    )
    purchases = spark.createDataFrame(
        [Row(purchase_id=100, user_id=1, purchase_ts=_ts("2024-01-01 10:30:00"))]
    )
    got = sorted(
        r.click_id
        for r in interval_join(
            clicks, purchases, "user_id", "click_ts", "purchase_ts", 1800
        ).collect()
    )
    assert got == [1, 2, 5]


def test_interval_join_crosses_bucket_boundary(spark):
    # click at 09:59:59 and purchase at 10:14:59: different 900s buckets —
    # the bucket-minus-one replica must still find the pair.
    clicks = spark.createDataFrame(
        [Row(click_id=1, user_id=1, click_ts=_ts("2024-01-01 09:59:59"))]
    )
    purchases = spark.createDataFrame(
        [Row(purchase_id=2, user_id=1, purchase_ts=_ts("2024-01-01 10:14:58"))]
    )
    out = interval_join(clicks, purchases, "user_id", "click_ts", "purchase_ts", 900)
    assert out.count() == 1


def test_interval_join_no_nested_loop(spark):
    from sqlitedataframe_spark.plans import explain_text

    clicks = spark.createDataFrame(
        [Row(click_id=1, user_id=1, click_ts=_ts("2024-01-01 10:00:00"))]
    )
    purchases = spark.createDataFrame(
        [Row(purchase_id=2, user_id=1, purchase_ts=_ts("2024-01-01 10:10:00"))]
    )
    plan = explain_text(
        interval_join(clicks, purchases, "user_id", "click_ts", "purchase_ts", 1800)
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan


# ---------------------------------------------------------------------------
# merge_into
# ---------------------------------------------------------------------------
def test_merge_into_upsert_insert_delete(spark):
    from sqlitedataframe_spark.operators.relational import merge_into

    base = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")]
    )
    updates = spark.createDataFrame(
        [
            Row(k=2, v="B", is_del=False),   # update
            Row(k=4, v="d", is_del=False),   # insert
            Row(k=3, v=None, is_del=True),   # delete
        ]
    )
    got = {r.k: r.v for r in merge_into(base, updates, ["k"], "is_del").collect()}
    assert got == {1: "a", 2: "B", 4: "d"}


def test_merge_into_without_delete_col(spark):
    from sqlitedataframe_spark.operators.relational import merge_into

    base = spark.createDataFrame([Row(k=1, v="a")])
    updates = spark.createDataFrame([Row(k=1, v="A"), Row(k=9, v="z")])
    got = {r.k: r.v for r in merge_into(base, updates, ["k"]).collect()}
    assert got == {1: "A", 9: "z"}


def test_merge_into_validates_columns(spark):
    from sqlitedataframe_spark.operators.relational import merge_into

    base = spark.createDataFrame([Row(k=1, v="a")])
    with pytest.raises(ValueError):
        merge_into(base, spark.createDataFrame([Row(k=1)]), ["k"])
    with pytest.raises(ValueError):
        merge_into(base, spark.createDataFrame([Row(k=1, v="x")]), ["k"], "nope")


# ---------------------------------------------------------------------------
# profiling
# ---------------------------------------------------------------------------
def test_profile_stats(spark):
    from sqlitedataframe_spark.operators.profiling import profile

    df = spark.createDataFrame(
        [Row(a=1, b="x"), Row(a=2, b=None), Row(a=2, b="y")]
    )
    got = {r.column: r for r in profile(df).collect()}
    assert got["a"].n_rows == 3 and got["a"].n_nulls == 0
    assert got["a"].n_distinct == 2
    assert got["a"].min_d == 1.0 and got["a"].max_d == 2.0
    assert got["a"].min_s is None
    assert got["b"].n_nulls == 1 and got["b"].n_distinct == 2
    assert got["b"].min_s == "x" and got["b"].max_s == "y"
    assert got["b"].min_d is None


def test_profile_approx_mode(spark):
    from sqlitedataframe_spark.operators.profiling import profile

    df = spark.range(1000).select(F.col("id").alias("a"))
    (row,) = profile(df, exact=False).collect()
    assert abs(row.n_distinct - 1000) < 100  # HLL estimate


# ---------------------------------------------------------------------------
# chunking + packing
# ---------------------------------------------------------------------------
def test_chunk_text_overlap_and_tail(spark):
    from sqlitedataframe_spark.operators.text import chunk_text

    # 10 tokens, chunks of 4, overlap 2 (stride 2): starts 0,2,4,6 -> but
    # stop = ceil((10-4)/2)*2 = 6 -> chunks at 0,2,4,6
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")]
    )
    out = chunk_text(docs, chunk_tokens=4, overlap=2).orderBy("chunk_id").collect()
    assert [r.chunk_id for r in out] == [0, 1, 2, 3]
    assert out[0].chunk_text == "t0 t1 t2 t3"
    assert out[1].chunk_text == "t2 t3 t4 t5"
    assert out[3].chunk_text == "t6 t7 t8 t9"
    assert all(r.n_tokens == 4 for r in out)


def test_chunk_text_short_doc_single_chunk(spark):
    from sqlitedataframe_spark.operators.text import chunk_text

    docs = spark.createDataFrame([Row(doc_id=1, text="a b")])
    out = chunk_text(docs, chunk_tokens=64, overlap=16).collect()
    assert len(out) == 1 and out[0].n_tokens == 2 and out[0].chunk_text == "a b"


def test_chunk_text_validates(spark):
    from sqlitedataframe_spark.operators.text import chunk_text

    docs = spark.createDataFrame([Row(doc_id=1, text="a")])
    with pytest.raises(ValueError):
        chunk_text(docs, chunk_tokens=4, overlap=4)


def test_pack_sequential_bins(spark):
    from sqlitedataframe_spark.operators.text import pack_sequential

    df = spark.createDataFrame(
        [Row(i=1, n=600, s=0), Row(i=2, n=600, s=0), Row(i=3, n=600, s=0),
         Row(i=4, n=600, s=0), Row(i=5, n=10, s=1)]
    )
    got = {r.i: r.bin for r in pack_sequential(df, "n", "s", "i", 1000).collect()}
    # cumulative-before: 0, 600, 1200, 1800 -> bins 0, 0, 1, 1; shard 1 restarts
    assert got == {1: 0, 2: 0, 3: 1, 4: 1, 5: 0}


# ---------------------------------------------------------------------------
# as-of join tolerance
# ---------------------------------------------------------------------------
def test_asof_join_tolerance(spark):
    from sqlitedataframe_spark.operators.relational import asof_join

    left = spark.createDataFrame(
        [
            Row(k=1, lt=_ts("2024-01-01 10:00:00"), lv="near"),
            Row(k=1, lt=_ts("2024-01-01 12:00:00"), lv="far"),
        ]
    )
    right = spark.createDataFrame(
        [Row(k=1, rt=_ts("2024-01-01 09:59:00"), rv="quote")]
    )
    out = {
        r.lv: r.rv
        for r in asof_join(
            left, right, "k", "lt", "rt", tolerance_seconds=600
        ).collect()
    }
    # 10:00 is 60s after the quote (within 600s); 12:00 is 2h after (voided)
    assert out == {"near": "quote", "far": None}


def test_asof_join_no_tolerance_unchanged(spark):
    from sqlitedataframe_spark.operators.relational import asof_join

    left = spark.createDataFrame([Row(k=1, lt=_ts("2024-01-01 12:00:00"), lv="x")])
    right = spark.createDataFrame([Row(k=1, rt=_ts("2024-01-01 09:00:00"), rv="q")])
    (row,) = asof_join(left, right, "k", "lt", "rt").collect()
    assert row.rv == "q"


def test_sample_fraction_one_keeps_every_row(spark):
    # a 100% sample must not lose the ~1/65536 keys whose md5 prefix is ffff
    assert SM.hex_threshold(1.0) == "g000"
    df = spark.range(100000)
    assert SM.sample_by_hash(df, "id", 1.0).count() == 100000
    out = SM.stratified_sample(
        df.withColumn("g", F.lit("all")), "id", "g", {"all": 1.0}
    )
    assert out.count() == 100000


# ---------------------------------------------------------------------------
# round-2b: per-class cap + int8 quantization
# ---------------------------------------------------------------------------
def test_cap_per_class_caps_and_is_stable(spark):
    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("cls")
    )
    capped = SM.cap_per_class(df, ["cls"], "k", 10)
    counts = {r["cls"]: r["n"] for r in
              capped.groupBy("cls").agg(F.count("*").alias("n")).collect()}
    assert all(v == 10 for v in counts.values())
    # deterministic: same rows under a different partitioning
    again = SM.cap_per_class(df.repartition(7), ["cls"], "k", 10)
    assert sorted(r["k"] for r in capped.collect()) == sorted(
        r["k"] for r in again.collect()
    )
    with pytest.raises(ValueError):
        SM.cap_per_class(df, ["cls"], "k", 0)


def test_quantize_int8_bounds_and_reconstruction(spark):
    from sqlitedataframe_spark.operators.similarity import quantize_int8

    rows = [
        Row(vec_id=0, embedding=[1.0, -2.0, 0.5, 127.5]),
        Row(vec_id=1, embedding=[0.0, 0.0, 0.0, 0.0]),  # zero vector
    ]
    out = quantize_int8(spark.createDataFrame(rows)).collect()
    by_id = {r["vec_id"]: r for r in out}
    q0, s0 = by_id[0]["q"], by_id[0]["q_scale"]
    assert max(abs(v) for v in q0) == 127  # max element hits full range
    # reconstruction error bounded by scale/2 per element
    for orig, qv in zip(rows[0].embedding, q0):
        assert abs(orig - qv * s0) <= s0 / 2 + 1e-12
    assert by_id[1]["q"] == [0, 0, 0, 0] and by_id[1]["q_scale"] == 0.0


def test_cap_per_class_approx_bounds_and_determinism(spark):
    df = spark.range(3000).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("cls")
    )
    capped = SM.cap_per_class_approx(df, ["cls"], "k", 100)
    counts = {r["cls"]: r["n"] for r in
              capped.groupBy("cls").agg(F.count("*").alias("n")).collect()}
    # binomial around the cap: within ~4*sqrt(100) of target
    assert all(60 <= v <= 140 for v in counts.values()), counts
    # classes at/under the cap keep everything
    small = spark.range(50).select(F.col("id").alias("k"), F.lit(0).alias("cls"))
    assert SM.cap_per_class_approx(small, ["cls"], "k", 100).count() == 50
    # deterministic under repartitioning
    again = SM.cap_per_class_approx(df.repartition(11), ["cls"], "k", 100)
    assert sorted(r["k"] for r in capped.collect()) == sorted(
        r["k"] for r in again.collect()
    )
