"""Unit tests for the round-4b operators: substring-span dedup, corpus
n-gram top-k, SCD2 history, MAD outliers."""

from __future__ import annotations

from pyspark.sql import functions as F

from sqlitedataframe_spark.operators.dedup import substring_span_stats
from sqlitedataframe_spark.operators.profiling import mad_outliers
from sqlitedataframe_spark.operators.relational import scd2_history
from sqlitedataframe_spark.operators.text import frequent_ngrams


# ---------------------------------------------------------------------------
# substring_span_stats
# ---------------------------------------------------------------------------
def test_substring_spans_finds_planted_duplicate(spark):
    shared = "x" * 12 + "the quick brown fox jumps over it" + "y" * 12
    docs = spark.createDataFrame(
        [
            (1, shared + " unique tail one"),
            (2, "different head text " + shared),
            (3, "no overlap with anything here at all, promise!"),
        ],
        "doc_id long, text string",
    )
    out = substring_span_stats(docs, k=20, stride=1, min_docs=2)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2}
    # both sharers report at least one duplicated window
    assert rows[1]["n_dup_spans"] >= 1 and rows[2]["n_dup_spans"] >= 1
    # doc 1's shared region starts at its head; doc 2's after its unique head
    assert rows[1]["first_pos"] < rows[2]["first_pos"]


def test_substring_spans_short_docs_drop_out(spark):
    docs = spark.createDataFrame(
        [(1, "tiny"), (2, "tiny")], "doc_id long, text string"
    )
    assert substring_span_stats(docs, k=30, stride=10).count() == 0


# ---------------------------------------------------------------------------
# frequent_ngrams
# ---------------------------------------------------------------------------
def test_frequent_ngrams_counts_and_tiebreak(spark):
    docs = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "a b c d"), (3, "z z")],
        "doc_id long, text string",
    )
    out = frequent_ngrams(docs, n=3, k=3).collect()
    # "a b c" occurs 3x (twice in doc1 via overlap? no: positions 1 and 4 -> 2x, once in doc2 -> 3)
    assert out[0]["gram"] == "a b c" and out[0]["n"] == 3
    # remaining grams all count 1; ties must come back in lexicographic order
    rest = [r["gram"] for r in out[1:]]
    assert rest == sorted(rest)
    # doc 3 (2 tokens) contributes no trigram
    all_grams = [r["gram"] for r in frequent_ngrams(docs, n=3, k=100).collect()]
    assert not any("z" in g for g in all_grams)


# ---------------------------------------------------------------------------
# scd2_history
# ---------------------------------------------------------------------------
def test_scd2_collapses_unchanged_and_versions(spark):
    rows = [
        # key 1: A, A, B, A  -> versions A, B, A (middle A collapses)
        (1, 10, "A"),
        (1, 20, "A"),
        (1, 30, "B"),
        (1, 40, "A"),
        # key 2: constant -> single current row
        (2, 10, "C"),
        (2, 20, "C"),
    ]
    df = spark.createDataFrame(rows, "k long, t long, attr string")
    out = scd2_history(
        df, key_cols=["k"], order_col="t", attr_cols=["attr"], tiebreak_col="t"
    )
    k1 = [r.asDict() for r in out.filter("k = 1").orderBy("version").collect()]
    assert [(r["attr"], r["valid_from"], r["valid_to"]) for r in k1] == [
        ("A", 10, 30),
        ("B", 30, 40),
        ("A", 40, None),
    ]
    assert [r["is_current"] for r in k1] == [False, False, True]
    k2 = out.filter("k = 2").collect()
    assert len(k2) == 1 and k2[0]["is_current"] and k2[0]["valid_from"] == 10


def test_scd2_null_attr_is_a_state(spark):
    # NULL -> NULL is "unchanged" (null-safe compare); NULL -> value is a change
    df = spark.createDataFrame(
        [(1, 10, None), (1, 20, None), (1, 30, "X")], "k long, t long, attr string"
    )
    out = scd2_history(df, ["k"], "t", ["attr"], tiebreak_col="t")
    got = [(r["attr"], r["version"]) for r in out.orderBy("version").collect()]
    assert got == [(None, 1), ("X", 2)]


# ---------------------------------------------------------------------------
# mad_outliers
# ---------------------------------------------------------------------------
def test_mad_flags_only_the_outlier(spark):
    vals = [(i, "g", float(v)) for i, v in enumerate([10, 11, 12, 13, 14, 1000])]
    df = spark.createDataFrame(vals, "id long, grp string, v double")
    out = mad_outliers(df, "grp", "v", ["id"], thresh=5.0).collect()
    assert [r["id"] for r in out] == [5]
    # median 12.5, MAD 1.5 -> score (1000-12.5)/1.5
    assert abs(out[0]["mad_score"] - round((1000 - 12.5) / 1.5, 4)) < 1e-9


def test_mad_zero_flags_any_deviation_with_null_score(spark):
    df = spark.createDataFrame(
        [(i, "g", 5.0) for i in range(6)] + [(9, "g", 5.1)],
        "id long, grp string, v double",
    )
    out = mad_outliers(df, "grp", "v", ["id"], thresh=5.0).collect()
    assert [r["id"] for r in out] == [9]
    assert out[0]["mad_score"] is None


def test_mad_approx_mode_runs(spark):
    df = spark.createDataFrame(
        [(i, "g", float(i)) for i in range(20)] + [(99, "g", 1e6)],
        "id long, grp string, v double",
    )
    out = mad_outliers(df, "grp", "v", ["id"], thresh=5.0, exact=False).collect()
    assert any(r["id"] == 99 for r in out)


# ---------------------------------------------------------------------------
# duplicate_span_coverage
# ---------------------------------------------------------------------------
def test_span_coverage_merges_overlapping_windows(spark):
    shared = "abcdefghij" * 6  # 60 chars shared by docs 1 and 2
    docs = spark.createDataFrame(
        [
            (1, shared + "UNIQUE-TAIL-ONE-" + "q" * 30),
            (2, shared + "other tail entirely different!!"),
            (3, "t" * 80),
        ],
        "doc_id long, text string",
    )
    from sqlitedataframe_spark.operators.dedup import duplicate_span_coverage

    out = {
        r["doc_id"]: r
        for r in duplicate_span_coverage(
            docs, k=20, stride=10, min_docs=2
        ).collect()
    }
    # windows at pos 1,11,21,31,41 of the shared 60-char prefix collide
    # (pos 41 spans chars 41-60, inside the shared region for both docs);
    # they overlap, so they must union into ONE island covering chars 1-60
    # doc3's windows repeat only WITHIN itself; min_docs=2 counts distinct
    # documents per digest, so self-repeats alone never flag
    assert 1 in out and 2 in out and 3 not in out
    assert out[1]["n_islands"] == 1
    assert out[1]["n_dup_chars"] == 60
    assert abs(out[1]["dup_ratio"] - round(60 / len(shared + "UNIQUE-TAIL-ONE-" + "q" * 30), 4)) < 1e-6


def test_span_coverage_counts_disjoint_islands(spark):
    blockA = "A" * 25
    blockB = "B" * 25
    gap1 = "x1y2z3u4v5w6p7q8r9s0t1a2b"  # 25 unique chars
    gap2 = "m1n2o3j4k5l6g7h8i9d0e1f2c"
    docs = spark.createDataFrame(
        [
            (1, blockA + gap1 + blockB),
            (2, blockA + gap2 + blockB),
        ],
        "doc_id long, text string",
    )
    from sqlitedataframe_spark.operators.dedup import duplicate_span_coverage

    out = {
        r["doc_id"]: r
        for r in duplicate_span_coverage(docs, k=20, stride=5, min_docs=2).collect()
    }
    # the shared A-block and B-block are separated by 25 unique chars:
    # two disjoint islands per doc
    assert out[1]["n_islands"] == 2
    assert out[2]["n_islands"] == 2


# ---------------------------------------------------------------------------
# sample_split_by_group: the leakage property
# ---------------------------------------------------------------------------
def test_group_split_never_straddles(spark, sf_dir):
    from pyspark.sql import functions as F2

    from sqlitedataframe_spark.io import load_table
    from sqlitedataframe_spark.operators.sampling import split_assign

    d = load_table(spark, sf_dir, "documents").withColumn(
        "split",
        split_assign(F2.col("source"), {"train": 0.8, "val": 0.1, "test": 0.1}),
    )
    straddlers = (
        d.groupBy("source")
        .agg(F2.count_distinct("split").alias("n"))
        .filter(F2.col("n") > 1)
        .count()
    )
    assert straddlers == 0


# ---------------------------------------------------------------------------
# label_centroid_outliers
# ---------------------------------------------------------------------------
def test_label_outliers_flags_planted_flip(spark):
    from sqlitedataframe_spark.operators.similarity import label_centroid_outliers

    # label 0 clusters near +x, label 1 near +y; vec 99 is a label-0 row
    # sitting in label-1 territory -> must rank as label 0's worst outlier
    rows = (
        [(i, 0, [1.0, 0.05 * i, 0.0]) for i in range(5)]
        + [(10 + i, 1, [0.05 * i, 1.0, 0.0]) for i in range(5)]
        + [(99, 0, [0.0, 1.0, 0.0])]
    )
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )
    out = label_centroid_outliers(df, per_label=1).collect()
    worst = {r["label"]: r for r in out}
    assert worst[0]["vec_id"] == 99
    # the planted flip is far from its centroid; genuine members are close
    assert worst[0]["cos_to_centroid"] < 0.7
    assert worst[1]["cos_to_centroid"] > 0.7


def test_label_outliers_rank_is_dense_and_bounded(spark):
    from sqlitedataframe_spark.operators.similarity import label_centroid_outliers

    rows = [(i, i % 3, [float(i % 7), 1.0, float(i % 5)]) for i in range(30)]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )
    out = label_centroid_outliers(df, per_label=4).collect()
    by_label = {}
    for r in out:
        by_label.setdefault(r["label"], []).append(r["rank_in_label"])
    for label, ranks in by_label.items():
        assert sorted(ranks) == list(range(1, 5)), (label, ranks)


# ---------------------------------------------------------------------------
# bpe_pair_counts
# ---------------------------------------------------------------------------
def test_bpe_pairs_counts_within_words_only(spark):
    from sqlitedataframe_spark.operators.text import bpe_pair_counts

    docs = spark.createDataFrame(
        [(1, "ab ab abc"), (2, "xy")], "doc_id long, text string"
    )
    out = {r["pair"]: r["n"] for r in bpe_pair_counts(docs, k=10).collect()}
    # "ab" appears in all three words of doc1 -> 3; "bc" once; "xy" once
    assert out == {"ab": 3, "bc": 1, "xy": 1}
    # no pair spans the space ("b a" must not exist)
    assert "b a" not in out


def test_bpe_pairs_single_char_words_contribute_nothing(spark):
    from sqlitedataframe_spark.operators.text import bpe_pair_counts

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    assert bpe_pair_counts(docs, k=10).count() == 0


# ---------------------------------------------------------------------------
# knn_join_lsh(label_col=...): hard-negative mining
# ---------------------------------------------------------------------------
def test_hard_negatives_are_cross_label_only(spark):
    from sqlitedataframe_spark.operators.similarity import knn_join_lsh

    # two tight clusters; labels split WITHIN each cluster so every vector
    # has a same-bucket cross-label neighbor
    rows = []
    for i in range(8):
        rows.append((i, i % 2, [1.0 + 0.01 * i, 0.0, 0.0, 0.0]))
    for i in range(8, 16):
        rows.append((i, i % 2, [0.0, 1.0 + 0.01 * i, 0.0, 0.0]))
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )
    out = knn_join_lsh(
        df, dim=4, k=1, n_planes=8, bands=4, label_col="label"
    ).collect()
    assert len(out) == 16  # every vector reports (null row if no candidate)
    for r in out:
        if r["nn_id"] is not None:
            assert r["nn_label"] != r["label"], r
            # nearest cross-label neighbor lives in the SAME cluster
            same_cluster = (r["vec_id"] < 8) == (r["nn_id"] < 8)
            assert same_cluster, r


def test_knn_join_default_schema_unchanged(spark):
    from sqlitedataframe_spark.operators.similarity import knn_join_lsh

    df = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0, 0.0]) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    out = knn_join_lsh(df, dim=4, k=1, n_planes=8, bands=4)
    assert out.columns == ["vec_id", "nn_id", "cos_sim", "rank"]


# ---------------------------------------------------------------------------
# containment_pairs
# ---------------------------------------------------------------------------
def test_containment_detects_excerpt_asymmetrically(spark):
    from sqlitedataframe_spark.operators.dedup import containment_pairs

    big = " ".join(f"w{i}" for i in range(40))
    excerpt = " ".join(f"w{i}" for i in range(10, 20))  # 10 of big's words
    other = " ".join(f"z{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, big), (2, excerpt), (3, other)], "doc_id long, text string"
    )
    out = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(
            docs, n=4, max_df=10, min_containment=0.1
        ).collect()
    }
    # excerpt-in-big: all 7 of the excerpt's 4-grams appear in big -> 1.0
    assert out[(2, 1)] == 1.0
    # big-in-excerpt: only 7 of big's 37 4-grams are covered -> low
    assert out[(1, 2)] < 0.25
    # unrelated doc pairs with nothing shared never appear
    assert (3, 1) not in out and (1, 3) not in out


def test_containment_df_cap_suppresses_universal_grams(spark):
    from sqlitedataframe_spark.operators.dedup import containment_pairs

    # the same gram in every doc: with max_df=2 it can't block any pair
    docs = spark.createDataFrame(
        [(i, "common gram shared everywhere") for i in range(1, 5)],
        "doc_id long, text string",
    )
    assert containment_pairs(docs, n=4, max_df=2, min_containment=0.1).count() == 0


# ---------------------------------------------------------------------------
# psi_drift
# ---------------------------------------------------------------------------
def test_psi_near_zero_for_identical_distributions(spark):
    from sqlitedataframe_spark.operators.profiling import psi_drift

    rows = [("g", float(v % 50)) for v in range(200)]
    ref = spark.createDataFrame(rows, "grp string, v double")
    out = psi_drift(ref, ref, "grp", "v", bin_width=5.0, n_bins=10).collect()
    assert len(out) == 1 and abs(out[0]["psi"]) < 1e-6


def test_psi_large_for_shifted_distribution(spark):
    from sqlitedataframe_spark.operators.profiling import psi_drift

    ref = spark.createDataFrame(
        [("g", float(v % 20)) for v in range(200)], "grp string, v double"
    )
    cur = spark.createDataFrame(
        [("g", 30.0 + float(v % 20)) for v in range(200)], "grp string, v double"
    )
    out = psi_drift(ref, cur, "grp", "v", bin_width=5.0, n_bins=10).collect()
    assert out[0]["psi"] > 0.25  # "act" territory for a full shift


def test_psi_one_sided_group_still_reports(spark):
    from sqlitedataframe_spark.operators.profiling import psi_drift

    ref = spark.createDataFrame([("a", 1.0), ("b", 1.0)], "grp string, v double")
    cur = spark.createDataFrame([("a", 1.0)], "grp string, v double")
    got = {r["grp"]: r["psi"] for r in psi_drift(ref, cur, "grp", "v", 1.0, 5).collect()}
    assert set(got) == {"a", "b"}
    assert got["b"] > 0  # vanished group drifts by definition


# ---------------------------------------------------------------------------
# mining: top_paths / cooccurrence_pairs
# ---------------------------------------------------------------------------
def test_top_paths_respects_session_boundaries(spark):
    import datetime as dt

    from sqlitedataframe_spark.operators.mining import top_paths

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1, session 1: A B C  (one A>B>C path)
        (1, t0, 1, "A"), (1, t0 + m, 2, "B"), (1, t0 + 2 * m, 3, "C"),
        # user 1, session 2 (2h later): A B C again
        (1, t0 + dt.timedelta(hours=2), 4, "A"),
        (1, t0 + dt.timedelta(hours=2) + m, 5, "B"),
        (1, t0 + dt.timedelta(hours=2) + 2 * m, 6, "C"),
        # user 2: only 2 events -> no 3-path; must NOT bridge into user 1
        (2, t0, 7, "B"), (2, t0 + m, 8, "C"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = {r["path"]: r["n"] for r in top_paths(df, "user_id", "ts", "event_type", n=3, k=10, tiebreak_col="event_id").collect()}
    assert out == {"A>B>C": 2}


def test_cooccurrence_counts_once_per_basket(spark):
    from sqlitedataframe_spark.operators.mining import cooccurrence_pairs

    rows = [
        (1, "x"), (1, "y"), (1, "y"),  # duplicate item in basket counts once
        (2, "x"), (2, "y"),
        (3, "x"), (3, "z"),
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = {(r["item_a"], r["item_b"]): r["n"] for r in cooccurrence_pairs(df, "basket", "item", k=10).collect()}
    assert out == {("x", "y"): 2, ("x", "z"): 1}


def test_cooccurrence_mega_basket_guard(spark):
    from sqlitedataframe_spark.operators.mining import cooccurrence_pairs

    rows = [(1, f"i{j}") for j in range(50)] + [(2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = cooccurrence_pairs(df, "basket", "item", k=100, max_basket=10).collect()
    # the 50-item basket is suppressed; only the small basket's pair remains
    assert [(r["item_a"], r["item_b"]) for r in out] == [("a", "b")]


# ---------------------------------------------------------------------------
# phash_bits / phash_pairs
# ---------------------------------------------------------------------------
def test_phash_identical_payloads_distance_zero(spark):
    from sqlitedataframe_spark.operators.multimodal import attach_media, phash_pairs

    docs = spark.createDataFrame(
        [(1, "exactly the same media payload bytes here"),
         (2, "exactly the same media payload bytes here"),
         (3, "completely different content with other letters")],
        "doc_id long, text string",
    )
    media = attach_media(docs, "doc_id", "text")
    out = {(r["id_a"], r["id_b"]): r["hamming"] for r in phash_pairs(media).collect()}
    assert out[(1, 2)] == 0  # identical bytes -> identical hash, all bands collide


def test_phash_bits_shape_and_determinism(spark):
    from pyspark.sql import functions as F2

    from sqlitedataframe_spark.operators.multimodal import phash_bits

    df = spark.createDataFrame([("some payload text",)], "t string").select(
        F2.encode("t", "UTF-8").alias("p")
    )
    a = df.select(phash_bits(F2.col("p")).alias("b")).collect()[0]["b"]
    b = df.select(phash_bits(F2.col("p")).alias("b")).collect()[0]["b"]
    assert len(a) == 64 and set(a) <= {0, 1} and a == b


# ---------------------------------------------------------------------------
# scd2_apply_changes
# ---------------------------------------------------------------------------
def test_scd2_apply_changes_matches_full_rebuild(spark):
    from sqlitedataframe_spark.operators.relational import (
        scd2_apply_changes,
        scd2_history,
    )

    all_rows = [
        (1, 10, "A"), (1, 20, "A"), (1, 30, "B"),   # history
        (1, 40, "B"), (1, 50, "C"),                 # batch: B collapses, C versions
        (2, 10, "X"),                                # untouched key
        (3, 60, "N"),                                # brand-new key in the batch
    ]
    df = spark.createDataFrame(all_rows, "k long, t long, attr string")
    hist = scd2_history(df.filter("t < 40"), ["k"], "t", ["attr"], tiebreak_col="t")
    merged = scd2_apply_changes(
        hist, df.filter("t >= 40"), ["k"], "t", ["attr"], tiebreak_col="t"
    )
    full = scd2_history(df, ["k"], "t", ["attr"], tiebreak_col="t")
    cols = ["k", "attr", "version", "valid_from", "valid_to", "is_current"]
    got = sorted(tuple(r[c] for c in cols) for r in merged.select(*cols).collect())
    want = sorted(tuple(r[c] for c in cols) for r in full.select(*cols).collect())
    assert got == want
    # spot-check semantics: t=40 "B" collapsed into the existing B version,
    # and key 3 appears with a single current row
    k3 = [g for g in got if g[0] == 3]
    assert len(k3) == 1 and k3[0][5] is True


# ---------------------------------------------------------------------------
# minhash_lsh_pairs incremental mode
# ---------------------------------------------------------------------------
def test_incremental_lsh_equals_filtered_full_run(spark):
    from sqlitedataframe_spark.operators.dedup import minhash_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog again and again ok"
    docs = spark.createDataFrame(
        [(i, base + f" tail {i % 3}") for i in range(12)],
        "doc_id long, text string",
    )
    full = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(docs, min_jaccard=0.3).collect()
    }
    batch_ids = {0, 5, 10}
    batch = docs.filter(F.col("doc_id").isin(*batch_ids)).select("doc_id")
    inc = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(docs, min_jaccard=0.3, new_ids=batch).collect()
    }
    want = {k: v for k, v in full.items() if k[0] in batch_ids or k[1] in batch_ids}
    assert inc == want and inc  # non-trivial and exactly the touching subset


# ---------------------------------------------------------------------------
# triangle_count
# ---------------------------------------------------------------------------
def test_triangle_count_hand_checked_graphs(spark):
    from sqlitedataframe_spark.operators.graph import triangle_count

    # K4 has 4 triangles; a square (4-cycle) has 0; one extra pendant edge
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    sq = [(10, 11), (11, 12), (12, 13), (13, 10), (13, 14)]
    df = spark.createDataFrame(k4 + sq, "src long, dst long")
    row = triangle_count(df).collect()[0]
    assert row["n_triangles"] == 4
    assert row["n_edges"] == len(k4) + len(sq)


def test_triangle_count_orientation_invariant_to_edge_direction(spark):
    from sqlitedataframe_spark.operators.graph import triangle_count

    # same triangle given with mixed/reversed/duplicated directions
    df = spark.createDataFrame(
        [(1, 2), (3, 2), (1, 3), (2, 1)], "src long, dst long"
    )
    row = triangle_count(df).collect()[0]
    assert row["n_triangles"] == 1 and row["n_edges"] == 3


# ---------------------------------------------------------------------------
# ab_ztest
# ---------------------------------------------------------------------------
def test_ab_ztest_detects_planted_effect(spark):
    import random

    from sqlitedataframe_spark.operators.profiling import ab_ztest

    rng = random.Random(5)
    rows = []
    for i in range(400):
        b = i % 2
        # variant B shifted by +5 in group "hot"; no shift in "cold"
        rows.append(("hot", b, rng.gauss(50 + 5 * b, 3.0)))
        rows.append(("cold", b, rng.gauss(50, 3.0)))
    df = spark.createDataFrame(rows, "grp string, b int, v double")
    out = {r["grp"]: r for r in ab_ztest(df, "v", "grp", F.col("b") == 1).collect()}
    assert out["hot"]["significant"] is True
    assert out["cold"]["significant"] is False
    assert out["hot"]["mean_b"] - out["hot"]["mean_a"] > 3
    assert out["hot"]["n_a"] == out["hot"]["n_b"] == 200


# ---------------------------------------------------------------------------
# skipgram_pairs / forecast_baseline_eval
# ---------------------------------------------------------------------------
def test_skipgram_window_and_order(spark):
    from sqlitedataframe_spark.operators.text import skipgram_pairs

    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    out = {(r["w1"], r["w2"]): r["n"] for r in skipgram_pairs(docs, window=2, k=100).collect()}
    # lookahead-2 pairs of "a b c d": (a,b),(a,c),(b,c),(b,d),(c,d) — ordered, no (b,a)
    assert out == {("a", "b"): 1, ("a", "c"): 1, ("b", "c"): 1, ("b", "d"): 1, ("c", "d"): 1}


def test_forecast_baseline_perfect_seasonality_zero_mae(spark):
    import datetime as dt

    from sqlitedataframe_spark.operators.profiling import forecast_baseline_eval

    rows = []
    d0 = dt.datetime(2024, 1, 1)
    for day in range(21):
        # weekly-periodic signal: lag-7 prediction is exact -> MAE 0
        rows.append(("g", d0 + dt.timedelta(days=day), float(10 + (day % 7))))
    df = spark.createDataFrame(rows, "grp string, ts timestamp, v double")
    out = forecast_baseline_eval(df, "grp", "ts", "v", season=7).collect()[0]
    assert out["n_days"] == 14  # first 7 days have no reference
    assert out["mae"] == 0.0 and out["mape"] == 0.0


# ---------------------------------------------------------------------------
# tfidf_cosine_pairs
# ---------------------------------------------------------------------------
def test_tfidf_cosine_identical_docs_score_one(spark):
    from sqlitedataframe_spark.operators.text import tfidf_cosine_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),
            (3, "zeta eta theta iota kappa"),
        ],
        "doc_id long, text string",
    )
    out = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in tfidf_cosine_pairs(docs, threshold=0.1, max_df_frac=1.0).collect()}
    assert out[(1, 2)] == 1.0
    assert (1, 3) not in out and (2, 3) not in out


def test_tfidf_cosine_df_cut_keeps_scores_exact(spark):
    from sqlitedataframe_spark.operators.text import tfidf_cosine_pairs

    # "common" appears in every doc -> df-cut prunes it from the JOIN,
    # but docs 1/2 still pair through their rare shared terms and the
    # norm still includes the common term (score < 1.0, not rescaled)
    docs = spark.createDataFrame(
        [
            (1, "common rare1 rare2 rare3"),
            (2, "common rare1 rare2 rare3"),
            (3, "common solo1 solo2 solo3"),
        ],
        "doc_id long, text string",
    )
    out = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in tfidf_cosine_pairs(docs, threshold=0.1, max_df_frac=0.67).collect()}
    assert (1, 2) in out and out[(1, 2)] == 1.0  # identical weight vectors
    assert (1, 3) not in out  # only the pruned common term is shared


# ---------------------------------------------------------------------------
# changepoint_cusum
# ---------------------------------------------------------------------------
def test_cusum_detects_level_shift_direction(spark):
    import datetime as dt

    from sqlitedataframe_spark.operators.profiling import changepoint_cusum

    d0 = dt.datetime(2024, 1, 1)
    rows = []
    for day in range(30):
        # "up": level jumps 10 -> 30 at day 15; "flat": constant
        rows.append(("up", d0 + dt.timedelta(days=day), 10.0 if day < 15 else 30.0))
        rows.append(("flat", d0 + dt.timedelta(days=day), 20.0))
    df = spark.createDataFrame(rows, "grp string, ts timestamp, v double")
    out = {r["grp"]: r for r in changepoint_cusum(df, "grp", "ts", "v").collect()}
    # the shifted series: mean is 20, so each half deviates by 10/day for
    # 15 days -> max drawup = 150 (and by symmetry drawdown 150)
    assert abs(out["up"]["max_drawup"] - 150.0) < 1e-6
    assert out["flat"]["max_drawup"] == 0.0 and out["flat"]["max_drawdown"] == 0.0


# ---------------------------------------------------------------------------
# snapshot_diff
# ---------------------------------------------------------------------------
def test_snapshot_diff_classifies_each_change_kind(spark):
    from sqlitedataframe_spark.operators.relational import snapshot_diff

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, s string, p double",
    )
    cur = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (4, "d", 40.0)],
        "k long, s string, p double",
    )
    out = {r["column"]: r for r in snapshot_diff(base, cur, ["k"], ["s", "p"]).collect()}
    for col in ("s", "p"):
        assert out[col]["n_added"] == 1  # key 4
        assert out[col]["n_removed"] == 1  # key 3
    assert out["s"]["n_changed"] == 1  # key 2's status flip
    assert out["p"]["n_changed"] == 0  # no price changed


def test_snapshot_diff_null_safe_comparison(spark):
    from sqlitedataframe_spark.operators.relational import snapshot_diff

    base = spark.createDataFrame([(1, None), (2, "x")], "k long, s string")
    cur = spark.createDataFrame([(1, None), (2, None)], "k long, s string")
    out = {r["column"]: r for r in snapshot_diff(base, cur, ["k"], ["s"]).collect()}
    # NULL == NULL is "unchanged"; value -> NULL is a change
    assert out["s"]["n_changed"] == 1
