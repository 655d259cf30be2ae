"""Focused tests for the r12 OPTIMIZATION-round internals changes.

Every change here must be value-neutral: these tests pin the optimized
implementations to naive reference computations on small inputs, so a
future refactor that changes WHAT is computed (not just how fast) fails
loudly.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from sqlitedataframe_spark.operators.util import hof_let


def test_hof_let_value_identity(spark):
    """hof_let(expr, fn) == fn applied to the inlined expr — same values,
    same types — on the bigram construction it now guards."""
    df = spark.createDataFrame(
        [("a b c d",), ("x y",), ("solo",), ("",)], "text string"
    )
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    naive = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i), F.element_at(toks, i + 1)
        ),
    )
    bound = hof_let(
        toks,
        lambda tt: F.transform(
            F.sequence(F.lit(1), F.size(tt) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(tt, i), F.element_at(tt, i + 1)
            ),
        ),
    )
    rows = (
        df.filter(F.size(toks) >= 2)
        .select(naive.alias("a"), bound.alias("b"))
        .collect()
    )
    assert rows and all(r["a"] == r["b"] for r in rows)


def test_perplexity_c1_derivation(spark, sf_dir):
    """The c1 (context-count) table derived from the c2 bigram counts must
    equal the direct unigram-position count over train bigrams."""
    from sqlitedataframe_spark.io import load_table
    from sqlitedataframe_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    base = docs.select(
        F.col("doc_id").alias("_id"), F.col("lang").alias("_lang"), toks.alias("_t")
    ).filter(F.size(toks) >= 2)
    bg = base.withColumn(
        "_bg",
        hof_let(
            F.col("_t"),
            lambda tt: F.transform(
                F.sequence(F.lit(1), F.size(tt) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(tt, i), F.element_at(tt, i + 1)
                ),
            ),
        ),
    )
    tr_bg = bg.filter(F.col("_id") % 5 != 0).select(
        "_lang", F.explode("_bg").alias("_b")
    )
    direct = (
        tr_bg.select("_lang", F.split("_b", " ", 2).getItem(0).alias("_w1"))
        .groupBy("_lang", "_w1")
        .agg(F.count(F.lit(1)).cast("long").alias("_c1"))
    )
    c2 = tr_bg.groupBy("_lang", "_b").agg(
        F.count(F.lit(1)).cast("long").alias("_c2")
    )
    derived = (
        c2.select("_lang", F.split("_b", " ", 2).getItem(0).alias("_w1"), "_c2")
        .groupBy("_lang", "_w1")
        .agg(F.sum("_c2").cast("long").alias("_c1"))
    )
    assert direct.exceptAll(derived).count() == 0
    assert derived.exceptAll(direct).count() == 0


def test_pq_assign_argmin_semantics(spark):
    """The join-free array_min assignment keeps the exact two-aggregate
    semantics: min distance, ties -> min code."""
    from sqlitedataframe_spark.operators.similarity import _pq_assign

    rows = spark.createDataFrame(
        [(1, 0, [0, 0]), (2, 0, [10, 10])],
        "_id long, _s int, _sub array<bigint>",
    )
    # codes 0/1 are equidistant from point (0,0) -> tie must pick code 0;
    # code 2 is nearest to (10,10)
    cents = spark.createDataFrame(
        [
            (0, 0, [Decimal(1), Decimal(0)], 1),
            (0, 1, [Decimal(0), Decimal(1)], 1),
            (0, 2, [Decimal(9), Decimal(9)], 1),
        ],
        "_s int, _c int, _sv array<decimal(38,0)>, _cnt long",
    )
    got = {r["_id"]: r["_c"] for r in _pq_assign(rows, cents).collect()}
    assert got == {1: 0, 2: 2}


def test_pq_train_assign_matches_r11_shape(spark, sf_dir):
    """End-to-end PQ training still yields the documented deterministic
    trajectory: k codes, m subspaces, every vector assigned, seeds = the
    k smallest ids (their own subvector distance is 0 at round 0)."""
    from sqlitedataframe_spark.io import load_table
    from sqlitedataframe_spark.operators.similarity import pq_train_assign

    emb = load_table(spark, sf_dir, "embeddings")
    final = pq_train_assign(emb, m=4, k=4, iterations=2)
    n_vec = emb.count()
    agg = final.groupBy().agg(
        F.countDistinct("_id").alias("ids"),
        F.countDistinct("_s").alias("ss"),
        F.count(F.lit(1)).alias("rows"),
    ).collect()[0]
    assert agg["ids"] == n_vec
    assert agg["ss"] == 4
    assert agg["rows"] == n_vec * 4
    codes = {r["_c"] for r in final.select("_c").distinct().collect()}
    assert codes <= {0, 1, 2, 3}
