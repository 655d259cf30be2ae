"""Salting correctness: results must equal the unsalted plan exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from sqlitedataframe_spark.operators.skew import salted_agg, salted_join


def test_salted_agg_equals_plain(spark):
    df = spark.createDataFrame(
        [("hot", i * 1.0) for i in range(1000)] + [("cold", 1.0), ("cold", 2.0)],
        ["k", "v"],
    )
    got = {
        r.k: (r.v_sum, r.n, r.min_v)
        for r in salted_agg(
            df,
            ["k"],
            [
                F.sum("v").alias("v_sum"),
                F.count(F.lit(1)).alias("n"),
                F.min("v").alias("min_v"),
            ],
        ).collect()
    }
    assert got["hot"] == (sum(i * 1.0 for i in range(1000)), 1000, 0.0)
    assert got["cold"] == (3.0, 2, 1.0)


def test_salted_join_equals_plain(spark):
    left = spark.createDataFrame([("a", i) for i in range(500)] + [("b", 0)], ["k", "x"])
    right = spark.createDataFrame([("a", "A"), ("b", "B")], ["k", "y"])
    plain = left.join(right, "k")
    salted = salted_join(left, right, "k")
    assert salted.count() == plain.count() == 501
    assert salted.exceptAll(plain).isEmpty() and plain.exceptAll(salted).isEmpty()
